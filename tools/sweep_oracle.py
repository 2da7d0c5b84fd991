"""sf0.01 dtype-exact sweep of the full query registry vs DuckDB oracles.

Emulates the grading driver's CORRECTNESS gate, but stricter on dtypes:
the driver's value-hash is dtype-sensitive, so this sweep demands the FULL
pandas dtype (not just the kind) to match column-by-column, catching
int64-vs-float64 and datetime64[ns]-vs-[us] drift before the driver does.

Usage: python tools/sweep_oracle.py [sf_dir] [name_prefix ...]
Prints one line per query and a JSON summary tail; exit code 1 on any failure.
"""

import json
import logging
import sys
import time
import traceback

logging.getLogger("ray.data").setLevel(logging.ERROR)

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

import ray

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def to_pandas(result):
    import ray.data as rd

    if isinstance(result, rd.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name, ours_raw, theirs_raw):
    ours, theirs = normalize(ours_raw), normalize(theirs_raw)
    if list(ours.columns) != list(theirs.columns):
        return f"columns {list(ours.columns)} vs {list(theirs.columns)}"
    if len(ours) != len(theirs):
        return f"rows {len(ours)} vs {len(theirs)}"
    for c in ours.columns:
        if str(ours[c].dtype) != str(theirs[c].dtype):
            return f"dtype col {c}: {ours[c].dtype} vs {theirs[c].dtype}"
    for c in ours.columns:
        a, b = ours[c].to_numpy(), theirs[c].to_numpy()
        if np.issubdtype(ours[c].dtype, np.floating):
            if not np.allclose(a, b, rtol=0, atol=0, equal_nan=True):
                return f"float values col {c}"
        elif not (a == b).all():
            i = int(np.argmax(a != b))
            return f"values col {c} (first diff row {i}: {a[i]!r} vs {b[i]!r})"
    if len(ours) == 0:
        return "EMPTY (weak check — make predicate non-trivial at this SF)"
    return None


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    prefixes = sys.argv[2:]
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False)
    from pubcrawl.queries import ORACLE, QUERIES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    names = sorted(QUERIES)
    if prefixes:
        names = [n for n in names if any(n.startswith(p) for p in prefixes)]
    fails, empties = {}, []
    for name in names:
        t0 = time.time()
        try:
            ours = to_pandas(QUERIES[name](sf_dir))
            if name in ORACLE:
                theirs = con.execute(ORACLE[name]).fetchdf()
                err = compare(name, ours, theirs)
                if err and err.startswith("EMPTY"):
                    empties.append(name)
                    err = None
            else:
                err = None if (ours is not None and len(ours) >= 0) else "no result"
                if ours is not None and len(ours) == 0:
                    empties.append(name)
        except Exception:
            err = "EXC " + traceback.format_exc(limit=3).strip().replace("\n", " | ")
        dt = time.time() - t0
        tag = "ORACLE" if name in ORACLE else "rows  "
        if err:
            fails[name] = err
            print(f"FAIL {tag} {name:38s} {dt:6.1f}s  {err}", flush=True)
        else:
            print(f"ok   {tag} {name:38s} {dt:6.1f}s", flush=True)
    print(json.dumps({
        "sf_dir": sf_dir, "total": len(names),
        "oracle_checked": sum(1 for n in names if n in ORACLE),
        "failures": fails, "empty_results": empties,
    }))
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
