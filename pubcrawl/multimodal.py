"""Multimodal column operators over the image_caption table.

Images/audio/video are opaque ``binary`` columns with typed metadata
(input_hint schema); every operator here is an actor-pool ``map_batches``
stage over zero-copy Arrow batches, sized for wide binary rows (small
batch_size, bytes never gathered to the driver).

Codec reality in this sandbox: PNG and the deterministic FJPG stand-in are
fully real (pubcrawl.imaging); real JPEG runs when PIL is importable. Audio
and video decoding have NO library here — those stages are STUBS with the
documented contract: ``frame_sample``/``audio_features`` raise
NotImplementedError for real codec bytes unless ``deterministic_fake=True``,
in which case they produce seeded fake outputs so the Ray-side plumbing
(schema, batch size, actor signature, output layout) is real and tested.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .hashing import xxh64
from .imaging import decode_image, phash64, png_encode


def _resize_nn(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[np.ix_(ys, xs)]


class DecodeVerify:
    """Decode bytes → verify w/h/fmt/phash metadata matches the pixels.
    Emits ``valid: bool`` plus decode stats; never ships pixels onward."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        valid = np.zeros(batch.num_rows, dtype=bool)
        mean_lum = np.zeros(batch.num_rows, dtype=np.float64)
        for i in range(batch.num_rows):
            try:
                img = decode_image(batch["bytes"][i].as_py(), batch["fmt"][i].as_py())
            except Exception:
                continue
            ok = (
                img.shape[0] == batch["h"][i].as_py()
                and img.shape[1] == batch["w"][i].as_py()
                and phash64(img) == batch["phash"][i].as_py()
            )
            valid[i] = ok
            mean_lum[i] = float(img.mean())
        out = batch.drop_columns(["bytes"])
        out = out.append_column("valid", pa.array(valid))
        out = out.append_column("mean_lum", pa.array(np.round(mean_lum, 4)))
        return out


class Resize:
    """Re-encode every image at a fixed thumbnail size (nearest-neighbor,
    PNG out). Stateful stage shape: params bound once per actor."""

    def __init__(self, out_w: int = 32, out_h: int = 32):
        self.out_w, self.out_h = out_w, out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        thumbs = []
        for i in range(batch.num_rows):
            img = decode_image(batch["bytes"][i].as_py(), batch["fmt"][i].as_py())
            thumbs.append(png_encode(_resize_nn(img, self.out_w, self.out_h)))
        out = batch.drop_columns(["bytes"])
        out = out.append_column("thumb", pa.array(thumbs, pa.large_binary()))
        out = out.append_column(
            "thumb_w", pa.array(np.full(batch.num_rows, self.out_w, dtype=np.int32))
        )
        out = out.append_column(
            "thumb_h", pa.array(np.full(batch.num_rows, self.out_h, dtype=np.int32))
        )
        return out


class ImageFeatures:
    """Feature extraction: 3x8-bin color histogram + mean/std per channel +
    phash — the embedding-ish vector for similarity over images."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, hashes = [], []
        for i in range(batch.num_rows):
            img = decode_image(batch["bytes"][i].as_py(), batch["fmt"][i].as_py())
            hist = [
                np.histogram(img[:, :, c], bins=8, range=(0, 256))[0] for c in range(3)
            ]
            v = np.concatenate(
                [np.concatenate(hist) / img[:, :, 0].size,
                 img.mean(axis=(0, 1)) / 255.0,
                 img.std(axis=(0, 1)) / 255.0]
            )
            feats.append(v.astype(np.float32))
            hashes.append(phash64(img))
        out = batch.drop_columns(["bytes"])
        out = out.append_column(
            "features", pa.array([f.tolist() for f in feats], pa.list_(pa.float32()))
        )
        return out


class FrameSample:
    """Video frame sampling STUB. Real video bytes need a codec this
    container doesn't have; with deterministic_fake=True each 'video' yields
    ``n_frames`` seeded procedural frames (so the pipeline shape — one input
    row → list<binary> frames — is real)."""

    def __init__(self, n_frames: int = 4, deterministic_fake: bool = False):
        self.n_frames = n_frames
        self.fake = deterministic_fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "video decoding requires a codec library not present in this "
                "environment; pass deterministic_fake=True for the seeded stub"
            )
        from .imaging import procedural_image

        frames_col = []
        for i in range(batch.num_rows):
            key = xxh64(batch["image_id"][i].as_py())
            frames = []
            for j in range(self.n_frames):
                img, _, _ = procedural_image(key ^ j, 16, 32)
                frames.append(png_encode(img))
            frames_col.append(frames)
        out = batch.drop_columns(["bytes"]) if "bytes" in batch.column_names else batch
        return out.append_column("frames", pa.array(frames_col, pa.list_(pa.large_binary())))


def image_pipeline(ds: rd.Dataset, stage, *, concurrency: int = 4, batch_size: int = 16,
                   **stage_kwargs) -> rd.Dataset:
    """Run a multimodal stage as an actor pool sized for wide binary rows:
    small batches (bytes dominate block size), bounded concurrency."""
    return ds.map_batches(
        stage,
        fn_constructor_kwargs=stage_kwargs,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
    )


class AudioFeatures:
    """Audio feature extraction over an opaque ``binary`` waveform column.

    Real audio bytes (mp3/ogg/flac) need a codec this container doesn't
    have; the DECODE step is therefore gated: with ``deterministic_fake=
    True`` each payload is interpreted as a seeded 16-bit PCM stand-in
    (length and content a pure function of the row id), so the Ray-side
    plumbing — binary in, fixed-width ``list<float>`` feature vector out,
    small actor-pool batches — is real and tested. Features: RMS energy,
    zero-crossing rate, and an 8-band spectrum via a real FFT over the PCM
    frame — the layout a real decoder would feed."""

    N_BANDS = 8

    def __init__(self, deterministic_fake: bool = False, sr: int = 16_000):
        self.fake = deterministic_fake
        self.sr = sr

    def _decode(self, payload: bytes, key: int) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "audio decoding requires a codec library not present in this "
                "environment; pass deterministic_fake=True for the seeded stub"
            )
        rng = np.random.default_rng(np.uint64(key))
        n = int(rng.integers(self.sr // 4, self.sr))  # 0.25–1 s of samples
        t = np.arange(n) / self.sr
        f0 = float(rng.uniform(80, 2000))
        wave = np.sin(2 * np.pi * f0 * t) + 0.1 * rng.standard_normal(n)
        return (wave * 32767 / np.abs(wave).max()).astype(np.int16)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for i in range(batch.num_rows):
            key = xxh64(str(batch["audio_id"][i].as_py()))
            pcm = self._decode(
                batch["bytes"][i].as_py() if "bytes" in batch.column_names else b"",
                key,
            ).astype(np.float64) / 32768.0
            rms = float(np.sqrt((pcm ** 2).mean()))
            zcr = float((np.signbit(pcm[1:]) != np.signbit(pcm[:-1])).mean())
            spec = np.abs(np.fft.rfft(pcm))
            bands = np.array_split(spec, self.N_BANDS)
            band_e = np.array([float((b ** 2).sum()) for b in bands])
            band_e = band_e / band_e.sum() if band_e.sum() else band_e
            feats.append(np.concatenate([[rms, zcr], band_e]).astype(np.float32))
        out = batch.drop_columns(["bytes"]) if "bytes" in batch.column_names else batch
        return out.append_column(
            "audio_features", pa.array([f.tolist() for f in feats], pa.list_(pa.float32()))
        )


def derive_and_commit(
    store_root: str,
    stage,
    out_prefix: str,
    *,
    n_buckets: int = 8,
    concurrency: int = 4,
    batch_size: int = 16,
    id_col: str = "image_id",
    **stage_kwargs,
) -> dict:
    """Resumable derived-table write path: crawl-store images → actor-pool
    ``stage`` (Resize / ImageFeatures / ...) → PARTITIONED fragment commits.

    The output is partitioned by a deterministic id-hash bucket
    (``{out_prefix}_{bucket:04d}``); each bucket commits from its own task
    via the store's atomic idempotent manifest protocol, so a failed or
    re-run derivation SKIPS already-committed buckets (the commit is the
    exactly-once point; the compute before it is at-least-once). A rerun
    over an unchanged store adds zero manifest lines. Payload bytes never
    touch the driver — only per-bucket {rows} metrics return."""
    import ray

    from .hashing import xxh64_many
    from .pipeline import load_images
    from .store import ParquetFragmentStore

    store = ParquetFragmentStore(store_root)
    done = {
        pid for pid in store.committed() if pid.startswith(out_prefix + "_")
    }
    all_pids = {f"{out_prefix}_{b:04d}" for b in range(n_buckets)}
    if all_pids <= done:
        # every bucket already committed — skip the decode/derive compute
        # entirely (a bucket that got NO rows never commits and keeps the
        # rerun path live, which is correct: recomputing it is cheap)
        return {"committed": 0, "skipped": n_buckets, "rows": 0}
    ds = image_pipeline(load_images(store_root), stage, concurrency=concurrency,
                        batch_size=batch_size, **stage_kwargs)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        h = xxh64_many([str(v) for v in df[id_col]])
        df = df.copy()
        df["__bucket"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    bucketed = ds.map_batches(add_bucket, batch_format="pandas", batch_size=None)
    done_ref = ray.put(done)

    def commit_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # a merge partition holds one or MORE bucket values (the shuffle
        # re-hashes the bucket column, it is not an identity routing), so
        # commit per bucket group — each under its own declared pid
        st = ParquetFragmentStore(store_root)
        done_set = ray.get(done_ref)
        rows = []
        for b, g in df.groupby("__bucket", sort=True):
            pid = f"{out_prefix}_{int(b):04d}"
            if pid in done_set:
                rows.append({"partition_id": pid, "rows": 0, "skipped": True})
                continue
            tbl = pa.Table.from_pandas(
                g.drop(columns="__bucket").sort_values(id_col), preserve_index=False
            )
            rec = st.commit(tbl, pid, lineage=f"derive:{out_prefix}")
            rows.append({"partition_id": pid, "rows": int(rec["rows"]), "skipped": False})
        return pd.DataFrame(rows)

    from . import relops

    marker = relops.hash_partition_apply(
        bucketed, ["__bucket"], commit_bucket, n_partitions=n_buckets
    ).to_pandas()
    return {
        "committed": int((~marker["skipped"]).sum()),
        "skipped": int(marker["skipped"].sum()),
        "rows": int(marker["rows"].sum()),
    }
