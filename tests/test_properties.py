"""Property-based invariants (hypothesis) for the pure kernels everything
else leans on: URL canonicalization, the vectorized xxh64, winnowing, MinHash
signatures, and the popcount/Hamming helpers. These are driver-free (no Ray
Dataset execution), so hundreds of generated cases cost milliseconds."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pubcrawl.canon import canonical_url
from pubcrawl.dedup import (
    _popcount64,
    jaccard,
    minhash_signature,
    shingle_hashes,
    simhash64,
    simhash_batch,
    winnow_fingerprints,
)
from pubcrawl.hashing import _xxh64_fixed_len, xxh64

_hosts = st.from_regex(r"[a-z][a-z0-9-]{0,10}(\.[a-z][a-z0-9]{0,5}){0,2}", fullmatch=True)
_paths = st.from_regex(r"(/[A-Za-z0-9._~-]{0,8}){0,4}/?", fullmatch=True)
_qs = st.from_regex(r"([a-z]{1,4}=[A-Za-z0-9]{0,4}(&[a-z]{1,4}=[A-Za-z0-9]{0,4}){0,3})?", fullmatch=True)


@given(_hosts, _paths, _qs)
@settings(max_examples=200, deadline=None)
def test_canonical_url_idempotent(host, path, qs):
    u = f"http://{host}{path}" + (f"?{qs}" if qs else "")
    c = canonical_url(u)
    assert canonical_url(c) == c  # fixpoint
    # canonical form never keeps a fragment, default port, or empty path
    assert "#" not in c and not c.startswith("http://:") and "://" in c


@given(_hosts, _paths)
@settings(max_examples=100, deadline=None)
def test_canonical_url_normalizations(host, path):
    u = f"http://{host}{path}"
    # default port strips; scheme/host case-folds; duplicate slashes collapse
    assert canonical_url(f"http://{host}:80{path}") == canonical_url(u)
    assert canonical_url(f"HTTP://{host.upper()}{path}") == canonical_url(u)
    assert canonical_url(u + "#frag") == canonical_url(u)


@given(st.lists(st.tuples(st.text(alphabet="abcdef", min_size=1, max_size=4),
                          st.text(alphabet="0123", max_size=3)),
                min_size=0, max_size=4),
       _hosts)
@settings(max_examples=100, deadline=None)
def test_canonical_url_query_order_invariant(params, host):
    from urllib.parse import urlencode

    a = urlencode(params)
    b = urlencode(params[::-1])
    assert canonical_url(f"http://{host}/p?{a}") == canonical_url(f"http://{host}/p?{b}")


@given(st.binary(min_size=0, max_size=200))
@settings(max_examples=300, deadline=None)
def test_vectorized_xxh64_matches_scalar(data):
    mat = np.frombuffer(data, dtype=np.uint8).reshape(1, -1)
    assert int(_xxh64_fixed_len(mat)[0]) == xxh64(data)


@given(st.text(alphabet="abcdefgh é中", min_size=0, max_size=120))
@settings(max_examples=200, deadline=None)
def test_winnow_is_deterministic_and_subset_of_grams(text):
    f1 = winnow_fingerprints(text)
    f2 = winnow_fingerprints(text)
    assert len(f1) == len(f2) and (f1 == f2).all()
    assert (np.sort(f1) == f1).all()  # unique → sorted


@given(st.lists(st.integers(0, 2**64 - 1), min_size=0, max_size=40, unique=True),
       st.lists(st.integers(0, 2**64 - 1), min_size=0, max_size=40, unique=True))
@settings(max_examples=200, deadline=None)
def test_jaccard_bounds_and_minhash_consistency(xs, ys):
    a = np.sort(np.array(xs, dtype=np.uint64))
    b = np.sort(np.array(ys, dtype=np.uint64))
    j = jaccard(a, b)
    assert 0.0 <= j <= 1.0
    if xs and set(xs) == set(ys):
        assert j == 1.0
    # identical shingle sets → identical signatures (minhash is a function)
    from pubcrawl.dedup import _minhash_params

    pa_, pb_ = _minhash_params(16)
    if xs:
        s1 = minhash_signature(a, pa_, pb_)
        s2 = minhash_signature(a.copy(), pa_, pb_)
        assert (s1 == s2).all()


@given(st.lists(st.integers(0, 2**64 - 1), min_size=1, max_size=50))
@settings(max_examples=100, deadline=None)
def test_popcount_matches_python(vals):
    arr = np.array(vals, dtype=np.uint64)
    got = _popcount64(arr)
    want = [bin(v).count("1") for v in vals]
    assert list(got) == want


@given(st.text(alphabet="abcde fgh", min_size=0, max_size=80))
@settings(max_examples=100, deadline=None)
def test_simhash_batch_matches_scalar_property(text):
    assert int(simhash_batch([text])[0]) == simhash64(text)


@given(st.text(alphabet="abc def", min_size=0, max_size=60), st.integers(1, 4))
@settings(max_examples=100, deadline=None)
def test_shingles_unique_sorted(text, n):
    sh = shingle_hashes(text, n)
    assert (np.sort(sh) == sh).all()
    assert len(np.unique(sh)) == len(sh)
