"""Unit tests for the pure-function core: hashing, canonicalization, image
codecs, phash, synthetic web determinism, cuckoo filter."""

import numpy as np
import pyarrow as pa
import pytest

from pubcrawl.canon import canonical_url, canonicalize_batch, host_of
from pubcrawl.hashing import xxh64, xxh64_many, _xxh64_py
from pubcrawl.imaging import (
    hamming64,
    jpeg_decode,
    jpeg_encode,
    phash64,
    png_decode,
    png_encode,
    procedural_image,
    psnr,
)
from pubcrawl.seen import CuckooFilter
from pubcrawl.synthweb import (
    SyntheticTransport,
    WebConfig,
    index_links,
    parse_detail_payload,
    parse_index_payload,
    robots_allowed,
)


class TestXXH64:
    # public test vectors for XXH64 with seed 0
    def test_vectors(self):
        assert xxh64(b"") == 0xEF46DB3751D8E999
        assert xxh64(b"a") == 0xD24EC4F1A98C6E5B
        assert xxh64(b"abc") == 0x44BC2CF5AD770999
        assert xxh64(b"Nobody inspects the spammish repetition") == 0xFBCEA83C8A378BF1

    def test_pure_python_path_all_lengths(self):
        # exercise the >=32-byte lane loop and every tail length
        for n in range(0, 70):
            data = bytes(range(256))[:n] * 1
            assert _xxh64_py(data) == _xxh64_py(data)
        long = b"0123456789abcdef" * 5
        assert _xxh64_py(long) == xxh64(long)

    def test_many(self):
        strs = ["a", "abc", ""]
        out = xxh64_many(strs)
        assert out.dtype == np.uint64
        assert [int(x) for x in out] == [xxh64(s) for s in strs]


class TestCanon:
    def test_basic(self):
        assert (
            canonical_url("HTTP://Example.COM:80//a//b/?b=2&a=1#frag")
            == "http://example.com/a/b/?a=1&b=2"
        )
        assert canonical_url("https://x.org") == "https://x.org/"
        assert canonical_url("https://x.org:8443/p") == "https://x.org:8443/p"

    def test_relative_synth(self):
        assert (
            canonical_url("/detail/5", base="synth://host-00001/index/0")
            == "synth://host-00001/detail/5"
        )

    def test_idempotent(self):
        u = "synth://HOST-00001//a/b?z=1&a=2#x"
        assert canonical_url(canonical_url(u)) == canonical_url(u)

    def test_batch(self):
        t = pa.table({"url": ["synth://HOST-00001/a//b", "synth://host-00002/x"]})
        out = canonicalize_batch(t)
        assert out["url"].to_pylist() == ["synth://host-00001/a/b", "synth://host-00002/x"]
        assert out["host"].to_pylist() == ["host-00001", "host-00002"]
        assert out["url_hash"][0].as_py() == xxh64("synth://host-00001/a/b")


class TestImaging:
    def test_png_roundtrip(self):
        img, _, _ = procedural_image(1)
        assert (png_decode(png_encode(img)) == img).all()

    def test_fake_jpeg_psnr(self):
        img, _, _ = procedural_image(2)
        for q in (70, 85, 95):
            dec = jpeg_decode(jpeg_encode(img, q))
            assert psnr(img, dec) >= 40.0, q

    def test_phash_stability_and_locality(self):
        img, _, _ = procedural_image(3)
        h1 = phash64(img)
        assert h1 == phash64(img.copy())
        # mild lossy distortion keeps the hash close
        dec = jpeg_decode(jpeg_encode(img, 70))
        assert hamming64(h1, phash64(dec)) <= 16
        other, _, _ = procedural_image(4)
        assert hamming64(h1, phash64(other)) > 10

    def test_decoder_handles_all_png_filters(self):
        # synthetic scanline stream through each filter type via re-encode
        img, _, _ = procedural_image(5)
        assert (png_decode(png_encode(img)) == img).all()


class TestSynthWeb:
    def test_deterministic(self):
        cfg = WebConfig(seed=9, n_hosts=4)
        t1, t2 = SyntheticTransport(cfg), SyntheticTransport(cfg)
        for url in cfg.seed_urls():
            assert t1.fetch(url) == t2.fetch(url)

    def test_index_parse_roundtrip(self):
        cfg = WebConfig(seed=9, n_hosts=4)
        t = SyntheticTransport(cfg)
        st, payload = t.fetch("synth://host-00000/index/0")
        assert st == 200
        links = parse_index_payload(payload)
        assert links == index_links(cfg, 0, 0)
        assert len(links) >= cfg.links_per_page

    def test_detail_parse(self):
        cfg = WebConfig(seed=9, n_hosts=4)
        t = SyntheticTransport(cfg)
        st, payload = t.fetch("synth://host-00001/detail/3")
        assert st == 200
        items = parse_detail_payload(payload)
        assert len(items) == cfg.images_per_page
        for it in items:
            img = png_decode(it["bytes"]) if it["fmt"] == "png" else jpeg_decode(it["bytes"])
            assert img.shape == (it["h"], it["w"], 3)
            assert len(it["caption"].split()) >= 5

    def test_transient_failure_then_success(self):
        cfg = WebConfig(seed=9, n_hosts=4, fail_percent=100)
        t = SyntheticTransport(cfg)
        url = "synth://host-00000/index/0"
        st1, _ = t.fetch(url)
        st2, payload = t.fetch(url)
        assert st1 == 503 and st2 == 200 and payload

    def test_robots(self):
        assert robots_allowed("synth://host-00000/detail/1")
        assert not robots_allowed("synth://host-00000/private/detail/1")

    def test_404(self):
        cfg = WebConfig(seed=9, n_hosts=4)
        t = SyntheticTransport(cfg)
        assert t.fetch("synth://host-09999/index/0")[0] == 404
        assert t.fetch("synth://host-00000/index/999")[0] == 404


class TestCuckoo:
    def test_membership_no_false_negatives(self):
        f = CuckooFilter(capacity=4096)
        rng = np.random.default_rng(0)
        items = [int(x) for x in rng.integers(0, 2**63, size=2000, dtype=np.int64)]
        for it in items:
            f.add(it)
        assert all(f.contains(it) for it in items)  # cuckoo filters never false-negate

    def test_false_positive_rate_bounded(self):
        f = CuckooFilter(capacity=4096)
        rng = np.random.default_rng(1)
        for x in rng.integers(0, 2**63, size=2000, dtype=np.int64):
            f.add(int(x))
        probes = rng.integers(2**63, 2**64 - 1, size=5000, dtype=np.uint64)
        fp = sum(f.contains(int(x)) for x in probes)
        assert fp / 5000 < 0.02  # 16-bit fingerprints → ~0.1% expected


class TestVectorizedXXH64:
    def test_matches_scalar_random_lengths(self):
        import random

        import pyarrow as pa

        from pubcrawl.hashing import xxh64_arrow

        random.seed(7)
        strs = [
            "".join(chr(random.randint(33, 126)) for _ in range(random.randint(0, 150)))
            for _ in range(1500)
        ] + ["", "a", "abc", "synth://host-00001/detail/5", "x" * 64, "y" * 33]
        arr = pa.array(strs, pa.string())
        vec = xxh64_arrow(arr)
        scalar = np.array([xxh64(s) for s in strs], dtype=np.uint64)
        assert (vec == scalar).all()

    def test_large_string_and_chunked(self):
        import pyarrow as pa

        from pubcrawl.hashing import xxh64_arrow

        strs = ["alpha", "beta-gamma-delta-epsilon-zeta-eta-theta", ""]
        large = pa.array(strs, pa.large_string())
        chunked = pa.chunked_array([pa.array(strs[:2]), pa.array(strs[2:])])
        expect = [xxh64(s) for s in strs]
        assert [int(x) for x in xxh64_arrow(large)] == expect
        assert [int(x) for x in xxh64_arrow(chunked)] == expect

    def test_sliced_array_offset(self):
        import pyarrow as pa

        from pubcrawl.hashing import xxh64_arrow

        arr = pa.array(["aa", "bb", "cc", "dd"]).slice(1, 2)
        assert [int(x) for x in xxh64_arrow(arr)] == [xxh64("bb"), xxh64("cc")]

    def test_cuckoo_add_many_matches_contains(self):
        from pubcrawl.seen import CuckooFilter

        rng = np.random.default_rng(5)
        f = CuckooFilter(capacity=8192)
        items = rng.integers(0, 2**63, size=4000, dtype=np.uint64)
        f.add_many(items)
        assert f.contains_many(items).all()  # no false negatives
        probes = rng.integers(2**63, 2**64 - 1, size=5000, dtype=np.uint64)
        assert f.contains_many(probes).mean() < 0.02


class TestFullSizeImages:
    def test_input_hint_size_range_invariants(self):
        """FIXTURES.md §1: w,h ∈ [16,512]. Full-range images keep the codec +
        phash invariants (PSNR ≥ 40 dB lossy, exact lossless)."""
        from pubcrawl.imaging import decode_image, encode_image

        for key in (901, 902, 903):
            img, fmt, q = procedural_image(key, min_side=16, max_side=512)
            assert 16 <= img.shape[0] <= 512 and 16 <= img.shape[1] <= 512
            enc = encode_image(img, fmt, q)
            dec = decode_image(enc, fmt)
            if fmt == "png":
                assert (dec == img).all()
            else:
                assert psnr(img, dec) >= 40.0
            assert phash64(dec) == phash64(decode_image(enc, fmt))  # deterministic

    def test_detail_pages_support_full_range(self):
        from pubcrawl.synthweb import WebConfig, detail_images

        cfg = WebConfig(seed=3, n_hosts=2, min_side=64, max_side=512)
        items = detail_images(cfg, 0, 0)
        for it in items:
            h, w = it["pixels"].shape[:2]
            assert 64 <= h <= 512 and 64 <= w <= 512
