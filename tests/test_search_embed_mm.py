"""Tests for the search layer, embedding pipeline, multimodal stages, and
analysis/report sinks."""

import importlib.util
import os

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from pubcrawl import analysis, embed, multimodal, search
from pubcrawl.imaging import decode_image, png_decode, png_encode, procedural_image


@pytest.fixture()
def corpus():
    rows = [
        {"doc_id": 1, "text": "ray data engine builds streaming pipelines", "source": "s1"},
        {"doc_id": 2, "text": "streaming data pipelines shuffle blocks", "source": "s1"},
        {"doc_id": 3, "text": "the cat sat on the mat", "source": "s2"},
        {"doc_id": 4, "text": "data data data everywhere in the engine", "source": "s2"},
    ]
    return rd.from_items(rows)


class TestQueryGrammar:
    def test_parse(self):
        q = search.parse_query('source:s1 "streaming pipelines" data engine')
        assert q.fields == [("source", "s1")]
        assert q.phrases == ["streaming pipelines"]
        assert q.terms == ["data", "engine"]

    def test_parse_quoted_field(self):
        q = search.parse_query('lang:"en us" word')
        assert q.fields == [("lang", "en us")] and q.terms == ["word"]


class TestKeywordSearch:
    def test_conjunctive_and_ranking(self, corpus):
        out = search.keyword_search(corpus, "data engine", id_col="doc_id", k=10)
        assert set(out.doc_id) == {1, 4}  # both words required
        # doc 4 has tf(data)=3 → ranks first
        assert list(out.doc_id)[0] == 4
        assert list(out["rank"]) == [1, 2]

    def test_phrase_filter(self, corpus):
        out = search.keyword_search(corpus, '"streaming pipelines"', id_col="doc_id")
        assert set(out.doc_id) == {1}

    def test_field_filter(self, corpus):
        out = search.keyword_search(corpus, "source:s2 data", id_col="doc_id")
        assert set(out.doc_id) == {4}

    def test_inverted_index(self, corpus):
        idx = search.build_inverted_index(corpus, "text", "doc_id").to_pandas()
        m = {r.term: (r.df, list(r.postings)) for r in idx.itertuples()}
        assert m["data"][0] == 3 and m["data"][1] == [1, 2, 4]
        assert m["cat"][1] == [3]


class TestEmbed:
    def test_embed_and_resume(self, corpus, tmp_path):
        root = str(tmp_path / "vec")
        r1 = embed.embed_corpus(corpus, root, "doc_id", "text", concurrency=2)
        assert r1["embedded"] == 4 and r1["skipped"] == 0
        vecs = embed.load_vectors(root).to_pandas()
        assert len(vecs) == 4 and len(vecs.embedding.iloc[0]) == embed.EMBED_DIM
        # deterministic
        e = embed.HashEmbedder()
        v1 = e.encode(["ray data engine"])[0]
        v2 = e.encode(["ray data engine"])[0]
        assert np.allclose(v1, v2) and abs(np.linalg.norm(v1) - 1.0) < 1e-5
        # resume: second run embeds nothing new (J2 anti-join)
        r2 = embed.embed_corpus(corpus, root, "doc_id", "text", concurrency=2)
        assert r2["embedded"] == 0 and r2["skipped"] == 4

    def test_semantic_search_roundtrip(self, corpus, tmp_path):
        root = str(tmp_path / "vec")
        embed.embed_corpus(corpus, root, "doc_id", "text", concurrency=2)
        vecs = embed.load_vectors(root).map_batches(
            lambda t: t.rename_columns(["vec_id", "embedding"]), batch_format="pyarrow"
        )
        q = embed.HashEmbedder().encode(["streaming data pipelines shuffle blocks"])[0]
        out = search.semantic_search(corpus, vecs, q, id_col="doc_id", k=2,
                                     meta_cols=["source"])
        assert list(out.doc_id)[0] == 2  # exact text match wins
        assert out.similarity.iloc[0] > 0.99
        assert list(out["rank"]) == [1, 2]


def _img_table():
    import pyarrow as pa

    from pubcrawl.hashing import xxh64
    from pubcrawl.imaging import encode_image, phash64

    rows = {k: [] for k in ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]}
    for i in range(4):
        img, fmt, q = procedural_image(100 + i, 16, 40)
        enc = encode_image(img, fmt, q)
        rows["image_id"].append(f"img_{i}")
        rows["bytes"].append(enc)
        rows["w"].append(img.shape[1])
        rows["h"].append(img.shape[0])
        rows["fmt"].append(fmt)
        rows["caption"].append(f"caption {i}")
        rows["phash"].append(phash64(decode_image(enc, fmt)))
    from pubcrawl.schemas import IMAGE_CAPTION

    return pa.table(rows, schema=IMAGE_CAPTION)


class TestMultimodal:
    def test_decode_verify(self):
        ds = rd.from_arrow(_img_table())
        out = multimodal.image_pipeline(ds, multimodal.DecodeVerify, concurrency=2).to_pandas()
        assert out.valid.all()
        assert "bytes" not in out.columns

    def test_resize(self):
        ds = rd.from_arrow(_img_table())
        out = multimodal.image_pipeline(ds, multimodal.Resize, out_w=8, out_h=8).to_pandas()
        thumb = png_decode(out.thumb.iloc[0])
        assert thumb.shape == (8, 8, 3)

    def test_features(self):
        ds = rd.from_arrow(_img_table())
        out = multimodal.image_pipeline(ds, multimodal.ImageFeatures).to_pandas()
        v = np.asarray(out.features.iloc[0])
        assert v.shape == (30,) and abs(v[:24].sum() - 3.0) < 1e-3  # 3 normalized histograms

    def test_frame_sample_stub(self):
        ds = rd.from_arrow(_img_table())
        with pytest.raises(Exception):
            multimodal.image_pipeline(ds, multimodal.FrameSample).to_pandas()
        out = multimodal.image_pipeline(
            ds, multimodal.FrameSample, deterministic_fake=True, n_frames=2
        ).to_pandas()
        assert all(len(f) == 2 for f in out.frames)
        png_decode(out.frames.iloc[0][0])  # frames decode


class TestAnalysis:
    def _papers(self):
        return rd.from_items(
            [
                {"id": 1, "title": "graph attention networks", "abstract": "transformer attention",
                 "year": 2023, "decision": "Oral", "avg_rating": 8.0},
                {"id": 2, "title": "cnn image models", "abstract": "vision transformer",
                 "year": 2023, "decision": "Reject", "avg_rating": 4.0},
                {"id": 3, "title": "diffusion models", "abstract": "generative diffusion",
                 "year": 2024, "decision": "Poster", "avg_rating": 6.0},
            ]
        )

    TAX = {"transformers": ["transformer", "attention"], "generative": ["diffusion", "generative"]}

    def test_classify_and_stats(self):
        ds = analysis.classify_topics(self._papers(), ["title", "abstract"], self.TAX)
        stats = analysis.topic_stats(
            ds, "topics", metric_col="avg_rating", category_col="decision",
            accept_categories=("Oral", "Poster"), reject_category="Reject",
        )
        row = stats[stats.topic == "transformers"].iloc[0]
        assert row.paper_count == 2
        assert row.avg_metric == 6.0
        assert row.acceptance_rate == 50.0
        g = stats[stats.topic == "generative"].iloc[0]
        assert g.paper_count == 1 and g.acceptance_rate == 100.0

    def test_year_pivot(self):
        ds = analysis.classify_topics(self._papers(), ["title", "abstract"], self.TAX)
        pv = analysis.year_topic_pivot(ds, "year", "topics")
        assert pv.loc[2023, "transformers"] == 100.0

    def test_sinks(self, tmp_path):
        df = pd.DataFrame(
            {"title": ["t1"], "authors": [["a", "b"]], "abstract": ["x"], "extra": [1]}
        )
        p = analysis.save_csv(df, str(tmp_path / "out.csv"))
        content = open(p, encoding="utf-8-sig").read()
        assert content.splitlines()[0].startswith("title,authors,abstract")
        assert "a, b" in content
        analysis.save_markdown(df, str(tmp_path / "r.md"), "Report")
        assert "## 1. t1" in open(tmp_path / "r.md").read()
        analysis.save_summary_txt(df, str(tmp_path / "s.txt"), ("title", "extra"))
        assert "title: t1" in open(tmp_path / "s.txt").read()

    def test_word_frequencies(self):
        ds = rd.from_items([{"t": "alpha beta beta gamma gamma gamma"}])
        out = analysis.word_frequencies(ds, ["t"], frozenset(), top_n=2)
        assert list(out.word) == ["gamma", "beta"]


class TestReportUtils:
    def test_sanitize(self):
        assert analysis.sanitize_filename('a/b:c*d?"e"<f>|g') == "abcdefg"
        assert len(analysis.sanitize_filename("x" * 500)) == 150

    def test_format_for_prompt(self):
        df = pd.DataFrame({"title": ["T1", "T2"], "abstract": ["A1", "A2"]})
        out = analysis.format_for_prompt(df, k=1)
        assert out == "[1] title: T1 | abstract: A1"

    def test_export_bundle(self, tmp_path):
        import zipfile

        df = pd.DataFrame({"image_id": ["x/1", "y2"], "bytes": [b"aa", b"bb"], "w": [1, 2]})
        p = analysis.export_bundle(df, str(tmp_path / "b.zip"), payload_col="bytes",
                                   summary_cols=("image_id", "w"))
        with zipfile.ZipFile(p) as zf:
            names = set(zf.namelist())
            assert "summary.txt" in names and "payload/x1.bin" in names
            assert zf.read("payload/y2.bin") == b"bb"

    def test_svg_sinks(self, tmp_path):
        df = pd.DataFrame({"topic": ["a", "b"], "n": [10, 5]})
        p = analysis.save_barh_svg(df, "topic", "n", str(tmp_path / "bar.svg"), title="T")
        svg = open(p).read()
        assert svg.startswith("<svg") and svg.count("<rect") == 2 and "</svg>" in svg
        freqs = pd.DataFrame({"word": ["big", "small"], "n": [100, 1]})
        p2 = analysis.save_wordcloud_svg(freqs, str(tmp_path / "wc.svg"))
        svg2 = open(p2).read()
        assert "big" in svg2 and "small" in svg2
        import re as _re

        sizes = [int(m) for m in _re.findall(r'font-size="(\d+)"', svg2)]
        assert max(sizes) > min(sizes)

    def test_save_search_results(self, tmp_path):
        df = pd.DataFrame({"title": ["hit"], "score": [1.0]})
        p = analysis.save_search_results(df, str(tmp_path), "my query")
        assert "Search results for: my query" in open(p).read()

    def test_csv_roundtrip_via_ray(self, tmp_path):
        # S10-style reload: K1 CSV output is readable back by ray.data.read_csv
        df = pd.DataFrame({"title": ["t1", "t2"], "authors": [["a"], ["b", "c"]],
                           "abstract": ["x", "y"], "year": [2023, 2024]})
        p = analysis.save_csv(df, str(tmp_path / "out.csv"))
        back = rd.read_csv(p).to_pandas()
        assert list(back.columns)[:3] == ["title", "authors", "abstract"]
        assert list(back.year) == [2023, 2024]
        assert list(back.authors) == ["a", "b, c"]


class TestStemming:
    def test_porter_goldens(self):
        from pubcrawl.stem import porter_stem

        golden = {
            "caresses": "caress", "ponies": "poni", "cats": "cat",
            "feed": "feed", "agreed": "agre", "plastered": "plaster",
            "motoring": "motor", "conflated": "conflat", "hopping": "hop",
            "happy": "happi", "sky": "sky", "relational": "relat",
            "operator": "oper", "feudalism": "feudal", "formalize": "formal",
            "electriciti": "electr", "hopeful": "hope", "goodness": "good",
            "allowance": "allow", "inference": "infer", "adjustable": "adjust",
            "replacement": "replac", "adoption": "adopt", "activate": "activ",
            "effective": "effect", "windows": "window", "window": "window",
            "running": "run", "connection": "connect", "connections": "connect",
        }
        assert {w: porter_stem(w) for w in golden} == golden

    def test_keyword_search_stemming_recall(self):
        """FTS5-porter parity: with stem=True, querying 'windows' matches
        docs containing 'window'; with stem=False (default) it does not."""
        import ray.data as rd

        corpus = rd.from_items(
            [
                {"doc_id": 1, "text": "the window opens onto the stream"},
                {"doc_id": 2, "text": "several windows were running fine"},
                {"doc_id": 3, "text": "nothing relevant here at all"},
            ]
        )
        hit = search.keyword_search(corpus, "windows", k=10, stem=True)
        assert sorted(hit.doc_id) == [1, 2]
        raw = search.keyword_search(corpus, "windows", k=10, stem=False)
        assert sorted(raw.doc_id) == [2]

    def test_inverted_index_stemmed_terms(self):
        import ray.data as rd

        corpus = rd.from_items(
            [
                {"doc_id": 1, "text": "connection"},
                {"doc_id": 2, "text": "connections connected"},
            ]
        )
        idx = search.build_inverted_index(corpus, "text", "doc_id", stem=True).to_pandas()
        m = {r.term: (r.df, list(r.postings)) for r in idx.itertuples()}
        assert m["connect"][0] == 2 and m["connect"][1] == [1, 2]


class TestService:
    """Serving-layer flows (reference FastAPI routes + Streamlit session:
    /root/reference/src/api/main.py:90-110, streamlit_app.py:68-245)."""

    @pytest.fixture()
    def session(self, tmp_path):
        import ray.data as rd

        from pubcrawl import service
        from pubcrawl import embed as embedmod

        docs = rd.from_items(
            [
                {"doc_id": i, "text": t, "conference": c, "year": y}
                for i, (t, c, y) in enumerate(
                    [
                        ("window stream processing engine", "ICML", 2023),
                        ("stream window analysis pipeline", "ICML", 2024),
                        ("graph neural network training", "NeurIPS", 2023),
                        ("window functions for databases", "NeurIPS", 2024),
                        ("unrelated botany field notes", "ICML", 2023),
                    ]
                )
            ]
        )
        root = str(tmp_path / "vec")
        embedmod.embed_corpus(docs, root, "doc_id", "text", concurrency=2)
        vecs = embedmod.load_vectors(root).map_batches(
            lambda t: t.rename_columns(["vec_id", "embedding"]), batch_format="pyarrow"
        )
        return service.SearchSession(
            docs, vecs, embedmod.HashEmbedder(),
            meta_cols=["conference", "year"],
        )

    def test_keyword_dispatch_stats_and_pagination(self, session):
        out = session.search("window", top_n=10)
        ids = set(out["results"].doc_id)
        assert ids == {0, 1, 3}
        stats = out["stats"]
        assert stats["total_found"] == 3
        assert sum(stats["distribution"].values()) == 3
        rows, info = session.page(1, per_page=2)
        assert len(rows) == 2 and info["total_pages"] == 2
        rows, info = session.page(99, per_page=2)  # clamped
        assert info["page"] == 2 and len(rows) == 1

    def test_sem_prefix_dispatch(self, session):
        out = session.search("sem: stream window analysis pipeline", top_n=3)
        assert list(out["results"].doc_id)[0] == 1  # exact text match ranks first
        assert "similarity" in out["results"].columns

    def test_filters_and_reset(self, session):
        session.search("window", top_n=10)
        filtered = session.set_filters(conference="ICML")
        assert set(filtered.doc_id) == {0, 1}
        session.page(2, per_page=1)
        session.search("window", top_n=10)  # new search resets
        assert session.current_page == 1 and len(session.filtered) == 3
        ctx = session.prompt_context(k=2)
        assert ctx.count("[") >= 2


def test_bm25_vectorized_matches_loop_scores(corpus):
    """The vectorized (default) scoring path and the per-doc loop path (the
    stem=True path with identity-stemming query) must produce identical BM25
    scores on a corpus with no stemmable query terms."""
    # 'data' and 'engine' are already porter stems → stem=True is a no-op
    a = search.keyword_search(corpus, "data engine", id_col="doc_id", k=10, stem=False)
    b = search.keyword_search(corpus, "data engine", id_col="doc_id", k=10, stem=True)
    assert list(a.doc_id) == list(b.doc_id)
    assert np.allclose(a.score.to_numpy(), b.score.to_numpy())


def test_audio_features_stage_shape_and_determinism():
    """AudioFeatures actor stage: binary in → fixed-width list<float32> out,
    deterministic across runs and block layouts; codec honestly gated."""
    import pyarrow as pa
    import pytest as _pytest
    import ray.data as rd

    from pubcrawl import multimodal as mm

    rows = [{"audio_id": f"a{i}", "bytes": bytes([i % 251]) * 64} for i in range(12)]
    outs = []
    for parts in (2, 5):
        ds = rd.from_items(rows).repartition(parts)
        out = mm.image_pipeline(
            ds, mm.AudioFeatures, concurrency=2, batch_size=4,
            deterministic_fake=True,
        ).to_pandas().sort_values("audio_id").reset_index(drop=True)
        assert list(out.columns) == ["audio_id", "audio_features"]
        assert all(len(v) == 2 + mm.AudioFeatures.N_BANDS for v in out["audio_features"])
        outs.append(out)
    for a, b in zip(outs[0]["audio_features"], outs[1]["audio_features"]):
        assert np.allclose(np.asarray(a), np.asarray(b))
    # real-codec path is honestly gated
    tbl = pa.table({"audio_id": ["x"], "bytes": [b"\x00"]})
    with _pytest.raises(NotImplementedError):
        mm.AudioFeatures()(tbl)


class TestApi:
    """HTTP API layer (reference /root/reference/src/api/main.py:90-140):
    the stdlib server is driven end-to-end over a real socket; the FastAPI
    frontend is import-guarded (absent in this sandbox)."""

    @pytest.fixture()
    def api(self, tmp_path):
        import ray.data as rd

        from pubcrawl import api as apimod
        from pubcrawl import embed as embedmod
        from pubcrawl import service

        docs = rd.from_items(
            [
                {"doc_id": i, "text": t, "conference": c, "year": y}
                for i, (t, c, y) in enumerate(
                    [
                        ("window stream processing engine", "ICML", 2023),
                        ("stream window analysis pipeline", "ICML", 2024),
                        ("graph neural network training", "NeurIPS", 2023),
                        ("window functions for databases", "NeurIPS", 2024),
                        ("unrelated botany field notes", "ICML", 2023),
                    ]
                )
            ]
        )
        root = str(tmp_path / "vec")
        embedmod.embed_corpus(docs, root, "doc_id", "text", concurrency=2)
        vecs = embedmod.load_vectors(root).map_batches(
            lambda t: t.rename_columns(["vec_id", "embedding"]), batch_format="pyarrow"
        )
        session = service.SearchSession(
            docs, vecs, embedmod.HashEmbedder(), meta_cols=["conference", "year"]
        )
        srv, port = apimod.serve_background(session)
        yield port
        srv.shutdown()

    @staticmethod
    def _call(port, method, path, payload=None):
        import json as _json
        import urllib.error
        import urllib.request

        data = _json.dumps(payload or {}).encode() if method == "POST" else None
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}", data=data, method=method,
            headers={"Content-Type": "application/json"},
        )
        try:
            with urllib.request.urlopen(req, timeout=30) as resp:
                return resp.status, _json.loads(resp.read())
        except urllib.error.HTTPError as e:
            return e.code, _json.loads(e.read())

    def test_search_route_keyword_and_stats(self, api):
        st, body = self._call(api, "POST", "/search", {"query": "window", "top_n": 10})
        assert st == 200 and body["message"] == "ok"
        assert {r["doc_id"] for r in body["results"]} == {0, 1, 3}
        assert body["stats"]["total_found"] == 3
        st, body = self._call(api, "GET", "/stats")
        assert st == 200 and body["total_found"] == 3

    def test_search_route_semantic_and_pagination(self, api):
        st, body = self._call(api, "POST", "/search",
                              {"query": "sem: stream window analysis pipeline", "top_n": 3})
        assert st == 200 and body["results"][0]["doc_id"] == 1
        assert "similarity" in body["results"][0]
        st, body = self._call(api, "POST", "/page", {"page": 99, "per_page": 2})
        assert st == 200 and body["page"] == 2 and len(body["results"]) == 1

    def test_dashboard_html_served_at_root(self, api):
        """GET / serves the single-file dashboard as text/html; its JS drives
        the SAME JSON routes this class already exercises end-to-end."""
        import urllib.request

        with urllib.request.urlopen(f"http://127.0.0.1:{api}/", timeout=30) as resp:
            assert resp.status == 200
            assert resp.headers["Content-Type"].startswith("text/html")
            html = resp.read().decode("utf-8")
        assert "<!DOCTYPE html>" in html
        for endpoint in ("/search", "/stats", "/page", "/chat"):
            assert endpoint in html  # the page is a client of every route

    def test_error_routes(self, api):
        st, body = self._call(api, "POST", "/search", {"query": "sem:  ", "top_n": 5})
        assert st == 400
        st, body = self._call(api, "POST", "/search", {"query": "x", "top_n": 0})
        assert st == 400
        # per_page/page bounds: malformed client input is a 400, never a 500
        # (per_page=0 used to reach paginate and ZeroDivisionError)
        st, body = self._call(api, "POST", "/page", {"page": 1, "per_page": 0})
        assert st == 400
        st, body = self._call(api, "POST", "/page", {"page": 0, "per_page": 5})
        assert st == 400
        st, body = self._call(api, "POST", "/page", {"page": 1, "per_page": 101})
        assert st == 400
        st, body = self._call(api, "POST", "/chat",
                              {"current_message": "hi", "search_results_context": [{"title": "t"}]})
        assert st == 503  # no AI backend configured (reference parity)
        st, body = self._call(api, "GET", "/nope")
        assert st == 404

    def test_chat_route_with_injected_backend(self, tmp_path):
        import ray.data as rd

        from pubcrawl import api as apimod
        from pubcrawl import service

        docs = rd.from_items([{"doc_id": 0, "text": "t"}])
        session = service.SearchSession(docs)
        srv, port = apimod.serve_background(
            session, chat_fn=lambda hist, ctx: f"echo:{hist[-1]['content']}:{len(ctx)}"
        )
        try:
            st, body = self._call(
                port, "POST", "/chat",
                {"chat_history": [{"role": "user", "content": "a"}],
                 "current_message": "hello",
                 "search_results_context": [{"title": "x"}]},
            )
            assert st == 200 and body["response"] == "echo:hello:1"
            st, _ = self._call(port, "POST", "/chat", {"current_message": "hi"})
            assert st == 400  # context required (reference parity)
        finally:
            srv.shutdown()

    def test_fastapi_factory_import_guard(self):
        from pubcrawl import api as apimod
        from pubcrawl import service

        try:
            import fastapi  # noqa: F401
            pytest.skip("fastapi installed — guard not exercised")
        except ImportError:
            pass
        import ray.data as rd

        with pytest.raises(ImportError, match="fastapi"):
            apimod.make_fastapi_app(service.SearchSession(rd.from_items([{"doc_id": 0, "text": "t"}])))


class TestPlotBackends:
    """K8/K9 real-backend seats (import-guarded) + dependency-free fallbacks."""

    def test_stacked_barh_svg(self, tmp_path):
        from pubcrawl import analysis

        pivot = pd.DataFrame(
            {"Oral": [2, 0], "Poster": [3, 5], "Reject": [5, 5]},
            index=["topic a", "topic b"],
        )
        p = analysis.save_stacked_barh(pivot, str(tmp_path / "d.png"), "decisions")
        content = open(p).read() if p.endswith(".svg") else None
        if content is not None:  # fallback ran (no matplotlib here)
            assert content.startswith("<svg") and "topic a" in content

    def test_stackplot_svg(self, tmp_path):
        from pubcrawl import analysis

        pivot = pd.DataFrame(
            {"cv": [30.0, 40.0, 20.0], "nlp": [70.0, 60.0, 80.0]},
            index=[2022, 2023, 2024],
        )
        p = analysis.save_stackplot(pivot, str(tmp_path / "y.png"), "shares")
        if p.endswith(".svg"):
            content = open(p).read()
            assert content.startswith("<svg") and "polygon" in content

    def test_wordcloud_backend_or_fallback(self, tmp_path):
        from pubcrawl import analysis

        freqs = pd.DataFrame({"word": ["alpha", "beta", "gamma"], "n": [9, 5, 2]})
        p = analysis.save_wordcloud(freqs, str(tmp_path / "wc.png"))
        assert p.endswith((".png", ".svg"))
        if p.endswith(".svg"):
            assert "alpha" in open(p).read()

    def test_summary_table_csv_and_html(self, tmp_path):
        from pubcrawl import analysis

        df = pd.DataFrame(
            {"Topic_Name": ["a", "b"], "paper_count": [9, 3], "acceptance_rate": [0.5, 0.25]}
        )
        csv_path, html_path = analysis.save_summary_table(
            df, str(tmp_path / "summary"), "caption",
            bar_cols=("paper_count",), pct_cols=("acceptance_rate",),
        )
        assert open(csv_path, encoding="utf-8-sig").readline().startswith("Topic_Name")
        html = open(html_path).read()
        assert "caption" in html and "50.00%" in html

    @pytest.mark.skipif(
        importlib.util.find_spec("matplotlib") is None,
        reason="matplotlib not installed",
    )
    def test_real_matplotlib_backend(self, tmp_path):
        from pubcrawl import analysis

        df = pd.DataFrame({"t": ["a", "b"], "n": [3, 1]})
        p = analysis.save_barh(df, "t", "n", str(tmp_path / "r.png"), "rank")
        assert p.endswith(".png")


def test_api_bad_int_params_are_400(tmp_path):
    """Client input errors (non-integer top_n/page) are 400s, never 500s."""
    from pubcrawl import api, service

    docs = rd.from_items([{"doc_id": 0, "text": "alpha beta"}])
    srv, port = api.serve_background(service.SearchSession(docs))
    try:
        call = TestApi._call
        st, body = call(port, "POST", "/search", {"query": "x", "top_n": "abc"})
        assert st == 400 and "top_n" in body["detail"]
        st, body = call(port, "POST", "/page", {"page": [], "per_page": 2})
        assert st == 400 and "page" in body["detail"]
    finally:
        srv.shutdown()


def test_svg_sinks_escape_xml_labels(tmp_path):
    """Labels holding & < > must yield well-formed SVG in every writer."""
    import xml.etree.ElementTree as ET

    df = pd.DataFrame({"t": ["R&D <x>", "b"], "n": [3, 1]})
    p1 = analysis.save_barh_svg(df, "t", "n", str(tmp_path / "a.svg"), title="a&b")
    pv = pd.DataFrame({"O&r<al": [1, 2], "Rej": [3, 4]}, index=["t&1", "t<2"])
    p2 = analysis.save_stacked_barh_svg(pv, str(tmp_path / "b.svg"), "d&e")
    p3 = analysis.save_stackplot_svg(
        pd.DataFrame({"c&v": [1.0, 2.0]}, index=[2023, 2024]), str(tmp_path / "c.svg")
    )
    freqs = pd.DataFrame({"word": ["a&b", "c<d"], "n": [2, 1]})
    p4 = analysis.save_wordcloud_svg(freqs, str(tmp_path / "d.svg"))
    for p in (p1, p2, p3, p4):
        ET.parse(p)  # raises on ill-formed XML
