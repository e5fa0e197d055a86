"""Tests for crawl text enrichment, sketches, simhash, and the CLI."""

import json
import subprocess
import sys

import numpy as np
import pytest

from web_graph_ray.functions.text import detect_lang, quality_metrics, simhash64


class TestSimhash:
    def test_deterministic(self):
        assert simhash64("hello world " * 50) == simhash64("hello world " * 50)

    def test_similar_texts_close(self):
        a = simhash64("the quick brown fox jumps over the lazy dog " * 20)
        b = simhash64("the quick brown fox jumps over the lazy dogs " * 20)
        c = simhash64("completely different content about databases " * 20)
        ham = lambda x, y: bin((x ^ y) & 0xFFFFFFFFFFFFFFFF).count("1")
        assert ham(a, b) < ham(a, c)

    def test_empty_and_short(self):
        assert simhash64("") == 0
        assert isinstance(simhash64("ab"), int)

    def test_signed_int64_range(self):
        for t in ("x" * 100, "q9$#@!" * 40, "ünïcødé " * 30):
            v = simhash64(t)
            assert -(1 << 63) <= v < (1 << 63)


class TestLangQuality:
    def test_langid_languages(self):
        assert detect_lang("the cat and the dog sat on the mat for a while") == "en"
        assert detect_lang("der Hund und die Katze sind nicht mit dem Mann") == "de"
        assert detect_lang("le chat est dans la maison pour le moment") == "fr"
        assert detect_lang("") == "und"
        assert detect_lang("12345 67890") == "und"

    def test_quality_metrics_boundary(self):
        m = quality_metrics("")
        assert m["n_chars"] == 0 and m["n_tokens"] == 0 and m["alpha_ratio"] == 0.0
        m = quality_metrics("abc 123!")
        assert m["n_tokens"] == 2
        assert m["alpha_ratio"] == 3 / 8
        assert m["digit_ratio"] == 3 / 8


class TestHLL:
    def test_accuracy(self):
        from web_graph_ray.stages.sketch import _hll_add_batch, _hll_estimate

        for n in (100, 5000, 50000):
            reg = np.zeros(1 << 12, dtype=np.uint8)
            _hll_add_batch(reg, range(n), 12)
            est = _hll_estimate(reg)
            assert abs(est / n - 1) < 0.05, (n, est)

    def test_merge_invariance(self):
        """Sketch of a union == merge of partial sketches (mergeability —
        the property that makes it a one-row-per-batch combiner)."""
        from web_graph_ray.stages.sketch import _hll_add_batch

        whole = np.zeros(1 << 12, dtype=np.uint8)
        _hll_add_batch(whole, range(10000), 12)
        a = np.zeros(1 << 12, dtype=np.uint8)
        b = np.zeros(1 << 12, dtype=np.uint8)
        _hll_add_batch(a, range(0, 6000), 12)
        _hll_add_batch(b, range(4000, 10000), 12)
        assert np.array_equal(whole, np.maximum(a, b))


class TestBloom:
    def test_no_false_negatives_and_low_fp(self):
        import hashlib

        from web_graph_ray.state.seen import BloomFilter

        ids = [hashlib.sha1(str(i).encode()).hexdigest() for i in range(30000)]
        bf = BloomFilter.sized_for(15000)
        bf.add_many(ids[:15000])
        assert bf.contains_many(ids[:15000]).all()  # never a false negative
        assert bf.contains_many(ids[15000:]).mean() < 0.01

    def test_overfull_and_roundtrip(self, tmp_path):
        import hashlib

        from web_graph_ray.state.seen import BloomFilter, load_bloom, save_bloom

        ids = [hashlib.sha1(str(i).encode()).hexdigest() for i in range(10000)]
        bf = BloomFilter(1 << 16)
        bf.add_many(ids)
        assert bf.overfull  # 10k ids * 16 bits > 65536
        save_bloom(str(tmp_path), 3, bf, through_round=7)
        loaded, through = load_bloom(str(tmp_path), 3)
        assert through == 7
        assert loaded.contains_many(ids).all()
        assert (loaded.bits == bf.bits).all()
        assert load_bloom(str(tmp_path), 99) == (None, -1)


class TestCuckoo:
    @staticmethod
    def _ids(lo, hi):
        import hashlib

        return [hashlib.sha1(str(i).encode()).hexdigest() for i in range(lo, hi)]

    def test_no_false_negatives_and_low_fp(self):
        from web_graph_ray.state.seen import CuckooFilter

        ids = self._ids(0, 30000)
        cf = CuckooFilter.sized_for(15000)
        cf.add_many(ids[:15000])
        assert cf.contains_many(ids[:15000]).all()  # never a false negative
        # 16-bit fingerprints, 2 buckets × 4 slots ⇒ fp rate ≈ 8/2^16
        assert cf.contains_many(ids[15000:]).mean() < 0.01

    def test_delete_restores_novelty(self):
        from web_graph_ray.state.seen import CuckooFilter

        ids = self._ids(0, 5000)
        cf = CuckooFilter.sized_for(5000)
        cf.add_many(ids)
        expired, kept = ids[:2000], ids[2000:]
        assert cf.delete_many(expired) == 2000
        assert cf.contains_many(kept).all()  # survivors still gated
        # expired ids read as novel again (minus residual fp collisions)
        assert cf.contains_many(expired).mean() < 0.01
        assert cf.count == 3000

    def test_stash_never_drops_and_overfull(self):
        from web_graph_ray.state.seen import CuckooFilter

        ids = self._ids(0, 9000)
        cf = CuckooFilter(1 << 11)  # 8192 slots ⇒ forced past 95% load
        cf.add_many(ids)
        assert cf.contains_many(ids).all()  # stash preserves every insert
        assert cf.overfull  # caller regrows, exactly like the Bloom path

    def test_gate_roundtrip_and_kind_sniffing(self, tmp_path):
        from web_graph_ray.state.seen import (
            BloomFilter, CuckooFilter, load_gate, make_gate, save_gate,
        )

        ids = self._ids(0, 4000)
        cf = make_gate("cuckoo", 4000)
        assert isinstance(cf, CuckooFilter)
        cf.add_many(ids)
        save_gate(str(tmp_path), 3, cf, through_round=7)
        loaded, through = load_gate(str(tmp_path), 3)
        assert isinstance(loaded, CuckooFilter) and through == 7
        assert loaded.contains_many(ids).all()
        assert (loaded.table == cf.table).all() and loaded.count == cf.count

        bf = make_gate("bloom", 4000)
        assert isinstance(bf, BloomFilter)
        bf.add_many(ids)
        save_gate(str(tmp_path), 4, bf, through_round=9)
        loaded2, through2 = load_gate(str(tmp_path), 4)
        assert isinstance(loaded2, BloomFilter) and through2 == 9
        assert loaded2.contains_many(ids).all()
        assert load_gate(str(tmp_path), 99) == (None, -1)

        import pytest as _pytest

        with _pytest.raises(ValueError):
            make_gate("quotient", 100)

    def test_multicopy_add_delete(self):
        """TTL-window semantics: one fingerprint copy per (id, active
        round) — re-adding an id stacks a copy, each round-expiry delete
        removes exactly one, and the id stays gated while ≥1 remains."""
        from web_graph_ray.state.seen import CuckooFilter

        pid = self._ids(0, 1)
        cf = CuckooFilter.sized_for(100)
        cf.add_many(pid)
        cf.add_many(pid)  # active in two window rounds
        assert cf.delete_many(pid) == 1
        assert cf.contains_many(pid).all()  # second copy still gates
        assert cf.delete_many(pid) == 1
        assert not cf.contains_many(pid).any()
        assert cf.count == 0

    def test_deterministic_across_construction(self):
        """Same ids ⇒ identical lookups regardless of insert grouping —
        the sidecar must be a deterministic function of the id set for
        crash-rerun overwrites to be byte-safe reads."""
        from web_graph_ray.state.seen import CuckooFilter

        ids = self._ids(0, 6000)
        a = CuckooFilter.sized_for(6000)
        a.add_many(ids)
        b = CuckooFilter.sized_for(6000)
        for k in range(0, 6000, 500):
            b.add_many(ids[k : k + 500])
        probe = self._ids(6000, 12000)
        assert (a.contains_many(probe) == b.contains_many(probe)).all()


class TestEnrichment:
    def test_extract_emitter_features(self):
        import pyarrow as pa

        from web_graph_ray.stages.extract import make_extract_emitter

        batch = pa.Table.from_pydict(
            {
                "url": ["https://x.com/a"],
                "page_id": ["p"], "hostname": ["x.com"], "host": ["x.com"],
                "path": ["/a"], "bucket": pa.array([0], type=pa.int32()),
                "seq": ["0000000"], "depth": pa.array([0], type=pa.int32()),
                "priority": pa.array([0], type=pa.int32()), "discovered_from": [""],
                "status": ["ok"],
                "html": [b"<html><body>the cat and the dog went to the house</body></html>"],
            }
        )
        out = make_extract_emitter(0, 4, enrich=True)(batch)
        text_rows = out.filter(pa.compute.equal(out["row_type"], "text"))
        assert text_rows.num_rows == 1
        assert text_rows["lang_pred"][0].as_py() == "en"
        assert text_rows["n_tokens"][0].as_py() == 9
        assert text_rows["simhash"][0].as_py() is not None
        # enrich off → nulls
        out2 = make_extract_emitter(0, 4, enrich=False)(batch)
        t2 = out2.filter(pa.compute.equal(out2["row_type"], "text"))
        assert t2["lang_pred"][0].as_py() is None


class TestParallelismInvariance:
    def test_outputs_identical_across_cpu_counts(self, tmp_path):
        """SURVEY §5.3: byte-identical crawl outputs at different
        parallelism (fresh Ray session per level via the CLI)."""
        from web_graph_ray.sources.synth import CorpusConfig, seed_urls, write_corpus

        ccfg = CorpusConfig(n_pages=100, seed=3)
        corpus = write_corpus(str(tmp_path / "corpus"), ccfg)
        seeds_file = tmp_path / "seeds.txt"
        seeds_file.write_text("\n".join(seed_urls(ccfg)))

        results = {}
        for ncpu in (2, 4):
            out = subprocess.run(
                [sys.executable, "-m", "web_graph_ray.pipelines",
                 "--corpus", corpus, "--work", str(tmp_path / f"work{ncpu}"),
                 "--seeds-file", str(seeds_file), "--num-cpus", str(ncpu),
                 "--buckets", "4", "--budget", "3", "--robots"],
                capture_output=True, text=True, timeout=300, cwd="/root/repo",
            )
            assert out.returncode == 0, out.stderr[-2000:]
            results[ncpu] = json.loads(out.stdout)

        assert results[2]["counters"] == results[4]["counters"]
        assert results[2]["pages"] == results[4]["pages"]
        assert results[2]["links"] == results[4]["links"]
        # visits byte-identical (sorted emissions content)
        import duckdb

        def visits(ncpu):
            return duckdb.sql(
                f"select page_id, round, seq, status from read_parquet("
                f"'{tmp_path}/work{ncpu}/rounds/*/emissions/to_bucket=-1/*.parquet')"
                f" where row_type='visit' order by round, priority, seq"
            ).df()
        import pandas as pd

        pd.testing.assert_frame_equal(visits(2), visits(4))


class TestCorpusWithoutContentType:
    def test_crawl_handles_missing_content_type(self, ray_session, tmp_path):
        """input_hint's 5-column schema (no content_type) must work:
        prepare() synthesizes text/html for every row."""
        import pyarrow.parquet as pq2

        from web_graph_ray.config import CrawlConfig
        from web_graph_ray.pipelines.crawl import CrawlEngine
        from web_graph_ray.sources.synth import CorpusConfig, seed_urls, write_corpus

        ccfg = CorpusConfig(n_pages=60, seed=5)
        full = write_corpus(str(tmp_path / "c"), ccfg)
        t = pq2.read_table(full).drop_columns(["content_type"])
        bare = str(tmp_path / "bare.parquet")
        pq2.write_table(t, bare)
        cfg = CrawlConfig(num_buckets=4, work_dir=str(tmp_path / "w"), respect_robots=False)
        eng = CrawlEngine(bare, cfg)
        eng.run(seed_urls(ccfg))
        counters = eng.counters()
        assert sum(c["fetched"] for c in counters) > 20
        # non-HTML pages become fetchable now (no gate input) — but dead
        # links are still dead
        assert sum(c["dead"] for c in counters) >= 1


class TestCLI:
    def test_cli_crawl_and_resume(self, tmp_path):
        from web_graph_ray.sources.synth import CorpusConfig, seed_urls, write_corpus

        ccfg = CorpusConfig(n_pages=80, seed=11)
        corpus = write_corpus(str(tmp_path / "corpus"), ccfg)
        seeds_file = tmp_path / "seeds.txt"
        seeds_file.write_text("\n".join(seed_urls(ccfg)))

        def run(extra):
            out = subprocess.run(
                [sys.executable, "-m", "web_graph_ray.pipelines",
                 "--corpus", corpus, "--work", str(tmp_path / "work"),
                 "--num-cpus", "4", "--buckets", "4"] + extra,
                capture_output=True, text=True, timeout=300, cwd="/root/repo",
            )
            assert out.returncode == 0, out.stderr[-2000:]
            return json.loads(out.stdout)

        first = run(["--seeds-file", str(seeds_file), "--max-rounds", "2"])
        assert first["summary"]["rounds"] == 2
        # resume without seeds
        second = run([])
        assert second["summary"]["rounds"] >= first["summary"]["rounds"]
        assert second["pages"] >= first["pages"]

    def test_cli_fresh_without_seeds_errors(self, tmp_path):
        out = subprocess.run(
            [sys.executable, "-m", "web_graph_ray.pipelines",
             "--corpus", "x.parquet", "--work", str(tmp_path / "w")],
            capture_output=True, text=True, timeout=60, cwd="/root/repo",
        )
        assert out.returncode != 0
        assert "seeds" in out.stderr


class TestServeAPI:
    """HTTP layer e2e: the 7 reference routes (cmd/link-api/main.go:87-191)
    served from a crawled work dir, shapes matching the gin handlers."""

    @pytest.fixture(scope="class")
    def served(self, ray_session, tmp_path_factory):
        import threading
        from web_graph_ray.config import CrawlConfig
        from web_graph_ray.pipelines.crawl import CrawlEngine
        from web_graph_ray.pipelines.queries import GraphQueries
        from web_graph_ray.pipelines.serve import make_server
        from web_graph_ray.sources.synth import CorpusConfig, seed_urls, write_corpus

        d = tmp_path_factory.mktemp("serve")
        ccfg = CorpusConfig(n_pages=80, seed=3)
        corpus = write_corpus(str(d / "corpus"), ccfg)
        eng = CrawlEngine(
            corpus,
            CrawlConfig(num_buckets=4, work_dir=str(d / "work"), respect_robots=False),
        )
        eng.run(seed_urls(ccfg))
        gq = GraphQueries(eng)
        srv = make_server(gq, "127.0.0.1", 0)  # ephemeral port
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        yield gq, f"http://127.0.0.1:{srv.server_address[1]}"
        srv.shutdown()

    @staticmethod
    def _get(url):
        import json as _json
        import urllib.request

        with urllib.request.urlopen(url, timeout=30) as r:
            body = r.read().decode()
        try:
            return r.status, _json.loads(body)
        except _json.JSONDecodeError:
            return r.status, body

    def test_counts(self, served):
        gq, base = served
        assert self._get(base + "/countPages")[1] == {"countPages": gq.count_pages()}
        assert self._get(base + "/countLinks")[1] == {"countLinks": gq.count_links()}

    def test_page_composite(self, served):
        gq, base = served
        row = gq.pages.take(1)[0]
        pid = row["page_id"]
        status, out = self._get(f"{base}/page/{pid}")
        assert status == 200
        assert out["node"] == {"id": pid, "group": row["host"], "url": row["url"]}
        exp = gq.page_with_links(pid)
        assert out["links"] == [l["to_page_id"] for l in exp["links"]]

    def test_page_missing_404(self, served):
        import urllib.error

        _, base = served
        with pytest.raises(urllib.error.HTTPError) as ei:
            self._get(base + "/page/doesnotexist")
        assert ei.value.code == 404

    def test_list_routes(self, served):
        gq, base = served
        row = gq.pages.take(1)[0]
        host, pid = row["host"], row["page_id"]
        assert self._get(f"{base}/pages/{host}")[1] == list(
            gq.pages_by_host(host).to_pandas()["page_id"]
        )
        assert self._get(f"{base}/linksFrom/{pid}")[1] == list(
            gq.links_from(pid).to_pandas()["to_page_id"]
        )
        assert self._get(f"{base}/linksTo/{pid}")[1] == list(
            gq.links_to(pid).to_pandas()["from_page_id"]
        )

    def test_welcome(self, served):
        _, base = served
        status, body = self._get(base + "/")
        assert status == 200 and "web-graph" in body

    def test_ui_and_first_page(self, served):
        gq, base = served
        status, body = self._get(base + "/ui")
        assert status == 200
        # self-contained: the explorer must not pull anything off a CDN
        assert "<canvas" in body and "sha1Hex" in body
        # self-contained: no external scripts, only relative fetches
        assert "unpkg.com" not in body and "src=\"http" not in body
        status, first = self._get(base + "/firstPage")
        assert status == 200
        assert gq.page(first["id"])["url"] == first["url"]
        # the id the UI would compute from ?url= maps back to this node
        from web_graph_ray.pipelines.queries import page_id_of_url

        assert page_id_of_url(first["url"]) == first["id"]

    def test_frontend_js_hash_contract(self):
        """The explorer's inline SHA-1 must agree with the engine's
        page-id function (frontend JS contract, reference
        frontend/index.html:68-78).  Gated on a node runtime."""
        import shutil as _shutil
        import subprocess

        node = _shutil.which("node")
        if node is None:
            pytest.skip("no node runtime to exercise the frontend JS")
        import os as _os

        from web_graph_ray.pipelines.queries import page_id_of_url

        html = _os.path.join(
            _os.path.dirname(__file__), "..", "web_graph_ray", "pipelines",
            "frontend.html",
        )
        urls = [
            "https://example.com/",
            "https://sub.host.example.com/a/b/page.html",
            "https://example.com/percent%20enc?q=1#frag",
        ]
        js = (
            "const fs=require('fs');"
            f"const html=fs.readFileSync({_os.path.abspath(html)!r},'utf8');"
            "const s=html.match(/<script>\\n([\\s\\S]*)<\\/script>/)[1];"
            "eval(s.slice(0,s.indexOf('// --- graph state'))"
            "+'\\nglobalThis.pageIdOf=pageIdOf;');"
            f"for (const u of {urls!r}) console.log(pageIdOf(u));"
        )
        out = subprocess.run(
            [node, "-e", js], capture_output=True, text=True, check=True
        ).stdout.split()
        assert out == [page_id_of_url(u) for u in urls]


class TestMultimodalStages:
    """Ray-side plumbing of the image/audio/video actor-pool stages —
    schemas, 1->N frame flat-map, determinism, strict-stub honesty."""

    @staticmethod
    def _payload_ds(n=12):
        import pyarrow as pa
        import ray.data

        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "item_id": pa.array(range(n), type=pa.int64()),
                    "payload": pa.array(
                        [b"payload-%d" % i for i in range(n)], type=pa.binary()
                    ),
                }
            )
        )

    def test_video_frame_sample(self, ray_session):
        from web_graph_ray.stages.multimodal import VideoFrameSample

        ds = self._payload_ds()
        out = ds.map_batches(
            VideoFrameSample,
            fn_constructor_kwargs={"n_frames": 4, "height": 8, "width": 8, "decoder": "fake"},
            batch_format="pyarrow", batch_size=4, concurrency=2,
        ).to_pandas()
        assert len(out) == 12 * 4  # 1->N flat map
        assert set(out.columns) == {"item_id", "frame_idx", "ts_sec", "pixels"}
        g = out[out.item_id == 3].sort_values("frame_idx")
        # uniform mid-point sampling is monotone in time
        assert list(g["frame_idx"]) == [0, 1, 2, 3]
        assert g["ts_sec"].is_monotonic_increasing
        assert all(len(p) == 8 * 8 * 3 for p in out["pixels"])
        # deterministic: same payload -> same frames
        out2 = ds.map_batches(
            VideoFrameSample,
            fn_constructor_kwargs={"n_frames": 4, "height": 8, "width": 8, "decoder": "fake"},
            batch_format="pyarrow", batch_size=4, concurrency=2,
        ).to_pandas()
        a = out.sort_values(["item_id", "frame_idx"]).reset_index(drop=True)
        b = out2.sort_values(["item_id", "frame_idx"]).reset_index(drop=True)
        assert (a["ts_sec"] == b["ts_sec"]).all()
        assert all(list(x) == list(y) for x, y in zip(a["pixels"], b["pixels"]))

    def test_strict_stub_raises(self, ray_session):
        import pytest as _pytest

        from web_graph_ray.stages.multimodal import VideoFrameSample

        stage = VideoFrameSample()  # strict by default
        import pyarrow as pa

        batch = pa.Table.from_pydict(
            {"item_id": pa.array([1], type=pa.int64()),
             "payload": pa.array([b"x"], type=pa.binary())}
        )
        with _pytest.raises(NotImplementedError):
            stage(batch)

    def test_pyav_fallback_time_base_math(self, monkeypatch):
        """The PyAV codec seam converts container duration (av.time_base
        units, i.e. microseconds) to seconds and seek targets from seconds
        back to time_base units.  Exercised with a stubbed ``av`` module
        since neither decord nor PyAV ship in this container."""
        import sys
        import types
        from fractions import Fraction

        import numpy as np

        from web_graph_ray.stages import multimodal as mm

        seeks = []

        class _Frame:
            def reformat(self, width, height, format):
                self._shape = (height, width)
                return self

            def to_ndarray(self):
                return np.zeros((*self._shape, 3), dtype=np.uint8)

        class _Container:
            duration = 5_000_000  # 5 s in av.time_base (µs) units

            def __enter__(self):
                return self

            def __exit__(self, *a):
                return False

            def seek(self, offset):
                seeks.append(offset)

            def decode(self, video=0):
                yield _Frame()

        fake_av = types.ModuleType("av")
        fake_av.time_base = Fraction(1, 1_000_000)
        fake_av.open = lambda *_a, **_k: _Container()
        monkeypatch.setitem(sys.modules, "av", fake_av)
        # a None sys.modules entry makes `import decord` raise ImportError,
        # so the loader deterministically falls through to av
        monkeypatch.setitem(sys.modules, "decord", None)

        codec = mm._load_video_codec()
        assert codec is not None
        duration, frame_at = codec
        assert duration(b"x") == 5.0
        px = frame_at(b"x", 2.0, 8, 6)
        assert px.shape == (8, 6, 3)
        # seek target is t / time_base = 2.0 s -> 2_000_000 µs, not int(2e-6)=0
        assert seeks == [2_000_000]

    def test_audio_features_shape(self, ray_session):
        from web_graph_ray.stages.multimodal import AudioFeatures

        out = self._payload_ds().map_batches(
            AudioFeatures,
            fn_constructor_kwargs={"frames": 4, "feat_dim": 5, "decoder": "fake"},
            batch_format="pyarrow", batch_size=4, concurrency=2,
        ).to_pandas()
        assert len(out) == 12
        assert all(len(f) == 4 * 5 for f in out["features"])

    def test_image_strict_without_pil_uses_stdlib_png_tier(self):
        """PIL is absent from this container, so strict mode selects the
        stdlib-png tier: real PNG payloads decode, anything else raises
        the honest NotImplementedError."""
        import pytest as _pytest

        import pyarrow as pa

        from web_graph_ray.stages.multimodal import ImageDecode

        stage = ImageDecode(decoder="strict")
        assert stage.codec_tier == "stdlib-png" and stage.codec is not None
        batch = pa.Table.from_pydict(
            {"item_id": pa.array([1], type=pa.int64()),
             "payload": pa.array([b"x"], type=pa.binary())}
        )
        with _pytest.raises(NotImplementedError):
            stage(batch)

    def test_image_strict_uses_real_codec_when_importable(self, monkeypatch):
        """Opportunistic codec selection: when a PIL-shaped module is
        importable, strict mode decodes through it instead of raising."""
        import sys
        import types

        import numpy as np
        import pyarrow as pa

        class _FakeImg:
            def convert(self, mode):
                assert mode == "RGB"
                return self

            def resize(self, wh):
                w, h = wh
                return np.full((h, w, 3), 7, dtype=np.uint8)

        pil = types.ModuleType("PIL")
        pil.Image = types.SimpleNamespace(open=lambda bio: _FakeImg())
        monkeypatch.setitem(sys.modules, "PIL", pil)

        from web_graph_ray.stages.multimodal import ImageDecode

        stage = ImageDecode(height=4, width=6, decoder="strict")
        assert stage.codec_tier == "pil" and stage.codec is not None
        out = stage(
            pa.Table.from_pydict(
                {"item_id": pa.array([1], type=pa.int64()),
                 "payload": pa.array([b"x"], type=pa.binary())}
            )
        )
        assert len(out["pixels"][0].as_py()) == 4 * 6 * 3
        assert out["mean_intensity"][0].as_py() == 7.0

    def test_audio_strict_uses_real_codec_when_importable(self, monkeypatch):
        import sys
        import types

        import numpy as np
        import pyarrow as pa

        sf = types.ModuleType("soundfile")
        sf.read = lambda bio, dtype: (
            np.sin(np.linspace(0, 80, 4000)).astype(np.float32), 16000
        )
        monkeypatch.setitem(sys.modules, "soundfile", sf)

        from web_graph_ray.stages.multimodal import AudioFeatures

        stage = AudioFeatures(frames=4, feat_dim=5, decoder="strict")
        assert stage.codec_tier == "soundfile" and stage.codec is not None
        out = stage(
            pa.Table.from_pydict(
                {"item_id": pa.array([1], type=pa.int64()),
                 "payload": pa.array([b"x"], type=pa.binary())}
            )
        )
        feats = np.asarray(out["features"][0].as_py())
        assert feats.shape == (4 * 5,)
        assert np.isfinite(feats).all() and (feats != 0).any()


def _encode_png(pixels, ctype: int, filters=None, palette=None) -> bytes:
    """Minimal test-side PNG encoder: 8-bit, non-interlaced, one chosen
    filter type per scanline (forward-filtered so the decoder's
    unfilter path is genuinely exercised)."""
    import struct
    import zlib

    import numpy as np

    h, w = pixels.shape[:2]
    channels = pixels.shape[2] if pixels.ndim == 3 else 1
    bpp = channels
    flat = pixels.reshape(h, w * channels).astype(np.int32)
    filters = filters or [0] * h
    out = bytearray()
    prev = np.zeros(w * channels, dtype=np.int32)
    for y in range(h):
        f = filters[y]
        row = flat[y]
        if f == 0:
            enc = row
        elif f == 1:
            enc = row.copy()
            enc[bpp:] = (row[bpp:] - row[:-bpp]) % 256
        elif f == 2:
            enc = (row - prev) % 256
        elif f == 3:
            enc = row.copy()
            for x in range(len(row)):
                left = row[x - bpp] if x >= bpp else 0
                enc[x] = (row[x] - ((left + prev[x]) >> 1)) % 256
        elif f == 4:
            enc = row.copy()
            for x in range(len(row)):
                a = row[x - bpp] if x >= bpp else 0
                b, c = prev[x], (prev[x - bpp] if x >= bpp else 0)
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else c)
                enc[x] = (row[x] - pred) % 256
        out.append(f)
        out.extend(enc.astype(np.uint8).tobytes())
        prev = row

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    body = chunk(b"IHDR", ihdr)
    if palette is not None:
        body += chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    body += chunk(b"IDAT", zlib.compress(bytes(out)))
    body += chunk(b"IEND", b"")
    return b"\x89PNG\r\n\x1a\n" + body


def _encode_wav(samples, framerate=16000, sampwidth=2, nch=1) -> bytes:
    import io
    import wave

    import numpy as np

    bio = io.BytesIO()
    with wave.open(bio, "wb") as wf:
        wf.setnchannels(nch)
        wf.setsampwidth(sampwidth)
        wf.setframerate(framerate)
        if sampwidth == 2:
            wf.writeframes((samples * 32767).astype("<i2").tobytes())
        else:
            wf.writeframes(((samples * 127) + 128).astype(np.uint8).tobytes())
    return bio.getvalue()


class TestStdlibCodecTier:
    """VERDICT r3 item 6: strict mode must REALLY decode PNG/WAV in this
    wheel-less container via the stdlib tier."""

    def test_png_roundtrip_all_filters(self):
        import numpy as np

        from web_graph_ray.stages.multimodal import _png_to_rgb

        rng = np.random.RandomState(3)
        img = rng.randint(0, 256, (5, 7, 3), dtype=np.uint8)
        for filters in ([0] * 5, [1] * 5, [2] * 5, [3] * 5, [4] * 5, [0, 1, 2, 3, 4]):
            got = _png_to_rgb(_encode_png(img, ctype=2, filters=filters))
            assert (got == img).all(), filters

    def test_png_color_types(self):
        import numpy as np

        from web_graph_ray.stages.multimodal import _png_to_rgb

        rng = np.random.RandomState(4)
        gray = rng.randint(0, 256, (4, 6, 1), dtype=np.uint8)
        assert (_png_to_rgb(_encode_png(gray, ctype=0)) == np.repeat(gray, 3, 2)).all()
        rgba = rng.randint(0, 256, (4, 6, 4), dtype=np.uint8)
        assert (_png_to_rgb(_encode_png(rgba, ctype=6)) == rgba[..., :3]).all()
        palette = rng.randint(0, 256, (16, 3), dtype=np.uint8)
        idx = rng.randint(0, 16, (4, 6, 1), dtype=np.uint8)
        got = _png_to_rgb(_encode_png(idx, ctype=3, palette=palette))
        assert (got == palette[idx[..., 0]]).all()

    def test_wav_decode_mono_and_stereo(self):
        import numpy as np

        from web_graph_ray.stages.multimodal import _wav_to_float

        t = np.linspace(0, 1, 800, endpoint=False)
        mono = np.sin(2 * np.pi * 5 * t).astype(np.float64)
        got = _wav_to_float(_encode_wav(mono))
        assert got.shape == (800,) and abs(got - mono).max() < 1e-3
        stereo = np.stack([mono, -mono], axis=1).reshape(-1)
        got2 = _wav_to_float(_encode_wav(stereo, nch=2))
        assert got2.shape == (800,) and abs(got2).max() < 1e-3  # L/R cancel

    def test_strict_image_and_audio_end_to_end(self, ray_session):
        """Real decode through the actor-pool stages — the brief-mandated
        family exercisable end-to-end without any wheels."""
        import numpy as np
        import pyarrow as pa
        import ray.data

        from web_graph_ray.stages.multimodal import AudioFeatures, ImageDecode

        rng = np.random.RandomState(5)
        pngs = [
            _encode_png(
                rng.randint(0, 256, (10, 12, 3), dtype=np.uint8),
                ctype=2, filters=[4, 3, 2, 1, 0, 4, 3, 2, 1, 0],
            )
            for _ in range(6)
        ]
        ds = ray.data.from_arrow(pa.table({
            "item_id": pa.array(range(6), pa.int64()),
            "payload": pa.array(pngs, pa.binary()),
        }))
        out = ds.map_batches(
            ImageDecode,
            fn_constructor_kwargs={"height": 8, "width": 8, "decoder": "strict"},
            batch_format="pyarrow", batch_size=3, concurrency=2,
        ).to_pandas()
        assert len(out) == 6
        assert all(len(p) == 8 * 8 * 3 for p in out["pixels"])
        assert out["mean_intensity"].between(1, 255).all()

        t = np.linspace(0, 1, 1600, endpoint=False)
        wavs = [
            _encode_wav(0.5 * np.sin(2 * np.pi * (50 + 10 * i) * t)) for i in range(6)
        ]
        ads = ray.data.from_arrow(pa.table({
            "item_id": pa.array(range(6), pa.int64()),
            "payload": pa.array(wavs, pa.binary()),
        }))
        aout = ads.map_batches(
            AudioFeatures,
            fn_constructor_kwargs={"frames": 4, "feat_dim": 5, "decoder": "strict"},
            batch_format="pyarrow", batch_size=3, concurrency=2,
        ).to_pandas()
        assert len(aout) == 6
        feats = np.stack([np.asarray(f) for f in aout["features"]])
        assert np.isfinite(feats).all() and (feats != 0).any()

    def test_audio_strict_without_soundfile_uses_stdlib_tier(self):
        import pytest as _pytest

        import pyarrow as pa

        from web_graph_ray.stages.multimodal import AudioFeatures

        stage = AudioFeatures(decoder="strict")
        assert stage.codec_tier == "stdlib-wav"
        batch = pa.Table.from_pydict(
            {"item_id": pa.array([1], type=pa.int64()),
             "payload": pa.array([b"not a wav"], type=pa.binary())}
        )
        with _pytest.raises(NotImplementedError):
            stage(batch)

    def test_avi_roundtrip_with_row_padding(self):
        import numpy as np

        from web_graph_ray.sources.synth import encode_avi_dib
        from web_graph_ray.stages.multimodal import _avi_frame_rgb, _avi_meta

        rng = np.random.RandomState(7)
        # odd width 15 -> 45-byte rows padded to 48: exercises DIB stride
        frames = rng.randint(0, 256, (5, 9, 15, 3)).astype(np.uint8)
        payload = encode_avi_dib(frames, fps=4)
        fps, chunks, w, h = _avi_meta(payload)
        assert (fps, len(chunks), w, h) == (4.0, 5, 15, 9)
        for i in range(len(frames)):
            assert (_avi_frame_rgb(payload, i) == frames[i]).all()

    def test_avi_strict_video_stage(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data

        from web_graph_ray.sources.synth import encode_avi_dib
        from web_graph_ray.stages.multimodal import VideoFrameSample

        clips = {
            i: np.random.RandomState(i).randint(0, 256, (4, 16, 16, 3)).astype(np.uint8)
            for i in range(6)
        }
        ds = ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "item_id": pa.array(sorted(clips), type=pa.int64()),
                    "payload": pa.array(
                        [bytes(encode_avi_dib(clips[i], fps=2)) for i in sorted(clips)],
                        type=pa.binary(),
                    ),
                }
            )
        )
        out = (
            ds.map_batches(
                VideoFrameSample,
                fn_constructor_kwargs={
                    "n_frames": 4, "height": 16, "width": 16, "decoder": "strict"
                },
                batch_format="pyarrow",
                batch_size=4,
                concurrency=2,
            )
            .to_pandas()
            .sort_values(["item_id", "frame_idx"])
            .reset_index(drop=True)
        )
        assert len(out) == 6 * 4
        # 2 s clip at 2 fps, mid-point sampling: frame k at t=(k+.5)/4*2
        # -> source frame idx = int(t*2) = k; same-size resize = identity
        for _, row in out.iterrows():
            exp = clips[row["item_id"]][int(row["frame_idx"])]
            got = np.asarray(row["pixels"], dtype=np.uint8).reshape(16, 16, 3)
            assert (got == exp).all()

    def test_avi_rejects_non_avi_strict(self, ray_session):
        import pyarrow as pa
        import pytest as _pytest

        from web_graph_ray.stages.multimodal import VideoFrameSample

        stage = VideoFrameSample(n_frames=2, height=4, width=4, decoder="strict")
        batch = pa.Table.from_pydict(
            {"item_id": pa.array([1], type=pa.int64()),
             "payload": pa.array([b"not an avi"], type=pa.binary())}
        )
        with _pytest.raises(NotImplementedError):
            stage(batch)


class TestBoilerplateScrub:
    """remove_boilerplate_lines: lines in ≥ min_docs distinct docs are
    deleted everywhere; order preserved; both join paths identical."""

    @staticmethod
    def _docs(extra_cols=False):
        import pyarrow as pa

        texts = [
            "NAV HOME\nunique zero\nFOOTER",
            "NAV HOME\nunique one\nFOOTER",
            "NAV HOME\nunique two",
            "NAV HOME\nFOOTER",  # becomes fully boilerplate
            "standalone doc",
        ]
        d = {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts),
        }
        if extra_cols:
            d["lang"] = pa.array(["en"] * len(texts))
        return pa.Table.from_pydict(d)

    @staticmethod
    def _reference(texts, min_docs):
        from collections import Counter

        df = Counter()
        for t in texts:
            for ln in set(t.split("\n")):
                df[ln] += 1
        boiler = {ln for ln, c in df.items() if c >= min_docs}
        out = []
        for t in texts:
            lines = t.split("\n")
            kept = [ln for ln in lines if ln not in boiler]
            out.append(("\n".join(kept), len(lines) - len(kept)))
        return out

    def test_matches_reference_and_keeps_columns(self, ray_session):
        import ray

        from web_graph_ray.stages.dedup import remove_boilerplate_lines

        tbl = self._docs(extra_cols=True)
        got = (
            remove_boilerplate_lines(
                ray.data.from_arrow(tbl).repartition(3), min_docs=3
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        want = self._reference(tbl["text"].to_pylist(), 3)
        assert got["text"].tolist() == [w[0] for w in want]
        assert got["n_removed"].tolist() == [w[1] for w in want]
        assert got["lang"].tolist() == ["en"] * 5  # passthrough column
        # doc 3 was pure boilerplate: survives with empty text
        assert got.loc[3, "text"] == "" and got.loc[3, "n_removed"] == 2

    def test_partitioned_path_equals_broadcast(self, ray_session, monkeypatch):
        import ray

        import web_graph_ray.stages.dedup as dd

        tbl = self._docs()
        ds = ray.data.from_arrow(tbl).repartition(3)
        bc = (
            dd.remove_boilerplate_lines(ds, min_docs=2)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        monkeypatch.setattr(dd, "BROADCAST_BYTES", 0)
        part = (
            dd.remove_boilerplate_lines(ds, min_docs=2)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert bc[["doc_id", "text", "n_removed"]].equals(
            part[["doc_id", "text", "n_removed"]]
        )

    def test_duplicate_line_instances_counted(self, ray_session):
        import pyarrow as pa
        import ray

        from web_graph_ray.stages.dedup import remove_boilerplate_lines

        tbl = pa.Table.from_pydict(
            {
                "doc_id": pa.array([0, 1], type=pa.int64()),
                "text": pa.array(["ad\nkeep\nad", "ad\nother"]),
            }
        )
        got = (
            remove_boilerplate_lines(ray.data.from_arrow(tbl), min_docs=2)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        # both instances of the shared line in doc 0 are removed/counted
        assert got["text"].tolist() == ["keep", "other"]
        assert got["n_removed"].tolist() == [2, 1]


class TestPassageDedup:
    """passage_dedup: corpus-wide first-wins at 8-token segments."""

    def _run(self, texts, k=4):
        import pyarrow as pa
        import ray

        from web_graph_ray.stages.dedup import passage_dedup

        docs = ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                    "text": pa.array(texts),
                }
            )
        ).repartition(4)
        df = passage_dedup(docs, k=k).to_pandas()
        return df.sort_values("doc_id").reset_index(drop=True)

    def test_cross_doc_first_wins(self, ray_session):
        seg = "a b c d"
        texts = [seg + " x1 x2 x3 x4", seg + " y1 y2 y3 y4", "z1 z2 z3 z4"]
        out = self._run(texts, k=4)
        # doc 0 keeps both segments; doc 1 loses the shared first segment
        assert out.loc[out.doc_id == 0, "text_dedup"].item() == texts[0]
        assert out.loc[out.doc_id == 1, "text_dedup"].item() == "y1 y2 y3 y4"
        assert out.loc[out.doc_id == 2, "kept_segments"].item() == 1

    def test_within_doc_repeat_cut(self, ray_session):
        texts = ["p q r s p q r s t u"]
        out = self._run(texts, k=4)
        # second copy of "p q r s" cut; ragged tail "t u" kept
        assert out.text_dedup.item() == "p q r s t u"
        assert out.kept_segments.item() == 2

    def test_fully_duplicate_doc_drops(self, ray_session):
        texts = ["m n o p", "m n o p"]
        out = self._run(texts, k=4)
        assert out.doc_id.tolist() == [0]

    def test_parallelism_invariance(self, ray_session):
        import pyarrow as pa
        import ray

        from web_graph_ray.stages.dedup import passage_dedup

        texts = [
            " ".join("w%d" % ((i * 7 + j) % 23) for j in range(17))
            for i in range(60)
        ]
        tbl = pa.Table.from_pydict(
            {"doc_id": pa.array(range(60), type=pa.int64()), "text": pa.array(texts)}
        )
        outs = []
        for parts in (1, 8):
            docs = ray.data.from_arrow(tbl).repartition(parts)
            df = passage_dedup(docs, k=4).to_pandas()
            outs.append(
                df.sort_values("doc_id").reset_index(drop=True)
            )
        assert outs[0].equals(outs[1])


class TestQualityFilter:
    def test_thresholds_and_metrics(self, ray_session):
        import pyarrow as pa
        import ray

        from web_graph_ray.stages.text import quality_filter

        texts = [
            " ".join(
                "word%c%c" % (97 + j // 26, 97 + j % 26) for j in range(40)
            ),                                                # good
            "short text",                                     # too few tokens
            " ".join("w%d" % j for j in range(200)),          # too many tokens
            " ".join(["dup pair"] * 20),                      # repetitious bigrams
            " ".join("%d" % j for j in range(40)),            # all digits
        ]
        docs = ray.data.from_arrow(
            pa.Table.from_pydict(
                {"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                 "text": pa.array(texts)}
            )
        )
        out = quality_filter(docs).to_pandas()
        assert out.doc_id.tolist() == [0]
        assert {"n_tokens", "alpha_ratio", "digit_ratio",
                "top_bigram_frac", "dup_line_frac"} <= set(out.columns)

    def test_all_pass_when_loose(self, ray_session):
        import pyarrow as pa
        import ray

        from web_graph_ray.stages.text import quality_filter

        docs = ray.data.from_arrow(
            pa.Table.from_pydict(
                {"doc_id": pa.array([0, 1], type=pa.int64()),
                 "text": pa.array(["a b c", "d e f g"])}
            )
        )
        out = quality_filter(
            docs, min_tokens=0, max_tokens=10**9, min_alpha_ratio=0.0,
            max_digit_ratio=1.0, max_top_bigram_frac=1.0, max_dup_line_frac=1.0,
        ).to_pandas()
        assert sorted(out.doc_id.tolist()) == [0, 1]


class TestTfidf:
    def test_known_corpus(self, ray_session):
        import pyarrow as pa
        import ray

        from web_graph_ray.stages.text import tfidf_topk

        # "rare" appears in one doc only; "common" in all three
        texts = [
            "common common rare",
            "common alpha alpha",
            "common beta",
        ]
        docs = ray.data.from_arrow(
            pa.Table.from_pydict(
                {"doc_id": pa.array(range(3), type=pa.int64()),
                 "text": pa.array(texts)}
            )
        )
        out = tfidf_topk(docs, k=1).to_pandas().sort_values("doc_id")
        # idf(common)=ln(1)=0 → never the top term when any rarer token exists
        assert out.tok.tolist() == ["rare", "alpha", "beta"]
        assert (out.tfidf > 0).all()
        # doc 1: tf(alpha)=2, df(alpha)=1 → 2*ln(3)
        got = out.loc[out.doc_id == 1, "tfidf"].item()
        assert abs(got - 2 * np.log(3.0)) < 1e-6

    def test_parallelism_invariance(self, ray_session):
        import pyarrow as pa
        import ray

        from web_graph_ray.stages.text import tfidf_topk

        texts = [" ".join("w%d" % ((i * 5 + j) % 17) for j in range(12))
                 for i in range(40)]
        tbl = pa.Table.from_pydict(
            {"doc_id": pa.array(range(40), type=pa.int64()),
             "text": pa.array(texts)}
        )
        outs = []
        for parts in (1, 8):
            ds = ray.data.from_arrow(tbl).repartition(parts)
            outs.append(
                tfidf_topk(ds, k=3)
                .to_pandas()
                .sort_values(["doc_id", "tfidf", "tok"],
                             ascending=[True, False, True])
                .reset_index(drop=True)
            )
        assert outs[0].equals(outs[1])


class TestCountMin:
    def test_upper_bound_and_exactness_when_sparse(self, ray_session):
        import pyarrow as pa
        import ray

        from web_graph_ray.stages.sketch import count_min, count_min_estimate

        vals = [str(i % 50) for i in range(5000)]  # each key appears 100x
        ds = ray.data.from_arrow(
            pa.Table.from_pydict({"k": pa.array(vals)})
        ).repartition(8)
        sk = count_min(ds, "k", width=4096, depth=4)
        keys = [str(i) for i in range(50)]
        est = count_min_estimate(sk, keys)
        assert (est >= 100).all()           # CM never underestimates
        assert (est == 100).mean() > 0.9    # sparse sketch: mostly exact
        assert sk.sum() == 4 * 5000

    def test_merge_equals_single_pass(self, ray_session):
        import pyarrow as pa
        import ray

        from web_graph_ray.stages.sketch import count_min

        vals = [str(i % 7) for i in range(900)]
        tbl = pa.Table.from_pydict({"k": pa.array(vals)})
        sk1 = count_min(ray.data.from_arrow(tbl).repartition(1), "k", width=64, depth=3)
        sk8 = count_min(ray.data.from_arrow(tbl).repartition(8), "k", width=64, depth=3)
        assert np.array_equal(sk1, sk8)


class TestGroupedHLL:
    def test_accuracy_and_invariance(self, ray_session):
        import pyarrow as pa
        import ray

        from web_graph_ray.stages.sketch import hll_distinct_grouped

        # group g has (g+1)*400 distinct values
        gs, vs = [], []
        for g in range(3):
            n = (g + 1) * 400
            gs.extend([f"g{g}"] * n * 2)           # every value twice
            vs.extend(list(range(g * 10**6, g * 10**6 + n)) * 2)
        tbl = pa.Table.from_pydict({"g": pa.array(gs), "v": pa.array(vs)})
        outs = []
        for parts in (1, 8):
            ds = ray.data.from_arrow(tbl).repartition(parts)
            out = (
                hll_distinct_grouped(ds, "g", "v")
                .to_pandas()
                .sort_values("g")
                .reset_index(drop=True)
            )
            outs.append(out)
        assert outs[0].equals(outs[1])  # sketch merge is order-invariant
        for g in range(3):
            true = (g + 1) * 400
            est = outs[0].loc[outs[0].g == f"g{g}", "estimate"].item()
            assert abs(est / true - 1) < 0.1, (g, est, true)


class TestKMV:
    def test_accuracy_and_partition_invariance(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data

        from web_graph_ray.stages.sketch import kmv_distinct

        n = 30000
        df = pd.DataFrame({"v": np.arange(n, dtype=np.int64) % 20000})
        ests = []
        for parts in (2, 9):
            out = kmv_distinct(
                ray.data.from_pandas(df).repartition(parts), "v", k=1024
            )
            ests.append(out["estimate"])
        # pure function of the distinct-hash set: partitioning-invariant
        assert ests[0] == ests[1]
        assert abs(ests[0] - 20000) / 20000 < 0.1  # ~3/sqrt(k) bound

    def test_exact_below_k(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data

        from web_graph_ray.stages.sketch import kmv_distinct

        df = pd.DataFrame({"v": np.arange(500, dtype=np.int64) % 200})
        out = kmv_distinct(ray.data.from_pandas(df).repartition(3), "v", k=1024)
        assert out["estimate"] == 200.0


class TestQuantizeInt8:
    def test_bounds_and_zero_vector(self, ray_session):
        import numpy as np
        import pandas as pd
        import pyarrow as pa
        import ray.data

        from web_graph_ray.stages.ann import quantize_int8

        rng = np.random.default_rng(3)
        vecs = rng.normal(size=(200, 16)).astype(np.float32)
        vecs[7] = 0.0  # all-zero vector edge
        t = pa.table(
            {
                "vec_id": pa.array(np.arange(200, dtype=np.int64)),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(vecs.ravel()), 16
                ),
            }
        )
        out = (
            quantize_int8(ray.data.from_arrow(t).repartition(4), round_to=9)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        z = out[out["vec_id"] == 7].iloc[0]
        assert z["scale"] == 0.0 and z["mse"] == 0.0
        nz = out[out["vec_id"] != 7]
        # max quantization error per element is scale/2 -> mse <= scale^2/4
        assert (nz["mse"] <= nz["scale"] ** 2 / 4 + 1e-12).all()
        assert (nz["scale"] > 0).all()
        # scale reproduces max|x|/127 exactly
        exp = np.abs(vecs).max(axis=1) / 127.0
        got = out["scale"].to_numpy()
        assert np.allclose(got, np.round(exp, 9), atol=5e-10)


class TestBPE:
    @staticmethod
    def _ref_bpe(words, k):
        from collections import Counter

        wc = Counter(words)
        vocab = {w: list(w) + ["</w>"] for w in wc}
        merges = []
        for r in range(1, k + 1):
            pc = Counter()
            for w, toks in vocab.items():
                for pair in zip(toks, toks[1:]):
                    pc[pair] += wc[w]
            if not pc:
                break
            pair = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            merges.append((r, pair[0], pair[1], pc[pair]))
            a, b = pair
            for w, toks in vocab.items():
                out, i = [], 0
                while i < len(toks):
                    if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(toks[i])
                        i += 1
                vocab[w] = out
        return merges

    def test_matches_scalar_reference(self, ray_session):
        import pandas as pd
        import ray.data

        from web_graph_ray.stages.bpe import bpe_learn

        texts = [
            "the cat sat on the mat",
            "the cat aaa aaaa abab ababab",
            "banana bandana",
            "low lower lowest slow slowest",
        ]
        exp = pd.DataFrame(
            self._ref_bpe(" ".join(texts).split(" "), 6),
            columns=["rank", "left_tok", "right_tok", "cnt"],
        ).astype({"rank": "int64", "cnt": "int64"})
        for parts in (1, 3):
            ds = ray.data.from_pandas(pd.DataFrame({"text": texts})).repartition(parts)
            got = bpe_learn(ds, 6, num_buckets=4)
            pd.testing.assert_frame_equal(got, exp)

    def test_overlapping_runs_merge_greedily(self, ray_session):
        import pandas as pd
        import ray.data

        from web_graph_ray.stages.bpe import merge_tokens

        # 'aaaa' -> greedy (a,a): positions 0,2 merge -> [aa, aa, </w>]
        assert merge_tokens(list("aaaa") + ["</w>"], "a", "a", "aa") == [
            "aa", "aa", "</w>",
        ]
        # 'aaa' -> [aa, a, </w>]
        assert merge_tokens(list("aaa") + ["</w>"], "a", "a", "aa") == [
            "aa", "a", "</w>",
        ]

    def test_token_counts_match_scalar_encode(self, ray_session):
        import pandas as pd
        import ray.data

        from web_graph_ray.stages.bpe import bpe_token_counts, merge_tokens

        texts = ["low lower lowest", "slow slowest low", "newer newest new"]
        k = 5
        merges = self._ref_bpe(" ".join(texts).split(" "), k)

        def encode_len(word):
            toks = list(word) + ["</w>"]
            for _, a, b, _c in merges:
                toks = merge_tokens(toks, a, b, a + b)
            return len(toks)

        exp = pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "n_bpe_tokens": [
                    sum(encode_len(w) for w in t.split(" ")) for t in texts
                ],
            }
        ).astype({"doc_id": "int64", "n_bpe_tokens": "int64"})
        ds = ray.data.from_pandas(
            pd.DataFrame({"doc_id": [0, 1, 2], "text": texts})
        ).repartition(2)
        got = (
            bpe_token_counts(ds, k, num_buckets=4)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, exp)


class TestHistQuantile:
    def test_error_bound_and_invariance(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data

        from web_graph_ray.stages.sketch import hist_quantile

        rng = np.random.default_rng(5)
        v = rng.normal(100.0, 15.0, 20000)
        df = pd.DataFrame({"x": v})
        outs = []
        for parts in (2, 9):
            out = hist_quantile(
                ray.data.from_pandas(df).repartition(parts), "x",
                qs=(0.25, 0.5, 0.9), bins=4096,
            )
            outs.append(out)
        pd.testing.assert_frame_equal(outs[0], outs[1])  # partition-invariant
        width = (v.max() - v.min()) / 4096
        for q, est in outs[0].itertuples(index=False):
            true = np.quantile(v, q)
            assert abs(est - true) <= 2 * width + 1e-9

    def test_constant_column(self, ray_session):
        import pandas as pd
        import ray.data

        from web_graph_ray.stages.sketch import hist_quantile

        df = pd.DataFrame({"x": [7.5] * 100})
        out = hist_quantile(ray.data.from_pandas(df), "x", qs=(0.5,))
        assert out["est"].tolist() == [7.5]
