"""Scale guards for the dedup family and sessionize (VERDICT r1 items
1-2): the partitioned-join ("10^9-doc") paths must keep ZERO O(n)
driver-side materializations, agree exactly with the broadcast paths,
and sessionize must handle 10^5 distinct keys in seconds (one
vectorized kernel per hash bucket, not one UDF call per key)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray
import ray.data


@pytest.fixture()
def driver_probe(monkeypatch):
    """Record the row count of every Dataset.take_all/to_pandas result —
    the operators under test must never materialize rows to the driver
    on their join paths."""
    seen: list[int] = []
    orig_ta = ray.data.Dataset.take_all
    orig_tp = ray.data.Dataset.to_pandas

    def ta(self, *a, **k):
        r = orig_ta(self, *a, **k)
        seen.append(len(r))
        return r

    def tp(self, *a, **k):
        r = orig_tp(self, *a, **k)
        seen.append(len(r))
        return r

    monkeypatch.setattr(ray.data.Dataset, "take_all", ta)
    monkeypatch.setattr(ray.data.Dataset, "to_pandas", tp)
    return seen


def _dup_corpus(n: int, n_dup_pairs: int) -> "ray.data.Dataset":
    """n docs: the first 2*n_dup_pairs are near-identical pairs
    (doc 2i ~ doc 2i+1), the rest unique — so the candidate set is
    exactly the dup pairs, independent of corpus size."""
    texts = []
    for i in range(n):
        if i < 2 * n_dup_pairs:
            # each PAIR gets its own hex body (pairs are dissimilar to
            # every other pair, so expected output = exactly the pairs)
            g = (i // 2) * 6364136223846793005 % (1 << 61)
            t = "%016x %016x %016x" % (g, g * 2862933555777941757 % (1 << 64), g ^ 0x5BD1E995)
            if i % 2:
                t += " v2"
            texts.append(t)
        else:
            # pure per-doc hex noise: no shared template, so unique docs
            # can never verify above any similarity threshold
            h = i * 2654435761 % (1 << 61)
            texts.append(
                "%016x %016x %016x" % (h, h * 11400714819323198485 % (1 << 64), h ^ 0xA5A5A5A5)
            )
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "doc_id": pa.array(range(n), type=pa.int64()),
                "text": pa.array(texts),
            }
        )
    ).repartition(16).materialize()


class TestDedupJoinPathScale:
    def test_ngram_and_clusters_50k_docs_no_driver_state(
        self, ray_session, driver_probe
    ):
        import web_graph_ray.stages.dedup as dd

        ds = _dup_corpus(50_000, 1_500)
        driver_probe.clear()
        old = dd.BROADCAST_BYTES
        dd.BROADCAST_BYTES = 0  # force the partitioned-join path
        try:
            pairs = dd.ngram_jaccard_pairs(
                ds, threshold=0.6, min_shared=3
            ).materialize()
            assert pairs.count() == 1_500
            labels = dd.minhash_clusters(pairs).materialize()
        finally:
            dd.BROADCAST_BYTES = old
        # every pair (2i, 2i+1) clusters to label 2i
        lab = dict(
            zip(
                labels.to_pandas()["node"],
                labels.to_pandas()["label"],
            )
        )
        driver_probe.pop()  # the two assertion to_pandas calls above
        driver_probe.pop()
        assert len(lab) == 3_000
        assert all(lab[2 * i] == 2 * i and lab[2 * i + 1] == 2 * i for i in range(1_500))
        # the core guarantee: NOTHING was pulled to the driver inside the
        # operators (gated broadcasts are off; label prop is a join)
        assert driver_probe == [], f"driver materializations: {driver_probe}"

    def test_join_path_equals_broadcast_path(self, ray_session):
        import web_graph_ray.stages.dedup as dd

        ds = _dup_corpus(800, 60)

        def canon(d):
            df = d.to_pandas().round(9)
            return sorted(map(tuple, df.values.tolist()))

        bc_ngram = canon(dd.ngram_jaccard_pairs(ds, threshold=0.6, min_shared=3))
        bc_mh = canon(dd.minhash_lsh_pairs(ds, threshold=0.5))
        old = dd.BROADCAST_BYTES
        dd.BROADCAST_BYTES = 0
        try:
            jn_ngram = canon(dd.ngram_jaccard_pairs(ds, threshold=0.6, min_shared=3))
            jn_mh = canon(dd.minhash_lsh_pairs(ds, threshold=0.5))
        finally:
            dd.BROADCAST_BYTES = old
        assert bc_ngram == jn_ngram and len(bc_ngram) >= 60
        assert bc_mh == jn_mh and len(bc_mh) >= 60

    def test_decontaminate_paths_agree_no_driver_state(
        self, ray_session, driver_probe
    ):
        """decontaminate: the partitioned semi/anti-join fallback must
        equal the broadcast fast path and keep zero O(n) driver
        materializations."""
        import web_graph_ray.stages.dedup as dd

        # 12-token docs; docs 0-9 replicate doc 100's text exactly →
        # contaminated; the rest are unique noise
        n = 400
        bench_text = " ".join("tok%d" % j for j in range(12))
        texts = [
            bench_text if i < 10 else " ".join("w%dx%d" % (i, j) for j in range(12))
            for i in range(n)
        ]
        docs = ray.data.from_arrow(
            pa.Table.from_pydict(
                {"doc_id": pa.array(range(n), type=pa.int64()), "text": pa.array(texts)}
            )
        ).repartition(8)
        bench = ray.data.from_arrow(
            pa.Table.from_pydict(
                {"doc_id": pa.array([100], type=pa.int64()),
                 "text": pa.array([bench_text])}
            )
        )

        def canon(d):
            return sorted(d.to_pandas()["doc_id"].tolist())

        bc = canon(dd.decontaminate(docs, bench, n=8))
        driver_probe.clear()  # broadcast path legitimately pulls the tiny gram set
        old = dd.BROADCAST_BYTES
        dd.BROADCAST_BYTES = 0
        try:
            jn = canon(dd.decontaminate(docs, bench, n=8))
        finally:
            dd.BROADCAST_BYTES = old
        # final canon() to_pandas is the test's own materialization
        assert [x for x in driver_probe if x > 1] == [len(jn)]
        assert bc == jn
        assert set(range(10)) == set(range(n)) - set(jn)


class TestRobotsBucketAffine:
    def test_admit_closure_o1_bytes_and_affine_loads(self, tmp_path):
        """VERDICT r2 item 1: robots state must NOT ride task closures.
        The admit closure serializes to O(1) bytes regardless of host
        count; each bucket's rules come from ITS sidecar only."""
        import ray.cloudpickle as cpickle

        from web_graph_ray.functions.hashing import bucket_for
        from web_graph_ray.pipelines.crawl import make_admitter
        from web_graph_ray.state import politeness
        from web_graph_ray.state.checkpoint import atomic_write_parquet, bucket_file

        nb, n_hosts = 8, 2_000
        robots_dir = str(tmp_path / "robots_parts")
        by_bucket: dict[int, list[str]] = {}
        for i in range(n_hosts):
            host = f"h{i}.example"
            by_bucket.setdefault(bucket_for(host, "", nb, "host"), []).append(host)
        body = b"User-agent: *\nDisallow: /private/\nAllow: /private/pub\n"
        for b, hosts in by_bucket.items():
            atomic_write_parquet(
                pa.Table.from_pydict(
                    {
                        "hostname": pa.array(hosts),
                        "html": pa.array([body] * len(hosts), type=pa.binary()),
                    }
                ),
                bucket_file(robots_dir, b),
            )

        admit = make_admitter(
            str(tmp_path / "w"), 0, None, robots_dir, None, nb, None,
            robots_affine=True,
        )
        n_bytes = len(cpickle.dumps(admit))
        assert n_bytes < 8_000, f"admit closure is {n_bytes} B — robots leaked in?"

        politeness._RULES_CACHE.clear()
        some_b = min(by_bucket)
        rules = politeness.load_robots_rules(robots_dir, some_b, True)
        assert set(rules.by_host) == set(by_bucket[some_b])  # ONLY its bucket
        h0 = by_bucket[some_b][0]
        assert not rules.is_allowed(h0, "/private/x")
        assert rules.is_allowed(h0, "/private/pub/x")  # Allow longest-match
        # missing sidecar -> empty rules, not an error
        empty = politeness.load_robots_rules(str(tmp_path / "nowhere"), 0, True)
        assert empty.by_host == {}
        # non-affine fallback (id bucketing) folds every sidecar once
        all_rules = politeness.load_robots_rules(robots_dir, 3, False)
        assert len(all_rules.by_host) == n_hosts


class TestAsofJoinPartitioned:
    def test_partitioned_equals_broadcast_no_driver_state(
        self, ray_session, driver_probe
    ):
        """VERDICT r2 item 5: the both-sides-large as-of path (union +
        bucketed merge_asof) must agree exactly with the broadcast path
        — including right_ts ties — and pull nothing to the driver."""
        import web_graph_ray.stages.relational as rel

        rng = np.random.default_rng(7)
        n_l, n_r, n_keys = 20_000, 5_000, 300
        left = pd.DataFrame(
            {
                "key": rng.integers(0, n_keys, n_l),
                "ts": rng.integers(0, 1_000_000, n_l).astype("int64"),
                "lval": np.arange(n_l, dtype="int64"),
            }
        )
        right = pd.DataFrame(
            {
                "key": rng.integers(0, n_keys, n_r),
                # coarse grid -> many exact-ts ties, exercising right_order
                "rts": (rng.integers(0, 1_000_000, n_r) // 1000 * 1000).astype(
                    "int64"
                ),
                "rval": np.arange(n_r, dtype="int64"),
            }
        )
        lds = ray.data.from_pandas(left).repartition(8)
        rds = ray.data.from_pandas(right).repartition(4)

        def canon(ds):
            df = ds.to_pandas().fillna(-1)
            return sorted(map(tuple, df[["key", "ts", "lval", "rval"]].values.tolist()))

        kw = dict(
            key_col="key", left_ts="ts", right_ts="rts",
            right_cols=["rval"], right_order=["rval"],
        )
        bc = canon(rel.asof_join(lds, rds, **kw))
        old = rel.ASOF_BROADCAST_BYTES
        rel.ASOF_BROADCAST_BYTES = 0  # force the co-partitioned path
        driver_probe.clear()
        try:
            part = rel.asof_join(lds, rds, **kw)
            got = canon(part)
        finally:
            rel.ASOF_BROADCAST_BYTES = old
        driver_probe.pop()  # canon()'s own to_pandas
        assert driver_probe == [], f"driver materializations: {driver_probe}"
        assert got == bc and len(got) == n_l
        # sanity: matches exist and the no-match sentinel survives
        matched = [t for t in got if t[3] != -1]
        assert 0 < len(matched) <= n_l

    def test_broadcast_right_order_not_in_right_cols(self, ray_session):
        """ADVICE r3: a right_order column that is not in right_cols must
        work on BOTH sides of the ASOF_BROADCAST_BYTES gate with identical
        results and the same output layout (left cols + right_cols)."""
        import web_graph_ray.stages.relational as rel

        rng = np.random.default_rng(3)
        left = pd.DataFrame(
            {
                "key": rng.integers(0, 20, 2000),
                "ts": rng.integers(0, 10_000, 2000).astype("int64"),
                "lval": np.arange(2000, dtype="int64"),
            }
        )
        right = pd.DataFrame(
            {
                "key": rng.integers(0, 20, 500),
                # coarse grid -> exact-ts ties broken only by rord
                "rts": (rng.integers(0, 10_000, 500) // 100 * 100).astype("int64"),
                "rval": np.arange(500, dtype="int64"),
                "rord": rng.permutation(500).astype("int64"),
            }
        )
        lds = ray.data.from_pandas(left).repartition(4)
        rds = ray.data.from_pandas(right).repartition(2)
        kw = dict(
            key_col="key", left_ts="ts", right_ts="rts",
            right_cols=["rval"], right_order=["rord"],
        )
        bc_ds = rel.asof_join(lds, rds, **kw)
        bc = bc_ds.to_pandas()
        # tie-break column used for ordering but projected out of the result
        assert list(bc.columns) == ["key", "ts", "lval", "rval"]
        old = rel.ASOF_BROADCAST_BYTES
        rel.ASOF_BROADCAST_BYTES = 0
        try:
            part = rel.asof_join(lds, rds, **kw).to_pandas()
        finally:
            rel.ASOF_BROADCAST_BYTES = old
        canon = lambda df: sorted(
            map(tuple, df.fillna(-1)[["key", "ts", "lval", "rval"]].values.tolist())
        )
        assert canon(bc) == canon(part) and len(bc) == 2000


class TestTtlRollingSidecar:
    def test_o1_file_reads_per_round(self, tmp_path, monkeypatch):
        """VERDICT r2 item 8: the TTL-probe must not re-read every
        frontier file in the window each round — after the first probe,
        a round reads the rolling last-member sidecar plus ONLY the
        current round's frontier files."""
        import pyarrow.parquet as _pq

        import web_graph_ray.pipelines.crawl as cr
        from web_graph_ray.state.checkpoint import (
            atomic_write_parquet,
            bucket_file,
            frontier_dirs,
        )

        work = str(tmp_path / "w")
        bucket, ttl = 0, 3

        def write_frontier(rnd, ids):
            tbl = pa.Table.from_pydict({"page_id": pa.array(ids, type=pa.string())})
            atomic_write_parquet(tbl, bucket_file(frontier_dirs(work, rnd)[0], bucket))

        for r in range(6):
            write_frontier(r, [f"id{r}", "idX"])

        def cand_dir(rnd):
            d = str(tmp_path / f"cand{rnd}")
            # candidates: one id from an old round (expired), one recent,
            # one novel — exercises the horizon cut
            atomic_write_parquet(
                pa.Table.from_pydict(
                    {
                        "page_id": pa.array(["parent"] * 3),
                        "to_page_id": pa.array(["id0", f"id{rnd - 1}", f"new{rnd}"]),
                        "to_url": pa.array(["u"] * 3),
                        "to_hostname": pa.array(["h"] * 3),
                        "to_host": pa.array(["h"] * 3),
                        "to_path": pa.array(["/"] * 3),
                        "candidate_seq": pa.array(["0.1", "0.2", "0.3"]),
                        "priority": pa.array([0, 0, 0], type=pa.int64()),
                    }
                ),
                d + "/part.parquet",
            )
            return d

        reads: list[str] = []
        orig = _pq.read_table

        def counting(path, *a, **k):
            if isinstance(path, str):
                reads.append(path)
            return orig(path, *a, **k)

        monkeypatch.setattr(cr.pq, "read_table", counting)

        # round 5 probe, no sidecar yet: catch-up reads the whole window
        probe5 = cr.make_prober(work, 5, seen_ttl_rounds=ttl, num_buckets=1)
        out5 = cr._probe_one(probe5, bucket, cand_dir(5))
        assert out5["novel"] == 2  # id0 expired (last member round 0 < lo=3)
        import os as _os

        assert _os.path.isdir(_os.path.join(work, "ttl_member"))

        # round 6 probe: sidecar through=5 exists -> reads are sidecar +
        # round-6 frontier files only (novel written by probe5 + none
        # deferred), NOT the whole window again
        write_frontier(6, ["id6", "idX"])
        reads.clear()
        probe6 = cr.make_prober(work, 6, seen_ttl_rounds=ttl, num_buckets=1)
        out6 = cr._probe_one(probe6, bucket, cand_dir(6))
        frontier_reads = [p for p in reads if "/frontier/" in p]
        assert len(frontier_reads) <= 2, frontier_reads  # round-6 files only
        assert any("ttl_member" in p for p in reads)
        assert out6["novel"] == 2  # id0 expired again; id5, new6 novel... id5 is in window

        # equivalence: a fresh prober with the sidecars REMOVED (full
        # window re-read) yields the same novel count
        import shutil

        shutil.rmtree(_os.path.join(work, "ttl_member"))
        # drop probe6's novel output so the rerun is byte-comparable
        f7 = bucket_file(frontier_dirs(work, 7)[0], bucket)
        _os.remove(f7)
        probe6b = cr.make_prober(work, 6, seen_ttl_rounds=ttl, num_buckets=1)
        out6b = cr._probe_one(probe6b, bucket, cand_dir(6))
        assert out6b["novel"] == out6["novel"]

    def test_pruned_round_dir_fails_loud_on_rebuild(self, tmp_path):
        """ADVICE r4: the TTL sidecar rebuild scans frontier window
        files back to round 0 (after a TTL change invalidates the
        sidecar's stamp) — if a round dir was GC'd, the rebuild must
        raise, not silently lose seen state and re-enqueue pages."""
        import os as _os
        import shutil

        import pytest as _pytest

        import web_graph_ray.pipelines.crawl as cr
        from web_graph_ray.state.checkpoint import (
            atomic_write_parquet,
            bucket_file,
            frontier_dirs,
            round_dir,
        )

        work = str(tmp_path / "w")
        bucket = 0

        def write_frontier(rnd, ids):
            tbl = pa.Table.from_pydict({"page_id": pa.array(ids, type=pa.string())})
            atomic_write_parquet(tbl, bucket_file(frontier_dirs(work, rnd)[0], bucket))

        for r in range(6):
            write_frontier(r, [f"id{r}", "idX"])

        def cand_dir(rnd):
            d = str(tmp_path / f"cand{rnd}")
            atomic_write_parquet(
                pa.Table.from_pydict(
                    {
                        "page_id": pa.array(["parent"]),
                        "to_page_id": pa.array(["id0"]),
                        "to_url": pa.array(["u"]),
                        "to_hostname": pa.array(["h"]),
                        "to_host": pa.array(["h"]),
                        "to_path": pa.array(["/"]),
                        "candidate_seq": pa.array(["0.1"]),
                        "priority": pa.array([0], type=pa.int64()),
                    }
                ),
                d + "/part.parquet",
            )
            return d

        # build a sidecar under ttl=3, then prune round 2 and change the
        # TTL: the stamped sidecar is invalidated, forcing a full-window
        # rebuild that must hit the missing round loudly
        probe5 = cr.make_prober(work, 5, seen_ttl_rounds=3, num_buckets=1)
        cr._probe_one(probe5, bucket, cand_dir(5))
        shutil.rmtree(round_dir(work, 2))
        probe6 = cr.make_prober(work, 6, seen_ttl_rounds=4, num_buckets=1)
        with _pytest.raises(RuntimeError, match="never be pruned"):
            cr._probe_one(probe6, bucket, cand_dir(6))


class TestTtlCuckooGate:
    """TTL + cuckoo: the gate holds one fingerprint copy per (id,
    active-round) in the window and advances by delete(exiting round) +
    add(entering round) — O(delta) per bucket-round, with the exact
    last-member sidecar rewritten only every COMPACT_EVERY rounds.  Gate
    misses must touch NO exact state; the emitted frontier must be
    byte-identical to the every-round-exact bloom TTL path."""

    def test_delta_maintenance_reads_and_equivalence(self, tmp_path, monkeypatch):
        import hashlib

        import pyarrow.parquet as _pq

        import web_graph_ray.pipelines.crawl as cr
        from web_graph_ray.state.checkpoint import (
            atomic_write_parquet,
            bucket_file,
            frontier_dirs,
        )

        H = lambda s: hashlib.sha1(s.encode()).hexdigest()
        bucket, ttl = 0, 3

        def write_frontier(work, rnd, names):
            tbl = pa.Table.from_pydict(
                {"page_id": pa.array([H(n) for n in names], type=pa.string())}
            )
            atomic_write_parquet(tbl, bucket_file(frontier_dirs(work, rnd)[0], bucket))

        def cand_dir(d, names):
            to = [H(n) for n in names]
            atomic_write_parquet(
                pa.Table.from_pydict(
                    {
                        "page_id": pa.array(["p"] * len(to)),
                        "to_page_id": pa.array(to),
                        "to_url": pa.array(["u"] * len(to)),
                        "to_hostname": pa.array(["h"] * len(to)),
                        "to_host": pa.array(["h"] * len(to)),
                        "to_path": pa.array(["/"] * len(to)),
                        "candidate_seq": pa.array([f"0.{i}" for i in range(len(to))]),
                        "priority": pa.array([0] * len(to), type=pa.int64()),
                    }
                ),
                str(d) + "/part.parquet",
            )
            return str(d)

        work_c = str(tmp_path / "wc")  # cuckoo
        work_b = str(tmp_path / "wb")  # bloom/exact twin
        for w in (work_c, work_b):
            for r in range(6):
                write_frontier(w, r, [f"id{r}", "idX"])

        reads: list[str] = []
        orig = _pq.read_table

        def counting(path, *a, **k):
            if isinstance(path, str):
                reads.append(path)
            return orig(path, *a, **k)

        monkeypatch.setattr(cr.pq, "read_table", counting)

        def run_round(rnd, names):
            """Probe the same candidates on both work dirs; next round's
            manual frontier overwrite keeps the window pattern."""
            cd = cand_dir(tmp_path / f"cand{rnd}", names)
            pc_ = cr.make_prober(work_c, rnd, seen_ttl_rounds=ttl,
                                 num_buckets=1, seen_gate="cuckoo")
            reads.clear()
            oc = cr._probe_one(pc_, bucket, cd)
            seg = list(reads)
            pb = cr.make_prober(work_b, rnd, seen_ttl_rounds=ttl, num_buckets=1)
            ob = cr._probe_one(pb, bucket, cd)
            assert oc["novel"] == ob["novel"], rnd
            fc = bucket_file(frontier_dirs(work_c, rnd + 1)[0], bucket)
            fb = bucket_file(frontier_dirs(work_b, rnd + 1)[0], bucket)
            assert orig(fc).equals(orig(fb)), rnd  # byte-equal emissions
            return oc, seg

        # round 5: no gate yet — builds from the window files
        out5, _ = run_round(5, ["id0", "id4", "new5"])
        assert out5["novel"] == 2  # id0 expired (< lo=3); id4 in-window

        # round 6: steady-state advance = delete round-3 + add round-6
        # files; the in-window maybe (id5) scans delta files only (no
        # sidecar exists before the COMPACT_EVERY boundary)
        for w in (work_c, work_b):
            write_frontier(w, 6, ["id6", "idX"])
        out6, seg6 = run_round(6, ["id0", "id5", "new6"])
        assert out6["novel"] == 2
        front6 = {p for p in seg6 if "/frontier/" in p and work_c in p}
        assert len(front6) <= 4, front6  # rounds 3,6 (advance) + 4,5 (scan)
        assert not any("ttl_member" in p for p in seg6 if work_c in p)

        # crash-rerun of round 6 with all-novel candidates: gate already
        # advanced (through=6) ⇒ ZERO frontier reads, ZERO exact reads —
        # the all-miss fast path touches nothing but the gate sidecar
        cd = cand_dir(tmp_path / "cand6b", ["fresh1", "fresh2"])
        p6c = cr.make_prober(work_c, 6, seen_ttl_rounds=ttl,
                             num_buckets=1, seen_gate="cuckoo")
        reads.clear()
        out6c = cr._probe_one(p6c, bucket, cd)
        assert out6c["novel"] == 2
        assert not [p for p in reads if "/frontier/" in p and work_c in p]
        assert not [p for p in reads if "ttl_member" in p and work_c in p]

        # rounds 7–8 cross the COMPACT_EVERY=8 boundary: round 7 writes
        # the exact sidecar (7 − (−1) = 8 rounds since any compaction)
        for rnd in (7, 8):
            for w in (work_c, work_b):
                write_frontier(w, rnd, [f"id{rnd}", "idX"])
            run_round(rnd, ["id0", f"id{rnd - 1}", f"new{rnd}"])
        import os as _os

        assert any(
            f.startswith("bucket=0000.through=000007")
            for f in _os.listdir(_os.path.join(work_c, "ttl_member"))
        )

        # round 9 steady state WITH sidecar: advance reads rounds 6+9,
        # the maybe-hit (id7, in the compacted map with last_round=7 ≥
        # lo=7) resolves via ONE filtered sidecar point read — no window
        # rescans
        for w in (work_c, work_b):
            write_frontier(w, 9, ["id9", "idX"])
        out9, seg9 = run_round(9, ["id0", "id7", "new9"])
        assert out9["novel"] == 2
        front9 = {p for p in seg9 if "/frontier/" in p and work_c in p}
        assert len(front9) <= 2, front9  # exiting round 6 + entering round 9
        assert sum("ttl_member" in p for p in seg9 if work_c in p) == 1

    def test_ttl_change_across_resume_rebuilds_gate(self, tmp_path):
        """Raising seen_ttl_rounds on a resume must NOT run the
        incremental advance against the old gate: the advance would
        delete_many a round whose copies were never inserted, which
        strips the identical-fingerprint copy of a still-in-window
        member (CuckooFilter.delete_many contract) — a gate false
        negative that silently re-enqueues a seen page.  The gate
        sidecar stamps its TTL; a mismatch rebuilds from window files.

        The exact path has the same hole ONE layer deeper: the
        ttl_member sidecar (folded at the COMPACT_EVERY boundary)
        pruned members below the OLD horizon, and the catch-up scan
        starts at state_r+1 — so a member whose last round re-enters
        the ENLARGED window is unrecoverable from the stale sidecar.
        The sidecar therefore stamps its TTL too, and a mismatch
        rebuilds from the full window ('dup2' below exercises it).

        Repro: 'dup' is a member of rounds 5 and 7; 'dup2' of round 5
        only.  ttl=3 state maintained through round 9 (the round-8
        fold wrote a sidecar pruned at lo=6, so 'dup2' (last=5) was
        dropped from it).  Resume round 10 with ttl=6 ⇒ lo=5: BOTH
        must be SEEN.  The un-stamped gate-advance path would delete
        never-inserted rounds (removing 'dup's only copy), and the
        un-stamped sidecar path would trust the pruned map + scan only
        rounds ≥ 9, emitting 'dup2' as novel."""
        import hashlib

        import web_graph_ray.pipelines.crawl as cr
        from web_graph_ray.state.checkpoint import (
            atomic_write_parquet,
            bucket_file,
            frontier_dirs,
        )

        H = lambda s: hashlib.sha1(s.encode()).hexdigest()
        bucket = 0
        work = str(tmp_path / "w")

        def write_frontier(rnd, names):
            tbl = pa.Table.from_pydict(
                {"page_id": pa.array([H(n) for n in names], type=pa.string())}
            )
            atomic_write_parquet(tbl, bucket_file(frontier_dirs(work, rnd)[0], bucket))

        def cand_dir(d, names):
            to = [H(n) for n in names]
            atomic_write_parquet(
                pa.Table.from_pydict(
                    {
                        "page_id": pa.array(["p"] * len(to)),
                        "to_page_id": pa.array(to),
                        "to_url": pa.array(["u"] * len(to)),
                        "to_hostname": pa.array(["h"] * len(to)),
                        "to_host": pa.array(["h"] * len(to)),
                        "to_path": pa.array(["/"] * len(to)),
                        "candidate_seq": pa.array([f"0.{i}" for i in range(len(to))]),
                        "priority": pa.array([0] * len(to), type=pa.int64()),
                    }
                ),
                str(d) + "/part.parquet",
            )
            return str(d)

        for r in range(10):
            members = [f"id{r}"] + (["dup"] if r in (5, 7) else [])
            if r == 5:
                members.append("dup2")
            write_frontier(r, members)

        # maintain the cuckoo TTL gate under ttl=3 through round 9
        for rnd in (8, 9):
            p = cr.make_prober(work, rnd, seen_ttl_rounds=3,
                               num_buckets=1, seen_gate="cuckoo")
            cr._probe_one(p, bucket, cand_dir(tmp_path / f"c{rnd}", [f"new{rnd}"]))
            # the probe wrote round rnd+1 novel sidecars; overwrite with
            # the scripted membership for determinism
            write_frontier(rnd + 1, [f"id{rnd + 1}"])
        from web_graph_ray.state.seen import load_gate

        g, gr, gttl = load_gate(work, bucket, name="ttl_gate", with_ttl=True)
        assert gr == 9 and gttl == 3
        # the round-8 fold wrote a ttl=3-stamped sidecar pruned at
        # lo=6 — 'dup2' (last round 5) is NOT in it
        import os as _os

        side = [f for f in _os.listdir(_os.path.join(work, "ttl_member"))]
        assert any("through=000008" in f for f in side), side

        # resume round 10 with ttl=6 ⇒ lo=5: 'dup' (last round 7) AND
        # 'dup2' (last round 5, pruned from the stale sidecar) must
        # both be filtered as seen, not emitted as novel
        p10 = cr.make_prober(work, 10, seen_ttl_rounds=6,
                             num_buckets=1, seen_gate="cuckoo")
        out = cr._probe_one(
            p10, bucket,
            cand_dir(tmp_path / "c10", ["dup", "dup2", "brandnew"]),
        )
        assert out["novel"] == 1, (
            "TTL raise across resume produced a false negative"
        )
        # the rebuilt gate is stamped with the new TTL
        g2, gr2, gttl2 = load_gate(work, bucket, name="ttl_gate", with_ttl=True)
        assert gr2 == 10 and gttl2 == 6

        # the bloom TTL path hits the same sidecar hole: run it on a
        # copy of the state (fresh gate family) and check equivalence
        p10b = cr.make_prober(work, 10, seen_ttl_rounds=6, num_buckets=1)
        f11 = bucket_file(frontier_dirs(work, 11)[0], bucket)
        _os.remove(f11)  # drop the cuckoo run's novel output first
        outb = cr._probe_one(
            p10b, bucket,
            cand_dir(tmp_path / "c10b", ["dup", "dup2", "brandnew"]),
        )
        assert outb["novel"] == 1


class TestSessionizeManyKeys:
    def test_100k_keys_vectorized(self, ray_session):
        """10^5 distinct users: one vectorized kernel per bucket, NOT one
        UDF call per key (which takes minutes at this cardinality)."""
        from web_graph_ray.stages.relational import sessionize

        rng = np.random.default_rng(11)
        n_users, n_events = 100_000, 300_000
        users = rng.integers(0, n_users, n_events)
        ts = rng.integers(0, 3_000_000, n_events)
        df = pd.DataFrame(
            {
                "user_id": users,
                # microsecond unit, like the parquet events table — the
                # kernel's //1e6 epoch math expects us resolution
                "ts": pd.to_datetime(ts, unit="s").astype("datetime64[us]"),
            }
        )
        ds = ray.data.from_pandas(df).repartition(8)
        out = sessionize(ds, "user_id", "ts", 1800).to_pandas()

        # pandas oracle on a sample of users
        sample = rng.choice(n_users, 50, replace=False)
        sub = df[df.user_id.isin(sample)]
        exp_rows = 0
        for uid, g in sub.groupby("user_id"):
            s = (g["ts"].astype("int64") // 1_000_000).sort_values()
            exp_rows += int((s.diff().fillna(1801) > 1800).sum())
        got = out[out.user_id.isin(sample)]
        assert len(got) == exp_rows
        assert out["n_events"].sum() == n_events


class TestWideOpScaleGuards:
    def test_global_rank_driver_state_is_o_buckets(
        self, ray_session, driver_probe
    ):
        """global_rank's only driver materialization is the per-bucket
        count table (≤ buckets·blocks partial rows), never the data."""
        from web_graph_ray.stages.relational import global_rank

        n = 50_000
        rng = np.random.default_rng(3)
        df = pd.DataFrame(
            {"id": np.arange(n, dtype=np.int64), "v": rng.normal(size=n)}
        )
        ds = ray.data.from_pandas(df).repartition(8)
        out = global_rank(ds, "v", ["id"], num_buckets=32)
        # consume distributed (count), not via to_pandas
        assert out.count() == n
        assert max(driver_probe, default=0) <= 32 * 8, driver_probe

    def test_weighted_sample_driver_rows_bounded_by_k(
        self, ray_session, driver_probe
    ):
        """weighted_sample never materializes the dataset: the partial
        top-k combiner bounds every exchange at k rows per block."""
        from web_graph_ray.stages.relational import weighted_sample

        n = 50_000
        rng = np.random.default_rng(4)
        df = pd.DataFrame(
            {"id": np.arange(n, dtype=np.int64),
             "w": rng.integers(1, 50, n).astype(np.int64)}
        )
        ds = ray.data.from_pandas(df).repartition(8)
        out = weighted_sample(ds, ["id"], "w", 100)
        assert out.count() == 100
        assert max(driver_probe, default=0) <= 1000, driver_probe


class TestAnnExactQueryGuard:
    def test_query_count_gate_routes_to_ivf(self, ray_session):
        """VERDICT r3 item 8: the exact ANN path holds k x |queries| x
        blocks candidate rows on the driver — beyond MAX_EXACT_QUERIES it
        must refuse loudly (with the IVF/LSH routing hint) rather than
        melt the driver; under the gate it still answers."""
        import pytest as _pytest

        import web_graph_ray.stages.ann as ann

        rng = np.random.default_rng(9)
        ds = ray.data.from_pandas(
            pd.DataFrame(
                {
                    "vec_id": np.arange(200, dtype=np.int64),
                    "embedding": list(rng.normal(size=(200, 8))),
                }
            )
        ).repartition(4)
        small = rng.normal(size=(3, 8))
        out = ann.cosine_topk(ds, small, k=5)
        assert len(out) == 15

        too_many = rng.normal(size=(ann.MAX_EXACT_QUERIES + 1, 8))
        with _pytest.raises(ValueError, match="ivf_cosine_topk"):
            ann.cosine_topk(ds, too_many, k=5)


class TestContaminationFraction:
    def test_matches_reference_and_benchmark_scores_one(self, ray_session):
        """Fractional overlap agrees with a literal per-doc window scan;
        benchmark docs score exactly 1.0; <n-token docs drop."""
        import re

        from web_graph_ray.stages.dedup import contamination_fraction

        word = re.compile(r"[A-Za-z0-9]+")
        rows = [
            # benchmark doc
            {"doc_id": 0, "is_bench": 1,
             "text": "alpha beta gamma delta epsilon zeta"},
            # fully contaminated copy
            {"doc_id": 1, "is_bench": 0,
             "text": "alpha beta gamma delta epsilon zeta"},
            # half-window overlap
            {"doc_id": 2, "is_bench": 0,
             "text": "alpha beta gamma delta epsilon nope x y z w"},
            # clean
            {"doc_id": 3, "is_bench": 0,
             "text": "one two three four five six seven"},
            # too short: no 5-gram windows
            {"doc_id": 4, "is_bench": 0, "text": "tiny doc"},
        ]
        df = pd.DataFrame(rows)

        def ref():
            grams = lambda t: [
                " ".join(ws[i : i + 5])
                for ws in [word.findall(t.lower())]
                for i in range(len(ws) - 4)
            ]
            bench = set()
            for r in rows:
                if r["is_bench"]:
                    bench.update(grams(r["text"]))
            out = {}
            for r in rows:
                gs = grams(r["text"])
                if gs:
                    out[r["doc_id"]] = sum(g in bench for g in gs) / len(gs)
            return out

        want = ref()
        got = (
            contamination_fraction(
                ray.data.from_pandas(df).repartition(3), round_to=None
            )
            .to_pandas()
            .set_index("doc_id")
        )
        assert sorted(got.index) == sorted(want)  # doc 4 dropped
        for d, f in want.items():
            assert got.loc[d, "contam_frac"] == pytest.approx(f, abs=1e-9)
        assert got.loc[0, "contam_frac"] == 1.0
        assert got.loc[1, "contam_frac"] == 1.0
        assert got.loc[3, "contam_frac"] == 0.0

    def test_empty_benchmark_defined(self, ray_session):
        from web_graph_ray.stages.dedup import contamination_fraction

        df = pd.DataFrame(
            {
                "doc_id": [0, 1],
                "is_bench": [0, 0],
                "text": ["a b c d e f", "g h i j k l"],
            }
        )
        out = contamination_fraction(ray.data.from_pandas(df)).to_pandas()
        assert (out["contam_frac"] == 0.0).all()
