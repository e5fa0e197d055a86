"""Label-propagation and log-odds-terms operator tests: exact
agreement with local reference implementations of the promised
semantics (synchronous mode-vote LPA; Monroe log-odds z-scores)."""

import math

import numpy as np
import pandas as pd
import pytest

import ray.data

from web_graph_ray.stages.graph import label_propagation
from web_graph_ray.stages.text import logodds_terms


def reference_lpa(edges, rounds):
    """Synchronous LPA on the SIMPLE undirected graph (dedup, no
    self-loops): most frequent neighbour label, ties to the smallest
    label, isolated nodes keep their own."""
    simple = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj: dict[int, set[int]] = {}
    for u, v in simple:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    lab = {n: n for n in adj}
    for _ in range(rounds):
        new = {}
        for n in adj:
            votes: dict[int, int] = {}
            for p in adj[n]:
                votes[lab[p]] = votes.get(lab[p], 0) + 1
            best = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            new[n] = best
        lab = new
    return dict(sorted(lab.items()))


GRAPHS = {
    # two triangles joined by one bridge edge: each triangle converges
    # to its own min label, the bridge does not flip either side
    "two_triangles": [(1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4), (3, 4)],
    # star: the hub adopts the (unanimous) leaf label space's min via
    # vote count, leaves all adopt the hub's label — oscillation shape
    # that makes SYNCHRONOUS semantics observable
    "star": [(0, 1), (0, 2), (0, 3), (0, 4)],
    # multi-edges and self-loops must NOT weight votes
    "multi_self": [(1, 2), (1, 2), (2, 1), (1, 1), (2, 3), (3, 1), (3, 4)],
    # path: label waves travel one hop per round — exercises the
    # exactly-r-rounds contract
    "path": [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)],
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
@pytest.mark.parametrize("rounds", [1, 3])
def test_lpa_matches_reference(name, rounds, ray_session):
    edges = GRAPHS[name]
    ds = ray.data.from_pandas(
        pd.DataFrame(edges, columns=["src", "dst"]).astype("int64")
    )
    out = label_propagation(ds, rounds=rounds, num_buckets=4).to_pandas()
    got = dict(sorted(zip(out["node"].astype(int), out["label"].astype(int))))
    assert got == reference_lpa(edges, rounds)


def test_lpa_parallelism_invariance(ray_session):
    """Bucket count must not change the result (the semantics are
    defined by the graph, not the partitioning)."""
    rng = np.random.RandomState(7)
    edges = [(int(a), int(b)) for a, b in rng.randint(0, 40, size=(300, 2))]
    ds = ray.data.from_pandas(
        pd.DataFrame(edges, columns=["src", "dst"]).astype("int64")
    )
    outs = []
    for nb in (2, 8):
        out = label_propagation(ds, rounds=3, num_buckets=nb).to_pandas()
        outs.append(
            out.astype({"node": "int64", "label": "int64"})
            .sort_values("node")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])
    assert dict(zip(outs[0]["node"], outs[0]["label"])) == reference_lpa(edges, 3)


def reference_logodds(docs, k):
    """Per-group Monroe log-odds z (add-0.5 smoothing), top-k by
    (rounded z desc, tok asc)."""
    import re

    counts: dict[tuple, int] = {}
    for g, text in docs:
        for t in re.findall(r"[a-z0-9]+", text.lower()):
            counts[(g, t)] = counts.get((g, t), 0) + 1
    yw: dict[str, int] = {}
    ns: dict[str, int] = {}
    for (g, t), y in counts.items():
        yw[t] = yw.get(t, 0) + y
        ns[g] = ns.get(g, 0) + y
    N = sum(ns.values())
    rows = []
    for (g, t), y in counts.items():
        rest = yw[t] - y
        delta = math.log((y + 0.5) / (ns[g] - y + 0.5)) - math.log(
            (rest + 0.5) / (N - ns[g] - rest + 0.5)
        )
        z = delta / math.sqrt(1.0 / (y + 0.5) + 1.0 / (rest + 0.5))
        rows.append((g, t, round(z, 6)))
    df = pd.DataFrame(rows, columns=["source", "tok", "zscore"])
    return (
        df.sort_values(["source", "zscore", "tok"], ascending=[True, False, True])
        .groupby("source")
        .head(k)
        .reset_index(drop=True)
    )


def test_logodds_matches_reference(ray_session):
    docs = [
        ("a", "alpha alpha beta gamma"),
        ("a", "alpha delta delta"),
        ("b", "beta beta beta gamma epsilon"),
        ("b", "epsilon epsilon zeta"),
        ("c", "gamma gamma gamma alpha"),
    ]
    ds = ray.data.from_pandas(pd.DataFrame(docs, columns=["source", "text"]))
    out = (
        logodds_terms(ds, k=3, num_buckets=4)
        .to_pandas()
        .sort_values(["source", "zscore", "tok"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    ref = reference_logodds(docs, 3)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_logodds_overrepresented_not_frequent(ray_session):
    """The token every group shares heavily must NOT top any group's
    list — distinctiveness, not frequency (the contrast with TF)."""
    common = "the " * 20
    docs = [
        ("a", common + "quark quark quark"),
        ("b", common + "gluon gluon gluon"),
    ]
    ds = ray.data.from_pandas(pd.DataFrame(docs, columns=["source", "text"]))
    out = logodds_terms(ds, k=1, num_buckets=2).to_pandas()
    top = dict(zip(out["source"], out["tok"]))
    assert top == {"a": "quark", "b": "gluon"}


def reference_dsir(df, alpha=0.5):
    """Literal per-doc DSIR log-weight: exact-token unigram models with
    add-alpha smoothing, target = is_target rows."""
    import collections
    import math
    import re

    word = re.compile(r"[A-Za-z0-9]+")
    cq, cp = collections.Counter(), collections.Counter()
    per_doc = {}
    for _, r in df.iterrows():
        toks = word.findall(r["text"].lower())
        per_doc[r["doc_id"]] = collections.Counter(toks)
        cq.update(toks)
        if r["is_target"]:
            cp.update(toks)
    v = len(cq)
    tq, tp = sum(cq.values()), sum(cp.values())
    out = {}
    for d, cnt in per_doc.items():
        s = 0.0
        for t, c in cnt.items():
            s += c * (
                math.log((cp.get(t, 0) + alpha) / (tp + alpha * v))
                - math.log((cq[t] + alpha) / (tq + alpha * v))
            )
        out[d] = s
    return out


def test_dsir_matches_reference_and_parallelism_invariant(ray_session):
    from web_graph_ray.stages.text import dsir_logweights

    rng = np.random.default_rng(7)
    vocab = ["alpha", "beta", "gamma", "delta", "web", "crawl", "data"]
    rows = []
    for i in range(40):
        n = int(rng.integers(3, 25))
        rows.append(
            {
                "doc_id": i,
                "text": " ".join(rng.choice(vocab, n)),
                "is_target": int(i % 3 == 0),
            }
        )
    df = pd.DataFrame(rows)
    want = reference_dsir(df)

    got1 = (
        dsir_logweights(ray.data.from_pandas(df).repartition(1))
        .to_pandas().set_index("doc_id")["dsir_logw"]
    )
    got8 = (
        dsir_logweights(ray.data.from_pandas(df).repartition(8))
        .to_pandas().set_index("doc_id")["dsir_logw"]
    )
    assert len(got1) == len(df)
    for d, w in want.items():
        assert got1[d] == pytest.approx(w, abs=1e-9)
    # parallelism invariance: identical floats at any block layout
    pd.testing.assert_series_equal(got1.sort_index(), got8.sort_index())

    # target docs score higher on average than non-target (the point
    # of importance resampling: in-domain text is up-weighted)
    m = df.set_index("doc_id")["is_target"]
    assert got1[m == 1].mean() > got1[m == 0].mean()


def test_dsir_no_target_docs_defined(ray_session):
    """tp == 0 must stay finite (add-alpha smoothing covers it)."""
    from web_graph_ray.stages.text import dsir_logweights

    df = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": ["alpha beta", "beta gamma gamma"],
            "is_target": [0, 0],
        }
    )
    out = dsir_logweights(ray.data.from_pandas(df)).to_pandas()
    assert np.isfinite(out["dsir_logw"]).all()


def reference_nb(df, alpha=1.0):
    """Literal multinomial NB log posteriors: add-alpha smoothing over
    the full (label, token) grid — the decomposed engine form must
    equal this exactly for alpha=1."""
    import collections
    import math
    import re

    word = re.compile(r"[A-Za-z0-9]+")
    per_doc, lab_cnt = {}, collections.Counter()
    lt = collections.defaultdict(collections.Counter)
    vocab = set()
    for _, r in df.iterrows():
        toks = word.findall(r["text"].lower())
        per_doc[r["doc_id"]] = collections.Counter(toks)
        lab_cnt[r["lang"]] += 1
        lt[r["lang"]].update(toks)
        vocab.update(toks)
    v, n = len(vocab), len(df)
    out = {}
    for d, cnt in per_doc.items():
        for lab in lab_cnt:
            tl = sum(lt[lab].values())
            s = math.log(lab_cnt[lab] / n)
            for t, c in cnt.items():
                s += c * math.log((lt[lab].get(t, 0) + alpha) / (tl + alpha * v))
            out[(d, lab)] = s
    return out


def test_naive_bayes_matches_reference(ray_session):
    from web_graph_ray.stages.text import naive_bayes_scores

    rng = np.random.default_rng(3)
    vocabs = {
        "en": ["the", "web", "crawl", "data", "page"],
        "de": ["der", "netz", "seite", "daten", "crawl"],
        "es": ["la", "red", "pagina", "datos", "web"],
    }
    rows = []
    for i in range(30):
        lab = ["en", "de", "es"][i % 3]
        n = int(rng.integers(3, 15))
        rows.append(
            {"doc_id": i, "lang": lab, "text": " ".join(rng.choice(vocabs[lab], n))}
        )
    df = pd.DataFrame(rows)
    want = reference_nb(df)

    got = (
        naive_bayes_scores(ray.data.from_pandas(df).repartition(4))
        .to_pandas()
        .set_index(["doc_id", "label"])["nb_score"]
    )
    assert len(got) == 30 * 3  # every doc scores every label
    for (d, lab), w in want.items():
        assert got[(d, lab)] == pytest.approx(w, abs=1e-9), (d, lab)

    # training labels dominate: the argmax recovers lang on this
    # separable corpus
    pred = (
        got.reset_index()
        .sort_values(["doc_id", "nb_score", "label"],
                     ascending=[True, False, True])
        .drop_duplicates("doc_id")
        .set_index("doc_id")["label"]
    )
    truth = df.set_index("doc_id")["lang"]
    assert (pred == truth).mean() > 0.9


def test_naive_bayes_rejects_other_alpha(ray_session):
    from web_graph_ray.stages.text import naive_bayes_scores

    df = pd.DataFrame({"doc_id": [0], "lang": ["en"], "text": ["a b"]})
    with pytest.raises(ValueError, match="alpha=1"):
        naive_bayes_scores(ray.data.from_pandas(df), alpha=0.5)


def test_tokenless_blocks_keep_schema(ray_session):
    """A block whose docs are all punctuation (zero WORD_RE tokens)
    must not poison the bucketed exchange with a float64-typed empty
    schema — dsir, NB and contamination_fraction all explode typed."""
    from web_graph_ray.stages.dedup import contamination_fraction
    from web_graph_ray.stages.text import dsir_logweights, naive_bayes_scores

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": ["alpha beta gamma delta epsilon", "!!! ??? ...",
                     "alpha beta gamma delta zeta", "###"],
            "lang": ["en", "en", "de", "de"],
            "is_target": [1, 0, 0, 0],
            "is_bench": [1, 0, 0, 0],
        }
    )
    # repartition(4): the punctuation docs land in their own blocks
    ds = ray.data.from_pandas(df).repartition(4)
    d = dsir_logweights(ds).to_pandas()
    assert sorted(d["doc_id"]) == [0, 2]  # tokenless docs have no rows
    n = naive_bayes_scores(ds).to_pandas()
    assert sorted(n["doc_id"].unique()) == [0, 2]
    c = contamination_fraction(ds, n=3).to_pandas()
    assert sorted(c["doc_id"]) == [0, 2]
