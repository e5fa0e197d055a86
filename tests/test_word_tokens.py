"""The shared vectorized tokenizer (stages/text.word_tokens) and every
combiner rewritten on top of it (VERDICT r4 item 3) must be exactly
equivalent to the per-doc ``WORD_RE.findall(text.lower())`` loops they
replaced — including Unicode rows, where byte-level lowering is wrong
('K' U+212A lowers to ASCII 'k') and the per-row fallback must kick in.
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from web_graph_ray.functions.text import WORD_RE, repetition_metrics
from web_graph_ray.stages.text import (
    _token_codes,
    add_repetition_metrics,
    word_tokens,
)

WORDS = [
    "the", "Cat", "sat", "ON", "mat42", "x", "café", "K", "İstanbul",
    "ß", "a1b2", "---", "…", "", "\t", "naïve",
]


def rand_texts(seed: int, n: int) -> list[str]:
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        k = rng.randrange(0, 30)
        sep = rng.choice([" ", "\n", ".", " -- "])
        out.append(sep.join(rng.choice(WORDS) for _ in range(k)))
    return out


class TestWordTokens:
    @pytest.mark.parametrize("seed", [1, 2, 3])
    def test_matches_reference_loop(self, seed):
        texts = rand_texts(seed, 300)
        toks, rows = word_tokens(pa.array(texts, type=pa.string()))
        got = list(zip(rows.tolist(), toks.to_pylist()))
        exp = [
            (i, t)
            for i, s in enumerate(texts)
            for t in WORD_RE.findall(s.lower())
        ]
        assert got == exp

    def test_unicode_lowering_fallback(self):
        # U+212A KELVIN SIGN lowers to ASCII 'k'; byte-level lowering
        # alone would miss it — the fallback path must produce it
        texts = ["abc K def", "K", "ascii only HERE"]
        toks, rows = word_tokens(pa.array(texts))
        got = list(zip(rows.tolist(), toks.to_pylist()))
        assert got == [
            (0, "abc"), (0, "k"), (0, "def"), (1, "k"),
            (2, "ascii"), (2, "only"), (2, "here"),
        ]

    def test_sliced_and_chunked_input(self):
        texts = rand_texts(7, 50)
        base = pa.array(texts)
        sl = base.slice(10, 25)
        toks, rows = word_tokens(sl)
        exp = [
            (i, t)
            for i, s in enumerate(texts[10:35])
            for t in WORD_RE.findall(s.lower())
        ]
        assert list(zip(rows.tolist(), toks.to_pylist())) == exp
        ch = pa.chunked_array([pa.array(texts[:20]), pa.array(texts[20:])])
        toks2, rows2 = word_tokens(ch)
        exp2 = [
            (i, t)
            for i, s in enumerate(texts)
            for t in WORD_RE.findall(s.lower())
        ]
        assert list(zip(rows2.tolist(), toks2.to_pylist())) == exp2

    def test_token_codes_roundtrip(self):
        toks, _ = word_tokens(pa.array(["a b a c b a", "c c d"]))
        codes, vocab, K = _token_codes(toks)
        assert [vocab[c].as_py() for c in codes] == toks.to_pylist()
        assert K == len(set(toks.to_pylist()))


class TestVectorizedRepetition:
    @pytest.mark.parametrize("seed", [11, 12])
    def test_bit_exact_vs_per_doc_loop(self, seed):
        texts = rand_texts(seed, 300) + [
            "", "\n", "a\na\na", "x y x y x y", "K K K",
            "  \n  ", "one\ntwo\none\ntwo\nthree",
        ]
        out = add_repetition_metrics(pa.table({"text": pa.array(texts)}))
        ref = [repetition_metrics(t) for t in texts]
        for nm in (
            "dup_line_frac",
            "dup_line_char_frac",
            "top_bigram_frac",
            "top_trigram_frac",
        ):
            got = out[nm].to_numpy()
            exp = np.array([r[nm] for r in ref])
            assert np.array_equal(got, exp), nm

    def test_empty_batch(self):
        out = add_repetition_metrics(
            pa.table({"text": pa.array([], type=pa.string())})
        )
        assert out.num_rows == 0
        assert "top_trigram_frac" in out.column_names


class TestEmptySideJoins:
    """Round-5 scale-down sweep finding: Ray drops block schema on
    all-empty datasets, which crashed every join flavor when one side
    filtered to nothing (q7/q16/kcore/full_join_classify at sf0.001).
    A schema-less side now means 'no rows, no extra columns' and the
    join stays total."""

    def _sides(self, ray):
        import pandas as pd
        import ray.data

        left = ray.data.from_pandas(
            pd.DataFrame({"k": [1, 2, 3], "a": [10, 20, 30]})
        )
        # filtered-to-empty through map_batches: schema is LOST
        empty = ray.data.from_pandas(
            pd.DataFrame({"k": [9], "b": [99]})
        ).map_batches(lambda df: df[df["k"] < 0], batch_format="pandas")
        return left, empty

    def test_full_join_empty_right(self, ray_session):
        from web_graph_ray.stages.relational import bucket_full_join

        left, empty = self._sides(ray_session)
        out = bucket_full_join(left, empty, ["k"]).to_pandas()
        assert sorted(out["k"]) == [1, 2, 3]
        assert set(out["_matched"]) == {"left_only"}

    def test_left_join_empty_right(self, ray_session):
        from web_graph_ray.stages.relational import bucket_left_join

        left, empty = self._sides(ray_session)
        out = bucket_left_join(left, empty, ["k"]).to_pandas()
        assert sorted(out["k"]) == [1, 2, 3]

    def test_inner_join_empty_side(self, ray_session):
        from web_graph_ray.stages.relational import bucket_hash_join

        left, empty = self._sides(ray_session)
        assert bucket_hash_join(left, empty, ["k"]).to_pandas().empty
        assert bucket_hash_join(empty, left, ["k"]).to_pandas().empty

    def test_set_op_empty_side(self, ray_session):
        from web_graph_ray.stages.relational import set_op

        left, _ = self._sides(ray_session)
        lk = left.map_batches(lambda df: df[["k"]], batch_format="pandas")
        ek = lk.map_batches(lambda df: df[df["k"] < 0], batch_format="pandas")
        assert set_op(lk, ek, how="intersect").to_pandas().empty
        assert sorted(set_op(lk, ek, how="except").to_pandas()["k"]) == [1, 2, 3]

    def test_broadcast_join_columnless_empty_small_side(self, ray_session):
        import pandas as pd

        from web_graph_ray.stages.relational import broadcast_join

        left, empty = self._sides(ray_session)
        empty_df = empty.to_pandas()  # zero columns
        assert list(empty_df.columns) == []
        assert broadcast_join(left, empty_df, on="k").to_pandas().empty
        out = broadcast_join(left, empty_df, on="k", how="left").to_pandas()
        assert sorted(out["k"]) == [1, 2, 3]

    def test_bloom_semi_join_empty_keys(self, ray_session):
        from web_graph_ray.stages.relational import bloom_semi_join

        left, _ = self._sides(ray_session)
        ek = left.map_batches(
            lambda df: df[df["k"] < 0][["k"]], batch_format="pandas"
        )
        assert bloom_semi_join(left, ek, ["k"]).to_pandas().empty


class TestEmptyCorpusOps:
    """Empty-INPUT hardening (round-5 probe): operators must return
    their typed empty/NaN contract on a zero-row corpus instead of
    crashing on Ray's schema-less empty blocks."""

    @staticmethod
    def _empty(ray, cols):
        import pandas as pd
        import ray.data

        df = pd.DataFrame(
            {
                c: pd.Series(["x"] if dt == "str" else [0],
                             dtype=("object" if dt == "str" else dt))
                for c, dt in cols.items()
            }
        )
        return ray.data.from_pandas(df).map_batches(
            lambda d: d.iloc[0:0], batch_format="pandas"
        )

    def test_bigram_topk_empty_corpus(self, ray_session):
        from web_graph_ray.stages.text import bigram_topk

        out = bigram_topk(self._empty(ray_session, {"doc_id": "int64", "text": "str"}))
        assert list(out.columns) == ["bigram", "n"] and out.empty

    def test_roc_auc_empty_input(self, ray_session):
        import numpy as np

        from web_graph_ray.stages.eval import roc_auc

        out = roc_auc(
            self._empty(ray_session, {"k": "int64", "v": "float64"}),
            "v", "k", stats=True,
        )
        assert np.isnan(out["auc"][0]) and np.isnan(out["z"][0])
        assert int(out["n_pos"][0]) == 0 and int(out["n_neg"][0]) == 0

    def test_global_prefix_sum_empty_input(self, ray_session):
        from web_graph_ray.stages.relational import global_prefix_sum

        ds = self._empty(ray_session, {"k": "int64", "v": "int64"})
        assert global_prefix_sum(ds, "k", "v").to_pandas().empty

    def test_minhash_and_decontaminate_empty_corpus(self, ray_session):
        from web_graph_ray.stages.dedup import decontaminate, minhash_lsh_pairs

        docs = self._empty(ray_session, {"doc_id": "int64", "text": "str"})
        assert minhash_lsh_pairs(docs).to_pandas().empty
        docs2 = self._empty(ray_session, {"doc_id": "int64", "text": "str"})
        bench = self._empty(ray_session, {"doc_id": "int64", "text": "str"})
        assert decontaminate(docs2, bench).to_pandas().empty

    def _empty_emb(self, ray):
        import pandas as pd
        import ray.data

        df = pd.DataFrame(
            {
                "vec_id": pd.Series([0], dtype="int64"),
                "embedding": pd.Series([[0.0] * 8], dtype="object"),
            }
        )
        return ray.data.from_pandas(df).map_batches(
            lambda d: d.iloc[0:0], batch_format="pandas"
        )

    def test_ann_empty_corpus(self, ray_session):
        import numpy as np

        from web_graph_ray.stages.ann import cosine_topk, kmeans

        Q = np.zeros((2, 8))
        Q[:, 0] = 1.0
        out = cosine_topk(self._empty_emb(ray_session), Q, k=3)
        assert list(out.columns) == ["query_id", "vec_id", "score"] and out.empty
        with pytest.raises(ValueError, match="empty dataset"):
            kmeans(self._empty_emb(ray_session), k=2)

    def test_text_ops_empty_corpus(self, ray_session):
        from web_graph_ray.stages.text import (
            dsir_logweights,
            inverted_index,
            logodds_terms,
        )

        docs = self._empty(ray_session, {"doc_id": "int64", "text": "str"})
        assert inverted_index(docs).empty
        gdocs = self._empty(ray_session, {"source": "str", "text": "str"})
        assert logodds_terms(gdocs).to_pandas().empty
        tdocs = self._empty(
            ray_session, {"doc_id": "int64", "text": "str", "is_target": "int64"}
        )
        d = dsir_logweights(tdocs)
        assert (d.to_pandas() if hasattr(d, "to_pandas") else d).empty
