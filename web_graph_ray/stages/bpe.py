"""Distributed BPE merge-rule learning (Sennrich et al. 2016) — the
tokenizer-training step of an LLM data pipeline.

Learns the first k byte-pair-encoding merges over a document corpus:
words are whitespace tokens, each initialized as its character sequence
plus an ``</w>`` end marker; every round counts adjacent token pairs
weighted by word frequency, picks the (count desc, pair asc) argmax,
and greedily merges non-overlapping occurrences left-to-right.

Scale shape:

- word counts: one per-batch partial count + one bucketed exchange
  (``bucketed_agg``) — the corpus text is read exactly once; everything
  after runs over the DISTINCT-WORD vocabulary (≪ corpus at web scale).
- per round: pair counts are per-batch partial Counters → one bucketed
  sum exchange; the argmax is a per-block best-row reduction (≤ 1 row
  per block reaches the driver — the ANN partial-top-k shape); the
  chosen pair (a 3-tuple) is the only broadcast.  Driver state is O(k).
- the vocabulary Dataset is ``materialize()``d between rounds — it is
  the iteration state (the k-means/PageRank pattern), bounded by
  |vocab|, never the corpus.

The per-word merge loop is a Python loop over token lists (like the
MinHash signature kernel: inherent to the greedy left-to-right
semantics); each word is a few dozen tokens, and the loop runs only on
the distinct vocabulary.

Reference parity note: the reference crawler has no tokenizer; this is
part of the beyond-parity training-data operator family (brief §"Beyond
the reference's own operators").
"""

from __future__ import annotations

import pandas as pd

__all__ = ["bpe_learn", "bpe_token_counts"]

END = "</w>"


def merge_tokens(toks: list, a: str, b: str, ab: str) -> list:
    """Greedy non-overlapping left-to-right merge of (a, b) → ab."""
    out, i, n = [], 0, len(toks)
    while i < n:
        if toks[i] == a and i + 1 < n and toks[i + 1] == b:
            out.append(ab)
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return out


def bpe_learn(
    docs,
    k: int,
    text_col: str = "text",
    num_buckets: int = 32,
    return_vocab: bool = False,
):
    """Learn the first ``k`` BPE merges; returns a DataFrame
    (rank, left_tok, right_tok, cnt) with cnt = the pair's weighted
    count at merge time.  Deterministic: ties break on the
    lexicographically smallest (left_tok, right_tok).  With
    ``return_vocab`` also returns the final tokenized vocabulary
    Dataset (word, cnt, toks) for the encode step."""
    from .relational import bucketed_agg

    def words_partial(df: pd.DataFrame) -> pd.DataFrame:
        s = df[text_col].str.split(" ").explode()
        g = s.groupby(s, sort=False).size()
        return pd.DataFrame(
            {"word": g.index.to_numpy(dtype=object),
             "cnt": g.to_numpy().astype("int64")}
        )

    wc = bucketed_agg(
        docs.map_batches(words_partial, batch_format="pandas"),
        ["word"],
        value_col="cnt",
        how="sum",
        out_col="cnt",
        num_buckets=num_buckets,
    )

    def to_vocab(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["toks"] = [list(w) + [END] for w in df["word"]]
        return df

    vocab = wc.map_batches(to_vocab, batch_format="pandas").materialize()

    def pairs_partial(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        pc: Counter = Counter()
        for toks, c in zip(df["toks"], df["cnt"]):
            ci = int(c)
            for pair in zip(toks, toks[1:]):
                pc[pair] += ci
        if not pc:
            return pd.DataFrame(
                {"a": pd.Series([], dtype=object),
                 "b": pd.Series([], dtype=object),
                 "c": pd.Series([], dtype="int64")}
            )
        keys = list(pc)
        return pd.DataFrame(
            {"a": [p[0] for p in keys],
             "b": [p[1] for p in keys],
             "c": pd.Series([pc[p] for p in keys], dtype="int64")}
        )

    def best_row(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        return df.sort_values(
            ["c", "a", "b"], ascending=[False, True, True], kind="mergesort"
        ).head(1)

    merges = []
    for r in range(1, k + 1):
        counts = bucketed_agg(
            vocab.map_batches(pairs_partial, batch_format="pandas"),
            ["a", "b"],
            value_col="c",
            how="sum",
            out_col="c",
            num_buckets=num_buckets,
        )
        cand = (
            counts.map_batches(best_row, batch_format="pandas")
            .to_pandas()  # ≤ 1 row per block
        )
        if not len(cand):
            break
        cand = cand.sort_values(
            ["c", "a", "b"], ascending=[False, True, True], kind="mergesort"
        )
        a, b, c = cand.iloc[0]["a"], cand.iloc[0]["b"], int(cand.iloc[0]["c"])
        merges.append((r, a, b, c))
        ab = a + b

        def apply_merge(df: pd.DataFrame, a=a, b=b, ab=ab) -> pd.DataFrame:
            df = df.copy()
            df["toks"] = [merge_tokens(t, a, b, ab) for t in df["toks"]]
            return df

        vocab = vocab.map_batches(apply_merge, batch_format="pandas").materialize()

    out = pd.DataFrame(
        merges, columns=["rank", "left_tok", "right_tok", "cnt"]
    ).astype({"rank": "int64", "cnt": "int64"})
    return (out, vocab) if return_vocab else out


def bpe_token_counts(
    docs,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 32,
) -> "pd.DataFrame":
    """BPE ENCODE step: per-document token count under the vocabulary
    learned by ``bpe_learn(k)`` — the sizing pass of a tokenizer
    pipeline.  Returns a Dataset of (id, n_bpe_tokens).

    Distributed shape: per-batch (doc, word, occurrences) partial
    counts → one co-partitioned ``bucket_hash_join`` against the
    learned vocab's per-word token lengths (no broadcast at any vocab
    size) → per-doc bucketed sum.  The heavy merge loop ran once per
    DISTINCT word inside bpe_learn; encode never re-merges."""
    from .relational import bucket_hash_join, bucketed_agg

    _, vocab = bpe_learn(
        docs, k, text_col=text_col, num_buckets=num_buckets, return_vocab=True
    )

    def word_lens(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"word": df["word"],
             "nt": [len(t) for t in df["toks"]]}
        ).astype({"nt": "int64"})

    lens = vocab.map_batches(word_lens, batch_format="pandas")

    def doc_words(df: pd.DataFrame) -> pd.DataFrame:
        s = (
            df.set_index(id_col)[text_col]
            .str.split(" ")
            .explode()
            .rename("word")
        )
        out = s.groupby([s.index, s]).size().rename("m").reset_index()
        return out.astype({"m": "int64"})

    dw = docs.map_batches(doc_words, batch_format="pandas")
    joined = bucket_hash_join(dw, lens, ["word"], num_buckets=num_buckets)

    def weigh(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {id_col: df[id_col],
             "n_bpe_tokens": (df["m"] * df["nt"]).astype("int64")}
        )

    return bucketed_agg(
        joined.map_batches(weigh, batch_format="pandas"),
        [id_col],
        value_col="n_bpe_tokens",
        how="sum",
        out_col="n_bpe_tokens",
        num_buckets=num_buckets,
    )
