"""Vectorized text-analysis stages (map_batches UDFs over documents).

Batch wrappers around functions/text.py.  Per-row regex work runs with
compiled patterns at C speed; everything returns Arrow tables.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.text import (
    bpe_piece_count,
    detect_lang,
    fingerprint,
    quality_metrics,
    simhash64,
    token_count,
)

__all__ = [
    "add_token_counts",
    "add_quality_metrics",
    "add_repetition_metrics",
    "add_lang",
    "add_fingerprint",
    "add_simhash",
    "quality_filter",
    "tfidf_topk",
    "add_normalized",
    "stopword_scrub",
]


def add_token_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch[text_col].to_pylist()
    batch = batch.append_column(
        "n_tokens", pa.array([token_count(t) for t in texts], type=pa.int64())
    )
    return batch.append_column(
        "n_pieces", pa.array([bpe_piece_count(t) for t in texts], type=pa.int64())
    )


def add_quality_metrics(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch[text_col].to_pylist()
    rows = [quality_metrics(t) for t in texts]
    for name, typ in (
        ("n_chars", pa.int64()),
        ("n_tokens", pa.int64()),
        ("alpha_ratio", pa.float64()),
        ("digit_ratio", pa.float64()),
        ("mean_token_len", pa.float64()),
    ):
        batch = batch.append_column(name, pa.array([r[name] for r in rows], type=typ))
    return batch


def add_lang(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch[text_col].to_pylist()
    return batch.append_column(
        "lang_pred", pa.array([detect_lang(t) for t in texts], type=pa.string())
    )


def add_fingerprint(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch[text_col].to_pylist()
    return batch.append_column(
        "fingerprint", pa.array([fingerprint(t) for t in texts], type=pa.int64())
    )


def add_simhash(batch: pa.Table, text_col: str = "text", k: int = 5) -> pa.Table:
    texts = batch[text_col].to_pylist()
    return batch.append_column(
        "simhash", pa.array([simhash64(t, k) for t in texts], type=pa.int64())
    )


def add_repetition_metrics(batch: pa.Table, text_col: str = "text") -> pa.Table:
    from ..functions.text import repetition_metrics

    rows = [repetition_metrics(t) for t in batch[text_col].to_pylist()]
    for name in (
        "dup_line_frac",
        "dup_line_char_frac",
        "top_bigram_frac",
        "top_trigram_frac",
    ):
        batch = batch.append_column(
            name, pa.array([r[name] for r in rows], type=pa.float64())
        )
    return batch


def quality_filter(
    docs,
    text_col: str = "text",
    min_tokens: int = 25,
    max_tokens: int = 90,
    min_alpha_ratio: float = 0.5,
    max_digit_ratio: float = 0.2,
    max_top_bigram_frac: float = 0.06,
    max_dup_line_frac: float = 0.3,
):
    """Composite C4/Gopher-style document quality gate: compute the
    quality and repetition metrics in ONE map pass and keep only docs
    inside all thresholds (length band, alphabetic/digit character
    ratios, top-bigram repetition, duplicate-line fraction — the
    standard web-text curation rules of Raffel et al. 2020 / Rae et
    al. 2021).  Returns the surviving rows with their metric columns
    attached.  Embarrassingly parallel — a pure batch map with zero
    shuffles; thresholds are plain Python floats captured once in the
    task closure."""
    import pyarrow.compute as pc

    def gate(batch: pa.Table) -> pa.Table:
        b = add_repetition_metrics(add_quality_metrics(batch, text_col), text_col)
        mask = pc.and_kleene(
            pc.and_kleene(
                pc.greater_equal(b["n_tokens"], min_tokens),
                pc.less_equal(b["n_tokens"], max_tokens),
            ),
            pc.and_kleene(
                pc.and_kleene(
                    pc.greater_equal(b["alpha_ratio"], min_alpha_ratio),
                    pc.less_equal(b["digit_ratio"], max_digit_ratio),
                ),
                pc.and_kleene(
                    pc.less_equal(b["top_bigram_frac"], max_top_bigram_frac),
                    pc.less_equal(b["dup_line_frac"], max_dup_line_frac),
                ),
            ),
        )
        return b.filter(mask)

    return docs.map_batches(gate, batch_format="pyarrow")


def tfidf_topk(
    docs,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 6,
    num_buckets: int = 32,
):
    """Per-document top-k TF-IDF terms with the IDF estimated from the
    corpus itself in the same pipeline — the classic
    keyword-extraction / feature-vector step of a training-data
    pipeline.  weight = tf · ln(N/df); returns (id, tok, tfidf) rows,
    k per doc, ties broken (tfidf desc, tok asc) on the ROUNDED weight
    so an oracle rounding identically agrees exactly.

    Scale shape: one explode pass producing per-doc term counts (the
    tf combiner runs inside each batch), one bucketed df count over
    distinct (doc, tok) pairs, one co-partitioned join back (no
    broadcast at any vocab size — the join IS the scale path), and a
    per-group top-k whose shuffle carries ≤ k·docs rows.  N comes from
    ``docs.count()`` (Parquet metadata, no scan)."""
    import pandas as pd

    from ..functions.text import WORD_RE
    from .relational import bucket_hash_join, bucketed_agg, grouped_topk

    n_docs = docs.count()

    def explode_tf(batch: pa.Table) -> pa.Table:
        ids, toks = [], []
        for i, t in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            ts = WORD_RE.findall(t.lower())
            ids.extend([i] * len(ts))
            toks.extend(ts)
        df = (
            pd.DataFrame({id_col: ids, "tok": toks})
            .groupby([id_col, "tok"], as_index=False)
            .size()
            .rename(columns={"size": "tf"})
        )
        return pa.Table.from_pydict(
            {
                id_col: pa.array(df[id_col].to_numpy(), pa.int64()),
                "tok": pa.array(df["tok"], pa.string()),
                "tf": pa.array(df["tf"].to_numpy().astype("int64")),
            }
        )

    tf = docs.map_batches(explode_tf, batch_format="pyarrow")
    df_counts = bucketed_agg(
        tf.map_batches(
            lambda t: pa.table({"tok": t["tok"].combine_chunks()}),
            batch_format="pyarrow",
        ),
        ["tok"],
        out_col="df",
        num_buckets=num_buckets,
    )

    joined = bucket_hash_join(tf, df_counts, ["tok"], num_buckets=num_buckets)

    def weigh(df: pd.DataFrame) -> pd.DataFrame:
        from ..functions.numeric import round_half_away

        w = df["tf"].to_numpy(dtype="float64") * np.log(
            float(n_docs) / df["df"].to_numpy(dtype="float64")
        )
        out = df[[id_col, "tok"]].copy()
        out["tfidf"] = round_half_away(w, round_to)
        return out

    return grouped_topk(
        joined.map_batches(weigh, batch_format="pandas"),
        [id_col],
        "tfidf",
        k,
        descending=True,
        tie_cols=["tok"],
        num_buckets=num_buckets,
    )


def stopword_scrub(
    docs,
    stopwords,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Token-level stopword removal — the standard function-word scrub
    before n-gram dedup / fingerprinting in web-text curation.  Splits
    on single spaces (exact parity with SQL ``string_split(text, ' ')``
    — no regex, no collapsing), drops tokens in ``stopwords``, rejoins
    with single spaces.  Emits (id, clean_text, kept_tokens,
    removed_tokens).

    Embarrassingly parallel: a pure batch map, zero shuffles.  The hot
    path is pandas explode/isin/groupby-join — one vectorized pass per
    batch, no per-row Python loop; the stopword set is a frozenset
    captured once in the task closure (tiny, ships with the task)."""
    import pandas as pd

    stop = frozenset(stopwords)

    def scrub(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[text_col].str.split(" ").explode()
        kept = toks[~toks.isin(stop)]
        clean = kept.groupby(level=0).agg(" ".join)
        n_kept = kept.groupby(level=0).size()
        n_all = toks.groupby(level=0).size()
        out = pd.DataFrame({id_col: df[id_col].to_numpy()}, index=df.index)
        out["clean_text"] = clean.reindex(df.index).fillna("")
        out["kept_tokens"] = (
            n_kept.reindex(df.index).fillna(0).astype("int64").to_numpy()
        )
        # reindex BOTH series to df.index before the subtraction: label
        # alignment alone returns union-SORTED order, which to_numpy()
        # would misalign against out's rows whenever the incoming batch
        # index is a permutation (e.g. after a dedup stage)
        out["removed_tokens"] = (
            (n_all.reindex(df.index).fillna(0) - n_kept.reindex(df.index).fillna(0))
            .astype("int64")
            .to_numpy()
        )
        return out.reset_index(drop=True)

    return docs.map_batches(scrub, batch_format="pandas")


_NORM_DROP = None  # compiled lazily per process


def add_normalized(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Canonical text normalization for dedup/tokenization pipelines:
    lowercase, strip every char outside [a-z0-9 ], collapse runs of
    spaces, trim.  The lowercase pass is an Arrow kernel; the two
    substitutions are compiled-regex C loops (module-level compile,
    once per worker process)."""
    global _NORM_DROP
    if _NORM_DROP is None:
        import re

        _NORM_DROP = (re.compile(r"[^a-z0-9 ]"), re.compile(r" +"))
    drop, squeeze = _NORM_DROP
    import pyarrow.compute as pc

    lowered = pc.utf8_lower(batch[text_col])
    out = [
        squeeze.sub(" ", drop.sub("", t)).strip() for t in lowered.to_pylist()
    ]
    return batch.append_column("norm_text", pa.array(out, type=pa.string()))
