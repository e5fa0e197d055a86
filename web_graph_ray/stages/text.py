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
