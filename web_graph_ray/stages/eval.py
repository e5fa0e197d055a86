"""Model-evaluation metrics as distributed Ray Data compositions.

The reference engine (jamesjarvis/web-graph) has no model-evaluation
surface; these back the training-data-pipeline extensions (SURVEY.md
§2.7) — once a classifier (e.g. the distributed logistic regression in
``__ray_entry__.logreg_weekend_events``) scores a corpus, its quality
has to be judged at the same scale the scoring ran at.

- ``roc_auc``: exact ROC AUC via the Mann-Whitney U statistic with
  average-rank tie handling, computed WITHOUT a global sort of the raw
  rows: per-score (pos, neg) counts off one bucketed exchange, an
  exclusive prefix sum of the negative counts in score order
  (:func:`..stages.relational.global_prefix_sum`, TeraSort shape), and
  a scalar fold.  Every stage is O(distinct scores) rows — never the
  raw row count — and the driver holds five numbers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data

__all__ = ["roc_auc"]


def roc_auc(
    ds: "ray.data.Dataset",
    score_col: str,
    label_col: str,
    num_buckets: int = 64,
    stats: bool = False,
) -> pd.DataFrame:
    """Exact ROC AUC of ``score_col`` against binary ``label_col``
    (1 = positive).  Returns a one-row frame ``(auc, n_pos, n_neg)``.

    Mann-Whitney identity with ties:
    ``AUC · n_pos · n_neg = Σ_s pos_s · (negatives strictly below s)
    + ½ Σ_s pos_s · neg_s`` — both sums fold as per-batch partials over
    the per-distinct-score count table, so the exchange volume is
    O(distinct scores) and the only driver state is the five scalars.
    The division is one float op over exact-integer-valued terms; at
    petabyte counts the float partial sums carry ~1e-15 relative error
    (same envelope as the ols2/logreg precedents)."""
    from .relational import bucketed_group_map, global_prefix_sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(score_col, as_index=False).agg(
            pos=(label_col, "sum"), n=(label_col, "size")
        )
        g["pos"] = g["pos"].astype("int64")
        g["neg"] = (g["n"] - g["pos"]).astype("int64")
        return g.drop(columns=["n"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(score_col, as_index=False)[["pos", "neg"]].sum()

    counts = bucketed_group_map(
        ds,
        [score_col],
        final,
        num_buckets=num_buckets,
        batch_partial=partial,
    ).materialize()  # consumed by the prefix sum's two passes + the fold

    with_cum = global_prefix_sum(
        counts, score_col, "neg", out_col="cumneg", num_buckets=num_buckets
    )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        # EXACT integer partials via object dtype (python ints on the
        # driver sum): the U statistic must round identically to an
        # oracle summing in hugeint, and a float64 fold of O(N²)-sized
        # products carries ~1e-6 absolute error — right on the 6 dp
        # grid.  This fold is O(distinct scores), never O(rows).
        if "pos" not in df.columns:  # schema-less empty block
            return pd.DataFrame(
                {"u": [], "t": [], "np": [], "nn": [], "tc": []}
            )
        pos = df["pos"].to_numpy().astype(object)
        neg = df["neg"].to_numpy().astype(object)
        tot = (df["pos"] + df["neg"]).to_numpy(dtype="float64")
        return pd.DataFrame(
            {
                # dtype=object keeps python-int arithmetic through the
                # block format and the driver sum — a bare [int] column
                # infers int64 and would wrap silently past 2^63
                "u": pd.Series(
                    [int(np.sum(pos * df["cumneg"].to_numpy().astype(object)))],
                    dtype="object",
                ),
                "t": pd.Series([int(np.sum(pos * neg))], dtype="object"),
                "np": [int(df["pos"].sum())],
                "nn": [int(df["neg"].sum())],
                # tie cubes fold in float64 — SQL power() is double too
                "tc": [float(np.sum(tot * tot * tot - tot))],
            }
        )

    folded = with_cum.map_batches(fold, batch_format="pandas").to_pandas()
    from ..functions.numeric import round_half_away

    if "u" not in folded.columns:
        # empty input: zero rows of either class — same NaN contract as
        # the single-class branch below
        folded = pd.DataFrame(
            {"u": [0], "t": [0], "np": [0], "nn": [0], "tc": [0.0]}
        )
    s = folded.sum()
    u = float(s.u) + 0.5 * float(s.t)
    if s.np == 0 or s.nn == 0:
        # single-class input: AUC is undefined — NaN, not a crash
        out = {
            "auc": [float("nan")],
            "n_pos": [np.int64(s.np)],
            "n_neg": [np.int64(s.nn)],
        }
        if stats:
            out["u_stat"] = [float("nan")]
            out["z"] = [float("nan")]
        return pd.DataFrame(out)
    out = {
        "auc": round_half_away(
            np.array([u / (float(s.np) * float(s.nn))]), 6
        ),
        "n_pos": [np.int64(s.np)],
        "n_neg": [np.int64(s.nn)],
    }
    if stats:
        nt = s.np + s.nn
        mu = float(s.np) * float(s.nn) / 2.0
        var = (
            float(s.np)
            * float(s.nn)
            / 12.0
            * (float(nt + 1) - float(s.tc) / (float(nt) * float(nt - 1)))
        )
        out["u_stat"] = round_half_away(np.array([u]), 6)
        # One distinct score covering both classes makes the tie-corrected
        # variance 0 (all mass is ties): z is undefined — NaN, mirroring the
        # single-class branch, not an inf/NaN-with-warning division.
        z = (u - mu) / np.sqrt(var) if var > 0.0 else float("nan")
        out["z"] = round_half_away(np.array([z]), 6)
    return pd.DataFrame(out)
