"""Model-based quality filtering — the classifier stage of a web-text
curation pipeline (CCNet's fastText LM filter, Wenzek et al. 2019;
FineWeb-Edu's distilled quality classifier, Penedo et al. 2024). The
reference repo has no counterpart (its pipeline is schema-to-tile);
this is part of the training-data operator family layered on the same
engine, next to the Gopher gates in ``operators/text.py``.

Three pieces:

- ``quality_features``   one map-side projection: five bounded
                         [0, ~2] signals per document (stopword /
                         punctuation / digit / uppercase ratios +
                         scaled mean token length) plus a bias column.
                         Pure JVM column math; every formula is
                         integer-ratio arithmetic so DuckDB reproduces
                         the doubles bit-for-bit (same rule as
                         ``text_quality_score``'s oracle).
- ``lr_train``           full-batch logistic regression by gradient
                         descent. The feature frame is
                         ``localCheckpoint()``-ed once (the
                         lazy-subtree lesson: three dozen iterations
                         must not replay the text scan), then every
                         iteration is ONE job — a map-side-combined
                         aggregate of k+1 gradient sums into a single
                         driver row — with the current weights
                         broadcast as literals. At 100 TB each
                         iteration scans only the narrow checkpointed
                         frame (6 doubles/row); nothing iterative ever
                         shuffles by key.
- ``lr_score``           the deployed filter: logit = w·x as one
                         map-side projection. Left-associated adds and
                         per-term multiplies, features rounded to 4 dp
                         first — IEEE-exact cross-engine, so the
                         scorer is fully oracle-checkable
                         (``quality_classifier_scores`` in
                         sparktiles/queries.py).

The demo label is weak supervision in the FineWeb-Edu shape: distill
an existing boolean gate (the frozen DEFAULT_WEIGHTS distill a
stopword/token-length band rule; any label column works) into a
linear scorer that runs as pure column math at serving time.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# frozen demo weights: lr_train() distilling the band gate
# (stopword_ratio > 0.05 AND tok_len_scaled < 0.56) on
# /root/testdata/sf0.01/documents.parquet, 200 iterations, lr 2.0,
# rounded to 4 dp (accuracy 0.886 / keep rate 0.572 on the training
# corpus; the punct/digit/upper weights are genuinely 0.0 because the
# synthetic corpus has no variance in those signals). The oracle
# query uses these exact literals on both engines. Bias first, then
# FEATURE_COLS order.
DEFAULT_WEIGHTS = [0.755, 4.4772, 0.0, 0.0, 0.0, -1.8182]

FEATURE_COLS = [
    "stopword_ratio", "punct_ratio", "digit_ratio", "upper_ratio",
    "tok_len_scaled",
]

_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on", "for",
              "with"]


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append bias + the five bounded quality signals, each rounded to
    4 dp (rounding BEFORE the dot product is what makes the downstream
    scorer reproducible across engines)."""
    toks = F.split(F.col(text_col), " ")
    stop = F.array(*[F.lit(w) for w in _STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop, x)))
    n_char = F.length(text_col)
    n_tok = F.size(toks)
    n_punct = F.length(F.regexp_replace(F.col(text_col), r"[^\.,;:!?]", ""))
    n_digit = F.length(F.regexp_replace(F.col(text_col), r"[^0-9]", ""))
    n_upper = F.length(F.regexp_replace(F.col(text_col), r"[^A-Z]", ""))
    return (
        df.withColumn("bias", F.lit(1.0))
        .withColumn("stopword_ratio",
                    F.round(n_stop.cast("double") / n_tok, 4))
        .withColumn("punct_ratio",
                    F.round(n_punct.cast("double") / n_char, 4))
        .withColumn("digit_ratio",
                    F.round(n_digit.cast("double") / n_char, 4))
        .withColumn("upper_ratio",
                    F.round(n_upper.cast("double") / n_char, 4))
        .withColumn("tok_len_scaled",
                    F.round(n_char.cast("double") / n_tok / F.lit(10.0), 4))
    )


def _margin(weights: list[float], cols: list[str]):
    m = F.lit(float(weights[0])) * F.col("bias")
    for w, c in zip(weights[1:], cols):
        m = m + F.lit(float(w)) * F.col(c)
    return m


def lr_train(feat: DataFrame, label_col: str,
             feature_cols: list[str] | None = None,
             iters: int = 40, lr: float = 2.0) -> list[float]:
    """Full-batch logistic regression on an already-featurized frame.

    Returns [w_bias, w_f1, ...]. One aggregate job per iteration over
    a localCheckpointed narrow projection; gradient g_j =
    mean((sigmoid(w.x) - y) * x_j). Deterministic given partition
    layout (float sum order); tests compare to a numpy reference at
    1e-6 relative tolerance.
    """
    cols = list(feature_cols or FEATURE_COLS)
    narrow = feat.select(
        F.col(label_col).cast("double").alias("_y"), "bias", *cols)
    # bound + materialize once: ~48 bytes/row however wide the corpus
    narrow = narrow.localCheckpoint(eager=True)
    n = narrow.count()
    w = [0.0] * (len(cols) + 1)
    for _ in range(int(iters)):
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_margin(w, cols)))
        err = p - F.col("_y")
        sums = narrow.agg(
            F.sum(err).alias("g0"),
            *[F.sum(err * F.col(c)).alias(f"g{j + 1}")
              for j, c in enumerate(cols)]).first()
        w = [wj - lr * float(sums[j]) / n for j, wj in enumerate(w)]
    return w


def lr_score(feat: DataFrame, weights: list[float] | None = None,
             feature_cols: list[str] | None = None,
             threshold: float = 0.0) -> DataFrame:
    """Serving-time filter: logit (4 dp) + keep flag. Map-side only."""
    cols = list(feature_cols or FEATURE_COLS)
    w = list(weights or DEFAULT_WEIGHTS)
    logit = F.round(_margin(w, cols), 4)
    return (feat.withColumn("lr_logit", logit)
            .withColumn("lr_keep", F.col("lr_logit") > F.lit(threshold)))


def quality_classifier(df: DataFrame, text_col: str = "text",
                       weights: list[float] | None = None,
                       threshold: float = 0.0) -> DataFrame:
    """features + score in one shot (the deployed pipeline stage).
    The input is spread() first: both stages are per-row map work and
    a one-split local scan would serialize the regex feature pass."""
    from sparktiles.operators.spread import spread

    return lr_score(quality_features(spread(df, min_bytes=1 << 17), text_col), weights,
                    threshold=threshold)


def np_reference_train(X, y, iters: int = 40, lr: float = 2.0):
    """Driver-side numpy twin of lr_train for tests (X includes bias
    as column 0)."""
    import numpy as np

    wv = np.zeros(X.shape[1])
    n = X.shape[0]
    for _ in range(int(iters)):
        p = 1.0 / (1.0 + np.exp(-(X @ wv)))
        g = X.T @ (p - y) / n
        wv = wv - lr * g
    return wv


def sigmoid(x: float) -> float:
    return 1.0 / (1.0 + math.exp(-x))
