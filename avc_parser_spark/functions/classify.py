"""Trained model-based quality filter — the LLaMA/GPT-3-style "quality
classifier" stage of a web-corpus pipeline (a small linear model scores
every page; low scorers are dropped), re-expressed Spark-first.

Why a from-scratch logistic regression instead of MLlib: the training loop
here is the same bounded-aggregation shape the repo already uses for
k-means (similarity.train_centroids) and BPE (text.train_bpe) — each
iteration is ONE narrow aggregate pass whose result is k+1 doubles on the
driver, so the 100 TB story is explicit and auditable: no per-row Python,
no shuffle, nothing driver-side but the weight vector. Scoring is then a
pure projection.

Cross-engine exactness: every feature is an INTEGER count (tokens, chars,
stopwords, punctuation, digits, distinct tokens) whose Spark and DuckDB
expressions are generated from one shared table, and trained weights are
quantized to micro-longs — so the deployed decision `logit_micro =
Σ w_micro[i] * x[i]` is an int64 dot product, bit-exact in any engine
(same pattern as the BM25 micro scores).

Reference analog: parse_avc.py's detector/analyzer stages attach derived
quality verdicts per record; this is the trainable counterpart for
web-text curation.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from avc_parser_spark.functions.text import STOPWORDS

# ---------------------------------------------------------------------------
# Shared feature table: name -> (Spark Column factory, DuckDB SQL template).
# All features are INTEGER counts over the raw text so the quantized scorer
# is bit-exact cross-engine. The SQL template takes the text column name.
# ---------------------------------------------------------------------------

_SW_LIST_SQL = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"


def _toks(text: Column) -> Column:
    trimmed = F.trim(F.coalesce(text, F.lit("")))
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def _f_bias(text: Column) -> Column:
    return F.lit(1).cast("long")


def _f_tokens(text: Column) -> Column:
    return F.size(_toks(text)).cast("long")


def _f_chars(text: Column) -> Column:
    return F.length(F.coalesce(text, F.lit(""))).cast("long")


def _f_stopwords(text: Column) -> Column:
    lo = _toks(F.lower(text))
    return F.size(F.filter(lo, lambda t: t.isin(*STOPWORDS))).cast("long")


def _f_punct(text: Column) -> Column:
    t = F.coalesce(text, F.lit(""))
    return (
        F.length(t) - F.length(F.regexp_replace(t, r"[\p{Punct}]", ""))
    ).cast("long")


def _f_digits(text: Column) -> Column:
    t = F.coalesce(text, F.lit(""))
    return (F.length(t) - F.length(F.regexp_replace(t, r"[0-9]", ""))).cast(
        "long"
    )


def _f_distinct_tokens(text: Column) -> Column:
    return F.size(F.array_distinct(_toks(text))).cast("long")


_TOKS_SQL = (
    "(case when trim(coalesce({t}, '')) = '' then []::varchar[] "
    "else regexp_split_to_array(trim({t}), '\\s+') end)"
)

QUALITY_FEATURES: list[tuple[str, object, str]] = [
    ("bias", _f_bias, "1::bigint"),
    ("n_tokens", _f_tokens, f"len({_TOKS_SQL})::bigint"),
    ("n_chars", _f_chars, "length(coalesce({t}, ''))::bigint"),
    (
        "n_stopwords",
        _f_stopwords,
        "len(list_filter("
        + _TOKS_SQL.replace("{t}", "lower({t})")
        + f", x -> list_contains({_SW_LIST_SQL}, x)))::bigint",
    ),
    (
        "n_punct",
        _f_punct,
        "(length(coalesce({t}, '')) - length(regexp_replace("
        "coalesce({t}, ''), '[[:punct:]]', '', 'g')))::bigint",
    ),
    (
        "n_digits",
        _f_digits,
        "(length(coalesce({t}, '')) - length(regexp_replace("
        "coalesce({t}, ''), '[0-9]', '', 'g')))::bigint",
    ),
    (
        "n_distinct_tokens",
        _f_distinct_tokens,
        f"len(list_distinct({_TOKS_SQL}))::bigint",
    ),
]

FEATURE_NAMES = [n for n, _, _ in QUALITY_FEATURES]


def quality_feature_cols(text: Column) -> list[Column]:
    """The integer feature vector as named Columns (order = FEATURE_NAMES)."""
    return [fn(text).alias(name) for name, fn, _ in QUALITY_FEATURES]


def quality_feature_sql(text_col: str) -> list[str]:
    """DuckDB twins of quality_feature_cols, same order."""
    return [
        f"({tpl.replace('{t}', text_col)}) AS {name}"
        for name, _, tpl in QUALITY_FEATURES
    ]


# ---------------------------------------------------------------------------
# Training: full-batch gradient descent, one narrow aggregate per iteration.
# ---------------------------------------------------------------------------


def train_quality_classifier(
    docs: DataFrame,
    label_col: str,
    text_col: str = "text",
    iters: int = 100,
    lr: float = 2.0,
    l2: float = 0.0,
) -> dict:
    """Train a logistic-regression quality classifier on labeled docs
    (label 1 = keep, 0 = drop). Each GD iteration is ONE aggregate pass
    over the persisted integer-feature frame: k+1 partial sums (map-side
    combine) → k+1 doubles on the driver. Features are max-scaled for
    conditioning; the returned weights are folded back to RAW feature
    units so deployment needs no scaling state.

    At 100 TB you train on a labeled SAMPLE (labels are the scarce thing,
    not rows); the loop itself never materializes anything bigger than the
    weight vector, so it also runs on the full corpus if you have labels.

    Returns {"weights": [float...], "features": FEATURE_NAMES,
             "loss": [per-iter mean logloss]}.
    """
    k = len(QUALITY_FEATURES)
    X = docs.select(
        F.col(label_col).cast("double").alias("_y"),
        *[
            c.cast("double").alias(f"_x{i}")
            for i, c in enumerate(quality_feature_cols(F.col(text_col)))
        ],
    ).persist()
    try:
        row = X.agg(
            F.count(F.lit(1)).alias("n"),
            *[F.max(F.abs(F.col(f"_x{i}"))).alias(f"m{i}") for i in range(k)],
        ).collect()[0]
        n = float(row["n"])
        if n == 0:
            raise ValueError("no training rows")
        scale = [max(1.0, float(row[f"m{i}"])) for i in range(k)]

        w = [0.0] * k
        losses: list[float] = []
        for _ in range(iters):
            z = None
            for i in range(k):
                term = F.col(f"_x{i}") * F.lit(w[i] / scale[i])
                z = term if z is None else z + term
            # numerically-stable logistic pieces: p = sigmoid(z),
            # logloss = softplus(z) - y*z  (== -y ln p - (1-y) ln(1-p))
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
            softplus = F.when(
                z > 30, z
            ).otherwise(F.log(F.lit(1.0) + F.exp(F.least(z, F.lit(30.0)))))
            err = p - F.col("_y")
            agg = X.agg(
                F.sum(softplus - F.col("_y") * z).alias("loss"),
                *[
                    F.sum(err * F.col(f"_x{i}") / F.lit(scale[i])).alias(
                        f"g{i}"
                    )
                    for i in range(k)
                ],
            ).collect()[0]
            losses.append(float(agg["loss"]) / n)
            for i in range(k):
                g = float(agg[f"g{i}"]) / n + l2 * w[i]
                w[i] -= lr * g
        return {
            "weights": [w[i] / scale[i] for i in range(k)],
            "features": list(FEATURE_NAMES),
            "loss": losses,
        }
    finally:
        X.unpersist()


# ---------------------------------------------------------------------------
# Deployment: integer micro-logit scoring (bit-exact cross-engine).
# ---------------------------------------------------------------------------


def quantize_classifier(model: dict, quantum: float = 1e-6) -> list[int]:
    """Weights → micro-longs. The quantized decision boundary differs from
    the float one by at most quantum·Σ|x| — negligible against trained
    margins, and in exchange the deployed score is an int64 dot product
    any engine reproduces exactly."""
    return [int(round(w / quantum)) for w in model["weights"]]


def classifier_logit_micro(text: Column, w_micro: list[int]) -> Column:
    """Σ w_micro[i] * feature_i as ONE native integer expression — a pure
    projection (whole-stage codegen, no shuffle, no Python)."""
    out = None
    for (name, fn, _), wm in zip(QUALITY_FEATURES, w_micro):
        term = fn(text) * F.lit(int(wm))
        out = term if out is None else out + term
    return out


def classifier_logit_sql(text_col: str, w_micro: list[int]) -> str:
    """DuckDB twin of classifier_logit_micro (same integer dot product)."""
    terms = [
        f"({tpl.replace('{t}', text_col)}) * ({int(wm)})::bigint"
        for (_, _, tpl), wm in zip(QUALITY_FEATURES, w_micro)
    ]
    return "(" + " + ".join(terms) + ")"


def classify_docs(
    docs: DataFrame,
    w_micro: list[int],
    text_col: str = "text",
    threshold_micro: int = 0,
) -> DataFrame:
    """Attach `logit_micro` (int64) and `clf_keep` (logit > threshold).
    threshold_micro=0 is the standard p>0.5 boundary; raise it to trade
    recall for precision exactly like the fasttext-classifier cut used in
    LLaMA-style pipelines."""
    logit = classifier_logit_micro(F.col(text_col), w_micro)
    return docs.withColumn("logit_micro", logit).withColumn(
        "clf_keep", F.col("logit_micro") > F.lit(int(threshold_micro))
    )
