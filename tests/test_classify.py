"""Trained quality classifier: training-loop correctness (vs a pure-numpy
reference), planted-separable accuracy, and bit-exact cross-engine scoring
of the quantized integer logit."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from avc_parser_spark.functions.classify import (
    FEATURE_NAMES,
    classifier_logit_micro,
    classifier_logit_sql,
    classify_docs,
    quality_feature_cols,
    quality_feature_sql,
    quantize_classifier,
    train_quality_classifier,
)


def _planted_corpus():
    """Separable keep/drop corpus: fluent stopword-bearing sentences vs
    punctuation/digit-heavy low-diversity junk."""
    good = [
        (i, 1, f"the quick brown fox number {i} jumped over the lazy dog "
               "and it is a fine day in the forest to be walking")
        for i in range(40)
    ]
    bad = [
        (100 + i, 0, "$$$ !!! 111 222 %s spam spam spam spam 333 !!! ###" % i)
        for i in range(40)
    ]
    return good + bad


def test_feature_sql_twins_adversarial(spark):
    """Every feature column must equal its generated DuckDB twin over
    adversarial texts: ASCII punct battery, digits, unicode punctuation
    (excluded in BOTH engines), CJK, whitespace runs, empty, null."""
    cases = [
        "plain words here",
        "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~",
        "digits 0123456789 mixed a1b2c3",
        "unicode punct — 。 … « » stays non-punct",
        "  \t\n  spaced   out\ttokens\nhere  ",
        "THE The the tHe",
        "dup dup dup dup unique",
        "",
        None,
    ]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i: int, text: string"
    )
    got = [
        tuple(r)
        for r in df.select("i", *quality_feature_cols(F.col("text")))
        .orderBy("i")
        .collect()
    ]
    con = duckdb.connect()
    con.register(
        "t",
        pd.DataFrame(
            {"i": range(len(cases)), "text": pd.array(cases, dtype="string")}
        ),
    )
    want = [
        tuple(r)
        for r in con.execute(
            "select i, "
            + ", ".join(quality_feature_sql("text"))
            + " from t order by i"
        ).fetchall()
    ]
    assert got == want


def test_train_separates_planted_corpus(spark):
    docs = spark.createDataFrame(
        _planted_corpus(), "doc_id: long, label: int, text: string"
    )
    model = train_quality_classifier(docs, "label", iters=60, lr=2.0)
    assert model["features"] == FEATURE_NAMES
    # loss must be decreasing overall (allow tiny local wiggle at the end)
    assert model["loss"][-1] < model["loss"][0] / 2
    w_micro = quantize_classifier(model)
    scored = classify_docs(docs, w_micro)
    wrong = scored.filter(
        (F.col("label") == 1) != F.col("clf_keep")
    ).count()
    assert wrong == 0


def test_train_matches_numpy_reference(spark):
    """The distributed GD loop (one aggregate pass per iteration) must
    reproduce a pure-numpy full-batch GD with the same scaling, lr and
    iteration count — same weights to float tolerance, same decisions."""
    rows = _planted_corpus()
    docs = spark.createDataFrame(rows, "doc_id: long, label: int, text: string")
    iters, lr = 25, 1.5
    model = train_quality_classifier(docs, "label", iters=iters, lr=lr)

    feats = (
        docs.select(
            F.col("label").cast("double").alias("y"),
            *[c.cast("double") for c in quality_feature_cols(F.col("text"))],
        )
        .toPandas()
        .to_numpy()
    )
    y, X = feats[:, 0], feats[:, 1:]
    scale = np.maximum(1.0, np.abs(X).max(axis=0))
    Xs = X / scale
    w = np.zeros(X.shape[1])
    n = len(y)
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(Xs @ w)))
        w -= lr * (Xs.T @ (p - y)) / n
    ref = w / scale
    got = np.array(model["weights"])
    assert np.allclose(got, ref, rtol=1e-6, atol=1e-9), (got, ref)


def test_quantized_logit_duckdb_exact(spark):
    """Deployed scoring is an int64 dot product: Spark and DuckDB must agree
    EXACTLY (not approximately) on every doc of the sf0.001 corpus for an
    arbitrary micro-weight vector, including negative weights."""
    w_micro = [250000, -1200, 35, 90000, -45000, -7000, 2400]
    assert len(w_micro) == len(FEATURE_NAMES)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = dict(
        (r["doc_id"], r["lm"])
        for r in docs.select(
            "doc_id",
            classifier_logit_micro(F.col("text"), w_micro).alias("lm"),
        ).collect()
    )
    con = duckdb.connect()
    want = dict(
        con.execute(
            "select doc_id, "
            + classifier_logit_sql("text", w_micro)
            + " from read_parquet('/root/testdata/sf0.001/documents.parquet')"
        ).fetchall()
    )
    assert got == want


def test_classify_docs_threshold_and_edges(spark):
    docs = spark.createDataFrame(
        [(0, "the fine day"), (1, ""), (2, None)], "doc_id: long, text: string"
    )
    w = [0] * len(FEATURE_NAMES)
    w[0] = 5  # bias-only model: logit_micro == 5 for every doc
    out = {r["doc_id"]: (r["logit_micro"], r["clf_keep"])
           for r in classify_docs(docs, w, threshold_micro=4).collect()}
    assert out == {0: (5, True), 1: (5, True), 2: (5, True)}
    out2 = {r["doc_id"]: r["clf_keep"]
            for r in classify_docs(docs, w, threshold_micro=5).collect()}
    assert out2 == {0: False, 1: False, 2: False}

    with pytest.raises(ValueError):
        train_quality_classifier(
            spark.createDataFrame([], "label: int, text: string"), "label",
            iters=1,
        )


def test_curate_corpus_classifier_stage(spark):
    """Opt-in model-based filter inside curate_corpus: train on the planted
    separable corpus, deploy the quantized weights, and the junk docs drop
    while fluent docs survive — with the exact kept set re-derivable from
    the integer logit in DuckDB (the property the oracle pattern relies
    on). Default-off: without weights nothing is filtered."""
    from avc_parser_spark.functions.curation import curate_corpus

    train = spark.createDataFrame(
        _planted_corpus(), "doc_id: long, label: int, text: string"
    )
    model = train_quality_classifier(train, "label", iters=60, lr=2.0)
    w_micro = quantize_classifier(model)

    rows = [
        (0, "https://c.com/a",
         "the quick brown fox jumped over the lazy dog and it is a fine "
         "day in the forest to be walking with friends"),
        (1, "https://c.com/b",
         "another fluent sentence of ordinary words that reads well and "
         "is clearly the kind of page a corpus keeps around"),
        (2, "https://c.com/junk1", "$$$ !!! 111 222 spam spam spam spam !!!"),
        (3, "https://c.com/junk2", "### 999 ### 888 ### 777 ### !!! $$$ %%%"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, url string, text string")
    out = curate_corpus(docs, None, clf_w_micro=w_micro)
    kept = sorted(r["doc_id"] for r in out.collect())

    con = duckdb.connect()
    con.register(
        "t", pd.DataFrame([(i, t) for i, _, t in rows],
                          columns=["doc_id", "text"])
    )
    want = sorted(
        r[0]
        for r in con.execute(
            "select doc_id from t where "
            + classifier_logit_sql("text", w_micro)
            + " > 0"
        ).fetchall()
    )
    assert kept == want == [0, 1]
    # default-off
    base = sorted(
        r["doc_id"] for r in curate_corpus(docs, None).collect()
    )
    assert base == [0, 1, 2, 3]
