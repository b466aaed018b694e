"""MLS parse/dominance/relationship tests vs the reference implementation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from avc_parser_spark.enrich.mls import (
    dominates,
    level_categories,
    level_sensitivity,
    mls_high_str,
    mls_low_str,
    mls_relationship_expr,
)
from tests.reference_loader import load_reference

MLS_CASES = [
    "s0",
    "s15",
    "s0:c0.c1023",
    "s0:c3,c5,c10.c20",
    "s0-s0:c0.c1023",
    "s2:c1,c2-s15:c0.c1023",
    "s0:c1",
]


@pytest.fixture(scope="module")
def parsed(spark):
    df = spark.createDataFrame([(m,) for m in MLS_CASES], "mls string")
    low = mls_low_str(F.col("mls"))
    high = mls_high_str(F.col("mls"))
    return {
        r["mls"]: r
        for r in df.select(
            "mls",
            level_sensitivity(low).alias("lo_sens"),
            level_categories(low).alias("lo_cats"),
            level_sensitivity(high).alias("hi_sens"),
            level_categories(high).alias("hi_cats"),
        ).collect()
    }


def test_level_parse_matches_reference(parsed):
    import sys

    ref = load_reference()
    if ref is None:
        pytest.skip("reference unavailable")
    mls_mod = sys.modules.get("avc_selinux.mls")
    if mls_mod is None:
        from avc_selinux import mls as mls_mod  # type: ignore

    for m in MLS_CASES:
        rng = mls_mod.parse_mls_string(m)
        r = parsed[m]
        assert r["lo_sens"] == rng.low.sensitivity_num, m
        assert sorted(r["lo_cats"]) == sorted(rng.low.categories), m
        assert r["hi_sens"] == rng.high.sensitivity_num, m
        assert sorted(r["hi_cats"]) == sorted(rng.high.categories), m


def test_category_range_expansion(parsed):
    assert parsed["s0:c3,c5,c10.c20"]["lo_cats"] == [3, 5] + list(range(10, 21))
    assert len(parsed["s0:c0.c1023"]["lo_cats"]) == 1024
    assert parsed["s0"]["lo_cats"] == []


def test_dominance(spark):
    rows = [
        ("s1", "s0", True),   # higher sens, no cats
        ("s0", "s1", False),
        ("s0:c1,c2", "s0:c1", True),   # superset
        ("s0:c1", "s0:c1,c2", False),  # subset does not dominate
        ("s0:c1", "s0:c2", False),     # disjoint
    ]
    df = spark.createDataFrame(rows, "a string, b string, expected boolean")
    got = df.select(
        "expected",
        dominates(
            level_sensitivity(F.col("a")), level_categories(F.col("a")),
            level_sensitivity(F.col("b")), level_categories(F.col("b")),
        ).alias("got"),
    ).collect()
    for r in got:
        assert r["got"] == r["expected"]


def test_relationship_classification(spark):
    rows = [
        ("s0", "s15", "no_read_up"),
        ("s15", "s0", "no_write_down"),
        ("s0:c1", "s0:c1,c2", "mcs_missing_categories"),
        ("s0:c1,c2", "s0:c1", "mcs_source_superset"),
        ("s0:c1", "s0:c2", "mcs_disjoint"),
        ("s0", "s0", None),
        # range: effective level = low side (s0) vs s15 target → no_read_up
        ("s0-s15:c0.c1023", "s15", "no_read_up"),
        (None, "s0", None),
    ]
    df = spark.createDataFrame(rows, "s string, t string, expected string")
    got = df.select(
        "expected", mls_relationship_expr(F.col("s"), F.col("t")).alias("got")
    ).collect()
    for r in got:
        assert r["got"] == r["expected"], (r["expected"], r["got"])


def test_relationship_matches_reference_on_corpus(spark):
    import sys

    ref = load_reference()
    if ref is None:
        pytest.skip("reference unavailable")
    mls_mod = sys.modules["avc_selinux.mls"]

    cases = [
        (s, t)
        for s in MLS_CASES
        for t in MLS_CASES
    ]
    df = spark.createDataFrame(cases, "s string, t string")
    got = df.select(
        "s", "t", mls_relationship_expr(F.col("s"), F.col("t")).alias("case_code")
    ).collect()
    for r in got:
        sr = mls_mod.parse_mls_string(r["s"])
        tr = mls_mod.parse_mls_string(r["t"])
        expected_text = mls_mod.analyze_mls_relationship(sr, tr)
        if expected_text is None:
            assert r["case_code"] is None, (r["s"], r["t"], r["case_code"])
        else:
            # map our code to the reference's phrasing markers
            markers = {
                "no_read_up": "No Read Up",
                "no_write_down": "No Write Down",
                "mcs_missing_categories": "not in source",
                "mcs_source_superset": "beyond what the target has",
                "mcs_disjoint": "disjoint category sets",
            }
            assert r["case_code"] is not None, (r["s"], r["t"], expected_text)
            assert markers[r["case_code"]] in expected_text, (
                r["s"], r["t"], r["case_code"], expected_text,
            )
