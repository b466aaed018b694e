"""Spark end-to-end pipeline tests: routing goldens, aggregation equality,
physical-plan assertions (broadcast joins, no html read)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from avc_parser_spark.datagen import build_pages_df
from avc_parser_spark.datagen.payload import route_for
from avc_parser_spark.enrich.join import signature_exprs
from avc_parser_spark.parse.udf import parse_pages
from avc_parser_spark.pipeline import denial_groups, per_lang_hour_rollup, run_pipeline
from tests.reference_loader import load_reference

N_DOCS = 1200


@pytest.fixture(scope="module")
def events(spark):
    return parse_pages(build_pages_df(spark, N_DOCS)).cache()


def test_routed_row_sets_match_ground_truth(spark, events):
    """Per-sink routed-row sets — the north-rule golden."""
    got = {
        r["route"]: set(u["url"] for u in rows)
        for r, rows in []
    }
    rows = events.select("url", "route").distinct().collect()
    got: dict[str, set] = {}
    for r in rows:
        got.setdefault(r["route"], set()).add(r["url"])
    import re

    for route, urls in got.items():
        for url in urls:
            i = int(re.search(r"doc(\d+)$", url).group(1))
            assert route_for(i) == route, f"{url}: expected {route_for(i)}, got {route}"
    total = sum(len(v) for v in got.values())
    assert total == N_DOCS


def test_salted_equals_unsalted_groups(spark, events):
    a = (
        denial_groups(events, salted=True)
        .select("signature", "count", "first_seen", "last_seen", "permissions")
        .orderBy("signature")
        .collect()
    )
    b = (
        denial_groups(events, salted=False)
        .select("signature", "count", "first_seen", "last_seen", "permissions")
        .orderBy("signature")
        .collect()
    )
    assert a == b
    assert len(a) > 0


def test_signature_components_match_reference(spark, events):
    """Smart-signature components equal the reference's categorizers."""
    ref = load_reference()
    if ref is None:
        pytest.skip("reference unavailable")
    sample = (
        signature_exprs(events.filter(F.col("route") == "parse_ok"))
        .select(
            "comm", "sc_type", "tclass", "permission", "path", "dest_port",
            "process_category", "permission_category", "object_group",
            "path_pattern",
        )
        .limit(300)
        .collect()
    )

    class Ctx:  # minimal stand-in for AvcContext (only .type is used)
        def __init__(self, t):
            self.type = t

    for r in sample:
        sc = Ctx(r["sc_type"]) if r["sc_type"] else None
        assert r["process_category"] == ref.get_process_category(r["comm"], sc), r
        assert r["permission_category"] == ref.get_permission_category(
            r["permission"], r["tclass"]
        ), r
        assert r["object_group"] == ref.get_object_group(r["tclass"]), r
        expected_pattern = ref.get_path_pattern(r["path"], r["tclass"])
        assert r["path_pattern"] == expected_pattern, (
            r["path"], r["tclass"], r["path_pattern"], expected_pattern,
        )


def test_lang_hour_rollup_consistency(spark, events):
    roll = per_lang_hour_rollup(events).agg(F.sum("events")).head()[0]
    ok = events.filter(
        (F.col("route") == "parse_ok") & F.col("event_ts").isNotNull()
    ).count()
    assert roll == ok


def test_broadcast_join_in_plan(spark, events):
    out = run_pipeline(build_pages_df(spark, 50))
    plan = out["enriched"]._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # dims must never shuffle-join


def test_html_column_pruned(spark):
    plan = parse_pages(build_pages_df(spark, 10))._jdf.queryExecution().executedPlan().toString()
    # the parse UDF input must not include the heavy html binary column
    import re

    m = re.search(r"Project \[([^\]]*)\]", plan)
    assert m and "html" not in m.group(1)


def test_extracted_text_nonnull_for_parse_ok(spark, events):
    bad = events.filter(
        (F.col("route") == "parse_ok") & F.col("extracted_text").isNull()
    ).count()
    assert bad == 0


def test_error_isolation_never_fails_job(spark, monkeypatch):
    """V4: a kernel crash on one document must quarantine that document,
    not abort the job (parse_avc.py:477-482 contract)."""
    import avc_parser_spark.parse.udf as udf_mod
    from avc_parser_spark.parse import kernels

    real = kernels.parse_pages_pdf

    def explode_on_marker(pdf, **kwargs):
        if pdf["text"].str.contains("BOOM_MARKER").any():
            raise RuntimeError("synthetic kernel crash")
        return real(pdf, **kwargs)

    monkeypatch.setattr(udf_mod, "parse_pages_pdf", explode_on_marker)
    df = spark.createDataFrame(
        [
            ("ok1", None, None, "type=AVC msg=audit(1.0:1): avc: denied { read } for pid=1 comm=x scontext=a:b:c tcontext=d:e:f tclass=file", "en"),
            ("bad", None, None, "BOOM_MARKER", "en"),
            ("ok2", None, None, "type=AVC msg=audit(2.0:2): avc: denied { write } for pid=2 comm=y scontext=a:b:c tcontext=d:e:f tclass=file", "en"),
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    ).coalesce(1)
    rows = {r["url"]: r for r in udf_mod.parse_pages(df, jvm_pregate=False).collect()}
    assert rows["bad"]["route"] == "quarantine"
    assert rows["bad"]["parse_status"].startswith("PARSE_ERROR_")
    assert rows["ok1"]["route"] == "parse_ok"
    assert rows["ok2"]["route"] == "parse_ok"


def test_capped_sets_exact_below_cap(spark, events):
    """SET_CAP bounds group state; below the cap the sets must be exact."""
    from avc_parser_spark.aggregate import SET_CAP

    groups = denial_groups(events)
    ev_ok = signature_exprs(events.filter(F.col("route") == "parse_ok"))
    exact = {
        r["sig_id"]: sorted(p for p in r["perms"] if p is not None)
        for r in ev_ok.groupBy("sig_id")
        .agg(F.collect_set("permission").alias("perms"))
        .collect()
    }
    for r in groups.select("sig_id", "permissions", "count").collect():
        if r["count"] < SET_CAP:
            assert sorted(r["permissions"]) == exact[r["sig_id"]]


def test_monitoring_rollup(spark, events):
    from avc_parser_spark.pipeline import monitoring_rollup

    ev = signature_exprs(events)
    rows = {r["route"]: r for r in monitoring_rollup(ev).collect()}
    assert set(rows) == {"parse_ok", "malformed", "quarantine"}
    ok = rows["parse_ok"]
    exact_docs = ev.filter(F.col("route") == "parse_ok").select("url").distinct().count()
    assert abs(ok["approx_docs"] - exact_docs) / exact_docs < 0.1


def test_hot_signature_salting_splits_state(spark):
    """The reference premise: one signature can be >50% of all events
    (10k raw -> ~20 groups). Salting must spread that hot key across
    NUM_SALTS partial states while keeping the final aggregate exact."""
    from pyspark.sql import functions as F2

    from avc_parser_spark.aggregate import NUM_SALTS, SIG_COLS, aggregate_signatures

    # 20k events, 90% in ONE signature
    base = spark.range(20000).select(
        F2.concat(F2.lit("u"), F2.col("id")).alias("url"),
        F2.lit("en").alias("lang"),
        F2.timestamp_seconds(1700000000 + F2.col("id")).alias("event_ts"),
        F2.concat(F2.lit("e"), F2.col("id")).alias("event_id"),
        F2.when(F2.col("id") % 10 < 9, "hot").otherwise(
            F2.concat(F2.lit("cold"), (F2.col("id") % 37).cast("string"))
        ).alias("signature"),
        F2.lit("read").alias("permission"),
        (F2.col("id") % 1000).cast("string").alias("pid"),
        F2.lit("httpd").alias("comm"),
        F2.lit("/var/www/x").alias("path"),
        F2.lit("file").alias("tclass"),
        F2.lit("0").alias("permissive"),
        F2.lit(None).cast("string").alias("dest_port"),
        F2.lit(None).cast("string").alias("proctitle"),
        F2.lit(None).cast("string").alias("exe"),
        F2.lit(None).cast("string").alias("path_type"),
        F2.lit(None).cast("string").alias("scontext_raw"),
        F2.lit(None).cast("string").alias("tcontext_raw"),
        F2.lit(None).cast("string").alias("sc_type"),
        F2.lit(None).cast("string").alias("tc_type"),
        F2.lit(None).cast("string").alias("denial_type"),
        F2.lit(None).cast("string").alias("syscall"),
        F2.lit(None).cast("string").alias("exit"),
        F2.lit(None).cast("string").alias("dbus_dest"),
        F2.lit(None).cast("string").alias("success"),
        F2.lit(None).cast("string").alias("cwd"),
        F2.lit(None).cast("string").alias("saddr"),
        F2.lit(None).cast("string").alias("saddr_struct"),
        F2.lit(None).cast("string").alias("execve_cmdline"),
    )
    ev = (
        base.withColumn("sig_id", F2.xxhash64("signature"))
        .withColumn("process_category", F2.lit("web"))
        .withColumn("sig_target", F2.lit("t"))
        .withColumn("object_group", F2.lit("filesystem"))
        .withColumn("sig_extra", F2.lit("p"))
        .withColumn("permission_category", F2.lit("file_access"))
    )

    groups = {r["signature"]: r for r in aggregate_signatures(ev).collect()}
    assert groups["hot"]["count"] == 18000
    assert sum(r["count"] for r in groups.values()) == 20000
    # distinct salts actually used for the hot key (stage-1 state spread)
    salts = (
        ev.filter(F2.col("signature") == "hot")
        .select(F2.pmod(F2.xxhash64("url"), F2.lit(NUM_SALTS)).alias("s"))
        .distinct()
        .count()
    )
    assert salts == NUM_SALTS
    # capped sets stay bounded on the hot group
    assert len(groups["hot"]["pids"]) <= 128


def test_arrow_and_pandas_parse_paths_byte_equal(spark):
    """The mapInArrow path (JVM-assembled extracted_text) must be
    byte-identical to the mapInPandas path (kernel-built extracted_text)
    across all 43 columns — this is the equivalence gate for the
    Arrow-boundary optimization."""
    from avc_parser_spark.datagen import build_pages_df
    from avc_parser_spark.parse.udf import parse_pages

    pages = build_pages_df(spark, 800).cache()
    a = sorted(tuple(r) for r in parse_pages(pages, arrow_output=True).collect())
    b = sorted(tuple(r) for r in parse_pages(pages, arrow_output=False).collect())
    assert a == b
    assert len(a) >= 800 * 0.9


def test_parse_pages_narrow_output(spark):
    """The columns= narrowing must project without changing values, always
    carry routing essentials, and reject unknown columns / the pandas path."""
    from avc_parser_spark.parse.udf import parse_pages

    pages = build_pages_df(spark, 400).cache()
    full = parse_pages(pages)
    narrow = parse_pages(pages, columns=["lang", "event_ts", "comm"])
    assert narrow.columns == ["url", "route", "parse_status", "lang", "event_ts", "comm"]
    a = sorted(tuple(r) for r in narrow.collect())
    b = sorted(
        tuple(r)
        for r in full.select(
            "url", "route", "parse_status", "lang", "event_ts", "comm"
        ).collect()
    )
    assert a == b

    et = parse_pages(pages, columns=["extracted_text"])
    assert et.columns == ["url", "route", "parse_status", "extracted_text"]
    ea = sorted(tuple(r) for r in et.collect())
    eb = sorted(
        tuple(r)
        for r in full.select("url", "route", "parse_status", "extracted_text").collect()
    )
    assert ea == eb

    with pytest.raises(ValueError):
        parse_pages(pages, columns=["nope"])
    with pytest.raises(ValueError):
        parse_pages(pages, columns=["lang"], arrow_output=False)
