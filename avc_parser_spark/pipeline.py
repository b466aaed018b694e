"""End-to-end pipeline composition (SURVEY.md §7.0 skeleton).

    pages → [prefilter] → PARSE (pandas UDF) → ENRICH (broadcast joins)
          → ROUTE fan-out → per-sink salted aggregates → findings

Stage shape at scale: scan→parse→enrich→route is ONE narrow stage (no
shuffle); the routed event table is materialized once (checkpoint per input
partition); each downstream aggregate shuffles on its own key over the
much-smaller parse_ok subset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from avc_parser_spark.aggregate import aggregate_signatures
from avc_parser_spark.enrich.join import (
    enrich_events,
    legacy_signature_exprs,
    sesearch_expr,
    signature_exprs,
)
from avc_parser_spark.parse.udf import parse_pages

ROUTES = ["parse_ok", "malformed", "quarantine"]


def parse_and_sign(pages: DataFrame, legacy: bool = False) -> DataFrame:
    """pages → parsed, enriched, signature-tagged event table."""
    events = parse_pages(pages)
    signed = legacy_signature_exprs(events) if legacy else signature_exprs(events)
    return signed


def route_split(events: DataFrame) -> dict[str, DataFrame]:
    """K7-style fan-out: one routing column, one filter per sink.

    At scale the routed frontier is written once (see checkpoint.py) and each
    sink reads its slice with partition pruning on `route`.
    """
    return {r: events.filter(F.col("route") == r) for r in ROUTES}


def denial_groups(events: DataFrame, salted: bool = True) -> DataFrame:
    """parse_ok events → signature groups with sesearch remediation (E12)."""
    if "sig_id" not in events.columns:
        events = signature_exprs(events)
    ok = events.filter(F.col("route") == "parse_ok")
    groups = aggregate_signatures(ok, salted=salted)
    groups = groups.withColumn(
        "sc_type", F.col("representative.sc_type")
    ).withColumn("tc_type", F.col("representative.tc_type")).withColumn(
        "tclass", F.col("representative.tclass")
    )
    return groups.withColumn("sesearch_command", sesearch_expr())


def route_counts(events: DataFrame) -> DataFrame:
    """Per-sink row counts — the routed-row-set golden (north rule)."""
    return events.groupBy("route").agg(F.count(F.lit(1)).alias("rows"))


def per_lang_hour_rollup(events: DataFrame) -> DataFrame:
    """Per-lang/per-hour rollup over parse_ok events (north-star example).

    One shuffle on (lang, hour); partial aggregation is map-side so the hot
    'en' key only ships one partial row per task, not its raw events —
    salting is unnecessary for pure counts.
    """
    return (
        events.filter(F.col("route") == "parse_ok")
        .groupBy(
            F.col("lang"),
            F.date_trunc("hour", F.col("event_ts")).alias("event_hour"),
        )
        .agg(
            F.count(F.lit(1)).alias("events"),
            F.countDistinct("url").alias("docs"),
        )
    )


def monitoring_rollup(events: DataFrame) -> DataFrame:
    """Job-health metrics per route: row counts + approximate distincts
    (approx_count_distinct is monitoring-only — SURVEY §2.9: every
    correctness-gated aggregate stays exact)."""
    return events.groupBy("route").agg(
        F.count(F.lit(1)).alias("rows"),
        F.approx_count_distinct("url").alias("approx_docs"),
        F.approx_count_distinct("sig_id").alias("approx_signatures"),
        F.sum("malformed_lines").alias("malformed_lines"),
    )


def run_pipeline(pages: DataFrame, salted: bool = True) -> dict[str, DataFrame]:
    """Full composition. Returns the principal output frames (lazy)."""
    events = parse_and_sign(pages)
    enriched = enrich_events(events)
    return {
        "events": events,
        "enriched": enriched,
        "routes": route_split(events),
        "groups": denial_groups(events, salted=salted),
        "route_counts": route_counts(events),
        "lang_hour": per_lang_hour_rollup(events),
    }
