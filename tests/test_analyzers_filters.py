"""Analyzer/detector/filter/sort/checkpoint tests."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from avc_parser_spark.analyzers import detector_flags, run_analyzers
from avc_parser_spark.datagen import build_pages_df
from avc_parser_spark.filters import (
    filter_path,
    filter_process,
    filter_since_until,
    parse_time_spec,
)
from avc_parser_spark.parse.udf import parse_pages
from avc_parser_spark.pipeline import denial_groups
from avc_parser_spark.sorts import sort_groups


@pytest.fixture(scope="module")
def groups(spark):
    events = parse_pages(build_pages_df(spark, 1500))
    return denial_groups(events).cache()


def test_detector_flags(spark, groups):
    flagged = detector_flags(groups)
    rows = flagged.select(
        "permissions", "flag_dontaudit", "flag_permissive",
        "flag_container_paths", "flag_custom_paths", "paths",
    ).collect()
    assert any(r["flag_dontaudit"] for r in rows)  # noatsecure etc. planted
    assert any(r["flag_permissive"] for r in rows)
    assert any(r["flag_container_paths"] for r in rows)  # /var/lib/containers
    assert any(r["flag_custom_paths"] for r in rows)  # /opt/app
    for r in rows:  # flag implies evidence
        if r["flag_dontaudit"]:
            assert any(
                p in ("noatsecure", "rlimitinh", "siginh")
                for perm in r["permissions"]
                for p in perm.split()
            ) or any(p in ("noatsecure", "rlimitinh", "siginh") for p in r["permissions"])


def test_run_analyzers_produces_findings(spark, groups):
    findings = run_analyzers(groups).collect()
    titles = [f["title"] for f in findings]
    # datagen plants unlabeled_t targets and setfiles relabeling denials
    assert any("unlabeled_t" in t for t in titles)
    for f in findings:
        assert f["severity"] in ("CRITICAL", "WARNING", "INFO")
        # richness: every finding carries hints, evidence and (except AN6,
        # which aggregates across reload windows) the affected sig ids
        assert len(f["hints"]) > 0
        assert len(f["evidence"]) > 0
        if f["category"] != "recurrence":
            assert f["affected_groups"] == 0 or len(f["affected_sigs"]) > 0
            assert len(f["affected_sigs"]) <= 128


def test_filter_process(spark, groups):
    out = filter_process(groups, "httpd,mysqld").select("comms").collect()
    assert len(out) > 0
    for r in out:
        joined = ",".join(c.lower() for c in r["comms"])
        assert "httpd" in joined or "mysqld" in joined
    assert filter_process(groups, "nosuchprocess").count() == 0


def test_filter_path_glob(spark, groups):
    out = filter_path(groups, "/var/www/*").select("paths").collect()
    assert len(out) > 0
    for r in out:
        assert any(p.startswith("/var/www/") for p in r["paths"])


def test_filter_path_glob_anchored(spark, groups):
    # fnmatch fullmatches: a non-prefix glob must not match mid-string even
    # though Spark rlike has find() semantics ('var/*' vs '/var/www/x')
    assert filter_path(groups, "var/*").count() == 0
    assert filter_path(groups, "*www*").count() > 0


def test_time_spec_parsing():
    now = datetime(2025, 9, 4, 12, 0, 0)
    assert parse_time_spec("now", now) == now
    assert parse_time_spec("today", now) == datetime(2025, 9, 4)
    assert parse_time_spec("yesterday", now) == datetime(2025, 9, 3)
    assert parse_time_spec("2 hours ago", now) == datetime(2025, 9, 4, 10)
    assert parse_time_spec("2025-09-04 11:30", now) == datetime(2025, 9, 4, 11, 30)
    with pytest.raises(ValueError):
        parse_time_spec("gibberish", now)


def test_filter_since_until(spark, groups):
    lo = groups.agg(F.min("last_seen")).head()[0]
    hi = groups.agg(F.max("last_seen")).head()[0]
    mid = lo + (hi - lo) / 2
    kept = filter_since_until(groups, since=mid.strftime("%Y-%m-%d %H:%M:%S")).count()
    assert 0 < kept < groups.count()


def test_sort_orders(spark, groups):
    recent = sort_groups(groups, "recent").select("last_seen").collect()
    assert [r["last_seen"] for r in recent] == sorted(
        (r["last_seen"] for r in recent), reverse=True
    )
    by_count = sort_groups(groups, "count").select("count").collect()
    assert [r["count"] for r in by_count] == sorted(
        (r["count"] for r in by_count), reverse=True
    )
    with pytest.raises(ValueError):
        sort_groups(groups, "bogus")


def test_checkpoint_resume(spark, tmp_path):
    from avc_parser_spark.checkpoint import read_events, run_with_checkpoints
    from avc_parser_spark.datagen.pages import write_pages_warehouse

    pages_path = str(tmp_path / "pages")
    out_path = str(tmp_path / "out")
    write_pages_warehouse(spark, pages_path, 400)

    r1 = run_with_checkpoints(spark, pages_path, out_path)
    assert r1["processed"] and not r1["skipped"]
    total1 = read_events(spark, out_path).count()

    # resume: nothing reprocessed, identical output
    r2 = run_with_checkpoints(spark, pages_path, out_path)
    assert not r2["processed"]
    assert sorted(r2["skipped"]) == sorted(r1["processed"])
    assert read_events(spark, out_path).count() == total1

    # lineage metrics present
    for entry in r1["manifest"].values():
        assert entry["input_rows"] > 0
        assert entry["output_rows"] >= entry["routed_rows"].get("parse_ok", 0)
        assert "input_fingerprint" in entry and "wall_sec" in entry


def test_checkpoint_partial_write_recovery(spark, tmp_path):
    """A crash between the event write and the manifest commit must cause
    that partition to be reprocessed on the next run (manifest rename is
    the commit point)."""
    import os

    from avc_parser_spark.checkpoint import (
        MANIFEST_DIR,
        read_events,
        run_with_checkpoints,
    )
    from avc_parser_spark.datagen.pages import write_pages_warehouse

    pages_path = str(tmp_path / "pages")
    out_path = str(tmp_path / "out")
    write_pages_warehouse(spark, pages_path, 300)

    r1 = run_with_checkpoints(spark, pages_path, out_path)
    part = r1["processed"][0]
    total = read_events(spark, out_path).count()

    # simulate the crash: output exists but the manifest entry is gone
    os.remove(os.path.join(out_path, MANIFEST_DIR, f"{part}.json"))
    r2 = run_with_checkpoints(spark, pages_path, out_path)
    assert part in r2["processed"]  # reprocessed, not skipped
    assert read_events(spark, out_path).count() == total  # idempotent

    # and a changed input fingerprint also forces reprocessing
    write_pages_warehouse(spark, pages_path, 330, overwrite=True)
    r3 = run_with_checkpoints(spark, pages_path, out_path)
    assert part in r3["processed"]


def test_checkpoint_detects_in_place_rewrite(spark, tmp_path):
    """An input file rewritten IN PLACE with identical name+size must still
    invalidate the partition fingerprint (mtime_ns is part of it)."""
    import glob
    import os

    from avc_parser_spark.checkpoint import run_with_checkpoints
    from avc_parser_spark.datagen.pages import write_pages_warehouse

    pages_path = str(tmp_path / "pages")
    out_path = str(tmp_path / "out")
    write_pages_warehouse(spark, pages_path, 200)
    r1 = run_with_checkpoints(spark, pages_path, out_path)
    part = r1["processed"][0]

    f = glob.glob(os.path.join(pages_path, f"warc_date={part}", "*.parquet"))[0]
    st = os.stat(f)
    os.utime(f, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000_000))

    r2 = run_with_checkpoints(spark, pages_path, out_path)
    assert part in r2["processed"]  # reprocessed despite same name+size
