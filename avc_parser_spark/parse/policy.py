"""MAC_POLICY_LOAD / MAC_STATUS side-table parse (P17/P18).

Reference: parse_mac_policy_load_events (parse_avc.py:1207-1313) and
parse_mac_status_events (parse_avc.py:1316-1374). These are informational
events (policy reload / enforcing-mode flips), kept as a small side
DataFrame used as epoch boundaries for recurrence analysis (A10/AN6).

Implemented natively: the record volume is tiny relative to denials, and
every field is one regexp_extract — no UDF needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_policy_events(pages: DataFrame) -> DataFrame:
    """pages → one row per MAC_POLICY_LOAD / MAC_STATUS line.

    Columns: url, rtype, event_id, event_ts, auid (normalized: digits,
    'unset', or the N from 'unknown(N)'), ses, enforcing, old_enforcing.
    """
    lines = pages.select(
        "url",
        F.explode(F.split(F.col("text"), "\n")).alias("line"),
    ).filter(F.col("line").rlike(r"type=(MAC_POLICY_LOAD|MAC_STATUS|1403|1404)"))

    tsid = F.regexp_extract("line", r"audit\(([^)]+)\)", 1)
    ts_text = F.regexp_extract(tsid, r"^(.*):\d+$", 1)
    event_ts = F.coalesce(
        F.try_to_timestamp(ts_text, F.lit("MM/dd/yyyy HH:mm:ss.SSS")),
        F.try_to_timestamp(ts_text, F.lit("dd/MM/yy HH:mm:ss.SSS")),
        F.timestamp_seconds(ts_text.cast("double")),
    )

    # auid forms: auid=500 | auid=4294967295 | auid=unset | auid=unknown(500)
    auid = F.coalesce(
        F.nullif(F.regexp_extract("line", r"auid=\w+\((\d+)\)", 1), F.lit("")),
        F.nullif(F.regexp_extract("line", r"auid=(unset)", 1), F.lit("")),
        F.nullif(F.regexp_extract("line", r"auid=(\d+)", 1), F.lit("")),
    )

    return lines.select(
        "url",
        F.regexp_extract("line", r"type=(\w+)", 1).alias("rtype"),
        tsid.alias("event_id"),
        event_ts.alias("event_ts"),
        auid.alias("auid"),
        F.nullif(F.regexp_extract("line", r"ses=(\d+)", 1), F.lit("")).alias("ses"),
        F.nullif(
            F.regexp_extract("line", r"enforcing=(\d+)", 1), F.lit("")
        ).alias("enforcing"),
        F.nullif(
            F.regexp_extract("line", r"old_enforcing=(\d+)", 1), F.lit("")
        ).alias("old_enforcing"),
    )
