"""Sinks (reference §2.1 K1-K7, re-expressed as tables + a JSON report).

- Routed event tables: one partitioned write, per-sink reads are pruned
  scans (K7's fan-out contract).
- JSON report (K4, formatters/json_formatter.py:194-311 shape): the
  machine-readable contract — `unique_denials[].{log, count, first_seen,
  last_seen, permissions, correlations, sesearch_command}`, `summary`,
  `findings`. Report mode is bounded by construction (groups table is
  small); correlations are capped samples, with the full event detail
  staying relational in the routed table (A3 at scale).
- Stats report (K3, formatters/stats_formatter.py): top-N per dimension.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from avc_parser_spark.aggregate import top_n_per_dimension

REPORT_LOG_FIELDS = [
    "denial_type", "permission", "pid", "comm", "exe", "proctitle", "path",
    "path_type", "dev", "ino", "scontext_raw", "tcontext_raw", "tclass",
    "dest_port", "permissive", "syscall", "exit", "event_id", "event_ts",
]


def write_routed_tables(events: DataFrame, path: str) -> None:
    """One write partitioned by route (+ per-sink pruned reads)."""
    events.write.mode("overwrite").partitionBy("route").parquet(path)


def json_report(
    groups: DataFrame,
    findings: DataFrame | None = None,
    max_groups: int = 1000,
) -> dict:
    """Bounded JSON report in the reference's `--format json` shape.

    Driver-side collect is intentional and bounded: the whole point of
    signature dedup is that the group table is tiny (10k events → ~20
    groups); max_groups is a hard cap for pathological corpora.
    """
    rows = (
        groups.orderBy(F.desc("count"), F.asc("signature"))
        .limit(max_groups)
        .collect()
    )
    unique_denials = []
    for r in rows:
        rep = r["representative"].asDict() if r["representative"] else {}
        log = {
            k: (str(v) if v is not None else None)
            for k, v in rep.items()
            if k in REPORT_LOG_FIELDS or k in ("url",)
        }
        unique_denials.append(
            {
                "log": log,
                "count": r["count"],
                "first_seen": r["first_seen"].isoformat() if r["first_seen"] else None,
                "last_seen": r["last_seen"].isoformat() if r["last_seen"] else None,
                "permissions": sorted(p for p in (r["permissions"] or []) if p),
                "correlations": [],  # relational at scale; see routed table
                "sesearch_command": r["sesearch_command"]
                if "sesearch_command" in r.__fields__
                else None,
                "signature": r["signature"],
                "permissive_count": r["permissive_count"],
            }
        )

    # true totals from an aggregate (max_groups caps only the listing)
    totals = groups.agg(
        F.count(F.lit(1)).alias("g"),
        F.coalesce(F.sum("count"), F.lit(0)).alias("e"),
        F.coalesce(F.sum("permissive_count"), F.lit(0)).alias("p"),
    ).head()
    report = {
        "unique_denials": unique_denials,
        "summary": {
            "total_groups": int(totals["g"]),
            "total_events": int(totals["e"]),
            "permissive_events": int(totals["p"]),
            "listed_groups": len(unique_denials),
        },
        "findings": [r.asDict() for r in findings.collect()] if findings is not None else [],
    }
    return report


def write_json_report(groups: DataFrame, findings: DataFrame | None, path: str) -> None:
    with open(path, "w") as fh:
        json.dump(json_report(groups, findings), fh, indent=2, default=str)


def brief_report(groups: DataFrame, max_groups: int = 50) -> list[dict]:
    """K5 — executive WHAT/WHEN/WHO/WHERE/IMPACT brief per group
    (report_formatter.py:329-499 shape, prose rendering out of scope)."""
    rows = (
        groups.orderBy(F.desc("count"), F.asc("signature"))
        .limit(max_groups)
        .collect()
    )
    briefs = []
    for r in rows:
        rep = r["representative"].asDict() if r["representative"] else {}
        briefs.append(
            {
                "what": {
                    "permissions": sorted(p for p in (r["permissions"] or []) if p),
                    "tclass": rep.get("tclass"),
                },
                "when": {
                    "first_seen": str(r["first_seen"]),
                    "last_seen": str(r["last_seen"]),
                },
                "who": {
                    "comm": rep.get("comm"),
                    "exe": rep.get("exe"),
                    "scontext": rep.get("scontext_raw"),
                },
                "where": {
                    "path": rep.get("path"),
                    "dest_port": rep.get("dest_port"),
                    "tcontext": rep.get("tcontext_raw"),
                },
                "impact": {
                    "events": r["count"],
                    "permissive_events": r["permissive_count"],
                    "enforcing_blocked": r["count"] - r["permissive_count"],
                },
            }
        )
    return briefs


def sealert_report(groups: DataFrame, max_groups: int = 50) -> list[dict]:
    """K6 — sealert-style technical reconstruction per group
    (report_formatter.py:15-328 shape): action summary sentence, raw-audit
    message rebuilt from the representative, unique-pid stats."""
    rows = (
        groups.orderBy(F.desc("count"), F.asc("signature"))
        .limit(max_groups)
        .collect()
    )
    out = []
    for n, r in enumerate(rows, 1):
        rep = r["representative"].asDict() if r["representative"] else {}
        perms = sorted(p for p in (r["permissions"] or []) if p)
        perms_display = ", ".join(perms) if len(perms) > 1 else (
            perms[0] if perms else "unknown"
        )
        summary = (
            f"{rep.get('sc_type') or 'unknown'} attempted {perms_display} "
            f"access to {rep.get('tc_type') or 'unknown'} "
            f"{rep.get('tclass') or 'unknown'} and was denied."
        )
        avc_parts = [
            f"type={rep.get('denial_type') or 'AVC'} "
            f"msg=audit({rep.get('event_id') or '?'}): avc:  denied  "
            f"{{ {' '.join(perms) or rep.get('permission') or '?'} }} for "
        ]
        for k, f in [
            ("pid", "pid"), ("comm", "comm"), ("path", "path"),
            ("dest", "dest_port"), ("scontext", "scontext_raw"),
            ("tcontext", "tcontext_raw"), ("tclass", "tclass"),
            ("permissive", "permissive"),
        ]:
            v = rep.get(f)
            if v is not None:
                avc_parts.append(f"{k}={v} ")
        out.append(
            {
                "group": n,
                "total_events": r["count"],
                "unique_pids": len([p for p in (r["pids"] or []) if p]),
                "last_seen": str(r["last_seen"]),
                "summary": summary,
                "raw_audit_message": "".join(avc_parts).rstrip(),
                "sesearch_command": r["sesearch_command"]
                if "sesearch_command" in r.__fields__
                else None,
            }
        )
    return out


def stats_report(events: DataFrame) -> dict:
    """K3 — top-N summary per dimension (stats_formatter.py:135-160)."""
    dims = {
        "processes": ("comm", 5),
        "source_types": ("sc_type", 5),
        "target_types": ("tc_type", 5),
        "object_classes": ("tclass", 8),
        "permissions": ("permission", 5),
    }
    ok = events.filter(F.col("route") == "parse_ok")
    out = {}
    for name, (col, n) in dims.items():
        out[name] = [
            {"value": r[col], "count": r["cnt"]}
            for r in top_n_per_dimension(ok, col, n).collect()
        ]
    out["total_events"] = ok.count()
    return out
