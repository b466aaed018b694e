"""Cross-group analyzers & per-group detectors (reference §2.7), as native
DataFrame expressions over the (small) group-aggregate table.

Findings are severity/category-tagged rows; thresholds mirror the reference:
  D1  dontaudit-disabled        detectors/anomaly_detector.py:169-229
  D2  permissive events         detectors/anomaly_detector.py:10-27
  D3  container paths           detectors/anomaly_detector.py:30-81
  D4  custom paths              detectors/anomaly_detector.py:84-135
  AN1 widespread unlabeled_t    analyzers/labeling.py:19-51  (≥3 groups or ≥10 events)
  AN2 MLS inconsistency         analyzers/labeling.py:54-93  (≥5 core types @s15 vs s0)
  AN3 relabeling tools denied   analyzers/relabeling.py:10-49
  AN4 boot-blocking             analyzers/boot_impact.py:6-57
  AN5 systemic pattern          analyzers/patterns.py:7-49   (≥10 sources on one target)
  AN6 recurrence across reloads analyzers/recurrence.py:10-71
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DONTAUDIT_INDICATORS = ["noatsecure", "rlimitinh", "siginh"]

CONTAINER_PATH_PATTERNS = [
    "/containers/storage/overlay/",
    "/.local/share/containers/",
    "/var/lib/containers/",
    "/var/lib/docker/",
]

CUSTOM_PATH_PREFIXES = [
    "/usr/local", "/opt", "/home/", "/srv", "/data", "/app", "/apps",
    "/software", "/custom", "/local", "/var/local",
]

RELABELING_TYPES = ["semanage_t", "setfiles_t", "restorecon_t", "load_policy_t"]
RELABEL_PERMISSIONS = ["relabelfrom", "relabelto"]

BOOT_CRITICAL_TYPES = [
    "init_t", "kmod_t", "mount_t", "systemd_modules_load_t", "udev_t",
    "fsadm_t", "lvm_t", "plymouthd_t", "systemd_t", "systemd_sysctl_t",
    "systemd_tmpfiles_t",
]
ESSENTIAL_TARGET_TYPES = [
    "fixed_disk_device_t", "removable_device_t", "modules_dep_t",
    "modules_conf_t", "lib_t", "bin_t", "etc_t", "root_t", "ld_so_cache_t",
    "boot_t", "unlabeled_t",
]

CORE_SYSTEM_TYPES = [
    "etc_t", "lib_t", "bin_t", "usr_t", "var_t", "root_t", "boot_t",
    "modules_object_t", "ld_so_cache_t",
]

FINDINGS_SCHEMA = (
    "severity string, category string, title string, "
    "affected_groups bigint, total_events bigint, detail string, "
    "affected_sigs array<bigint>, hints array<string>, "
    "evidence map<string,string>"
)

# Canned investigation hints per rule (reference findings carry these as
# investigation_hints, analyzers/*.py; relational sig ids replace the
# reference's positional group indices — stable under any row order).
HINTS = {
    "labeling": [
        "filter groups with --target unlabeled_t to inspect the denials",
        "run: fixfiles -v check",
        "run: rpm -V selinux-policy-*",
    ],
    "relabeling": [
        "check file-context rules: semanage fcontext -l",
        "complete the relabel: restorecon -Rv <path> (or touch /.autorelabel)",
    ],
    "boot_impact": [
        "inspect early-boot denials: journalctl -b -t audit",
        "if boot is blocked, consider enforcing=0 on the kernel cmdline while fixing policy",
    ],
    "systemic": [
        "many sources denied on one target usually means the TARGET is mislabeled",
        "verify the expected label: matchpathcon <path>",
    ],
    "recurrence": [
        "denials persisting across policy reloads mean the loaded policy does not cover them",
        "re-check the generated policy module against the recurring signatures",
    ],
}


def detector_flags(groups: DataFrame) -> DataFrame:
    """D1-D4 per-group boolean flag columns over the aggregate table.

    Expects columns: permissions (array), permissives (array), paths (array),
    representative struct with sc_type/tc_type/permissive.
    """
    perms = F.col("permissions")
    paths = F.coalesce(F.col("paths"), F.array())

    dontaudit = F.exists(
        perms, lambda p: F.lower(F.trim(p)).isin(*DONTAUDIT_INDICATORS)
    )
    permissive = F.array_contains(F.coalesce(F.col("permissives"), F.array()), "1")
    container = F.exists(
        paths,
        lambda p: F.lit(False)
        if not CONTAINER_PATH_PATTERNS
        else _contains_any(p, CONTAINER_PATH_PATTERNS),
    )
    custom = F.exists(
        paths,
        lambda p: _startswith_any(p, CUSTOM_PATH_PREFIXES),
    )
    return (
        groups.withColumn("flag_dontaudit", dontaudit)
        .withColumn("flag_permissive", permissive)
        .withColumn("flag_container_paths", container)
        .withColumn("flag_custom_paths", custom)
    )


def _contains_any(col, needles):
    expr = F.lit(False)
    for n in needles:
        expr = expr | col.contains(n)
    return expr


def _startswith_any(col, prefixes):
    expr = F.lit(False)
    for p in prefixes:
        expr = expr | col.startswith(p)
    return expr


def _finding(
    spark: SparkSession, severity, category, title, affected, events, detail,
    sigs=None, evidence=None,
):
    return spark.createDataFrame(
        [
            (
                severity, category, title, int(affected), int(events), detail,
                sorted(int(s) for s in (sigs or [])),
                HINTS.get(category, []),
                {k: str(v) for k, v in (evidence or {}).items()},
            )
        ],
        FINDINGS_SCHEMA,
    )


def run_analyzers(
    groups: DataFrame, policy_loads: DataFrame | None = None
) -> DataFrame:
    """AN1-AN6 over the group table → findings DataFrame.

    The group table is small (the whole premise of signature dedup), so each
    rule is a filter+agg; the final result is a unionByName of finding rows.
    Runs pre-filter, like the reference (analyzers/__init__.py:13-37).
    """
    spark = groups.sparkSession
    g = detector_flags(groups).select(
        "sig_id",
        "count",
        "first_seen",
        "last_seen",
        "permissions",
        F.col("representative.sc_type").alias("s_type"),
        F.col("representative.tc_type").alias("t_type"),
        F.col("representative.scontext_raw").alias("scontext"),
        F.col("representative.tcontext_raw").alias("tcontext"),
        F.col("representative.comm").alias("comm"),
        F.col("representative.permissive").alias("rep_permissive"),
        "flag_dontaudit",
        "flag_permissive",
        "flag_container_paths",
        "flag_custom_paths",
    ).cache()

    findings: list[DataFrame] = []

    # ---- AN1: widespread unlabeled_t (≥3 groups or ≥10 events) ------------
    unl = g.filter(F.col("t_type") == "unlabeled_t").agg(
        F.count(F.lit(1)).alias("grp"),
        F.coalesce(F.sum("count"), F.lit(0)).alias("ev"),
        F.max(F.col("rep_permissive") == "1").alias("any_perm"),
        F.slice(F.sort_array(F.collect_set("sig_id")), 1, 128).alias("sigs"),
    ).head()
    if unl["grp"] >= 3 or unl["ev"] >= 10:
        findings.append(
            _finding(
                spark,
                "WARNING" if unl["any_perm"] else "CRITICAL",
                "labeling",
                "Widespread unlabeled_t files",
                unl["grp"],
                unl["ev"],
                f"{unl['grp']} groups / {unl['ev']} events target unlabeled_t",
                sigs=unl["sigs"],
                evidence={"unlabeled_groups": unl["grp"], "unlabeled_events": unl["ev"]},
            )
        )

    # ---- AN2: MLS inconsistency (≥5 core types @s15 while source s0) ------
    t_mls = F.regexp_extract(F.col("tcontext"), r"^[^:]+:[^:]+:[^:]+:(.*)$", 1)
    s_mls_low = F.split(
        F.regexp_extract(F.col("scontext"), r"^[^:]+:[^:]+:[^:]+:([^-]*)", 1), ","
    ).getItem(0)
    mls_bad = g.filter(
        F.col("t_type").isin(*CORE_SYSTEM_TYPES)
        & t_mls.contains("s15")
        & (s_mls_low.isin("s0", "") | s_mls_low.isNull())
    ).agg(
        F.countDistinct("t_type").alias("types"),
        F.count(F.lit(1)).alias("grp"),
        F.coalesce(F.sum("count"), F.lit(0)).alias("ev"),
        F.slice(F.sort_array(F.collect_set("sig_id")), 1, 128).alias("sigs"),
    ).head()
    if mls_bad["types"] >= 5:
        findings.append(
            _finding(
                spark, "CRITICAL", "labeling",
                "MLS labeling inconsistency: system files at wrong level",
                mls_bad["grp"], mls_bad["ev"],
                f"{mls_bad['types']} core types labeled s15 vs s0 sources",
                sigs=mls_bad["sigs"],
                evidence={"wrong_level_types": mls_bad["types"]},
            )
        )

    # ---- AN3: relabeling tools denied --------------------------------------
    rel = g.filter(
        F.col("s_type").isin(*RELABELING_TYPES)
        & (F.size(F.array_intersect(F.col("permissions"), F.array(*[F.lit(p) for p in RELABEL_PERMISSIONS]))) > 0)
    ).agg(
        F.count(F.lit(1)).alias("grp"),
        F.coalesce(F.sum("count"), F.lit(0)).alias("ev"),
        F.sort_array(F.collect_set("comm")).alias("tools"),
        F.slice(F.sort_array(F.collect_set("sig_id")), 1, 128).alias("sigs"),
    ).head()
    if rel["grp"] > 0:
        findings.append(
            _finding(
                spark, "CRITICAL", "relabeling",
                "Relabeling tools are being denied",
                rel["grp"], rel["ev"],
                "tools: " + ",".join(t for t in rel["tools"] if t),
                sigs=rel["sigs"],
                evidence={"tools": ",".join(t for t in rel["tools"] if t)},
            )
        )

    # ---- AN4: boot-blocking -------------------------------------------------
    boot = g.filter(
        F.col("s_type").isin(*BOOT_CRITICAL_TYPES)
        & F.col("t_type").isin(*ESSENTIAL_TARGET_TYPES)
    ).agg(
        F.count(F.lit(1)).alias("grp"),
        F.coalesce(F.sum("count"), F.lit(0)).alias("ev"),
        F.sort_array(F.collect_set("comm")).alias("svcs"),
        F.slice(F.sort_array(F.collect_set("sig_id")), 1, 128).alias("sigs"),
    ).head()
    if boot["grp"] > 0:
        findings.append(
            _finding(
                spark, "CRITICAL", "boot_impact",
                "Boot-blocking denials detected",
                boot["grp"], boot["ev"],
                "services: " + ",".join(s for s in boot["svcs"][:5] if s),
                sigs=boot["sigs"],
                evidence={"services": ",".join(s for s in boot["svcs"][:5] if s)},
            )
        )

    # ---- AN5: systemic pattern (≥10 distinct sources on one target) -------
    systemic = (
        g.groupBy("t_type", t_mls.alias("t_mls"))
        .agg(
            F.countDistinct("s_type").alias("sources"),
            F.count(F.lit(1)).alias("grp"),
            F.sum("count").alias("ev"),
            F.slice(F.sort_array(F.collect_set("sig_id")), 1, 128).alias("sigs"),
        )
        .filter(F.col("sources") >= 10)
        .collect()
    )
    for row in systemic:
        findings.append(
            _finding(
                spark, "WARNING", "systemic",
                f"Systemic issue: {row['sources']} processes denied on {row['t_type']}",
                row["grp"], row["ev"],
                f"target={row['t_type']} mls={row['t_mls']}",
                sigs=row["sigs"],
                evidence={"sources": row["sources"], "target": row["t_type"]},
            )
        )

    # ---- AN6: recurrence across policy reloads ------------------------------
    if policy_loads is not None and policy_loads.head(1):
        bounds = policy_loads.agg(
            F.min("event_ts").alias("lo"), F.max("event_ts").alias("hi")
        ).head()
        if bounds["lo"] is not None:
            rec = (
                g.withColumn(
                    "before_ev",
                    F.when(F.col("first_seen") < bounds["lo"], F.col("count")).otherwise(0),
                )
                .withColumn(
                    "after_ev",
                    F.when(F.col("last_seen") >= bounds["hi"], F.col("count")).otherwise(0),
                )
                .groupBy("t_type")
                .agg(
                    F.sum("before_ev").alias("before"),
                    F.sum("after_ev").alias("after"),
                    F.slice(F.sort_array(F.collect_set("sig_id")), 1, 128).alias("sigs"),
                )
                # integer forms of the reference's 0.3/0.7 ratios — exact
                # for integer counts (a >= 0.3b ⇔ 10a >= 3b), immune to the
                # float-boundary divergence vs decimal-arithmetic oracles
                .filter(
                    (F.col("before") > 0)
                    & (F.col("after") * 10 >= F.col("before") * 3)
                )
                .collect()
            )
            for row in rec:
                trend = (
                    "stable"
                    if row["after"] * 10 >= row["before"] * 7
                    else "decreasing"
                )
                findings.append(
                    _finding(
                        spark, "WARNING", "recurrence",
                        f"Recurring denials for {row['t_type']} across policy reloads",
                        0, row["before"] + row["after"],
                        f"before={row['before']} after={row['after']} trend={trend}",
                        sigs=row["sigs"],
                        evidence={"before": row["before"], "after": row["after"], "trend": trend},
                    )
                )

    g.unpersist()
    if not findings:
        return spark.createDataFrame([], FINDINGS_SCHEMA)
    out = findings[0]
    for fdf in findings[1:]:
        out = out.unionByName(fdf)
    return out


def parse_policy_events(events_lines: DataFrame) -> DataFrame:
    """P17/P18 — MAC_POLICY_LOAD / MAC_STATUS side table from parsed events.

    Input: any DataFrame with (denial_type-bearing) raw lines already parsed;
    here we re-use the routed event table's sibling records by filtering the
    pages text directly is unnecessary — the datagen embeds policy loads as
    dedicated docs. Kept simple: filter rows whose raw text matched policy
    types during parse (extension hook for future rounds)."""
    return events_lines.filter(F.col("denial_type").isin("MAC_POLICY_LOAD", "MAC_STATUS"))
