"""Spark wrapper for the parse kernel: mapInPandas over Arrow batches.

The kernel is document-local (a page's blocks are self-contained), so the
entire parse → shared-context merge → route computation is a *narrow*
transformation: no shuffle between the scan and the routed event table.
At 100 TB this means parse cost scales linearly with input splits and the
only shuffles in the whole pipeline are the signature aggregations.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from avc_parser_spark.parse.kernels import parse_pages_pdf

EVENT_SCHEMA_DDL = ", ".join(
    [
        "url string",
        "warc_ts timestamp",
        "lang string",
        "route string",
        "parse_status string",
        "host string",
        "denial_type string",
        "event_id string",
        "event_ts timestamp",
        "permission string",
        "pid string",
        "comm string",
        "exe string",
        "proctitle string",
        "path string",
        "path_type string",
        "name string",
        "dev string",
        "ino string",
        "scontext_raw string",
        "tcontext_raw string",
        "sc_user string",
        "sc_role string",
        "sc_type string",
        "sc_mls string",
        "tc_user string",
        "tc_role string",
        "tc_type string",
        "tc_mls string",
        "tclass string",
        "dest_port string",
        "dbus_dest string",
        "permissive string",
        "syscall string",
        "exit string",
        "success string",
        "cwd string",
        "saddr string",
        "saddr_struct string",
        "execve_cmdline string",
        "path_normalized boolean",
        "cross_process_access boolean",
        "malformed_lines bigint",
        "extracted_text string",
    ]
)


def parse_pages(pages: DataFrame, jvm_pregate: bool = True) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → routed event DataFrame.

    Column pruning matters at scale: only (url, warc_ts, text, lang) are
    selected, so Parquet/Iceberg never reads the heavy `html` binary column
    for the text parse path (check `.explain` ReadSchema).

    jvm_pregate (V2/V3 as a native prefilter): non-audit blocks (filler
    prose) are dropped JVM-side before the Arrow boundary — codegen
    `filter(split(text,'----'), b -> b rlike ...)` — so only audit-bearing
    bytes pay the serialization tax. The quarantine signal (control bytes)
    is computed on the FULL text first, and carried as a one-char sentinel
    block so the kernel's routing semantics are unchanged. Documents are
    still self-contained: no shuffle.
    """
    from pyspark.sql import functions as F

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            try:
                yield parse_pages_pdf(pdf)
            except Exception as batch_err:  # noqa: BLE001
                # V4 contract (parse_avc.py:477-482): NEVER fail the job.
                # Retry per document to salvage the good ones; the bad
                # documents become quarantine stubs tagged with the error.
                frames = []
                for i in range(len(pdf)):
                    one = pdf.iloc[i : i + 1]
                    try:
                        frames.append(parse_pages_pdf(one))
                    except Exception as doc_err:  # noqa: BLE001
                        stub = pd.DataFrame(
                            {
                                "url": one["url"].values,
                                "warc_ts": pd.to_datetime(
                                    one["warc_ts"], errors="coerce"
                                ),
                                "lang": one["lang"].values,
                                "route": "quarantine",
                                "parse_status": f"PARSE_ERROR_{type(doc_err).__name__}",
                            }
                        )
                        frames.append(stub)
                out = pd.concat(frames, ignore_index=True)
                from avc_parser_spark.parse.kernels import EVENT_COLUMNS

                for col in EVENT_COLUMNS:
                    if col not in out.columns:
                        out[col] = None
                out["malformed_lines"] = (
                    pd.to_numeric(out["malformed_lines"], errors="coerce")
                    .fillna(0)
                    .astype("int64")
                )
                yield out[EVENT_COLUMNS]

    pruned = pages.select("url", "warc_ts", "text", "lang")
    if jvm_pregate:
        blocks = F.split(F.col("text"), "----")
        kept = F.filter(
            blocks, lambda b: b.rlike(r"type=\w+|msg=audit|avc:")
        )
        has_ctrl = F.col("text").rlike("[\x00-\x08\x0b\x0c\x0e-\x1f]")
        gated_text = F.concat(
            F.array_join(kept, "\n----\n"),
            # control bytes anywhere in the doc must still quarantine it,
            # even if they sit in a dropped block: append a sentinel.
            F.when(has_ctrl, F.lit("\n----\n\x01ctrl\x01\n----\n")).otherwise(
                F.lit("")
            ),
        )
        pruned = pruned.select(
            "url", "warc_ts", gated_text.alias("text"), "lang"
        )
    return pruned.mapInPandas(run, schema=EVENT_SCHEMA_DDL)
