"""Raw-file sources: ingest the reference tool's native inputs directly.

The reference CLI consumes ausearch-export files (parse_avc.py reads a
file/stdin and splits event blocks on `----` separator lines); a user
switching to this engine has directories of exactly those files.
`read_audit_logs` turns them into the (url, warc_ts, text, lang) frame
every downstream stage (parse_pages → enrich → route → aggregate)
already consumes.

Scale shape: `spark.read.option("lineSep", "\\n----\\n").text(path)` makes
the SEPARATOR the record delimiter, so Spark's text source does the block
splitting inside its normal split machinery — a 100 GB log file fans out
across tasks like any text scan; no whole-file reads, no driver-side
splitting, no window over line numbers. Residual separator lines (files
that open with `----`, back-to-back separators) are filtered per record
with a native array expression. Files WITHOUT separators (plain audit.log
dumps — several reference testAVC files are this shape) arrive as one
block per split and the parse kernel's own block-splitting (V1,
parse/kernels.py) handles multi-event content inside a document, same as
always.

Contract (pinned by tests/test_sources.py over the reference's own 23
testAVC exports): the parse_ok EVENT stream is identical to parsing each
whole file as one document. Routing granularity is finer by design — a
separator-delimited block with no valid denial routes to `malformed` on
its own instead of disappearing inside a file-sized parse_ok document,
which is what you want at scale: noise quarantines per block.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

AUDIT_SEPARATOR = "\n----\n"


def _blocks_frame(raw: DataFrame, url_suffix) -> DataFrame:
    """Shared batch/stream block shaping: strip residual separator lines,
    drop empty blocks, emit the pages-shaped columns. One definition so
    the two readers can never drift."""
    body = F.array_join(
        F.filter(
            F.split(F.col("value"), "\n"),
            lambda line: F.trim(line) != "----",
        ),
        "\n",
    )
    return (
        raw.select(
            F.input_file_name().alias("src_file"),
            F.trim(body).alias("text"),
        )
        .filter(F.col("text") != "")
        .select(
            F.concat(F.col("src_file"), F.lit("#"), url_suffix).alias("url"),
            F.lit(None).cast("timestamp").alias("warc_ts"),
            "text",
            F.lit("und").alias("lang"),
        )
    )


def read_audit_logs(spark: SparkSession, path: str) -> DataFrame:
    """Read raw ausearch-export files under `path` (file, dir, or glob)
    into the pages-shaped frame `parse_pages` consumes.

    url = <source file>#<block ordinal> (stable within a read; block
    ordinals are per-partition monotonic ids, deterministic for a fixed
    file layout), warc_ts = the file's modification time surrogate is NOT
    available engine-side, so it is left null — the parse kernel's own
    per-record timestamps (P5) carry the time dimension for audit data.
    """
    raw = spark.read.option("lineSep", AUDIT_SEPARATOR).text(path)
    return _blocks_frame(raw, F.monotonically_increasing_id().cast("string"))


def stream_audit_logs(spark: SparkSession, landing_dir: str) -> DataFrame:
    """Streaming twin: Structured Streaming's file source discovers new
    ausearch-export files dropped into `landing_dir` and their blocks flow
    into the same pages shape (feed to streaming.stream_events). The
    separator-as-record-delimiter trick carries over unchanged — block
    splitting happens inside the text source, exactly-once per file via
    the stream's own file tracking. url suffix = xxhash64 of the cleaned
    block text (monotonic ids are not batch-stable in a stream);
    byte-identical duplicate blocks within one file coalesce onto one
    url, which downstream signature aggregation counts correctly
    anyway."""
    raw = (
        spark.readStream.option("lineSep", AUDIT_SEPARATOR)
        .text(landing_dir)
    )
    return _blocks_frame(raw, F.xxhash64(F.col("text")).cast("string"))
