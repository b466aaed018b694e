#!/usr/bin/env python
"""Steady-state throughput for the dedup family at sf1-like scale.

The driver bench (sf0.1 documents = 5,000 rows) measures the dedup
operators almost entirely as fixed stage-scheduling overhead — the same
distortion quantified for the parse e2e in BENCH.md (200k vs 2M docs ≈
2× understatement). This script runs exact dedup and MinHash+LSH
candidate generation over the 2M-doc bench corpus so BENCH.md can quote
a steady-state docs/s figure for the LLM-pipeline family too.

    taskset -c 0-31 env SPARK_GRAFT_CPUS=32 python scripts/dedup_bench.py

Prints one JSON line: {"n_docs": ..., "exact_sec": ..., "minhash_sec": ...,
"exact_docs_per_sec": ..., "minhash_docs_per_sec": ..., "pairs": ...,
"winnow_docs": ..., "winnow_sec": ..., "winnow_docs_per_sec": ...}

Winnowing runs on the 200k corpus (WINNOW_WAREHOUSE): its unit of work is
a char k-gram, not a word shingle — ~5-10x the hashes per doc of MinHash —
so the 200k corpus already measures steady state for it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from avc_parser_spark.session import get_spark  # noqa: E402

WAREHOUSE = os.environ.get(
    "DEDUP_BENCH_WAREHOUSE", "/root/repo/data/bench_pages_2000000"
)


def main() -> None:
    from pyspark.sql import functions as F

    from avc_parser_spark.functions.dedup import (
        exact_duplicates,
        minhash_lsh_candidates,
        winnow_candidates,
    )

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    docs = (
        spark.read.parquet(WAREHOUSE)
        .select(F.xxhash64("url").alias("doc_id"), "text")
    )
    n_docs = docs.count()  # warms the scan; excluded from the timed windows

    t0 = time.time()
    n_exact = exact_duplicates(docs).count()
    exact_sec = time.time() - t0

    t0 = time.time()
    pairs = minhash_lsh_candidates(docs).count()
    minhash_sec = time.time() - t0

    wdocs = (
        spark.read.parquet(
            os.environ.get(
                "WINNOW_WAREHOUSE", "/root/repo/data/bench_pages_200000"
            )
        ).select(F.xxhash64("url").alias("doc_id"), "text")
    )
    n_wdocs = wdocs.count()
    t0 = time.time()
    winnow_pairs = winnow_candidates(wdocs, max_bucket=64).count()
    winnow_sec = time.time() - t0

    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "exact_sec": round(exact_sec, 2),
                "minhash_sec": round(minhash_sec, 2),
                "exact_docs_per_sec": round(n_docs / exact_sec, 1),
                "minhash_docs_per_sec": round(n_docs / minhash_sec, 1),
                "exact_dup_groups": n_exact,
                "pairs": pairs,
                "winnow_docs": n_wdocs,
                "winnow_sec": round(winnow_sec, 2),
                "winnow_docs_per_sec": round(n_wdocs / winnow_sec, 1),
                "winnow_pairs": winnow_pairs,
            }
        )
    )


if __name__ == "__main__":
    main()
