#!/usr/bin/env python
"""Multi-executor N-vs-4N scaling evidence (north rule: ≥0.8 efficiency).

Runs the parse→enrich→route aggregate (including extracted_text
materialization) on `local-cluster[N_EXEC, CORES_PER, 4096]` — REAL separate
executor JVMs with the package shipped via addPyFile, i.e. the
`spark-submit --py-files` path. Pin the process to exactly the core budget:

    taskset -c 0-1 env N_EXEC=1 python scripts/scaling_bench.py
    taskset -c 0-7 env N_EXEC=4 python scripts/scaling_bench.py

and compare docs/s (efficiency = docs_s(4N) / docs_s(N) / 4). Keeping
executors at 2 cores stays below this VM's memory-bandwidth saturation knee
(see BENCH.md), which is the regime a real multi-node cluster emulates.
"""

from __future__ import annotations

import json
import os
import sys
import time
import zipfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

N_EXEC = int(os.environ.get("N_EXEC", "1"))
CORES_PER = int(os.environ.get("CORES_PER", "2"))
N_DOCS = int(os.environ.get("BENCH_N_DOCS", "500000"))


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zpath = "/tmp/avc_parser_spark.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(repo, "avc_parser_spark")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, repo))

    total_cores = N_EXEC * CORES_PER
    spark = (
        SparkSession.builder.master(f"local-cluster[{N_EXEC},{CORES_PER},4096]")
        .appName(f"scaling_{N_EXEC}x{CORES_PER}")
        .config("spark.sql.shuffle.partitions", str(max(8, total_cores * 2)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addPyFile(zpath)

    from avc_parser_spark.datagen.pages import write_pages_warehouse
    from avc_parser_spark.enrich.join import signature_exprs
    from avc_parser_spark.parse.udf import parse_pages

    wh = os.path.join(repo, "data", f"bench_pages_{N_DOCS}")
    os.makedirs(os.path.join(repo, "data"), exist_ok=True)
    write_pages_warehouse(spark, wh, N_DOCS)
    tot = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _d, fs in os.walk(wh)
        for f in fs
    )
    spark.conf.set(
        "spark.sql.files.maxPartitionBytes", str(max(1 << 20, tot // total_cores))
    )
    pages = spark.read.parquet(wh)
    parse_pages(pages.sample(0.01)).count()  # warm the python workers

    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        ev = signature_exprs(parse_pages(pages))
        ev.groupBy("route").agg(
            F.count(F.lit(1)), F.sum(F.length("extracted_text"))
        ).collect()
        best = min(best, time.time() - t0)

    print(
        json.dumps(
            {
                "executors": N_EXEC,
                "cores_per_executor": CORES_PER,
                "n_docs": N_DOCS,
                "e2e_sec": round(best, 2),
                "docs_per_sec": round(N_DOCS / best, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
