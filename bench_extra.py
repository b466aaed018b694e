#!/usr/bin/env python
"""Round-6 optimization harness (bench.py is FROZEN — this file is the
extra instrumentation the optimization guide §1 calls for).

Usage:
  python bench_extra.py [--reps N] [--explain-dir plans/r06 --suffix _before] \
      [query ...]

For each named query (default: the bench.py list) it times
`queries()[name](spark, SF_DIR).count()` `reps` times in one warm session
(min + all samples printed) and optionally writes `.explain("formatted")`
to <explain-dir>/<name><suffix>.txt.  Jobs are labelled so the UI maps
stages to queries.  Loadavg is recorded before/after each query so
co-tenant bursts are visible in the numbers.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as em  # noqa: E402
from avc_parser_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

DEFAULT = [
    "pipeline_grok_parse",
    "pipeline_signature_smart",
    "pipeline_lang_hour_rollup",
    "events_hourly",
    "events_sessions",
    "tpch_q1",
    "tpch_q3ish",
    "text_suite",
    "link_graph_suite",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_resolve",
    "corpus_curation",
    "ann_suite",
    "ngram_overlap_suite",
    "token_suite",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", default=None)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="")
    args = ap.parse_args()
    names = args.queries or DEFAULT

    spark = get_spark(app_name="bench_extra", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    qmap = em.queries()

    # Warm the python workers / JIT once, like bench.py's warmup does.
    spark.range(1000).selectExpr("sum(id)").collect()

    out: dict[str, dict] = {}
    for name in names:
        samples = []
        loads = []
        for rep in range(args.reps):
            loads.append(round(os.getloadavg()[0], 2))
            spark.sparkContext.setJobDescription(f"{name}#r{rep}")
            t0 = time.time()
            df = qmap[name](spark, SF_DIR)
            df.count()
            samples.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            if rep == 0 and args.explain_dir:
                import contextlib
                import io

                os.makedirs(args.explain_dir, exist_ok=True)
                p = os.path.join(args.explain_dir, f"{name}{args.suffix}.txt")
                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                with open(p, "w") as f:
                    f.write(buf.getvalue())
        out[name] = {
            "min": min(samples),
            "samples": samples,
            "load1_before": loads,
        }
        print(json.dumps({name: out[name]}), flush=True)
    print("FINAL " + json.dumps(out))


if __name__ == "__main__":
    main()
