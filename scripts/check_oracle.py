#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate.

Runs every `__spark_entry__.queries()[name]` on Spark and the matching
`oracle_sql()[name]` on DuckDB over the same parquet tables, comparing:
  - row count
  - sorted column names
  - order-insensitive value hash (rows normalized: floats rounded,
    timestamps ISO, None → '␀'; rows sorted as tuples of strings)

Usage: python scripts/check_oracle.py [query ...]   (default: all)
       SF_DIR=/root/testdata/sf0.01 python scripts/check_oracle.py
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from avc_parser_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")


def _norm_value(v) -> str:
    import datetime
    import math

    import decimal

    if v is None:
        return "␀"
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="seconds")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_value(x) for x in v) + "]"
    return str(v)


def frame_fingerprint(cols: list[str], rows: list[tuple]) -> tuple[int, list[str], str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    norm_rows = sorted(
        "\x1f".join(_norm_value(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256("\n".join(norm_rows).encode()).hexdigest()[:16]
    return len(rows), sorted_cols, h


def column_types(cols: list[str], rows: list[tuple]) -> dict[str, set[str]]:
    """Per-column set of non-None python type names, sorted by column name.

    The driver's value hash distinguishes physical types the old float
    coercion hid (DuckDB HUGEINT/decimal vs Spark BIGINT) — so any
    Decimal-vs-int / Decimal-vs-float split is a real driver failure."""
    out: dict[str, set[str]] = {c: set() for c in cols}
    for r in rows:
        for c, v in zip(cols, r):
            if v is not None:
                out[c].add(type(v).__name__)
    return {c: out[c] for c in sorted(cols)}


def main() -> int:
    only = set(sys.argv[1:])
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    spark = get_spark(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in entrymod.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name:34s} spark error: {e}")
            failures += 1
            continue
        spark_fp = frame_fingerprint(scols, srows)

        if name not in oracles:
            print(
                f"rows  {name:34s} rows={spark_fp[0]:>7} (rows-only check, "
                f"{time.time()-t0:.1f}s)"
            )
            if spark_fp[0] == 0 and not name.startswith("dedup"):
                print(f"WARN  {name}: zero rows")
            continue

        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name:34s} duckdb error: {e}")
            failures += 1
            continue
        oracle_fp = frame_fingerprint(ocols, orows)

        stypes, otypes = column_types(scols, srows), column_types(ocols, orows)
        if sorted(scols) == sorted(ocols) and stypes != otypes:
            failures += 1
            diff = {
                c: (stypes[c], otypes[c])
                for c in stypes
                if stypes[c] != otypes[c] and stypes[c] and otypes[c]
            }
            if diff:
                print(f"FAIL  {name:34s} column-type mismatch (driver hash would diverge)")
                for c, (s, o) in diff.items():
                    print(f"      {c}: spark={sorted(s)} oracle={sorted(o)}")
                continue
            failures -= 1  # only-None columns on one side: fall through to hash

        if spark_fp == oracle_fp:
            print(f"OK    {name:34s} rows={spark_fp[0]:>7} hash={spark_fp[2]} ({time.time()-t0:.1f}s)")
        else:
            failures += 1
            print(f"FAIL  {name}")
            print(f"      spark : rows={spark_fp[0]} cols={spark_fp[1]} hash={spark_fp[2]}")
            print(f"      oracle: rows={oracle_fp[0]} cols={oracle_fp[1]} hash={oracle_fp[2]}")
            if spark_fp[0] and oracle_fp[0] and spark_fp[0] < 50 and oracle_fp[0] < 50:
                sset = {tuple(_norm_value(v) for v in r) for r in srows}
                oset = {tuple(_norm_value(v) for v in r) for r in orows}
                for r in list(sset - oset)[:3]:
                    print("      spark-only :", r)
                for r in list(oset - sset)[:3]:
                    print("      oracle-only:", r)

    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
