"""Deterministic synthetic data generation for tests and benchmarks.

No external data: everything derives from a fixed seed + row index, per the
fixture spec in /root/repo/FIXTURES.md.
"""

from avc_parser_spark.datagen.payload import make_payload  # noqa: F401
from avc_parser_spark.datagen.pages import build_pages_df, write_pages_warehouse  # noqa: F401
