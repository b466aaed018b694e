"""Vectorized grok/regex parse stage (pandas/Arrow UDF kernels)."""

from avc_parser_spark.parse.kernels import (  # noqa: F401
    EVENT_COLUMNS,
    parse_pages_pdf,
    translate_exit_code,
)
from avc_parser_spark.parse.udf import EVENT_SCHEMA_DDL, parse_pages  # noqa: F401
