"""Enrichment: broadcast-join lookup dims + native categorizer expressions.

The reference implements E1-E12 (SURVEY.md §2.4) as in-process static dicts;
here every exact lookup becomes a broadcast hash join against a tiny dim
DataFrame, and every prefix/pattern rule becomes a native Catalyst `when`
cascade — all JVM-side, whole-stage-codegen eligible, zero shuffles.
"""

from avc_parser_spark.enrich.dims import build_dims  # noqa: F401
from avc_parser_spark.enrich.join import (  # noqa: F401
    enrich_events,
    object_group_expr,
    path_pattern_expr,
    permission_category_expr,
    process_category_expr,
    sesearch_expr,
    signature_exprs,
)
