"""Deterministic group orderings O1-O4 (utils/sort_utils.py:11-53).

None timestamps sort as epoch-0 sentinels (reference behavior), and every
order has a total tiebreak (signature string) so output order is stable
across partitionings — required for golden parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def sort_groups(groups: DataFrame, order: str = "recent") -> DataFrame:
    epoch0 = F.to_timestamp(F.lit("1970-01-01 00:00:00"))
    first = F.coalesce(F.col("first_seen"), epoch0)
    last = F.coalesce(F.col("last_seen"), epoch0)
    if order == "recent":
        return groups.orderBy(F.desc(last), F.desc(first), F.asc("signature"))
    if order == "count":
        return groups.orderBy(F.desc("count"), F.desc(last), F.asc("signature"))
    if order == "chrono":
        return groups.orderBy(F.asc(first), F.asc(last), F.asc("signature"))
    raise ValueError(f"unknown sort order: {order!r} (recent|count|chrono)")
