"""Skew-aware aggregation: two-stage salted groupBy.

At 100 TB a handful of heavy-hitter keys (one busy /16, one proto)
dominate a shuffle partition. AQE's skew-join splitting handles joins;
for aggregations the classic remedy is salting: shuffle on
(key, salt), combine, then reduce the per-salt partials on the key
alone. The second shuffle moves one row per (key, salt) — negligible —
while the first spreads each hot key over ``salt_buckets`` reducers.

Result is IDENTICAL to the plain groupBy (sums are associative), so
the same DuckDB oracle gates both physical shapes — the salted query
reuses the unsalted oracle verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


AGG_FNS = {"sum": F.sum, "min": F.min, "max": F.max, "bit_or": F.bit_or}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
    salt_on: str | None = None,
) -> DataFrame:
    """groupBy(keys) with a salt stage.

    ``aggs``: output column -> (fn, input column), fn in AGG_FNS (all
    associative, so partial-then-final is exact). ``salt_on``: column
    whose hash picks the salt (default: a deterministic row hash over
    every key column plus a uniform spreader).
    """
    spread = (
        F.abs(F.xxhash64(salt_on)) if salt_on else F.abs(F.xxhash64(F.monotonically_increasing_id()))
    )
    salted = df.withColumn("__salt", (spread % salt_buckets).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[AGG_FNS[fn](col).alias(out) for out, (fn, col) in aggs.items()]
    )
    refold = {"sum": "sum", "min": "min", "max": "max", "bit_or": "bit_or"}
    final = partial.groupBy(*keys).agg(
        *[
            AGG_FNS[refold[fn]](out).alias(out)
            for out, (fn, _col) in aggs.items()
        ]
    )
    return final
