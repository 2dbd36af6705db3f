"""As-of (backward) join against a time-versioned dimension.

The reference reloads its maps live (SIGUSR2, reference
src/plugin_common.c:56) and keeps per-peer RIBs that change over time
(SURVEY §2.4: "as-of semantics if RIB is time-versioned"): a record
must be enriched with the dimension version that was valid AT ITS
EVENT TIME, not the latest one.

Spark-first shape: broadcast the (small) versioned dimension, join on
the equi keys with ``valid_from <= ts``, keep the row with the max
``valid_from`` per fact record via ``max_by`` — one broadcast, no fact
shuffle, the group-by collapses the version candidates map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def as_of_join(
    facts: DataFrame,
    dim: DataFrame,
    keys: dict[str, str],
    ts_col: str,
    valid_col: str,
    attrs: dict[str, str],
) -> DataFrame:
    """Enrich ``facts`` with the dimension version valid at event time.

    ``keys``: fact column -> dim column equi keys. ``attrs``: dim column
    -> output column. Facts with no valid version get NULL attrs.
    """
    d = dim.select(
        *[F.col(dc).alias(f"__k_{dc}") for dc in keys.values()],
        F.col(valid_col).alias("__valid"),
        *[F.col(src).alias(f"__a_{dst}") for src, dst in attrs.items()],
    )
    cond = F.col("__valid") <= F.col(ts_col)
    for fc, dc in keys.items():
        cond = cond & (F.col(fc) == F.col(f"__k_{dc}"))
    joined = facts.join(F.broadcast(d), cond, "left")
    group_cols = facts.columns
    aggs = [
        F.max_by(F.col(f"__a_{dst}"), F.col("__valid")).alias(dst)
        for dst in attrs.values()
    ]
    return joined.groupBy(*group_cols).agg(*aggs)
