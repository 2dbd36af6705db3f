"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``pmacct_spark`` — this file is the thin driver
shim.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pmacct_spark import driver_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the canonical pmacct
    "who talks to whom" aggregation (aggregate: src_host,dst_host)."""
    from pmacct_spark.queries_aggregate import agg_host_pairs

    return agg_host_pairs(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return driver_queries.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each gated query."""
    return driver_queries.oracle_sql()
