"""Driver-facing query registry: every implemented operator from
SURVEY.md §2 exposed as (Spark builder, DuckDB oracle SQL) pairs.

``__spark_entry__.py`` re-exports :func:`queries` / :func:`oracle_sql`;
tests/test_oracle_parity.py runs the same comparison the driver does
(row count + schema + order-insensitive values) locally at sf0.001.

Conventions:
  - every computed column is aliased identically in Spark and SQL;
  - only exact arithmetic in gated queries (bigint sums, integer DIV),
    doubles rounded to a fixed scale where unavoidable;
  - DuckDB's SUM(BIGINT) returns HUGEINT — oracles cast back to BIGINT.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pmacct_spark.config import PluginConfig, Preprocess
from pmacct_spark.pipeline import build_aggregation
from pmacct_spark.session import apply_runtime_confs
from pmacct_spark.views.flows import FLOWS_DUCK_CTE, flows_view

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    # import for side effects: each module registers its queries
    from pmacct_spark import queries_aggregate  # noqa: F401
    from pmacct_spark import queries_client  # noqa: F401
    from pmacct_spark import queries_curation  # noqa: F401
    from pmacct_spark import queries_enrich  # noqa: F401
    from pmacct_spark import queries_pipeline  # noqa: F401
    from pmacct_spark import queries_relational  # noqa: F401
    from pmacct_spark import queries_sampling  # noqa: F401
    from pmacct_spark import queries_session  # noqa: F401
    from pmacct_spark import queries_streaming  # noqa: F401
    from pmacct_spark import queries_telemetry  # noqa: F401

    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    queries()
    return dict(_ORACLES)


def flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    return flows_view(spark, sf_dir)


__all__ = [
    "FLOWS_DUCK_CTE",
    "PluginConfig",
    "Preprocess",
    "build_aggregation",
    "flows",
    "oracle_sql",
    "queries",
    "register",
]
