"""Gated queries: the pmacct client surface (-M/-N/-S wildcard and
OR-list match specs) served through :class:`pmacct_spark.client.ImtTable`
(reference src/server.c:363-430 masked scan; QUICKSTART:878-928 spec
grammar)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pmacct_spark.client import ImtTable
from pmacct_spark.config import PluginConfig
from pmacct_spark.driver_queries import flows, register
from pmacct_spark.pipeline import build_aggregation
from pmacct_spark.views.flows import FLOWS_DUCK_CTE

_SUMS = (
    "CAST(SUM(bytes) AS BIGINT) AS bytes, "
    "CAST(SUM(packets) AS BIGINT) AS packets, "
    "CAST(SUM(flows) AS BIGINT) AS flows"
)


def _as_table(spark, sf_dir) -> ImtTable:
    cfg = PluginConfig(aggregate=["src_as", "dst_as"])
    agg = build_aggregation(flows(spark, sf_dir), cfg)
    return ImtTable(agg, keys=["src_as", "dst_as"], counters=["bytes", "packets", "flows"])


# --- -M with a wildcard field and an OR-list alternative: matched rows
@register(
    "client_match_orlist",
    f"""{FLOWS_DUCK_CTE}
SELECT as_src AS src_as, as_dst AS dst_as, {_SUMS}
FROM flows GROUP BY 1, 2
HAVING (as_src = 64505) OR (as_src = 64510 AND as_dst = 64513)""",
)
def client_match_orlist(spark, sf_dir):
    return _as_table(spark, sf_dir).match("64505,*;64510,64513")


# --- -N: counters-only projection of the matched entries
@register(
    "client_counters_only",
    f"""{FLOWS_DUCK_CTE}
SELECT {_SUMS}
FROM flows GROUP BY as_src, as_dst
HAVING as_src = 64501 AND as_dst = 64504""",
)
def client_counters_only(spark, sf_dir):
    return _as_table(spark, sf_dir).match("64501,64504", counters_only=True)


# --- -M ... -S: sum counters across the OR'd matches into one row
@register(
    "client_match_sum",
    f"""{FLOWS_DUCK_CTE}
SELECT {_SUMS} FROM (
  SELECT as_src, as_dst,
         CAST(SUM(bytes) AS BIGINT) AS bytes,
         CAST(SUM(packets) AS BIGINT) AS packets,
         CAST(SUM(flows) AS BIGINT) AS flows
  FROM flows GROUP BY 1, 2
  HAVING as_src = 64500 OR as_dst = 64502
)""",
)
def client_match_sum(spark, sf_dir):
    return _as_table(spark, sf_dir).match("64500,*;*,64502", sum_matches=True)


# --- -T over the served table (merge-sort top-N, src/pmacct.c:3152)
@register(
    "client_topn_packets",
    f"""{FLOWS_DUCK_CTE}
SELECT as_src AS src_as, as_dst AS dst_as, {_SUMS}
FROM flows GROUP BY 1, 2
ORDER BY packets DESC, src_as ASC, dst_as ASC LIMIT 7""",
)
def client_topn_packets(spark, sf_dir):
    return _as_table(spark, sf_dir).topn("packets", 7)
