"""Gated queries: fss smart sampling, conntrack correlation, distinct
counting, set operations, and GROUPING SETS (the one-pass upgrade of
the reference's N-plugins-over-one-stream pattern,
CONFIG-KEYS:190-191 / src/plugin_hooks.c:398)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pmacct_spark.config import PluginConfig
from pmacct_spark.driver_queries import flows, register
from pmacct_spark.operators.fss import (
    fsrc_duck_sql,
    fss_duck_sql,
    fss_sample,
    priority_sample,
)
from pmacct_spark.pipeline import build_aggregation
from pmacct_spark.sources.tables import load_table
from pmacct_spark.views.flows import FLOWS_DUCK_CTE

_FSS_T = 100_000

_FSS_INNER = f"""{FLOWS_DUCK_CTE}
SELECT ip_src AS src_host, ip_dst AS dst_host,
       CAST(SUM(bytes) AS BIGINT) AS bytes,
       CAST(SUM(packets) AS BIGINT) AS packets,
       CAST(SUM(flows) AS BIGINT) AS flows
FROM flows GROUP BY 1, 2"""


# --- fss: flow-size dependent sampling of the aggregate queue
#     (check_fss, src/preprocess.c:549-575) — integer-exact replay
@register(
    "fss_smart_sampling",
    fss_duck_sql(_FSS_INNER, _FSS_T, ["src_host", "dst_host"]),
)
def fss_smart_sampling(spark, sf_dir):
    cfg = PluginConfig(aggregate=["src_host", "dst_host"])
    agg = build_aggregation(flows(spark, sf_dir), cfg)
    return fss_sample(agg, _FSS_T, ["src_host", "dst_host"])


_FSRC_M = 200

_FSRC_INNER = f"""{FLOWS_DUCK_CTE}
SELECT event_id, bytes, packets FROM flows"""


# --- fsrc: priority sampling of the flow queue (check_fsrc,
#     src/preprocess.c:582-668) — deterministic hash-uniform twin of
#     the reference's random()-seeded draw, same Duffield estimator
@register(
    "fsrc_priority_sampling",
    fsrc_duck_sql(_FSRC_INNER, _FSRC_M, "event_id"),
)
def fsrc_priority_sampling(spark, sf_dir):
    """Keep the m=200 highest-priority flows (z = bytes/w), renormalize
    survivors below the discarded threshold tau up to tau. The oracle
    replays the identical double-precision priority and integer
    renormalization, so both the top-k membership and every
    renormalized counter value are hash-checked."""
    fl = flows(spark, sf_dir).select("event_id", "bytes", "packets")
    return priority_sample(fl, _FSRC_M, "event_id")


# --- conntrack-style correlation: relate data flows to their control
#     flow (conntrack helpers, src/conntrack.c): same endpoint pair, a
#     port-443 control record seen within the preceding 10 minutes
@register(
    "conntrack_correlate",
    f"""{FLOWS_DUCK_CTE},
ctrl AS (
  SELECT as_dst, ts FROM flows WHERE port_dst = 443
),
data_f AS (
  SELECT * FROM flows WHERE port_dst <> 443 AND port_src >= 1024
)
SELECT d.as_src AS src_as, COUNT(*) AS related_flows,
       CAST(SUM(d.bytes) AS BIGINT) AS bytes
FROM data_f d
WHERE EXISTS (
  SELECT 1 FROM ctrl c
  WHERE c.as_dst = d.as_src
    AND c.ts <= d.ts
    AND epoch_us(d.ts) - epoch_us(c.ts) <= 600 * 1000000
)
GROUP BY 1""",
)
def conntrack_correlate(spark, sf_dir):
    """Scale shape: a raw range join is a nested-loop over every
    (data, ctrl) pair of an AS. Bucketing time into window-sized cells
    turns it into an EQUI join on (as, bucket) — each ctrl row lands in
    its own bucket and the next (a data row within 600s is in one of
    the two) — then the exact range predicate prunes inside the hash
    match. Identical semantics, hash-join physical plan."""
    fl = flows(spark, sf_dir)
    bucket = "unix_micros(CAST(ts AS TIMESTAMP)) DIV 600000000"
    ctrl = (
        fl.filter("port_dst = 443")
        .selectExpr(
            "as_dst AS c_dst",
            "ts AS c_ts",
            f"explode(array({bucket}, {bucket} + 1)) AS cb",
        )
    )
    data_f = fl.filter("port_dst <> 443 AND port_src >= 1024").withColumn(
        "db", F.expr(bucket)
    )
    related = data_f.join(
        ctrl,
        (data_f.as_src == ctrl.c_dst)
        & (data_f.db == ctrl.cb)
        & (ctrl.c_ts <= data_f.ts)
        & (
            F.expr(
                "unix_micros(CAST(ts AS TIMESTAMP)) "
                "- unix_micros(CAST(c_ts AS TIMESTAMP))"
            )
            <= 600 * 1_000_000
        ),
        "left_semi",
    )
    return related.groupBy(F.col("as_src").alias("src_as")).agg(
        F.count(F.lit(1)).alias("related_flows"),
        F.sum("bytes").cast("bigint").alias("bytes"),
    )


# --- COUNT DISTINCT (absent in the reference, SURVEY §2.5) — exact
@register(
    "distinct_hosts_per_proto",
    f"""{FLOWS_DUCK_CTE}
SELECT ip_proto AS proto,
       CAST(COUNT(DISTINCT ip_src) AS BIGINT) AS src_hosts,
       CAST(COUNT(DISTINCT ip_dst) AS BIGINT) AS dst_hosts
FROM flows GROUP BY 1""",
)
def distinct_hosts_per_proto(spark, sf_dir):
    return (
        flows(spark, sf_dir)
        .groupBy(F.col("ip_proto").alias("proto"))
        .agg(
            F.count_distinct("ip_src").alias("src_hosts"),
            F.count_distinct("ip_dst").alias("dst_hosts"),
        )
    )


# --- INTERSECT / EXCEPT (absent in reference, SURVEY §2.8)
@register(
    "set_ops_ports",
    f"""{FLOWS_DUCK_CTE},
tcp_ports AS (SELECT DISTINCT port_dst FROM flows WHERE ip_proto = 6),
udp_ports AS (SELECT DISTINCT port_dst FROM flows WHERE ip_proto = 17)
SELECT 'both' AS bucket, CAST(COUNT(*) AS BIGINT) AS n
  FROM (SELECT * FROM tcp_ports INTERSECT SELECT * FROM udp_ports)
UNION ALL
SELECT 'tcp_only', CAST(COUNT(*) AS BIGINT)
  FROM (SELECT * FROM tcp_ports EXCEPT SELECT * FROM udp_ports)""",
)
def set_ops_ports(spark, sf_dir):
    fl = flows(spark, sf_dir)
    tcp = fl.filter("ip_proto = 6").select("port_dst").distinct()
    udp = fl.filter("ip_proto = 17").select("port_dst").distinct()
    both = tcp.intersect(udp).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("both").alias("bucket"), "n"
    )
    only = tcp.exceptAll(udp).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("tcp_only").alias("bucket"), "n"
    )
    return both.unionByName(only)


# --- GROUPING SETS: the reference runs N plugins with different
#     `aggregate` sets over one stream; Spark computes all channels in
#     ONE pass over the data
@register(
    "grouping_sets_channels",
    f"""{FLOWS_DUCK_CTE}
SELECT COALESCE(CAST(as_src AS VARCHAR), '') AS src_as,
       COALESCE(CAST(ip_proto AS VARCHAR), '') AS proto,
       COALESCE(peer_ip_src, '') AS exporter,
       CAST(SUM(bytes) AS BIGINT) AS bytes,
       CAST(SUM(flows) AS BIGINT) AS flows
FROM flows
GROUP BY GROUPING SETS ((as_src), (ip_proto), (peer_ip_src))""",
)
def grouping_sets_channels(spark, sf_dir):
    fl = flows(spark, sf_dir)
    fl.createOrReplaceTempView("__gs_flows")
    return fl.sparkSession.sql(
        """
SELECT COALESCE(CAST(as_src AS STRING), '') AS src_as,
       COALESCE(CAST(ip_proto AS STRING), '') AS proto,
       COALESCE(peer_ip_src, '') AS exporter,
       CAST(SUM(bytes) AS BIGINT) AS bytes,
       CAST(SUM(flows) AS BIGINT) AS flows
FROM __gs_flows
GROUP BY GROUPING SETS ((as_src), (ip_proto), (peer_ip_src))"""
    )


# --- salted aggregation: the skew-mitigation physical shape must equal
#     the plain groupBy bit-for-bit (sums are associative) — same
#     oracle as a straight aggregation over a deliberately skewed key
@register(
    "salted_skew_agg",
    f"""{FLOWS_DUCK_CTE}
SELECT ip_proto AS proto,
       CAST(SUM(bytes) AS BIGINT) AS bytes,
       CAST(SUM(packets) AS BIGINT) AS packets,
       CAST(MAX(bytes) AS BIGINT) AS max_bytes
FROM flows GROUP BY 1""",
)
def salted_skew_agg(spark, sf_dir):
    from pmacct_spark.operators.salt import salted_agg

    fl = flows(spark, sf_dir).withColumn("proto", F.col("ip_proto"))
    return salted_agg(
        fl,
        ["proto"],
        {
            "bytes": ("sum", "bytes"),
            "packets": ("sum", "packets"),
            "max_bytes": ("max", "bytes"),
        },
        salt_buckets=16,
        salt_on="event_id",
    )
