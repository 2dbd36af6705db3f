"""Gated queries: pmacct aggregation semantics (SURVEY.md §2.5-2.8).

Each query = one PluginConfig compiled by the pipeline, with a DuckDB
oracle reproducing the semantics in ANSI SQL over the same derived flow
view (pmacct_spark.views.flows keeps both dialects in lockstep).
"""

from __future__ import annotations

from pmacct_spark.config import History, PluginConfig, Preprocess
from pmacct_spark.driver_queries import FLOWS_DUCK_CTE, build_aggregation, flows, register
from pmacct_spark.operators.windows import (
    duck_bucket_sql,
    duck_prorate_cte,
    duck_sliding_cte,
)

_H5M = History.parse("5m")
_SUM = "CAST(SUM({c}) AS BIGINT) AS {c}"


def _sums(*cs: str) -> str:
    return ", ".join(_SUM.format(c=c) for c in cs)


# --- canonical "who talks to whom": aggregate: src_host,dst_host
#     (reference QUICKSTART:878; IMT hash agg src/acct.c:29-120)
@register(
    "agg_host_pairs",
    f"""{FLOWS_DUCK_CTE}
SELECT ip_src AS src_host, ip_dst AS dst_host,
       {_sums('bytes', 'packets', 'flows')}
FROM flows GROUP BY 1, 2""",
)
def agg_host_pairs(spark, sf_dir):
    cfg = PluginConfig(aggregate=["src_host", "dst_host"])
    return build_aggregation(flows(spark, sf_dir), cfg)


# --- the tests/100-IPFIXv10-CISCO aggregate set (nfacctd-00.conf:14)
@register(
    "agg_test100_set",
    f"""{FLOWS_DUCK_CTE}
SELECT peer_ip_src AS peer_src_ip, ip_src AS src_host, ip_dst AS dst_host,
       port_src AS src_port, port_dst AS dst_port, iface_in AS in_iface,
       iface_out AS out_iface, ip_proto AS proto, tos,
       {_sums('bytes', 'packets', 'flows')}
FROM flows GROUP BY 1, 2, 3, 4, 5, 6, 7, 8, 9""",
)
def agg_test100_set(spark, sf_dir):
    cfg = PluginConfig(
        aggregate=[
            "peer_src_ip", "src_host", "dst_host", "src_port", "dst_port",
            "in_iface", "out_iface", "proto", "tos",
        ]
    )
    return build_aggregation(flows(spark, sf_dir), cfg)


# --- grand total: `aggregate: none` (CONFIG-KEYS:90-91, FAQS:353)
@register(
    "agg_none_total",
    f"""{FLOWS_DUCK_CTE}
SELECT {_sums('bytes', 'packets', 'flows')} FROM flows""",
)
def agg_none_total(spark, sf_dir):
    return build_aggregation(flows(spark, sf_dir), PluginConfig(aggregate=[]))


# --- sum_host fold: src+dst accounted to one entity
#     (P_sum_host_insert, reference src/plugin_common.c:710-760)
@register(
    "agg_sum_host",
    f"""{FLOWS_DUCK_CTE}
SELECT host, {_sums('bytes', 'packets', 'flows')} FROM (
  SELECT ip_src AS host, bytes, packets, flows FROM flows
  UNION ALL
  SELECT ip_dst AS host, bytes, packets, flows FROM flows
) GROUP BY 1""",
)
def agg_sum_host(spark, sf_dir):
    return build_aggregation(flows(spark, sf_dir), PluginConfig(aggregate=["sum_host"]))


# --- sum_port fold
@register(
    "agg_sum_port",
    f"""{FLOWS_DUCK_CTE}
SELECT port, {_sums('bytes', 'packets', 'flows')} FROM (
  SELECT port_src AS port, bytes, packets, flows FROM flows
  UNION ALL
  SELECT port_dst AS port, bytes, packets, flows FROM flows
) GROUP BY 1""",
)
def agg_sum_port(spark, sf_dir):
    return build_aggregation(flows(spark, sf_dir), PluginConfig(aggregate=["sum_port"]))


# --- tcp_flags bitwise-OR accumulation (src/plugin_common.c:428-429)
@register(
    "agg_tcpflags_bitor",
    f"""{FLOWS_DUCK_CTE}
SELECT ip_src AS src_host, ip_dst AS dst_host,
       CAST(bit_or(tcp_flags) AS INT) AS tcp_flags,
       {_sums('bytes', 'packets', 'flows')}
FROM flows GROUP BY 1, 2""",
)
def agg_tcpflags_bitor(spark, sf_dir):
    cfg = PluginConfig(
        aggregate=["src_host", "dst_host"],
        counters=["tcp_flags", "bytes", "packets", "flows"],
    )
    return build_aggregation(flows(spark, sf_dir), cfg)


# --- 5-minute history buckets (src/plugin_common.c:251-254), flow
#     accounted to its start bucket
@register(
    "hist_5m_proto",
    f"""{FLOWS_DUCK_CTE}
SELECT ip_proto AS proto, {duck_bucket_sql('ts', _H5M)} AS stamp_inserted,
       {_sums('bytes', 'packets', 'flows')}
FROM flows GROUP BY 1, 2""",
)
def hist_5m_proto(spark, sf_dir):
    cfg = PluginConfig(aggregate=["proto"], history="5m")
    return build_aggregation(flows(spark, sf_dir), cfg)


# --- daily buckets with weekly round-off (roundoff_time,
#     src/sql_common.c:242-308)
@register(
    "hist_1d_roundoff_w",
    f"""{FLOWS_DUCK_CTE}
SELECT peer_ip_src AS peer_src_ip,
       {duck_bucket_sql('ts', History.parse('1d'), 'w')} AS stamp_inserted,
       {_sums('bytes', 'packets', 'flows')}
FROM flows GROUP BY 1, 2""",
)
def hist_1d_roundoff_w(spark, sf_dir):
    cfg = PluginConfig(aggregate=["peer_src_ip"], history="1d", history_roundoff="w")
    return build_aggregation(flows(spark, sf_dir), cfg)


# --- sql_history_offset (CONFIG-KEYS:1413, basetime rewind
#     src/plugin_common.c:959-966): hourly buckets with hour round-off
#     shifted back 900 s — boundaries at hh:45 instead of hh:00, so
#     every bucket differs from the round-off-only path by exactly the
#     offset phase
@register(
    "hist_1h_offset",
    f"""{FLOWS_DUCK_CTE}
SELECT ip_proto AS proto,
       {duck_bucket_sql('ts', History.parse('1h'), 'h', 900)}
         AS stamp_inserted,
       {_sums('bytes', 'packets', 'flows')}
FROM flows GROUP BY 1, 2""",
)
def hist_1h_offset(spark, sf_dir):
    cfg = PluginConfig(
        aggregate=["proto"], history="1h", history_roundoff="h",
        history_offset=900,
    )
    return build_aggregation(flows(spark, sf_dir), cfg)


# --- calendar-month buckets (COUNT_MONTHLY, src/pmacct-defines.h:424-429)
@register(
    "hist_month",
    f"""{FLOWS_DUCK_CTE}
SELECT ip_proto AS proto,
       {duck_bucket_sql('ts', History.parse('1M'))} AS stamp_inserted,
       {_sums('bytes', 'packets', 'flows')}
FROM flows GROUP BY 1, 2""",
)
def hist_month(spark, sf_dir):
    cfg = PluginConfig(aggregate=["proto"], history="1M")
    return build_aggregation(flows(spark, sf_dir), cfg)


# --- pro-rating: counters split across spanned buckets proportional to
#     overlap (src/plugin_common.c:256-271,460-463)
_PRORATE_INNER = duck_prorate_cte(
    _H5M,
    ["bytes", "packets", "flows"],
    key_exprs="ip_proto",
)
@register(
    "hist_5m_prorate",
    f"""{FLOWS_DUCK_CTE}
SELECT ip_proto AS proto, stamp_inserted,
       {_sums('bytes', 'packets', 'flows')}
FROM ({_PRORATE_INNER}) GROUP BY 1, 2""",
)
def hist_5m_prorate(spark, sf_dir):
    cfg = PluginConfig(aggregate=["proto"], history="5m", pro_rating=True)
    return build_aggregation(flows(spark, sf_dir), cfg)


# --- calendar-month pro-rating (sql_history: 1M + acct_v_..., reference
#     src/plugin_common.c:256-271 bucket loop over COUNT_MONTHLY months,
#     month round-off src/sql_common.c:289). Buckets have no fixed
#     width: each spanned month weighs by its exact epoch-us length
#     (28/29/30/31 days). The test corpus is single-month, so the query
#     stretches every flow to 20 days — late-January flows then split
#     across the Jan/Feb boundary and the weights discriminate.
_PRORATE_MONTH_INNER = duck_prorate_cte(
    History.parse("1M"),
    ["bytes", "packets", "flows"],
    key_exprs="ip_proto",
    source="(SELECT * REPLACE (ts + INTERVAL 20 DAY AS end_ts) FROM flows)",
)
@register(
    "hist_month_prorate",
    f"""{FLOWS_DUCK_CTE}
SELECT ip_proto AS proto, stamp_inserted,
       {_sums('bytes', 'packets', 'flows')}
FROM ({_PRORATE_MONTH_INNER}) GROUP BY 1, 2""",
)
def hist_month_prorate(spark, sf_dir):
    from pyspark.sql import functions as F

    cfg = PluginConfig(aggregate=["proto"], history="1M", pro_rating=True)
    df = flows(spark, sf_dir).withColumn(
        "end_ts", F.expr("CAST(ts + INTERVAL 20 DAYS AS TIMESTAMP_NTZ)")
    )
    return build_aggregation(df, cfg)


# --- stitching: timestamp_min/timestamp_max per group
#     (pkt_stitching, src/network.h:543-546)
@register(
    "agg_stitching",
    f"""{FLOWS_DUCK_CTE}
SELECT peer_ip_src AS peer_src_ip, ip_proto AS proto,
       {_sums('bytes', 'packets', 'flows')},
       MIN(ts) AS timestamp_min, MAX(end_ts) AS timestamp_max
FROM flows GROUP BY 1, 2""",
)
def agg_stitching(spark, sf_dir):
    cfg = PluginConfig(aggregate=["peer_src_ip", "proto"], stitching=True)
    return build_aggregation(flows(spark, sf_dir), cfg)


# --- renormalization: counters *= sampling_rate pre-agg
#     (src/pkt_handlers.c:1175-1213)
@register(
    "agg_renormalize",
    f"""{FLOWS_DUCK_CTE}
SELECT peer_ip_src AS peer_src_ip,
       CAST(SUM(CASE WHEN sampling_rate > 1 THEN bytes * sampling_rate ELSE bytes END) AS BIGINT) AS bytes,
       CAST(SUM(CASE WHEN sampling_rate > 1 THEN packets * sampling_rate ELSE packets END) AS BIGINT) AS packets,
       CAST(SUM(flows) AS BIGINT) AS flows
FROM flows GROUP BY 1""",
)
def agg_renormalize(spark, sf_dir):
    cfg = PluginConfig(aggregate=["peer_src_ip"], renormalize=True)
    return build_aggregation(flows(spark, sf_dir), cfg)


# --- preprocess checks == HAVING (src/preprocess.c:92-131)
@register(
    "preprocess_having",
    f"""{FLOWS_DUCK_CTE}
SELECT port_dst AS dst_port, {_sums('bytes', 'packets', 'flows')}
FROM flows GROUP BY 1
HAVING CAST(SUM(bytes) AS BIGINT) >= 1000
   AND (CAST(SUM(bytes) AS BIGINT) // CAST(SUM(packets) AS BIGINT)) >= 99""",
)
def preprocess_having(spark, sf_dir):
    # minbpp=99 sits at the group median, so the check discriminates at
    # every scale factor (bpp is scale-invariant; raw byte floors are not)
    cfg = PluginConfig(
        aggregate=["dst_port"],
        preprocess=Preprocess(minb=1000, minbpp=99),
    )
    return build_aggregation(flows(spark, sf_dir), cfg)


# --- preprocess actions: usrf renormalize + adjb (src/preprocess.h:47-49)
@register(
    "preprocess_actions",
    f"""{FLOWS_DUCK_CTE}
SELECT proto, CAST(bytes * 2 + 28 AS BIGINT) AS bytes,
       CAST(packets * 2 AS BIGINT) AS packets, flows
FROM (
  SELECT ip_proto AS proto, {_sums('bytes', 'packets', 'flows')}
  FROM flows GROUP BY 1
)""",
)
def preprocess_actions(spark, sf_dir):
    cfg = PluginConfig(
        aggregate=["proto"], preprocess=Preprocess(usrf=2, adjb=28)
    )
    return build_aggregation(flows(spark, sf_dir), cfg)


# --- client top-N: -T bytes,10 (client_counters_merge_sort,
#     src/pmacct.c:3152); deterministic tie-break on the key
@register(
    "topn_bytes",
    f"""{FLOWS_DUCK_CTE}
SELECT ip_src AS src_host, ip_dst AS dst_host,
       {_sums('bytes', 'packets', 'flows')}
FROM flows GROUP BY 1, 2
ORDER BY bytes DESC, src_host ASC, dst_host ASC LIMIT 10""",
)
def topn_bytes(spark, sf_dir):
    cfg = PluginConfig(aggregate=["src_host", "dst_host"], topn=("bytes", 10))
    return build_aggregation(flows(spark, sf_dir), cfg)


# --- union of exporters then per-exporter accounting ("-S" accumulate
#     across matches, src/server.c:386-432): filter OR-list + global agg
@register(
    "client_sum_matches",
    f"""{FLOWS_DUCK_CTE}
SELECT {_sums('bytes', 'packets', 'flows')}
FROM flows WHERE peer_ip_src IN ('192.0.2.0', '192.0.2.3')""",
)
def client_sum_matches(spark, sf_dir):
    cfg = PluginConfig(
        aggregate=[],
        aggregate_filter="peer_ip_src IN ('192.0.2.0', '192.0.2.3')",
    )
    return build_aggregation(flows(spark, sf_dir), cfg)


# --- aggregate_filter: per-plugin BPF-style predicate
#     (src/plugin_hooks.c:449,800-807)
@register(
    "aggregate_filter_tcp443",
    f"""{FLOWS_DUCK_CTE}
SELECT ip_src AS src_host, {_sums('bytes', 'packets', 'flows')}
FROM flows WHERE ip_proto = 6 AND (port_src = 443 OR port_dst = 443)
GROUP BY 1""",
)
def aggregate_filter_tcp443(spark, sf_dir):
    cfg = PluginConfig(
        aggregate=["src_host"],
        aggregate_filter="ip_proto = 6 AND (port_src = 443 OR port_dst = 443)",
    )
    return build_aggregation(flows(spark, sf_dir), cfg)


# --- multi-window insertion WITHOUT pro-rating: the flow lands whole in
#     every bucket it spans (reference src/plugin_common.c:460-463)
_MULTIWIN_INNER = duck_prorate_cte(
    History.parse("5m"), [], "ip_proto", ts_expr="ts", end_expr="end_ts"
)

@register(
    "hist_5m_multiwindow",
    f"""{FLOWS_DUCK_CTE}
SELECT ip_proto AS proto, stamp_inserted,
       {_sums('bytes', 'packets', 'flows')}
FROM ({_MULTIWIN_INNER.replace("SELECT ip_proto", "SELECT ip_proto, bytes, packets, flows")}) GROUP BY 1, 2""",
)
def hist_5m_multiwindow(spark, sf_dir):
    cfg = PluginConfig(aggregate=["proto"], history="5m", multi_window=True)
    return build_aggregation(flows(spark, sf_dir), cfg)


# --- the extended primitive vocabulary end-to-end: L2 (vlan/cos/etype),
#     sampling_direction, VRF + iface names (CONFIG-KEYS:56-74 tokens
#     beyond the classic 5-tuple; columns derived in views/flows.py)
@register(
    "agg_extended_primitives",
    f"""{FLOWS_DUCK_CTE}
SELECT vlan, cos, etype, sampling_direction, vrf_name, in_iface_name,
       {_sums('bytes', 'packets', 'flows')}
FROM flows GROUP BY 1, 2, 3, 4, 5, 6""",
)
def agg_extended_primitives(spark, sf_dir):
    cfg = PluginConfig(
        aggregate=[
            "vlan", "cos", "etype", "sampling_direction",
            "vrf_name", "in_iface_name",
        ]
    )
    return build_aggregation(flows(spark, sf_dir), cfg)


# --- tunnel / outer-header primitives (struct pkt_tunnel_primitives,
#     reference src/network.h:642-660): VXLAN & NVGRE encapsulated
#     traffic keyed by outer endpoints + VNI/TNI
@register(
    "agg_tunnel_outer",
    f"""{FLOWS_DUCK_CTE}
SELECT tunnel_src_host, tunnel_dst_host, tunnel_proto, vxlan, nvgre,
       {_sums('bytes', 'packets', 'flows')}
FROM flows WHERE tunnel_proto <> 0
GROUP BY 1, 2, 3, 4, 5""",
)
def agg_tunnel_outer(spark, sf_dir):
    cfg = PluginConfig(
        aggregate=[
            "tunnel_src_host", "tunnel_dst_host", "tunnel_proto",
            "vxlan", "nvgre",
        ],
        aggregate_filter="tunnel_proto <> 0",
    )
    return build_aggregation(flows(spark, sf_dir), cfg)


# --- NAT / firewall event primitives (struct pkt_nat_primitives,
#     src/network.h:620-632): NEL-style accounting of translated flows
@register(
    "agg_nat_events",
    f"""{FLOWS_DUCK_CTE}
SELECT nat_event, fw_event, post_nat_ip_src AS post_nat_src_host,
       post_nat_port_src AS post_nat_src_port,
       {_sums('bytes', 'packets', 'flows')}
FROM flows WHERE nat_event <> 0
GROUP BY 1, 2, 3, 4""",
)
def agg_nat_events(spark, sf_dir):
    cfg = PluginConfig(
        aggregate=[
            "nat_event", "fw_event", "post_nat_src_host", "post_nat_src_port",
        ],
        aggregate_filter="nat_event <> 0",
    )
    return build_aggregation(flows(spark, sf_dir), cfg)


# --- MPLS + timestamp keys: label stack, PW id, path-delay stats and
#     the four timestamp primitives as grouping keys (timestamp_start /
#     arrival rounded off to the minute bucket for a bounded key space)
@register(
    "agg_mpls_path_delay",
    f"""{FLOWS_DUCK_CTE}
SELECT mpls_label_stack, mpls_pw_id,
       CAST(MIN(path_delay_min_usec) AS BIGINT) AS path_delay_min_usec,
       CAST(MAX(path_delay_max_usec) AS BIGINT) AS path_delay_max_usec,
       {_sums('bytes', 'packets', 'flows')}
FROM flows WHERE mpls_label_top % 100 = 16
GROUP BY 1, 2""",
)
def agg_mpls_path_delay(spark, sf_dir):
    from pyspark.sql import functions as F

    f = flows(spark, sf_dir).filter("mpls_label_top % 100 = 16")
    return f.groupBy("mpls_label_stack", "mpls_pw_id").agg(
        F.min("path_delay_min_usec").cast("bigint").alias("path_delay_min_usec"),
        F.max("path_delay_max_usec").cast("bigint").alias("path_delay_max_usec"),
        F.sum("bytes").cast("bigint").alias("bytes"),
        F.sum("packets").cast("bigint").alias("packets"),
        F.sum("flows").cast("bigint").alias("flows"),
    )


# --- arrival-time accounting (nfacctd_time_new: bucket by the
#     collector clock instead of the flow's own timestamps;
#     tests/100-IPFIXv10-CISCO/nfacctd-00.conf:26)
@register(
    "hist_arrival_time",
    f"""{FLOWS_DUCK_CTE}
SELECT ip_proto AS proto,
       {duck_bucket_sql('timestamp_arrival', _H5M)} AS stamp_inserted,
       {_sums('bytes', 'packets', 'flows')}
FROM flows GROUP BY 1, 2""",
)
def hist_arrival_time(spark, sf_dir):
    from pyspark.sql import functions as F

    from pmacct_spark.operators.windows import bucket_expr

    f = flows(spark, sf_dir)
    return (
        f.withColumn("stamp_inserted", bucket_expr("timestamp_arrival", _H5M))
        .groupBy(F.col("ip_proto").alias("proto"), "stamp_inserted")
        .agg(
            F.sum("bytes").cast("bigint").alias("bytes"),
            F.sum("packets").cast("bigint").alias("packets"),
            F.sum("flows").cast("bigint").alias("flows"),
        )
    )


# --- timestamps_secs + timestamps_since_epoch: stitching min/max
#     truncated to second resolution and rendered as epoch integers
#     (CONFIG-KEYS:1690 timestamps_secs; -I/timestamps_since_epoch
#     presentation, reference src/pmacct.c usage)
@register(
    "agg_stitching_secs",
    f"""{FLOWS_DUCK_CTE}
SELECT ip_proto AS proto,
       CAST(MIN(epoch_us(date_trunc('second', ts)) // 1000000) AS BIGINT)
         AS timestamp_min_epoch,
       CAST(MAX(epoch_us(date_trunc('second', end_ts)) // 1000000) AS BIGINT)
         AS timestamp_max_epoch,
       {_sums('bytes', 'packets', 'flows')}
FROM flows GROUP BY 1""",
)
def agg_stitching_secs(spark, sf_dir):
    from pyspark.sql import functions as F

    cfg = PluginConfig(aggregate=["proto"], stitching=True, timestamps_secs=True)
    out = build_aggregation(flows(spark, sf_dir), cfg)
    return out.select(
        "proto",
        F.expr(
            "unix_micros(CAST(timestamp_min AS TIMESTAMP)) DIV 1000000"
        ).alias("timestamp_min_epoch"),
        F.expr(
            "unix_micros(CAST(timestamp_max AS TIMESTAMP)) DIV 1000000"
        ).alias("timestamp_max_epoch"),
        "bytes", "packets", "flows",
    )


# --- sliding (hopping) windows — beyond the reference (§2.6 lists
#     "sliding windows: none"): 10-minute windows every 5 minutes over
#     the events stream; explicit k-offset explode so batch, streaming,
#     and the oracle share one definition
@register(
    "hist_sliding_10m_5m",
    f"""
SELECT window_start, event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS value_c
FROM ({duck_sliding_cte(600, 300, source='events')})
GROUP BY 1, 2""",
)
def hist_sliding_10m_5m(spark, sf_dir):
    from pyspark.sql import functions as F

    from pmacct_spark.operators.windows import sliding_buckets
    from pmacct_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("ts", "event_type", "value")
    return (
        sliding_buckets(ev, 600, 300)
        .groupBy("window_start", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias("value_c"),
        )
    )


# --- median / exact percentile aggregate — beyond the reference (no
#     percentiles anywhere in pmacct). Doubled-median trick keeps the
#     result integer-exact across engines (interpolated halves become
#     whole numbers).
@register(
    "median_bytes_by_proto",
    f"""{FLOWS_DUCK_CTE}
SELECT ip_proto AS proto,
       CAST(2 * median(bytes) AS BIGINT) AS bytes_med2x,
       CAST(2 * median(packets) AS BIGINT) AS packets_med2x,
       COUNT(*) AS n
FROM flows GROUP BY 1""",
)
def median_bytes_by_proto(spark, sf_dir):
    from pyspark.sql import functions as F

    f = flows(spark, sf_dir)
    return f.groupBy(F.col("ip_proto").alias("proto")).agg(
        F.expr("CAST(2 * percentile(bytes, 0.5) AS BIGINT)").alias("bytes_med2x"),
        F.expr("CAST(2 * percentile(packets, 0.5) AS BIGINT)").alias("packets_med2x"),
        F.count(F.lit(1)).alias("n"),
    )


# --- count-min sketch heavy hitters (Cormode & Muthukrishnan 2005):
#     the bounded-memory top-talkers answer — a constant d x w counter
#     grid with the one-sided estimate >= truth guarantee, hash rows
#     drawn from the frozen universal family so the sketch replays
#     exactly in the oracle. The batch query reports exact truth beside
#     each estimate; in a streaming deployment the sketch updates
#     map-side with d*w state (sums commute) — see operators/sketch.py.
from pmacct_spark.operators import sketch as _sketch


@register(
    "heavy_hitters_countmin",
    _sketch.countmin_heavy_hitters_duck(FLOWS_DUCK_CTE),
)
def heavy_hitters_countmin(spark, sf_dir):
    return _sketch.countmin_heavy_hitters(flows(spark, sf_dir))


# --- HyperLogLog distinct sources per protocol: the bounded-memory
#     answer to "how many unique talkers" at 100 TB (256 registers per
#     group, max-mergeable map-side), with registers drawn from the
#     frozen portable hash family so the DuckDB oracle replays every
#     register and the estimate EXACTLY — see operators/sketch.py.
@register(
    "approx_distinct_hll",
    _sketch.hll_distinct_duck(FLOWS_DUCK_CTE),
)
def approx_distinct_hll(spark, sf_dir):
    return _sketch.hll_distinct(flows(spark, sf_dir))


# --- HLL set operations: per-pair |A ∪ B| by register MAX-MERGE and
#     |A ∩ B| by inclusion-exclusion. The merge is the query's point —
#     per-shard/per-day sketches roll up at 100 TB as constant-size
#     register tables without rescanning raw data; everything past the
#     scan is bounded by groups x m rows.
#     ip_dst (not ip_src) as the value: destinations OVERLAP across
#     protocols in the fixture, so exact_intersect is non-zero and the
#     inclusion-exclusion path is value-checked, not just exercised.
@register(
    "approx_distinct_hll_setops",
    _sketch.hll_setops_duck(FLOWS_DUCK_CTE, value_col="ip_dst"),
)
def approx_distinct_hll_setops(spark, sf_dir):
    return _sketch.hll_setops(flows(spark, sf_dir), value_col="ip_dst")


# --- HDR-histogram byte-size percentiles per protocol: the
#     bounded-memory quantile answer (<= 64*32 integer counters per
#     group, add-mergeable map-side, <= 3.1% relative error by
#     construction) with deterministic log-bucketing, so the oracle
#     replays every counter and estimate — percentile_approx's sketch
#     is implementation-defined and could never hash-match.
@register(
    "hdr_quantiles_bytes",
    _sketch.hdr_quantiles_duck(FLOWS_DUCK_CTE),
)
def hdr_quantiles_bytes(spark, sf_dir):
    return _sketch.hdr_quantiles(flows(spark, sf_dir))
