"""Gated queries: enrichment joins (SURVEY.md §2.4) — LPM networks_file,
GeoIP range join, pretag rules engine, sampling_map renormalization,
allowlist dictionaries, per-exporter seqno monitoring.

Oracles reproduce each join in ANSI SQL over the same dual-rendered
dimension views (views.dims)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pmacct_spark.config import PluginConfig
from pmacct_spark.driver_queries import FLOWS_DUCK_CTE, build_aggregation, flows, register
from pmacct_spark.operators.dicts import apply_allowlist, seqno_monitor
from pmacct_spark.operators.lpm import lpm_join, lpm_join_range, range_join
from pmacct_spark.operators.pretag import Rule, apply_pretag, duck_case_sql
from pmacct_spark.views.flows import flows_sql
from pmacct_spark.views.dims import (
    BGP_RIB_DUCK,
    FLOW_TO_RD_DUCK,
    ROA_DUCK,
    GEOIP_DUCK,
    NETWORKS6_DUCK,
    NETWORKS_DUCK,
    SAMPLING_MAP_DUCK,
    bgp_rib_dim,
    geoip_dim,
    networks6_dim,
    roa_dim,
    networks_dim,
    sampling_map_dim,
)

_SUM = ", ".join(
    f"CAST(SUM({c}) AS BIGINT) AS {c}" for c in ("bytes", "packets", "flows")
)

# DuckDB LPM: candidates = prefix matches per masklen; winner = arg_max
# by masklen; NULL-safe via LEFT JOIN.
_DUCK_LPM = f"""
WITH flows AS ({flows_sql('duck')}),
networks AS ({NETWORKS_DUCK}),
matched AS (
  SELECT f.event_id, f.ip_src_i, f.bytes, f.packets, f.flows,
         arg_max(n.asn, n.masklen) AS src_as_lpm,
         arg_max(n.masklen, n.masklen) AS src_mask
  FROM flows f LEFT JOIN networks n
    ON (f.ip_src_i // (CAST(1 AS BIGINT) << (32 - n.masklen)))
     = (n.net_int // (CAST(1 AS BIGINT) << (32 - n.masklen)))
  GROUP BY 1, 2, 3, 4, 5
)
SELECT src_as_lpm, src_mask, {_SUM}
FROM matched GROUP BY 1, 2
"""


@register("lpm_networks_src_as", _DUCK_LPM)
def lpm_networks_src_as(spark, sf_dir):
    """networks_file LPM fill of src_as/src_mask then aggregate
    (reference src/net_aggr.c:455-490) — chained-broadcast strategy."""
    f = flows(spark, sf_dir)
    nets = networks_dim(spark, sf_dir)
    enriched = lpm_join(
        f, nets, "ip_src_i", {"asn": "src_as_lpm", "masklen": "src_mask"}
    )
    return (
        enriched.groupBy("src_as_lpm", "src_mask")
        .agg(
            F.sum("bytes").alias("bytes"),
            F.sum("packets").alias("packets"),
            F.sum("flows").alias("flows"),
        )
    )


@register("lpm_range_strategy", _DUCK_LPM)
def lpm_range_strategy(spark, sf_dir):
    """Same LPM semantics via the range-join + max_by physical strategy —
    both plans must agree with the one oracle."""
    f = flows(spark, sf_dir).select(
        "event_id", "ip_src_i", "bytes", "packets", "flows"
    )
    nets = networks_dim(spark, sf_dir)
    enriched = lpm_join_range(
        f, nets, "ip_src_i", {"asn": "src_as_lpm", "masklen": "src_mask"}, "event_id"
    )
    return enriched.groupBy("src_as_lpm", "src_mask").agg(
        F.sum("bytes").alias("bytes"),
        F.sum("packets").alias("packets"),
        F.sum("flows").alias("flows"),
    )


@register(
    "geoip_country",
    f"""{FLOWS_DUCK_CTE},
geoip AS ({GEOIP_DUCK})
SELECT g.country AS country_ip_src, {_SUM}
FROM flows f LEFT JOIN geoip g
  ON f.ip_src_i BETWEEN g.range_start AND g.range_end
GROUP BY 1""",
)
def geoip_country(spark, sf_dir):
    """GeoIP enrichment: broadcast range join on [start, end]
    (reference src/pkt_handlers.c:749-772)."""
    f = flows(spark, sf_dir)
    geo = geoip_dim(spark, sf_dir)
    enriched = range_join(f, geo, "ip_src_i", {"country": "country_ip_src"})
    return enriched.groupBy("country_ip_src").agg(
        F.sum("bytes").alias("bytes"),
        F.sum("packets").alias("packets"),
        F.sum("flows").alias("flows"),
    )


# --- pretag rules engine: ordered first-match + jeq/stack composition
_RULES = [
    Rule(match={"peer_ip_src": "192.0.2.0"}, set_tag=100, jeq="eval_ifaces"),
    Rule(match={"peer_ip_src": "192.0.2.1"}, set_tag=200),
    Rule(match={"as_src": ("in", [64500, 64501, 64502])}, set_tag=300),
    Rule(label="eval_ifaces", match={"iface_in": 0}, set_tag=1, stack="sum"),
    Rule(match={"iface_in": ("in", [1, 2])}, set_tag=2, stack="sum"),
]

_TAG_CASE = duck_case_sql(_RULES, "set_tag")


@register(
    "pretag_rules",
    f"""{FLOWS_DUCK_CTE}
SELECT tag, {_SUM} FROM (
  SELECT {_TAG_CASE} AS tag, bytes, packets, flows FROM flows
) GROUP BY 1""",
)
def pretag_rules(spark, sf_dir):
    """pre_tag_map with a jeq chain and sum-stack composition
    (reference src/pretag.c:1117, src/pretag.h:224-243)."""
    f = apply_pretag(flows(spark, sf_dir), _RULES)
    return f.groupBy("tag").agg(
        F.sum("bytes").alias("bytes"),
        F.sum("packets").alias("packets"),
        F.sum("flows").alias("flows"),
    )


@register(
    "pretag_filter_routing",
    f"""{FLOWS_DUCK_CTE}
SELECT tag, peer_ip_src AS peer_src_ip, {_SUM} FROM (
  SELECT {_TAG_CASE} AS tag, peer_ip_src, bytes, packets, flows FROM flows
) WHERE tag IN (100, 101, 102, 200)
GROUP BY 1, 2""",
)
def pretag_filter_routing(spark, sf_dir):
    """pre_tag_filter: route tagged records into a channel
    (reference src/plugin_hooks.c:440-460)."""
    f = apply_pretag(flows(spark, sf_dir), _RULES)
    cfg = PluginConfig(
        aggregate=["tag", "peer_src_ip"],
        pre_tag_filter=[100, 101, 102, 200],
    )
    return build_aggregation(f, cfg)


@register(
    "ports_dictionary",
    f"""{FLOWS_DUCK_CTE}
SELECT CASE WHEN port_src IN (53, 80, 443) THEN port_src ELSE 0 END AS src_port,
       CASE WHEN port_dst IN (53, 80, 443) THEN port_dst ELSE 0 END AS dst_port,
       {_SUM}
FROM flows GROUP BY 1, 2""",
)
def ports_dictionary(spark, sf_dir):
    """ports_file allowlist: ports outside the list are zeroed, records
    kept (reference src/plugin_common.c:1419)."""
    f = flows(spark, sf_dir)
    f = apply_allowlist(f, "port_src", [53, 80, 443])
    f = apply_allowlist(f, "port_dst", [53, 80, 443])
    return build_aggregation(f, PluginConfig(aggregate=["src_port", "dst_port"]))


# --- networks_file behavior knobs (CONFIG-KEYS:1062-1103; semantics
# src/net_aggr.c:455-490,558,762,975-1035): networks_file_no_lpm,
# networks_no_mask_if_zero, networks_mask. The fixture slice keeps only
# the /24s + default route so unmatched flows exist; a derived export
# mask {0, 28, 8} exercises every merge branch.
_EXPORT_MASK = "CASE event_id % 3 WHEN 0 THEN 0 WHEN 1 THEN 28 ELSE 8 END"


def _knobs_exprs(div_op: str) -> dict[str, str]:
    from pmacct_spark.operators.lpm import net_addr_sql, net_mask_merge_sql

    mask_default = net_mask_merge_sql("export_mask", "file_mask")
    mask_no_lpm = net_mask_merge_sql("export_mask", "file_mask", no_lpm=True)
    return {
        "mask_default": mask_default,
        "mask_no_lpm": mask_no_lpm,
        # nets masked by the default-mode nmask: zero masks collapse
        # to 0 unless networks_no_mask_if_zero keeps the host address
        "net_zeroed": net_addr_sql("ip_src_i", mask_default, div_op=div_op),
        "net_kept": net_addr_sql(
            "ip_src_i", mask_default, no_mask_if_zero=True, div_op=div_op
        ),
        # networks_mask: 22 — static mask applied systematically
        # (src/net_aggr.c:558 mask_static_src_ipaddr)
        "net_static": net_addr_sql("ip_src_i", "22", div_op=div_op),
    }


_KNOBS_DUCK_EXPRS = _knobs_exprs("//")

_DUCK_KNOBS = f"""
WITH flows AS ({flows_sql('duck')}),
networks AS (SELECT * FROM ({NETWORKS_DUCK}) WHERE masklen IN (0, 24)),
matched AS (
  SELECT f.event_id, f.ip_src_i, f.bytes,
         {_EXPORT_MASK} AS export_mask,
         COALESCE(arg_max(n.masklen, n.masklen), 0) AS file_mask
  FROM flows f LEFT JOIN networks n
    ON (f.ip_src_i // (CAST(1 AS BIGINT) << (32 - n.masklen)))
     = (n.net_int // (CAST(1 AS BIGINT) << (32 - n.masklen)))
  GROUP BY 1, 2, 3, 4
),
derived AS (
  SELECT bytes,
         {_KNOBS_DUCK_EXPRS['mask_default']} AS mask_default,
         {_KNOBS_DUCK_EXPRS['mask_no_lpm']} AS mask_no_lpm,
         {_KNOBS_DUCK_EXPRS['net_zeroed']} AS net_zeroed,
         {_KNOBS_DUCK_EXPRS['net_kept']} AS net_kept,
         {_KNOBS_DUCK_EXPRS['net_static']} AS net_static
  FROM matched
)
SELECT mask_default, mask_no_lpm,
       CAST(SUM(bytes) AS BIGINT) AS bytes,
       COUNT(DISTINCT net_zeroed) AS nets_zeroed,
       COUNT(DISTINCT net_kept) AS nets_kept,
       COUNT(DISTINCT net_static) AS nets_static
FROM derived GROUP BY 1, 2
"""


@register("lpm_networks_knobs", _DUCK_KNOBS)
def lpm_networks_knobs(spark, sf_dir):
    """networks_file behavior knobs, all three in one gated query:

    - networks_file_no_lpm: a file match wins over the export's mask
      whenever it matched, not only when longer — mask_no_lpm differs
      from mask_default exactly on (export 28, file 24) rows;
    - networks_no_mask_if_zero: zero-mask rows keep the host address
      (nets_kept) instead of collapsing to net 0 (nets_zeroed);
    - networks_mask: the static /22 mask applied systematically.

    Reference: CONFIG-KEYS:1062-1103, src/net_aggr.c:558,762,975-1035.
    Chained-broadcast LPM; everything after the probe is map-side."""
    f = flows(spark, sf_dir).select("event_id", "ip_src_i", "bytes")
    f = f.withColumn("export_mask", F.expr(_EXPORT_MASK))
    nets = networks_dim(spark, sf_dir).filter("masklen IN (0, 24)")
    enriched = lpm_join(
        f, nets, "ip_src_i", {"masklen": "file_mask"},
        default={"file_mask": 0},
    )
    ex = _knobs_exprs("DIV")
    derived = enriched.select(
        "bytes",
        *[F.expr(sql).alias(name) for name, sql in ex.items()],
    )
    return derived.groupBy("mask_default", "mask_no_lpm").agg(
        F.sum("bytes").alias("bytes"),
        F.countDistinct("net_zeroed").alias("nets_zeroed"),
        F.countDistinct("net_kept").alias("nets_kept"),
        F.countDistinct("net_static").alias("nets_static"),
    )


@register(
    "protos_dictionary",
    f"""{FLOWS_DUCK_CTE}
SELECT CASE WHEN ip_proto IN (1, 6) THEN ip_proto ELSE 255 END AS proto,
       {_SUM}
FROM flows GROUP BY 1""",
)
def protos_dictionary(spark, sf_dir):
    """protos_file: IP protocols outside the list bucket as 255
    ('others') — an aggregator, not a filter (reference
    src/plugin_common.c:1328 load_protos; the fixture's udp(17)
    traffic collapses into the others group while icmp/tcp survive)."""
    from pmacct_spark.operators.dicts import apply_bucket_others

    f = flows(spark, sf_dir)
    f = apply_bucket_others(f, "ip_proto", [1, 6])
    return build_aggregation(f, PluginConfig(aggregate=["proto"]))


@register(
    "tos_dictionary",
    f"""{FLOWS_DUCK_CTE}
SELECT CASE WHEN tos IN (0, 32) THEN tos ELSE 255 END AS tos,
       {_SUM}
FROM flows GROUP BY 1""",
)
def tos_dictionary(spark, sf_dir):
    """tos_file: ToS values outside the list bucket as 255 ('others')
    (reference src/plugin_common.c:1481 load_tos = load_protos on the
    same table; fixture tos values {{0,32,64,96}} -> 64/96 collapse)."""
    from pmacct_spark.operators.dicts import apply_bucket_others

    f = flows(spark, sf_dir)
    f = apply_bucket_others(f, "tos", [0, 32])
    return build_aggregation(f, PluginConfig(aggregate=["tos"]))


@register(
    "sampling_map_renorm",
    f"""{FLOWS_DUCK_CTE},
smap AS ({SAMPLING_MAP_DUCK})
SELECT f.peer_ip_src AS peer_src_ip,
       CAST(SUM(f.bytes * COALESCE(s.map_rate, 1)) AS BIGINT) AS bytes,
       CAST(SUM(f.packets * COALESCE(s.map_rate, 1)) AS BIGINT) AS packets,
       CAST(SUM(f.flows) AS BIGINT) AS flows
FROM flows f LEFT JOIN smap s ON f.peer_ip_src = s.peer_ip
GROUP BY 1""",
)
def sampling_map_renorm(spark, sf_dir):
    """sampling_map: per-exporter rate overrides protocol-reported rate,
    counters renormalized (reference src/pretag.c:43-47,284-290)."""
    f = flows(spark, sf_dir)
    smap = sampling_map_dim(spark, sf_dir)
    enriched = f.join(F.broadcast(smap), f.peer_ip_src == smap.peer_ip, "left")
    return (
        enriched.withColumn("rate", F.coalesce(F.col("map_rate"), F.lit(1)))
        .groupBy(F.col("peer_ip_src").alias("peer_src_ip"))
        .agg(
            F.sum(F.col("bytes") * F.col("rate")).alias("bytes"),
            F.sum(F.col("packets") * F.col("rate")).alias("packets"),
            F.sum("flows").alias("flows"),
        )
    )


@register(
    "seqno_monitoring",
    f"""{FLOWS_DUCK_CTE}
SELECT peer_ip_src AS exporter,
       CAST(MIN(export_proto_seqno) AS BIGINT) AS seqno_min,
       CAST(MAX(export_proto_seqno) AS BIGINT) AS seqno_max,
       COUNT(*) AS received,
       CAST(MAX(export_proto_seqno) - MIN(export_proto_seqno) + 1 - COUNT(*) AS BIGINT) AS lost
FROM flows GROUP BY 1""",
)
def seqno_monitoring(spark, sf_dir):
    """Per-exporter seqno gap detection (reference
    src/xflow_status.c:90-130)."""
    return seqno_monitor(flows(spark, sf_dir))


# --- flow_to_rd map: (exporter, input ifindex) -> MPLS VPN RD
#     (CONFIG-KEYS flow_to_rd_map; handlers src/pretag_handlers.c) —
#     a broadcast equi join on two keys
@register(
    "flow_to_rd_map",
    f"""{FLOWS_DUCK_CTE},
rd AS ({FLOW_TO_RD_DUCK})
SELECT rd.mpls_vpn_rd, {_SUM}
FROM flows f JOIN rd
  ON f.peer_ip_src = rd.peer_ip AND f.iface_in = rd.iface
GROUP BY 1""",
)
def flow_to_rd_map(spark, sf_dir):
    from pmacct_spark.views.dims import flow_to_rd_dim

    fl = flows(spark, sf_dir)
    rd = flow_to_rd_dim(spark, sf_dir)
    return (
        fl.join(
            F.broadcast(rd),
            (fl.peer_ip_src == rd.peer_ip) & (fl.iface_in == rd.iface),
        )
        .groupBy("mpls_vpn_rd")
        .agg(
            F.sum("bytes").cast("bigint").alias("bytes"),
            F.sum("packets").cast("bigint").alias("packets"),
            F.sum("flows").cast("bigint").alias("flows"),
        )
    )


# --- as-of join: a time-versioned sampling map (the map reloads
#     mid-month with new rates; each flow renormalizes by the rate
#     valid at its OWN event time — reference live map reload,
#     src/plugin_common.c:56; time-versioned RIB semantics SURVEY §2.4)
_ASOF_DIM_DUCK = """
SELECT '192.0.2.' || CAST(r_regionkey AS VARCHAR) AS peer_ip,
       TIMESTAMP '2024-01-01 00:00:00' AS valid_from,
       CAST(CASE r_regionkey % 3 WHEN 0 THEN 1000 WHEN 1 THEN 512 ELSE 64 END AS BIGINT) AS rate
FROM region
UNION ALL
SELECT '192.0.2.' || CAST(r_regionkey AS VARCHAR),
       TIMESTAMP '2024-01-15 00:00:00',
       CAST(CASE r_regionkey % 3 WHEN 0 THEN 2000 WHEN 1 THEN 256 ELSE 32 END AS BIGINT)
FROM region
"""


@register(
    "as_of_sampling_rate",
    f"""{FLOWS_DUCK_CTE},
dim AS ({_ASOF_DIM_DUCK}),
picked AS (
  SELECT f.event_id, f.peer_ip_src, f.bytes,
         arg_max(d.rate, d.valid_from) AS rate
  FROM flows f JOIN dim d
    ON f.peer_ip_src = d.peer_ip AND d.valid_from <= f.ts
  GROUP BY 1, 2, 3
)
SELECT peer_ip_src AS exporter, CAST(rate AS BIGINT) AS rate,
       CAST(SUM(bytes * rate) AS BIGINT) AS bytes_renorm,
       COUNT(*) AS flows
FROM picked GROUP BY 1, 2""",
)
def as_of_sampling_rate(spark, sf_dir):
    from pmacct_spark.operators.asof import as_of_join
    from pmacct_spark.sources.tables import load_table

    region = load_table(spark, sf_dir, "region")
    dim = region.selectExpr(
        "'192.0.2.' || CAST(r_regionkey AS STRING) AS peer_ip",
        "CAST('2024-01-01 00:00:00' AS TIMESTAMP_NTZ) AS valid_from",
        "CAST(CASE r_regionkey % 3 WHEN 0 THEN 1000 WHEN 1 THEN 512 ELSE 64 END AS BIGINT) AS rate",
    ).unionByName(
        region.selectExpr(
            "'192.0.2.' || CAST(r_regionkey AS STRING) AS peer_ip",
            "CAST('2024-01-15 00:00:00' AS TIMESTAMP_NTZ) AS valid_from",
            "CAST(CASE r_regionkey % 3 WHEN 0 THEN 2000 WHEN 1 THEN 256 ELSE 32 END AS BIGINT) AS rate",
        )
    )
    fl = flows(spark, sf_dir).select("event_id", "peer_ip_src", "ts", "bytes")
    enriched = as_of_join(
        fl, dim, {"peer_ip_src": "peer_ip"}, "ts", "valid_from", {"rate": "rate"}
    )
    return (
        enriched.groupBy(
            F.col("peer_ip_src").alias("exporter"), F.col("rate")
        )
        .agg(
            F.sum(F.col("bytes") * F.col("rate")).cast("bigint").alias("bytes_renorm"),
            F.count(F.lit(1)).alias("flows"),
        )
    )


# --- blackhole community membership (reference src/filters/bloom.c
#     used by src/bgp/bgp_blackhole.c:117,242): a membership test
#     against a small set — Spark-first this is isin on a broadcast
#     set (Catalyst compiles to an in-set predicate; a real bloom
#     filter only pays off when the set can't broadcast)
@register(
    "blackhole_membership",
    f"""{FLOWS_DUCK_CTE}
SELECT as_dst AS dst_as, CAST(SUM(bytes) AS BIGINT) AS dropped_bytes,
       COUNT(*) AS dropped_flows
FROM flows
WHERE as_dst IN (64505, 64511, 64517)
GROUP BY 1""",
)
def blackhole_membership(spark, sf_dir):
    blackholed = {64505, 64511, 64517}
    fl = flows(spark, sf_dir)
    return (
        fl.filter(F.col("as_dst").isin(list(blackholed)))
        .groupBy(F.col("as_dst").alias("dst_as"))
        .agg(
            F.sum("bytes").cast("bigint").alias("dropped_bytes"),
            F.count(F.lit(1)).alias("dropped_flows"),
        )
    )


# --- GeoIP pocode + coords enrichment (src_host_pocode /
#     src_host_coords primitives; handlers src/pkt_handlers.c:749-772)
@register(
    "geoip_pocode_coords",
    f"""{FLOWS_DUCK_CTE},
geoip AS ({GEOIP_DUCK})
SELECT g.pocode AS pocode_ip_src, g.coords AS coords_ip_src, {_SUM}
FROM flows f LEFT JOIN geoip g
  ON f.ip_src_i BETWEEN g.range_start AND g.range_end
GROUP BY 1, 2""",
)
def geoip_pocode_coords(spark, sf_dir):
    f = flows(spark, sf_dir)
    geo = geoip_dim(spark, sf_dir)
    enriched = range_join(
        f, geo, "ip_src_i",
        {"pocode": "pocode_ip_src", "coords": "coords_ip_src"},
    )
    return enriched.groupBy("pocode_ip_src", "coords_ip_src").agg(
        F.sum("bytes").cast("bigint").alias("bytes"),
        F.sum("packets").cast("bigint").alias("packets"),
        F.sum("flows").cast("bigint").alias("flows"),
    )


# --- IPv6 networks_file LPM: the same longest-prefix semantics on the
#     v6 family (reference src/net_aggr.c:455-490 binsearch handles
#     both; host_addr union src/addr.c). Prefixes live as fixed-width
#     substring keys of the uncompressed form -> chained broadcast
#     joins, fact table unshuffled.
@register(
    "lpm6_networks_src_as",
    f"""{FLOWS_DUCK_CTE},
networks6 AS ({NETWORKS6_DUCK}),
cand AS (
  SELECT f.event_id, f.bytes, f.packets, f.flows, n.asn, n.masklen,
         ROW_NUMBER() OVER (
           PARTITION BY f.event_id ORDER BY n.masklen DESC) AS rn
  FROM flows f JOIN networks6 n
    ON substr(f.ip6_src, 1, length(n.prefix6)) = n.prefix6
  WHERE f.ip6_src <> ''
)
SELECT COALESCE(asn, 64512) AS src_as6, {_SUM}
FROM cand WHERE rn = 1 GROUP BY 1""",
)
def lpm6_networks_src_as(spark, sf_dir):
    from pmacct_spark.operators.lpm import lpm6_join

    f = flows(spark, sf_dir).filter("ip6_src <> ''").select(
        "ip6_src", "bytes", "packets", "flows"
    )
    nets6 = networks6_dim(spark, sf_dir)
    enriched = lpm6_join(
        f, nets6, "ip6_src", {"asn": "src_as6"}, default={"src_as6": 64512}
    )
    return enriched.groupBy("src_as6").agg(
        F.sum("bytes").cast("bigint").alias("bytes"),
        F.sum("packets").cast("bigint").alias("packets"),
        F.sum("flows").cast("bigint").alias("flows"),
    )


# --- post_tag override: constant per-plugin tag replacing whatever
#     pre_tag_map computed (CONFIG-KEYS:2350-2356: "post_tag does
#     override any value computed by pre_tag_map")
@register(
    "post_tag_override",
    f"""{FLOWS_DUCK_CTE}
SELECT CAST(777 AS BIGINT) AS tag, ip_proto AS proto, {_SUM}
FROM flows GROUP BY 1, 2""",
)
def post_tag_override(spark, sf_dir):
    f = apply_pretag(flows(spark, sf_dir), _RULES)
    cfg = PluginConfig(aggregate=["tag", "proto"], post_tag=777)
    return build_aggregation(f, cfg)


# --- networks_file_filter: LPM used as a filter — records not covered
#     by any defined (non-default) prefix have their AS zeroed out
#     (CONFIG-KEYS:1054-1060)
@register(
    "networks_filter_zero",
    f"""{FLOWS_DUCK_CTE},
networks AS ({NETWORKS_DUCK}),
cand AS (
  SELECT f.event_id, f.bytes, f.packets, f.flows, n.asn,
         ROW_NUMBER() OVER (
           PARTITION BY f.event_id ORDER BY n.masklen DESC) AS rn
  FROM flows f LEFT JOIN networks n
    ON n.masklen > 0
   AND (f.ip_src_i // (CAST(1 AS BIGINT) << (32 - n.masklen)))
     = (n.net_int // (CAST(1 AS BIGINT) << (32 - n.masklen)))
)
SELECT COALESCE(asn, 0) AS src_as, {_SUM}
FROM cand WHERE rn = 1 GROUP BY 1""",
)
def networks_filter_zero(spark, sf_dir):
    f = flows(spark, sf_dir).select("ip_src_i", "bytes", "packets", "flows")
    nets = networks_dim(spark, sf_dir).filter("masklen > 0")
    enriched = lpm_join(f, nets, "ip_src_i", {"asn": "src_as"}, default={"src_as": 0})
    return enriched.groupBy("src_as").agg(
        F.sum("bytes").cast("bigint").alias("bytes"),
        F.sum("packets").cast("bigint").alias("packets"),
        F.sum("flows").cast("bigint").alias("flows"),
    )


# --- RPKI ROA validation (reference src/rpki/rpki_lookup.c:29-106;
#     status chars src/rpki/rpki.h:26-31): each RIB route is checked
#     against the ROA table — valid if a covering ROA carries a
#     maxlen >= the route's prefix length AND the route's origin AS,
#     invalid if covered without a match, unknown if uncovered. The
#     oracle states the same rule as correlated EXISTS subqueries.
@register(
    "rpki_roa_validation",
    f"""WITH rib AS ({BGP_RIB_DUCK}), roa AS ({ROA_DUCK}),
val AS (
  SELECT r.peer_ip, r.local_pref,
    EXISTS(SELECT 1 FROM roa a
           WHERE a.masklen <= r.masklen
             AND (r.net_int // (CAST(1 AS BIGINT) << (32 - a.masklen)))
               = (a.net_int // (CAST(1 AS BIGINT) << (32 - a.masklen)))
             AND a.maxlen >= r.masklen
             AND a.asn = r.peer_dst_as) AS is_valid,
    EXISTS(SELECT 1 FROM roa a
           WHERE a.masklen <= r.masklen
             AND (r.net_int // (CAST(1 AS BIGINT) << (32 - a.masklen)))
               = (a.net_int // (CAST(1 AS BIGINT) << (32 - a.masklen)))) AS is_covered
  FROM rib r)
SELECT CASE WHEN is_valid THEN 'v' WHEN is_covered THEN 'i' ELSE 'u' END
         AS roa_status,
       COUNT(*) AS routes,
       CAST(SUM(local_pref) AS BIGINT) AS sum_local_pref
FROM val GROUP BY 1""",
)
def rpki_roa_validation(spark, sf_dir):
    from pmacct_spark.operators.rpki import rpki_validate

    rib = bgp_rib_dim(spark, sf_dir).withColumnRenamed(
        "peer_dst_as", "origin_as"
    )
    validated = rpki_validate(rib, roa_dim(spark, sf_dir))
    return validated.groupBy("roa_status").agg(
        F.count(F.lit(1)).alias("routes"),
        F.sum("local_pref").cast("bigint").alias("sum_local_pref"),
    )


# --- RPKI overlap statuses o/O (reference rpki_vector_prefix_lookup,
#     src/rpki/rpki_lookup.c:60-90; chars src/rpki/rpki.h:29-30): the
#     flow's lookup walks the peer's covering RIB levels most-specific
#     first, each level judged against the ROA table with ITS OWN
#     origin AS; an invalid most-specific route with a valid/unknown
#     covering route upgrades to 'o'/'O'. The fixture RIB's nested
#     /20-inside-/16-inside-/0 chains exercise all five statuses.
@register(
    "rpki_overlap_validation",
    f"""{FLOWS_DUCK_CTE},
rib AS ({BGP_RIB_DUCK}), roa AS ({ROA_DUCK}),
rv AS (
  SELECT r.peer_ip, r.net_int, r.masklen,
    CASE WHEN EXISTS(SELECT 1 FROM roa a
           WHERE a.masklen <= r.masklen
             AND (r.net_int // (CAST(1 AS BIGINT) << (32 - a.masklen)))
               = (a.net_int // (CAST(1 AS BIGINT) << (32 - a.masklen)))
             AND a.maxlen >= r.masklen
             AND a.asn = r.peer_dst_as) THEN 'v'
         WHEN EXISTS(SELECT 1 FROM roa a
           WHERE a.masklen <= r.masklen
             AND (r.net_int // (CAST(1 AS BIGINT) << (32 - a.masklen)))
               = (a.net_int // (CAST(1 AS BIGINT) << (32 - a.masklen))))
         THEN 'i' ELSE 'u' END AS st
  FROM rib r),
m AS (
  SELECT f.event_id, f.bytes, r.masklen, r.st
  FROM flows f LEFT JOIN rv r
    ON f.peer_ip_src = r.peer_ip
   AND (f.ip_dst_i // (CAST(1 AS BIGINT) << (32 - r.masklen)))
     = (r.net_int // (CAST(1 AS BIGINT) << (32 - r.masklen)))),
walk AS (
  SELECT event_id, ANY_VALUE(bytes) AS bytes,
         arg_max(st, masklen) AS s1,
         arg_max(CASE WHEN st <> 'i' THEN st END,
                 CASE WHEN st <> 'i' THEN masklen END) AS fni
  FROM m GROUP BY event_id)
SELECT CASE WHEN s1 IS NULL THEN 'u'
            WHEN s1 <> 'i' THEN s1
            WHEN fni = 'v' THEN 'o'
            WHEN fni = 'u' THEN 'O'
            ELSE 'i' END AS dst_roa,
       CAST(SUM(bytes) AS BIGINT) AS bytes, COUNT(*) AS flows
FROM walk GROUP BY 1""",
)
def rpki_overlap_validation(spark, sf_dir):
    from pmacct_spark.operators.rpki import rpki_validate, rpki_vector_status

    rib = bgp_rib_dim(spark, sf_dir).withColumnRenamed(
        "peer_dst_as", "origin_as"
    )
    validated = rpki_validate(rib, roa_dim(spark, sf_dir))
    fl = flows(spark, sf_dir).select(
        "event_id", "peer_ip_src", "ip_dst_i", "bytes"
    )
    out = rpki_vector_status(fl, validated)
    return out.groupBy("dst_roa").agg(
        F.sum("bytes").cast("bigint").alias("bytes"),
        F.count(F.lit(1)).alias("flows"),
    )
