"""Gated queries: sessionization (packets->flows, reference
src/ip_flow.c:81-230) and the BGP two-stage lookup join (reference
src/bgp/bgp_lookup.c:33-210)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pmacct_spark.driver_queries import flows, register
from pmacct_spark.operators.lpm import follow_nexthop_join, lpm_join
from pmacct_spark.operators.sessionize import (
    session_stats,
    sessionize,
    sessionize_duck,
)
from pmacct_spark.sources.tables import load_table
from pmacct_spark.views.dims import (
    BGP_FD_RIB_DUCK,
    bgp_fd_rib_dim,
    BGP6_RIB_DUCK,
    BGP_NH_RIB_DUCK,
    BGP_RIB_DUCK,
    bgp_nh_rib_dim,
    bgp_rib_dim,
)
from pmacct_spark.views.flows import FLOWS_DUCK_CTE, flows_sql


# --- gap sessionization of the events stream per user (the pmacctd
#     flow-construction semantic applied to the events table)
_SESS_GAP = 4 * 3600

@register(
    "sessionize_user_events",
    sessionize_duck(
        "SELECT event_id, ts, user_id FROM events",
        ["user_id"],
        "ts",
        _SESS_GAP,
        order_tiebreak=["event_id"],
    )
    + """
SELECT user_id, session_id,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_records
FROM __sess GROUP BY 1, 2""",
)
def sessionize_user_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    s = sessionize(ev, ["user_id"], "ts", _SESS_GAP, order_tiebreak=["event_id"])
    return session_stats(s, ["user_id"], "ts", counters=[])


# --- flow sessionization with TCP FIN/RST early close
#     (evaluate_tcp_flags, src/ip_flow.c:95): keys are the aggregated
#     entity pair + proto; a FIN/RST record closes the session so the
#     next record opens a new one regardless of gap
_FLOW_GAP = 1800

@register(
    "sessionize_tcp_close",
    sessionize_duck(
        flows_sql("duck"),
        ["as_src", "as_dst", "ip_proto"],
        "ts",
        _FLOW_GAP,
        end_ts_col="end_ts",
        tcp_flags_col="tcp_flags",
        order_tiebreak=["event_id"],
    )
    + """
SELECT as_src AS src_as, as_dst AS dst_as, ip_proto, session_id,
       MIN(ts) AS session_start, MAX(end_ts) AS session_end,
       COUNT(*) AS n_records,
       CAST(SUM(bytes) AS BIGINT) AS bytes,
       CAST(SUM(packets) AS BIGINT) AS packets
FROM __sess GROUP BY 1, 2, 3, 4""",
)
def sessionize_tcp_close(spark, sf_dir):
    fl = flows(spark, sf_dir).select(
        "event_id", "ts", "end_ts", "as_src", "as_dst", "ip_proto",
        "tcp_flags", "bytes", "packets",
    )
    s = sessionize(
        fl,
        ["as_src", "as_dst", "ip_proto"],
        "ts",
        _FLOW_GAP,
        end_ts_col="end_ts",
        tcp_flags_col="tcp_flags",
        order_tiebreak=["event_id"],
    )
    s = s.withColumnRenamed("as_src", "src_as").withColumnRenamed("as_dst", "dst_as")
    return session_stats(
        s, ["src_as", "dst_as", "ip_proto"], "ts", end_ts_col="end_ts"
    )


# --- BGP lookup: peer (RIB) chosen by exporter IP, then LPM of the dst
#     IP within that peer's table; yields as_path/local_pref/med/
#     peer_dst_as (bgp_srcdst_lookup, src/bgp/bgp_lookup.c:33-210;
#     peer selection :89). Spark shape: chained broadcast joins keyed on
#     (peer_ip, masked prefix), longest mask first.
@register(
    "bgp_lookup_attrs",
    f"""{FLOWS_DUCK_CTE},
rib AS ({BGP_RIB_DUCK}),
cand AS (
  SELECT f.event_id, f.bytes, r.as_path, r.peer_dst_as, r.local_pref, r.med,
         ROW_NUMBER() OVER (
           PARTITION BY f.event_id ORDER BY r.masklen DESC) AS rn
  FROM flows f JOIN rib r
    ON f.peer_ip_src = r.peer_ip
   AND (f.ip_dst_i // (CAST(1 AS BIGINT) << (32 - r.masklen)))
     = (r.net_int // (CAST(1 AS BIGINT) << (32 - r.masklen)))
)
SELECT as_path, peer_dst_as,
       CAST(SUM(bytes) AS BIGINT) AS bytes,
       COUNT(*) AS flows,
       CAST(MIN(local_pref) AS BIGINT) AS min_local_pref,
       CAST(MAX(med) AS BIGINT) AS max_med
FROM cand WHERE rn = 1 GROUP BY 1, 2""",
)
def bgp_lookup_attrs(spark, sf_dir):
    fl = flows(spark, sf_dir).select(
        "event_id", "peer_ip_src", "ip_dst_i", "bytes"
    )
    rib = bgp_rib_dim(spark, sf_dir)
    enriched = lpm_join(
        fl,
        rib,
        "ip_dst_i",
        {
            "as_path": "as_path",
            "peer_dst_as": "peer_dst_as",
            "local_pref": "local_pref",
            "med": "med",
        },
        extra_keys={"peer_ip_src": "peer_ip"},
    )
    return enriched.groupBy("as_path", "peer_dst_as").agg(
        F.sum("bytes").cast("bigint").alias("bytes"),
        F.count(F.lit(1)).alias("flows"),
        F.min("local_pref").cast("bigint").alias("min_local_pref"),
        F.max("med").cast("bigint").alias("max_med"),
    )


# --- bgp_agent_map: the correlation peer is NOT the exporter — the
#     map redirects each exporter (by prefix, narrowed by input
#     ifindex) to a loopback-peered BGP session address before the
#     peer-then-LPM lookup (reference CONFIG-KEYS:2986,
#     examples/bgp_agent.map.example; required by src/pmacctd.c:1125
#     for pmacctd+BGP). The fixture peers the RIB on 10.255.255.x
#     loopbacks while exporters stay 192.0.2.x, so an engine assuming
#     exporter==peer equality enriches NOTHING here.
_AGENT_MAP_TEXT = """!
! exporter .1 flows ingressing ifindex 3 correlate to loopback .1;
! its other ifaces fall through to the /31 entry (first match wins)
bgp_ip=10.255.255.1  ip=192.0.2.1/32  in=3
bgp_ip=10.255.255.0  ip=192.0.2.0/31
bgp_ip=10.255.255.2  ip=192.0.2.2/32
bgp_ip=10.255.255.3  ip=0.0.0.0/0
"""

_DUCK_EXP_ATON = (
    "(CAST(split_part(peer_ip_src, '.', 1) AS BIGINT) * 16777216"
    " + CAST(split_part(peer_ip_src, '.', 2) AS BIGINT) * 65536"
    " + CAST(split_part(peer_ip_src, '.', 3) AS BIGINT) * 256"
    " + CAST(split_part(peer_ip_src, '.', 4) AS BIGINT))"
)


def _agent_map_entries():
    from pmacct_spark.conffile import parse_bgp_agent_map

    return parse_bgp_agent_map(_AGENT_MAP_TEXT)


def _agent_map_duck_case() -> str:
    from pmacct_spark.operators.agentmap import agent_map_case_sql

    return agent_map_case_sql(
        _agent_map_entries(),
        exp_int=_DUCK_EXP_ATON,
        exp_str="peer_ip_src",
        in_col="iface_in",
        out_col="iface_out",
    ).replace(" DIV ", " // ")


@register(
    "bgp_agent_map_lookup",
    f"""{FLOWS_DUCK_CTE},
rib0 AS ({BGP_RIB_DUCK}),
rib AS (
  SELECT * REPLACE ('10.255.255.' || split_part(peer_ip, '.', 4)
                    AS peer_ip)
  FROM rib0
),
mapped AS (
  SELECT event_id, bytes, ip_dst_i,
         {_agent_map_duck_case()} AS bgp_peer
  FROM flows
),
cand AS (
  SELECT m.event_id, m.bytes, m.bgp_peer, r.as_path, r.peer_dst_as,
         ROW_NUMBER() OVER (
           PARTITION BY m.event_id ORDER BY r.masklen DESC) AS rn
  FROM mapped m JOIN rib r
    ON m.bgp_peer = r.peer_ip
   AND (m.ip_dst_i // (CAST(1 AS BIGINT) << (32 - r.masklen)))
     = (r.net_int // (CAST(1 AS BIGINT) << (32 - r.masklen)))
)
SELECT bgp_peer, as_path, peer_dst_as,
       CAST(SUM(bytes) AS BIGINT) AS bytes, COUNT(*) AS flows
FROM cand WHERE rn = 1 GROUP BY 1, 2, 3""",
)
def bgp_agent_map_lookup(spark, sf_dir):
    from pmacct_spark.operators.agentmap import apply_bgp_agent_map

    fl = flows(spark, sf_dir).select(
        "event_id", "peer_ip_src", "iface_in", "iface_out",
        "ip_dst_i", "bytes",
    )
    fl = apply_bgp_agent_map(fl, _agent_map_entries())
    rib = bgp_rib_dim(spark, sf_dir).withColumn(
        "peer_ip",
        F.concat(
            F.lit("10.255.255."),
            F.element_at(F.split("peer_ip", r"\."), -1),
        ),
    )
    enriched = lpm_join(
        fl,
        rib,
        "ip_dst_i",
        {"as_path": "as_path", "peer_dst_as": "peer_dst_as"},
        extra_keys={"peer_ip_src": "peer_ip"},
    )
    return enriched.groupBy(
        F.col("peer_ip_src").alias("bgp_peer"), "as_path", "peer_dst_as"
    ).agg(
        F.sum("bytes").cast("bigint").alias("bytes"),
        F.count(F.lit(1)).alias("flows"),
    )


# --- BGP communities + ROA validation state through the same
#     peer-then-LPM lookup (std_comm/lrg_comm/dst_roa primitives;
#     blackhole/community handling src/bgp/bgp_blackhole.c, ROA
#     src/network.h:606 dst_roa)
@register(
    "bgp_comm_roa",
    f"""{FLOWS_DUCK_CTE},
rib AS ({BGP_RIB_DUCK}),
cand AS (
  SELECT f.event_id, f.bytes, r.std_comm, r.lrg_comm, r.roa,
         ROW_NUMBER() OVER (
           PARTITION BY f.event_id ORDER BY r.masklen DESC) AS rn
  FROM flows f JOIN rib r
    ON f.peer_ip_src = r.peer_ip
   AND (f.ip_dst_i // (CAST(1 AS BIGINT) << (32 - r.masklen)))
     = (r.net_int // (CAST(1 AS BIGINT) << (32 - r.masklen)))
)
SELECT std_comm, lrg_comm, roa AS dst_roa,
       CAST(SUM(bytes) AS BIGINT) AS bytes, COUNT(*) AS flows
FROM cand WHERE rn = 1 GROUP BY 1, 2, 3""",
)
def bgp_comm_roa(spark, sf_dir):
    fl = flows(spark, sf_dir).select("event_id", "peer_ip_src", "ip_dst_i", "bytes")
    rib = bgp_rib_dim(spark, sf_dir)
    enriched = lpm_join(
        fl,
        rib,
        "ip_dst_i",
        {"std_comm": "std_comm", "lrg_comm": "lrg_comm", "roa": "dst_roa"},
        extra_keys={"peer_ip_src": "peer_ip"},
    )
    return enriched.groupBy("std_comm", "lrg_comm", "dst_roa").agg(
        F.sum("bytes").cast("bigint").alias("bytes"),
        F.count(F.lit(1)).alias("flows"),
    )


# --- src-side BGP reverse lookup: the same peer-then-LPM probe keyed
#     on the SOURCE address (src_as_path/src_local_pref/src_med/
#     src_roa primitives; pkt_legacy_bgp_primitives src_* fields,
#     src/network.h:609-618)
@register(
    "bgp_src_lookup",
    f"""{FLOWS_DUCK_CTE},
rib AS ({BGP_RIB_DUCK}),
cand AS (
  SELECT f.event_id, f.bytes, r.as_path, r.local_pref, r.roa,
         ROW_NUMBER() OVER (
           PARTITION BY f.event_id ORDER BY r.masklen DESC) AS rn
  FROM flows f JOIN rib r
    ON f.peer_ip_src = r.peer_ip
   AND (f.ip_src_i // (CAST(1 AS BIGINT) << (32 - r.masklen)))
     = (r.net_int // (CAST(1 AS BIGINT) << (32 - r.masklen)))
)
SELECT as_path AS src_as_path, roa AS src_roa,
       CAST(SUM(bytes) AS BIGINT) AS bytes, COUNT(*) AS flows,
       CAST(MIN(local_pref) AS BIGINT) AS min_src_local_pref
FROM cand WHERE rn = 1 GROUP BY 1, 2""",
)
def bgp_src_lookup(spark, sf_dir):
    fl = flows(spark, sf_dir).select("event_id", "peer_ip_src", "ip_src_i", "bytes")
    rib = bgp_rib_dim(spark, sf_dir)
    enriched = lpm_join(
        fl,
        rib,
        "ip_src_i",
        {"as_path": "src_as_path", "local_pref": "src_local_pref", "roa": "src_roa"},
        extra_keys={"peer_ip_src": "peer_ip"},
    )
    return enriched.groupBy("src_as_path", "src_roa").agg(
        F.sum("bytes").cast("bigint").alias("bytes"),
        F.count(F.lit(1)).alias("flows"),
        F.min("src_local_pref").cast("bigint").alias("min_src_local_pref"),
    )


# --- bgp_follow_nexthop (+ _external): recursive next-hop resolution
#     (bgp_follow_nexthop_lookup src/bgp/bgp_lookup.c:480-666;
#     CONFIG-KEYS:3040-3055). The flow dst is LPM-resolved in the
#     exporter's RIB; while the NEXT_HOP lands in the follow set
#     (172.16.0.0/16 here) it becomes the peer for the next lookup.
#     peer_dst_ip = last in-set next-hop (the routing-domain exit
#     point); peer_dst_ip_ext = the _external variant (first next-hop
#     OUTSIDE the set, i.e. from the last in-set node's table). The
#     oracle unrolls the fixture's max depth (3 lookups) as correlated
#     LPM subqueries; the follow-set test 'LIKE 172.16.%' is the
#     string form of the 172.16.0.0/16 prefix match. Self-references
#     (n%5==0 reflector rows) burn the MAX_NH_SELF_REFERENCES=1
#     budget and pin both outputs to the reflector address.
_NH_LPM = """(SELECT r.nexthop FROM rib r WHERE r.peer_ip = {peer}
       AND ({dst} // (CAST(1 AS BIGINT) << (32 - r.masklen)))
         = (r.net_int // (CAST(1 AS BIGINT) << (32 - r.masklen)))
     ORDER BY r.masklen DESC LIMIT 1)"""


@register(
    "bgp_follow_nexthop_lookup",
    f"""{FLOWS_DUCK_CTE},
rib AS ({BGP_NH_RIB_DUCK}),
h1 AS (
  SELECT f.bytes, f.ip_dst_i,
         {_NH_LPM.format(peer="f.peer_ip_src", dst="f.ip_dst_i")} AS nh1
  FROM flows f
),
h2 AS (
  SELECT bytes, ip_dst_i, nh1,
         {_NH_LPM.format(peer="h1.nh1", dst="h1.ip_dst_i")} AS nh2
  FROM h1
),
h3 AS (
  SELECT bytes, nh1, nh2,
         {_NH_LPM.format(peer="h2.nh2", dst="h2.ip_dst_i")} AS nh3
  FROM h2
),
res AS (
  SELECT bytes,
         CASE WHEN nh1 IS NULL THEN NULL
              WHEN nh1 NOT LIKE '172.16.%' THEN nh1
              WHEN nh2 = nh1 THEN nh1
              WHEN nh2 NOT LIKE '172.16.%' THEN nh1
              ELSE nh2 END AS peer_dst_ip,
         CASE WHEN nh1 IS NULL THEN NULL
              WHEN nh1 NOT LIKE '172.16.%' THEN nh1
              WHEN nh2 = nh1 THEN nh1
              WHEN nh2 NOT LIKE '172.16.%' THEN nh2
              ELSE nh3 END AS peer_dst_ip_ext
  FROM h3
)
SELECT peer_dst_ip, peer_dst_ip_ext,
       CAST(SUM(bytes) AS BIGINT) AS bytes, COUNT(*) AS flows
FROM res GROUP BY 1, 2""",
)
def bgp_follow_nexthop_lookup(spark, sf_dir):
    """Both output modes ride ONE columnar pass: the loop keeps a
    follow-saved and an external-saved column, so the external
    variant costs one extra CASE per hop, not a second resolution."""
    from pmacct_spark.operators.staging import stage

    fl = flows(spark, sf_dir).select("peer_ip_src", "ip_dst_i", "bytes")
    # materialize the dim once: the resolver reads it twice driver-side
    # (depth + masklen discovery) and broadcasts a filtered copy per
    # (hop, masklen) — staged parquet beats re-running the fixture's
    # cross-join SQL 16 times (the bgp_wire_rib_lookup pattern)
    rib = stage(bgp_nh_rib_dim(spark, sf_dir))
    resolved = follow_nexthop_join(
        fl,
        rib,
        "ip_dst_i",
        "peer_ip_src",
        follow=["172.16.0.0/16"],
        out_col="peer_dst_ip",
        external_col="peer_dst_ip_ext",
    )
    return resolved.groupBy("peer_dst_ip", "peer_dst_ip_ext").agg(
        F.sum("bytes").cast("bigint").alias("bytes"),
        F.count(F.lit(1)).alias("flows"),
    )


# --- bgp_follow_default (the start_again_follow_default recursion,
#     src/bgp/bgp_lookup.c:87,403-476): exporters with a DEFAULT-only
#     BGP view resolve flows through the default route's gateway —
#     recursively, budget-bounded. The fixture exercises all four
#     outcomes: one-hop resolution (even exporters -> gw .9.0),
#     two-hop (odd exporters -> gw .9.1 -> gw .9.2 for odd nations),
#     gateway-local specifics (odd exporters, even nations), and the
#     reference's budget-exhaustion rule (with the budget spent, the
#     default route's own attributes stand — observable here as
#     as_path 64501 rows under fdef=1, none under fdef=2).
_FD_LPM = """
  SELECT x.event_id, x.bytes, x.ip_dst_i, x.{p} AS peer,
         r.masklen AS ml, r.nexthop AS nh, r.as_path
  FROM {src} x JOIN rib r ON r.peer_ip = x.{p}
   AND (x.ip_dst_i // (CAST(1 AS BIGINT) << (32 - r.masklen)))
     = (r.net_int // (CAST(1 AS BIGINT) << (32 - r.masklen)))
  QUALIFY ROW_NUMBER() OVER (
    PARTITION BY x.event_id ORDER BY r.masklen DESC) = 1
"""


@register(
    "bgp_follow_default_lookup",
    f"""{FLOWS_DUCK_CTE},
rib AS ({{FD_RIB}}),
f0 AS (
  SELECT event_id, bytes, ip_dst_i, peer_ip_src AS p0 FROM flows
),
l0 AS ({_FD_LPM.format(src='f0', p='p0')}),
f1 AS (
  SELECT event_id, bytes, ip_dst_i,
         CASE WHEN ml = 0 AND nh IS NOT NULL AND nh <> peer
              THEN nh ELSE peer END AS p1
  FROM l0
),
l1 AS ({_FD_LPM.format(src='f1', p='p1')}),
f2 AS (
  SELECT event_id, bytes, ip_dst_i,
         CASE WHEN ml = 0 AND nh IS NOT NULL AND nh <> peer
              THEN nh ELSE peer END AS p2
  FROM l1
),
fin AS ({_FD_LPM.format(src='f2', p='p2')})
SELECT as_path, CAST(SUM(bytes) AS BIGINT) AS bytes,
       COUNT(*) AS flows
FROM fin GROUP BY 1""".replace("{FD_RIB}", BGP_FD_RIB_DUCK),
)
def bgp_follow_default_lookup(spark, sf_dir):
    """Resolved columnar: follow_default_join pre-resolves the
    EFFECTIVE lookup peer ((budget+1) chained broadcast probes, the
    fact side never shuffles), then ONE attrs lpm_join keys on it —
    the reference's whole-lookup restart becomes a peer-column
    rewrite."""
    from pmacct_spark.operators.lpm import follow_default_join
    from pmacct_spark.operators.staging import stage

    fl = flows(spark, sf_dir).select(
        F.expr("event_id"), "peer_ip_src", "ip_dst_i", "bytes"
    )
    rib = stage(bgp_fd_rib_dim(spark, sf_dir))
    fd = follow_default_join(
        fl,
        rib.select("peer_ip", "net_int", "masklen", "nexthop"),
        "ip_dst_i",
        "peer_ip_src",
        follow_default=2,
    )
    enriched = lpm_join(
        fd,
        rib.withColumnRenamed("prefix", "net_int"),
        "ip_dst_i",
        {"as_path": "as_path"},
        default={"as_path": ""},
        extra_keys={"__fd_peer": "peer_ip"},
    )
    return enriched.groupBy("as_path").agg(
        F.sum("bytes").cast("bigint").alias("bytes"),
        F.count(F.lit(1)).alias("flows"),
    )


# --- bgp_stdcomm/extcomm/lrgcomm_pattern + *_pattern_to_asn
#     (evaluate_comm_patterns src/bgp/bgp_util.c:1014,
#     copy_stdcomm_to_asn :1156 / copy_lrgcomm_to_asn :1174;
#     CONFIG-KEYS:2872-2894). Substring matching with '.' single-char
#     wildcards; a dot-pattern tests only the FIRST occurrence of its
#     literal prefix and gives up entirely if the length/mask test
#     fails — the fixture's second std token makes that abort class
#     observable (a naive per-token filter would still emit the third
#     token). Spark runs the token fold as an aggregate() HOF (JVM
#     codegen); the oracle is an independent DuckDB list_reduce of the
#     same semantics (operators/comms.py).
#     Community fixture (u = as_src - 64500, 0..19):
#       std: '64496:<e%1000> 65100:<90+u if u<=4 else u> 65100:9<e%100>'
#            patterns '64496:64,65100:9..' — substring-range class on
#            token 1 (64, 640-649), abort class when token 2 starts
#            with '65100:9' but fails the length test (u<=4 or u=9)
#       ext: 'RT:64496:<e%200>', pattern 'RT:64496:1.' (passes only
#            for two-digit values 10-19)
#       lrg: '65020:<u*3%50>:<e%7> 64999:1:2', pattern '65020:4'
_COMM_STD = (
    "'64496:' || CAST(event_id % 1000 AS {STR}) || ' 65100:' || "
    "CAST(CASE WHEN (as_src - 64500) <= 4 THEN 90 + (as_src - 64500) "
    "ELSE (as_src - 64500) END AS {STR}) || ' 65100:9' || "
    "lpad(CAST(event_id % 100 AS {STR}), 2, '0')"
)
_COMM_EXT = "'RT:64496:' || CAST(event_id % 200 AS {STR})"
_COMM_LRG = (
    "'65020:' || CAST(((as_src - 64500) * 3) % 50 AS {STR}) || ':' || "
    "CAST(event_id % 7 AS {STR}) || ' 64999:1:2'"
)
_PAT_STD = ["64496:64", "65100:9.."]
_PAT_EXT = ["RT:64496:1."]
_PAT_LRG = ["65020:4"]


def _comm_filter_oracle() -> str:
    from pmacct_spark.operators.comms import comm_pattern_duck

    std = _COMM_STD.replace("{STR}", "VARCHAR")
    ext = _COMM_EXT.replace("{STR}", "VARCHAR")
    lrg = _COMM_LRG.replace("{STR}", "VARCHAR")
    return f"""{FLOWS_DUCK_CTE},
comms AS (
  SELECT bytes, {std} AS std_comm, {ext} AS ext_comm,
         {lrg} AS lrg_comm
  FROM flows
)
SELECT {comm_pattern_duck('std_comm', _PAT_STD)} AS std_f,
       {comm_pattern_duck('ext_comm', _PAT_EXT)} AS ext_f,
       {comm_pattern_duck('lrg_comm', _PAT_LRG)} AS lrg_f,
       CAST(SUM(bytes) AS BIGINT) AS bytes, COUNT(*) AS flows
FROM comms GROUP BY 1, 2, 3"""


@register("bgp_comm_patterns_filter", _comm_filter_oracle())
def bgp_comm_patterns_filter(spark, sf_dir):
    from pmacct_spark.operators.comms import comm_pattern_sql

    fl = flows(spark, sf_dir).select(
        "bytes",
        F.expr(_COMM_STD.replace("{STR}", "STRING")).alias("std_comm"),
        F.expr(_COMM_EXT.replace("{STR}", "STRING")).alias("ext_comm"),
        F.expr(_COMM_LRG.replace("{STR}", "STRING")).alias("lrg_comm"),
    )
    return (
        fl.select(
            "bytes",
            F.expr(comm_pattern_sql("std_comm", _PAT_STD)).alias("std_f"),
            F.expr(comm_pattern_sql("ext_comm", _PAT_EXT)).alias("ext_f"),
            F.expr(comm_pattern_sql("lrg_comm", _PAT_LRG)).alias("lrg_f"),
        )
        .groupBy("std_f", "ext_f", "lrg_f")
        .agg(
            F.sum("bytes").cast("bigint").alias("bytes"),
            F.count(F.lit(1)).alias("flows"),
        )
    )


def _comm_to_asn_oracle() -> str:
    from pmacct_spark.operators.comms import (
        comm_pattern_duck,
        comm_to_asn_duck,
    )

    std = _COMM_STD.replace("{STR}", "VARCHAR")
    lrg = _COMM_LRG.replace("{STR}", "VARCHAR")
    p_std, o_std = comm_to_asn_duck(comm_pattern_duck("std_comm", ["65100:"]))
    p_lrg, o_lrg = comm_to_asn_duck(comm_pattern_duck("lrg_comm", ["65020:"]))
    return f"""{FLOWS_DUCK_CTE},
comms AS (
  SELECT bytes, {std} AS std_comm, {lrg} AS lrg_comm FROM flows
)
SELECT {p_std} AS peer_as_std, {o_std} AS origin_as_std,
       {p_lrg} AS peer_as_lrg, {o_lrg} AS origin_as_lrg,
       CAST(SUM(bytes) AS BIGINT) AS bytes, COUNT(*) AS flows
FROM comms GROUP BY 1, 2, 3, 4"""


@register("bgp_comm_pattern_to_asn", _comm_to_asn_oracle())
def bgp_comm_pattern_to_asn(spark, sf_dir):
    """Peer-AS / Origin-AS extraction from the first pattern-matching
    community, std and large variants side by side (the config keys
    are mutually exclusive; the columns are not)."""
    from pmacct_spark.operators.comms import (
        comm_pattern_sql,
        comm_to_asn_cols,
    )

    fl = flows(spark, sf_dir).select(
        "bytes",
        F.expr(_COMM_STD.replace("{STR}", "STRING")).alias("std_comm"),
        F.expr(_COMM_LRG.replace("{STR}", "STRING")).alias("lrg_comm"),
    )
    p_std, o_std = comm_to_asn_cols(
        comm_pattern_sql("std_comm", ["65100:"])
    )
    p_lrg, o_lrg = comm_to_asn_cols(
        comm_pattern_sql("lrg_comm", ["65020:"])
    )
    return (
        fl.select(
            "bytes",
            p_std.alias("peer_as_std"), o_std.alias("origin_as_std"),
            p_lrg.alias("peer_as_lrg"), o_lrg.alias("origin_as_lrg"),
        )
        .groupBy(
            "peer_as_std", "origin_as_std", "peer_as_lrg",
            "origin_as_lrg",
        )
        .agg(
            F.sum("bytes").cast("bigint").alias("bytes"),
            F.count(F.lit(1)).alias("flows"),
        )
    )


def _comm_combo_oracle() -> str:
    from pmacct_spark.operators.comms import (
        comm_pattern_duck,
        comm_to_asn_duck,
    )

    std = _COMM_STD.replace("{STR}", "VARCHAR")
    p, o = comm_to_asn_duck(comm_pattern_duck("std_comm", ["65100:"]))
    return f"""{FLOWS_DUCK_CTE},
comms AS (SELECT bytes, {std} AS std_comm FROM flows)
SELECT {comm_pattern_duck('std_comm', _PAT_STD)} AS std_f,
       {p} AS peer_as, {o} AS origin_as,
       CAST(SUM(bytes) AS BIGINT) AS bytes, COUNT(*) AS flows
FROM comms GROUP BY 1, 2, 3"""


@register("bgp_comm_pattern_combo", _comm_combo_oracle())
def bgp_comm_pattern_combo(spark, sf_dir):
    """bgp_stdcomm_pattern AND bgp_stdcomm_pattern_to_asn configured
    together: the display filter rewrites std_comm for output, but the
    to_asn extraction evaluates against the PRISTINE community string
    (the reference runs evaluate_comm_patterns on
    info->attr->community->str, src/pkt_handlers.c:5592, not the
    filtered copy) — the r12 daemon-fix semantics, gated. With
    '65100:' extraction vs the '64496:64,65100:9..' display patterns,
    rows whose display filter emits nothing still carry nonzero
    peer/origin ASNs, which a filtered-column evaluation would
    zero."""
    from pmacct_spark.operators.comms import (
        comm_pattern_sql,
        comm_to_asn_cols,
    )

    fl = flows(spark, sf_dir).select(
        "bytes",
        F.expr(_COMM_STD.replace("{STR}", "STRING")).alias("std_comm"),
    )
    p, o = comm_to_asn_cols(comm_pattern_sql("std_comm", ["65100:"]))
    return (
        fl.select(
            "bytes",
            F.expr(comm_pattern_sql("std_comm", _PAT_STD)).alias("std_f"),
            p.alias("peer_as"), o.alias("origin_as"),
        )
        .groupBy("std_f", "peer_as", "origin_as")
        .agg(
            F.sum("bytes").cast("bigint").alias("bytes"),
            F.count(F.lit(1)).alias("flows"),
        )
    )


# --- BGP RIB built FROM THE WIRE: per-peer BGP UPDATE streams (AS4
#     AS_PATH, NEXT_HOP, MED, LOCAL_PREF, all three community
#     families) -> decode_bgp -> rib_state compaction -> the same
#     peer-then-LPM flow lookup as bgp_lookup_attrs. Upgrades the BGP
#     source from "snapshot dimension" to wire-gated (reference
#     src/bgp/bgp.c:99 session side, UPDATE parse src/bgp/bgp_msg.c).
@register(
    "bgp_wire_rib_lookup",
    f"""{FLOWS_DUCK_CTE},
rib AS ({BGP_RIB_DUCK}),
cand AS (
  SELECT f.event_id, f.bytes, r.as_path, r.peer_dst_as, r.local_pref,
         r.med, r.std_comm, r.ext_comm, r.lrg_comm,
         ROW_NUMBER() OVER (
           PARTITION BY f.event_id ORDER BY r.masklen DESC) AS rn
  FROM flows f JOIN rib r
    ON f.peer_ip_src = r.peer_ip
   AND (f.ip_dst_i // (CAST(1 AS BIGINT) << (32 - r.masklen)))
     = (r.net_int // (CAST(1 AS BIGINT) << (32 - r.masklen)))
)
SELECT as_path, peer_dst_as, std_comm, ext_comm, lrg_comm,
       CAST(SUM(bytes) AS BIGINT) AS bytes, COUNT(*) AS flows,
       CAST(MIN(local_pref) AS BIGINT) AS min_local_pref,
       CAST(MAX(med) AS BIGINT) AS max_med
FROM cand WHERE rn = 1 GROUP BY 1, 2, 3, 4, 5""",
)
def bgp_wire_rib_lookup(spark, sf_dir):
    """The oracle joins against the pristine fixture RIB; the Spark
    side must reproduce it bit-for-bit through encode_bgp_updates ->
    decode_bgp -> rib_state, so any attribute codec error (AS_PATH
    segmenting, community rendering, NLRI prefix packing) or
    compaction error breaks the value hash. peer_dst_as is derived
    from the decoded AS_PATH (last hop), as the reference derives it
    from the RIB entry."""
    from pmacct_spark.streaming.bmp import (
        decode_bgp,
        encode_bgp_updates,
        rib_state,
    )

    rib_src = bgp_rib_dim(spark, sf_dir)
    streams = encode_bgp_updates(rib_src)
    decoded = decode_bgp(streams.select("exporter_ip", "payload"))
    # materialize once: lpm_join reads the dim several times (masklen
    # discovery + one broadcast per masklen)
    rib_wire = rib_state(decoded, peer_down=False).selectExpr(
        "peer_ip",
        "prefix AS net_int",
        "masklen",
        "as_path",
        "CAST(element_at(split(as_path, ' '), -1) AS BIGINT) AS peer_dst_as",
        "local_pref",
        "med",
        "std_comm",
        "ext_comm",
        "lrg_comm",
    )
    from pmacct_spark.operators.staging import stage

    rib_wire = stage(rib_wire)
    fl = flows(spark, sf_dir).select(
        "event_id", "peer_ip_src", "ip_dst_i", "bytes"
    )
    enriched = lpm_join(
        fl,
        rib_wire,
        "ip_dst_i",
        {
            "as_path": "as_path",
            "peer_dst_as": "peer_dst_as",
            "local_pref": "local_pref",
            "med": "med",
            "std_comm": "std_comm",
            "ext_comm": "ext_comm",
            "lrg_comm": "lrg_comm",
        },
        extra_keys={"peer_ip_src": "peer_ip"},
    )
    return enriched.groupBy(
        "as_path", "peer_dst_as", "std_comm", "ext_comm", "lrg_comm"
    ).agg(
        F.sum("bytes").cast("bigint").alias("bytes"),
        F.count(F.lit(1)).alias("flows"),
        F.min("local_pref").cast("bigint").alias("min_local_pref"),
        F.max("med").cast("bigint").alias("max_med"),
    )


# --- BGP ADD-PATH (RFC 7911) on the wire: per-peer sessions OPEN with
#     the capability, every route arrives as TWO paths (decoy with an
#     extra hop and lower local_pref + the true fixture path, emit
#     order alternating), the RIB keys per path-id, and best-path
#     selection recovers exactly the fixture attributes for the flow
#     join — so the oracle is the same pristine-RIB join as
#     bgp_wire_rib_lookup (reference capability parse
#     src/bgp/bgp_msg.c:296-346, per-path NLRI :1225-1232, per-path
#     route_info keying :1514-1516).
@register(
    "bgp_addpath_rib_lookup",
    f"""{FLOWS_DUCK_CTE},
rib AS ({BGP_RIB_DUCK}),
cand AS (
  SELECT f.event_id, f.bytes, r.as_path, r.local_pref,
         ROW_NUMBER() OVER (
           PARTITION BY f.event_id ORDER BY r.masklen DESC) AS rn
  FROM flows f JOIN rib r
    ON f.peer_ip_src = r.peer_ip
   AND (f.ip_dst_i // (CAST(1 AS BIGINT) << (32 - r.masklen)))
     = (r.net_int // (CAST(1 AS BIGINT) << (32 - r.masklen)))
)
SELECT as_path,
       CAST(SUM(bytes) AS BIGINT) AS bytes, COUNT(*) AS flows,
       CAST(MIN(local_pref) AS BIGINT) AS min_local_pref
FROM cand WHERE rn = 1 GROUP BY 1""",
)
def bgp_addpath_rib_lookup(spark, sf_dir):
    """Wire-gated ADD-PATH: if the decoder missed the OPEN capability
    the 4-byte path-id shift corrupts every NLRI; if the RIB is not
    keyed per path, plain latest-wins keeps the decoy for the
    alternating half of the routes; if best-path ordering is wrong the
    decoy's attributes surface — each breaks the value hash against
    the pristine fixture oracle."""
    from pmacct_spark.streaming.bmp import (
        best_path,
        decode_bgp,
        encode_bgp_updates_addpath,
        rib_state,
    )

    rib_src = bgp_rib_dim(spark, sf_dir)
    streams = encode_bgp_updates_addpath(rib_src)
    decoded = decode_bgp(streams.select("exporter_ip", "seqno", "payload"))
    rib_wire = best_path(rib_state(decoded, peer_down=False)).selectExpr(
        "peer_ip", "prefix AS net_int", "masklen", "as_path", "local_pref"
    )
    from pmacct_spark.operators.staging import stage

    rib_wire = stage(rib_wire)
    fl = flows(spark, sf_dir).select(
        "event_id", "peer_ip_src", "ip_dst_i", "bytes"
    )
    enriched = lpm_join(
        fl,
        rib_wire,
        "ip_dst_i",
        {"as_path": "as_path", "local_pref": "local_pref"},
        extra_keys={"peer_ip_src": "peer_ip"},
    )
    return enriched.groupBy("as_path").agg(
        F.sum("bytes").cast("bigint").alias("bytes"),
        F.count(F.lit(1)).alias("flows"),
        F.min("local_pref").cast("bigint").alias("min_local_pref"),
    )


# --- ADD-PATH per-flow NEXT-HOP disambiguation + bgp_peer_dst_ip_map
#     (the nmct2.peer_dst_ip match, src/bgp/bgp_lookup.c:726-760;
#     BPDI_find_id src/util.c:2105; CONFIG-KEYS:3011): with RFC 7911
#     negotiated, a prefix holds MULTIPLE paths and the flow's
#     EXPORTED BGP next-hop selects among them. The fixture's path A
#     is best-path BAIT (+5 local_pref): a best-path lookup gets every
#     flow's attributes wrong for the B-selecting flows, and flows
#     reporting an RSVP-TE tunnel TAIL-END only resolve through the
#     bgp_peer_dst_ip_map remap of path B's next-hop.
_AP_BASE = 167772160
_AP_NHA = (172 << 24) + (16 << 16) + 1  # 172.16.<nk>.1
_AP_NHB = (172 << 24) + (32 << 16) + 1  # 172.32.<nk>.1
_AP_TAIL = (198 << 24) + (51 << 16) + 1  # 198.51.<nk>.1
_AP_NK = f"((ip_dst_i - {_AP_BASE}) // 65536)"
_AP_FNH = f"""CASE WHEN event_id % 5 = 0 THEN {_AP_TAIL} + {_AP_NK} * 256
     WHEN event_id % 2 = 0 THEN {_AP_NHA} + {_AP_NK} * 256
     ELSE {_AP_NHB} + {_AP_NK} * 256 END"""


@register(
    "bgp_addpath_nexthop_disambig",
    f"""{FLOWS_DUCK_CTE},
rib16 AS (
  SELECT '192.0.2.' || CAST(r_regionkey AS VARCHAR) AS peer_ip,
         CAST({_AP_BASE} + n_nationkey * 65536 AS BIGINT) AS net_int,
         n_nationkey AS nk,
         '64496 ' || CAST(65000 + n_nationkey AS VARCHAR) AS as_path,
         CAST(100 + ((n_nationkey * 7 + r_regionkey) % 50) AS BIGINT)
           AS local_pref
  FROM region CROSS JOIN nation
),
paths AS (
  SELECT peer_ip, net_int, '64701 ' || as_path AS as_path,
         local_pref + 5 AS local_pref,
         CAST({_AP_NHA} + nk * 256 AS BIGINT) AS nh_key
  FROM rib16
  UNION ALL
  SELECT peer_ip, net_int, as_path, local_pref,
         CAST({_AP_NHB} + nk * 256 AS BIGINT)
  FROM rib16
  UNION ALL
  SELECT peer_ip, net_int, as_path, local_pref,
         CAST({_AP_TAIL} + nk * 256 AS BIGINT)
  FROM rib16
)
SELECT p.as_path, CAST(SUM(f.bytes) AS BIGINT) AS bytes,
       COUNT(*) AS flows,
       CAST(MIN(p.local_pref) AS BIGINT) AS min_local_pref
FROM (SELECT event_id, bytes, peer_ip_src, ip_dst_i,
             {_AP_FNH} AS fnh
      FROM flows) f
JOIN paths p
  ON p.peer_ip = f.peer_ip_src
 AND (f.ip_dst_i // 65536) = (p.net_int // 65536)
 AND p.nh_key = f.fnh
GROUP BY 1""",
)
def bgp_addpath_nexthop_disambig(spark, sf_dir):
    """Wire-gated: the ADD-PATH OPEN, per-path RIB keying, the
    per-flow next-hop equality (one extra equi key on the chained
    broadcast — no OR predicate: the bpdi map contributes its own
    candidate rows), and the map remap all have to be right or the
    hash breaks — best-path-only would surface path A's 64701-prefixed
    paths and +5 local_prefs for every B/tail-end flow."""
    from pmacct_spark.operators.lpm import addpath_nexthop_join
    from pmacct_spark.operators.staging import stage
    from pmacct_spark.streaming.bmp import (
        decode_bgp,
        encode_bgp_updates_addpath_nh,
        rib_state,
    )

    rib16 = bgp_rib_dim(spark, sf_dir).filter("masklen = 16")
    streams = encode_bgp_updates_addpath_nh(rib16)
    decoded = decode_bgp(streams.select("exporter_ip", "seqno", "payload"))
    paths = stage(
        rib_state(decoded, peer_down=False).selectExpr(
            "peer_ip", "prefix AS net_int", "masklen",
            "as_path", "local_pref", "next_hop",
        )
    )
    fl = flows(spark, sf_dir).selectExpr(
        "event_id", "peer_ip_src", "ip_dst_i", "bytes",
        _AP_FNH.replace("//", "DIV") + " AS bgp_nexthop_i",
    )
    bpdi = [
        {"id": f"198.51.{k}.1", "bgp_nexthop": f"172.32.{k}.1"}
        for k in range(25)
    ]
    enriched = addpath_nexthop_join(
        fl, paths, "ip_dst_i", "peer_ip_src", "bgp_nexthop_i",
        {"as_path": "as_path", "local_pref": "local_pref"},
        bpdi=bpdi,
    )
    return enriched.filter("as_path IS NOT NULL").groupBy("as_path").agg(
        F.sum("bytes").cast("bigint").alias("bytes"),
        F.count(F.lit(1)).alias("flows"),
        F.min("local_pref").cast("bigint").alias("min_local_pref"),
    )


# --- BMP RIB built FROM THE WIRE with peer-down purge: the fixture
#     RIB is packed into per-peer BMP v3 byte streams (Peer Up, one
#     Route Monitoring message per route, then for even-numbered
#     peers a Peer Down Notification followed by re-announcements of
#     the /16 routes only) -> decode_bmp -> rib_state. The oracle
#     models the purge directly: a downed peer keeps only what it
#     re-announced (reference src/bmp/bmp_msg.c peer-down handling,
#     tests/204-205-peer_down).
@register(
    "bmp_wire_peer_down_rib",
    f"""WITH rib AS ({BGP_RIB_DUCK})
SELECT peer_ip, COUNT(*) AS routes,
       CAST(SUM(local_pref) AS BIGINT) AS sum_local_pref,
       CAST(SUM(net_int) AS BIGINT) AS sum_net,
       CAST(MAX(med) AS BIGINT) AS max_med
FROM rib
WHERE (CAST(split_part(peer_ip, '.', 4) AS INT) % 2 = 1) OR masklen = 16
GROUP BY peer_ip""",
)
def bmp_wire_peer_down_rib(spark, sf_dir):
    """Any framing, per-peer-header, UPDATE codec, seq-ordering, or
    purge-window error breaks the value hash: routes announced before
    a Peer Down must vanish, re-announcements after it must survive
    with their attributes intact."""
    from pmacct_spark.streaming.bmp import (
        decode_bmp,
        encode_bmp_streams,
        rib_state,
    )

    rib_src = (
        bgp_rib_dim(spark, sf_dir)
        .withColumn(
            "__down",
            F.expr("CAST(substring_index(peer_ip, '.', -1) AS INT) % 2 = 0"),
        )
        .withColumn("__reannounce", F.expr("__down AND masklen = 16"))
    )
    streams = encode_bmp_streams(rib_src)
    rib = rib_state(decode_bmp(streams))
    return rib.groupBy("peer_ip").agg(
        F.count(F.lit(1)).alias("routes"),
        F.sum("local_pref").cast("bigint").alias("sum_local_pref"),
        F.sum("prefix").cast("bigint").alias("sum_net"),
        F.max("med").cast("bigint").alias("max_med"),
    )


# --- table dump gated from the wire: the purged BMP RIB above is
#     rendered into the reference's dump event stream (dump_init /
#     dump / dump_close per peer, src/bgp/bgp_logdump.c) and the
#     per-peer event accounting is value-checked: a peer with n live
#     routes emits n+2 events, entries=n on the close row, seq ends
#     at n+1 (reference tests/203-BMP-dump).
@register(
    "bmp_wire_dump_accounting",
    f"""WITH rib AS ({BGP_RIB_DUCK}),
alive AS (
  SELECT * FROM rib
  WHERE (CAST(split_part(peer_ip, '.', 4) AS INT) % 2 = 1) OR masklen = 16
),
pp AS (SELECT peer_ip, COUNT(*) AS n FROM alive GROUP BY 1)
SELECT peer_ip, CAST(n + 2 AS BIGINT) AS events,
       CAST(n AS BIGINT) AS entries, CAST(n + 1 AS BIGINT) AS max_seq
FROM pp""",
)
def bmp_wire_dump_accounting(spark, sf_dir):
    from pmacct_spark.sinks.dump import rib_dump_events
    from pmacct_spark.streaming.bmp import (
        decode_bmp,
        encode_bmp_streams,
        rib_state,
    )

    rib_src = (
        bgp_rib_dim(spark, sf_dir)
        .withColumn(
            "__down",
            F.expr("CAST(substring_index(peer_ip, '.', -1) AS INT) % 2 = 0"),
        )
        .withColumn("__reannounce", F.expr("__down AND masklen = 16"))
    )
    rib = rib_state(decode_bmp(encode_bmp_streams(rib_src)))
    ev = rib_dump_events(rib, dump_ts=1_700_000_000)
    return ev.groupBy("peer_ip").agg(
        F.count(F.lit(1)).alias("events"),
        F.max("entries").cast("bigint").alias("entries"),
        F.max("seq").cast("bigint").alias("max_seq"),
    )


# --- BGP IPv6 RIB FROM THE WIRE: MP_REACH_NLRI announcements and
#     MP_UNREACH_NLRI withdrawals (RFC 4760) per-peer session streams
#     -> decode_bgp -> rib_state -> peer-keyed v6 LPM enrichment of
#     the v6-signalled flows (reference BGP IPv6 families
#     tests/300/302/501/502, src/bgp/bgp_msg.c MP attributes). The
#     oracle joins the pristine fixture (withdrawn rows excluded);
#     the Spark side must reproduce it through the v6 codec.
@register(
    "bgp6_wire_rib_lookup",
    f"""{FLOWS_DUCK_CTE},
rib AS ({BGP6_RIB_DUCK}),
cand AS (
  SELECT f.event_id, f.bytes, r.as_path, r.local_pref, r.med, r.lrg_comm,
         ROW_NUMBER() OVER (
           PARTITION BY f.event_id ORDER BY r.masklen DESC) AS rn
  FROM flows f JOIN rib r
    ON f.peer_ip_src = r.peer_ip
   AND substr(f.ip6_dst, 1, length(r.prefix6)) = r.prefix6
  WHERE f.ip6_dst <> '' AND NOT r.withdrawn
)
SELECT as_path AS as_path6, lrg_comm,
       CAST(SUM(bytes) AS BIGINT) AS bytes, COUNT(*) AS flows,
       CAST(MIN(local_pref) AS BIGINT) AS min_local_pref,
       CAST(MAX(med) AS BIGINT) AS max_med
FROM cand WHERE rn = 1 GROUP BY 1, 2""",
)
def bgp6_wire_rib_lookup(spark, sf_dir):
    """Any MP attribute codec error (AFI/SAFI framing, NLRI nibble
    packing, the v6 LPM key render) or a withdrawal that fails to
    tombstone breaks the value hash."""
    from pmacct_spark.operators.lpm import lpm6_join
    from pmacct_spark.operators.staging import stage
    from pmacct_spark.streaming.bmp import (
        decode_bgp,
        encode_bgp6_streams,
        rib_state,
    )
    from pmacct_spark.views.dims import bgp6_rib_dim

    rib_src = bgp6_rib_dim(spark, sf_dir).withColumnRenamed(
        "withdrawn", "__withdraw"
    )
    streams = encode_bgp6_streams(rib_src)
    rib_wire = stage(
        rib_state(decode_bgp(streams), peer_down=False).select(
            "peer_ip", "prefix6", "masklen", "as_path",
            "local_pref", "med", "lrg_comm",
        )
    )
    fl = flows(spark, sf_dir).filter("ip6_dst <> ''").select(
        "peer_ip_src", "ip6_dst", "bytes"
    )
    enriched = lpm6_join(
        fl,
        rib_wire,
        "ip6_dst",
        {
            "as_path": "as_path6",
            "local_pref": "local_pref",
            "med": "med",
            "lrg_comm": "lrg_comm",
        },
        extra_keys={"peer_ip_src": "peer_ip"},
    )
    return enriched.groupBy("as_path6", "lrg_comm").agg(
        F.sum("bytes").cast("bigint").alias("bytes"),
        F.count(F.lit(1)).alias("flows"),
        F.min("local_pref").cast("bigint").alias("min_local_pref"),
        F.max("med").cast("bigint").alias("max_med"),
    )


# --- msglog event stream GATED: the fixture RIB rides the BGP wire
#     (one UPDATE per route, per-peer sessions in deterministic wire
#     order) -> decode_bgp -> sinks/msglog event shaping. The oracle
#     rebuilds the identical event log straight from the fixture, so
#     any error in event typing, per-peer seq assignment, prefix /
#     next-hop presentation, or attribute passthrough breaks the
#     value hash (reference src/bgp/bgp_logdump.c bgp_peer_log_msg).
@register(
    "bgp_msglog_stream",
    f"""
WITH rib AS ({BGP_RIB_DUCK}),
q AS (
  SELECT peer_ip AS peer_ip_src,
         ROW_NUMBER() OVER (
           PARTITION BY peer_ip ORDER BY net_int, masklen
         ) AS msglog_seq,
         'log' AS event_type, 'update' AS log_type,
         CAST(1 AS INT) AS afi, CAST(1 AS INT) AS safi,
         CAST(net_int // 16777216 AS VARCHAR) || '.'
           || CAST((net_int // 65536) % 256 AS VARCHAR) || '.'
           || CAST((net_int // 256) % 256 AS VARCHAR) || '.'
           || CAST(net_int % 256 AS VARCHAR) || '/'
           || CAST(masklen AS VARCHAR) AS ip_prefix,
         CAST(net_int // 16777216 AS VARCHAR) || '.'
           || CAST((net_int // 65536) % 256 AS VARCHAR) || '.'
           || CAST((net_int // 256) % 256 AS VARCHAR) || '.'
           || CAST(net_int % 256 AS VARCHAR) AS bgp_nexthop,
         as_path, NULLIF(std_comm, '') AS comms,
         NULLIF(ext_comm, '') AS ecomms,
         NULLIF(lrg_comm, '') AS lcomms,
         local_pref, med
  FROM rib
)
SELECT * FROM q""",
)
def bgp_msglog_stream(spark, sf_dir):
    from pmacct_spark.sinks.msglog import msglog_events
    from pmacct_spark.streaming.bmp import decode_bgp, encode_bgp_updates

    rib = bgp_rib_dim(spark, sf_dir)
    # one partition per peer, wire order (net_int, masklen): decode's
    # intra-partition seq then reproduces a deterministic per-peer
    # arrival order the oracle can state as a window
    ordered = rib.repartition("peer_ip").sortWithinPartitions(
        "peer_ip", "net_int", "masklen"
    )
    from pmacct_spark.operators.staging import stage

    # staged barrier: the decoded event table is materialized once, so
    # the per-peer seq window (and anything downstream) reads compact
    # parquet instead of re-running the wire decode — the same shape
    # the other bgp_wire queries use
    ev = stage(
        decode_bgp(
            encode_bgp_updates(ordered).select("exporter_ip", "payload")
        )
    )
    return msglog_events(ev).select(
        F.col("peer_ip").alias("peer_ip_src"),
        "msglog_seq",
        "event_type",
        "log_type",
        "afi",
        "safi",
        "ip_prefix",
        "bgp_nexthop",
        "as_path",
        F.col("std_comm").alias("comms"),
        F.col("ext_comm").alias("ecomms"),
        F.col("lrg_comm").alias("lcomms"),
        "local_pref",
        "med",
    )
