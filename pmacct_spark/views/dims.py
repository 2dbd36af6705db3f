"""Deterministic dimension tables derived from nation/region — the
engine's "maps" (networks_file, GeoIP ranges, sampling_map), dual-
rendered for Spark and the DuckDB oracle like views.flows.

networks (FIXTURES.md §3, reference src/net_aggr.h:54-62): overlapping
prefixes inside the flow IP space 10.0.0.0/12 (167772160..168820735):
  - a default route 0.0.0.0/0          (from region key 0)
  - /16s  10.{k}.0.0/16 per nation key (keys 0..15 inside flow space)
  - /20 more-specifics per nation key
  - /24s  10.0.{k}.0/24 per region key
GeoIP ranges (FIXTURES.md §7): the /12 space split into 5 country
chunks keyed by region.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pmacct_spark.sources.tables import load_table

_BASE = 167772160  # 10.0.0.0

_NETWORKS_SQL = f"""
SELECT CAST(0 AS BIGINT) AS net_int, 0 AS masklen,
       CAST(64512 AS BIGINT) AS asn, CAST(64512 AS BIGINT) AS peer_asn
FROM region WHERE r_regionkey = 0
UNION ALL
SELECT CAST({_BASE} + n_nationkey * 65536 AS BIGINT), 16,
       CAST(65000 + n_nationkey AS BIGINT), CAST(65500 + n_nationkey AS BIGINT)
FROM nation
UNION ALL
SELECT CAST({_BASE} + n_nationkey * 65536 + ((n_nationkey * 7) % 16) * 4096 AS BIGINT), 20,
       CAST(66000 + n_nationkey AS BIGINT), CAST(66500 + n_nationkey AS BIGINT)
FROM nation WHERE n_nationkey < 16
UNION ALL
SELECT CAST({_BASE} + r_regionkey * 256 AS BIGINT), 24,
       CAST(64600 + r_regionkey AS BIGINT), CAST(64700 + r_regionkey AS BIGINT)
FROM region
"""

_GEOIP_SQL = f"""
SELECT CAST({_BASE} + r_regionkey * 209715 AS BIGINT) AS range_start,
       CAST({_BASE} + r_regionkey * 209715 + 209714 AS BIGINT) AS range_end,
       r_name AS country,
       'PO' || CAST(10 + r_regionkey AS {{STR}}) AS pocode,
       CAST(-60 + r_regionkey * 30 AS {{STR}}) || ':'
         || CAST(-150 + r_regionkey * 60 AS {{STR}}) AS coords
FROM region
"""

_SAMPLING_MAP_SQL = """
SELECT '192.0.2.' || CAST(r_regionkey AS {STR}) AS peer_ip,
       CAST(CASE r_regionkey % 3 WHEN 0 THEN 1000 WHEN 1 THEN 512 ELSE 64 END AS BIGINT)
         AS map_rate
FROM region
"""

# BGP RIB snapshot (reference src/bgp/bgp_table.h:47-62): one routing
# table per peer (exporter), selected per record by exporter IP then
# searched longest-prefix-first (src/bgp/bgp_lookup.c:33-210). Derived
# deterministically from region (peers) x nation (prefixes):
#   - per peer, a default route 0/0 (follow-default recursion target)
#   - per (peer, nation) a /16 with full BGP attrs; peers disagree on
#     local_pref/med so peer selection is observable
#   - per (peer, nation<16) a /20 more-specific with a longer as_path
_BGP_RIB_SQL = f"""
SELECT '192.0.2.' || CAST(r_regionkey AS {{STR}}) AS peer_ip,
       CAST(0 AS BIGINT) AS net_int, 0 AS masklen,
       '64512' AS as_path, CAST(64512 AS BIGINT) AS peer_dst_as,
       CAST(50 AS BIGINT) AS local_pref, CAST(0 AS BIGINT) AS med,
       '' AS std_comm, '' AS ext_comm, '' AS lrg_comm, 'u' AS roa
FROM region
UNION ALL
SELECT '192.0.2.' || CAST(r_regionkey AS {{STR}}),
       CAST({_BASE} + n_nationkey * 65536 AS BIGINT), 16,
       '64496 ' || CAST(65000 + n_nationkey AS {{STR}}),
       CAST(65000 + n_nationkey AS BIGINT),
       CAST(100 + ((n_nationkey * 7 + r_regionkey) % 50) AS BIGINT),
       CAST((n_nationkey * 13 + r_regionkey * 3) % 100 AS BIGINT),
       '64496:' || CAST(n_nationkey % 10 AS {{STR}}),
       'RT:64496:' || CAST(n_nationkey % 5 AS {{STR}}),
       '64496:1:' || CAST(n_nationkey AS {{STR}}),
       CASE n_nationkey % 3 WHEN 0 THEN 'v' WHEN 1 THEN 'i' ELSE 'n' END
FROM region CROSS JOIN nation
UNION ALL
SELECT '192.0.2.' || CAST(r_regionkey AS {{STR}}),
       CAST({_BASE} + n_nationkey * 65536
            + ((n_nationkey * 7) % 16) * 4096 AS BIGINT), 20,
       '64496 64499 ' || CAST(66000 + n_nationkey AS {{STR}}),
       CAST(66000 + n_nationkey AS BIGINT),
       CAST(200 + ((n_nationkey * 11 + r_regionkey) % 50) AS BIGINT),
       CAST((n_nationkey * 17 + r_regionkey * 5) % 100 AS BIGINT),
       '64499:' || CAST(n_nationkey % 10 AS {{STR}}) || ' 64496:' || CAST(n_nationkey % 10 AS {{STR}}),
       'RT:64499:' || CAST(n_nationkey % 5 AS {{STR}}),
       '64499:1:' || CAST(n_nationkey AS {{STR}}),
       CASE n_nationkey % 3 WHEN 0 THEN 'v' WHEN 1 THEN 'i' ELSE 'n' END
FROM region CROSS JOIN nation WHERE n_nationkey < 16
"""

# IPv6 networks table (networks_file with v6 prefixes; the reference's
# binsearch handles both families AND arbitrary masklens,
# src/net_aggr.c:455-490). A prefix is stored as the uncompressed-form
# string rendered to exactly ceil(masklen/4) hex nibbles (aligned
# prefixes keep the trailing colon), so LPM = fixed-width substring
# equality at length(prefix6); masklen ranks matches.
#   - /116 per nation<16: the /112 below + the first nibble of group 8
#     (= hex(nationkey)) — non-16-bit-aligned, steals the flows whose
#     (event_id % 65536) DIV 4096 nibble agrees
#   - /112 per nation<16 (groups 4+7 nation-derived; only flows whose
#     user_id%16 agrees with user_id%5 hit these -> real LPM fallback)
#   - /64  per region   (group 4 = region key)
#   - /44  covering fd00:0000:000x (all fixture flows) — non-aligned
#   - /20  covering fd00:0xxx (all fixture flows) — non-aligned, least
#     specific: must lose to every longer match
_G = "lpad(lower({HEX}(%s)), 4, '0')"

_NETWORKS6_SQL = f"""
SELECT 'fd00:0000:0000:' || {_G % '(n_nationkey % 5)'} || ':0000:0000:'
         || {_G % 'n_nationkey'} || ':'
         || substr({_G % 'n_nationkey'}, 4, 1) AS prefix6,
       116 AS masklen, CAST(68000 + n_nationkey AS BIGINT) AS asn
FROM nation WHERE n_nationkey < 16
UNION ALL
SELECT 'fd00:0000:0000:' || {_G % '(n_nationkey % 5)'} || ':0000:0000:'
         || {_G % 'n_nationkey'} || ':' AS prefix6,
       112 AS masklen, CAST(66100 + n_nationkey AS BIGINT) AS asn
FROM nation WHERE n_nationkey < 16
UNION ALL
SELECT 'fd00:0000:0000:' || {_G % 'r_regionkey'} || ':' AS prefix6,
       64 AS masklen, CAST(65100 + r_regionkey AS BIGINT) AS asn
FROM region
UNION ALL
SELECT 'fd00:0000:000' AS prefix6,
       44 AS masklen, CAST(67500 AS BIGINT) AS asn
FROM region WHERE r_regionkey = 0
UNION ALL
SELECT 'fd00:0' AS prefix6,
       20 AS masklen, CAST(67000 AS BIGINT) AS asn
FROM region WHERE r_regionkey = 0
"""

# BGP IPv6 RIB fixture (the reference's BGP v6 families,
# tests/300/302/501/502: MP_REACH/MP_UNREACH_NLRI routes per peer).
# Prefixes use the networks6 LPM key form; the ``withdrawn`` flag
# drives MP_UNREACH messages in the wire fixture (and excludes the
# row from the oracle's final RIB).
_BGP6_RIB_SQL = f"""
SELECT '192.0.2.' || CAST(r_regionkey AS {{STR}}) AS peer_ip,
       'fd00:0' AS prefix6, 20 AS masklen,
       '64512' AS as_path, CAST(50 AS BIGINT) AS local_pref,
       CAST(0 AS BIGINT) AS med, '' AS lrg_comm, FALSE AS withdrawn
FROM region
UNION ALL
SELECT '192.0.2.' || CAST(r_regionkey AS {{STR}}),
       'fd00:0000:0000:' || {_G % 'n_nationkey'} || ':', 64,
       '64496 ' || CAST(65200 + n_nationkey AS {{STR}}),
       CAST(100 + ((n_nationkey * 7 + r_regionkey) % 50) AS BIGINT),
       CAST((n_nationkey * 13 + r_regionkey * 3) % 100 AS BIGINT),
       '64496:2:' || CAST(n_nationkey AS {{STR}}), FALSE
FROM region CROSS JOIN nation WHERE n_nationkey < 5
UNION ALL
SELECT '192.0.2.' || CAST(r_regionkey AS {{STR}}),
       'fd00:0000:0000:' || {_G % '(n_nationkey % 5)'} || ':0000:0000:'
         || {_G % 'n_nationkey'} || ':', 112,
       '64496 64499 ' || CAST(66200 + n_nationkey AS {{STR}}),
       CAST(200 + ((n_nationkey * 11 + r_regionkey) % 50) AS BIGINT),
       CAST((n_nationkey * 17 + r_regionkey * 5) % 100 AS BIGINT),
       '64499:2:' || CAST(n_nationkey AS {{STR}}),
       n_nationkey % 4 = 3
FROM region CROSS JOIN nation WHERE n_nationkey < 16
"""

# RPKI ROA table fixture (the reference's rpki_roas_file /
# RTR-sourced ROA db, src/rpki/rpki_msg.c): (prefix, masklen, maxlen,
# origin asn). Shaped so validation against _BGP_RIB_SQL's routes
# yields all three statuses: /16 ROAs validate even-nation /16 routes
# (odd nations carry a non-matching origin -> invalid), the /20
# more-specifics are covered-but-wrong-origin except n=1 (validated
# by the /8 covering ROA's origin 66001), and the masklen-0 default
# routes are uncovered -> unknown.
_ROA_SQL = f"""
SELECT CAST({_BASE} + n_nationkey * 65536 AS BIGINT) AS net_int,
       16 AS masklen,
       CASE WHEN n_nationkey % 3 = 0 THEN 16 ELSE 20 END AS maxlen,
       CAST(CASE WHEN n_nationkey % 2 = 0
            THEN 65000 + n_nationkey ELSE 64999 END AS BIGINT) AS asn
FROM nation
UNION ALL
SELECT CAST({_BASE} AS BIGINT), 8, 24, CAST(66001 AS BIGINT)
FROM region WHERE r_regionkey = 0
"""

# flow_to_rd map (CONFIG-KEYS flow_to_rd_map; handlers in
# src/pretag_handlers.c): (exporter, input ifindex) -> MPLS VPN RD.
_FLOW_TO_RD_SQL = """
SELECT '192.0.2.' || CAST(r_regionkey AS {STR}) AS peer_ip,
       CAST(n_nationkey % 8 AS BIGINT) AS iface,
       '0:64512:' || CAST(r_regionkey * 8 + (n_nationkey % 8) AS {STR}) AS mpls_vpn_rd
FROM region CROSS JOIN nation
WHERE n_nationkey < 8
"""

NETWORKS_DUCK = _NETWORKS_SQL
GEOIP_DUCK = _GEOIP_SQL.replace("{STR}", "VARCHAR")
SAMPLING_MAP_DUCK = _SAMPLING_MAP_SQL.replace("{STR}", "VARCHAR")
NETWORKS6_DUCK = _NETWORKS6_SQL.replace("{HEX}", "to_hex")
BGP_RIB_DUCK = _BGP_RIB_SQL.replace("{STR}", "VARCHAR")

# Follow-nexthop RIB (bgp_follow_nexthop, reference
# src/bgp/bgp_lookup.c:480 bgp_follow_nexthop_lookup; CONFIG-KEYS:3040):
# a three-tier topology whose NEXT_HOP attributes chain through the
# 172.16.0.0/16 follow set so peer_dst_ip resolution recurses:
#   tier 1: edge peers 192.0.2.{r} (the flows' exporters). Per nation
#           /16 the next-hop is a route reflector 172.16.1.{n%3} —
#           except n%4==3, whose next-hop 203.0.113.{n} leaves the
#           follow set immediately (no recursion, fallback path). A
#           /20 more-specific per nation carries a DIFFERENT
#           reflector (172.16.1.{(n+1)%3}) so hop-1 LPM is observable.
#   tier 2: reflectors 172.16.1.{0,1,2}. n%5==0 rows SELF-REFERENCE
#           (next-hop = the reflector itself) exercising the
#           MAX_NH_SELF_REFERENCES=1 budget (src/bgp/bgp.h:90);
#           others forward to an exit router 172.16.2.{n%2}.
#   tier 3: exit routers 172.16.2.{0,1}; next-hops 198.51.100.{n}
#           leave the follow set — where the recursion terminates.
_NH_MIDS = "(SELECT 0 AS g UNION ALL SELECT 1 UNION ALL SELECT 2) mids"
_NH_EXITS = "(SELECT 0 AS g UNION ALL SELECT 1) exits"

_BGP_NH_RIB_SQL = f"""
SELECT '192.0.2.' || CAST(r_regionkey AS {{STR}}) AS peer_ip,
       CAST({_BASE} + n_nationkey * 65536 AS BIGINT) AS net_int,
       16 AS masklen,
       CASE WHEN n_nationkey % 4 = 3
            THEN '203.0.113.' || CAST(n_nationkey AS {{STR}})
            ELSE '172.16.1.' || CAST(n_nationkey % 3 AS {{STR}})
       END AS nexthop
FROM region CROSS JOIN nation
UNION ALL
SELECT '192.0.2.' || CAST(r_regionkey AS {{STR}}),
       CAST({_BASE} + n_nationkey * 65536
            + ((n_nationkey * 7) % 16) * 4096 AS BIGINT), 20,
       '172.16.1.' || CAST((n_nationkey + 1) % 3 AS {{STR}})
FROM region CROSS JOIN nation WHERE n_nationkey < 16
UNION ALL
SELECT '172.16.1.' || CAST(g AS {{STR}}),
       CAST({_BASE} + n_nationkey * 65536 AS BIGINT), 16,
       CASE WHEN n_nationkey % 5 = 0
            THEN '172.16.1.' || CAST(g AS {{STR}})
            ELSE '172.16.2.' || CAST(n_nationkey % 2 AS {{STR}})
       END
FROM nation CROSS JOIN {_NH_MIDS}
UNION ALL
SELECT '172.16.2.' || CAST(g AS {{STR}}),
       CAST({_BASE} + n_nationkey * 65536 AS BIGINT), 16,
       '198.51.100.' || CAST(n_nationkey AS {{STR}})
FROM nation CROSS JOIN {_NH_EXITS}
"""

# follow-default fixture (bgp_follow_default, bgp_lookup.c:403-476):
# exporter peers carry ONLY a default route to a parity-chosen
# gateway; gateway .9.0 holds every specific, gateway .9.1 holds only
# EVEN-nation specifics plus its own default to the second-level
# gateway .9.2 (which holds everything) — so depth 1 and depth 2
# recursions, budget exhaustion, and plain specifics all occur.
_BGP_FD_RIB_SQL = f"""
SELECT '192.0.2.' || CAST(r_regionkey AS {{STR}}) AS peer_ip,
       CAST(0 AS BIGINT) AS net_int, 0 AS masklen,
       '172.16.9.' || CAST(r_regionkey % 2 AS {{STR}}) AS nexthop,
       '64500' AS as_path
FROM region
UNION ALL
SELECT '172.16.9.0', CAST({_BASE} + n_nationkey * 65536 AS BIGINT), 16,
       CAST(NULL AS {{STR}}), '65000 ' || CAST(65100 + n_nationkey AS {{STR}})
FROM nation
UNION ALL
SELECT '172.16.9.1', CAST({_BASE} + n_nationkey * 65536 AS BIGINT), 16,
       CAST(NULL AS {{STR}}), '65001 ' || CAST(65200 + n_nationkey AS {{STR}})
FROM nation WHERE n_nationkey % 2 = 0
UNION ALL
SELECT '172.16.9.1', CAST(0 AS BIGINT), 0, '172.16.9.2', '64501'
UNION ALL
SELECT '172.16.9.2', CAST({_BASE} + n_nationkey * 65536 AS BIGINT), 16,
       CAST(NULL AS {{STR}}), '65002 ' || CAST(65300 + n_nationkey AS {{STR}})
FROM nation
"""


def bgp_fd_rib_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(
        spark, sf_dir, _BGP_FD_RIB_SQL.replace("{STR}", "STRING"),
        ["region", "nation"],
    )


BGP_FD_RIB_DUCK = _BGP_FD_RIB_SQL.replace("{STR}", "VARCHAR")
BGP_NH_RIB_DUCK = _BGP_NH_RIB_SQL.replace("{STR}", "VARCHAR")
BGP6_RIB_DUCK = _BGP6_RIB_SQL.replace("{STR}", "VARCHAR").replace("{HEX}", "to_hex")
ROA_DUCK = _ROA_SQL
FLOW_TO_RD_DUCK = _FLOW_TO_RD_SQL.replace("{STR}", "VARCHAR")


def _run(spark: SparkSession, sf_dir: str, sql: str, tables: list[str]) -> DataFrame:
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"__dim_{t}")
        sql = sql.replace(f"FROM {t}", f"FROM __dim_{t}")
        sql = sql.replace(f"CROSS JOIN {t}", f"CROSS JOIN __dim_{t}")
    return spark.sql(sql)


def networks_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(spark, sf_dir, _NETWORKS_SQL, ["region", "nation"])


def networks6_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(
        spark, sf_dir, _NETWORKS6_SQL.replace("{HEX}", "hex"), ["region", "nation"]
    )


def geoip_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(spark, sf_dir, _GEOIP_SQL.replace("{STR}", "STRING"), ["region"])


def sampling_map_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(spark, sf_dir, _SAMPLING_MAP_SQL.replace("{STR}", "STRING"), ["region"])


def bgp_rib_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(
        spark, sf_dir, _BGP_RIB_SQL.replace("{STR}", "STRING"), ["region", "nation"]
    )


def bgp_nh_rib_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(
        spark, sf_dir, _BGP_NH_RIB_SQL.replace("{STR}", "STRING"),
        ["region", "nation"],
    )


def roa_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(spark, sf_dir, _ROA_SQL, ["region", "nation"])


def bgp6_rib_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(
        spark,
        sf_dir,
        _BGP6_RIB_SQL.replace("{STR}", "STRING").replace("{HEX}", "hex"),
        ["region", "nation"],
    )


def flow_to_rd_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(
        spark, sf_dir, _FLOW_TO_RD_SQL.replace("{STR}", "STRING"), ["region", "nation"]
    )
