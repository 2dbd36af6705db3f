"""Unit semantics of the LPM join strategies: longest wins, nested
more-specifics, default route, both physical plans agree (reference
src/net_aggr.c:455-490 binsearch + nested more-specifics :483)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pmacct_spark.operators.lpm import lpm_join, lpm_join_range


def ip(s: str) -> int:
    a, b, c, d = (int(x) for x in s.split("."))
    return (a << 24) | (b << 16) | (c << 8) | d


@pytest.fixture(scope="module")
def networks(spark):
    rows = [
        (0, 0, 64512),              # default route
        (ip("10.0.0.0"), 8, 65008),
        (ip("10.1.0.0"), 16, 65016),
        (ip("10.1.2.0"), 24, 65024),  # nested more-specific
        (ip("192.168.0.0"), 16, 65099),
    ]
    return spark.createDataFrame(rows, "net_int bigint, masklen int, asn bigint")


@pytest.fixture(scope="module")
def flows_df(spark):
    rows = [
        (1, ip("10.1.2.3")),    # matches /8, /16, /24 -> /24 wins
        (2, ip("10.1.9.9")),    # matches /8, /16 -> /16
        (3, ip("10.9.9.9")),    # matches /8
        (4, ip("172.16.0.1")),  # only default
    ]
    return spark.createDataFrame(rows, "fid int, ip bigint")


EXPECT = {1: 65024, 2: 65016, 3: 65008, 4: 64512}


def test_chained_broadcast_lpm(flows_df, networks):
    out = lpm_join(flows_df, networks, "ip", {"asn": "asn_lpm"})
    got = {r.fid: r.asn_lpm for r in out.collect()}
    assert got == EXPECT


def test_range_lpm_agrees(flows_df, networks):
    out = lpm_join_range(flows_df, networks, "ip", {"asn": "asn_lpm"}, "fid")
    got = {r.fid: r.asn_lpm for r in out.collect()}
    assert got == EXPECT


def test_no_default_route_yields_null(spark, flows_df, networks):
    nets = networks.filter(F.col("masklen") > 0)
    out = lpm_join(flows_df, nets, "ip", {"asn": "asn_lpm"})
    got = {r.fid: r.asn_lpm for r in out.collect()}
    assert got[4] is None


def test_plan_is_broadcast_only(flows_df, networks):
    """The chained strategy must not shuffle the fact table: every join
    is a BroadcastHashJoin (the scale-critical property)."""
    out = lpm_join(flows_df, networks, "ip", {"asn": "asn_lpm"})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# IPv6: arbitrary (non-16-bit-aligned, even non-nibble) masklens
# (reference binsearch handles any prefix length, src/net_aggr.c:455-490)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def networks6(spark):
    from pmacct_spark.operators.lpm import lpm6_join  # noqa: F401

    rows = [
        ("fd00:0", 20, 100),               # matches all fd00:0xxx::/20
        ("fd00:0000:000", 44, 200),        # nibble-aligned, mid-group
        ("fd00:0000:0008", 45, 300),       # SUB-NIBBLE: grp3 nib4 in 8..f
        ("fd00:0000:0000:00aa:", 64, 400),  # group-aligned
    ]
    return spark.createDataFrame(rows, "prefix6 string, masklen int, asn int")


@pytest.fixture(scope="module")
def flows6(spark):
    rows = [
        (1, "fd00:0000:0003:0001:0000:0000:0000:0001"),  # /44 (nib 3 -> 0)
        (2, "fd00:0000:0009:0001:0000:0000:0000:0001"),  # /45 beats /44
        (3, "fd00:0000:0000:00aa:0000:0000:0000:0001"),  # /64 beats /44
        (4, "fd00:0fff:0000:0000:0000:0000:0000:0001"),  # only /20
        (5, "fd01:0000:0000:0000:0000:0000:0000:0001"),  # nothing
    ]
    return spark.createDataFrame(rows, "fid int, ip6 string")


EXPECT6 = {1: 200, 2: 300, 3: 400, 4: 100, 5: None}


def test_lpm6_arbitrary_masklens(flows6, networks6):
    from pmacct_spark.operators.lpm import lpm6_join

    out = lpm6_join(flows6, networks6, "ip6", {"asn": "asn_lpm"})
    got = {r.fid: r.asn_lpm for r in out.collect()}
    assert got == EXPECT6


def test_lpm6_default_fallback(flows6, networks6):
    from pmacct_spark.operators.lpm import lpm6_join

    out = lpm6_join(
        flows6, networks6, "ip6", {"asn": "asn_lpm"}, default={"asn_lpm": 64512}
    )
    got = {r.fid: r.asn_lpm for r in out.collect()}
    assert got[5] == 64512 and got[2] == 300


def test_lpm6_plan_is_broadcast_only(flows6, networks6):
    from pmacct_spark.operators.lpm import lpm6_join

    out = lpm6_join(flows6, networks6, "ip6", {"asn": "asn_lpm"})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_rpki_validation_statuses(spark):
    """Hand-computed ROA matrix (reference src/rpki/rpki_lookup.c):
    maxlen boundary, multiple ROAs on one prefix, shorter-than-ROA
    routes uncovered, and invalid-despite-cover."""
    from pmacct_spark.operators.rpki import rpki_validate

    roa = spark.createDataFrame(
        [
            (0x0A010000, 16, 20, 65001),  # 10.1/16-20 AS65001
            (0x0A010000, 16, 16, 65002),  # same prefix, other origin
            (0x0AFF0000, 16, 16, 65009),
        ],
        "net_int long, masklen int, maxlen int, asn long",
    )
    routes = spark.createDataFrame(
        [
            ("r1", 0x0A010000, 16, 65001),  # covered, ml ok -> v
            ("r2", 0x0A010000, 16, 65002),  # second ROA validates -> v
            ("r3", 0x0A011000, 20, 65001),  # within maxlen 20 -> v
            ("r4", 0x0A011000, 20, 65002),  # maxlen 16 < 20 -> i
            ("r5", 0x0A011800, 21, 65001),  # beyond maxlen 20 -> i
            ("r6", 0x0A010000, 16, 65999),  # covered, wrong origin -> i
            ("r7", 0x0A000000, 8, 65001),   # SHORTER than ROA -> u
            ("r8", 0x0B000000, 16, 65001),  # no covering ROA -> u
        ],
        "rid string, net_int long, masklen int, origin_as long",
    )
    got = {
        r.rid: r.roa_status
        for r in rpki_validate(routes, roa).collect()
    }
    assert got == {
        "r1": "v", "r2": "v", "r3": "v", "r4": "i",
        "r5": "i", "r6": "i", "r7": "u", "r8": "u",
    }


def test_rpki_validation_empty_roa_table(spark):
    """An empty ROA table (e.g. an all-IPv6 export) marks every route
    unknown instead of crashing (regression: reduce over no terms)."""
    from pmacct_spark.operators.rpki import rpki_validate

    roa = spark.createDataFrame(
        [], "net_int long, masklen int, maxlen int, asn long"
    )
    routes = spark.createDataFrame(
        [("r1", 0x0A010000, 16, 65001)],
        "rid string, net_int long, masklen int, origin_as long",
    )
    assert [r.roa_status for r in rpki_validate(routes, roa).collect()] == ["u"]


# ---------------------------------------------------------------------------
# bgp_follow_nexthop recursive resolution (bgp_follow_nexthop_lookup
# src/bgp/bgp_lookup.c:480-666; MAX_HOPS_FOLLOW_NH / MAX_NH_SELF_REFERENCES
# src/bgp/bgp.h:89-90)
# ---------------------------------------------------------------------------

def _nh_rib(spark):
    # chain: edge(192.0.2.1) -> rr(172.16.1.1) -> exit(172.16.2.1)
    #        -> 198.51.100.9 (outside set); plus a self-referencing
    #        reflector 172.16.1.2 and a no-follow edge route
    return spark.createDataFrame(
        [
            ("192.0.2.1", 0x0A010000, 16, "172.16.1.1"),
            ("192.0.2.1", 0x0A020000, 16, "203.0.113.9"),  # not in set
            ("192.0.2.1", 0x0A030000, 16, "172.16.1.2"),   # -> self rr
            ("172.16.1.1", 0x0A010000, 16, "172.16.2.1"),
            ("172.16.1.2", 0x0A030000, 16, "172.16.1.2"),  # self-ref
            ("172.16.2.1", 0x0A010000, 16, "198.51.100.9"),
        ],
        "peer_ip string, net_int long, masklen int, nexthop string",
    )


def test_follow_nexthop_modes_and_self_budget(spark):
    from pmacct_spark.operators.lpm import follow_nexthop_join

    fl = spark.createDataFrame(
        [
            ("f1", "192.0.2.1", 0x0A010005),  # 2-hop chain
            ("f2", "192.0.2.1", 0x0A020005),  # first nh outside set
            ("f3", "192.0.2.1", 0x0A030005),  # self-referencing rr
            ("f4", "192.0.2.1", 0x0BFF0005),  # no route at all
        ],
        "fid string, peer string, dst long",
    )
    out = follow_nexthop_join(
        fl, _nh_rib(spark), "dst", "peer", ["172.16.0.0/16"],
        out_col="pdi", external_col="pdi_ext",
    )
    got = {r.fid: (r.pdi, r.pdi_ext) for r in out.collect()}
    # follow: last in-set nexthop; external: first OUT-of-set nexthop
    assert got["f1"] == ("172.16.2.1", "198.51.100.9")
    # no recursion: both collapse to the first lookup's nexthop
    # (bgp_nexthop_info NULL -> bgp_dst_info, pkt_handlers.c:1463)
    assert got["f2"] == ("203.0.113.9", "203.0.113.9")
    # one self-reference allowed, then following stops entirely
    assert got["f3"] == ("172.16.1.2", "172.16.1.2")
    assert got["f4"] == (None, None)


def test_follow_nexthop_max_hops_caps_chain(spark):
    """A long in-set chain is cut at max_hops follows, like ttl=20."""
    from pmacct_spark.operators.lpm import follow_nexthop_join

    rows = [("192.0.2.1", 0x0A010000, 16, "172.16.0.0")]
    rows += [
        (f"172.16.0.{i}", 0x0A010000, 16, f"172.16.0.{i + 1}")
        for i in range(6)
    ]
    rib = spark.createDataFrame(
        rows, "peer_ip string, net_int long, masklen int, nexthop string"
    )
    fl = spark.createDataFrame(
        [("f1", "192.0.2.1", 0x0A010005)],
        "fid string, peer string, dst long",
    )
    out = follow_nexthop_join(
        fl, rib, "dst", "peer", ["172.16.0.0/16"],
        out_col="pdi", max_hops=3,
    )
    # lookups: edge, .0, .1, then cut -> last followed nexthop is .2
    assert out.collect()[0].pdi == "172.16.0.2"


def test_follow_nexthop_plan_is_broadcast_only(spark):
    """Every unrolled hop must stay a broadcast probe: the fact table
    never shuffles regardless of recursion depth."""
    from pmacct_spark.operators.lpm import follow_nexthop_join

    fl = spark.createDataFrame(
        [("f1", "192.0.2.1", 0x0A010005)],
        "fid string, peer string, dst long",
    )
    out = follow_nexthop_join(
        fl, _nh_rib(spark), "dst", "peer", ["172.16.0.0/16"]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Exchange hashpartitioning" not in plan


def test_follow_default_budget_and_self_gateway(spark):
    """bgp_follow_default (bgp_lookup.c:403-476): the default-route
    gateway answers recursively up to the budget; with the budget
    spent the default route's own match STANDS (the reference clears
    bgp_dst only while follow_default is positive); a self-referential
    default gateway stops immediately."""
    from pmacct_spark.operators.lpm import follow_default_join, lpm_join

    rib = spark.createDataFrame(
        [
            # exporter: default only -> gw1
            ("192.0.2.1", 0, 0, "10.9.9.1", "64500"),
            # gw1: default only -> gw2
            ("10.9.9.1", 0, 0, "10.9.9.2", "64501"),
            # gw2: the specific
            ("10.9.9.2", 0x0A000000, 8, None, "65010 65020"),
            # exporter with a SELF default gateway: stops at itself
            ("192.0.2.9", 0, 0, "192.0.2.9", "64509"),
        ],
        "peer_ip string, net_int long, masklen int, nexthop string,"
        " as_path string",
    )
    fl = spark.createDataFrame(
        [("192.0.2.1", 0x0A000001), ("192.0.2.9", 0x0A000001)],
        "peer_ip_src string, ip_dst_i long",
    )

    def resolve(budget):
        fd = follow_default_join(
            fl, rib.select("peer_ip", "net_int", "masklen", "nexthop"),
            "ip_dst_i", "peer_ip_src", budget,
        )
        got = lpm_join(
            fd, rib, "ip_dst_i", {"as_path": "as_path"},
            default={"as_path": ""}, extra_keys={"__fd_peer": "peer_ip"},
        )
        return {
            r["peer_ip_src"]: r["as_path"] for r in got.collect()
        }

    # budget 2: exporter -> gw1 -> gw2's specific
    assert resolve(2)["192.0.2.1"] == "65010 65020"
    # budget 1: stops at gw1 — its default route's attrs stand
    assert resolve(1)["192.0.2.1"] == "64501"
    # budget 0: no following at all
    assert resolve(0)["192.0.2.1"] == "64500"
    # self-gateway never follows, any budget
    assert resolve(2)["192.0.2.9"] == "64509"
