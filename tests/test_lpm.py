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
