"""Property: the pre_tag_map ip= CIDR match agrees with the stdlib
ipaddress containment check for arbitrary prefixes and exporter
addresses (the compiled when/otherwise expression must prefix-match
exactly like the reference's trie walk)."""

from __future__ import annotations

import ipaddress

from hypothesis import given, settings, strategies as st

from pmacct_spark.conffile import parse_pretag_map
from pmacct_spark.operators.pretag import apply_pretag


@given(
    st.integers(min_value=0, max_value=(1 << 32) - 1),
    st.integers(min_value=1, max_value=31),
    st.lists(st.integers(min_value=0, max_value=(1 << 32) - 1),
             min_size=1, max_size=8),
)
@settings(max_examples=15, deadline=None)
def test_pretag_cidr_matches_ipaddress(spark, net, masklen, addrs):
    network = ipaddress.ip_network((net, masklen), strict=False)
    rules = parse_pretag_map(f"set_tag=7 ip={network.with_prefixlen}\n")
    rows = [(str(ipaddress.ip_address(a)),) for a in addrs]
    df = spark.createDataFrame(rows, "peer_src_ip string")
    got = {r.peer_src_ip: r.tag for r in apply_pretag(df, rules).collect()}
    for a in addrs:
        addr = ipaddress.ip_address(a)
        want = 7 if addr in network else 0
        assert got[str(addr)] == want, (str(network), str(addr))
