"""Golden-output scenario: the reference's 4xx composite family
(400/401-IPFIXv10-BMP-*-SRv6/MPLS-multiple-sources) — flows carrying
SRv6 segment lists AND MPLS labels on the IPFIX wire, from TWO
exporters, correlated with a BMP-fed multi-source RIB.

Pipeline: per-exporter BMP streams -> decode_bmp -> rib_state; dual
wire loops (encode_ipfix6 with_srv6 for the SRv6 flows,
encode_ipfix_mpls-equivalent template for the labeled flows) ->
decode_any_ext; per-exporter LPM enrichment; a golden aggregation
joining data-plane attributes (segment list, MPLS label) with
control-plane attributes (as_path) — each exporter's flows must see
ONLY its own peer's routes.
"""

from __future__ import annotations

import ipaddress
import struct

from pyspark.sql import functions as F

from pmacct_spark.operators.lpm import lpm_join
from pmacct_spark.streaming.bmp import decode_bmp, rib_state
from pmacct_spark.streaming.decode import decode_any_ext
from tests.test_streaming import _bgp_update, _bmp_msg

EXP_A, EXP_B = "192.0.2.21", "192.0.2.22"
PEER_A, PEER_B = 0xC0000215, 0xC0000216


def _rib(spark):
    """Exporter A's peer announces 10.1/16 via 64501; exporter B's
    peer announces the SAME prefix via a different path — isolation is
    the multiple-sources property under test."""
    a = _bmp_msg(3, PEER_A, 64501) + _bmp_msg(
        0, PEER_A, 64501, _bgp_update([], [(0x0A010000, 16)], as_path=(64501, 65010))
    )
    b = _bmp_msg(3, PEER_B, 64502) + _bmp_msg(
        0, PEER_B, 64502, _bgp_update([], [(0x0A010000, 16)], as_path=(64502, 65020))
    )
    dg = spark.createDataFrame(
        [(EXP_A, bytearray(a)), (EXP_B, bytearray(b))],
        "exporter_ip string, payload binary",
    )
    return rib_state(decode_bmp(dg))


def _v6(s):
    return ipaddress.IPv6Address(s).exploded


def _srv6_flows(spark):
    """SRv6 flows from exporter A through encode_ipfix6(with_srv6) —
    v6 wire with two vlen IEs per record."""
    from pmacct_spark.sinks.nfprobe import encode_ipfix6

    fl = spark.createDataFrame(
        [
            (_v6("2001:db8::a1"), _v6("2001:db8::a2"), _v6("2001:db8::1"),
             64, 48, 3, 400, 4, 1111, 443, 6, "vrf-a",
             ",".join((_v6("2001:db8::51"), _v6("2001:db8::52")))),
            (_v6("2001:db8::a3"), _v6("2001:db8::a4"), _v6("2001:db8::1"),
             64, 48, 4, 600, 6, 2222, 443, 6, "vrf-a",
             ",".join((_v6("2001:db8::51"), _v6("2001:db8::53")))),
        ],
        "ip6_src string, ip6_dst string, ip6_nexthop string, "
        "mask6_src int, mask6_dst int, flow_label int, bytes long, "
        "packets long, port_src int, port_dst int, ip_proto int, "
        "vrf_name string, srv6_segs string",
    )
    return decode_any_ext(
        encode_ipfix6(fl, exporter_ip=EXP_A, with_srv6=True).select(
            "exporter_ip", "payload"
        )
    )


def _mpls_flows(spark):
    """MPLS-labeled v4 flows from exporter B: hand-built IPFIX with
    label IEs 70/71 (3-byte, label in the top 20 bits) + dst + bytes."""
    tid = 290
    fields = [(70, 3), (71, 3), (12, 4), (1, 4), (2, 4), (4, 1)]
    tmpl = struct.pack("!HH", 2, 4 + 4 + 4 * len(fields)) + struct.pack(
        "!HH", tid, len(fields)
    ) + b"".join(struct.pack("!HH", *f) for f in fields)

    def rec(top, bot, dst, byt, pk, proto):
        return (
            ((top << 4) | 1).to_bytes(3, "big")
            + ((bot << 4) | 1).to_bytes(3, "big")
            + struct.pack("!IIIB", dst, byt, pk, proto)
        )

    data = rec(16001, 16002, 0x0A010505, 900, 9, 6) + rec(
        16001, 16003, 0x0A010606, 100, 1, 17
    )
    ds = struct.pack("!HH", tid, 4 + len(data)) + data
    payload = struct.pack(
        "!HHIII", 10, 16 + len(tmpl) + len(ds), 0, 1, 9
    ) + tmpl + ds
    dg = spark.createDataFrame(
        [(EXP_B, bytearray(payload))], "exporter_ip string, payload binary"
    )
    return decode_any_ext(dg)


def test_flow_bmp_srv6_mpls_multisource_golden(spark):
    rib = _rib(spark).withColumnRenamed("prefix", "net_int")

    # SRv6 flows (exporter A) target v6 dsts — no v4 RIB lookup; their
    # golden is the segment-list rendering straight off the wire
    srv6 = _srv6_flows(spark)
    got_srv6 = {
        r["srv6_seg_ipv6_list"]: (r["bytes"], r["flow_label"])
        for r in srv6.collect()
    }
    assert got_srv6 == {
        f"{_v6('2001:db8::51')},{_v6('2001:db8::52')}": (400, 3),
        f"{_v6('2001:db8::51')},{_v6('2001:db8::53')}": (600, 4),
    }

    # MPLS flows (exporter B) enrich against B's peer ONLY
    mpls = _mpls_flows(spark).withColumn("peer_src_ip", F.col("exporter_ip"))
    enriched = lpm_join(
        mpls, rib, "ip_dst_i",
        {"as_path": "dst_as_path"},
        default={"dst_as_path": "~"},
        extra_keys={"peer_src_ip": "peer_ip"},
    )
    got = {
        (r["mpls_label_top"], r["mpls_label_bottom"], r["dst_as_path"]): r["bytes"]
        for r in enriched.collect()
    }
    golden = {
        # both dsts fall in 10.1/16: B's path (64502 65020), never A's
        (16001, 16002, "64502 65020"): 900,
        (16001, 16003, "64502 65020"): 100,
    }
    assert got == golden


def test_multisource_rib_isolation(spark):
    """The same prefix announced by both peers keeps BOTH entries,
    keyed by peer — neither overwrites the other."""
    rib = _rib(spark)
    rows = {
        r["peer_ip"]: r["as_path"]
        for r in rib.filter(F.col("prefix") == 0x0A010000).collect()
    }
    assert rows == {"192.0.2.21": "64501 65010", "192.0.2.22": "64502 65020"}
