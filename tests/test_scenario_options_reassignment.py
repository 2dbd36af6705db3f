"""Golden-output scenario: options-map reassignment under decode — the
reference's tests/112-IPFIXv10-CISCO-options-map-reassignment.

A router exports IPFIX Options Data records mapping its internal VRF
IDs to VRF names, MPLS VPN route distinguishers, and interface names;
later it REASSIGNS the same VRF ID keys to new values. Flow enrichment
must use the latest mapping — the reference bug this pins down was
cdada_map_insert() silently keeping the stale vrf_name_map / rd-map /
iface_name_map entries forever (fix commits cited in the scenario
README). Here: options wire bytes -> decode_options -> options_map
latest-wins compaction -> broadcast join onto flows decoded with the
vrf_id custom primitive (the reference's custom-primitives-00.map),
compared against hand-computed goldens.
"""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

from pmacct_spark.streaming.decode import (
    CustomIE,
    decode_any_custom,
    decode_options,
    options_map,
)

VRF_A = 1610612740  # the reference scenario's reassigned VRF ID
VRF_B = 1610612741

# options template 338: scope ingressVRFID(234, 4) ->
# vrfName(236, 16) + mplsVpnRD(90, 8) + interfaceName(82, 20)
_OT_TID = 338


def _opt_tmpl_set() -> bytes:
    body = struct.pack("!HHH", _OT_TID, 4, 1)
    body += struct.pack("!HH", 234, 4)  # scope
    for ie, ln in ((236, 16), (90, 8), (82, 20)):
        body += struct.pack("!HH", ie, ln)
    return struct.pack("!HH", 3, 4 + len(body)) + body


def _opt_data_set(rows: list[tuple[int, str, bytes, str]]) -> bytes:
    recs = b""
    for vrf_id, vrf_name, rd, iface in rows:
        recs += struct.pack("!I", vrf_id)
        recs += vrf_name.encode().ljust(16, b"\x00")
        recs += rd
        recs += iface.encode().ljust(20, b"\x00")
    return struct.pack("!HH", _OT_TID, 4 + len(recs)) + recs


def _msg(seq: int, sets: bytes) -> bytes:
    return struct.pack("!HHIII", 10, 16 + len(sets), 0, seq, 77) + sets


RD1 = bytes.fromhex("0002fbf0005a076d")
RD2 = bytes.fromhex("0002fbf0005a076e")
RD3 = bytes.fromhex("0002fbf0005a0770")


def _options_datagrams():
    """Round 1 maps both VRFs; round 2 (later seqno) reassigns VRF_A —
    name, RD, and interface all change, like the scenario pcap."""
    round1 = _msg(
        1,
        _opt_tmpl_set()
        + _opt_data_set(
            [
                (VRF_A, "A2_TEST_1", RD1, "TenGigE0/0/0/16.121"),
                (VRF_B, "B1_TEST_1", RD2, "TenGigE0/0/0/17.100"),
            ]
        ),
    )
    round2 = _msg(
        5, _opt_data_set([(VRF_A, "A2_TEST_2", RD3, "TenGigE0/0/0/16.122")])
    )
    return [("203.0.113.112", 1, bytearray(round1)),
            ("203.0.113.112", 5, bytearray(round2))]


def _flow_datagrams():
    """Flows stamped with the vrf_id custom primitive (IE 234 as a
    data-template field, the custom-primitives map the reference
    scenario mounts): two hit the reassigned VRF_A, one VRF_B."""
    tmpl = struct.pack("!HH", 2, 4 + 4 + 16) + struct.pack(
        "!HHHHHHHHHH", 260, 4, 234, 4, 1, 4, 2, 4, 4, 1
    )

    def rec(vrf, byt, pk, proto):
        return struct.pack("!IIIB", vrf, byt, pk, proto)

    data = rec(VRF_A, 1000, 10, 6) + rec(VRF_A, 500, 5, 17) + rec(VRF_B, 77, 1, 6)
    ds = struct.pack("!HH", 260, 4 + len(data)) + data
    return [("203.0.113.112", 9, bytearray(_msg(9, tmpl + ds)))]


def test_options_reassignment_golden(spark):
    dg_opts = spark.createDataFrame(
        _options_datagrams(),
        "exporter_ip string, seqno long, payload binary",
    ).coalesce(1)
    omap = options_map(
        decode_options(dg_opts.select("exporter_ip", "payload"))
    ).select(
        "exporter_ip", "scope_value", "vrf_name", "mpls_vpn_rd", "iface_name"
    )
    # the compacted map has exactly one row per VRF id, round-2 wins
    rows = {r["scope_value"]: r for r in omap.collect()}
    assert set(rows) == {VRF_A, VRF_B}
    assert rows[VRF_A]["vrf_name"] == "A2_TEST_2"
    assert rows[VRF_A]["mpls_vpn_rd"] == RD3.hex()
    assert rows[VRF_A]["iface_name"] == "TenGigE0/0/0/16.122"
    assert rows[VRF_B]["vrf_name"] == "B1_TEST_1"

    dg_flows = spark.createDataFrame(
        _flow_datagrams(), "exporter_ip string, seqno long, payload binary"
    ).coalesce(1)
    flows = decode_any_custom(
        dg_flows.select("exporter_ip", "payload"),
        [CustomIE("vrf_id_ingress", ie=234, semantics="u_int", length=4)],
    ).drop("vrf_name")  # FLOW6's (null) wire column; the map provides it
    enriched = flows.join(
        F.broadcast(
            omap.withColumnRenamed("exporter_ip", "opt_exporter")
        ),
        (flows["exporter_ip"] == F.col("opt_exporter"))
        & (flows["vrf_id_ingress"] == F.col("scope_value")),
        "left",
    )
    got = {
        (r["vrf_name"], r["mpls_vpn_rd"], r["iface_name"]): (
            r["bytes"], r["packets"], r["n"],
        )
        for r in enriched.groupBy("vrf_name", "mpls_vpn_rd", "iface_name")
        .agg(
            F.sum("bytes").alias("bytes"),
            F.sum("packets").alias("packets"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    golden = {
        # flows in the reassigned VRF carry the ROUND-2 exposition
        ("A2_TEST_2", RD3.hex(), "TenGigE0/0/0/16.122"): (1500, 15, 2),
        # the untouched VRF keeps its round-1 values
        ("B1_TEST_1", RD2.hex(), "TenGigE0/0/0/17.100"): (77, 1, 1),
    }
    assert got == golden


def test_options_map_is_per_exporter(spark):
    """Two exporters reusing the same VRF ID numbers must not cross:
    the map key is (exporter, scope_type, scope_value)."""
    r1 = _msg(
        1,
        _opt_tmpl_set()
        + _opt_data_set([(VRF_A, "EXP1_VRF", RD1, "Te0/0/0/1")]),
    )
    r2 = _msg(
        1,
        _opt_tmpl_set()
        + _opt_data_set([(VRF_A, "EXP2_VRF", RD2, "Te0/0/0/2")]),
    )
    dg = spark.createDataFrame(
        [("198.51.100.1", 0, bytearray(r1)), ("198.51.100.2", 1, bytearray(r2))],
        "exporter_ip string, seqno long, payload binary",
    ).coalesce(1)
    omap = options_map(decode_options(dg.select("exporter_ip", "payload")))
    got = {
        r["exporter_ip"]: r["vrf_name"] for r in omap.collect()
    }
    assert got == {"198.51.100.1": "EXP1_VRF", "198.51.100.2": "EXP2_VRF"}
