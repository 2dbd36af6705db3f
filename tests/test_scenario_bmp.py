"""Golden-output scenario: flows correlated with a BMP-fed RIB — the
reference's 4xx test family (tests/4xx flow+BMP, QUICKSTART BMP
correlation). End-to-end: BMP byte stream -> decode_bmp -> rib_state
compaction -> per-exporter LPM enrichment of flows -> aggregation,
compared against a hand-computed golden with the reference's
volatile-field masking approach (stamps excluded from compare)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pmacct_spark.operators.lpm import lpm_join
from pmacct_spark.streaming.bmp import decode_bmp, rib_state
from tests.test_streaming import _bgp_update, _bmp_msg

PEER_A = 0xC0000205  # 192.0.2.5
PEER_B = 0xC0000206  # 192.0.2.6


def _rib(spark):
    msgs_a = (
        _bmp_msg(3, PEER_A, 64500)
        # /8 covering route, then a /16 more-specific (longest must win)
        + _bmp_msg(0, PEER_A, 64500, _bgp_update([], [(0x0A000000, 8)], lp=50))
        + _bmp_msg(0, PEER_A, 64500, _bgp_update([], [(0x0A010000, 16)], lp=100))
        # re-announce the /16: latest attrs must win
        + _bmp_msg(0, PEER_A, 64500, _bgp_update([], [(0x0A010000, 16)], lp=300))
        # announce then withdraw: must not enrich anything
        + _bmp_msg(0, PEER_A, 64500, _bgp_update([], [(0x0A020000, 16)], lp=400))
        + _bmp_msg(0, PEER_A, 64500, _bgp_update([(0x0A020000, 16)], []))
    )
    msgs_b = (
        _bmp_msg(3, PEER_B, 64510)
        + _bmp_msg(
            0, PEER_B, 64510,
            _bgp_update([], [(0x0A010000, 16)], as_path=(64510, 65099), lp=77),
        )
    )
    dg = spark.createDataFrame(
        [("203.0.113.9", bytearray(msgs_a)), ("203.0.113.10", bytearray(msgs_b))],
        "exporter_ip string, payload binary",
    )
    return rib_state(decode_bmp(dg))


def test_flow_bmp_correlation_golden(spark):
    rib = _rib(spark).withColumnRenamed("prefix", "net_int")
    flows = spark.createDataFrame(
        [
            # exporter peering with A: 10.1.5.5 hits the /16 (lp 300)
            ("192.0.2.5", 0x0A010505, 100),
            # 10.9.9.9 falls through to the /8 (lp 50)
            ("192.0.2.5", 0x0A090909, 10),
            # 10.2.1.1: the /16 was withdrawn -> /8 covers it (lp 50)
            ("192.0.2.5", 0x0A020101, 1),
            # same dst ip seen from exporter B: B's RIB only (lp 77)
            ("192.0.2.6", 0x0A010505, 1000),
            # B has no /8: off-prefix traffic gets the default
            ("192.0.2.6", 0x0B000001, 7),
        ],
        "peer_src_ip string, ip_dst_int long, bytes long",
    )
    enriched = lpm_join(
        flows,
        rib,
        "ip_dst_int",
        {"local_pref": "local_pref", "as_path": "dst_as_path"},
        default={"local_pref": 0, "dst_as_path": "~"},
        extra_keys={"peer_src_ip": "peer_ip"},
    )
    got = {
        (r["peer_src_ip"], r["dst_as_path"], r["local_pref"]): r["bytes"]
        for r in enriched.groupBy("peer_src_ip", "dst_as_path", "local_pref")
        .agg(F.sum("bytes").alias("bytes"))
        .collect()
    }
    golden = {
        ("192.0.2.5", "64496 65001", 300): 100,   # /16 latest-wins
        ("192.0.2.5", "64496 65001", 50): 11,     # /8 fallback (10+1)
        ("192.0.2.6", "64510 65099", 77): 1000,   # peer-B RIB isolation
        ("192.0.2.6", "~", 0): 7,                 # no-match default
    }
    assert got == golden


def test_withdrawn_prefix_absent_from_rib(spark):
    rib = _rib(spark)
    assert rib.filter(F.col("prefix") == 0x0A020000).count() == 0
    # the /8 and the re-announced /16 survive for peer A, one route for B
    assert rib.filter("peer_ip = '192.0.2.5'").count() == 2
    assert rib.filter("peer_ip = '192.0.2.6'").count() == 1


def test_bmp_addpath_from_peer_up_opens(spark):
    """ADD-PATH over BMP (reference parses the session OPENs inside
    Peer Up, src/bmp/bmp_msg.c:382-438): RM NLRI for that peer parses
    per-path, the RIB keys per (peer, prefix, path_id), and a Peer
    Down ends the capability — a session re-established WITHOUT
    ADD-PATH parses plain NLRI again."""
    from pmacct_spark.streaming.bmp import (
        _bmp_frame,
        best_path,
        decode_bmp,
        encode_bgp_update,
        encode_bmp_peer_up,
        learn_bmp_caps,
        rib_state,
    )

    peer = "10.9.9.1"
    stream = (
        encode_bmp_peer_up(peer, addpath=[(1, 1, 3)])
        + _bmp_frame(0, peer, 64500, encode_bgp_update(
            0x0A000000, 8, "64999 65001", local_pref=90, path_id=1))
        + _bmp_frame(0, peer, 64500, encode_bgp_update(
            0x0A000000, 8, "65001", local_pref=100, path_id=2))
        + _bmp_frame(2, peer, 64500)  # peer down: caps die, RIB purges
        + encode_bmp_peer_up(peer)    # re-up WITHOUT add-path
        + _bmp_frame(0, peer, 64500, encode_bgp_update(
            0x0B000000, 8, "65002", local_pref=50))
    )
    dg = spark.createDataFrame(
        [("192.0.2.77", 0, bytearray(stream))],
        "exporter_ip string, seqno long, payload binary",
    )
    sess = dg.select("exporter_ip", "seqno", "payload")
    rib = rib_state(decode_bmp(sess))
    rows = {(r["prefix"], r["path_id"]): r for r in rib.collect()}
    # peer down purged the multi-path prefix; the post-down plain
    # announcement decoded WITHOUT the 4-byte shift
    assert set(rows) == {(0x0B000000, None)}
    assert rows[(0x0B000000, None)]["as_path"] == "65002"

    # without the peer down, both path entries survive per-path
    stream2 = (
        encode_bmp_peer_up(peer, addpath=[(1, 1, 3)])
        + _bmp_frame(0, peer, 64500, encode_bgp_update(
            0x0A000000, 8, "64999 65001", local_pref=90, path_id=1))
        + _bmp_frame(0, peer, 64500, encode_bgp_update(
            0x0A000000, 8, "65001", local_pref=100, path_id=2))
    )
    dg2 = spark.createDataFrame(
        [("192.0.2.77", 0, bytearray(stream2))],
        "exporter_ip string, seqno long, payload binary",
    )
    sess2 = dg2.select("exporter_ip", "seqno", "payload")
    # the pre-pass must learn the same caps (spool-spanning sessions)
    caps = learn_bmp_caps(sess2)
    assert caps == {("192.0.2.77", peer): {(1, 1)}}
    rib2 = rib_state(decode_bmp(sess2, session_caps=caps))
    per_path = {r["path_id"] for r in rib2.collect()}
    assert per_path == {1, 2}
    bp = best_path(rib2).collect()
    assert len(bp) == 1 and bp[0]["local_pref"] == 100
