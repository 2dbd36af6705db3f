"""Golden scenarios for BMP peer-instance semantics — the reference's
200/201/204/205 test families:

- 204/205 (peer_down): a Peer Down Notification purges every route that
  peer announced before it; other peers are untouched; routes announced
  after the peer comes back survive (reference src/bmp/bmp_msg.c peer
  down handling).
- 201 (rd_instance): RD-instance peers (peer type 1) carry an 8-byte
  peer distinguisher; the same prefix under two RDs is two RIB entries,
  and the rendered RD matches the reference's "type:admin:value" form
  (src/bgp/bgp_lookup.c bgp_rd2str).
- 200 (locrib_instance): loc-RIB peers (peer type 3, RFC 9069) decode
  with a zero peer address and are selectable by peer_type.
"""

from __future__ import annotations

from pmacct_spark.streaming.bmp import decode_bmp, rib_state
from tests.test_streaming import _bgp_update, _bmp_msg

PEER_A = 0xC0000205  # 192.0.2.5
PEER_B = 0xC0000206  # 192.0.2.6


def _dg(spark, *streams):
    return spark.createDataFrame(
        [(exp, bytearray(msgs)) for exp, msgs in streams],
        "exporter_ip string, payload binary",
    )


def test_peer_down_purges_rib(spark):
    msgs = (
        _bmp_msg(3, PEER_A, 64500)  # A up
        + _bmp_msg(0, PEER_A, 64500, _bgp_update([], [(0x0A010000, 16)], lp=100))
        + _bmp_msg(0, PEER_A, 64500, _bgp_update([], [(0x0A020000, 16)], lp=200))
        + _bmp_msg(3, PEER_B, 64510)  # B up
        + _bmp_msg(0, PEER_B, 64510, _bgp_update([], [(0x0A030000, 16)], lp=70))
        + _bmp_msg(2, PEER_A, 64500)  # A down: both A routes must vanish
        + _bmp_msg(3, PEER_A, 64500)  # A back up
        + _bmp_msg(0, PEER_A, 64500, _bgp_update([], [(0x0A040000, 16)], lp=400))
    )
    rib = rib_state(decode_bmp(_dg(spark, ("203.0.113.9", msgs))))
    got = {
        (r.peer_ip, r.prefix, r.local_pref)
        for r in rib.collect()
    }
    assert got == {
        ("192.0.2.6", 0x0A030000, 70),   # B untouched by A's down
        ("192.0.2.5", 0x0A040000, 400),  # announced after A re-up
    }


def test_peer_down_scoped_to_one_exporter(spark):
    """The same peer IP seen from two BMP exporters is two sessions; a
    down on one exporter leaves the other exporter's RIB intact."""
    up = _bmp_msg(3, PEER_A, 64500) + _bmp_msg(
        0, PEER_A, 64500, _bgp_update([], [(0x0A010000, 16)], lp=100)
    )
    down = up + _bmp_msg(2, PEER_A, 64500)
    rib = rib_state(
        decode_bmp(_dg(spark, ("203.0.113.9", down), ("203.0.113.10", up)))
    )
    got = {(r.exporter_ip, r.prefix) for r in rib.collect()}
    assert got == {("203.0.113.10", 0x0A010000)}


def test_rd_instance_peers_keep_separate_rib_entries(spark):
    """tests/201: the same prefix announced under two RDs by the same
    peer address is two entries, each carrying its rendered RD; a peer
    down for ONE RD instance purges only that instance's routes."""
    rd1 = (0).to_bytes(2, "big") + (64512).to_bytes(2, "big") + (1).to_bytes(4, "big")
    rd2 = (0).to_bytes(2, "big") + (64512).to_bytes(2, "big") + (2).to_bytes(4, "big")
    msgs = (
        _bmp_msg(3, PEER_A, 64500, ptype=1, rd=rd1)
        + _bmp_msg(0, PEER_A, 64500, _bgp_update([], [(0x0A010000, 16)], lp=111),
                   ptype=1, rd=rd1)
        + _bmp_msg(3, PEER_A, 64500, ptype=1, rd=rd2)
        + _bmp_msg(0, PEER_A, 64500, _bgp_update([], [(0x0A010000, 16)], lp=222),
                   ptype=1, rd=rd2)
        + _bmp_msg(2, PEER_A, 64500, ptype=1, rd=rd2)  # down rd2 only
    )
    rib = rib_state(decode_bmp(_dg(spark, ("203.0.113.9", msgs))))
    got = {(r.rd, r.peer_type, r.prefix, r.local_pref) for r in rib.collect()}
    assert got == {("0:64512:1", 1, 0x0A010000, 111)}


def test_rd_render_forms(spark):
    """bgp_rd2str parity: type 0 (asn2:val4), 1 (ip:val2), 2 (asn4:val2)."""
    rd_t1 = (1).to_bytes(2, "big") + bytes([10, 0, 0, 1]) + (7).to_bytes(2, "big")
    rd_t2 = (2).to_bytes(2, "big") + (4200000000).to_bytes(4, "big") + (9).to_bytes(2, "big")
    msgs = (
        _bmp_msg(0, PEER_A, 64500, _bgp_update([], [(0x0A010000, 16)]),
                 ptype=1, rd=rd_t1)
        + _bmp_msg(0, PEER_B, 64510, _bgp_update([], [(0x0A020000, 16)]),
                   ptype=1, rd=rd_t2)
    )
    events = decode_bmp(_dg(spark, ("203.0.113.9", msgs)))
    got = {r.rd for r in events.collect()}
    assert got == {"1:10.0.0.1:7", "2:4200000000:9"}


def test_locrib_instance_peer(spark):
    """tests/200: a loc-RIB peer (type 3, RFC 9069) has a zero peer
    address and zero distinguisher; its routes land in the RIB flagged
    with peer_type=3, selectable separately from adj-RIB-in peers."""
    msgs = (
        _bmp_msg(3, 0, 0, ptype=3)
        + _bmp_msg(0, 0, 0, _bgp_update([], [(0x0A050000, 16)], lp=500), ptype=3)
        + _bmp_msg(3, PEER_A, 64500)
        + _bmp_msg(0, PEER_A, 64500, _bgp_update([], [(0x0A050000, 16)], lp=100))
    )
    rib = rib_state(decode_bmp(_dg(spark, ("203.0.113.9", msgs))))
    rows = {(r.peer_ip, r.peer_type, r.local_pref, r.rd) for r in rib.collect()}
    assert rows == {
        ("0.0.0.0", 3, 500, None),
        ("192.0.2.5", 0, 100, None),
    }
    assert rib.filter("peer_type = 3").count() == 1


def test_bmp_v6_peer_and_mp_routes(spark):
    """tests/401-402 family: a BMP per-peer header with the V flag
    carries a 16-byte peer address, and Route Monitoring UPDATEs with
    MP_REACH/MP_UNREACH_NLRI (RFC 4760) build v6 RIB entries; an
    MP_UNREACH withdrawal tombstones through the same compaction."""
    from pmacct_spark.streaming.bmp import encode_bgp_update6

    v6peer = bytes.fromhex("20010db8000000000000000000000009")
    msgs = (
        _bmp_msg(3, v6peer, 64600)
        + _bmp_msg(
            0, v6peer, 64600,
            encode_bgp_update6("fd00:0000:0000:0003:", 64, "64600 65003",
                               local_pref=90, med=4, lrg_comm="64600:9:3"),
        )
        + _bmp_msg(
            0, v6peer, 64600,
            encode_bgp_update6(
                "fd00:0000:0000:0002:0000:0000:000b:", 112, "64600 65002",
                local_pref=70),
        )
        + _bmp_msg(
            0, v6peer, 64600,
            encode_bgp_update6(
                "fd00:0000:0000:0002:0000:0000:000b:", 112, "",
                withdraw=True),
        )
    )
    rib = rib_state(decode_bmp(_dg(spark, ("203.0.113.9", msgs))))
    rows = rib.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.peer_ip == "2001:0db8:0000:0000:0000:0000:0000:0009"
    assert r.prefix6 == "fd00:0000:0000:0003:" and r.masklen == 64
    assert r.prefix is None
    assert (r.as_path, r.local_pref, r.med, r.lrg_comm) == (
        "64600 65003", 90, 4, "64600:9:3")


def test_extended_next_hop_v4_nlri_v6_nexthop(spark):
    """tests/300-extNH_enc (RFC 8950): v4 NLRI carried in MP_REACH
    AFI 1 with a 16-byte v6 next hop decodes as a v4 RIB entry whose
    next_hop6 column holds the rendered v6 address."""
    from pmacct_spark.streaming.bmp import _BGP_MARKER

    nh6 = bytes.fromhex("20010db8000000000000000000000001")
    # MP_REACH: afi 1, safi 1, nhlen 16, nh, reserved, NLRI 10.7.0.0/16
    mp = b"\x00\x01\x01\x10" + nh6 + b"\x00" + bytes([16, 10, 7])
    attrs = bytes([0x40, 1, 1, 0])                       # ORIGIN
    path = bytes([2, 1]) + (64777).to_bytes(4, "big")
    attrs += bytes([0x40, 2, len(path)]) + path          # AS_PATH
    attrs += bytes([0x80, 14, len(mp)]) + mp             # MP_REACH
    body = (0).to_bytes(2, "big") + len(attrs).to_bytes(2, "big") + attrs
    upd = _BGP_MARKER + (19 + len(body)).to_bytes(2, "big") + b"\x02" + body
    msgs = _bmp_msg(3, PEER_A, 64500) + _bmp_msg(0, PEER_A, 64500, upd)
    rib = rib_state(decode_bmp(_dg(spark, ("203.0.113.9", msgs))))
    rows = rib.collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.prefix, r.masklen, r.prefix6) == (0x0A070000, 16, None)
    assert r.next_hop6 == "2001:0db8:0000:0000:0000:0000:0000:0001"
    assert r.as_path == "64777"


def test_bmp_stats_and_init_term(spark):
    """208-family plumbing: Stats Reports (type 1, RFC 7854 §4.8)
    decode one row per counter TLV (32-bit counters and 64-bit gauges);
    Init/Term (4/5) carry information TLV strings and a Term reason."""
    stats_body = (
        (3).to_bytes(4, "big")
        + (0).to_bytes(2, "big") + (4).to_bytes(2, "big") + (17).to_bytes(4, "big")
        + (7).to_bytes(2, "big") + (8).to_bytes(2, "big") + (123456789012).to_bytes(8, "big")
        + (8).to_bytes(2, "big") + (8).to_bytes(2, "big") + (99).to_bytes(8, "big")
    )
    # stats message: reuse the peer-header builder with a raw body
    stats_msg = _bmp_msg(1, PEER_A, 64500, stats_body)
    init_body = (
        (1).to_bytes(2, "big") + (4).to_bytes(2, "big") + b"IOSv"      # sysDescr
        + (2).to_bytes(2, "big") + (3).to_bytes(2, "big") + b"rtr"     # sysName
    )
    init_msg = bytes([3]) + (6 + len(init_body)).to_bytes(4, "big") + bytes([4]) + init_body
    term_body = (1).to_bytes(2, "big") + (2).to_bytes(2, "big") + (1).to_bytes(2, "big")
    term_msg = bytes([3]) + (6 + len(term_body)).to_bytes(4, "big") + bytes([5]) + term_body

    ev = decode_bmp(
        _dg(spark, ("203.0.113.9", init_msg + stats_msg + term_msg))
    ).toPandas()
    stats = ev[ev.msg_type == 1].sort_values("seq")
    assert list(zip(stats.stat_type, stats.stat_value)) == [
        (0, 17), (7, 123456789012), (8, 99)]
    assert set(stats.peer_ip) == {"192.0.2.5"}
    assert list(ev[ev.msg_type == 4]["info"]) == ["IOSv | rtr"]
    assert list(ev[ev.msg_type == 5]["info"]) == ["reason:1"]
    # stats/init/term rows never leak into RIB state
    assert rib_state(decode_bmp(
        _dg(spark, ("203.0.113.9", init_msg + stats_msg + term_msg))
    )).count() == 0


def test_mp_v6_sub_nibble_prefixes_stay_distinct(spark):
    """Non-nibble-aligned v6 NLRI (/22) must keep the partial nibble
    in the canonical key: 2001:0800::/22 and 2001:0c00::/22 differ at
    bit 21, and a withdrawal of one must not tombstone the other
    (regression: the renderer floored to whole nibbles, colliding
    both on '2001:0')."""
    from pmacct_spark.streaming.bmp import encode_bgp_update6

    def upd(pfx_bytes, withdraw=False):
        from pmacct_spark.streaming.bmp import _v6_prefix_str
        return encode_bgp_update6(
            _v6_prefix_str(pfx_bytes, 22), 22, "64600 65003",
            local_pref=5, med=0, withdraw=withdraw)

    a = bytes.fromhex("20010800") + b"\x00" * 12
    b = bytes.fromhex("20010c00") + b"\x00" * 12
    msgs = (
        _bmp_msg(3, PEER_A, 64500)
        + _bmp_msg(0, PEER_A, 64500, upd(a))
        + _bmp_msg(0, PEER_A, 64500, upd(b))
        + _bmp_msg(0, PEER_A, 64500, upd(b, withdraw=True))
    )
    rib = rib_state(decode_bmp(_dg(spark, ("203.0.113.9", msgs))))
    rows = rib.collect()
    assert len(rows) == 1  # only the withdrawn one vanished
    assert rows[0].prefix6 == "2001:08"  # ceil(22/4)=6 nibbles kept


def test_bmp_bgp_decoders_survive_malformed_input(spark):
    """Poison datagrams (garbage, truncated messages, lying lengths,
    absurd masklens) must decode to zero-or-some rows, never crash the
    task — a single bad exporter cannot kill a run."""
    from pmacct_spark.streaming.bmp import decode_bgp

    good = _bmp_msg(0, PEER_A, 64500, _bgp_update([], [(0x0A010000, 16)]))
    poison = [
        b"",
        b"\x00" * 40,
        good[: len(good) // 2],                  # truncated mid-message
        bytes([3]) + (10**6).to_bytes(4, "big") + b"\x00" * 10,  # lying len
        _bmp_msg(0, PEER_A, 64500, b"\xff" * 19),  # garbage pdu
        _bmp_msg(1, PEER_A, 64500, (99).to_bytes(4, "big")),  # stats lying count
        # masklen 255 in NLRI
        _bmp_msg(0, PEER_A, 64500,
                 b"\xff" * 16 + (27).to_bytes(2, "big") + b"\x02"
                 + (0).to_bytes(2, "big") + (0).to_bytes(2, "big")
                 + bytes([255, 1, 2, 3])),
        good,  # a good message among the poison still decodes
    ]
    dg = spark.createDataFrame(
        [("198.51.100.66", bytearray(p)) for p in poison],
        "exporter_ip string, payload binary",
    )
    rows = decode_bmp(dg).collect()          # must not raise
    rows_bgp = decode_bgp(
        spark.createDataFrame(
            [("198.51.100.66", bytearray(b"".join(poison)))],
            "exporter_ip string, payload binary",
        )
    ).collect()                               # must not raise
    assert any(
        r.prefix == 0x0A010000 and r.masklen == 16 for r in rows
    )
    assert isinstance(rows_bgp, list)
