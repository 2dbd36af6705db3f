"""Live TCP session ingest: a BGP peer connects to the collector
socket, streams UPDATE messages (with reads split MID-MESSAGE), and
the spooled session decodes into the same RIB the fixture-driven path
builds — the pmbgpd socket half (reference src/bgp/bgp.c:99), live.
Plus the BMP framing walker and boundary-alignment unit checks.
"""

from __future__ import annotations

import socket
import time

from pmacct_spark.sources.tcp import (
    TcpSpool,
    complete_prefix_bgp,
    complete_prefix_bmp,
)
from pmacct_spark.streaming.bmp import (
    decode_bgp,
    encode_bgp_update,
    rib_state,
)


def test_complete_prefix_walkers():
    m1 = encode_bgp_update(0x0A000000, 8, "65000")
    m2 = encode_bgp_update(0x0A010000, 16, "65001")
    both = m1 + m2
    assert complete_prefix_bgp(both) == len(both)
    # split mid-second-message: only the first is complete
    assert complete_prefix_bgp(both[: len(m1) + 10]) == len(m1)
    assert complete_prefix_bgp(b"garbage") == 0
    # bmp framing: [3][len4][type]
    bmp = bytes([3]) + (10).to_bytes(4, "big") + b"\x00" + b"x" * 4
    assert complete_prefix_bmp(bmp + bmp[:5]) == len(bmp)


def _wait(pred, timeout=15.0):
    t0 = time.monotonic()
    while not pred() and time.monotonic() - t0 < timeout:
        time.sleep(0.05)
    return pred()


def test_live_bgp_session_builds_rib(spark, tmp_path):
    msgs = [
        encode_bgp_update(0x0A000000, 8, "65000 65100", std_comm="65000:1"),
        encode_bgp_update(0x0A010000, 16, "65000 65200"),
        # re-announce with new attrs: latest must win
        encode_bgp_update(0x0A010000, 16, "65000 65300", std_comm="65000:3"),
    ]
    stream_bytes = b"".join(msgs)
    with TcpSpool(
        framing="bgp", spool_dir=str(tmp_path / "bgp_spool")
    ) as sp:
        c = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        c.connect(("127.0.0.1", sp.port))
        # deliberately split mid-message across two sends with a pause
        # longer than the flush cadence, forcing the boundary logic
        cut = len(msgs[0]) + 7
        c.sendall(stream_bytes[:cut])
        time.sleep(0.5)
        c.sendall(stream_bytes[cut:])
        c.close()
        assert _wait(lambda: sp.messages_spooled >= 2)
        time.sleep(0.3)  # let the close-flush land
        dg = sp.batch(spark)
        assert dg.count() >= 2
    # pass seqno: the spool's global order makes latest-wins correct
    # even when the session files land in different partitions
    rib = rib_state(
        decode_bgp(dg.select("exporter_ip", "seqno", "payload").repartition(4))
    )
    rows = {r["prefix"]: r for r in rib.collect()}
    assert set(rows) == {0x0A000000, 0x0A010000}
    assert rows[0x0A000000]["as_path"] == "65000 65100"
    assert rows[0x0A000000]["std_comm"] == "65000:1"
    # the re-announcement (second send) replaced the attrs
    assert rows[0x0A010000]["as_path"] == "65000 65300"
    assert rows[0x0A010000]["std_comm"] == "65000:3"
    # peer identity = the session's remote address
    assert rib.select("peer_ip").distinct().first()[0] == "127.0.0.1"


def test_garbage_session_is_bounded_and_dropped(spark, tmp_path):
    """A desynced peer (bytes that never frame a complete message)
    must not grow the session buffer without bound: past max_buffer
    the session is dropped and counted, and nothing is spooled."""
    with TcpSpool(
        framing="bgp", spool_dir=str(tmp_path / "junk_spool"),
        max_buffer=10_000,
    ) as sp:
        c = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        c.connect(("127.0.0.1", sp.port))
        c.sendall(b"\x00" * 50_000)  # never a BGP marker
        t0 = time.monotonic()
        while sp.sessions_dropped < 1 and time.monotonic() - t0 < 15:
            time.sleep(0.05)
        c.close()
        assert sp.sessions_dropped == 1
        assert sp.messages_spooled == 0


def test_session_reset_clears_previous_routes(spark, tmp_path):
    """A peer that disconnects and reconnects starts a NEW BGP
    session: routes announced over the old connection are obsolete
    (no graceful restart — reference src/bgp/bgp.c clears the peer's
    RIB on teardown). The spool's per-peer connection epoch makes the
    reader keep only the newest session."""
    import socket as _sock
    import time as _time

    from pmacct_spark.sources.tcp import TcpSpool, latest_session_only

    sp = TcpSpool(framing="bgp", spool_dir=str(tmp_path / "sess")).start()
    try:
        def send(msgs):
            c = _sock.socket(_sock.AF_INET, _sock.SOCK_STREAM)
            c.connect(("127.0.0.1", sp.port))
            c.sendall(msgs)
            c.close()

        before = sp.messages_spooled
        send(encode_bgp_update(0x0A000000, 8, "65000 65100")
             + encode_bgp_update(0x0B000000, 8, "65000 65150"))
        t0 = _time.monotonic()
        while sp.messages_spooled == before and _time.monotonic() - t0 < 15:
            _time.sleep(0.05)
        # reconnect: only one route re-announced
        before = sp.messages_spooled
        send(encode_bgp_update(0x0A000000, 8, "65000 65200"))
        t0 = _time.monotonic()
        while sp.messages_spooled == before and _time.monotonic() - t0 < 15:
            _time.sleep(0.05)

        dg = latest_session_only(sp.batch(spark))
        rib = rib_state(
            decode_bgp(dg.select("exporter_ip", "seqno", "payload")),
            peer_down=False,
        )
        rows = rib.collect()
    finally:
        sp.stop()
    # 0x0B/8 from the dead session is gone; 0x0A/8 carries the NEW
    # session's path
    assert {(r.prefix, r.as_path) for r in rows} == {
        (0x0A000000, "65000 65200")
    }


def test_live_bgp_addpath_session(spark, tmp_path):
    """RFC 7911 over a LIVE socket: the peer's OPEN advertises
    ADD-PATH (v4/unicast), every prefix arrives twice with distinct
    path-ids, the RIB keeps BOTH entries, and best-path selection
    yields the higher-local-pref path for enrichment."""
    from pmacct_spark.streaming.bmp import best_path, encode_bgp_open

    msgs = [
        encode_bgp_open(addpath=[(1, 1, 3)]),
        # two paths for 10.0.0.0/8: path 1 loses on local_pref
        encode_bgp_update(0x0A000000, 8, "64999 65000 65100",
                          local_pref=90, path_id=1),
        encode_bgp_update(0x0A000000, 8, "65000 65100",
                          local_pref=100, path_id=2),
        # two paths for 10.1.0.0/16: BEST first, decoy second — a
        # latest-wins RIB (not keyed per path) would keep the decoy
        encode_bgp_update(0x0A010000, 16, "65000 65200",
                          local_pref=100, path_id=7),
        encode_bgp_update(0x0A010000, 16, "64999 65000 65200",
                          local_pref=90, path_id=8),
    ]
    stream_bytes = b"".join(msgs)
    with TcpSpool(
        framing="bgp", spool_dir=str(tmp_path / "bgp_ap_spool")
    ) as sp:
        c = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        c.connect(("127.0.0.1", sp.port))
        # split mid-UPDATE to exercise framing under the capability
        cut = len(msgs[0]) + len(msgs[1]) + 11
        c.sendall(stream_bytes[:cut])
        time.sleep(0.5)
        c.sendall(stream_bytes[cut:])
        c.close()
        assert _wait(lambda: sp.messages_spooled >= 2)
        time.sleep(0.3)
        dg = sp.batch(spark)
        assert dg.count() >= 2
    from pmacct_spark.streaming.bmp import learn_bgp_caps

    sess = dg.select("exporter_ip", "seqno", "payload")
    # the OPEN chunk and UPDATE chunks land in separate spool files
    # (separate partitions): the capability pre-pass covers that
    rib = rib_state(
        decode_bgp(sess, session_caps=learn_bgp_caps(sess)),
        peer_down=False,
    )
    per_path = {
        (r["prefix"], r["path_id"]): r for r in rib.collect()
    }
    # BOTH path entries per prefix survive in the RIB (the dump view)
    assert set(per_path) == {
        (0x0A000000, 1), (0x0A000000, 2),
        (0x0A010000, 7), (0x0A010000, 8),
    }
    assert per_path[(0x0A000000, 1)]["as_path"] == "64999 65000 65100"
    # best-path collapse for enrichment: higher local_pref wins in
    # both emit orders
    bp = {r["prefix"]: r for r in best_path(rib).collect()}
    assert bp[0x0A000000]["as_path"] == "65000 65100"
    assert bp[0x0A000000]["local_pref"] == 100
    assert bp[0x0A010000]["as_path"] == "65000 65200"
    assert bp[0x0A010000]["local_pref"] == 100


def test_bgp_addpath_v6_mp_nlri(spark):
    """ADD-PATH for the v6 MP AFI: OPEN negotiates (2,1); MP_REACH /
    MP_UNREACH NLRI entries carry the 4-byte path-id; per-path RIB
    rows with v6 prefixes; best-path collapse."""
    from pmacct_spark.streaming.bmp import (
        best_path,
        encode_bgp_open,
        encode_bgp_update6,
        learn_bgp_caps,
    )

    stream = (
        encode_bgp_open(addpath=[(2, 1, 3)])
        + encode_bgp_update6("2001:0db8:", 32, "64999 65001",
                             local_pref=90, path_id=1)
        + encode_bgp_update6("2001:0db8:", 32, "65001",
                             local_pref=100, path_id=2)
        # withdraw the decoy path only: the best path must survive
        + encode_bgp_update6("2001:0db8:", 32, "", withdraw=True, path_id=1)
    )
    dg = spark.createDataFrame(
        [("198.51.100.1", 0, bytearray(stream))],
        "exporter_ip string, seqno long, payload binary",
    )
    sess = dg.select("exporter_ip", "seqno", "payload")
    rib = rib_state(
        decode_bgp(sess, session_caps=learn_bgp_caps(sess)), peer_down=False
    )
    rows = {r["path_id"]: r for r in rib.collect()}
    # path 1 withdrawn per-path; path 2 remains
    assert set(rows) == {2}
    assert rows[2]["prefix6"].startswith("2001:0db8")
    assert rows[2]["as_path"] == "65001"
    bp = best_path(rib).collect()
    assert len(bp) == 1 and bp[0]["local_pref"] == 100


def test_xconnect_proxy_forwards_session_to_collector(spark, tmp_path):
    """bgp_daemon_xconnect_map (reference CONFIG-KEYS:3265): an edge
    router peers with the PROXY; its raw session bytes cross-connect
    1:1 to the collector, whose RIB must decode them exactly as if
    directly peered. Also pins the reference's refusal semantics: a
    second session from an xconnected peer IP is refused
    (src/bgp/bgp.c:948), an unmapped peer is dropped
    (src/bgp/bgp_util.c:837)."""
    from pmacct_spark.conffile import parse_bgp_xconnect_map
    from pmacct_spark.sources.xconnect import BgpXconnectProxy

    with TcpSpool(
        framing="bgp", spool_dir=str(tmp_path / "far_spool")
    ) as collector:
        entries = parse_bgp_xconnect_map(
            f"! edge routers on loopback net\n"
            f"bgp_dst=127.0.0.1:{collector.port}  bgp_src=127.0.0.0/31\n"
        )
        with BgpXconnectProxy(entries) as proxy:
            c = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            c.connect(("127.0.0.1", proxy.port))
            msg = encode_bgp_update(0x0A000000, 8, "65000 65100")
            # split mid-message: the proxy must NOT reframe — the far
            # collector's boundary walker handles it
            c.sendall(msg[:11])
            time.sleep(0.3)
            c.sendall(msg[11:])
            assert _wait(lambda: collector.messages_spooled >= 1)

            # second session from the same peer IP: refused
            c2 = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            c2.connect(("127.0.0.1", proxy.port))
            assert _wait(lambda: proxy.refused_existing >= 1)
            assert c2.recv(1) == b""  # closed by the proxy
            c2.close()
            c.close()

            rib = rib_state(decode_bgp(collector.batch(spark)))
            rows = rib.collect()
            assert len(rows) == 1
            assert rows[0]["as_path"] == "65000 65100"

        # unmapped peer: no entry covers 127.0.0.2 -> dropped
        with BgpXconnectProxy(
            parse_bgp_xconnect_map(
                f"bgp_dst=127.0.0.1:{collector.port} bgp_src=127.0.0.2/32"
            )
        ) as proxy2:
            c3 = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            c3.connect(("127.0.0.1", proxy2.port))
            assert _wait(lambda: proxy2.refused_unmapped >= 1)
            assert c3.recv(1) == b""
            c3.close()
            assert proxy2.sessions_started == 0


def test_xconnect_proxy_pumps_collector_to_peer(tmp_path):
    """The cross-connect is BIDIRECTIONAL (src/bgp/bgp.c:1003-1009
    reads the xconnect_fd side too): bytes the collector sends — e.g.
    its OPEN/KEEPALIVE half of the FSM — must reach the edge router."""
    from pmacct_spark.conffile import parse_bgp_xconnect_map
    from pmacct_spark.sources.xconnect import BgpXconnectProxy

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    entries = parse_bgp_xconnect_map(
        f"bgp_dst=127.0.0.1:{srv.getsockname()[1]} bgp_src=127.0.0.1"
    )
    with BgpXconnectProxy(entries) as proxy:
        c = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        c.connect(("127.0.0.1", proxy.port))
        far, _ = srv.accept()
        c.sendall(b"to-collector")
        got = far.recv(64)
        assert got == b"to-collector"
        far.sendall(b"to-peer")
        c.settimeout(5)
        assert c.recv(64) == b"to-peer"
        c.close()
        far.close()
    srv.close()


def test_tcp_md5_listener_accepts_keyed_rejects_unkeyed(spark, tmp_path):
    """bgp_daemon_md5_file (reference CONFIG-KEYS:3079, RFC 2385):
    with a key registered for 127.0.0.1, a client signing with the
    same key completes the session and its UPDATE spools; a client
    with no key never completes the TCP handshake — the kernel drops
    its unsigned SYNs, so the application sees NOTHING (exactly the
    failure mode the reference documents). Live kernel TCP_MD5SIG on
    both ends."""
    from pmacct_spark.sources.tcp import set_tcp_md5

    with TcpSpool(
        framing="bgp",
        spool_dir=str(tmp_path / "md5_spool"),
        md5_keys={"127.0.0.1": b"arealsmartpwd"},
    ) as sp:
        good = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        set_tcp_md5(good, "127.0.0.1", b"arealsmartpwd")
        good.connect(("127.0.0.1", sp.port))
        good.sendall(encode_bgp_update(0x0A000000, 8, "65000"))
        assert _wait(lambda: sp.messages_spooled >= 1)
        good.close()

        bad = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        bad.settimeout(1.5)
        try:
            bad.connect(("127.0.0.1", sp.port))
            connected = True
        except OSError:
            connected = False
        bad.close()
        assert not connected
        rib = rib_state(decode_bgp(sp.batch(spark)))
        assert {r["as_path"] for r in rib.collect()} == {"65000"}


def test_parse_proxy_header_unit():
    """PROXY v1/v2 parse shapes (reference src/network.c:33): v2
    PROXY/LOCAL commands, v1 TCP4/UNKNOWN, absent header, and a read
    boundary falling inside the header."""
    import socket as _s

    from pmacct_spark.sources.tcp import PROXY_V2_SIG, parse_proxy_header

    v2 = (
        PROXY_V2_SIG + bytes([0x21, 0x11]) + (12).to_bytes(2, "big")
        + _s.inet_aton("192.0.2.99") + _s.inet_aton("10.0.0.1")
        + (34567).to_bytes(2, "big") + (5000).to_bytes(2, "big")
    )
    assert parse_proxy_header(v2 + b"tail") == (len(v2), "192.0.2.99", False)
    # LOCAL command (health check): consume, keep socket address
    local = PROXY_V2_SIG + bytes([0x20, 0x00]) + (0).to_bytes(2, "big")
    assert parse_proxy_header(local + b"x") == (16, None, False)
    # v1 text form
    v1 = b"PROXY TCP4 198.51.100.7 10.0.0.1 4711 5000\r\n"
    assert parse_proxy_header(v1 + b"rest") == (len(v1), "198.51.100.7", False)
    assert parse_proxy_header(b"PROXY UNKNOWN\r\nrest") == (15, None, False)
    # absent header: BMP version byte 3 first
    assert parse_proxy_header(b"\x03\x00\x00\x00\x06\x00") == (0, None, False)
    # split inside the header: need more bytes
    assert parse_proxy_header(v2[:9]) == (0, None, True)
    assert parse_proxy_header(v1[:20]) == (0, None, True)


def test_proxy_header_replaces_peer_identity_live(spark, tmp_path):
    """bmp_daemon_parse_proxy_header live: a 'load balancer' client
    prepends a PROXY v2 header naming the real router 192.0.2.99 —
    the spooled session must carry THAT identity, not the socket's
    127.0.0.1; a v1 header and a headerless session interleave on the
    same listener."""
    import socket as _s

    from pmacct_spark.sources.tcp import PROXY_V2_SIG

    bmp_msg = bytes([3]) + (7).to_bytes(4, "big") + bytes([0]) + b"\x01"
    with TcpSpool(
        framing="bmp",
        spool_dir=str(tmp_path / "px_spool"),
        proxy_header=True,
    ) as sp:
        v2 = (
            PROXY_V2_SIG + bytes([0x21, 0x11]) + (12).to_bytes(2, "big")
            + _s.inet_aton("192.0.2.99") + _s.inet_aton("10.0.0.1")
            + (34567).to_bytes(2, "big") + (5000).to_bytes(2, "big")
        )
        c = _s.socket(_s.AF_INET, _s.SOCK_STREAM)
        c.connect(("127.0.0.1", sp.port))
        # split INSIDE the proxy header to exercise need_more
        c.sendall(v2[:9])
        time.sleep(0.3)
        c.sendall(v2[9:] + bmp_msg)
        c.close()

        c2 = _s.socket(_s.AF_INET, _s.SOCK_STREAM)
        c2.connect(("127.0.0.1", sp.port))
        c2.sendall(b"PROXY TCP4 198.51.100.7 10.0.0.1 4711 5000\r\n" + bmp_msg)
        c2.close()

        c3 = _s.socket(_s.AF_INET, _s.SOCK_STREAM)
        c3.connect(("127.0.0.1", sp.port))
        c3.sendall(bmp_msg)  # no header: socket identity stays
        c3.close()
        assert _wait(lambda: sp.messages_spooled >= 3)
        rows = sp.batch(spark).select("exporter_ip").collect()
    got = sorted(r["exporter_ip"] for r in rows)
    assert got == ["127.0.0.1", "192.0.2.99", "198.51.100.7"]


def test_daemon_wires_bmp_proxy_header_flag(spark, tmp_path):
    from pmacct_spark.daemon import Daemon

    d = Daemon.from_conf(
        spark,
        """
nfacctd_port: 0
bmp_daemon: true
bmp_daemon_port: 0
bmp_daemon_parse_proxy_header: true
""",
        spool_dir=str(tmp_path / "spool_px"),
    )
    try:
        assert d.bmp_spool.proxy_header is True
    finally:
        d.stop()


def test_xconnect_inbound_md5_outbound_clear(spark, tmp_path):
    """The reference's exact TCP-MD5 support matrix for BGP proxying
    (CONFIG-KEYS:3272): inbound sessions to the proxy are signed via
    bgp_daemon_md5_file, the outbound leg to the collector is NOT.
    Live: keyed edge router -> MD5 proxy -> plain collector; an
    unkeyed edge router can't even connect."""
    import socket as _s

    from pmacct_spark.conffile import parse_bgp_xconnect_map
    from pmacct_spark.sources.tcp import set_tcp_md5
    from pmacct_spark.sources.xconnect import BgpXconnectProxy

    with TcpSpool(
        framing="bgp", spool_dir=str(tmp_path / "xmd5_spool")
    ) as collector:
        entries = parse_bgp_xconnect_map(
            f"bgp_dst=127.0.0.1:{collector.port} bgp_src=127.0.0.1"
        )
        with BgpXconnectProxy(
            entries, md5_keys={"127.0.0.1": b"proxypwd"}
        ) as proxy:
            bad = _s.socket(_s.AF_INET, _s.SOCK_STREAM)
            bad.settimeout(1.0)
            refused = False
            try:
                bad.connect(("127.0.0.1", proxy.port))
            except OSError:
                refused = True
            bad.close()
            assert refused

            good = _s.socket(_s.AF_INET, _s.SOCK_STREAM)
            set_tcp_md5(good, "127.0.0.1", b"proxypwd")
            good.connect(("127.0.0.1", proxy.port))
            good.sendall(encode_bgp_update(0x0A000000, 8, "65000 65123"))
            assert _wait(lambda: collector.messages_spooled >= 1)
            good.close()
            rib = rib_state(decode_bgp(collector.batch(spark)))
            assert {r["as_path"] for r in rib.collect()} == {"65000 65123"}


def test_bgp_max_peers_refuses_excess_sessions(spark, tmp_path):
    """bgp_daemon_max_peers (reference CONFIG-KEYS:2787): sessions
    beyond the cap are refused; closing one frees a slot."""
    with TcpSpool(
        framing="bgp",
        spool_dir=str(tmp_path / "mp_spool"),
        max_peers=2,
    ) as sp:
        c1 = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        c1.connect(("127.0.0.1", sp.port))
        c1.sendall(encode_bgp_update(0x0A000000, 8, "65001"))
        c2 = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        c2.connect(("127.0.0.1", sp.port))
        c2.sendall(encode_bgp_update(0x0A010000, 16, "65002"))
        assert _wait(lambda: sp.messages_spooled >= 2)

        c3 = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        c3.connect(("127.0.0.1", sp.port))
        assert _wait(lambda: sp.peers_refused >= 1)
        assert c3.recv(1) == b""  # closed by the listener
        c3.close()

        c1.close()  # frees a slot
        assert _wait(lambda: len(sp._flush_acks) < 2)
        c4 = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        c4.connect(("127.0.0.1", sp.port))
        c4.sendall(encode_bgp_update(0x0A020000, 16, "65004"))
        assert _wait(lambda: sp.messages_spooled >= 3)
        c4.close()
        c2.close()
        rib = rib_state(decode_bgp(sp.batch(spark)))
        assert {r["as_path"] for r in rib.collect()} == {
            "65001", "65002", "65004"
        }


def test_daemon_bind_address_keys(spark, tmp_path):
    """nfacctd_ip / bgp_daemon_ip (reference CONFIG-KEYS): the
    listeners bind the configured address — datagrams and sessions to
    127.0.0.2 arrive, and the spools report that bind."""
    conf = """
nfacctd_ip: 127.0.0.2
nfacctd_port: 0
bgp_daemon: true
bgp_daemon_ip: 127.0.0.2
bgp_daemon_port: 0
bgp_daemon_max_peers: 8
plugins: memory[acct]
aggregate[acct]: proto
sql_history[acct]: 5m
"""
    from pmacct_spark.daemon import Daemon
    from pmacct_spark.sources.udp import send_datagrams
    from tests.test_streaming import _v5_datagram

    d = Daemon.from_conf(spark, conf, spool_dir=str(tmp_path / "bind_spool"))
    try:
        assert d.spool.host == "127.0.0.2"
        assert d.bgp_spool.host == "127.0.0.2"
        assert d.bgp_spool.max_peers == 8
        c = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        c.connect(("127.0.0.2", d.bgp_port))
        c.sendall(encode_bgp_update(0x0A000000, 8, "65000"))
        c.close()
        recs = [{"src": 1, "dst": 2, "pkts": 1, "bytes": 99,
                 "sport": 1, "dport": 2, "proto": 6}]
        send_datagrams([_v5_datagram(1, recs)], "127.0.0.2", d.port)
        assert _wait(lambda: d.spool.datagrams_received >= 1)
        assert _wait(lambda: d.bgp_spool.messages_spooled >= 1)
    finally:
        d.stop()


def test_bgp_open_reply_and_keepalive(spark, tmp_path):
    """The collector's passive speaker side (reference
    src/bgp/bgp_msg.c; CONFIG-KEYS bgp_daemon_as / bgp_daemon_id): on
    the peer's OPEN it replies OPEN + KEEPALIVE — Local AS pinned by
    bgp_daemon_as (eBGP), Router-ID from bgp_daemon_id, the peer's
    4-byte-AS capability rewritten to carry OUR AS — and echoes
    KEEPALIVEs so a real router holds the session up."""
    import socket
    import struct

    from pmacct_spark.daemon import Daemon

    conf = """
nfacctd_port: 0
bgp_daemon: true
bgp_daemon_port: 0
bgp_daemon_as: 65099
bgp_daemon_id: 10.9.9.9
plugins: memory[m]
aggregate[m]: proto
"""
    d = Daemon.from_conf(spark, conf, spool_dir=str(tmp_path / "spoolSPK"))
    try:
        c = socket.create_connection(("127.0.0.1", d.bgp_port), timeout=5)
        # peer OPEN: AS 65001, holdtime 90, router-id 10.0.0.1, caps:
        # MP-BGP v4-unicast (1) + 4-byte-AS (65)
        caps = bytes([1, 4, 0, 1, 0, 1]) + bytes([65, 4]) + struct.pack(
            "!I", 65001
        )
        opt = bytes([2, len(caps)]) + caps
        body = (
            bytes([4]) + struct.pack("!HH", 65001, 90)
            + socket.inet_aton("10.0.0.1") + bytes([len(opt)]) + opt
        )
        marker = b"\xff" * 16
        c.sendall(marker + struct.pack("!H", 19 + len(body)) + b"\x01" + body)

        def read_msg(sock):
            hdr = b""
            while len(hdr) < 19:
                got = sock.recv(19 - len(hdr))
                assert got, "collector closed without replying"
                hdr += got
            assert hdr[:16] == marker
            ln = struct.unpack("!H", hdr[16:18])[0]
            rest = b""
            while len(rest) < ln - 19:
                rest += sock.recv(ln - 19 - len(rest))
            return hdr[18], rest

        mtype, rbody = read_msg(c)
        assert mtype == 1  # OPEN reply
        ver, my_as, hold = rbody[0], *struct.unpack("!HH", rbody[1:5])
        rid = socket.inet_ntoa(rbody[5:9])
        assert (ver, my_as, hold, rid) == (4, 65099, 90, "10.9.9.9")
        # the echoed caps carry OUR AS in capability 65
        optlen = rbody[9]
        opts = rbody[10:10 + optlen]
        assert opts[0] == 2
        cap_blob = opts[2:]
        as4 = None
        j = 0
        while j + 2 <= len(cap_blob):
            code, clen = cap_blob[j], cap_blob[j + 1]
            if code == 65:
                as4 = struct.unpack("!I", cap_blob[j + 2:j + 6])[0]
            j += 2 + clen
        assert as4 == 65099
        mtype, _ = read_msg(c)
        assert mtype == 4  # KEEPALIVE follows the OPEN
        # peer KEEPALIVE -> echoed
        c.sendall(marker + struct.pack("!H", 19) + b"\x04")
        mtype, _ = read_msg(c)
        assert mtype == 4
        c.close()
    finally:
        d.stop()


def test_bgp_neighbors_file_tracks_sessions(spark, tmp_path):
    """bgp_neighbors_file (CONFIG-KEYS:3066, write_neighbors_file
    src/bgp/bgp_util.c:1193): the live peer list, one address per
    line, rewritten on session open AND close."""
    import socket
    import time as _t

    from pmacct_spark.daemon import Daemon

    nf = tmp_path / "neighbors.lst"
    conf = f"""
nfacctd_port: 0
bgp_daemon: true
bgp_daemon_port: 0
bgp_neighbors_file: {nf}
plugins: memory[m]
aggregate[m]: proto
"""
    d = Daemon.from_conf(spark, conf, spool_dir=str(tmp_path / "spoolNF"))
    try:
        c = socket.create_connection(("127.0.0.1", d.bgp_port), timeout=5)
        t0 = _t.monotonic()
        while _t.monotonic() - t0 < 10:
            if nf.exists() and nf.read_text().strip():
                break
            _t.sleep(0.05)
        assert nf.read_text().splitlines() == ["127.0.0.1"]
        c.close()
        t0 = _t.monotonic()
        while _t.monotonic() - t0 < 10:
            if nf.exists() and not nf.read_text().strip():
                break
            _t.sleep(0.05)
        assert nf.read_text().strip() == ""  # session gone -> list empty
    finally:
        d.stop()


def test_bgp_daemon_allow_file_refuses_unlisted(spark, tmp_path):
    """bgp_daemon_allow_file (CONFIG-KEYS:3073): sessions from peers
    not in the list are refused at accept; listed peers establish.
    The loopback peer is tested both ways via two daemons."""
    import socket
    import time as _t

    from pmacct_spark.daemon import Daemon

    def run_one(tag: str, entries: str) -> tuple[bool, int]:
        af = tmp_path / f"allow_{tag}.lst"
        af.write_text(entries)
        conf = f"""
nfacctd_port: 0
bgp_daemon: true
bgp_daemon_port: 0
bgp_daemon_allow_file: {af}
plugins: memory[m]
aggregate[m]: proto
"""
        d = Daemon.from_conf(
            spark, conf, spool_dir=str(tmp_path / f"spoolAL{tag}")
        )
        try:
            c = socket.create_connection(
                ("127.0.0.1", d.bgp_port), timeout=5
            )
            c.settimeout(2)
            _t.sleep(0.3)
            try:
                # a refused session is closed immediately: recv sees
                # EOF; an accepted one just times out (nothing to read
                # until we speak)
                alive = c.recv(1) != b""
            except TimeoutError:
                alive = True
            c.close()
            return alive, d.bgp_spool.sessions_refused_by_allow
        finally:
            d.stop()

    alive, refused = run_one("listed", "127.0.0.1\n")
    assert alive and refused == 0
    alive, refused = run_one("cidr", "127.0.0.0/8\n")
    assert alive and refused == 0
    alive, refused = run_one("unlisted", "192.0.2.0/24\n")
    assert not alive and refused == 1
    # EMPTY allow file = DENY ALL (src/util.c:2033 num=-1;
    # CONFIG-KEYS:2007 'empty ... means deny all') — fail-closed, not
    # fail-open (ADVICE r10 high)
    alive, refused = run_one("empty", "! comments only\n\n")
    assert not alive and refused == 1
    # malformed line is skipped with a warning (src/util.c:2026), the
    # valid entry still admits the peer — startup must not crash
    alive, refused = run_one("badline", "bogus-addr\n127.0.0.1\n")
    assert alive and refused == 0


def _open_msg(asn=65001, rid="10.0.0.1", caps=b""):
    import socket as _s
    import struct

    opt = bytes([2, len(caps)]) + caps if caps else b""
    body = (
        bytes([4]) + struct.pack("!HH", asn, 90)
        + _s.inet_aton(rid) + bytes([len(opt)]) + opt
    )
    return b"\xff" * 16 + struct.pack("!H", 19 + len(body)) + b"\x01" + body


def _read_caps(sock):
    """Read one BGP message off the socket, return (type, cap codes)."""
    import struct

    hdr = b""
    while len(hdr) < 19:
        got = sock.recv(19 - len(hdr))
        if not got:
            return None, set()
        hdr += got
    ln = struct.unpack("!H", hdr[16:18])[0]
    rest = b""
    while len(rest) < ln - 19:
        rest += sock.recv(ln - 19 - len(rest))
    codes = set()
    if hdr[18] == 1:
        optlen = rest[9]
        blob = rest[10:10 + optlen]
        if blob and blob[0] == 2:
            cap = blob[2:]
            j = 0
            while j + 2 <= len(cap):
                codes.add(cap[j])
                j += 2 + cap[j + 1]
    return hdr[18], codes


def test_bgp_router_id_check_and_capability_knobs(spark, tmp_path):
    """bgp_router_id_check (src/bgp/bgp_util.c:1685): a second session
    presenting an ALREADY-ACTIVE Router-ID is refused at OPEN
    ('Refusing new connection from existing Router-ID');
    bgp_disable_router_id_check turns that off (CONFIG-KEYS:3059).
    bgp_daemon_add_path_ignore withholds the ADD-PATH capability echo
    (:2858); tmp_bgp_daemon_route_refresh echoes a Route Refresh
    capability back when the peer offered one (:3734), and a received
    ROUTE-REFRESH message is ignored, not a desync."""
    import socket
    import time as _t

    from pmacct_spark.daemon import Daemon

    def run(conf_extra, tag):
        conf = f"""
nfacctd_port: 0
bgp_daemon: true
bgp_daemon_port: 0
{conf_extra}
plugins: memory[m]
aggregate[m]: proto
"""
        return Daemon.from_conf(
            spark, conf, spool_dir=str(tmp_path / f"spoolRID{tag}")
        )

    addpath_cap = bytes([69, 4, 0, 1, 1, 3])
    rr_cap = bytes([2, 0])
    mp_cap = bytes([1, 4, 0, 1, 0, 1])

    # 1. duplicate Router-ID refused by default; distinct one accepted
    d = run("", "dflt")
    try:
        c1 = socket.create_connection(("127.0.0.1", d.bgp_port), timeout=5)
        c1.sendall(_open_msg(rid="10.0.0.1", caps=mp_cap + addpath_cap))
        t1, codes1 = _read_caps(c1)
        assert t1 == 1 and 69 in codes1 and 2 not in codes1

        c2 = socket.create_connection(("127.0.0.1", d.bgp_port), timeout=5)
        c2.settimeout(3)
        c2.sendall(_open_msg(rid="10.0.0.1"))
        t2, _ = _read_caps(c2)
        assert t2 is None  # refused: closed without an OPEN reply
        t0 = _t.monotonic()
        while (
            d.bgp_spool.sessions_refused_by_rid < 1
            and _t.monotonic() - t0 < 5
        ):
            _t.sleep(0.05)
        assert d.bgp_spool.sessions_refused_by_rid == 1
        c2.close()

        c3 = socket.create_connection(("127.0.0.1", d.bgp_port), timeout=5)
        c3.sendall(_open_msg(rid="10.0.0.2"))
        t3, _ = _read_caps(c3)
        assert t3 == 1
        c1.close()
        c3.close()
    finally:
        d.stop()

    # 2. bgp_disable_router_id_check: both sessions accepted
    d = run("bgp_disable_router_id_check: true", "off")
    try:
        c1 = socket.create_connection(("127.0.0.1", d.bgp_port), timeout=5)
        c1.sendall(_open_msg(rid="10.0.0.1"))
        assert _read_caps(c1)[0] == 1
        c2 = socket.create_connection(("127.0.0.1", d.bgp_port), timeout=5)
        c2.sendall(_open_msg(rid="10.0.0.1"))
        assert _read_caps(c2)[0] == 1
        assert d.bgp_spool.sessions_refused_by_rid == 0
        c1.close()
        c2.close()
    finally:
        d.stop()

    # 3. add_path_ignore + route_refresh capability knobs
    d = run(
        "bgp_daemon_add_path_ignore: true\n"
        "tmp_bgp_daemon_route_refresh: true",
        "caps",
    )
    try:
        c = socket.create_connection(("127.0.0.1", d.bgp_port), timeout=5)
        c.sendall(_open_msg(caps=mp_cap + rr_cap + addpath_cap))
        t, codes = _read_caps(c)
        assert t == 1
        assert 69 not in codes  # ADD-PATH withheld
        assert 2 in codes       # Route Refresh echoed
        # a ROUTE-REFRESH message is ignored: the session stays alive
        # and still echoes KEEPALIVEs afterwards
        rr_msg = b"\xff" * 16 + (23).to_bytes(2, "big") + bytes(
            [5, 0, 1, 0, 1]
        )
        keepalive = b"\xff" * 16 + (19).to_bytes(2, "big") + b"\x04"
        c.sendall(rr_msg + keepalive)
        # skip the KEEPALIVE that followed our OPEN reply, then expect
        # the echo of ours
        t_k1, _ = _read_caps(c)
        t_k2, _ = _read_caps(c)
        assert (t_k1, t_k2) == (4, 4)
        c.close()
    finally:
        d.stop()


def test_bgp_session_over_ipv6_transport(spark, tmp_path):
    """v6 BGP peering: bgp_daemon_ip: ::1 opens an AF_INET6 listener;
    a session over the v6 loopback builds the same RIB, with the peer
    identity in v6 presentation form."""
    from pmacct_spark.daemon import Daemon

    conf = """
nfacctd_port: 0
bgp_daemon: true
bgp_daemon_ip: ::1
bgp_daemon_port: 0
plugins: memory[m]
aggregate[m]: proto
"""
    d = Daemon.from_conf(spark, conf, spool_dir=str(tmp_path / "spool6T"))
    try:
        c = socket.socket(socket.AF_INET6, socket.SOCK_STREAM)
        c.connect(("::1", d.bgp_port))
        c.sendall(encode_bgp_update(0x0A000000, 8, "65000 65100"))
        c.close()
        t0 = time.time()
        while d.bgp_spool.messages_spooled < 1 and time.time() - t0 < 15:
            time.sleep(0.05)
        time.sleep(0.3)
        rib = d.rib().collect()
    finally:
        d.stop()
    assert len(rib) == 1
    assert rib[0]["as_path"] == "65000 65100"
    assert rib[0]["peer_ip"] == "::1"
