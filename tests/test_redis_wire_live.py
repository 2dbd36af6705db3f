"""Live RESP wire tests: client/server roundtrip, the presence
publisher, and the reference's 901-redis-connection-loss scenario —
the redis server dies mid-run and returns on the same port; the
daemon keeps accounting throughout and re-registers its presence
keys after recovery (src/redis_common.c p_redis_connect non-fatal
semantics)."""

from __future__ import annotations

import time

from pmacct_spark.sources.redis_wire import (
    MiniRedisServer,
    RedisPresence,
    RedisReplyError,
    RespClient,
)


def _wait(pred, timeout=15.0, step=0.05):
    t0 = time.monotonic()
    while not pred() and time.monotonic() - t0 < timeout:
        time.sleep(step)
    return pred()


def test_resp_roundtrip_and_expiry():
    srv = MiniRedisServer().start()
    try:
        cli = RespClient(srv.host, srv.port)
        assert cli.command("PING") == "PONG"
        assert cli.command("SET", "k1", "v1") == "OK"
        assert cli.command("GET", "k1") == b"v1"
        assert cli.command("GET", "missing") is None
        assert cli.command("SETEX", "k2", 1, "v2") == "OK"
        assert cli.command("TTL", "k2") in (0, 1)
        assert cli.command("EXISTS", "k1", "k2", "nope") == 2
        assert cli.command("KEYS", "k*") == [b"k1", b"k2"]
        time.sleep(1.1)
        assert cli.command("GET", "k2") is None  # expired
        assert cli.command("DEL", "k1") == 1
        # -ERR replies surface as RedisReplyError, not transport loss
        try:
            cli.command("FLUSHALL")
            raise AssertionError("expected RedisReplyError")
        except RedisReplyError:
            pass
        cli.close()
    finally:
        srv.stop()


def test_resp_auth_and_db_select():
    srv = MiniRedisServer(passwd="s3cret").start()
    try:
        cli = RespClient(srv.host, srv.port)
        try:
            cli.command("GET", "k")
            raise AssertionError("expected NOAUTH")
        except RedisReplyError:
            pass
        assert cli.command("AUTH", "s3cret") == "OK"
        assert cli.command("SELECT", 2) == "OK"
        assert cli.command("SET", "dbk", "x") == "OK"
        assert srv.get("dbk", db=2) == b"x"
        assert srv.get("dbk", db=0) is None  # db isolation
        cli.close()
    finally:
        srv.stop()


def test_presence_publisher_keys():
    srv = MiniRedisServer().start()
    p = None
    try:
        p = RedisPresence(
            srv.host, srv.port, cluster_name="pmacct", cluster_id=7,
            name="nfacctd_core", ptype="core", daemon_type="nfacctd",
            extras=("bgp",), refresh_secs=0.1,
        ).start()
        assert _wait(lambda: p.publishes >= 2)
        assert srv.get("pmacct+7+daemon_type") == b"nfacctd"
        assert srv.get("pmacct+7+process+nfacctd_core+core") == b"1"
        assert srv.get("pmacct+7+process+nfacctd_core+core+bgp") == b"1"
        # short TTL: keys vanish when the publisher stops
        p.stop()
        p = None
        time.sleep(3.2)
        assert srv.get("pmacct+7+daemon_type") is None
    finally:
        if p is not None:
            p.stop()
        srv.stop()


def test_daemon_survives_redis_connection_loss(spark, tmp_path):
    """Reference test 901-redis-connection-loss: redis dies while the
    daemon collects; accounting must continue un-degraded (records
    sent DURING the outage are kept), the loss is WARN-logged like the
    reference's 'Can't connect to redis server', and when the server
    returns on the same port the presence keys re-register without a
    daemon restart."""
    from pmacct_spark.daemon import Daemon
    from tests.test_daemon import send_datagrams
    from tests.test_streaming import _v5_datagram

    srv = MiniRedisServer().start()
    rport = srv.port
    d = None
    try:
        d = Daemon.from_conf(
            spark,
            f"""
nfacctd_port: 0
redis_host: 127.0.0.1:{rport}
cluster_name: pmacct
cluster_id: 0
core_proc_name: nfacctd_core
plugins: memory[acct]
aggregate[acct]: proto
""",
            spool_dir=str(tmp_path / "spool901"),
        )
        d.redis.refresh_secs = 0.1
        assert _wait(lambda: d.redis.publishes >= 1)
        assert srv.get("pmacct+0+daemon_type") == b"nfacctd"

        # PART 2: redis goes away
        srv.stop()
        pre_warns = len(d.redis.warnings)
        # flows arriving DURING the outage must be accounted
        send_datagrams(
            [_v5_datagram(1, [
                {"src": 0x0A000001, "dst": 0x0B000001, "pkts": 10,
                 "bytes": 1000, "sport": 1, "dport": 443, "proto": 6},
            ])],
            "127.0.0.1", d.port,
        )
        assert _wait(lambda: d.spool.datagrams_received >= 1)
        assert _wait(lambda: len(d.redis.warnings) > pre_warns)
        assert any(
            "Can't connect to redis server" in w for w in d.redis.warnings
        )

        # PART 3: redis returns on the SAME port -> keys re-register
        srv = MiniRedisServer(port=rport).start()
        assert _wait(
            lambda: srv.get("pmacct+0+daemon_type") == b"nfacctd",
            timeout=20,
        )
        assert d.redis.reconnects >= 0  # fresh context after outage
        out = d.run_available()["acct"].collect()
        assert {int(r["proto"]): int(r["bytes"]) for r in out} == {6: 1000}
    finally:
        if d is not None:
            d.stop()
        srv.stop()


def test_ha_election_oldest_wins_and_failover():
    """BMP/BGP HA (reference src/ha.c): the oldest-started collector
    in the cluster is ACTIVE; when it dies its timestamp key expires
    and the next-oldest takes over within ~TTL; forced modes suspend
    the election."""
    srv = MiniRedisServer().start()
    a = b = None
    try:
        from pmacct_spark.sources.redis_wire import BmpBgpHa

        a = BmpBgpHa(srv.host, srv.port, "ha-clu", 0, name="colA",
                     startup_us=1_000, refresh_secs=0.1,
                     exp_time=1).start()
        b = BmpBgpHa(srv.host, srv.port, "ha-clu", 0, name="colB",
                     startup_us=2_000, refresh_secs=0.1,
                     exp_time=1).start()
        assert _wait(lambda: a.forwarding and not b.forwarding, timeout=5)
        # forced standby on A -> does NOT hand over (B still sees A's
        # smaller timestamp; forcing is per-daemon, src/ha.c:371)
        a.set_to_standby()
        time.sleep(0.3)
        assert not a.forwarding and not b.forwarding
        a.set_to_normal()
        assert _wait(lambda: a.forwarding, timeout=5)
        # failover: A dies -> its key expires -> B elected
        a.stop()
        a = None
        assert _wait(lambda: b.forwarding, timeout=10)
        assert b.transitions >= 1
    finally:
        for x in (a, b):
            if x is not None:
                x.stop()
        srv.stop()


def test_daemon_bmp_ha_standby_holds_then_replays(spark, tmp_path):
    """Reference test 206 (BMP high availability): two collectors fed
    the same BMP session; only the ACTIVE one emits msglog; when it
    dies the standby takes over and its FIRST emission replays the
    session history received while standby — the queue-dump
    continuity of src/ha.c:222-266 (scenario-01 unlimited
    retention)."""
    import json
    import socket

    from pmacct_spark.daemon import Daemon
    from tests.test_msglog import _bgp_update, _bmp_msg

    srv = MiniRedisServer().start()
    da = db = None
    try:
        def mk(tag: str) -> Daemon:
            return Daemon.from_conf(
                spark,
                f"""
nfacctd_port: 0
bmp_daemon: true
bmp_daemon_port: 0
bmp_daemon_ha: true
bmp_daemon_ha_cluster_name: nfacctd-bmp-ha
redis_host: 127.0.0.1:{srv.port}
cluster_name: nfacctd-bmp-loc-{tag}
core_proc_name: {tag}
bmp_daemon_msglog_file: {tmp_path / (tag + ".log")}
plugins: memory[routes]
aggregate[routes]: as_path
""",
                spool_dir=str(tmp_path / f"spool_{tag}"),
            )

        da = mk("colA")
        da.ha.refresh_secs = 0.1
        db = mk("colB")
        db.ha.refresh_secs = 0.1
        assert _wait(lambda: da.ha.forwarding and not db.ha.forwarding,
                     timeout=10)

        # routers dual-feed both collectors (the reference topology)
        peer = 0xC0000205
        msgs = (
            _bmp_msg(3, peer, 64500)
            + _bmp_msg(0, peer, 64500, _bgp_update([], [(0x0A010000, 16)]))
            + _bmp_msg(2, peer, 64500)
        )
        for port in (da.bmp_port, db.bmp_port):
            c = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            c.connect(("127.0.0.1", port))
            c.sendall(msgs)
            c.close()
        # messages_spooled counts flush units, not messages: one TCP
        # segment can land as a single flush — wait for any spool
        # activity on both, then settle
        assert _wait(lambda: da.bmp_spool.messages_spooled >= 1
                     and db.bmp_spool.messages_spooled >= 1)
        time.sleep(1.0)
        assert da.write_msglog_if_configured() != []   # ACTIVE emits
        assert db.write_msglog_if_configured() == []   # STANDBY holds
        assert not (tmp_path / "colB.log").exists()

        # ACTIVE dies -> standby takes over within ~TTL
        da.stop()
        da = None
        assert _wait(lambda: db.ha.forwarding, timeout=15)
        assert db.write_msglog_if_configured() != []
        import pathlib

        events = []
        for f in pathlib.Path(tmp_path / "colB.log").rglob("*.txt"):
            events += [
                json.loads(ln)
                for ln in f.read_text().splitlines()
                if ln.strip()
            ]
        types = sorted(e["event_type"] for e in events)
        # full session replay: peer-up AND the route received while
        # standby (+ log_close if the tcp session ended)
        assert "log_init" in types and "log" in types
        upd = next(e for e in events if e["event_type"] == "log")
        assert upd["ip_prefix"] == "10.1.0.0/16"
    finally:
        for x in (da, db):
            if x is not None:
                x.stop()
        srv.stop()


def test_daemon_bmp_ha_queue_timeout_bounds_replay(spark, tmp_path):
    """bmp_daemon_ha_queue_message_timeout / _ha_queue_max_size
    (CONFIG-KEYS): the standby queues messages before discarding them —
    with a 0-second timeout everything received while standby has
    expired by takeover, so the first post-takeover emission replays
    NOTHING old (the src/ha.c cleanup-thread semantics); unset keys
    keep the full-history replay (previous test)."""
    import json
    import pathlib
    import socket

    from pmacct_spark.daemon import Daemon
    from tests.test_msglog import _bgp_update, _bmp_msg

    srv = MiniRedisServer().start()
    da = db = None
    try:
        def mk(tag: str, extra: str = "") -> Daemon:
            return Daemon.from_conf(
                spark,
                f"""
nfacctd_port: 0
bmp_daemon: true
bmp_daemon_port: 0
bmp_daemon_ha: true
bmp_daemon_ha_cluster_name: nfacctd-bmp-ha-qt
redis_host: 127.0.0.1:{srv.port}
cluster_name: nfacctd-bmp-qt-{tag}
core_proc_name: {tag}
bmp_daemon_msglog_file: {tmp_path / (tag + ".log")}
{extra}
plugins: memory[routes]
aggregate[routes]: as_path
""",
                spool_dir=str(tmp_path / f"spool_{tag}"),
            )

        da = mk("qtA")
        da.ha.refresh_secs = 0.1
        db = mk("qtB", "bmp_daemon_ha_queue_message_timeout: 0\n")
        db.ha.refresh_secs = 0.1
        assert _wait(lambda: da.ha.forwarding and not db.ha.forwarding,
                     timeout=10)
        peer = 0xC0000207
        msgs = (
            _bmp_msg(3, peer, 64500)
            + _bmp_msg(0, peer, 64500, _bgp_update([], [(0x0A020000, 16)]))
        )
        for port in (da.bmp_port, db.bmp_port):
            c = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            c.connect(("127.0.0.1", port))
            c.sendall(msgs)
            c.close()
        assert _wait(lambda: da.bmp_spool.messages_spooled >= 1
                     and db.bmp_spool.messages_spooled >= 1)
        time.sleep(1.1)  # chunks age past the 0s timeout
        assert db.write_msglog_if_configured() == []  # standby holds
        da.stop()
        da = None
        assert _wait(lambda: db.ha.forwarding, timeout=15)
        db.write_msglog_if_configured()
        events = []
        p = pathlib.Path(tmp_path / "qtB.log")
        if p.exists():
            for f in p.rglob("*.txt"):
                events += [
                    json.loads(ln)
                    for ln in f.read_text().splitlines()
                    if ln.strip()
                ]
        # everything received while standby expired before takeover
        assert events == []
    finally:
        for x in (da, db):
            if x is not None:
                x.stop()
        srv.stop()
