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
