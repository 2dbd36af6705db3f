"""LIVE ZMTP 3.0 tests: the ZeroMQ wire protocol (64-byte greeting,
NULL READY handshake with Socket-Type checking, message framing, 3.0
PUB/SUB subscription messages) over REAL loopback TCP sockets, driving
both reference ZMQ roles — the telemetry PULL bind
(src/telemetry/telemetry.c:115-135) and the Kafka-less topic'd pub/sub
delivery (src/zmq_common.c:56,348-358,482).
"""

from __future__ import annotations

import json
import time

import pytest

from pmacct_spark.sinks.zmq import zmq_frame
from pmacct_spark.sources.zmtp import (
    ZmtpPubServer,
    ZmtpPullServer,
    ZmtpPushClient,
    ZmtpSubClient,
)


def test_push_pull_telemetry_ingest(spark):
    """The gRPC-collector seam live: JSON telemetry PUSHed through a
    real ZMTP socket arrives byte-exact on the PULL bind and feeds the
    metrics pipeline identically to a direct parse."""
    srv = ZmtpPullServer().start()
    try:
        payloads = [
            json.dumps({"node": f"r{i % 3}", "metrics": {"k": i}}).encode()
            for i in range(25)
        ]
        cli = ZmtpPushClient(srv.host, srv.port)
        try:
            for p in payloads:
                cli.send(p)
        finally:
            cli.close()
        t0 = time.monotonic()
        got: list[bytes] = []
        while len(got) < 25 and time.monotonic() - t0 < 10:
            got += srv.drain()
            time.sleep(0.02)
        assert sorted(got) == sorted(payloads)
        # and the received bytes parse into the same metric rows
        rows = spark.createDataFrame(
            [(g.decode(),) for g in got], "payload string"
        ).selectExpr(
            "get_json_object(payload, '$.node') AS node",
            "CAST(get_json_object(payload, '$.metrics.k') AS BIGINT) AS k",
        )
        assert rows.groupBy("node").count().count() == 3
    finally:
        srv.stop()


def test_pub_sub_topic_filtering(spark):
    """zmq_frame output published through ZMTP PUB: a subscriber with a
    single-byte topic filter receives exactly its topic's records, in
    the reference's (topic byte + payload) layout."""
    pub = ZmtpPubServer().start()
    try:
        sub5 = ZmtpSubClient(pub.host, pub.port, [bytes([5])])
        suball = ZmtpSubClient(pub.host, pub.port, [b""])  # match-all
        # slow-joiner guard: wait for both FILTERS to land, not just the
        # connections — a publish in between is silently dropped
        assert pub.wait_subscribed(2)

        agg = spark.createDataFrame(
            [(i, i * 10) for i in range(6)], "rec_id long, bytes long"
        )
        frames5 = zmq_frame(agg.filter("rec_id % 2 = 0"), topic=5).collect()
        frames7 = zmq_frame(agg.filter("rec_id % 2 = 1"), topic=7).collect()
        for r in frames5 + frames7:
            pub.publish(bytes([r["topic"]]) + r["payload"].encode())

        got5 = [sub5.recv() for _ in range(3)]
        assert all(m[0] == 5 for m in got5)
        assert sorted(m[1:].decode() for m in got5) == sorted(
            r["payload"] for r in frames5
        )
        gotall = [suball.recv() for _ in range(6)]
        assert sorted({m[0] for m in gotall}) == [5, 7]
        sub5.close()
        suball.close()
    finally:
        pub.stop()


def test_socket_type_compatibility_enforced():
    """A PUSH peer connecting to a PUB bind must be rejected during the
    NULL handshake (Socket-Type metadata check) — the ZMTP rule libzmq
    enforces."""
    pub = ZmtpPubServer().start()
    try:
        with pytest.raises((ValueError, ConnectionError)):
            cli = ZmtpPushClient(pub.host, pub.port)
            # if the handshake somehow passed, sending must fail
            cli.send(b"x")
            cli.sock.settimeout(2)
            cli.sock.recv(1)
    finally:
        pub.stop()


def test_pub_prunes_dead_subscriber_and_keeps_publishing(spark):
    """ADVICE r5: publish sends OUTSIDE the server lock; a subscriber
    whose socket died must be pruned without breaking delivery to the
    healthy ones."""
    import time

    from pmacct_spark.sources.zmtp import ZmtpPubServer, ZmtpSubClient

    srv = ZmtpPubServer().start()
    try:
        alive = ZmtpSubClient(srv.host, srv.port, [b"topicA"])
        doomed = ZmtpSubClient(srv.host, srv.port, [b"topicA"])
        # slow-joiner guard: wait until both subscribers' FILTERS are
        # registered (connection count alone races the SUBSCRIBE frame)
        assert srv.wait_subscribed(2)
        # hard-close one subscriber socket; publish repeatedly until
        # the dead connection trips the send error and is pruned
        doomed.sock.close()
        for i in range(50):
            srv.publish(b"topicA msg%d" % i)
            if len(srv._subs) == 1:
                break
            time.sleep(0.05)
        # the healthy subscriber saw every message, in order
        first = alive.recv(timeout=20)
        assert first == b"topicA msg0"
        assert len(srv._subs) <= 2  # doomed pruned or pending close
        # a publish after the prune still delivers
        srv.publish(b"topicA final")
        got = first
        while got != b"topicA final":
            got = alive.recv(timeout=20)
    finally:
        srv.stop()


def test_write_zmq_publishes_over_native_zmtp(spark):
    """write_zmq (round 8: native ZMTP PUB, no libzmq) delivers the
    zmq_frame contract to live subscribers with prefix filtering."""
    from pmacct_spark.sinks.zmq import write_zmq, zmq_frame
    from pmacct_spark.sources.zmtp import ZmtpPubServer, ZmtpSubClient

    srv = ZmtpPubServer().start()
    try:
        sub9 = ZmtpSubClient(srv.host, srv.port, [bytes([9])])
        assert srv.wait_subscribed(1)
        df = spark.createDataFrame(
            [(1, 100), (2, 200)], "rec_id long, bytes long"
        )
        ret = write_zmq(zmq_frame(df, topic=9), server=srv)
        assert ret is srv
        got = sorted(sub9.recv() for _ in range(2))
        assert all(m[0] == 9 for m in got)
        payloads = sorted(m[1:].decode() for m in got)
        assert '"rec_id":1' in payloads[0].replace(" ", "")
        sub9.close()
    finally:
        srv.stop()


def test_write_zmq_binds_endpoint(spark):
    """endpoint form binds its own server and returns it."""
    from pmacct_spark.sinks.zmq import write_zmq, zmq_frame

    df = spark.createDataFrame([(1, 10)], "rec_id long, bytes long")
    srv = write_zmq(zmq_frame(df, topic=3), endpoint="tcp://127.0.0.1:0")
    try:
        assert srv.port > 0  # bound ephemeral; no subscribers -> no-op
    finally:
        srv.stop()
