"""LIVE Kafka wire-protocol tests: an in-process broker speaking the
public v0 APIs (Metadata/Produce/Fetch, CRC-checked v0 MessageSets)
over a REAL loopback TCP socket, driven by the engine's own frame
shapers — the broker half of the reference's Kafka transport
(src/kafka_common.c, src/kafka_plugin.c:384) exercised as far as the
sandbox allows (see the honest-scope note in sources/kafka_wire.py).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pmacct_spark.sinks.kafka import kafka_frame
from pmacct_spark.sources.kafka import frames_to_datagrams
from pmacct_spark.sources.kafka_wire import (
    KafkaWireClient,
    MiniKafkaBroker,
    decode_message_set,
    encode_message,
    encode_message_set,
    fetch_records,
    produce_frames,
)


@pytest.fixture()
def broker():
    b = MiniKafkaBroker(npartitions=2).start()
    yield b
    b.stop()


def test_wire_roundtrip_frames(spark, broker):
    """kafka_frame output -> socket Produce -> socket Fetch: payloads,
    keys and topics survive byte-exact; offsets are dense and ordered
    per partition."""
    agg = spark.createDataFrame(
        [(i, f"host{i % 3}", i * 100) for i in range(30)],
        "rec_id long, peer string, bytes long",
    )
    frames = kafka_frame(agg, topic="acct", key_cols=["peer"])
    produce_frames(frames, broker.host, broker.port, nparts=2)

    back = fetch_records(spark, broker.host, broker.port, ["acct"])
    rows = back.collect()
    assert len(rows) == 30
    sent = {
        (r["key"], r["value"]) for r in frames.collect()
    }
    got = {(r["key"], bytes(r["value"]).decode()) for r in rows}
    assert got == sent
    # same key -> same partition; offsets dense per partition
    bypart: dict[int, list[int]] = {}
    keypart: dict[str, set[int]] = {}
    for r in rows:
        bypart.setdefault(r["partition"], []).append(r["offset"])
        keypart.setdefault(r["key"], set()).add(r["partition"])
    for offs in bypart.values():
        assert sorted(offs) == list(range(len(offs)))
    assert all(len(parts) == 1 for parts in keypart.values())


def test_kafka_wire_flow_pipeline(spark):
    """The full nfacctd_kafka loop over a real socket: flows ->
    encode_v5 datagrams -> Produce (exporter ip as partition key) ->
    Fetch -> frames_to_datagrams -> decode_v5 -> aggregate equals the
    direct aggregation of the same flows."""
    from conftest import SF_DIR

    from pmacct_spark.driver_queries import flows as flows_view_fn
    from pmacct_spark.sinks.nfprobe import encode_v5
    from pmacct_spark.streaming.decode import decode_v5

    b = MiniKafkaBroker(npartitions=2).start()
    try:
        fl = flows_view_fn(spark, SF_DIR).limit(600).selectExpr(
            "ip_src_i", "ip_dst_i", "iface_in", "iface_out", "packets",
            "bytes", "unix_micros(CAST(ts AS TIMESTAMP)) DIV 1000 AS ts_ms",
            "unix_micros(CAST(end_ts AS TIMESTAMP)) DIV 1000 AS end_ts_ms",
            "port_src", "port_dst", "tcp_flags", "ip_proto", "tos",
            "as_src", "as_dst",
        )
        from pmacct_spark.operators.staging import stage

        fl = stage(fl)  # read twice: through the wire AND directly
        dgrams = encode_v5(fl)
        frames = dgrams.select(
            F.col("exporter_ip").alias("key"),
            F.col("payload").alias("value"),
            F.lit("nfacct").alias("topic"),
        )
        produce_frames(frames, b.host, b.port, nparts=2)

        consumed = fetch_records(spark, b.host, b.port, ["nfacct"])
        back = decode_v5(
            frames_to_datagrams(consumed).select("exporter_ip", "payload")
        )
        got = {
            (r["proto"], r["bytes"], r["packets"])
            for r in back.groupBy(F.col("ip_proto").cast("int").alias("proto"))
            .agg(F.sum("bytes").alias("bytes"), F.sum("packets").alias("packets"))
            .collect()
        }
        want = {
            (r["proto"], r["bytes"], r["packets"])
            for r in fl.groupBy(F.col("ip_proto").cast("int").alias("proto"))
            .agg(F.sum("bytes").alias("bytes"), F.sum("packets").alias("packets"))
            .collect()
        }
        assert got == want and got
    finally:
        b.stop()


def test_telemetry_json_rides_kafka_wire(spark, broker):
    """A telemetry payload is one Kafka value frame: JSON notifications
    produced through the socket come back byte-exact for the metrics
    pipeline (the reference's pmtelemetryd-over-Kafka consumer path)."""
    payloads = [
        ('{"node":"r%d","metrics":{"k":%d}}' % (i % 4, i)).encode()
        for i in range(20)
    ]
    cli = KafkaWireClient(broker.host, broker.port)
    try:
        for i, p in enumerate(payloads):
            cli.produce("telemetry", i % 2, [(b"10.0.0.1", p)])
        got = []
        for part in (0, 1):
            got += [v for (_o, _k, v) in cli.fetch("telemetry", part, 0)]
    finally:
        cli.close()
    assert sorted(got) == sorted(payloads)


def test_message_crc_is_verified():
    ms = encode_message_set([(0, encode_message(b"k", b"hello"))])
    corrupted = ms[:-1] + bytes([ms[-1] ^ 0xFF])
    with pytest.raises(ValueError, match="CRC"):
        decode_message_set(corrupted)
    # non-strict (the long-running spool's mode): the poisoned record
    # is skipped, good neighbors survive
    both = corrupted + encode_message_set([(1, encode_message(b"k2", b"ok"))])
    assert decode_message_set(both, strict=False) == [(1, b"k2", b"ok")]
    # and the clean set round-trips
    [(off, key, value)] = decode_message_set(ms)
    assert (off, key, value) == (0, b"k", b"hello")
    # full unsigned CRC-32 (high bit set) must verify — the spec form
    # librdkafka produces; the old 31-bit mask rejected ~half of all
    # real messages
    import zlib

    for payload in (b"a", b"b", b"c", b"hello", b"x" * 100):
        m = encode_message(None, payload)
        body = m[4:]
        assert decode_message_set(
            encode_message_set([(0, m)])
        ) == [(0, None, payload)]
        if zlib.crc32(body) & 0x80000000:
            break
    else:
        raise AssertionError("no test payload exercised a high-bit CRC")


def test_kafka_spool_survives_broker_death(spark, tmp_path):
    """flush() after the broker dies must NOT raise — a drain of
    already-spooled data cannot be crashed by a dead transport
    (UdpSpool's contract)."""
    import time

    from pmacct_spark.sources.kafka_wire import KafkaSpool

    b = MiniKafkaBroker(npartitions=1).start()
    cli = KafkaWireClient(b.host, b.port)
    cli.produce("t", 0, [(b"10.0.0.1", b"payload-1")])
    cli.produce("t", 0, [(b"10.0.0.1", b"payload-2")])
    cli.close()
    spool = KafkaSpool(b.host, b.port, "t", spool_dir=str(tmp_path / "ks"))
    spool.start()
    try:
        t0 = time.monotonic()
        while spool.datagrams_received < 2 and time.monotonic() - t0 < 10:
            time.sleep(0.05)
        assert spool.datagrams_received == 2
        b.stop()
        time.sleep(0.3)
        spool.flush()  # dead broker: records error, does not raise
        assert spool.batch(spark).count() == 2
    finally:
        spool.stop()


def test_fetch_from_offset_resumes(broker):
    """Fetch(offset=n) returns only the tail — the consumer-resume
    contract frames_to_datagrams' seqno ordering relies on."""
    cli = KafkaWireClient(broker.host, broker.port)
    try:
        for i in range(5):
            cli.produce("resume", 0, [(None, b"m%d" % i)])
        tail = cli.fetch("resume", 0, 3)
        assert [(o, v) for (o, _k, v) in tail] == [(3, b"m3"), (4, b"m4")]
    finally:
        cli.close()


def test_daemon_over_kafka_transport(spark, tmp_path):
    """The reference's Kafka collector transport (nfacctd_kafka_*):
    v5 datagrams PRODUCED to the wire broker (exporter address as the
    record key) are consumed by the daemon's KafkaSpool and flow
    through the same channels as UDP datagrams — the channel output
    matches the hand-computed golden from the UDP twin test."""
    import time

    from pmacct_spark.daemon import Daemon
    from tests.test_streaming import _v5_datagram

    b = MiniKafkaBroker(npartitions=2).start()
    try:
        cli = KafkaWireClient(b.host, b.port)
        try:
            recs1 = [
                {"src": 0x0A000001, "dst": 0x0B000001, "pkts": 10,
                 "bytes": 1000, "sport": 1234, "dport": 443, "proto": 6},
                {"src": 0x0A000002, "dst": 0x0B000001, "pkts": 2,
                 "bytes": 200, "sport": 53, "dport": 53, "proto": 17},
            ]
            recs2 = [
                {"src": 0x0A000001, "dst": 0x0B000001, "pkts": 5,
                 "bytes": 500, "sport": 1235, "dport": 443, "proto": 6},
            ]
            cli.produce(
                "nfacct", 0, [(b"127.0.0.1", _v5_datagram(1, recs1))]
            )
            cli.produce(
                "nfacct", 1, [(b"127.0.0.1", _v5_datagram(2, recs2))]
            )
        finally:
            cli.close()

        conf = f"""
nfacctd_kafka_broker_host: {b.host}
nfacctd_kafka_broker_port: {b.port}
nfacctd_kafka_topic: nfacct
plugins: print[files]
aggregate[files]: proto
print_history[files]: 5m
print_output[files]: csv
"""
        d = Daemon.from_conf(spark, conf, spool_dir=str(tmp_path / "kspool"))
        try:
            t0 = time.monotonic()
            while d.spool.datagrams_received < 2 and time.monotonic() - t0 < 15:
                time.sleep(0.05)
            assert d.spool.datagrams_received == 2
            out = d.run_available()["files"]
            got = {
                int(r["proto"]): (int(r["bytes"]), int(r["packets"]),
                                  int(r["flows"]))
                for r in out.collect()
            }
        finally:
            d.stop()
        assert got == {6: (1500, 15, 2), 17: (200, 2, 1)}
    finally:
        b.stop()


def test_broker_survives_malformed_request_body(spark):
    """ADVICE r5: a request whose BODY fails to parse (bad string
    length, truncated struct) must close that session cleanly — the
    broker keeps serving other clients, matching the malformed-peer
    hardening of the ZMTP servers."""
    import socket
    import struct as _struct

    from pmacct_spark.sources.kafka_wire import (
        MiniKafkaBroker,
        fetch_records,
        produce_frames,
    )

    b = MiniKafkaBroker().start()
    try:
        # valid size prefix, garbage body: api_key parse / dispatch
        # must not raise uncaught in the connection thread
        for body in (
            b"\xff",                       # truncated header
            _struct.pack(">hhi", 0, 0, 1) + b"\xff\xff\xff",  # bad string len
            _struct.pack(">hhih", 0, 0, 2, -1) + _struct.pack(">hiih", 1, 0, 1, 3)
            + b"zzz" + _struct.pack(">ii", 0, 999) + b"\x00" * 4,  # bad msgset
        ):
            c = socket.create_connection((b.host, b.port), timeout=5)
            c.sendall(_struct.pack(">i", len(body)) + body)
            # the broker either answers (leniently parsed) or drops
            # the session (EOF) — either way no hang, no thread crash
            c.settimeout(5)
            try:
                c.recv(4096)
            except (ConnectionError, TimeoutError):
                pass
            c.close()
        # a well-formed client still works end-to-end
        frames = spark.createDataFrame(
            [("k1", b"v1", "alive.topic")],
            "key string, value binary, topic string",
        )
        produce_frames(frames, b.host, b.port, nparts=1)
        back = fetch_records(spark, b.host, b.port, ["alive.topic"]).collect()
        assert [bytes(r["value"]) for r in back] == [b"v1"]
    finally:
        b.stop()


def test_daemon_survives_kafka_connection_loss(spark, tmp_path):
    """Reference test 900-kafka-connection-loss: the broker dies mid-
    collection and comes back; the daemon must keep everything already
    spooled, RECONNECT, resume from its committed offsets, and account
    records produced after recovery — librdkafka's automatic-recovery
    behavior, live over the wire protocol."""
    import time

    from pmacct_spark.daemon import Daemon
    from tests.test_streaming import _v5_datagram

    b = MiniKafkaBroker(npartitions=1).start()
    port = b.port
    d = None
    try:
        recs1 = [{"src": 0x0A000001, "dst": 0x0B000001, "pkts": 10,
                  "bytes": 1000, "sport": 1, "dport": 443, "proto": 6}]
        recs2 = [{"src": 0x0A000002, "dst": 0x0B000001, "pkts": 2,
                  "bytes": 200, "sport": 53, "dport": 53, "proto": 17}]
        dg1, dg2 = _v5_datagram(1, recs1), _v5_datagram(2, recs2)
        cli = KafkaWireClient(b.host, port)
        cli.produce("nfacct", 0, [(b"127.0.0.1", dg1)])
        cli.close()

        d = Daemon.from_conf(
            spark,
            f"""
nfacctd_kafka_broker_host: 127.0.0.1
nfacctd_kafka_broker_port: {port}
nfacctd_kafka_topic: nfacct
plugins: memory[acct]
aggregate[acct]: proto
sql_history[acct]: 5m
""",
            spool_dir=str(tmp_path / "kspool900"),
        )
        t0 = time.monotonic()
        while d.spool.datagrams_received < 1 and time.monotonic() - t0 < 15:
            time.sleep(0.05)
        assert d.spool.datagrams_received == 1

        # CONNECTION LOSS: broker down while the consumer polls
        b.stop()
        time.sleep(0.5)

        # broker returns on the SAME port with its log intact (the
        # durable-broker shape of tests/900): replay the old record,
        # add a new one — the consumer's committed offset (1) must
        # skip the replay and pick up exactly the new record
        b = MiniKafkaBroker(npartitions=1, port=port).start()
        cli = KafkaWireClient(b.host, port)
        cli.produce("nfacct", 0, [(b"127.0.0.1", dg1),
                                  (b"127.0.0.1", dg2)])
        cli.close()
        t0 = time.monotonic()
        while d.spool.datagrams_received < 2 and time.monotonic() - t0 < 20:
            time.sleep(0.05)
        assert d.spool.datagrams_received == 2, d.spool.last_error
        assert d.spool.reconnects >= 1
        out = d.run_available()["acct"]
        got = {int(r["proto"]): int(r["bytes"]) for r in out.collect()}
        # dg1 accounted ONCE (pre-loss spool + offset resume), dg2 once
        assert got == {6: 1000, 17: 200}
    finally:
        if d is not None:
            d.stop()
        b.stop()


def test_kafka_spool_rewinds_after_log_truncation():
    """If the broker returns with a SHORTER log than the consumer's
    position (state lost on restart), the spool rewinds to earliest —
    the auto.offset.reset analogue — instead of silently skipping
    every record produced after the restart."""
    import time

    from pmacct_spark.sources.kafka_wire import KafkaSpool

    b = MiniKafkaBroker(npartitions=1).start()
    port = b.port
    sp = None
    try:
        cli = KafkaWireClient(b.host, port)
        cli.produce("t", 0, [(b"a", b"m0"), (b"a", b"m1"), (b"a", b"m2")])
        cli.close()
        sp = KafkaSpool("127.0.0.1", port, "t").start()
        t0 = time.monotonic()
        while sp.datagrams_received < 3 and time.monotonic() - t0 < 10:
            time.sleep(0.05)
        assert sp.datagrams_received == 3

        b.stop()
        time.sleep(0.3)
        b = MiniKafkaBroker(npartitions=1, port=port).start()  # empty log
        cli = KafkaWireClient(b.host, port)
        cli.produce("t", 0, [(b"a", b"m-new")])  # offset 0 < consumer's 3
        cli.close()
        t0 = time.monotonic()
        while sp.datagrams_received < 4 and time.monotonic() - t0 < 20:
            time.sleep(0.05)
        assert sp.datagrams_received == 4, sp.last_error
        assert sp.rewinds >= 1 and sp.reconnects >= 1
    finally:
        if sp is not None:
            sp.stop()
        b.stop()


def test_kafka_fixed_partition_and_batching(spark):
    """kafka_partition (CONFIG-KEYS): a fixed partition id pins every
    message to one partition instead of key-hash routing; batching
    (batch.num.messages) groups them into fewer produce requests with
    dense offsets preserved."""
    from pmacct_spark.sources.kafka_wire import (
        KafkaWireClient,
        MiniKafkaBroker,
        produce_frames,
    )

    b = MiniKafkaBroker(npartitions=4).start()
    try:
        rows = [(f"k{i}", f"v{i}", "fixed.t") for i in range(20)]
        frames = spark.createDataFrame(
            rows, "key string, value string, topic string"
        )
        produce_frames(
            frames, "127.0.0.1", b.port,
            partition=3, batch_messages=8,
        )
        cli = KafkaWireClient("127.0.0.1", b.port)
        got = []
        empty = 0
        for p in range(4):
            _, rp = cli.fetch("fixed.t", p, 0, with_hwm=True)
            if not rp:
                empty += 1
            got += [
                (off, bytes(k).decode(), bytes(v).decode())
                for off, k, v in rp
            ]
        cli.close()
        assert empty == 3  # everything landed on the pinned partition
        assert sorted(v for _o, _k, v in got) == sorted(
            v for _k, v, _t in rows
        )
        assert sorted(o for o, _k, _v in got) == list(range(20))
    finally:
        b.stop()
