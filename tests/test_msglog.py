"""BGP/BMP per-event message log (sinks/msglog.py) — the reference's
bgp_daemon_msglog_* / bmp_daemon_msglog_* surface: log_init / log /
log_close framing per peer, per-peer monotonic seq, reference JSON
field names, the per-peer file sink, and the live Kafka transport."""

import json
import pathlib

import pytest
from pyspark.sql import SparkSession

from tests.test_streaming import _bgp_update, _bmp_msg


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


def _bmp_session_events(spark):
    """peer up -> announce 10.1/16 -> withdraw 10.2/16 -> peer down."""
    from pmacct_spark.streaming.bmp import decode_bmp

    peer = 0xC0000205  # 192.0.2.5
    msgs = (
        _bmp_msg(3, peer, 64500)
        + _bmp_msg(0, peer, 64500, _bgp_update([], [(0x0A010000, 16)]))
        + _bmp_msg(0, peer, 64500, _bgp_update([(0x0A020000, 16)], []))
        + _bmp_msg(2, peer, 64500)
    )
    dg = spark.createDataFrame(
        [("203.0.113.9", bytearray(msgs))],
        "exporter_ip string, payload binary",
    )
    return decode_bmp(dg)


def test_msglog_event_framing(spark):
    """The reference's per-peer lifecycle: log_init on session up, one
    'log' per route with log_type update|withdraw, log_close on
    session down — seq monotonic from 1 within the peer."""
    from pmacct_spark.sinks.msglog import msglog_events

    out = (
        msglog_events(_bmp_session_events(spark))
        .orderBy("msglog_seq")
        .collect()
    )
    assert [r["event_type"] for r in out] == [
        "log_init", "log", "log", "log_close",
    ]
    assert [r["msglog_seq"] for r in out] == [1, 2, 3, 4]
    assert [r["log_type"] for r in out] == [None, "update", "withdraw", None]
    upd = out[1]
    assert upd["ip_prefix"] == "10.1.0.0/16"
    assert upd["bgp_nexthop"] == "10.0.0.254"
    assert upd["afi"] == 1 and upd["safi"] == 1
    wd = out[2]
    assert wd["ip_prefix"] == "10.2.0.0/16"
    # a withdraw carries no path attributes
    assert wd["bgp_nexthop"] is None and wd["as_path"] is None


def test_msglog_rd_instance_routes_are_safi_128(spark):
    """RD-instance peers (BMP peer type 1) log L3VPN routes: safi 128
    and the rd field present (reference logs the route's table)."""
    from pmacct_spark.sinks.msglog import msglog_events
    from pmacct_spark.streaming.bmp import decode_bmp

    peer = 0xC0000206
    rd = b"\x00\x00" + (1).to_bytes(2, "big") + (7).to_bytes(4, "big")
    msgs = _bmp_msg(
        0, peer, 64500, _bgp_update([], [(0x0A030000, 16)]), ptype=1, rd=rd
    )
    dg = spark.createDataFrame(
        [("203.0.113.9", bytearray(msgs))],
        "exporter_ip string, payload binary",
    )
    row = msglog_events(decode_bmp(dg)).collect()[0]
    assert row["safi"] == 128 and row["rd"] == "0:1:7"


def test_msglog_json_reference_field_names_nulls_omitted(spark):
    """JSON rows use the reference's field names (peer_ip_src, seq,
    ip_prefix, bgp_nexthop, comms...) and omit null fields the way
    the reference conditionally writes them."""
    from pmacct_spark.sinks.msglog import msglog_json

    rows = {
        r["msglog_seq"]: json.loads(r["json"])
        for r in msglog_json(_bmp_session_events(spark)).collect()
    }
    init = rows[1]
    assert init["event_type"] == "log_init"
    assert init["peer_ip_src"] == "192.0.2.5"
    # no route fields on a session event
    assert "ip_prefix" not in init and "as_path" not in init
    upd = rows[2]
    assert upd["log_type"] == "update"
    assert upd["ip_prefix"] == "10.1.0.0/16"
    assert upd["bgp_nexthop"] == "10.0.0.254"
    assert upd["as_path"] == "64496 65001"
    assert upd["local_pref"] == 150 and upd["med"] == 20
    assert upd["seq"] == 2 and upd["timestamp"] == 1_700_000_000


def test_msglog_file_sink_one_dir_per_peer(spark, tmp_path):
    """bgp_daemon_msglog_file's $peer_src_ip dynamic filename becomes
    a peer=<ip> partition directory; lines in a peer's log are in seq
    order."""
    from pmacct_spark.sinks.msglog import write_msglog

    path = str(tmp_path / "msglog")
    write_msglog(_bmp_session_events(spark), path)
    peer_dir = (
        pathlib.Path(path) / "exporter=203.0.113.9" / "peer=192.0.2.5"
    )
    assert peer_dir.is_dir()
    lines = []
    for f in sorted(peer_dir.glob("*.txt")):
        lines += [
            json.loads(ln)
            for ln in f.read_text().splitlines()
            if ln.strip()
        ]
    assert [ln["seq"] for ln in lines] == [1, 2, 3, 4]
    assert lines[0]["event_type"] == "log_init"
    assert lines[-1]["event_type"] == "log_close"


def test_msglog_rides_kafka_wire_live(spark):
    """bgp_daemon_msglog_kafka_topic: msglog frames produced through
    the LIVE wire-protocol broker come back intact and peer-keyed."""
    from pmacct_spark.sinks.msglog import msglog_kafka_frames
    from pmacct_spark.sources.kafka_wire import (
        MiniKafkaBroker,
        fetch_records,
        produce_frames,
    )

    b = MiniKafkaBroker(npartitions=2).start()
    try:
        frames = msglog_kafka_frames(
            _bmp_session_events(spark), topic="pmacct.bgp.msglog"
        )
        produce_frames(frames, b.host, b.port, nparts=2)
        back = fetch_records(
            spark, b.host, b.port, ["pmacct.bgp.msglog"]
        ).collect()
    finally:
        b.stop()
    assert len(back) == 4
    assert {r["key"] for r in back} == {"192.0.2.5"}
    types = sorted(
        json.loads(r["value"])["event_type"] for r in back
    )
    assert types == ["log", "log", "log_close", "log_init"]


def test_msglog_live_bgp_session(spark, tmp_path):
    """The BGP daemon half over a REAL socket: OPEN (log_init), two
    UPDATEs (log), NOTIFICATION (log_close) — the lifecycle the
    reference's bgp_daemon_msglog_file records for a peering
    session."""
    import socket
    import time

    from pmacct_spark.sinks.msglog import msglog_events
    from pmacct_spark.sources.tcp import TcpSpool
    from pmacct_spark.streaming.bmp import (
        decode_bgp,
        encode_bgp_open,
        encode_bgp_update,
    )

    notification = b"\xff" * 16 + (21).to_bytes(2, "big") + bytes([3, 6, 2])
    stream = (
        encode_bgp_open()
        + encode_bgp_update(0x0A000000, 8, "65000 65100")
        + encode_bgp_update(0x0A010000, 16, "65000 65200")
        + notification
    )
    with TcpSpool(
        framing="bgp", spool_dir=str(tmp_path / "bgp_msglog")
    ) as sp:
        c = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        c.connect(("127.0.0.1", sp.port))
        c.sendall(stream)
        c.close()
        t0 = time.monotonic()
        while sp.messages_spooled < 4 and time.monotonic() - t0 < 15:
            time.sleep(0.05)
        time.sleep(0.3)
        dg = sp.batch(spark)
    out = (
        msglog_events(
            decode_bgp(dg.select("exporter_ip", "seqno", "payload"))
        )
        .orderBy("msglog_seq")
        .collect()
    )
    assert [r["event_type"] for r in out] == [
        "log_init", "log", "log", "log_close",
    ]
    assert [r["msglog_seq"] for r in out] == [1, 2, 3, 4]
    assert out[1]["ip_prefix"] == "10.0.0.0/8"
    assert out[2]["as_path"] == "65000 65200"


def test_daemon_sflow_counter_log_file(spark, tmp_path):
    """sfacctd_counter_file (reference src/sfacctd.c:2366
    sf_cnt_log_msg): counter samples arriving on the LIVE sfacctd UDP
    socket are logged as per-agent JSON records with the reference's
    generic-interface-counter field names and a monotonic seq."""
    import socket
    import time

    from pmacct_spark.daemon import Daemon
    from pmacct_spark.sinks.sfprobe import encode_sflow_counters

    log_dir = str(tmp_path / "ctrlog")
    conf = f"""
sfacctd_port: 0
sfacctd_counter_file: {log_dir}
plugins: memory[ifaces]
aggregate[ifaces]: proto
"""
    rows = spark.createDataFrame(
        [
            (5, 6, 10**9, 1, 1111, 11, 0, 2222, 22, 1),
            (7, 6, 10**9, 1, 3333, 33, 2, 4444, 44, 3),
        ],
        "if_index LONG, if_type LONG, if_speed LONG, if_status LONG, "
        "if_in_octets LONG, if_in_ucast LONG, if_in_errors LONG, "
        "if_out_octets LONG, if_out_ucast LONG, if_out_errors LONG",
    )
    payloads = [
        bytes(r["payload"])
        for r in encode_sflow_counters(rows).select("payload").collect()
    ]
    d = Daemon.from_conf(spark, conf, spool_dir=str(tmp_path / "sp_ctr"))
    try:
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        for p in payloads:
            s.sendto(p, ("127.0.0.1", d.port))
        s.close()
        t0 = time.monotonic()
        while (
            d.spool.datagrams_received < len(payloads)
            and time.monotonic() - t0 < 15
        ):
            time.sleep(0.05)
        d.spool.flush()
        assert d.write_msglog_if_configured() == [log_dir]
    finally:
        d.stop()
    lines = []
    for f in pathlib.Path(log_dir).rglob("*.txt"):
        lines += [
            json.loads(ln)
            for ln in f.read_text().splitlines()
            if ln.strip()
        ]
    lines.sort(key=lambda r: r["ifIndex"])
    assert len(lines) == 2
    assert [ln["ifIndex"] for ln in lines] == [5, 7]
    assert lines[0]["ifInOctets"] == 1111
    assert lines[1]["ifOutUcastPkts"] == 44
    assert {ln["event_type"] for ln in lines} == {"log"}
    assert sorted(ln["seq"] for ln in lines) == [1, 2]


def test_telemetry_msglog_envelope(spark, tmp_path):
    """telemetry_daemon_msglog_file (reference
    src/telemetry/telemetry_logdump.c): each message rides the
    ietf-telemetry-message envelope — metadata carries the per-node
    seq label and export address, the serialization label says
    json-string, and the decoded message sits under payload
    verbatim."""
    from pmacct_spark.sinks.msglog import (
        telemetry_log_json,
        write_telemetry_log,
    )

    msgs = spark.createDataFrame(
        [
            ("10.0.0.1", 1, bytearray(b'{"k": 1, "path": "ifmib"}')),
            ("10.0.0.1", 2, bytearray(b'{"k": 2}')),
            ("10.0.0.2", 7, bytearray(b'{"k": 9}')),
        ],
        "exporter_ip string, seqno long, payload binary",
    )
    rows = {
        (r["exporter_ip"], r["log_seq"]): json.loads(r["json"])
        for r in telemetry_log_json(msgs, proc_name="telemetryd").collect()
    }
    # per-node seq restarts at 1
    assert set(rows) == {
        ("10.0.0.1", 1), ("10.0.0.1", 2), ("10.0.0.2", 1),
    }
    m = rows[("10.0.0.1", 1)]["ietf-telemetry-message:message"]
    meta = m["telemetry-message-metadata"]
    assert meta["notification-event"] == "update"
    assert meta["session-protocol"] == "telemetry"
    assert meta["export-address"] == "10.0.0.1"
    assert meta["labels"] == [{"name": "seq", "number-value": 1}]
    assert m["network-operator-metadata"]["labels"][0]["string-value"] == (
        "json-string"
    )
    assert m["data-collection-manifest"]["vendor"] == "pmacct"
    assert m["data-collection-manifest"]["name"] == "telemetryd"
    # payload embedded as an object, not an escaped string
    assert m["payload"] == {"k": 1, "path": "ifmib"}

    path = str(tmp_path / "tlog")
    write_telemetry_log(msgs, path)
    node_dir = pathlib.Path(path) / "node=10.0.0.1"
    assert node_dir.is_dir()
    lines = []
    for f in sorted(node_dir.glob("*.txt")):
        lines += [json.loads(ln) for ln in f.read_text().splitlines() if ln.strip()]
    assert len(lines) == 2


def test_daemon_pmtelemetryd_msglog_live(spark, tmp_path):
    """The pmtelemetryd flavor live: JSON telemetry over a real UDP
    socket (telemetry_daemon_port_udp), msglog written in the
    ietf-telemetry-message envelope (telemetry_daemon_msglog_file) —
    collect + log, no accounting channels, as the reference daemon
    runs."""
    import socket
    import time

    from pmacct_spark.daemon import Daemon

    log_dir = str(tmp_path / "tmsglog")
    conf = f"""
telemetry_daemon_port_udp: 0
telemetry_daemon_msglog_file: {log_dir}
core_proc_name: pmtelemetryd
"""
    d = Daemon.from_conf(spark, conf, spool_dir=str(tmp_path / "tspool"))
    try:
        assert d.flavor == "telemetry"
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        for k in (1, 2):
            s.sendto(
                json.dumps({"k": k, "sensor_path": "cpu"}).encode(),
                ("127.0.0.1", d.port),
            )
        s.close()
        t0 = time.monotonic()
        while d.spool.datagrams_received < 2 and time.monotonic() - t0 < 15:
            time.sleep(0.05)
        d.spool.flush()
        # no accounting channels on the telemetry flavor; the serve
        # cycle still runs (and fires the msglog hook internally)
        assert d.run_available() == {}
        assert d.write_msglog_if_configured() == [log_dir]
    finally:
        d.stop()
    lines = []
    for f in pathlib.Path(log_dir).rglob("*.txt"):
        lines += [
            json.loads(ln)
            for ln in f.read_text().splitlines()
            if ln.strip()
        ]
    assert len(lines) == 2
    msgs = [ln["ietf-telemetry-message:message"] for ln in lines]
    assert sorted(m["payload"]["k"] for m in msgs) == [1, 2]
    meta = msgs[0]["telemetry-message-metadata"]
    assert meta["export-address"] == "127.0.0.1"
    assert msgs[0]["data-collection-manifest"]["name"] == "pmtelemetryd"


def test_daemon_bmp_msglog_amqp_live(spark, tmp_path):
    """bmp_daemon_msglog_amqp_routing_key: the daemon publishes the
    per-event log through the LIVE AMQP 0-9-1 broker; a consumer
    bound to the exchange/key sees the session's full lifecycle."""
    import socket
    import time

    from pmacct_spark.daemon import Daemon
    from pmacct_spark.sinks.amqp_wire import AmqpWireClient, MiniAmqpBroker

    broker = MiniAmqpBroker().start()
    try:
        # bind the consumer queue BEFORE the daemon publishes
        sub = AmqpWireClient("127.0.0.1", broker.port)
        sub.exchange_declare("pmacct", "direct")
        sub.queue_declare("bmplog")
        sub.queue_bind("bmplog", "pmacct", "bmp.msglog")
        conf = f"""
nfacctd_port: 0
bmp_daemon: true
bmp_daemon_port: 0
bmp_daemon_msglog_amqp_routing_key: bmp.msglog
bmp_daemon_msglog_amqp_port: {broker.port}
plugins: memory[routes]
aggregate[routes]: as_path
"""
        d = Daemon.from_conf(
            spark, conf, spool_dir=str(tmp_path / "amqp_ml")
        )
        try:
            peer = 0xC0000205
            msgs = (
                _bmp_msg(3, peer, 64500)
                + _bmp_msg(0, peer, 64500, _bgp_update([], [(0x0A010000, 16)]))
                + _bmp_msg(2, peer, 64500)
            )
            c = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            c.connect(("127.0.0.1", d.bmp_port))
            c.sendall(msgs)
            c.close()
            t0 = time.monotonic()
            while (
                d.bmp_spool.messages_spooled < 3
                and time.monotonic() - t0 < 15
            ):
                time.sleep(0.05)
            time.sleep(0.3)
            wrote = d.write_msglog_if_configured()
            assert wrote == [
                f"amqp://127.0.0.1:{broker.port}/pmacct/bmp.msglog"
            ]
        finally:
            d.stop()
        got = []
        while True:
            msg = sub.get("bmplog")
            if msg is None:
                break
            got.append(json.loads(msg["body"]))
        sub.close()
    finally:
        broker.stop()
    types = sorted(g["event_type"] for g in got)
    assert types == ["log", "log_close", "log_init"]
    upd = next(g for g in got if g["event_type"] == "log")
    assert upd["ip_prefix"] == "10.1.0.0/16"


def test_daemon_sflow_counter_log_kafka_live(spark, tmp_path):
    """sfacctd_counter_kafka_topic: counter records stream through the
    LIVE Kafka wire broker, agent-keyed."""
    import socket
    import time

    from pmacct_spark.daemon import Daemon
    from pmacct_spark.sinks.sfprobe import encode_sflow_counters
    from pmacct_spark.sources.kafka_wire import (
        MiniKafkaBroker,
        fetch_records,
    )

    b = MiniKafkaBroker(npartitions=2).start()
    try:
        conf = f"""
sfacctd_port: 0
sfacctd_counter_kafka_topic: sflow.counters
sfacctd_counter_kafka_broker_port: {b.port}
plugins: memory[ifaces]
aggregate[ifaces]: proto
"""
        rows = spark.createDataFrame(
            [(9, 6, 10**9, 1, 555, 5, 0, 666, 6, 0)],
            "if_index LONG, if_type LONG, if_speed LONG, if_status LONG, "
            "if_in_octets LONG, if_in_ucast LONG, if_in_errors LONG, "
            "if_out_octets LONG, if_out_ucast LONG, if_out_errors LONG",
        )
        payloads = [
            bytes(r["payload"])
            for r in encode_sflow_counters(rows).select("payload").collect()
        ]
        d = Daemon.from_conf(spark, conf, spool_dir=str(tmp_path / "ck"))
        try:
            s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            for p in payloads:
                s.sendto(p, ("127.0.0.1", d.port))
            s.close()
            t0 = time.monotonic()
            while (
                d.spool.datagrams_received < 1
                and time.monotonic() - t0 < 15
            ):
                time.sleep(0.05)
            d.spool.flush()
            wrote = d.write_msglog_if_configured()
            assert wrote == [
                f"kafka://127.0.0.1:{b.port}/sflow.counters"
            ]
        finally:
            d.stop()
        back = fetch_records(
            spark, "127.0.0.1", b.port, ["sflow.counters"]
        ).collect()
    finally:
        b.stop()
    assert len(back) == 1
    rec = json.loads(back[0]["value"])
    assert rec["ifIndex"] == 9 and rec["ifInOctets"] == 555
    assert back[0]["key"] == "127.0.0.1"


def test_telemetry_msglog_skips_poison_payloads(spark):
    """A non-JSON datagram must not corrupt the envelope stream (the
    reference validates each message before logging); seq stays
    contiguous over the surviving messages."""
    from pmacct_spark.sinks.msglog import telemetry_log_json

    msgs = spark.createDataFrame(
        [
            ("10.0.0.1", 1, bytearray(b'{"k": 1}')),
            ("10.0.0.1", 2, bytearray(b"\xff\xfenot json")),
            ("10.0.0.1", 3, bytearray(b'{"k": 3}')),
        ],
        "exporter_ip string, seqno long, payload binary",
    )
    rows = telemetry_log_json(msgs).orderBy("log_seq").collect()
    assert [r["log_seq"] for r in rows] == [1, 2]
    ks = [
        json.loads(r["json"])["ietf-telemetry-message:message"]["payload"]["k"]
        for r in rows
    ]
    assert ks == [1, 3]


def test_bgp_notification_purges_rib_until_reopen(spark):
    """A NOTIFICATION terminates the BGP session and clears its
    Adj-RIB-In (reference session close); routes announced after the
    re-OPEN survive. The decoder's session events + rib_state's
    peer-down purge compose to the reference behavior."""
    from pmacct_spark.streaming.bmp import (
        decode_bgp,
        encode_bgp_open,
        encode_bgp_update,
        rib_state,
    )

    notif = b"\xff" * 16 + (21).to_bytes(2, "big") + bytes([3, 6, 2])
    stream = (
        encode_bgp_open()
        + encode_bgp_update(0x0A000000, 8, "65000 1")
        + notif
        + encode_bgp_open()
        + encode_bgp_update(0x0B000000, 8, "65000 2")
    )
    dg = spark.createDataFrame(
        [("9.9.9.9", 5, bytearray(stream))],
        "exporter_ip string, seqno long, payload binary",
    )
    rib = rib_state(decode_bgp(dg), peer_down=True).collect()
    assert [(r["prefix"], r["as_path"]) for r in rib] == [
        (0x0B000000, "65000 2")
    ]


def test_msglog_tick_skips_when_no_new_data(spark, tmp_path):
    """The serve loop must not multiply an O(session-history) log
    render per tick: with no new session data, the msglog hook is a
    no-op; new data triggers exactly one rewrite."""
    import socket
    import time

    from pmacct_spark.daemon import Daemon
    from pmacct_spark.streaming.bmp import encode_bgp_open, encode_bgp_update

    log_dir = str(tmp_path / "mlskip")
    conf = f"""
nfacctd_port: 0
bgp_daemon: true
bgp_daemon_port: 0
bgp_daemon_msglog_file: {log_dir}
plugins: memory[routes]
aggregate[routes]: as_path
"""
    d = Daemon.from_conf(spark, conf, spool_dir=str(tmp_path / "sp_skip"))
    try:
        def send(stream, want):
            c = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            c.connect(("127.0.0.1", d.bgp_port))
            c.sendall(stream)
            c.close()
            t0 = time.monotonic()
            while (
                d.bgp_spool.messages_spooled < want
                and time.monotonic() - t0 < 15
            ):
                time.sleep(0.05)
            time.sleep(0.3)

        send(encode_bgp_open() + encode_bgp_update(0x0A000000, 8, "65000 1"), 2)
        assert d.write_msglog_if_configured() == [log_dir]
        # same data: a second tick skips the O(history) render
        assert d.write_msglog_if_configured() == []
        # new data: exactly one rewrite
        send(encode_bgp_update(0x0B000000, 8, "65000 2"), 3)
        assert d.write_msglog_if_configured() == [log_dir]
    finally:
        d.stop()


def test_sflow_counter_log_survives_compaction(spark, tmp_path):
    """ADVICE r5 (medium): spool compaction must not drop counter
    history from the sfacctd_counter_* log. Counter samples ride the
    same datagrams as flow samples; when a spool file retires, its
    decoded counters are preserved in a compacted side table and
    unioned back into the counter-log path."""
    import socket
    import time

    from pmacct_spark.daemon import Daemon
    from pmacct_spark.sinks.sfprobe import encode_sflow_counters

    log_dir = str(tmp_path / "ctrlog_c")
    conf = f"""
sfacctd_port: 0
sfacctd_counter_file: {log_dir}
plugins: memory[ifaces]
aggregate[ifaces]: proto
"""
    d = Daemon.from_conf(spark, conf, spool_dir=str(tmp_path / "sp_ctr_c"))
    try:
        sent = 0
        # three bursts -> three spool files (flush per burst)
        for burst in ([5, 7], [9], [11]):
            rows = spark.createDataFrame(
                [
                    (i, 6, 10**9, 1, 100 * i, 10, 0, 200 * i, 20, 1)
                    for i in burst
                ],
                "if_index LONG, if_type LONG, if_speed LONG, if_status LONG, "
                "if_in_octets LONG, if_in_ucast LONG, if_in_errors LONG, "
                "if_out_octets LONG, if_out_ucast LONG, if_out_errors LONG",
            )
            payloads = [
                bytes(r["payload"])
                for r in encode_sflow_counters(rows).select("payload").collect()
            ]
            s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            for p in payloads:
                s.sendto(p, ("127.0.0.1", d.port))
            s.close()
            sent += len(payloads)
            t0 = time.monotonic()
            while (
                d.spool.datagrams_received < sent
                and time.monotonic() - t0 < 15
            ):
                time.sleep(0.05)
            d.spool.flush()
        n_live = len(d._live_spool_files())
        assert n_live >= 2
        # retire everything but the newest file, then render the log
        assert d.compact_spool(keep_files=1) == n_live - 1
        assert d.write_msglog_if_configured() == [log_dir]
    finally:
        d.stop()
    lines = []
    for f in pathlib.Path(log_dir).rglob("*.txt"):
        lines += [
            json.loads(ln)
            for ln in f.read_text().splitlines()
            if ln.strip()
        ]
    # ALL four samples survive — including the ones whose spool files
    # were retired — and the per-agent seq covers the full history
    assert sorted(ln["ifIndex"] for ln in lines) == [5, 7, 9, 11]
    assert sorted(ln["seq"] for ln in lines) == [1, 2, 3, 4]
    by_if = {ln["ifIndex"]: ln for ln in lines}
    assert by_if[5]["ifInOctets"] == 500
    assert by_if[11]["ifOutOctets"] == 2200


def test_msglog_gen_retry_after_sink_failure(spark, tmp_path):
    """ADVICE r5: a failed msglog publish (broker down) must NOT mark
    the spool generation as handled — the next call with unchanged
    data retries instead of silently dropping the events until new
    data arrives."""
    import socket
    import time

    from pmacct_spark.daemon import Daemon
    from pmacct_spark.sources.kafka_wire import MiniKafkaBroker, fetch_records

    # reserve a port the broker will come up on LATER
    probe = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    probe.bind(("127.0.0.1", 0))
    kport = probe.getsockname()[1]
    probe.close()

    conf = f"""
nfacctd_port: 0
bmp_daemon: true
bmp_daemon_port: 0
bmp_daemon_msglog_kafka_topic: bmp.retry
bmp_daemon_msglog_kafka_broker_port: {kport}
plugins: memory[routes]
aggregate[routes]: as_path
"""
    d = Daemon.from_conf(spark, conf, spool_dir=str(tmp_path / "sp_retry"))
    try:
        peer = 0xC0000205
        msgs = (
            _bmp_msg(3, peer, 64500)
            + _bmp_msg(0, peer, 64500, _bgp_update([], [(0x0A010000, 16)]))
        )
        c = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        c.connect(("127.0.0.1", d.bmp_port))
        c.sendall(msgs)
        c.close()
        t0 = time.monotonic()
        while d.bmp_spool.messages_spooled < 2 and time.monotonic() - t0 < 15:
            time.sleep(0.05)
        time.sleep(0.3)
        # broker down: the publish raises (ConnectionRefused surfaces
        # through the Spark job) and the generation must stay
        # unrecorded
        with pytest.raises(Exception, match="(?i)connection.?refused"):
            d.write_msglog_if_configured()
        broker = MiniKafkaBroker(port=kport).start()
        try:
            # same spool generation, broker now up: the retry delivers
            wrote = d.write_msglog_if_configured()
            assert wrote == [f"kafka://127.0.0.1:{kport}/bmp.retry"]
            got = [
                json.loads(bytes(r["value"]).decode())
                for r in fetch_records(
                    spark, "127.0.0.1", kport, ["bmp.retry"]
                ).collect()
            ]
            assert sorted(g["event_type"] for g in got) == [
                "log", "log_init",
            ]
            # and the generation is now recorded: no rewrite
            assert d.write_msglog_if_configured() == []
        finally:
            broker.stop()
    finally:
        d.stop()


def test_daemon_bmp_tag_map_and_label_filter(spark, tmp_path):
    """bmp_daemon_tag_map (pre_tag_map for the BMP thread — ip MATCH,
    set_tag/set_label SET) tags msglog events by peer address;
    bmp_daemon_msglog_label_filter keeps only matching labels
    (comma-OR). Reference CONFIG-KEYS + src/pretag.c find_id on the
    daemon threads."""
    import socket
    import time

    from pmacct_spark.daemon import Daemon

    tmap = tmp_path / "bmp_tag.map"
    tmap.write_text("set_tag=7 set_label=edge ip=127.0.0.1\n")

    def run_one(tag: str, label_filter: str | None):
        log_dir = tmp_path / f"ml_{tag}"
        conf = f"""
nfacctd_port: 0
bmp_daemon: true
bmp_daemon_port: 0
bmp_daemon_tag_map: {tmap}
bmp_daemon_msglog_file: {log_dir}
plugins: memory[routes]
aggregate[routes]: as_path
"""
        if label_filter:
            conf += f"bmp_daemon_msglog_label_filter: {label_filter}\n"
        d = Daemon.from_conf(
            spark, conf, spool_dir=str(tmp_path / f"spool_{tag}")
        )
        try:
            peer = 0xC0000205
            msgs = (
                _bmp_msg(3, peer, 64500)
                + _bmp_msg(0, peer, 64500,
                           _bgp_update([], [(0x0A010000, 16)]))
                + _bmp_msg(2, peer, 64500)
            )
            c = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            c.connect(("127.0.0.1", d.bmp_port))
            c.sendall(msgs)
            c.close()
            t0 = time.monotonic()
            while (
                d.bmp_spool.messages_spooled < 1
                and time.monotonic() - t0 < 15
            ):
                time.sleep(0.05)
            time.sleep(0.5)
            d.write_msglog_if_configured()
        finally:
            d.stop()
        lines = []
        for f in pathlib.Path(log_dir).rglob("*.txt"):
            lines += [
                json.loads(ln)
                for ln in f.read_text().splitlines()
                if ln.strip()
            ]
        return lines

    tagged = run_one("tagged", None)
    assert tagged and all(
        e["tag"] == 7 and e["label"] == "edge" for e in tagged
    )
    # label filter matching -> events kept; non-matching -> none
    assert run_one("kept", "edge,core")
    assert run_one("dropped", "other") == []


def test_daemon_telemetry_tag_map(spark, tmp_path):
    """telemetry_daemon_tag_map: the matched tag joins the envelope's
    metadata labels array as {"name": "tag", "number-value": N}
    (telemetry_tag_print_json, reference
    src/telemetry/telemetry_logdump.c:768); tag wins over label."""
    import socket
    import time

    from pmacct_spark.daemon import Daemon

    tmap = tmp_path / "tele_tag.map"
    tmap.write_text("set_tag=42 set_label=lab ip=127.0.0.1\n")
    log_dir = str(tmp_path / "ttaglog")
    conf = f"""
telemetry_daemon_port_udp: 0
telemetry_daemon_msglog_file: {log_dir}
telemetry_daemon_tag_map: {tmap}
core_proc_name: pmtelemetryd
"""
    d = Daemon.from_conf(spark, conf, spool_dir=str(tmp_path / "ttagspool"))
    try:
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        s.sendto(
            json.dumps({"k": 1, "sensor_path": "cpu"}).encode(),
            ("127.0.0.1", d.port),
        )
        s.close()
        t0 = time.monotonic()
        while d.spool.datagrams_received < 1 and time.monotonic() - t0 < 15:
            time.sleep(0.05)
        d.spool.flush()
        assert d.write_msglog_if_configured() == [log_dir]
    finally:
        d.stop()
    lines = []
    for f in pathlib.Path(log_dir).rglob("*.txt"):
        lines += [
            json.loads(ln)
            for ln in f.read_text().splitlines()
            if ln.strip()
        ]
    assert len(lines) == 1
    labels = lines[0]["ietf-telemetry-message:message"][
        "telemetry-message-metadata"
    ]["labels"]
    by_name = {e["name"]: e for e in labels}
    assert by_name["tag"]["number-value"] == 42
    assert "label" not in by_name  # tag wins (reference exit_lane)
    assert by_name["seq"]["number-value"] == 1


def test_daemon_bmp_msglog_avro_kafka_registry_live(spark, tmp_path):
    """The reference test-203 sink combo live end-to-end:
    bmp_daemon_msglog_output: avro + Kafka topic + Confluent schema
    registry + avro_schema_file — BMP events ride the wire broker as
    registry-framed Avro datums a FRESH registry client can decode,
    and the record schema lands in the .avsc file."""
    import socket
    import time

    from pmacct_spark.daemon import Daemon
    from pmacct_spark.sinks import avro as A
    from pmacct_spark.sinks.registry import (
        HttpSchemaRegistryClient,
        SchemaRegistryServer,
    )
    from pmacct_spark.sources.kafka_wire import (
        KafkaWireClient,
        MiniKafkaBroker,
    )

    broker = MiniKafkaBroker(npartitions=1).start()
    reg_srv = SchemaRegistryServer().start()
    d = None
    try:
        avsc = tmp_path / "bmp_msglog.avsc"
        conf = f"""
nfacctd_port: 0
bmp_daemon: true
bmp_daemon_port: 0
bmp_daemon_msglog_kafka_topic: daisy.bmp
bmp_daemon_msglog_kafka_broker_port: {broker.port}
bmp_daemon_msglog_output: avro
bmp_daemon_msglog_kafka_avro_schema_registry: http://127.0.0.1:{reg_srv.port}
bmp_daemon_msglog_avro_schema_file: {avsc}
plugins: memory[routes]
aggregate[routes]: as_path
"""
        d = Daemon.from_conf(spark, conf, spool_dir=str(tmp_path / "avroml"))
        peer = 0xC0000205
        msgs = (
            _bmp_msg(3, peer, 64500)
            + _bmp_msg(0, peer, 64500, _bgp_update([], [(0x0A010000, 16)]))
            + _bmp_msg(2, peer, 64500)
        )
        c = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        c.connect(("127.0.0.1", d.bmp_port))
        c.sendall(msgs)
        c.close()
        t0 = time.monotonic()
        while d.bmp_spool.messages_spooled < 1 and time.monotonic() - t0 < 15:
            time.sleep(0.05)
        time.sleep(0.5)
        wrote = d.write_msglog_if_configured()
        assert wrote == [f"kafka://127.0.0.1:{broker.port}/daisy.bmp"]
        # consume and decode with a FRESH client (schema over HTTP)
        cli = KafkaWireClient("127.0.0.1", broker.port)
        _, recs = cli.fetch("daisy.bmp", 0, 0, with_hwm=True)
        cli.close()
        fresh = HttpSchemaRegistryClient("127.0.0.1", reg_srv.port)
        events = [
            A.read_registry_frame(bytes(v), fresh)[1]
            for (_off, _k, v) in recs
        ]
        types = sorted(e["event_type"] for e in events)
        assert types == ["log", "log_close", "log_init"]
        upd = next(e for e in events if e["event_type"] == "log")
        assert upd["ip_prefix"] == "10.1.0.0/16"
        assert upd["peer_ip_src"] == "192.0.2.5"
        # the schema file is a decodable Avro record schema
        schema = json.loads(avsc.read_text())
        assert schema["type"] == "record"
        assert {"seq", "event_type", "ip_prefix"} <= {
            f["name"] for f in schema["fields"]
        }
    finally:
        if d is not None:
            d.stop()
        reg_srv.stop()
        broker.stop()


def test_daemon_telemetry_msglog_avro_kafka_registry_live(spark, tmp_path):
    """telemetry_daemon_msglog_output: avro — the BGP/BMP serdes combo
    (Kafka topic + Confluent schema registry + avro_schema_file)
    extended to the telemetry family: UDP telemetry notifications leave
    the wire broker as registry-framed Avro datums a FRESH registry
    client can decode, envelope metadata flattened into the record and
    the raw JSON message under payload."""
    import time

    from pmacct_spark.daemon import Daemon
    from pmacct_spark.sinks import avro as A
    from pmacct_spark.sinks.registry import (
        HttpSchemaRegistryClient,
        SchemaRegistryServer,
    )
    from pmacct_spark.sources.kafka_wire import (
        KafkaWireClient,
        MiniKafkaBroker,
    )
    from pmacct_spark.sources.udp import send_datagrams

    broker = MiniKafkaBroker(npartitions=1).start()
    reg_srv = SchemaRegistryServer().start()
    d = None
    try:
        avsc = tmp_path / "telemetry_msglog.avsc"
        conf = f"""
telemetry_daemon_port_udp: 0
telemetry_daemon_msglog_kafka_topic: daisy.telemetry
telemetry_daemon_msglog_kafka_broker_port: {broker.port}
telemetry_daemon_msglog_output: avro
telemetry_daemon_msglog_kafka_avro_schema_registry: http://127.0.0.1:{reg_srv.port}
telemetry_daemon_msglog_avro_schema_file: {avsc}
core_proc_name: pmtelemetryd
"""
        d = Daemon.from_conf(spark, conf, spool_dir=str(tmp_path / "tavro"))
        assert d.flavor == "telemetry"
        payloads = [
            json.dumps({"k": 1, "sensor_path": "cpu"}).encode(),
            json.dumps({"k": 2, "sensor_path": "ifstats"}).encode(),
        ]
        send_datagrams(payloads, "127.0.0.1", d.port)
        t0 = time.monotonic()
        while d.spool.datagrams_received < 2 and time.monotonic() - t0 < 15:
            time.sleep(0.05)
        d.spool.flush()
        wrote = d.write_msglog_if_configured()
        assert wrote == [f"kafka://127.0.0.1:{broker.port}/daisy.telemetry"]
        cli = KafkaWireClient("127.0.0.1", broker.port)
        _, recs = cli.fetch("daisy.telemetry", 0, 0, with_hwm=True)
        cli.close()
        fresh = HttpSchemaRegistryClient("127.0.0.1", reg_srv.port)
        events = [
            A.read_registry_frame(bytes(v), fresh)[1]
            for (_off, _k, v) in recs
        ]
        assert sorted(e["seq"] for e in events) == [1, 2]
        assert {e["notification_event"] for e in events} == {"update"}
        assert {e["export_address"] for e in events} == {"127.0.0.1"}
        payload_ks = sorted(json.loads(e["payload"])["k"] for e in events)
        assert payload_ks == [1, 2]
        schema = json.loads(avsc.read_text())
        assert schema["type"] == "record"
        assert {"seq", "export_address", "payload"} <= {
            f["name"] for f in schema["fields"]
        }
    finally:
        if d is not None:
            d.stop()
        reg_srv.stop()
        broker.stop()


def test_daemon_telemetry_dump_file_and_kafka_json(spark, tmp_path):
    """telemetry_dump_file / telemetry_dump_kafka_topic: the dump twin
    of the telemetry msglog — same ietf envelope with
    notification-event 'dump' (src/telemetry/telemetry_logdump.c:599
    event_type; :86-94 metadata rendering)."""
    import time

    from pmacct_spark.daemon import Daemon
    from pmacct_spark.sources.kafka_wire import (
        KafkaWireClient,
        MiniKafkaBroker,
    )
    from pmacct_spark.sources.udp import send_datagrams

    broker = MiniKafkaBroker(npartitions=1).start()
    d = None
    try:
        dump_dir = str(tmp_path / "tdump")
        conf = f"""
telemetry_daemon_port_udp: 0
telemetry_dump_file: {dump_dir}
telemetry_dump_kafka_topic: daisy.tdump
telemetry_dump_kafka_broker_port: {broker.port}
core_proc_name: pmtelemetryd
"""
        d = Daemon.from_conf(spark, conf, spool_dir=str(tmp_path / "tdspool"))
        send_datagrams(
            [json.dumps({"k": 5}).encode()], "127.0.0.1", d.port
        )
        t0 = time.monotonic()
        while d.spool.datagrams_received < 1 and time.monotonic() - t0 < 15:
            time.sleep(0.05)
        d.spool.flush()
        wrote = d.write_msglog_if_configured()
        assert wrote == [
            dump_dir,
            f"kafka://127.0.0.1:{broker.port}/daisy.tdump",
        ]
        lines = []
        for f in pathlib.Path(dump_dir).rglob("*.txt"):
            lines += [
                json.loads(ln)
                for ln in f.read_text().splitlines()
                if ln.strip()
            ]
        assert len(lines) == 1
        meta = lines[0]["ietf-telemetry-message:message"][
            "telemetry-message-metadata"
        ]
        assert meta["notification-event"] == "dump"
        cli = KafkaWireClient("127.0.0.1", broker.port)
        _, recs = cli.fetch("daisy.tdump", 0, 0, with_hwm=True)
        cli.close()
        assert len(recs) == 1
        ev = json.loads(bytes(recs[0][2]))
        assert ev["ietf-telemetry-message:message"][
            "telemetry-message-metadata"
        ]["notification-event"] == "dump"
        assert bytes(recs[0][1]) == b"127.0.0.1"  # keyed by node
    finally:
        if d is not None:
            d.stop()
        broker.stop()


def test_daemon_msglog_kafka_topic_rr_and_amqp_rr_live(spark, tmp_path):
    """bgp_daemon_msglog_kafka_topic_rr (CONFIG-KEYS:979; base
    semantics :722): msglog messages load-balance over
    <topic>_0..<topic>_{N-1} on the live broker — every event lands on
    exactly one of the suffixed topics and nothing on the base one."""
    import socket
    import time

    from pmacct_spark.daemon import Daemon
    from pmacct_spark.sources.kafka_wire import (
        KafkaWireClient,
        MiniKafkaBroker,
    )
    from pmacct_spark.streaming.bmp import (
        encode_bgp_open,
        encode_bgp_update,
    )

    broker = MiniKafkaBroker(npartitions=1).start()
    d = None
    try:
        conf = f"""
nfacctd_port: 0
bgp_daemon: true
bgp_daemon_port: 0
bgp_daemon_msglog_kafka_topic: daisy.rr
bgp_daemon_msglog_kafka_topic_rr: 2
bgp_daemon_msglog_kafka_broker_port: {broker.port}
plugins: memory[m]
aggregate[m]: proto
"""
        d = Daemon.from_conf(spark, conf, spool_dir=str(tmp_path / "rrspool"))
        stream = encode_bgp_open()
        for i in range(6):
            stream += encode_bgp_update(
                (10 << 24) | (i << 16), 16, f"65000 {65100 + i}"
            )
        c = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        c.connect(("127.0.0.1", d.bgp_port))
        c.sendall(stream)
        c.close()
        t0 = time.monotonic()
        while d.bgp_spool.messages_spooled < 1 and time.monotonic() - t0 < 15:
            time.sleep(0.05)
        time.sleep(0.5)
        wrote = d.write_msglog_if_configured()
        assert wrote == [f"kafka://127.0.0.1:{broker.port}/daisy.rr"]
        cli = KafkaWireClient("127.0.0.1", broker.port)
        per_topic = {}
        for t in ("daisy.rr", "daisy.rr_0", "daisy.rr_1"):
            try:
                _, recs = cli.fetch(t, 0, 0, with_hwm=True)
            except Exception:
                recs = []
            per_topic[t] = len(recs)
        cli.close()
    finally:
        if d is not None:
            d.stop()
        broker.stop()
    assert per_topic["daisy.rr"] == 0  # base topic bypassed
    # every event on exactly one suffix; both suffixes used (log_init
    # + 6 updates spread by row hash)
    assert per_topic["daisy.rr_0"] + per_topic["daisy.rr_1"] >= 7
    assert per_topic["daisy.rr_0"] > 0 and per_topic["daisy.rr_1"] > 0


def test_daemon_telemetry_tcp_sessions_msglog(spark, tmp_path):
    """telemetry_daemon_port_tcp (CONFIG-KEYS:3501): pmtelemetryd over
    LIVE TCP sessions — newline-delimited JSON documents (the default
    'json' decoder framing, :3552) split into per-message envelope
    records with per-node seq, even when several documents arrive in
    one TCP segment."""
    import socket
    import time

    from pmacct_spark.daemon import Daemon

    log_dir = str(tmp_path / "ttcp_log")
    conf = f"""
telemetry_daemon_port_tcp: 0
telemetry_daemon_msglog_file: {log_dir}
core_proc_name: pmtelemetryd
"""
    d = Daemon.from_conf(spark, conf, spool_dir=str(tmp_path / "ttcp"))
    try:
        assert d.flavor == "telemetry"
        c = socket.create_connection(("127.0.0.1", d.port), timeout=5)
        # three documents over one session, two in a single segment
        c.sendall(b'{"k": 1, "path": "cpu"}\n{"k": 2, "path": "mem"}\n')
        time.sleep(0.4)
        c.sendall(b'{"k": 3, "path": "ifstats"}\n')
        c.close()
        t0 = time.monotonic()
        while d.spool.messages_spooled < 1 and time.monotonic() - t0 < 15:
            time.sleep(0.05)
        time.sleep(0.5)
        assert d.write_msglog_if_configured() == [log_dir]
    finally:
        d.stop()
    lines = []
    for f in pathlib.Path(log_dir).rglob("*.txt"):
        lines += [
            json.loads(ln) for ln in f.read_text().splitlines() if ln.strip()
        ]
    assert len(lines) == 3
    msgs = sorted(
        (
            ln["ietf-telemetry-message:message"]["telemetry-message-metadata"][
                "labels"
            ][0]["number-value"],
            ln["ietf-telemetry-message:message"]["payload"]["k"],
        )
        for ln in lines
    )
    # per-node seq 1..3 in arrival order, one record per document
    assert msgs == [(1, 1), (2, 2), (3, 3)]


def test_telemetry_daemon_allow_file(spark, tmp_path):
    """telemetry_daemon_allow_file (CONFIG-KEYS:3572): messages from
    unlisted exporters never reach the msglog; listed ones do."""
    import time

    from pmacct_spark.daemon import Daemon
    from pmacct_spark.sources.udp import send_datagrams

    af = tmp_path / "tallow.lst"
    af.write_text("127.0.0.1\n")
    log_dir = str(tmp_path / "tallow_log")
    conf = f"""
telemetry_daemon_port_udp: 0
telemetry_daemon_allow_file: {af}
telemetry_daemon_msglog_file: {log_dir}
core_proc_name: pmtelemetryd
"""
    d = Daemon.from_conf(spark, conf, spool_dir=str(tmp_path / "tallow"))
    try:
        # inject one message under a spoofed unlisted exporter and one
        # real datagram from loopback
        d.spool.inject("203.0.113.50", json.dumps({"k": 99}).encode())
        send_datagrams(
            [json.dumps({"k": 1}).encode()], "127.0.0.1", d.port
        )
        t0 = time.monotonic()
        while d.spool.datagrams_received < 2 and time.monotonic() - t0 < 15:
            time.sleep(0.05)
        d.spool.flush()
        assert d.write_msglog_if_configured() == [log_dir]
    finally:
        d.stop()
    lines = []
    for f in pathlib.Path(log_dir).rglob("*.txt"):
        lines += [json.loads(ln) for ln in f.read_text().splitlines() if ln.strip()]
    ks = [
        ln["ietf-telemetry-message:message"]["payload"]["k"] for ln in lines
    ]
    assert ks == [1]  # the unlisted exporter's message was dropped


def test_msglog_kafka_partition_and_config_file(spark, tmp_path):
    """bgp_daemon_msglog_kafka_partition /
    bgp_daemon_msglog_kafka_config_file (CONFIG-KEYS family): the
    msglog emitter honors a fixed partition id and the config-file
    producer properties, like the accounting plugin does."""
    import types

    from pmacct_spark.daemon import Daemon
    from pmacct_spark.sources.kafka_wire import (
        KafkaWireClient,
        MiniKafkaBroker,
    )

    kcf = tmp_path / "ml_kafka.cfg"
    kcf.write_text("global, batch.num.messages, 4\n")
    conf_map = {
        "bgp_daemon_msglog_kafka_partition": "1",
        "bgp_daemon_msglog_kafka_config_file": str(kcf),
    }
    d = Daemon.__new__(Daemon)
    d.conf = types.SimpleNamespace(
        get=lambda k, *a, **kw: conf_map.get(k, kw.get("default"))
    )
    opts = d._kafka_wire_opts("bgp_daemon_msglog")
    assert opts == {"partition": 1, "batch_messages": 4}
    # live effect: every message lands on the pinned partition
    from pmacct_spark.sinks.msglog import msglog_kafka_frames
    from pmacct_spark.sources.kafka_wire import produce_frames

    b = MiniKafkaBroker(npartitions=3).start()
    try:
        frames = msglog_kafka_frames(
            _bmp_session_events(spark), topic="pin.msglog"
        )
        produce_frames(frames, b.host, b.port, nparts=3, **opts)
        cli = KafkaWireClient(b.host, b.port)
        counts = {}
        for p in range(3):
            _, rp = cli.fetch("pin.msglog", p, 0, with_hwm=True)
            counts[p] = len(rp)
        cli.close()
    finally:
        b.stop()
    assert counts == {0: 0, 1: 4, 2: 0}


def test_daemon_bmp_set_pd_field_switch(spark, tmp_path):
    """bmp_daemon_set_pd (CONFIG-KEYS:3331; pd_target
    src/bmp/bmp_logdump.c:423): the BMP Peer Distinguisher of an
    RD-Instance peer encodes under "pd" instead of "rd" when the knob
    is set; default keeps "rd". All-zero distinguishers stay omitted
    either way."""
    import socket
    import time

    from pmacct_spark.daemon import Daemon

    rd = b"\x00\x00" + (64500).to_bytes(2, "big") + (1).to_bytes(4, "big")

    def run_one(tag: str, set_pd: bool):
        log_dir = tmp_path / f"pd_{tag}"
        conf = f"""
nfacctd_port: 0
bmp_daemon: true
bmp_daemon_port: 0
bmp_daemon_msglog_file: {log_dir}
plugins: memory[routes]
aggregate[routes]: as_path
"""
        if set_pd:
            conf += "bmp_daemon_set_pd: true\n"
        d = Daemon.from_conf(
            spark, conf, spool_dir=str(tmp_path / f"pd_spool_{tag}")
        )
        try:
            peer = 0xC0000207
            msgs = (
                _bmp_msg(3, peer, 64500, ptype=2, rd=rd)
                + _bmp_msg(0, peer, 64500,
                           _bgp_update([], [(0x0A020000, 16)]),
                           ptype=2, rd=rd)
            )
            c = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            c.connect(("127.0.0.1", d.bmp_port))
            c.sendall(msgs)
            c.close()
            t0 = time.monotonic()
            while (
                d.bmp_spool.messages_spooled < 1
                and time.monotonic() - t0 < 15
            ):
                time.sleep(0.05)
            time.sleep(0.5)
            d.write_msglog_if_configured()
        finally:
            d.stop()
        lines = []
        for f in pathlib.Path(log_dir).rglob("*.txt"):
            lines += [
                json.loads(ln)
                for ln in f.read_text().splitlines()
                if ln.strip()
            ]
        return lines

    plain = run_one("off", False)
    route_evs = [e for e in plain if e.get("event_type") == "log"]
    assert route_evs and all(e["rd"] == "0:64500:1" for e in route_evs)
    assert all("pd" not in e for e in plain)

    switched = run_one("on", True)
    route_evs = [e for e in switched if e.get("event_type") == "log"]
    assert route_evs and all(e["pd"] == "0:64500:1" for e in route_evs)
    assert all("rd" not in e for e in switched)


def test_daemon_udp_notif_transport_live(spark, tmp_path):
    """telemetry_daemon_udp_notif_port / _ip (CONFIG-KEYS:3522, the
    unyte UDP-Notif integration): the daemon collects
    draft-ietf-netconf-udp-notif datagrams on a live socket, the
    segmentation-aware decode reassembles split messages, and the
    msglog carries the whole JSON payloads."""
    import socket
    import time

    from pmacct_spark.daemon import Daemon
    from pmacct_spark.streaming.telemetry import encode_udp_notif

    log_dir = str(tmp_path / "unotif_log")
    conf = f"""
telemetry_daemon_udp_notif_port: 0
telemetry_daemon_udp_notif_ip: 127.0.0.1
telemetry_daemon_msglog_file: {log_dir}
core_proc_name: pmtelemetryd
"""
    d = Daemon.from_conf(spark, conf, spool_dir=str(tmp_path / "unotif_sp"))
    try:
        assert d.flavor == "telemetry"
        whole = json.dumps({"k": 1, "sensor_path": "cpu"}).encode()
        split = json.dumps({"k": 2, "sensor_path": "mem"}).encode()
        half = len(split) // 2
        dgrams = [
            encode_udp_notif(whole, observation_domain=9, message_id=5),
            # message 6 arrives in two segments, out of order
            encode_udp_notif(split[half:], observation_domain=9,
                             message_id=6, segment=(1, True)),
            encode_udp_notif(split[:half], observation_domain=9,
                             message_id=6, segment=(0, False)),
        ]
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        for p in dgrams:
            s.sendto(p, ("127.0.0.1", d.port))
        s.close()
        t0 = time.monotonic()
        while d.spool.datagrams_received < 3 and time.monotonic() - t0 < 15:
            time.sleep(0.05)
        d.spool.flush()
        assert d.write_msglog_if_configured() == [log_dir]
    finally:
        d.stop()
    lines = []
    for f in pathlib.Path(log_dir).rglob("*.txt"):
        lines += [
            json.loads(ln)
            for ln in f.read_text().splitlines()
            if ln.strip()
        ]
    msgs = [ln["ietf-telemetry-message:message"] for ln in lines]
    assert sorted(m["payload"]["k"] for m in msgs) == [1, 2]
