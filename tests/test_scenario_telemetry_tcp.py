"""Golden-output scenario: YANG telemetry over a LIVE TCP session —
the reference's tests/801-YANG-telemetry-IPv6-CISCO-tcp-json path
(src/telemetry/telemetry.c line decoder over TCP): newline-delimited
JSON notifications stream over a socket, the spool emits only
complete lines (a mid-line split stays buffered until the rest
arrives), and the parsed stream aggregates per sensor path."""

from __future__ import annotations

import json
import socket
import time

from pyspark.sql import functions as F

from pmacct_spark.sources.tcp import TcpSpool


def _lines():
    out = []
    for i in range(12):
        out.append(
            json.dumps(
                {
                    "node_id_str": f"router-{i % 2}",
                    "sensor_path": "ifstats" if i % 3 else "cpu",
                    "data_gpbkv": {"in_octets": 100 * (i + 1)},
                }
            ).encode()
            + b"\n"
        )
    return out


def test_telemetry_tcp_json_golden(spark, tmp_path):
    lines = _lines()
    payload = b"".join(lines)
    sp = TcpSpool(framing="jsonl", spool_dir=str(tmp_path / "ttcp")).start()
    try:
        c = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        c.connect(("127.0.0.1", sp.port))
        # split mid-line: the first send ends inside line 7
        cut = len(b"".join(lines[:6])) + 11
        c.sendall(payload[:cut])
        time.sleep(0.5)  # let the spool flush the complete prefix
        c.sendall(payload[cut:])
        c.close()
        t0 = time.monotonic()
        while sp.messages_spooled < 2 and time.monotonic() - t0 < 15:
            time.sleep(0.05)
        dg = sp.batch(spark)
        rows = dg.select(
            F.explode(
                F.split(F.col("payload").cast("string"), "\n")
            ).alias("line")
        ).filter("line <> ''")
        assert rows.count() == 12  # every line intact, none split
        parsed = rows.select(
            F.from_json(
                "line",
                "node_id_str string, sensor_path string, "
                "data_gpbkv struct<in_octets: bigint>",
            ).alias("n")
        ).select("n.*")
        agg = {
            (r["node_id_str"], r["sensor_path"]): (r["octets"], r["cnt"])
            for r in parsed.groupBy("node_id_str", "sensor_path")
            .agg(
                F.sum("data_gpbkv.in_octets").alias("octets"),
                F.count(F.lit(1)).alias("cnt"),
            )
            .collect()
        }
    finally:
        sp.stop()
    # hand-computed: i=0,3,6,9 are 'cpu' (octets 100,400,700,1000);
    # routers alternate by parity of i
    assert agg == {
        ("router-0", "cpu"): (100 + 700, 2),
        ("router-1", "cpu"): (400 + 1000, 2),
        ("router-0", "ifstats"): (300 + 500 + 900 + 1100, 4),
        ("router-1", "ifstats"): (200 + 600 + 800 + 1200, 4),
    }


def test_telemetry_cisco_dialout_live(spark, tmp_path):
    """Cisco MDT dial-out over a LIVE TCP session (reference
    telemetry_recv_cisco_v1, src/telemetry/telemetry_msg.c:173-212):
    v1-framed JSON + GPB + reset-compressor messages, sends split
    MID-FRAME, decode to tagged per-message rows."""
    import socket
    import time as _t

    from pmacct_spark.sources.tcp import TcpSpool
    from pmacct_spark.streaming.telemetry import (
        CISCO_GPB_KV,
        CISCO_JSON,
        CISCO_RESET_COMPRESSOR,
        decode_cisco_mdt,
        decode_gpb_kv,
        encode_cisco_frame,
        encode_gpb_kv,
    )

    kv_msg = encode_gpb_kv(
        "rtrA", "Cisco-IOS-XR:ifstats", {"in_octets": 1234, "if": "ge0"},
        msg_timestamp=99,
    )
    stream = (
        encode_cisco_frame(CISCO_JSON, b'{"k": 5, "path": "ifmib"}')
        + encode_cisco_frame(CISCO_RESET_COMPRESSOR, b"")
        + encode_cisco_frame(CISCO_GPB_KV, kv_msg)
        + encode_cisco_frame(CISCO_JSON, b'{"k": 7, "path": "qos"}')
    )
    with TcpSpool(
        framing="cisco_v1", spool_dir=str(tmp_path / "mdt_spool")
    ) as sp:
        c = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        c.connect(("127.0.0.1", sp.port))
        cut = 17  # inside the first frame's payload
        c.sendall(stream[:cut])
        _t.sleep(0.4)
        c.sendall(stream[cut:])
        c.close()
        t0 = _t.monotonic()
        while sp.messages_spooled < 1 and _t.monotonic() - t0 < 15:
            _t.sleep(0.05)
        _t.sleep(0.3)
        dg = sp.batch(spark)
        rows = decode_cisco_mdt(
            dg.select("exporter_ip", "seqno", "payload"), version=1
        ).collect()
    by_seq = sorted(rows, key=lambda r: r["seqno"])
    assert [r["decoder"] for r in by_seq] == ["json", "gpb_kv", "json"]
    assert '"k": 5' in by_seq[0]["payload_json"]
    # the gpb_kv payload survived the live session byte-exact AND
    # decodes through the self-describing-KV walker (round 8 — no
    # longer opaque: src/telemetry/telemetry_msg.c:150-246 dispatch)
    assert bytes(by_seq[1]["payload_raw"]) == kv_msg
    t = decode_gpb_kv(bytes(by_seq[1]["payload_raw"]))
    assert t["node_id"] == "rtrA" and t["msg_timestamp"] == 99
    leaves = dict(t["fields"])
    assert leaves["content/in_octets"] == 1234
    assert leaves["content/if"] == "ge0"
    assert '"k": 7' in by_seq[2]["payload_json"]


def test_telemetry_json_rides_kafka_frame_contract(spark):
    """pmtelemetryd-over-Kafka (reference src/telemetry/telemetry.c
    ZeroMQ/Kafka consumer paths): a telemetry JSON payload is one
    value frame — the kafka-source mapping feeds the SAME metrics
    pipeline as the socket paths, no broker needed to pin the plan."""
    from pyspark.sql import functions as F

    from pmacct_spark.sources.kafka import frames_to_datagrams

    kafka_shaped = spark.createDataFrame(
        [
            (b"10.0.0.9", b'{"k": 3}', "telemetry", 0, 0),
            (b"10.0.0.9", b'{"k": 4}', "telemetry", 0, 1),
            (None, b'{"k": 10}', "telemetry", 1, 0),
        ],
        "key binary, value binary, topic string, partition int, offset long",
    )
    dg = frames_to_datagrams(kafka_shaped)
    parsed = dg.select(
        "exporter_ip",
        F.from_json(F.col("payload").cast("string"), "k BIGINT")
        .getField("k")
        .alias("k"),
    )
    got = {
        r["exporter_ip"]: r["sum(k)"]
        for r in parsed.groupBy("exporter_ip").sum("k").collect()
    }
    assert got == {"10.0.0.9": 7, "kafka:telemetry/1": 10}
