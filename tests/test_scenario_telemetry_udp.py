"""Golden-output scenario: YANG telemetry over a LIVE UDP socket — the
reference's tests/800-YANG-telemetry-HUAWEI-udp-notif path
(src/telemetry/telemetry.c:72): JSON notification datagrams arrive on
the collector socket, parse with a declared schema, and aggregate per
sensor path. End-to-end through the real loopback transport: telemetry
JSON -> UDP -> UdpSpool parquet -> from_json -> windowless aggregation
vs hand-computed goldens.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

from pmacct_spark.sources.udp import UdpSpool, send_datagrams


def _notifications():
    out = []
    for i in range(30):
        out.append(
            json.dumps(
                {
                    "node_id_str": f"router-{i % 2}",
                    "sensor_path": "ifstats" if i % 3 else "cpu",
                    "collection_timestamp": 1_700_000_000 + i,
                    "data_gpbkv": {"in_octets": 100 * (i + 1), "if": i % 4},
                }
            ).encode()
        )
    return out


def test_telemetry_udp_notif_golden(spark, tmp_path):
    payloads = _notifications()
    with UdpSpool(spool_dir=str(tmp_path / "tspool"), flush_secs=0.2) as sp:
        send_datagrams(payloads, "127.0.0.1", sp.port)
        t0 = time.monotonic()
        while sp.datagrams_received < 30 and time.monotonic() - t0 < 15:
            time.sleep(0.05)
    dg = sp.batch(spark)
    assert dg.count() == 30
    schema = (
        "node_id_str string, sensor_path string, "
        "collection_timestamp long, data_gpbkv struct<in_octets: bigint, if: int>"
    )
    parsed = dg.select(
        F.from_json(F.col("payload").cast("string"), schema).alias("n")
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
    # hand-computed: i in 0..29; router-(i%2); cpu when i%3==0
    golden: dict = {}
    for i in range(30):
        key = (f"router-{i % 2}", "ifstats" if i % 3 else "cpu")
        o, c = golden.get(key, (0, 0))
        golden[key] = (o + 100 * (i + 1), c + 1)
    assert agg == golden


def test_udp_notif_live_with_segmentation(spark, tmp_path):
    """UDP-Notif (RFC 9742, reference tests/800) over a LIVE socket:
    plain and segmented notifications — segments arriving out of
    order — reassemble byte-exact before the JSON parse."""
    import time as _t

    from pmacct_spark.sources.udp import UdpSpool, send_datagrams
    from pmacct_spark.streaming.telemetry import (
        decode_udp_notif,
        encode_udp_notif,
    )

    body = b'{"k": 42, "path": "interfaces"}'
    cut = 11
    dgrams = [
        encode_udp_notif(b'{"k": 7}', observation_domain=3, message_id=1),
        # segments OUT OF ORDER: last segment first
        encode_udp_notif(body[cut:], observation_domain=3, message_id=2,
                         segment=(1, True)),
        encode_udp_notif(body[:cut], observation_domain=3, message_id=2,
                         segment=(0, False)),
        # incomplete message: must be dropped, not emitted truncated
        encode_udp_notif(b'{"k": 9', observation_domain=3, message_id=5,
                         segment=(0, False)),
    ]
    with UdpSpool(spool_dir=str(tmp_path / "unotif")) as sp:
        send_datagrams(dgrams, "127.0.0.1", sp.port)
        t0 = _t.monotonic()
        while sp.datagrams_received < 4 and _t.monotonic() - t0 < 15:
            _t.sleep(0.05)
        sp.flush()
        rows = decode_udp_notif(
            sp.batch(spark).select("exporter_ip", "payload")
        ).collect()
    got = {r["message_id"]: r["payload_json"] for r in rows}
    assert got == {1: '{"k": 7}', 2: body.decode()}


def test_telemetry_json_rides_zmq_frame_contract(spark):
    """Telemetry over ZeroMQ (reference telemetry.c ZMQ consumer,
    also the gRPC bridge's local PULL socket): (topic, payload)
    frames map onto the datagram contract and feed the same JSON
    metrics pipeline — no socket needed to pin the plan."""
    from pyspark.sql import functions as F

    from pmacct_spark.sinks.zmq import zmq_frames_to_datagrams

    frames = spark.createDataFrame(
        [(7, b'{"k": 3}'), (7, b'{"k": 4}'), (9, b'{"k": 10}')],
        "topic int, payload binary",
    )
    dg = zmq_frames_to_datagrams(frames)
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
    assert got == {"zmq:7": 7, "zmq:9": 10}
