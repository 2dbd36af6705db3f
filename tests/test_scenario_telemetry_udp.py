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
