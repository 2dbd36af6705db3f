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
