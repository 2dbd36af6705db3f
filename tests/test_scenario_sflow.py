"""Second end-to-end golden-output scenario, mirroring the reference's
sampling-options test family (tests/104-*, sfacctd pipeline): sFlow v5
datagrams (built by our own sfprobe encoder — the reference replays
pcaps the same way) -> raw-header decode -> counter renormalization by
the sample's sampling_rate (src/pkt_handlers.c:1175-1213) -> channel
aggregation -> Kafka JSON frames vs a hand-computed golden."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from pmacct_spark.sinks.kafka import kafka_frame
from pmacct_spark.sinks.sfprobe import encode_sflow5
from pmacct_spark.streaming.decode import decode_sflow5

RATE = 100

# (ip_src_i, ip_dst_i, port_src, port_dst, proto, tos, tcp_flags,
#  bytes, iface_in, iface_out) — two records share the (src, proto) key
RECORDS = [
    (0x0A000001, 0x0A000002, 1111, 443, 6, 0, 24, 400, 1, 2),
    (0x0A000001, 0x0A000003, 2222, 443, 6, 0, 16, 600, 1, 2),
    (0x0A000005, 0x0A000006, 3333, 53, 17, 0, 0, 120, 3, 4),
]

# golden: renormalized bytes = frame bytes * RATE; packets = 1 sample
# * RATE; flows counts raw samples
GOLDEN = [
    {"ip_src": "10.0.0.1", "proto": "tcp",
     "bytes": (400 + 600) * RATE, "packets": 2 * RATE, "flows": 2},
    {"ip_src": "10.0.0.5", "proto": "udp",
     "bytes": 120 * RATE, "packets": 1 * RATE, "flows": 1},
]

IGNORED_FIELDS = {"stamp_inserted", "stamp_updated", "timestamp_arrival"}


def test_scenario_sflow_renorm_to_kafka_golden(spark):
    fl = spark.createDataFrame(
        RECORDS,
        "ip_src_i bigint, ip_dst_i bigint, port_src int, port_dst int, "
        "ip_proto int, tos int, tcp_flags int, bytes bigint, "
        "iface_in bigint, iface_out bigint",
    ).coalesce(1)
    datagrams = encode_sflow5(fl, sampling_rate=RATE).localCheckpoint(eager=True)
    decoded = decode_sflow5(datagrams.select("exporter_ip", "payload"))

    from pmacct_spark.functions.addr import ipv4_ntoa
    from pmacct_spark.functions.presentation import proto_name

    agg = (
        decoded.withColumn("ip_src", ipv4_ntoa("ip_src_i"))
        .withColumn("proto", proto_name("ip_proto"))
        # renormalization: counters *= protocol-reported sampling rate
        .withColumn("bytes", F.expr("bytes * sampling_rate"))
        .withColumn("packets", F.expr("1 * sampling_rate"))
        .groupBy("ip_src", "proto")
        .agg(
            F.sum("bytes").alias("bytes"),
            F.sum("packets").alias("packets"),
            F.count(F.lit(1)).alias("flows"),
        )
        .withColumn("stamp_inserted", F.lit("2024-01-01 00:00:00"))  # volatile
    )
    frames = kafka_frame(agg, "daisy.flow", key_cols=["ip_src"]).collect()

    got = sorted(
        (
            {k: v for k, v in json.loads(r["value"]).items() if k not in IGNORED_FIELDS}
            for r in frames
        ),
        key=lambda d: d["ip_src"],
    )
    assert got == GOLDEN
    assert {r["topic"] for r in frames} == {"daisy.flow"}
