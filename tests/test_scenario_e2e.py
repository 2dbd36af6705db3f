"""End-to-end golden-output scenario, the reference's own test shape
(SURVEY §5: pcap -> daemon -> Kafka JSON vs golden file, e.g.
tests/100-IPFIXv10-CISCO): synthesized NetFlow v9 datagrams ->
template-stateful decode -> channel aggregation -> Kafka JSON frames ->
compare to a hand-computed golden, ignoring volatile fields the way
the reference's harness does."""

from __future__ import annotations

import json
import struct

from pyspark.sql import functions as F

from pmacct_spark.sinks.kafka import kafka_frame
from pmacct_spark.streaming.decode import decode_v9, prepare_datagrams

EXPORTER = "198.51.100.77"

# (src, dst, bytes, pkts, proto) flow records across two datagrams;
# two records share a key and must aggregate
FLOWS = [
    (0x0A000001, 0x0A000002, 1000, 10, 6),
    (0x0A000001, 0x0A000002, 500, 5, 6),   # same key -> sums
    (0x0A000003, 0x0A000004, 700, 7, 17),
]

GOLDEN = [
    {"ip_src": "10.0.0.1", "ip_dst": "10.0.0.2", "proto": "tcp",
     "bytes": 1500, "packets": 15, "flows": 2},
    {"ip_src": "10.0.0.3", "ip_dst": "10.0.0.4", "proto": "udp",
     "bytes": 700, "packets": 7, "flows": 1},
]

IGNORED_FIELDS = {"stamp_inserted", "stamp_updated", "timestamp_arrival"}


def _tmpl(tid):
    fields = [(8, 4), (12, 4), (1, 4), (2, 4), (4, 1)]
    body = struct.pack("!HH", tid, len(fields))
    for ie, ln in fields:
        body += struct.pack("!HH", ie, ln)
    return struct.pack("!HH", 0, 4 + len(body)) + body


def _data(tid, recs):
    body = b"".join(struct.pack("!IIIIB", *r) for r in recs)
    return struct.pack("!HH", tid, 4 + len(body)) + body


def _pkt(seq, sets):
    return struct.pack("!HHIIII", 9, len(sets), 0, 1_700_000_000, seq, 1) + b"".join(sets)


def test_scenario_v9_to_kafka_golden(spark):
    tid = 258
    datagrams = [
        (EXPORTER, 1, bytearray(_pkt(1, [_tmpl(tid)]))),
        (EXPORTER, 2, bytearray(_pkt(2, [_data(tid, FLOWS[:2])]))),
        (EXPORTER, 3, bytearray(_pkt(3, [_data(tid, FLOWS[2:])]))),
    ]
    dg = prepare_datagrams(
        spark.createDataFrame(
            datagrams, "exporter_ip string, arrival_seq int, payload binary"
        )
    )
    decoded = decode_v9(dg)

    # presentation + aggregation: the channel `aggregate: src_host,
    # dst_host, proto`
    from pmacct_spark.functions.addr import ipv4_ntoa
    from pmacct_spark.functions.presentation import proto_name

    agg = (
        decoded.withColumn("ip_src", ipv4_ntoa("ip_src_i"))
        .withColumn("ip_dst", ipv4_ntoa("ip_dst_i"))
        .withColumn("proto", proto_name("ip_proto"))
        .groupBy("ip_src", "ip_dst", "proto")
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
    assert all(r["topic"] == "daisy.flow" for r in frames)
    keys = {r["key"] for r in frames}
    assert keys == {"10.0.0.1", "10.0.0.3"}
