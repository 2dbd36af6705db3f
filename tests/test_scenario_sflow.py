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


# ---------------------------------------------------------------------------
# v2/v4 dispatch (RFC 3176 wire; reference src/sfacctd.c:1438,1578-1581)
# ---------------------------------------------------------------------------

def _v4_flow_datagram(seqno: int, rows: list[tuple]) -> bytes:
    """Hand-built sFlow v4 datagram: flow samples with an eth/IPv4/TCP
    header, zero extended records."""
    import struct

    out = struct.pack("!IIIIII", 4, 1, 0x7F000001, seqno, 0, len(rows))
    for (src, dst, sport, dport, rate, frame_len) in rows:
        eth = b"\x02" * 6 + b"\x04" * 6 + b"\x08\x00"
        ip = (
            bytes([0x45, 0]) + (40).to_bytes(2, "big") + b"\x00" * 4
            + bytes([64, 6]) + b"\x00\x00"
            + src.to_bytes(4, "big") + dst.to_bytes(4, "big")
        )
        l4 = sport.to_bytes(2, "big") + dport.to_bytes(2, "big") + b"\x00" * 16
        hdr = eth + ip + l4
        pad = (-len(hdr)) % 4
        out += struct.pack("!I", 1)  # sample_type = FLOW
        out += struct.pack("!IIIIIII", seqno, 1, rate, 1000, 0, 2, 3)
        out += struct.pack("!I", 1)  # packet_data_type = HEADER
        out += struct.pack("!III", 1, frame_len, len(hdr))
        out += hdr + b"\x00" * pad
        out += struct.pack("!I", 0)  # n_extended = 0
    return out


def test_sflow_v4_flow_dispatch(spark):
    from pmacct_spark.streaming.decode import decode_sflow_any

    rows = [
        (0x0A000001, 0x0A000002, 1234, 443, 128, 900),
        (0x0A000003, 0x0A000004, 5555, 80, 128, 1200),
    ]
    dg = spark.createDataFrame(
        [("198.51.100.9", 1, bytearray(_v4_flow_datagram(1, rows)))],
        "exporter_ip string, seqno long, payload binary",
    )
    got = {
        (r.ip_src_i, r.ip_dst_i, r.port_src, r.port_dst, r.bytes,
         r.sampling_rate, r.iface_in, r.iface_out)
        for r in decode_sflow_any(dg.select("exporter_ip", "payload")).collect()
    }
    assert got == {
        (0x0A000001, 0x0A000002, 1234, 443, 900, 128, 2, 3),
        (0x0A000003, 0x0A000004, 5555, 80, 1200, 128, 2, 3),
    }


def test_sflow_any_matches_v5_decoder(spark, flows_df=None):
    """v5 datagrams through the dispatch decoder == decode_sflow5."""
    from pmacct_spark.sinks.sfprobe import encode_sflow5
    from pmacct_spark.streaming.decode import decode_sflow5, decode_sflow_any

    src = spark.range(50).selectExpr(
        "167772160 + id AS ip_src_i", "167772161 + id AS ip_dst_i",
        "CAST(1000 + id AS INT) AS port_src", "CAST(443 AS INT) AS port_dst",
        "CAST(CASE WHEN id % 2 = 0 THEN 6 ELSE 17 END AS INT) AS ip_proto",
        "CAST(0 AS INT) AS tos", "CAST(16 AS INT) AS tcp_flags",
        "100 + id AS bytes", "id % 8 AS iface_in", "(id + 1) % 8 AS iface_out",
    )
    dg = encode_sflow5(src, sampling_rate=32).select("exporter_ip", "payload")
    a = sorted(map(tuple, decode_sflow5(dg).collect()))
    b = sorted(map(tuple, decode_sflow_any(dg).collect()))
    assert a == b and len(a) == 50


def test_sflow_v5_expanded_flow_sample(spark):
    """v5 EXPANDED flow samples (type 3: split source-id and
    format/value interface fields) decode identically to compact flow
    samples."""
    import struct

    eth = b"\x02" * 6 + b"\x04" * 6 + b"\x08\x00"
    ip = (
        bytes([0x45, 0]) + (40).to_bytes(2, "big") + b"\x00" * 4
        + bytes([64, 17]) + b"\x00\x00"
        + (0x0A000007).to_bytes(4, "big") + (0x0A000008).to_bytes(4, "big")
    )
    l4 = (53).to_bytes(2, "big") + (5353).to_bytes(2, "big") + b"\x00\x08\x00\x00"
    hdr = eth + ip + l4
    pad = (-len(hdr)) % 4
    raw = struct.pack("!IIII", 1, 777, 4, len(hdr)) + hdr + b"\x00" * pad
    body = (
        struct.pack("!IIIIIIIIIII", 1, 0, 5, 256, 1000, 0, 0, 4, 0, 9, 1)
        + struct.pack("!II", 1, len(raw))
        + raw
    )
    dgram = struct.pack(
        "!IIIIIII", 5, 1, 0x7F000001, 0, 42, 0, 1
    ) + struct.pack("!II", 3, len(body)) + body

    from pmacct_spark.streaming.decode import decode_sflow5

    dg = spark.createDataFrame(
        [("198.51.100.3", 1, bytearray(dgram))],
        "exporter_ip string, seqno long, payload binary",
    )
    out = decode_sflow5(dg.select("exporter_ip", "payload")).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.ip_src_i, r.ip_dst_i, r.port_src, r.port_dst) == (
        0x0A000007, 0x0A000008, 53, 5353,
    )
    assert (r.bytes, r.sampling_rate, r.iface_in, r.iface_out) == (777, 256, 4, 9)


def test_sflow_v6_agent_address_roundtrip(spark):
    """sFlow agent-address type 2 (IPv6 agent): the v5 header carries
    a 16-byte agent that becomes the exporter identity, exactly like
    the v4 type-1 form (reference getAddress walk; sfprobe with an
    IPv6 sfprobe_source_ip emits it)."""
    from pmacct_spark.sinks.sfprobe import encode_sflow5
    from pmacct_spark.streaming.decode import decode_sflow5

    fl = spark.createDataFrame(
        [(0x0A000001, 0x0B000001, 1, 2, 1500, 1234, 443, 0x18, 6, 0)],
        "ip_src_i long, ip_dst_i long, iface_in long, iface_out long,"
        " bytes long, port_src long, port_dst long, tcp_flags long,"
        " ip_proto long, tos long",
    )
    agent = "2001:db8::17"
    back = decode_sflow5(
        encode_sflow5(fl, agent_ip=agent).select(
            "exporter_ip", "payload"
        )
    ).collect()
    assert len(back) == 1
    assert back[0]["exporter_ip"] == agent  # v6 agent IS the identity
    assert back[0]["port_dst"] == 443
