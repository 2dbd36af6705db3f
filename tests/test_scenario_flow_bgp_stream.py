"""Golden-output scenario: live flow + BGP correlation in STREAMING
mode — the reference's tests/5xx family (500-IPFIXv10-BGP-CISCO-SRv6:
BGP session first, templates + data after; flows leave enriched with
the peer's RIB attributes, communities in all three families).

End-to-end: raw BGP UPDATE session bytes -> decode_bgp -> rib_state
(the in-memory RIB the reference daemon holds) ; v9 flow datagrams
replayed as a TWO-micro-batch file stream with the template only in
batch 1 -> decode_v9_stream (applyInPandasWithState template cache)
-> stream-static chained-broadcast LPM join against the RIB ->
memory sink, compared against hand-computed goldens. Exercises the
two streaming-hostile pieces at once: template state across batches
and enrichment of an unbounded stream from a bounded control plane.
"""

from __future__ import annotations

import os
import struct

from pyspark.sql import functions as F

from pmacct_spark.operators.lpm import lpm_join
from pmacct_spark.streaming.bmp import (
    decode_bgp,
    encode_bgp_update,
    rib_state,
)
from pmacct_spark.streaming.stateful import decode_v9_stream
from tests.test_streaming import _v9_data, _v9_packet, _v9_template

PEER = "192.0.2.5"


def _rib(spark):
    """The control-plane half: one BGP session stream from PEER.
    Covering /8, a more-specific /16 re-announced with new attrs
    (latest wins), and an announce+withdraw pair (must not enrich)."""
    session = (
        encode_bgp_update(
            0x0A000000, 8, "64500 64999", std_comm="64500:8",
            lrg_comm="64500:1:8",
        )
        + encode_bgp_update(
            0x0A010000, 16, "64500 65001", std_comm="64500:16",
            lrg_comm="64500:1:16",
        )
        # re-announce the /16: attributes must be replaced
        + encode_bgp_update(
            0x0A010000, 16, "64500 65002", std_comm="64500:161",
            lrg_comm="64500:1:161",
        )
        + encode_bgp_update(0x0A020000, 16, "64500 65003")
    )
    # withdrawal of the 10.2/16 announcement, trailing the session
    wd_nlri = bytes([16]) + (0x0A020000).to_bytes(4, "big")[:2]
    wd_body = (
        len(wd_nlri).to_bytes(2, "big") + wd_nlri + (0).to_bytes(2, "big")
    )
    session += (
        b"\xff" * 16 + (19 + len(wd_body)).to_bytes(2, "big") + b"\x02" + wd_body
    )
    dg = spark.createDataFrame(
        [(PEER, bytearray(session))], "exporter_ip string, payload binary"
    )
    return rib_state(decode_bgp(dg))


def _flow_stream(spark, tmp_path):
    """The data-plane half: v9 datagrams split across two micro-batch
    files; the template rides ONLY batch 1 (the 5xx timeline: template
    at t=7s, data keeps flowing after)."""
    tid = 270
    b1 = _v9_packet(1, 1, [
        _v9_template(tid),
        _v9_data(tid, [
            (0x0C000001, 0x0A010505, 100, 1, 6),   # /16 latest attrs
            (0x0C000002, 0x0A090909, 10, 1, 6),    # /8 fallback
        ]),
    ])
    b2 = _v9_packet(2, 1, [
        _v9_data(tid, [
            (0x0C000003, 0x0A010706, 1000, 2, 17),  # /16 again, batch 2
            (0x0C000004, 0x0A020101, 1, 1, 6),      # withdrawn -> /8
            (0x0C000005, 0x0B000001, 7, 1, 6),      # off-RIB -> default
        ]),
    ])
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = str(tmp_path / "flow_stream")
    os.makedirs(src)
    for i, payload in ((1, b1), (2, b2)):
        pq.write_table(
            pa.table(
                {
                    "exporter_ip": [PEER],
                    "seqno": pa.array([i], pa.int64()),
                    "payload": pa.array([payload], pa.binary()),
                }
            ),
            os.path.join(src, f"b{i}.parquet"),
        )
        os.utime(
            os.path.join(src, f"b{i}.parquet"),
            (1_700_000_000 + i, 1_700_000_000 + i),
        )
    schema = spark.read.parquet(src).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )


def test_flow_bgp_streaming_correlation_golden(spark, tmp_path):
    rib = _rib(spark).withColumnRenamed("prefix", "net_int")
    decoded = decode_v9_stream(_flow_stream(spark, tmp_path))
    enriched = lpm_join(
        decoded.withColumn("peer_src_ip", F.col("exporter_ip")),
        rib,
        "ip_dst_i",
        {
            "as_path": "dst_as_path",
            "std_comm": "std_comm",
            "lrg_comm": "lrg_comm",
        },
        default={"dst_as_path": "~", "std_comm": "", "lrg_comm": ""},
        extra_keys={"peer_src_ip": "peer_ip"},
    )
    q = (
        enriched.writeStream.outputMode("append")
        .format("memory")
        .queryName("q_5xx")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["dst_as_path"], r["std_comm"], r["lrg_comm"]): (
            r["bytes"], r["n"],
        )
        for r in spark.table("q_5xx")
        .groupBy("dst_as_path", "std_comm", "lrg_comm")
        .agg(F.sum("bytes").alias("bytes"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    golden = {
        # /16 latest-wins attrs; one flow from EACH micro-batch (the
        # batch-2 record only decodes if template state survived)
        ("64500 65002", "64500:161", "64500:1:161"): (1100, 2),
        # /8 covering route: the direct hit + the withdrawn /16's dst
        ("64500 64999", "64500:8", "64500:1:8"): (11, 2),
        # off-RIB traffic: defaults
        ("~", "", ""): (7, 1),
    }
    assert got == golden


def test_rib_attribute_replacement(spark):
    """Re-announcement replaced the /16 attrs and the withdrawn /16 is
    gone — the RIB the stream joins against is already compacted."""
    rib = _rib(spark)
    rows = {r["prefix"]: r for r in rib.collect()}
    assert set(rows) == {0x0A000000, 0x0A010000}
    assert rows[0x0A010000]["as_path"] == "64500 65002"
    assert rows[0x0A010000]["std_comm"] == "64500:161"
