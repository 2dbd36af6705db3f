"""ZeroMQ transport shaping (reference src/zmq_common.c — pmacct's
internal core->plugin pipe and its Kafka-less pub/sub delivery:
single-byte topic frame set via p_zmq_set_topic src/zmq_common.c:56,
PUB/PUSH sockets :348-358, subscriber topic filter :482).

The frame contract is a (topic: 1-byte, payload: JSON) pair per
record, plus the plugin-pipe variant that frames a whole microbatch as
one length-prefixed buffer (the ring-buffer batching the reference
uses between core and plugin, docs/INTERNALS:96-125). Since round 8
``write_zmq`` publishes over the repo's NATIVE ZMTP 3.0 stack
(sources/zmtp.ZmtpPubServer) on real sockets — no libzmq required —
with live subscriber tests in tests/test_zmtp_wire_live.py.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pmacct_spark.sinks.kafka import compose_json_value


def zmq_frame(df: DataFrame, topic: int) -> DataFrame:
    """Shape records into the ZMQ pub/sub contract: a single-byte
    ``topic`` (subscribers filter on it, reference
    src/zmq_common.c:56,482) and the JSON payload."""
    if not 0 <= topic <= 255:
        raise ValueError(f"zmq topic must fit one byte, got {topic}")
    return df.select(
        F.lit(topic).alias("topic"),
        compose_json_value(df).alias("payload"),
    )


def zmq_pipe_buffers(
    df: DataFrame, topic: int, records_per_buffer: int = 100
) -> DataFrame:
    """The plugin-pipe variant: batch records into length-prefixed
    buffers (seq, topic, payload of newline-joined JSON) the way the
    reference amortizes IPC with ring-buffer batching
    (docs/INTERNALS:96-125; struct ch_buf_hdr src/plugin_hooks.h:39-54).
    Buffer assembly is per-partition (mapInPandas) — no shuffle."""
    import pandas as pd

    from pyspark.sql import types as T

    frame = zmq_frame(df, topic)
    schema = T.StructType(
        [
            T.StructField("seq", T.LongType()),
            T.StructField("topic", T.IntegerType()),
            T.StructField("n_records", T.IntegerType()),
            T.StructField("buffer", T.BinaryType()),
        ]
    )

    def gen(batches):
        seq = 0
        for pdf in batches:
            rows = []
            payloads = pdf["payload"].tolist()
            for lo in range(0, len(payloads), records_per_buffer):
                chunk = payloads[lo : lo + records_per_buffer]
                body = "\n".join(chunk).encode("utf-8")
                buf = struct.pack("!IBI", seq, topic, len(body)) + body
                rows.append((seq, topic, len(chunk), buf))
                seq += 1
            yield pd.DataFrame(
                rows, columns=["seq", "topic", "n_records", "buffer"]
            )

    return frame.mapInPandas(gen, schema)


def write_zmq(
    frame: DataFrame, endpoint: str | None = None, server=None
):
    """Publish a :func:`zmq_frame` DataFrame over ZMTP 3.0 PUB using
    the repo's native wire stack (``sources/zmtp.ZmtpPubServer`` — a
    real loopback-tested implementation of the public protocol, so no
    libzmq is needed; a libzmq SUB can connect to it). Binds
    ``endpoint`` (``tcp://host:port``, port 0 = ephemeral) or reuses a
    caller-started ``server``; sends [topic byte][payload] per record,
    matching the reference's single-byte topic frame
    (src/zmq_common.c:56; subscribers prefix-filter :482).

    Driver-side iteration is intentional: the reference's ZMQ plugin
    is likewise a single-process publisher fed by the core pipe — the
    socket is the bottleneck, not the iteration. For distributed
    fan-out use the Kafka/AMQP sinks (foreachPartition producers).
    Returns the server so callers control its lifetime (stop()).
    """
    from pmacct_spark.sources.zmtp import ZmtpPubServer

    if server is None:
        if endpoint is None:
            raise ValueError("write_zmq needs an endpoint or a server")
        hostport = endpoint.removeprefix("tcp://")
        host, _, port = hostport.rpartition(":")
        server = ZmtpPubServer(host or "127.0.0.1", int(port)).start()
    for r in frame.toLocalIterator():
        server.publish(bytes([r["topic"]]) + r["payload"].encode("utf-8"))
    return server


def zmq_pipe_unpack(buffers: DataFrame) -> DataFrame:
    """The RECEIVE side of the plugin pipe: parse length-prefixed
    buffers back into individual (seq, topic, payload) records — what
    a plugin does with each ring-buffer read (reference
    src/plugin_hooks.c read loop over struct ch_buf_hdr). Round-trips
    :func:`zmq_pipe_buffers` exactly; per-partition, no shuffle."""
    import pandas as pd

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("seq", T.LongType()),
            T.StructField("topic", T.IntegerType()),
            T.StructField("payload", T.StringType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            out = []
            for buf in pdf["buffer"]:
                b = bytes(buf)
                if len(b) < 9:
                    continue  # truncated header: drop, keep consuming
                seq, topic, blen = struct.unpack_from("!IBI", b, 0)
                body = b[9 : 9 + blen]
                if len(body) < blen:
                    continue  # truncated body
                for line in body.decode("utf-8").split("\n"):
                    if line:
                        out.append((seq, topic, line))
            yield pd.DataFrame(out, columns=["seq", "topic", "payload"])

    return buffers.select("buffer").mapInPandas(gen, schema)


def zmq_frames_to_datagrams(
    frames: DataFrame, exporter_prefix: str = "zmq"
) -> DataFrame:
    """The consumer half of the ZMQ seam: map received (topic,
    payload) frames to the universal datagram contract every decoder
    and the telemetry pipeline accept (reference consumes telemetry
    over a ZMQ PULL the same way — including the gRPC bridge's local
    socket, src/telemetry/telemetry.c:468-504). The 1-byte topic keys
    the stream identity; per-topic arrival order is the seqno (the
    row_number mirrors Kafka's per-partition offset contract in
    sources/kafka.py)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("topic").orderBy(F.monotonically_increasing_id())
    return frames.select(
        F.concat(F.lit(f"{exporter_prefix}:"), F.col("topic").cast("string"))
        .alias("exporter_ip"),
        (F.row_number().over(w) - 1).cast("long").alias("seqno"),
        F.col("payload").cast("binary").alias("payload"),
    )
