"""Tee replicator: fan one record stream out to N receivers, selected
by tag and balanced round-robin/hash (reference
src/tee_plugin/tee_plugin.c:37,274-293; balance algorithms
src/tee_plugin/tee_recvs.h:35).

Spark-first: each receiver is a filtered projection of ONE shared
DataFrame — Spark computes the source once per action, and in streaming
``foreachBatch`` writes all receivers from one micro-batch without
re-reading the source.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class TeeReceiver:
    """One receiver: an id, an optional tag filter (pre_tag_filter
    grammar: list of accepted tags), and an optional balance pool."""

    receiver_id: str
    tags: list[int] | None = None  # None = receive everything
    pool: list[str] = field(default_factory=list)  # balanced endpoints
    balance: str = "rr"  # 'rr' | 'hash'
    hash_cols: tuple[str, ...] = ("ip_src_i",)


def route(df: DataFrame, receivers: list[TeeReceiver]) -> dict[str, DataFrame]:
    """Split ``df`` into one DataFrame per receiver (tag-routed), with
    an ``endpoint`` column when the receiver balances over a pool."""
    out: dict[str, DataFrame] = {}
    for r in receivers:
        part = df if r.tags is None else df.filter(F.col("tag").isin(r.tags))
        if r.pool:
            n = len(r.pool)
            if r.balance == "rr":
                # deterministic round-robin: row_number-free, seqno-based
                idx = F.col("export_proto_seqno") % n
            else:
                idx = F.abs(F.xxhash64(*[F.col(c) for c in r.hash_cols])) % n
            endpoint = F.element_at(
                F.array(*[F.lit(e) for e in r.pool]), idx.cast("int") + 1
            )
            part = part.withColumn("endpoint", endpoint)
        out[r.receiver_id] = part
    return out


def emit_udp(
    routed: DataFrame,
    default_endpoint: str | None = None,
    source_ip: str | None = None,
    ttl: int | None = None,
) -> None:
    """Transmit routed datagrams to their receivers over REAL UDP
    sockets — the tee daemon's replication loop (reference
    src/tee_plugin/tee_plugin.c:274-293 sends each datagram to every
    selected receiver with sendto). DISTRIBUTED: each partition opens
    one socket and sends its rows (per-executor fan-out, no driver
    collect). Rows need ``payload`` (binary) and either an
    ``endpoint`` column ("host:port", from a balanced pool) or the
    ``default_endpoint``. ``source_ip`` is tee_source_ip
    (CONFIG-KEYS:3495): bind the sending socket to a configured local
    address (ignored by the reference under transparent replication,
    which is n/a here)."""

    def _send(rows) -> None:
        import socket as _socket

        sock = None
        try:
            for row in rows:
                if sock is None:
                    sock = _socket.socket(
                        _socket.AF_INET, _socket.SOCK_DGRAM
                    )
                    if source_ip:
                        sock.bind((source_ip, 0))
                    if ttl:
                        # nfprobe_hoplimit (CONFIG-KEYS:2508): IP TTL
                        # on exported datagrams
                        sock.setsockopt(
                            _socket.IPPROTO_IP, _socket.IP_TTL, int(ttl)
                        )
                ep = row["endpoint"] if "endpoint" in row else None
                ep = ep or default_endpoint
                if not ep:
                    raise ValueError("no endpoint for datagram")
                host, _, port = ep.rpartition(":")
                sock.sendto(bytes(row["payload"]), (host, int(port)))
        finally:
            if sock is not None:
                sock.close()

    cols = ["payload"] + (
        ["endpoint"] if "endpoint" in routed.columns else []
    )
    routed.select(*cols).foreachPartition(_send)


def emit_zmq(routed: DataFrame, address: str) -> None:
    """Replicate raw datagrams over ZMTP PUSH — a tee_receivers pool
    with ``zmq_address`` set (examples/tee_receivers.lst.example;
    reference Tee_init_zmq_host src/tee_plugin/tee_plugin.c:686).
    Datagram bytes ride one message each, UNCHANGED, so a PULL-bound
    consumer — e.g. another daemon's ZMQ ingest seam — receives them
    exactly as if directly exported. DISTRIBUTED: per-partition PUSH
    connections, no driver collect. (Direction note: the reference
    BINDS its PUSH; this engine's ingest seams BIND their PULL, so the
    tee CONNECTS — the same PUSH/PULL data path, composable with a
    downstream collector out of the box.)"""
    host, _, port = str(address).removeprefix("tcp://").rpartition(":")
    h, p = host or "127.0.0.1", int(port)

    def _send(rows) -> None:
        from pmacct_spark.sources.zmtp import ZmtpPushClient

        cli = None
        try:
            for row in rows:
                if cli is None:
                    cli = ZmtpPushClient(h, p)
                cli.send(bytes(row["payload"]))
        finally:
            if cli is not None:
                cli.close()

    routed.select("payload").foreachPartition(_send)


def emit_kafka(
    routed: DataFrame,
    broker: str,
    topic: str,
    producer_opts: dict | None = None,
) -> None:
    """Replicate raw datagrams to a Kafka broker instead of UDP
    receivers — a tee_receivers pool with ``kafka_broker`` +
    ``kafka_topic`` set (examples/tee_receivers.lst.example;
    tee_kafka_config_file CONFIG-KEYS:3463 tunes the producer). The
    datagram bytes ride as the message value UNCHANGED so a Kafka-fed
    collector (nfacctd_kafka_topic) decodes them exactly as if
    directly peered; the exporter address keys the message for
    per-exporter ordering. DISTRIBUTED: per-partition producers, no
    driver collect."""
    from pmacct_spark.sources.kafka_wire import produce_frames

    host, _, port = str(broker).rpartition(":")
    frames = routed.select(
        F.col("exporter_ip").cast("string").alias("key"),
        F.col("payload").alias("value"),
        F.lit(topic).alias("topic"),
    )
    produce_frames(
        frames, host or "127.0.0.1", int(port), **(producer_opts or {})
    )
