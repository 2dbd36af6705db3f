"""Kafka ingest seam: the broker half of the reference's
kafka-transport collectors (nfacctd_kafka / pmtelemetryd over Kafka;
reference src/kafka_common.c consumer setup).

Spark ships a first-class Kafka source (``readStream.format("kafka")``
from the spark-sql-kafka connector). What this module owns is the
CONTRACT between that source and the engine's decoders:

- :func:`frames_to_datagrams` — the pure DataFrame mapping from the
  Kafka source's fixed output schema (key, value, topic, partition,
  offset, timestamp, ...) to the universal datagram row
  ``(exporter_ip string, seqno long, payload binary)`` every decode
  surface accepts. Unit-testable without a broker: the mapping is the
  same plan whether the rows came from a live source or a fixture.
- :func:`kafka_datagrams` — the wiring: build the live source and
  apply the mapping. Needs the connector package + a broker, neither
  of which exists in this container, so it is feature-flagged behind
  ``PMACCT_SPARK_KAFKA=1`` and raises a clear error otherwise.

The producer half (key/topic/rr frame shaping) lives in
``sinks/kafka.py``; the two share the byte-level payload convention
(value = one datagram / one composed record, key = exporter identity),
so a pmacct-to-pmacct Kafka hop (tee -> collector) round-trips.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

KAFKA_FLAG = "PMACCT_SPARK_KAFKA"


def frames_to_datagrams(kafka_df: DataFrame) -> DataFrame:
    """Map Kafka-source rows to the engine's datagram contract.

    - ``exporter_ip`` <- the record key (the sending collector stamps
      the exporter address as the partition key, mirroring
      sinks/kafka.py's kafka_partition_key); falls back to
      ``kafka:<topic>/<partition>`` when the producer sent no key, so
      template scoping still has a stable per-stream identity.
    - ``seqno`` <- the partition offset: monotonic per (topic,
      partition), which is exactly the per-socket arrival order the
      stateful decoders require (Kafka only orders within a
      partition — one exporter per partition is the deployment rule,
      same as one exporter per UDP 4-tuple).
    - ``payload`` <- the raw value bytes.
    """
    key_or_synth = F.coalesce(
        F.col("key").cast("string"),
        F.concat(
            F.lit("kafka:"), F.col("topic"), F.lit("/"),
            F.col("partition").cast("string"),
        ),
    )
    return kafka_df.select(
        key_or_synth.alias("exporter_ip"),
        F.col("offset").cast("long").alias("seqno"),
        F.col("value").alias("payload"),
    )


def kafka_datagrams(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Live Kafka -> datagram-row stream (feature-flagged).

    Requires the spark-sql-kafka connector on the classpath and a
    reachable broker; set ``PMACCT_SPARK_KAFKA=1`` to enable. The
    returned stream feeds any decoder exactly like a UDP spool."""
    if os.environ.get(KAFKA_FLAG) != "1":
        raise RuntimeError(
            f"Kafka ingest is feature-flagged: set {KAFKA_FLAG}=1 (needs "
            "the spark-sql-kafka connector and a reachable broker; "
            "neither exists in this sandbox). The decode-facing "
            "contract is frames_to_datagrams(), which is unit-tested "
            "without a broker."
        )
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", max_offsets_per_trigger)
    return frames_to_datagrams(reader.load())
