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
