"""Allowlist dictionaries and per-exporter monitoring.

- ports/protos/tos dictionaries zero out values NOT in an allowlist
  file — records are kept, the column is masked (load_ports /
  load_protos, reference src/plugin_common.c:1419,1328).
- per-exporter sequence-number monitoring detects export gaps/dups
  (update_status_table, reference src/xflow_status.c:90-130).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_allowlist(df: DataFrame, col: str, allowed: list[int]) -> DataFrame:
    """Zero-out ``col`` where not in ``allowed`` (ports_file semantics).

    The allowlist is a config-sized set — an ``isin`` literal list keeps
    it inside codegen (no join, no broadcast var needed)."""
    return df.withColumn(
        col, F.when(F.col(col).isin(allowed), F.col(col)).otherwise(F.lit(0))
    )


def apply_bucket_others(
    df: DataFrame, col: str, allowed: list[int], others: int = 255
) -> DataFrame:
    """Bucket ``col`` values NOT in ``allowed`` as ``others`` (=255,
    the IANA reserved value) — protos_file / tos_file semantics: an
    aggregator, not a filter (records kept, unlisted protocols/ToS
    collapse into one 'others' group; reference
    src/plugin_common.c:1328 load_protos + the per-plugin
    ``if (!prt.table[proto]) proto = PM_IP_PROTO_OTHERS`` rewrite,
    e.g. src/print_plugin.c:358,362). Differs from ports_file
    (:func:`apply_allowlist`), which zeroes instead. Literal ``isin``
    keeps it inside codegen — no join."""
    return df.withColumn(
        col,
        F.when(F.col(col).isin(allowed), F.col(col)).otherwise(F.lit(others)),
    )


def seqno_monitor(
    df: DataFrame,
    exporter_col: str = "peer_ip_src",
    seqno_col: str = "export_proto_seqno",
) -> DataFrame:
    """Per-exporter export health: expected vs received record counts.

    expected = max(seqno) - min(seqno) + 1 over the observation window;
    lost = expected - received (negative => duplicates). Mirrors the
    reference's per-exporter status hash, expressed as one aggregation.
    """
    return df.groupBy(F.col(exporter_col).alias("exporter")).agg(
        F.min(seqno_col).alias("seqno_min"),
        F.max(seqno_col).alias("seqno_max"),
        F.count(F.lit(1)).alias("received"),
        (F.max(seqno_col) - F.min(seqno_col) + 1 - F.count(F.lit(1))).alias("lost"),
    )
