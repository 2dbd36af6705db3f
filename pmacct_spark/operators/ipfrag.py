"""IPv4 fragment reassembly as a DataFrame operator — the reference's
pmacctd-path preprocessing (src/ip_frag.c: fragment table keyed
(src, dst, ip_id, proto), contiguous-offset assembly, incomplete
chains timed out and dropped).

Spark shape: ONE shuffle on the fragment key, then a pure-JVM
higher-order fold per chain — sort_array orders fragments by offset,
aggregate() walks them verifying contiguity (each fragment must start
exactly where the previous ended, first at 0) and that the final
fragment has more_frags = false; any gap, overlap, duplicate-offset or
missing tail marks the chain invalid and it is dropped, mirroring the
reference's timeout discard. Payload bytes concatenate JVM-side (no
Python in the path).

At 100 TB: fragments are grouped by a high-cardinality 4-tuple key, so
the shuffle is well-spread; chains are short (an IP datagram is at
most 64 KiB / MTU fragments), so per-group state is bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ip_defrag(
    frags: DataFrame,
    key_cols: tuple[str, ...] = ("ip_src_i", "ip_dst_i", "ip_id", "ip_proto"),
    offset_col: str = "frag_offset",
    mf_col: str = "more_frags",
    payload_col: str = "payload",
) -> DataFrame:
    """Reassemble fragment rows into complete datagrams.

    Returns one row per COMPLETE chain: the key columns plus
    ``payload`` (concatenated bytes), ``total_len`` and ``n_frags``.
    Incomplete or inconsistent chains are dropped.
    """
    keys = [F.col(c) for c in key_cols]
    arr = F.sort_array(
        F.collect_list(
            F.struct(
                F.col(offset_col).cast("long").alias("off"),
                F.col(mf_col).cast("boolean").alias("mf"),
                F.col(payload_col).alias("pl"),
            )
        )
    )
    # fold: ok = offsets contiguous from 0 and nothing follows the
    # mf=false tail; done = the last fragment seen was the tail
    fold = (
        "aggregate(__frags, "
        "struct(true AS ok, CAST(0 AS BIGINT) AS pos, "
        "CAST(X'' AS BINARY) AS buf, false AS done), "
        "(acc, f) -> struct("
        "  acc.ok AND NOT acc.done AND f.off = acc.pos, "
        "  acc.pos + length(f.pl), "
        "  concat(acc.buf, f.pl), "
        "  NOT f.mf), "
        "acc -> acc)"
    )
    grouped = frags.groupBy(*keys).agg(
        arr.alias("__frags"), F.count(F.lit(1)).alias("n_frags")
    )
    folded = grouped.withColumn("__asm", F.expr(fold))
    return (
        folded.filter("__asm.ok AND __asm.done")
        .select(
            *key_cols,
            F.col("__asm.buf").alias("payload"),
            F.col("__asm.pos").alias("total_len"),
            "n_frags",
        )
    )
