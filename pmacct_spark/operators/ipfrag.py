"""IPv4 + IPv6 fragment reassembly as DataFrame operators — the
reference's pmacctd-path preprocessing (src/ip_frag.c: v4 fragment
table keyed (src, dst, ip_id, proto); v6 table keyed (src128, dst128,
ident) via init_ip6_fragment_handler/ip6_fragment_handler
src/ip_frag.c:302-315, struct ip6_fragment src/ip_frag.h:56;
contiguous-offset assembly, incomplete chains timed out and dropped).

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
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Reassemble fragment rows into complete datagrams.

    Returns one row per COMPLETE chain: the key columns plus
    ``payload`` (concatenated bytes), ``total_len`` and ``n_frags``.
    Incomplete or inconsistent chains are dropped.

    ``carry_cols`` are taken from the offset-0 (first) fragment of each
    chain — the IPv6 path uses this for the Fragment header's
    next-header protocol, which per RFC 8200 is authoritative on the
    first fragment (the reference's v6 table likewise keys only
    (src, dst, id): src/ip_frag.c find_fragment6).
    """
    keys = [F.col(c) for c in key_cols]
    arr = F.sort_array(
        F.collect_list(
            F.struct(
                F.col(offset_col).cast("long").alias("off"),
                F.col(mf_col).cast("boolean").alias("mf"),
                F.col(payload_col).alias("pl"),
                *[F.col(c).alias(c) for c in carry_cols],
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
            *[
                F.expr(f"element_at(__frags, 1).{c}").alias(c)
                for c in carry_cols
            ],
            F.col("__asm.buf").alias("payload"),
            F.col("__asm.pos").alias("total_len"),
            "n_frags",
        )
    )


# ---------------------------------------------------------------------------
# IPv6: Fragment extension header (RFC 8200 §4.5)
# ---------------------------------------------------------------------------
# Reference: src/ip_frag.c:302-315 init_ip6_fragment_handler /
# ip6_fragment_handler, src/ip_frag.h:56 struct ip6_fragment — the v6
# table keys (id, src128, dst128); the Fragment header is found by
# walking the extension-header chain (src/nl.c ip6_handler walks
# hop-by-hop/routing/destination-options the same way).

IP6_NH_FRAGMENT = 44
# extension headers that precede Fragment and share the common
# (next-header, hdr-ext-len) layout: hop-by-hop, routing, dest options
_IP6_WALKABLE_EXT = "(0, 43, 60)"
_MAX_EXT_HOPS = 6  # chains are short; bound the unrolled walk


def _u(packet_col: str, pos: str, n: int) -> str:
    """Unsigned big-endian int from ``n`` bytes at 1-based ``pos``
    (pos may be an expression). hex+conv stays in codegen."""
    return (
        f"CAST(conv(hex(substring({packet_col}, CAST(({pos}) AS INT), {n})),"
        f" 16, 10) AS BIGINT)"
    )


def ip6_parse_fragments(
    pkts: DataFrame, packet_col: str = "pkt"
) -> DataFrame:
    """Extract fragment rows from raw IPv6 packets, pure-JVM.

    Walks the extension-header chain (a bounded ``aggregate()`` fold —
    each hop reads (next-header, hdr-ext-len) and advances) until the
    Fragment header (44). Rows that carry no Fragment header are
    dropped (a full pipeline unions them back as already-complete
    datagrams). Emits the reference's v6 fragment-table key
    (src128, dst128, ident) plus frag_offset (bytes — the wire field is
    8-octet units), more_frags (M bit), the Fragment header's
    next-header as ip_proto, and the fragment payload bytes.
    """
    p = packet_col
    # fold state: (nh, pos). Start at the fixed header's next-header
    # byte (offset 6; 1-based 7) with the first extension at byte 41.
    walk = (
        f"aggregate(sequence(1, {_MAX_EXT_HOPS}), "
        f"named_struct('nh', {_u(p, '7', 1)}, 'pos', CAST(41 AS BIGINT)), "
        f"(acc, i) -> IF(acc.nh IN {_IP6_WALKABLE_EXT}, "
        f"named_struct("
        f"'nh', {_u(p, 'acc.pos', 1)}, "
        f"'pos', acc.pos + {_u(p, 'acc.pos + 1', 1)} * 8 + 8), "
        f"acc), "
        f"acc -> acc)"
    )
    # The walk is the expensive part, and a `withColumn + filter(nh)`
    # phrasing made Catalyst substitute it into BOTH the pushed-down
    # filter and every field projection (2+ evaluations per row —
    # measured ~3x the whole parse). Binding it once as a lambda var
    # inside a single generator evaluates it exactly once: non-fragment
    # rows yield an empty array and fall out of the explode, which is
    # the documented drop semantics.
    fom = _u(p, "w.pos + 2", 2)  # 13-bit offset (8-octet units) | res | M
    rec = (
        f"explode(transform("
        f"filter(array({walk}), w -> w.nh = {IP6_NH_FRAGMENT}), "
        f"w -> named_struct("
        f"'ip6_src', substring({p}, 9, 16), "
        f"'ip6_dst', substring({p}, 25, 16), "
        f"'ip6_id', {_u(p, 'w.pos + 4', 4)}, "
        f"'ip_proto', CAST({_u(p, 'w.pos', 1)} AS INT), "
        f"'frag_offset', CAST(shiftright({fom}, 3) * 8 AS BIGINT), "
        f"'more_frags', ({fom} % 2) = 1, "
        f"'payload', substring({p}, CAST(w.pos + 8 AS INT), 2147483647)"
        f")))"
    )
    return pkts.select(F.expr(rec).alias("__frag")).select("__frag.*")


def ip4_parse_fragments(
    pkts: DataFrame, packet_col: str = "pkt"
) -> DataFrame:
    """Extract fragment rows from raw IPv4 packets, pure-JVM (the
    dissection src/nl.c ip_handler performs before src/ip_frag.c's
    table): IHL-aware header walk, 13-bit fragment offset in 8-octet
    units, MF flag (0x2000), payload bounded by total_length. Emits
    the v4 fragment-table key (src, dst, id, proto) + offset/MF/bytes
    — rows feed :func:`ip_defrag` directly; unfragmented packets come
    through as their own complete (offset 0, MF=0) chains."""
    p = packet_col
    ihl = f"(({_u(p, '1', 1)} % 16) * 4)"
    fo = _u(p, "7", 2)  # flags(3) | fragment offset(13), 1-based bytes 7-8
    return pkts.select(
        F.expr(_u(p, "13", 4)).alias("ip_src_i"),
        F.expr(_u(p, "17", 4)).alias("ip_dst_i"),
        F.expr(f"CAST({_u(p, '5', 2)} AS INT)").alias("ip_id"),
        F.expr(f"CAST({_u(p, '10', 1)} AS INT)").alias("ip_proto"),
        F.expr(f"CAST(({fo} % 8192) * 8 AS BIGINT)").alias("frag_offset"),
        F.expr(f"CAST(shiftright({fo}, 13) % 2 AS INT) = 1").alias(
            "more_frags"
        ),
        F.expr(
            f"substring({p}, CAST({ihl} + 1 AS INT), "
            f"CAST({_u(p, '3', 2)} - {ihl} AS INT))"
        ).alias("payload"),
    )


def ip6_defrag(frags: DataFrame) -> DataFrame:
    """Reassemble ``ip6_parse_fragments`` rows: keyed (src, dst, id)
    like the reference's v6 table, protocol carried from the offset-0
    fragment's Fragment header (RFC 8200: authoritative there)."""
    return ip_defrag(
        frags,
        key_cols=("ip6_src", "ip6_dst", "ip6_id"),
        carry_cols=("ip_proto",),
    )
