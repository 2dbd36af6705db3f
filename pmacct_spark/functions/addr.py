"""Network address functions (reference src/addr.c: parse/format/mask
for the v4/v6 ``host_addr`` union).

Engine convention (SURVEY §1.4): addresses live as canonical STRINGS at
the API edge and as integer forms in the hot path — uint32-in-bigint
for IPv4, 16-byte binary for IPv6. All pure column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ipv4_aton(col: str | Column) -> Column:
    """Dotted quad -> bigint (inet_aton)."""
    c = F.col(col) if isinstance(col, str) else col
    p = F.split(c, r"\.")
    return (
        p.getItem(0).cast("bigint") * 16777216
        + p.getItem(1).cast("bigint") * 65536
        + p.getItem(2).cast("bigint") * 256
        + p.getItem(3).cast("bigint")
    )


def ipv4_ntoa(col: str | Column) -> Column:
    """bigint -> dotted quad (inet_ntoa)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.concat_ws(
        ".",
        (c / 16777216).cast("bigint") % 256,
        (c / 65536).cast("bigint") % 256,
        (c / 256).cast("bigint") % 256,
        c % 256,
    )


def ipv4_mask_apply(ip: str | Column, masklen: int) -> Column:
    """addr_mask: zero the host bits (reference src/addr.c apply-mask)."""
    c = F.col(ip) if isinstance(ip, str) else ip
    if masklen <= 0:
        return F.lit(0).cast("bigint")
    div = 1 << (32 - masklen)
    return (c / div).cast("bigint") * div


def ipv6_canonical(col: str | Column) -> Column:
    """IPv6 string -> RFC 5952-ish canonical lowercase form via the
    16-byte binary round trip: expand, lowercase, strip leading zeros
    per hextet (``::`` compression left to presentation; exactness of
    compare is what the engine needs)."""
    c = F.col(col) if isinstance(col, str) else col
    # normalize case + strip per-group leading zeros; keeps '::' as-is
    groups = F.split(F.lower(c), ":")
    stripped = F.transform(
        groups,
        lambda g: F.when(g == "", g).otherwise(
            F.coalesce(F.regexp_extract(g, "0*([0-9a-f]+)", 1), g)
        ),
    )
    return F.array_join(stripped, ":")


def inet6_aton(col: str | Column) -> Column:
    """Address string -> network-byte-order BINARY: 4 bytes for IPv4,
    16 for IPv6 — MySQL's INET6_ATON, which the reference's
    sql_num_hosts statement cycle calls for EVERY host column
    (count_*_aton_handler, src/sql_handlers.c:1241-1253 sets aton_v6
    unconditionally; CONFIG-KEYS:1911). Pure JVM expression: the
    engine computes the numeric form instead of asking the RDBMS to.
    v6 accepts full and '::'-compressed hextet forms (the engine's own
    canonical output; embedded-v4 tails are not emitted by it)."""
    c = F.col(col) if isinstance(col, str) else col
    v4 = F.unhex(F.lpad(F.hex(ipv4_aton(c)), 8, "0"))
    parts = F.split(c, "::")
    left = F.filter(
        F.split(parts.getItem(0), ":"), lambda g: g != F.lit("")
    )
    right = F.filter(
        F.split(F.coalesce(F.try_element_at(parts, F.lit(2)), F.lit("")), ":"),
        lambda g: g != F.lit(""),
    )

    def hexcat(arr: Column) -> Column:
        return F.aggregate(
            arr,
            F.lit(""),
            lambda acc, g: F.concat(acc, F.lpad(g, 4, "0")),
        )

    nzero = (F.lit(8) - F.size(left) - F.size(right)).cast("int")
    v6 = F.unhex(
        F.concat(
            hexcat(left), F.repeat(F.lit("0000"), nzero), hexcat(right)
        )
    )
    return F.when(c.contains(":"), v6).otherwise(v4)
