"""Presentation functions: protocol names, TCP-flag decoding, country
codes — the reference renders these at output time (proto number->name
unless ``-u``/print_num_protos, reference src/pmacct.c:114; tcp_flags
encoded as array in JSON/Avro, reference
tests/100-IPFIXv10-CISCO/nfacctd-00.conf:32-34).

All pure column expressions (broadcast-free CASE/bit tests) so they
stay in codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# /etc/protocols subset the reference ships (src/util.c protocols table)
PROTO_NAMES = {1: "icmp", 6: "tcp", 17: "udp", 47: "gre", 50: "esp", 58: "ipv6-icmp"}

# TCP flag bits, RFC 793 order as the reference prints them
TCP_FLAG_BITS = [
    (1, "FIN"),
    (2, "SYN"),
    (4, "RST"),
    (8, "PSH"),
    (16, "ACK"),
    (32, "URG"),
]


def proto_name(col: str | Column) -> Column:
    """Protocol number -> lowercase name; unknown numbers print as the
    number itself (matching the reference's fallback)."""
    c = F.col(col) if isinstance(col, str) else col
    expr = None
    for num, name in PROTO_NAMES.items():
        expr = (
            F.when(c == num, F.lit(name))
            if expr is None
            else expr.when(c == num, F.lit(name))
        )
    return expr.otherwise(c.cast("string"))


def proto_name_sql(col: str) -> str:
    """DuckDB-compatible rendering of :func:`proto_name`."""
    whens = " ".join(
        f"WHEN {num} THEN '{name}'" for num, name in PROTO_NAMES.items()
    )
    return f"CASE {col} {whens} ELSE CAST({col} AS VARCHAR) END"


def tcp_flags_str(col: str | Column) -> Column:
    """Bitmask -> '+'-joined flag names, e.g. 18 -> 'SYN+ACK'."""
    c = F.col(col) if isinstance(col, str) else col
    parts = [
        F.when(c.bitwiseAND(bit) != 0, F.lit(name)).otherwise(F.lit(None))
        for bit, name in TCP_FLAG_BITS
    ]
    return F.concat_ws("+", *parts)


def tcp_flags_str_sql(col: str) -> str:
    """DuckDB-compatible rendering of :func:`tcp_flags_str`."""
    parts = ", ".join(
        f"CASE WHEN ({col} & {bit}) <> 0 THEN '{name}' END"
        for bit, name in TCP_FLAG_BITS
    )
    # Spark's concat_ws yields '' when every part is NULL; DuckDB's
    # array_to_string yields NULL on the empty list — align on ''.
    return (
        f"COALESCE(array_to_string("
        f"list_filter([{parts}], x -> x IS NOT NULL), '+'), '')"
    )
