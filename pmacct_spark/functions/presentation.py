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


# --- encode-as toggles (reference CONFIG-KEYS tos_encode_as_dscp,
#     fwd_status_encode_as_string, mpls_label_stack_encode_as_array,
#     bgp_comms_encode_as_array + bgp_comms_num,
#     as_path_encode_as_array; JSON handlers
#     src/plugin_cmn_json.c:374-392) -----------------------------------

# RFC 7270 forwardingStatus reason codes, the reference's table
# (src/plugin_common.c:1204-1244 fwd_status_to_linked_list)
FWD_STATUS_NAMES = {
    64: "FORWARDED Unknown", 65: "FORWARDED Fragmented",
    66: "FORWARDED Not Fragmented",
    128: "DROPPED Unknown", 129: "DROPPED ACL deny",
    130: "DROPPED ACL drop", 131: "DROPPED Unroutable",
    132: "DROPPED Adjacency", 133: "DROPPED Fragmentation and DF set",
    134: "DROPPED Bad header checksum", 135: "DROPPED Bad total Length",
    136: "DROPPED Bad header length", 137: "DROPPED bad TTL",
    138: "DROPPED Policer", 139: "DROPPED WRED", 140: "DROPPED RPF",
    141: "DROPPED For us", 142: "DROPPED Bad output interface",
    143: "DROPPED Hardware",
    192: "CONSUMED Unknown", 193: "CONSUMED Punt Adjacency",
    194: "CONSUMED Incomplete Adjacency", 195: "CONSUMED For us",
}


def tos_dscp_sql(col: str) -> str:
    """tos_encode_as_dscp: the 6 DSCP bits (tos >> 2) — identical
    integer expression in both engines."""
    return f"CAST({col} AS BIGINT) // 4".replace("//", "DIV")


def tos_dscp_duck(col: str) -> str:
    return f"CAST({col} AS BIGINT) // 4"


def _fwd_whens() -> str:
    return " ".join(
        f"WHEN {v} THEN '{n}'" for v, n in FWD_STATUS_NAMES.items()
    )


def fwd_status_str_sql(col: str) -> str:
    """fwd_status_encode_as_string: RFC 7270 reason-code names; codes
    outside the table render as the decimal value (the same fallback
    proto_name uses)."""
    return (
        f"CASE {col} {_fwd_whens()} "
        f"ELSE CAST({col} AS STRING) END"
    )


def fwd_status_str_duck(col: str) -> str:
    return (
        f"CASE {col} {_fwd_whens()} "
        f"ELSE CAST({col} AS VARCHAR) END"
    )


def comms_array_sql(col: str, num: int | None = None) -> str:
    """bgp_comms_encode_as_array (+ bgp_comms_num cap): the
    space-separated community string as an array, optionally truncated
    to the first ``num`` entries. Empty string -> empty array."""
    base = f"filter(split({col}, ' '), x -> x <> '')"
    return f"slice({base}, 1, {int(num)})" if num else base


def comms_array_duck(col: str, num: int | None = None) -> str:
    base = f"list_filter(string_split({col}, ' '), x -> x <> '')"
    return f"{base}[1:{int(num)}]" if num else base


def mpls_stack_array_sql(col: str) -> str:
    """mpls_label_stack_encode_as_array: '_'-separated label stack (the
    reference's separator, src/plugin_cmn_json.c
    compose_json_array_mpls_label_stack) as a bigint array."""
    return f"transform(split({col}, '_'), x -> CAST(x AS BIGINT))"


def mpls_stack_array_duck(col: str) -> str:
    return (
        f"list_transform(string_split({col}, '_'), "
        f"x -> CAST(x AS BIGINT))"
    )


# --- tcpflags_encode_as_array (CONFIG-KEYS:1727; tcpflags_to_linked_list
#     src/plugin_common.c:1167-1203 + compose_tcpflags_json_data
#     src/plugin_cmn_json.c:1742): set flags as a string array in
#     URG,ACK,PSH,RST,SYN,FIN (high-bit-first) order. The reference
#     bit-decomposes only decimals in 1..63 — 0 and anything carrying
#     bits >= 64 (ECE/CWR) render as the EMPTY array (the tests/100
#     golden shows "tcp_flags": []).

_TCP_ARRAY_ORDER = [(32, "URG"), (16, "ACK"), (8, "PSH"), (4, "RST"),
                    (2, "SYN"), (1, "FIN")]


def tcp_flags_array_sql(col: str) -> str:
    parts = ", ".join(
        f"CASE WHEN ({col} & {bit}) <> 0 THEN '{name}' END"
        for bit, name in _TCP_ARRAY_ORDER
    )
    return (
        f"CASE WHEN {col} > 0 AND {col} < 64 THEN "
        f"filter(array({parts}), x -> x IS NOT NULL) "
        f"ELSE array() END"
    )


def tcp_flags_array_duck(col: str) -> str:
    parts = ", ".join(
        f"CASE WHEN ({col} & {bit}) <> 0 THEN '{name}' END"
        for bit, name in _TCP_ARRAY_ORDER
    )
    return (
        f"CASE WHEN {col} > 0 AND {col} < 64 THEN "
        f"list_filter([{parts}], x -> x IS NOT NULL) "
        f"ELSE [] END"
    )


# --- timestamps_utc / timestamps_rfc9557 (CONFIG-KEYS:1698-1711;
#     compose_timestamp src/util.c:2550-2583): the engine's stored
#     timestamps are naive-UTC instants. timestamps_utc renders the
#     wall time as-is (gmtime); utc=false converts to the collector's
#     zone first (localtime_r — ``tz`` names it explicitly so the
#     render is deterministic, not host-dependent). timestamps_rfc9557
#     switches to the 'T' separator and appends the numeric zone
#     offset (+00:00 for UTC; DST-aware for named zones).

def _ts_wall(col: str, dialect: str, utc: bool, tz: str | None) -> str:
    if utc:
        return col
    assert tz, "utc=False requires an explicit zone name"
    if dialect == "spark":
        # TIMESTAMP_NTZ in, TIMESTAMP_NTZ out: wall time in ``tz``
        return f"convert_timezone('UTC', '{tz}', {col})"
    # DuckDB: naive-as-UTC -> timestamptz -> naive wall time in tz
    return f"timezone('{tz}', {col} AT TIME ZONE 'UTC')"


def timestamp_render_sql(
    col: str, *, rfc9557: bool = False, utc: bool = True,
    tz: str | None = None,
) -> str:
    wall = _ts_wall(col, "spark", utc, tz)
    if not rfc9557:
        return f"date_format({wall}, 'yyyy-MM-dd HH:mm:ss')"
    base = f"date_format({wall}, 'yyyy-MM-dd\\'T\\'HH:mm:ss')"
    if utc:
        return f"{base} || '+00:00'"
    # zone offset at that instant as exact integer minutes: pure
    # wall-clock difference (timestampdiff on NTZ never consults the
    # session zone, so no session-DST edge can skew it)
    mins = f"CAST(timestampdiff(MINUTE, {col}, {wall}) AS BIGINT)"
    return (
        f"{base} || CASE WHEN {mins} < 0 THEN '-' ELSE '+' END || "
        f"lpad(CAST(abs({mins}) DIV 60 AS STRING), 2, '0') || ':' || "
        f"lpad(CAST(abs({mins}) % 60 AS STRING), 2, '0')"
    )


def timestamp_render_duck(
    col: str, *, rfc9557: bool = False, utc: bool = True,
    tz: str | None = None,
) -> str:
    wall = _ts_wall(col, "duck", utc, tz)
    if not rfc9557:
        return f"strftime({wall}, '%Y-%m-%d %H:%M:%S')"
    base = f"strftime({wall}, '%Y-%m-%dT%H:%M:%S')"
    if utc:
        return f"{base} || '+00:00'"
    mins = f"CAST(date_diff('minute', {col}, {wall}) AS BIGINT)"
    return (
        f"{base} || CASE WHEN ({mins}) < 0 THEN '-' ELSE '+' END || "
        f"lpad(CAST(abs({mins}) // 60 AS VARCHAR), 2, '0') || ':' || "
        f"lpad(CAST(abs({mins}) % 60 AS VARCHAR), 2, '0')"
    )
