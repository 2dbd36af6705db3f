"""Deterministic flow-record view derived from the `events` table.

The driver's testdata is TPC-H-ish; pmacct's unit of data is a flow
record (struct pkt_data, reference src/network.h:483-493). This module
derives a flow table from `events` with *pure integer arithmetic* —
every expression is written once and rendered to both Spark SQL and
DuckDB SQL, so the DuckDB oracle can reproduce it bit-for-bit and every
pmacct aggregation semantic becomes hash-checkable.

Columns mirror FIXTURES.md §1 / the reference's output vocabulary.
Only exact operations are used (%, integer DIV, FLOOR on one double
product) — no engine-divergent floating point.

Dialect differences handled by rendering:
  {STR}      -> STRING (Spark) / VARCHAR (DuckDB)
  a {DIV} b  -> a DIV b (Spark) / a // b (DuckDB)   [nonneg operands only]
  end_ts     -> timestampadd vs + INTERVAL (n) SECOND
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pmacct_spark.sources.tables import load_table

# Each entry: output column -> dialect-neutral SQL over `events`
# (event_id bigint, ts timestamp, user_id bigint, event_type string,
#  value double, props string).
_DERIVATIONS: list[tuple[str, str]] = [
    ("event_id", "event_id"),
    ("ts", "ts"),
    ("props", "props"),
    ("duration_s", "event_id % 600"),
    # exporter: 5 distinct collectors
    ("peer_ip_src", "'192.0.2.' || CAST(user_id % 5 AS {STR})"),
    # src/dst IPv4 in 10.0.0.0/12, Knuth-hash spread, exact int64 math
    ("ip_src_i", "167772160 + ((event_id * 2654435761) % 1048576)"),
    ("ip_dst_i", "167772160 + ((event_id * 2246822519 + user_id * 97) % 1048576)"),
    ("port_src", (
        "CASE event_id % 7 WHEN 0 THEN 443 WHEN 1 THEN 80 WHEN 2 THEN 53 "
        "ELSE 1024 + (event_id % 60000) END"
    )),
    ("port_dst", (
        "CASE user_id % 5 WHEN 0 THEN 443 WHEN 1 THEN 80 "
        "ELSE 33000 + (user_id % 28000) END"
    )),
    ("ip_proto", (
        "CASE WHEN user_id % 10 <= 5 THEN 6 WHEN user_id % 10 <= 8 THEN 17 "
        "ELSE 1 END"
    )),
    ("tos", "(event_id % 4) * 32"),
    # TCP gets ACK(16)+low bits so bit_or aggregation is interesting
    ("tcp_flags", "CASE WHEN user_id % 10 <= 5 THEN 16 + (event_id % 16) ELSE 0 END"),
    ("iface_in", "user_id % 8"),
    ("iface_out", "(user_id + 3) % 8"),
    ("as_src", "64500 + (user_id % 20)"),
    ("as_dst", "64500 + ((user_id * 3 + 1) % 20)"),
    ("sampling_rate", "CASE user_id % 4 WHEN 0 THEN 1000 WHEN 1 THEN 100 ELSE 1 END"),
    # bytes: FLOOR(double*int) is IEEE-exact and identical cross-engine
    ("bytes", "CAST(FLOOR(value * 997) AS BIGINT) + 40 + (event_id % 1460)"),
    ("packets", "1 + (event_id % 1000)"),
    ("flows", "CAST(1 AS BIGINT)"),
    ("export_proto_seqno", (
        "event_id + CASE WHEN event_id % 101 = 0 THEN 100000 ELSE 0 END"
    )),
    ("export_proto_version", "CASE user_id % 3 WHEN 0 THEN 5 WHEN 1 THEN 9 ELSE 10 END"),
    ("event_type", "event_type"),
    # --- L2 block: MACs / VLANs / CoS / EtherType
    #     (struct pkt_primitives, reference src/network.h:436-481)
    ("mac_src", "'02:00:00:00:00:' || lpad(CAST(user_id % 100 AS {STR}), 2, '0')"),
    ("mac_dst", "'02:00:00:00:01:' || lpad(CAST((user_id * 3 + 1) % 100 AS {STR}), 2, '0')"),
    ("vlan", "1 + (user_id % 7) * 100"),
    ("in_vlan", "1 + (user_id % 7) * 100"),
    ("out_vlan", "1 + ((user_id + 1) % 7) * 100"),
    ("in_cvlan", "CASE WHEN user_id % 3 = 0 THEN 2000 + (event_id % 5) ELSE 0 END"),
    ("out_cvlan", "CASE WHEN user_id % 3 = 1 THEN 3000 + (event_id % 5) ELSE 0 END"),
    ("cos", "event_id % 8"),
    # 0x0800 IPv4 / 0x86DD IPv6 (1-in-50 flows are v6-signalled)
    ("etype", "CASE WHEN event_id % 50 = 0 THEN 34525 ELSE 2048 END"),
    ("flow_label", "CASE WHEN event_id % 50 = 0 THEN event_id % 1048576 ELSE 0 END"),
    # --- MPLS block (struct pkt_mpls_primitives, src/network.h:634-640)
    ("mpls_label_top", "16 + (event_id % 1000)"),
    ("mpls_label_bottom", "16 + ((event_id * 7) % 1000)"),
    ("mpls_label_stack", (
        "CAST(16 + (event_id % 1000) AS {STR}) || '_' || "
        "CAST(16 + ((event_id * 7) % 1000) AS {STR})"
    )),
    ("mpls_pw_id", "user_id % 100"),
    ("path_delay_min_usec", "(event_id % 5000) {DIV} 2"),
    ("path_delay_avg_usec", "500 + (event_id % 5000)"),
    ("path_delay_max_usec", "1000 + (event_id % 5000) * 2"),
    # --- sampling direction (i=ingress, e=egress, u=unknown)
    ("sampling_direction", "CASE user_id % 3 WHEN 0 THEN 'i' WHEN 1 THEN 'e' ELSE 'u' END"),
    # --- NAT block (struct pkt_nat_primitives, src/network.h:620-632);
    #     post-NAT addresses in 198.18.0.0/15 (RFC 2544 bench space)
    ("nat_event", "CASE WHEN user_id % 6 = 0 THEN 1 WHEN user_id % 6 = 1 THEN 2 ELSE 0 END"),
    ("fw_event", "user_id % 3"),
    ("post_nat_port_src", "1024 + ((event_id * 3) % 60000)"),
    ("post_nat_port_dst", "1 + (user_id % 65000)"),
    # integer forms of the post-NAT addresses (wire encode/decode path)
    ("post_nat_ip_src_i", (
        "CASE WHEN user_id % 6 <= 1 THEN 3323068416 + ((event_id * 31) % 131072) ELSE 0 END"
    )),
    ("post_nat_ip_dst_i", (
        "CASE WHEN user_id % 6 <= 1 THEN 3323068416 + ((user_id * 131) % 131072) ELSE 0 END"
    )),
    # --- tunnel block (struct pkt_tunnel_primitives, src/network.h:642-660):
    #     user_id%4==0 -> VXLAN/UDP outer; user_id%4==1 -> NVGRE outer
    ("tunnel_proto", (
        "CASE WHEN user_id % 4 = 0 THEN 17 WHEN user_id % 4 = 1 THEN 47 ELSE 0 END"
    )),
    ("tunnel_tos", "CASE WHEN user_id % 4 <= 1 THEN (user_id % 4) * 32 ELSE 0 END"),
    ("tunnel_src_port", "CASE WHEN user_id % 4 = 0 THEN 49152 + (event_id % 16384) ELSE 0 END"),
    ("tunnel_dst_port", "CASE WHEN user_id % 4 = 0 THEN 4789 ELSE 0 END"),
    ("tunnel_tcp_flags", "0"),
    ("tunnel_flow_label", "0"),
    ("tunnel_src_mac", (
        "CASE WHEN user_id % 4 <= 1 THEN "
        "'02:00:00:00:02:' || lpad(CAST(user_id % 100 AS {STR}), 2, '0') ELSE '' END"
    )),
    ("tunnel_dst_mac", (
        "CASE WHEN user_id % 4 <= 1 THEN "
        "'02:00:00:00:03:' || lpad(CAST((user_id * 7 + 2) % 100 AS {STR}), 2, '0') ELSE '' END"
    )),
    ("vxlan", "CASE WHEN user_id % 4 = 0 THEN 1 + (user_id % 1000) ELSE 0 END"),
    ("nvgre", "CASE WHEN user_id % 4 = 1 THEN 1 + (user_id % 1000) ELSE 0 END"),
    # --- VRF / interface names (vlen primitives; src/network.h:520-523)
    ("vrf_name", "'vrf-' || CAST(user_id % 4 AS {STR})"),
    ("ingress_vrf_name", "'vrf-' || CAST(user_id % 4 AS {STR})"),
    ("egress_vrf_name", "'vrf-' || CAST((user_id + 1) % 4 AS {STR})"),
    ("in_iface_name", "'eth' || CAST(user_id % 8 AS {STR})"),
    ("out_iface_name", "'eth' || CAST((user_id + 3) % 8 AS {STR})"),
    # --- SRv6 segment list (vlen primitive; rendered as csv string the
    #     way the JSON encoder renders the array)
    ("srv6_seg_ipv6_list", (
        "CASE WHEN event_id % 50 = 0 THEN "
        "'fc00::' || CAST(user_id % 16 AS {STR}) || ',fc00::' || CAST((user_id + 1) % 16 AS {STR}) "
        "ELSE '' END"
    )),
    ("export_proto_sysid", "user_id % 5"),
    # --- IPv6 addresses for the v6-signalled flows (etype 0x86DD):
    #     uncompressed 8-group lowercase form in fd00::/8 so prefix
    #     match is a fixed-width substring compare (host_addr v4/v6
    #     union, reference src/addr.c; SURVEY §1.4)
    ("ip6_src", (
        "CASE WHEN event_id % 50 = 0 THEN "
        "'fd00:0000:0000:' || lpad(lower({HEX}(user_id % 5)), 4, '0') || "
        "':0000:0000:' || lpad(lower({HEX}(user_id % 16)), 4, '0') || "
        "':' || lpad(lower({HEX}(event_id % 65536)), 4, '0') "
        "ELSE '' END"
    )),
    ("ip6_dst", (
        "CASE WHEN event_id % 50 = 0 THEN "
        "'fd00:0000:0000:' || lpad(lower({HEX}((user_id + 1) % 5)), 4, '0') || "
        "':0000:0000:' || lpad(lower({HEX}((user_id * 3 + 1) % 16)), 4, '0') || "
        "':' || lpad(lower({HEX}((event_id * 7 + 3) % 65536)), 4, '0') "
        "ELSE '' END"
    )),
]

# tunnel outer IPs (172.16.0.0/12) and post-NAT IPs (198.18.0.0/15),
# dotted-quad via the shared formatter
_TUN_SRC_I = "(2886729728 + (user_id % 4096))"
_TUN_DST_I = "(2886729728 + ((user_id * 13 + 5) % 4096))"
_PNAT_SRC_I = "(3323068416 + ((event_id * 31) % 131072))"
_PNAT_DST_I = "(3323068416 + ((user_id * 131) % 131072))"

# dotted-quad presentation of the int IPs (appended after the base list
# so they can reference ip_src_i / ip_dst_i logic inline)
_IP_FMT = (
    "CAST(({i} {DIV} 16777216) % 256 AS {STR}) || '.' || "
    "CAST(({i} {DIV} 65536) % 256 AS {STR}) || '.' || "
    "CAST(({i} {DIV} 256) % 256 AS {STR}) || '.' || "
    "CAST({i} % 256 AS {STR})"
)
_SRC_I = "(167772160 + ((event_id * 2654435761) % 1048576))"
_DST_I = "(167772160 + ((event_id * 2246822519 + user_id * 97) % 1048576))"
_DERIVATIONS += [
    ("ip_src", _IP_FMT.format(i=_SRC_I, DIV="{DIV}", STR="{STR}")),
    ("ip_dst", _IP_FMT.format(i=_DST_I, DIV="{DIV}", STR="{STR}")),
    ("tunnel_src_host", (
        "CASE WHEN user_id % 4 <= 1 THEN "
        + _IP_FMT.format(i=_TUN_SRC_I, DIV="{DIV}", STR="{STR}")
        + " ELSE '' END"
    )),
    ("tunnel_dst_host", (
        "CASE WHEN user_id % 4 <= 1 THEN "
        + _IP_FMT.format(i=_TUN_DST_I, DIV="{DIV}", STR="{STR}")
        + " ELSE '' END"
    )),
    ("post_nat_ip_src", (
        "CASE WHEN user_id % 6 <= 1 THEN "
        + _IP_FMT.format(i=_PNAT_SRC_I, DIV="{DIV}", STR="{STR}")
        + " ELSE '' END"
    )),
    ("post_nat_ip_dst", (
        "CASE WHEN user_id % 6 <= 1 THEN "
        + _IP_FMT.format(i=_PNAT_DST_I, DIV="{DIV}", STR="{STR}")
        + " ELSE '' END"
    )),
]

_END_TS = {
    "spark": "timestampadd(SECOND, CAST(event_id % 600 AS INT), ts)",
    "duck": "ts + INTERVAL (event_id % 600) SECOND",
}

# per-dialect timestamp primitives (timestamp_start == ts aliased;
# arrival/export are collector-side clocks, src/network.h:626-631)
_TS_EXTRAS = {
    "spark": [
        ("timestamp_arrival", "timestampadd(SECOND, CAST(event_id % 600 AS INT) + 2, ts)"),
        ("timestamp_export", "timestampadd(SECOND, CAST(event_id % 600 AS INT) + 5, ts)"),
    ],
    "duck": [
        ("timestamp_arrival", "ts + INTERVAL (event_id % 600 + 2) SECOND"),
        ("timestamp_export", "ts + INTERVAL (event_id % 600 + 5) SECOND"),
    ],
}


def _render(expr: str, dialect: str) -> str:
    if dialect == "spark":
        return (
            expr.replace("{DIV}", "DIV")
            .replace("{STR}", "STRING")
            .replace("{HEX}", "hex")
        )
    return (
        expr.replace("{DIV}", "//")
        .replace("{STR}", "VARCHAR")
        .replace("{HEX}", "to_hex")
    )


def _select_list(dialect: str) -> str:
    parts = [f"{_render(expr, dialect)} AS {name}" for name, expr in _DERIVATIONS]
    parts.append(f"{_END_TS[dialect]} AS end_ts")
    parts.extend(f"{expr} AS {name}" for name, expr in _TS_EXTRAS[dialect])
    return ",\n    ".join(parts)


def flows_sql(dialect: str, source: str = "events") -> str:
    """The flow-view SELECT in the given dialect ('spark' | 'duck')."""
    return f"SELECT\n    {_select_list(dialect)}\nFROM {source}"


#: CTE prefix for DuckDB oracle queries: ``WITH flows AS (...)``.
FLOWS_DUCK_CTE = f"WITH flows AS (\n{flows_sql('duck')}\n)"


def flows_select_exprs() -> list[str]:
    """The Spark-dialect select list (shared by the batch view and the
    streaming source)."""
    exprs = [f"{_render(e, 'spark')} AS {n}" for n, e in _DERIVATIONS]
    exprs.append(f"{_END_TS['spark']} AS end_ts")
    exprs.extend(f"{e} AS {n}" for n, e in _TS_EXTRAS["spark"])
    return exprs


def flows_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flow table as a DataFrame (lazily planned; Catalyst prunes
    unused derivations per query)."""
    events = load_table(spark, sf_dir, "events")
    return events.selectExpr(*flows_select_exprs())
