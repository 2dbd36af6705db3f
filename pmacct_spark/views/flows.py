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
]

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
]

_END_TS = {
    "spark": "timestampadd(SECOND, CAST(event_id % 600 AS INT), ts)",
    "duck": "ts + INTERVAL (event_id % 600) SECOND",
}


def _render(expr: str, dialect: str) -> str:
    if dialect == "spark":
        return expr.replace("{DIV}", "DIV").replace("{STR}", "STRING")
    return expr.replace("{DIV}", "//").replace("{STR}", "VARCHAR")


def _select_list(dialect: str) -> str:
    parts = [f"{_render(expr, dialect)} AS {name}" for name, expr in _DERIVATIONS]
    parts.append(f"{_END_TS[dialect]} AS end_ts")
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
    return exprs


def flows_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flow table as a DataFrame (lazily planned; Catalyst prunes
    unused derivations per query)."""
    events = load_table(spark, sf_dir, "events")
    return events.selectExpr(*flows_select_exprs())
