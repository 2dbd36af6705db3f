"""The primitive registry: pmacct's fixed universe of aggregation columns.

The reference enumerates every possible key/counter as COUNT_* flags in
three 48-bit registries (reference src/pmacct-defines.h:172-283); a
plugin's schema is the set of flags in its ``aggregate`` directive
(reference CONFIG-KEYS:56-90). Here the registry is a plain dict:
primitive name -> (flow-schema column, Spark dtype, kind, aggregator).

Keys group; counters aggregate. Aggregators mirror the reference's
accumulation semantics (reference src/plugin_common.c:424-430):
  - bytes/packets/flows : SUM        (pm_counter_t, u64)
  - tcp_flags           : bitwise OR (reference src/plugin_common.c:428)
  - timestamp_min/max   : MIN/MAX    ("stitching", src/network.h:543-546)

Custom primitives (reference src/cfg.h:45-63, aggregate_primitives map)
are supported by registering extra entries at runtime via
``register_custom``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Primitive:
    """One aggregation primitive (a COUNT_* flag in the reference)."""

    name: str  # pmacct `aggregate` token
    column: str  # column in the normalized flow schema
    dtype: str  # Spark SQL type
    kind: str = "key"  # 'key' | 'counter'
    agg: str = "sum"  # for counters: sum | bit_or | min | max | count

    def agg_expr(self) -> Column:
        c = F.col(self.column)
        if self.agg == "sum":
            return F.sum(c).alias(self.name)
        if self.agg == "bit_or":
            return F.bit_or(c).alias(self.name)
        if self.agg == "min":
            return F.min(c).alias(self.name)
        if self.agg == "max":
            return F.max(c).alias(self.name)
        if self.agg == "count":
            return F.count(F.lit(1)).alias(self.name)
        raise ValueError(f"unknown aggregator {self.agg!r}")


def _p(name, column, dtype, kind="key", agg="sum"):
    return Primitive(name, column, dtype, kind, agg)


# Core registry. Names follow the reference's `aggregate` vocabulary
# (CONFIG-KEYS:56-74) and its JSON output field names
# (tests/100-IPFIXv10-CISCO/output-flow-00.json).
PRIMITIVES: dict[str, Primitive] = {
    # --- keys: hosts / nets (struct pkt_primitives, src/network.h:436-481)
    "src_host": _p("src_host", "ip_src", "string"),
    "dst_host": _p("dst_host", "ip_dst", "string"),
    "src_net": _p("src_net", "net_src", "string"),
    "dst_net": _p("dst_net", "net_dst", "string"),
    "src_mask": _p("src_mask", "mask_src", "int"),
    "dst_mask": _p("dst_mask", "mask_dst", "int"),
    "src_port": _p("src_port", "port_src", "int"),
    "dst_port": _p("dst_port", "port_dst", "int"),
    "proto": _p("proto", "ip_proto", "int"),
    "tos": _p("tos", "tos", "int"),
    "src_mac": _p("src_mac", "mac_src", "string"),
    "dst_mac": _p("dst_mac", "mac_dst", "string"),
    "vlan": _p("vlan", "vlan", "int"),
    "src_as": _p("src_as", "as_src", "bigint"),
    "dst_as": _p("dst_as", "as_dst", "bigint"),
    "in_iface": _p("in_iface", "iface_in", "bigint"),
    "out_iface": _p("out_iface", "iface_out", "bigint"),
    "peer_src_ip": _p("peer_src_ip", "peer_ip_src", "string"),
    "peer_dst_ip": _p("peer_dst_ip", "peer_ip_dst", "string"),
    "peer_src_as": _p("peer_src_as", "peer_as_src", "bigint"),
    "peer_dst_as": _p("peer_dst_as", "peer_as_dst", "bigint"),
    "tag": _p("tag", "tag", "bigint"),
    "tag2": _p("tag2", "tag2", "bigint"),
    "label": _p("label", "label", "map<string,string>"),
    "class": _p("class", "class", "string"),
    "sampling_rate": _p("sampling_rate", "sampling_rate", "bigint"),
    "export_proto_seqno": _p("export_proto_seqno", "export_proto_seqno", "bigint"),
    "export_proto_version": _p("export_proto_version", "export_proto_version", "int"),
    "country_ip_src": _p("country_ip_src", "country_ip_src", "string"),
    "country_ip_dst": _p("country_ip_dst", "country_ip_dst", "string"),
    "mpls_vpn_rd": _p("mpls_vpn_rd", "mpls_vpn_rd", "string"),
    "fwd_status": _p("fwd_status", "fwd_status", "int"),
    # --- counters (struct pkt_data, src/network.h:483-493)
    "bytes": _p("bytes", "bytes", "bigint", "counter", "sum"),
    "packets": _p("packets", "packets", "bigint", "counter", "sum"),
    "flows": _p("flows", "flows", "bigint", "counter", "sum"),
    # tcp_flags aggregates by bitwise OR (src/plugin_common.c:428-429)
    "tcp_flags": _p("tcp_flags", "tcp_flags", "int", "counter", "bit_or"),
    # stitching: min/max observed timestamps (src/network.h:543-546)
    "timestamp_min": _p("timestamp_min", "ts", "timestamp_ntz", "counter", "min"),
    "timestamp_max": _p("timestamp_max", "end_ts", "timestamp_ntz", "counter", "max"),
}

# sum_* primitives fold src+dst into one entity key — a record counts
# toward both its source and destination (P_sum_host_insert etc.,
# reference src/plugin_common.c:710-760). Maps folded-name -> (src_prim,
# dst_prim, output name).
SUM_FOLDS: dict[str, tuple[str, str, str]] = {
    "sum_host": ("src_host", "dst_host", "host"),
    "sum_net": ("src_net", "dst_net", "net"),
    "sum_as": ("src_as", "dst_as", "as"),
    "sum_port": ("src_port", "dst_port", "port"),
    "sum_mac": ("src_mac", "dst_mac", "mac"),
}

DEFAULT_COUNTERS = ("bytes", "packets", "flows")


def register_custom(
    name: str, column: str, dtype: str, kind: str = "key", agg: str = "sum"
) -> Primitive:
    """Register a custom primitive (aggregate_primitives map analogue,
    reference src/cfg.h:45-63, CONFIG-KEYS:174-181)."""
    prim = Primitive(name, column, dtype, kind, agg)
    PRIMITIVES[name] = prim
    return prim


def resolve(names: list[str] | tuple[str, ...]) -> list[Primitive]:
    out = []
    for n in names:
        if n not in PRIMITIVES:
            raise KeyError(
                f"unknown primitive {n!r}; known: {sorted(PRIMITIVES)}"
            )
        out.append(PRIMITIVES[n])
    return out
