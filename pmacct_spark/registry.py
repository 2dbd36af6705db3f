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
    # --- L2 / VLAN / CoS / EtherType (src/network.h:436-481)
    "in_vlan": _p("in_vlan", "in_vlan", "int"),
    "out_vlan": _p("out_vlan", "out_vlan", "int"),
    "in_cvlan": _p("in_cvlan", "in_cvlan", "int"),
    "out_cvlan": _p("out_cvlan", "out_cvlan", "int"),
    "cos": _p("cos", "cos", "int"),
    "etype": _p("etype", "etype", "int"),
    "flow_label": _p("flow_label", "flow_label", "bigint"),
    # --- MPLS (struct pkt_mpls_primitives, src/network.h:634-640)
    "mpls_label_top": _p("mpls_label_top", "mpls_label_top", "bigint"),
    "mpls_label_bottom": _p("mpls_label_bottom", "mpls_label_bottom", "bigint"),
    "mpls_label_stack": _p("mpls_label_stack", "mpls_label_stack", "string"),
    "mpls_pw_id": _p("mpls_pw_id", "mpls_pw_id", "bigint"),
    "path_delay_avg_usec": _p("path_delay_avg_usec", "path_delay_avg_usec", "bigint"),
    "path_delay_min_usec": _p("path_delay_min_usec", "path_delay_min_usec", "bigint"),
    "path_delay_max_usec": _p("path_delay_max_usec", "path_delay_max_usec", "bigint"),
    "sampling_direction": _p("sampling_direction", "sampling_direction", "string"),
    # --- NAT / firewall (struct pkt_nat_primitives, src/network.h:620-632)
    "nat_event": _p("nat_event", "nat_event", "int"),
    "fw_event": _p("fw_event", "fw_event", "int"),
    "post_nat_src_host": _p("post_nat_src_host", "post_nat_ip_src", "string"),
    "post_nat_dst_host": _p("post_nat_dst_host", "post_nat_ip_dst", "string"),
    "post_nat_src_port": _p("post_nat_src_port", "post_nat_port_src", "int"),
    "post_nat_dst_port": _p("post_nat_dst_port", "post_nat_port_dst", "int"),
    # --- tunnel / outer header (struct pkt_tunnel_primitives,
    #     src/network.h:642-660)
    "tunnel_src_mac": _p("tunnel_src_mac", "tunnel_src_mac", "string"),
    "tunnel_dst_mac": _p("tunnel_dst_mac", "tunnel_dst_mac", "string"),
    "tunnel_src_host": _p("tunnel_src_host", "tunnel_src_host", "string"),
    "tunnel_dst_host": _p("tunnel_dst_host", "tunnel_dst_host", "string"),
    "tunnel_proto": _p("tunnel_proto", "tunnel_proto", "int"),
    "tunnel_tos": _p("tunnel_tos", "tunnel_tos", "int"),
    "tunnel_src_port": _p("tunnel_src_port", "tunnel_src_port", "int"),
    "tunnel_dst_port": _p("tunnel_dst_port", "tunnel_dst_port", "int"),
    "tunnel_tcpflags": _p("tunnel_tcpflags", "tunnel_tcp_flags", "int"),
    "tunnel_flow_label": _p("tunnel_flow_label", "tunnel_flow_label", "bigint"),
    "vxlan": _p("vxlan", "vxlan", "bigint"),
    "nvgre": _p("nvgre", "nvgre", "bigint"),
    # --- timestamps as keys (src/network.h:626-631); timestamp_start/end
    #     are the flow's own clocks, arrival/export the collector's
    "timestamp_start": _p("timestamp_start", "ts", "timestamp_ntz"),
    "timestamp_end": _p("timestamp_end", "end_ts", "timestamp_ntz"),
    "timestamp_arrival": _p("timestamp_arrival", "timestamp_arrival", "timestamp_ntz"),
    "timestamp_export": _p("timestamp_export", "timestamp_export", "timestamp_ntz"),
    "export_proto_sysid": _p("export_proto_sysid", "export_proto_sysid", "bigint"),
    # --- VRF / interface names (vlen primitives, src/network.h:520-523)
    "vrf_name": _p("vrf_name", "vrf_name", "string"),
    "ingress_vrf_name": _p("ingress_vrf_name", "ingress_vrf_name", "string"),
    "egress_vrf_name": _p("egress_vrf_name", "egress_vrf_name", "string"),
    "in_iface_name": _p("in_iface_name", "in_iface_name", "string"),
    "out_iface_name": _p("out_iface_name", "out_iface_name", "string"),
    "srv6_seg_ipv6_list": _p("srv6_seg_ipv6_list", "srv6_seg_ipv6_list", "string"),
    # --- BGP-enrichment-provided keys (populated by the RIB lookup join,
    #     operators/lpm.py; reference src/bgp/bgp_lookup.c:33-210)
    "as_path": _p("as_path", "as_path", "string"),
    "local_pref": _p("local_pref", "local_pref", "bigint"),
    "med": _p("med", "med", "bigint"),
    "std_comm": _p("std_comm", "std_comm", "string"),
    "ext_comm": _p("ext_comm", "ext_comm", "string"),
    "lrg_comm": _p("lrg_comm", "lrg_comm", "string"),
    "dst_roa": _p("dst_roa", "dst_roa", "string"),
    # src_* reverse-lookup variants: same RIB lookup probed with ip_src
    # (struct pkt_legacy_bgp_primitives src_* fields, src/network.h:609-618)
    "src_as_path": _p("src_as_path", "src_as_path", "string"),
    "src_local_pref": _p("src_local_pref", "src_local_pref", "bigint"),
    "src_med": _p("src_med", "src_med", "bigint"),
    "src_std_comm": _p("src_std_comm", "src_std_comm", "string"),
    "src_ext_comm": _p("src_ext_comm", "src_ext_comm", "string"),
    "src_lrg_comm": _p("src_lrg_comm", "src_lrg_comm", "string"),
    "src_roa": _p("src_roa", "src_roa", "string"),
    # --- GeoIP-enrichment-provided keys (views/dims.py geoip_dim)
    "src_host_country": _p("src_host_country", "country_ip_src", "string"),
    "dst_host_country": _p("dst_host_country", "country_ip_dst", "string"),
    "src_host_pocode": _p("src_host_pocode", "pocode_ip_src", "string"),
    "dst_host_pocode": _p("dst_host_pocode", "pocode_ip_dst", "string"),
    "src_host_coords": _p("src_host_coords", "coords_ip_src", "string"),
    "dst_host_coords": _p("dst_host_coords", "coords_ip_dst", "string"),
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
