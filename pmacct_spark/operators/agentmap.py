"""bgp_agent_map / bmp_agent_map — flow-exporter to BGP/BMP peer
mapping (reference CONFIG-KEYS:2986, examples/bgp_agent.map.example;
applied at lookup time by src/bgp/bgp_lookup.c:89's peer selection,
required by pmacctd/uacctd per src/pmacctd.c:1125).

Without a map the engine assumes exporter IP == BGP session IP; any
deployment peering on loopbacks (route reflectors, hub-and-spoke,
NAT-traversing sessions) breaks that equality — the map redirects each
exporter (by source address / prefix, optionally narrowed by input or
output ifindex and address family) to the peer whose RIB should enrich
its flows.

Spark shape: the map is BOUNDED (reference ``maps_entries``, default
384 rows), so it compiles to ONE chained CASE expression evaluated
map-side inside whole-stage codegen — no join, no shuffle, nothing for
AQE to mis-size; first matching entry wins exactly like the
reference's linear map walk. The same SQL text renders for Spark
(`` DIV ``) and the DuckDB oracle (``//``), so gated queries replay
the mapping verbatim.
"""

from __future__ import annotations

import ipaddress

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def agent_map_case_sql(
    entries: list[dict],
    exp_int: str,
    exp_str: str,
    in_col: str | None = "iface_in",
    out_col: str | None = "iface_out",
    family_expr: str | None = None,
) -> str:
    """Render the map as one first-match-wins CASE over SQL
    expressions: ``exp_int`` = the exporter's v4 address as a bigint
    expression, ``exp_str`` = its string form (v6 entries match the
    string exactly), ``family_expr`` = an int 4/6 expression when
    entries discriminate by ``filter='ip|ip6'``. Integer division
    renders as `` DIV `` — replace with ``//`` for DuckDB."""
    whens: list[str] = []
    for e in entries:
        conds: list[str] = []
        ip = e.get("ip") or "0.0.0.0/0"
        net = ipaddress.ip_network(ip, strict=False)
        if net.version == 4:
            if net.prefixlen > 0:
                div = 1 << (32 - net.prefixlen)
                base = int(net.network_address) // div
                conds.append(f"(({exp_int}) DIV {div}) = {base}")
            else:
                # 0.0.0.0/0 is a v4 catch-all, not an any-family one —
                # it must not capture IPv6 exporters (the reference
                # matches per address family, src/pretag.c)
                conds.append(f"({exp_str}) NOT LIKE '%:%'")
        else:
            if net.prefixlen == 128:
                conds.append(f"({exp_str}) = '{net.network_address}'")
            elif net.prefixlen > 0:
                raise ValueError(
                    "v6 agent-map entries support host addresses or "
                    f"::/0 catch-all, got {ip}"
                )
            else:
                conds.append(f"({exp_str}) LIKE '%:%'")
        fam = e.get("family")
        if fam is not None:
            if family_expr is None:
                raise ValueError(
                    "entry discriminates by family but no family_expr "
                    "column was provided"
                )
            conds.append(f"({family_expr}) = {int(fam)}")
        for key, col in (("in", in_col), ("out", out_col)):
            if e.get(key) is not None:
                if col is None:
                    raise ValueError(f"entry matches {key}= but no column")
                conds.append(f"{col} = {int(e[key])}")
        cond = " AND ".join(conds) if conds else "TRUE"
        # bgp_ip is interpolated into a SQL string literal: escape
        # quotes so a malformed config value can't break out of it
        # (the same class fixed for bgp_stdcomm_pattern)
        bgp_ip = str(e["bgp_ip"]).replace("'", "''")
        whens.append(f"WHEN {cond} THEN '{bgp_ip}'")
    return "CASE " + " ".join(whens) + " ELSE NULL END"


def apply_bgp_agent_map(
    df: DataFrame,
    entries: list[dict],
    exporter_col: str = "peer_ip_src",
    in_col: str = "iface_in",
    out_col: str = "iface_out",
    family_expr: str | None = None,
) -> Column | DataFrame:
    """Rewrite ``exporter_col`` (the flow's correlation peer, seeded
    with the exporter address) through the agent map: matched flows
    carry the mapped peer's session address, unmatched flows get NULL
    — no peer, no RIB attributes, the reference's no-xs-entry
    behavior. Pure map-side projection."""
    from pmacct_spark.functions.addr import ipv4_aton

    has_in = in_col if in_col in df.columns else None
    has_out = out_col if out_col in df.columns else None
    aton = ipv4_aton(exporter_col)
    case = agent_map_case_sql(
        entries,
        exp_int="__exp_i",
        exp_str=exporter_col,
        in_col=has_in,
        out_col=has_out,
        family_expr=family_expr,
    )
    return (
        df.withColumn("__exp_i", aton)
        .withColumn(exporter_col, F.expr(case))
        .drop("__exp_i")
    )
