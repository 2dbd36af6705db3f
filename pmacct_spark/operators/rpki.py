"""RPKI ROA validation — the reference's rpki daemon lookup
(src/rpki/rpki_lookup.c:29-106 rpki_prefix_lookup +
rpki_prefix_lookup_node_match_cmp; status chars src/rpki/rpki.h:26-31):

  - VALID ('v')   if ANY covering ROA has maxlen >= the route's
                  prefix length AND its origin AS matches;
  - INVALID ('i') if covering ROAs exist but none validates;
  - UNKNOWN ('u') if no ROA covers the prefix.

"Covering" = the ROA's prefix contains the route's prefix (ROA
masklen <= route masklen, masked bits equal). The reference's
OVERLAP_* statuses ('o'/'O', src/rpki/rpki.h:29-30) come from its
follow-default RIB-level walk (rpki_vector_prefix_lookup,
src/rpki/rpki_lookup.c:60-90): when the MOST-SPECIFIC matching RIB
route is invalid, the walk climbs the covering (less-specific)
routes — each judged with ITS OWN origin AS — and stops at the first
valid/unknown one; reaching one upgrades the lookup to 'o'
(invalid-with-covering-valid) / 'O' (invalid-with-covering-unknown).
:func:`rpki_vector_status` implements that walk as a closed-form
per-row expression over per-masklen broadcast joins — no recursion,
no extra shuffle.

Spark shape: like operators/lpm.lpm_join, the ROA table is expanded
per distinct ROA mask length and broadcast; each join key is the
route prefix masked to that length, so every join is a
BroadcastHashJoin and the route table never shuffles. Because several
ROAs can share one covering prefix (different origin AS / maxlen),
each dim row carries collect_list(struct(asn, maxlen)) and validity
is a JVM-side EXISTS over that array — one row in, one row out.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rpki_validate(
    routes: DataFrame,
    roa: DataFrame,
    ip_col: str = "net_int",
    len_col: str = "masklen",
    origin_col: str = "origin_as",
    out_col: str = "roa_status",
) -> DataFrame:
    """Append ``out_col`` ('v'/'i'/'u') to ``routes``.

    ``roa`` needs net_int, masklen, maxlen, asn. The distinct ROA
    mask lengths are collected driver-side (tiny dimension); the data
    moves only as broadcasts."""
    masklens = sorted(
        (r[0] for r in roa.select("masklen").distinct().collect()),
        reverse=True,
    )
    if not masklens:  # empty ROA table: nothing is covered
        return routes.withColumn(out_col, F.lit("u"))
    out = routes
    valid_terms, cover_terms = [], []
    for m in masklens:
        div = 1 << (32 - m)
        dim = (
            roa.filter(F.col("masklen") == m)
            .groupBy(F.expr(f"net_int DIV {div}").alias(f"__roa_{m}"))
            .agg(
                F.collect_list(F.struct("asn", "maxlen")).alias(f"__ent_{m}")
            )
        )
        cond = (F.expr(f"{ip_col} DIV {div}") == F.col(f"__roa_{m}")) & (
            F.col(len_col) >= F.lit(m)  # a ROA never covers a shorter route
        )
        out = out.join(F.broadcast(dim), cond, "left").drop(f"__roa_{m}")
        cover_terms.append(F.col(f"__ent_{m}").isNotNull())
        valid_terms.append(
            F.expr(
                f"exists(__ent_{m}, x -> x.maxlen >= {len_col} "
                f"AND x.asn = {origin_col})"
            )
        )
    status = (
        F.when(reduce(lambda a, b: a | b, valid_terms), F.lit("v"))
        .when(reduce(lambda a, b: a | b, cover_terms), F.lit("i"))
        .otherwise(F.lit("u"))
    )
    return out.withColumn(out_col, status).drop(
        *[f"__ent_{m}" for m in masklens]
    )


def rpki_vector_status(
    flows: DataFrame,
    rib_validated: DataFrame,
    ip_col: str = "ip_dst_i",
    peer_flow_col: str = "peer_ip_src",
    peer_dim_col: str = "peer_ip",
    status_col: str = "roa_status",
    out_col: str = "dst_roa",
) -> DataFrame:
    """Flow-level ROA status WITH the reference's overlap walk
    (rpki_vector_prefix_lookup, src/rpki/rpki_lookup.c:60-90).

    ``rib_validated`` is a RIB carrying a per-route ``status_col``
    ('v'/'i'/'u' from :func:`rpki_validate`). Every matching RIB level
    of the flow's peer joins in (one broadcast equi-join per distinct
    masklen, flow table never shuffles); the walk's result is a pure
    per-row expression over the level columns:

      - s1 (most-specific level) != 'i'  ->  s1       (walk breaks)
      - s1 == 'i', first less-specific non-'i' is 'v' -> 'o'
      - s1 == 'i', first less-specific non-'i' is 'u' -> 'O'
      - every level 'i' (or only one level)           -> 'i'
      - no matching route at all                      -> 'u'
    """
    masklens = sorted(
        (
            r[0]
            for r in rib_validated.select("masklen").distinct().collect()
        ),
        reverse=True,
    )
    out = flows
    st_cols: list[str] = []
    for m in masklens:
        div = 1 << (32 - m)
        dim = (
            rib_validated.filter(F.col("masklen") == m)
            .groupBy(
                F.col(peer_dim_col).alias(f"__p_{m}"),
                F.expr(f"net_int DIV {div}").alias(f"__k_{m}"),
            )
            .agg(F.max(status_col).alias(f"__st_{m}"))
        )
        cond = (F.col(peer_flow_col) == F.col(f"__p_{m}")) & (
            F.expr(f"{ip_col} DIV {div}") == F.col(f"__k_{m}")
        )
        out = out.join(F.broadcast(dim), cond, "left").drop(
            f"__p_{m}", f"__k_{m}"
        )
        st_cols.append(f"__st_{m}")
    if not st_cols:
        return flows.withColumn(out_col, F.lit("u"))
    s1 = F.coalesce(*[F.col(c) for c in st_cols])
    fni = F.coalesce(
        *[F.when(F.col(c) != "i", F.col(c)) for c in st_cols]
    )
    status = (
        F.when(s1.isNull(), F.lit("u"))
        .when(s1 != "i", s1)
        .when(fni == "v", F.lit("o"))
        .when(fni == "u", F.lit("O"))
        .otherwise(F.lit("i"))
    )
    return out.withColumn(out_col, status).drop(*st_cols)
