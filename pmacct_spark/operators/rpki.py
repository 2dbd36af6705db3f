"""RPKI ROA validation — the reference's rpki daemon lookup
(src/rpki/rpki_lookup.c:29-106 rpki_prefix_lookup +
rpki_prefix_lookup_node_match_cmp; status chars src/rpki/rpki.h:26-31):

  - VALID ('v')   if ANY covering ROA has maxlen >= the route's
                  prefix length AND its origin AS matches;
  - INVALID ('i') if covering ROAs exist but none validates;
  - UNKNOWN ('u') if no ROA covers the prefix.

"Covering" = the ROA's prefix contains the route's prefix (ROA
masklen <= route masklen, masked bits equal). The reference's
OVERLAP_* statuses ('o'/'O') come from its follow-default RIB-level
walk (rpki_vector_prefix_lookup) and are out of scope here — they
require the recursive less-specific lookup the engine does not model.

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
