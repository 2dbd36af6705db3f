"""Flow-size-dependent smart sampling (fss) of aggregates — the
reference's check_fss (src/preprocess.c:549-575, threshold
src/preprocess.h:45): big flows (bytes >= t) always survive; small
flows survive when the running sum of their bytes/t crosses an integer
boundary, and survivors are renormalized up to the threshold
(bytes := t, packets := t DIV (bytes DIV packets)).

The reference accumulates the probability in a float over the purge
queue; this engine defines the same scan with EXACT integer arithmetic
(keep iff floor(cum/t) > floor((cum-bytes)/t) over the small-flow
running sum) so the DuckDB oracle replays it bit-for-bit. The scan is
an ordered window — per purge batch in the reference, per (partition
key) here; use ``partition_by`` (e.g. exporter) to keep the sort
distributed at scale.

check_fsrc (src/preprocess.c:582) is Duffield priority sampling; the
reference seeds libc random() from gettimeofday so its OUTPUT is not
reproducible, but the algorithm is — :func:`priority_sample` below is
the deterministic twin (hash-drawn uniforms), oracle-gated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fss_sample(
    agg: DataFrame,
    threshold: int,
    order_cols: list[str],
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Smart-sample aggregated rows; returns survivors renormalized."""
    w = (
        Window.partitionBy(*partition_by) if partition_by else Window.partitionBy()
    ).orderBy(*order_cols).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    small = F.col("bytes") < threshold
    cum = F.sum(F.when(small, F.col("bytes")).otherwise(F.lit(0))).over(w)
    out = agg.withColumn("__cum", cum).filter(
        F.expr(
            f"bytes >= {threshold} OR "
            f"(__cum DIV {threshold}) > ((__cum - bytes) DIV {threshold})"
        )
    )
    return (
        out.withColumn(
            "packets",
            F.when(small, F.expr(f"CAST({threshold} AS BIGINT) DIV (bytes DIV packets)"))
            .otherwise(F.col("packets"))
            .cast("bigint"),
        )
        .withColumn(
            "bytes",
            F.when(small, F.lit(threshold).cast("bigint")).otherwise(F.col("bytes")),
        )
        .drop("__cum")
    )


def fss_duck_sql(
    inner_sql: str, threshold: int, order_cols: list[str]
) -> str:
    """DuckDB replay of :func:`fss_sample` over ``inner_sql`` (which
    must yield bytes/packets plus the order columns)."""
    order = ", ".join(order_cols)
    t = threshold
    return f"""
WITH __agg AS ({inner_sql}),
__cumd AS (
  SELECT *,
         SUM(CASE WHEN bytes < {t} THEN bytes ELSE 0 END)
           OVER (ORDER BY {order} ROWS UNBOUNDED PRECEDING) AS cum
  FROM __agg
),
__kept AS (
  SELECT * FROM __cumd
  WHERE bytes >= {t} OR (cum // {t}) > ((cum - bytes) // {t})
)
SELECT * EXCLUDE (cum) REPLACE (
  CASE WHEN bytes < {t}
       THEN CAST({t} // (bytes // packets) AS BIGINT) ELSE packets END AS packets,
  CASE WHEN bytes < {t} THEN CAST({t} AS BIGINT) ELSE bytes END AS bytes
) FROM __kept
"""


# --- check_fsrc: priority sampling of the aggregate queue ------------------
#
# The reference's check_fsrc (src/preprocess.c:582-668) is Duffield
# priority sampling: each flow draws w ~ U(0,1], gets priority
# z = bytes / w, the m highest-priority flows survive, and a survivor
# whose bytes fall under tau = z_(m+1) (the highest DISCARDED
# priority) is renormalized up to tau — an unbiased byte estimator.
# The reference seeds libc random() from gettimeofday(), so its
# OUTPUT is not reproducible; the ALGORITHM is. This twin draws w
# from a fixed multiplicative hash of the row key — same estimator,
# deterministic, so the DuckDB oracle replays it value-for-value
# (both engines evaluate the identical IEEE double expression and the
# identical integer renormalization).

# the hash family's frozen constants — imported, not re-hardcoded:
# the DuckDB oracle replays the identical arithmetic, so a drifting
# duplicate literal would silently break the cross-engine gate
from pmacct_spark.functions.hashing import MINHASH_A, MINHASH_B, P as PRIO_P

PRIO_A = MINHASH_A[0]
PRIO_B = MINHASH_B[0]


def _prio_z_sql(key_col: str) -> str:
    # w = h/P with h in [1, P]  =>  z = bytes * P / h
    return (
        f"(CAST(bytes AS DOUBLE) * {PRIO_P}) / "
        f"(1 + ({key_col} * {PRIO_A} + {PRIO_B}) % {PRIO_P})"
    )


def priority_sample(agg: DataFrame, m: int, key_col: str) -> DataFrame:
    """check_fsrc twin: keep the ``m`` highest-priority rows of
    ``agg`` (needs bytes/packets + a unique ``key_col``), renormalized
    to the discarded threshold. Scale shape: the only global step is a
    top-(m+1) (TakeOrderedAndProject — per-partition top-k then a
    driver merge of m+1 rows, never a full sort shuffle); ranking and
    renormalization then run over m+1 rows."""
    z = agg.withColumn("__z", F.expr(_prio_z_sql(key_col)))
    topk = z.orderBy(F.desc("__z"), F.col(key_col)).limit(m + 1)
    w = Window.orderBy(F.desc("__z"), F.col(key_col))
    ranked = topk.withColumn("__rn", F.row_number().over(w))
    tau = ranked.filter(F.col("__rn") == m + 1).agg(
        F.max(F.expr("CAST(FLOOR(__z) AS BIGINT)")).alias("__tau")
    )
    kept = ranked.filter(F.col("__rn") <= m).crossJoin(F.broadcast(tau))
    renorm = F.expr("bytes < __tau")  # NULL tau (fewer rows than m) -> false
    return (
        kept.withColumn(
            "packets",
            F.when(
                renorm & F.expr("(bytes DIV packets) >= 1"),
                F.expr("__tau DIV (bytes DIV packets)"),
            )
            .otherwise(F.col("packets"))
            .cast("bigint"),
        )
        .withColumn(
            "bytes",
            F.when(renorm, F.col("__tau")).otherwise(F.col("bytes")).cast("bigint"),
        )
        .drop("__z", "__rn", "__tau")
    )


def fsrc_duck_sql(inner_sql: str, m: int, key_col: str) -> str:
    """DuckDB replay of :func:`priority_sample` over ``inner_sql``."""
    zx = _prio_z_sql(key_col)
    return f"""
WITH __agg AS ({inner_sql}),
__z AS (SELECT *, {zx} AS __z FROM __agg),
__topk AS (SELECT * FROM __z ORDER BY __z DESC, {key_col} LIMIT {m + 1}),
__rank AS (
  SELECT *, row_number() OVER (ORDER BY __z DESC, {key_col}) AS __rn
  FROM __topk
),
__tau AS (
  SELECT MAX(CAST(FLOOR(__z) AS BIGINT)) AS __t FROM __rank
  WHERE __rn = {m + 1}
)
SELECT * EXCLUDE (__z, __rn, __t) REPLACE (
  CASE WHEN bytes < __t AND (bytes // packets) >= 1
       THEN __t // (bytes // packets) ELSE packets END AS packets,
  CASE WHEN bytes < __t THEN __t ELSE bytes END AS bytes
) FROM __rank, __tau WHERE __rn <= {m}
"""
