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

check_fsrc (src/preprocess.c:582) seeds libc random() from
gettimeofday and is inherently nondeterministic — not reproduced.
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
