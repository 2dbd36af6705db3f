"""Count-min sketch heavy hitters — the sublinear-memory top-talkers
primitive (Cormode & Muthukrishnan 2005).

The reference's memory plugin answers top-talker queries from the full
aggregation table; at 100 TB the sketch is the bounded-memory answer: a
d x w counter grid (d independent hash rows, w buckets) whose size is
CONSTANT in the key cardinality, with the one-sided guarantee
``estimate >= truth`` (collisions only ever add). Heavy keys survive
because min-over-rows needs a key to collide with heavy traffic in
EVERY row to be badly overestimated.

Determinism & oracle parity: the d hash rows are the engine's frozen
universal-hash family (``functions.hashing.MINHASH_A/B`` over the
portable polynomial key hash), so bucket assignment — and therefore
every counter and every estimate — replays exactly in DuckDB.

Scale shape: the batch query stages per-key sums first (one shuffle —
it also reports exact truth next to the estimate); the sketch itself is
a <= d*w-row aggregate that BROADCASTS back onto the per-key bucket
rows. In a pure streaming deployment the per-key stage disappears:
sums commute, so the sketch updates map-side with a d*w-row state —
that constant-state property is the whole point of the structure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pmacct_spark.functions.hashing import (
    MINHASH_A,
    MINHASH_B,
    P,
    poly_hash_duck_sql,
    poly_hash_spark_sql,
)

D_ROWS = 4
W_BUCKETS = 1024


def _bucket_exprs(hash_expr: str, d: int, w: int) -> list[str]:
    return [
        f"(({MINHASH_A[j]} * ({hash_expr}) + {MINHASH_B[j]}) % {P}) % {w}"
        for j in range(d)
    ]


def countmin_heavy_hitters(
    flows: DataFrame,
    key_col: str = "ip_dst",
    weight_col: str = "bytes",
    d: int = D_ROWS,
    w: int = W_BUCKETS,
    k: int = 20,
) -> DataFrame:
    """(host, est_bytes, exact_bytes, overestimate, rank): top-``k``
    keys by count-min ESTIMATE (min over the d rows' counters), with
    the exact per-key truth beside it — ``est >= exact`` always (the
    CM guarantee; equality when the key collides with nothing heavy in
    at least one row). Ranking ties break on the key."""
    from pyspark.sql.window import Window

    from pmacct_spark.operators.staging import stage

    per_key = flows.groupBy(F.col(key_col).alias("key")).agg(
        F.sum(weight_col).cast("bigint").alias("wsum")
    )
    buckets = _bucket_exprs(poly_hash_spark_sql("key"), d, w)
    # staged: the per-key bucket rows feed BOTH the counter aggregate
    # and the estimate join
    ex = stage(
        per_key.select(
            "key",
            "wsum",
            F.posexplode(
                F.expr("array(" + ", ".join(buckets) + ")")
            ).alias("row", "bucket"),
        )
    )
    sketch = ex.groupBy("row", "bucket").agg(
        F.sum("wsum").cast("bigint").alias("cnt")
    )
    est = (
        ex.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy("key", "wsum")
        .agg(F.min("cnt").cast("bigint").alias("est"))
    )
    # Top-k via orderBy().limit(k): Spark plans TakeOrderedAndProject —
    # a per-partition bounded heap plus a k-row merge on the driver —
    # instead of funnelling every per-key estimate through one
    # partition for a global-Window sort. The rank Window below runs
    # AFTER the limit, over <= k rows, so its single partition is
    # constant-size regardless of key cardinality.
    topk = est.orderBy(F.desc("est"), F.asc("key")).limit(k)
    win = Window.orderBy(F.desc("est"), F.asc("key"))
    return (
        topk.withColumn("rank", F.row_number().over(win).cast("bigint"))
        .select(
            F.col("key").alias("host"),
            F.col("est").alias("est_bytes"),
            F.col("wsum").alias("exact_bytes"),
            F.expr("est - wsum").cast("bigint").alias("overestimate"),
            "rank",
        )
    )


def countmin_heavy_hitters_duck(
    flows_cte: str,
    key_col: str = "ip_dst",
    weight_col: str = "bytes",
    d: int = D_ROWS,
    w: int = W_BUCKETS,
    k: int = 20,
) -> str:
    buckets = _bucket_exprs(poly_hash_duck_sql("key"), d, w)
    arr = ", ".join(buckets)
    return f"""{flows_cte},
per_key AS (
  SELECT {key_col} AS key, CAST(SUM({weight_col}) AS BIGINT) AS wsum
  FROM flows GROUP BY 1
),
ex AS (
  SELECT key, wsum, CAST(i - 1 AS BIGINT) AS row,
         CAST(([{arr}])[i] AS BIGINT) AS bucket
  FROM per_key, unnest(range(1, {d} + 1)) AS t(i)
),
sketch AS (
  SELECT row, bucket, CAST(SUM(wsum) AS BIGINT) AS cnt
  FROM ex GROUP BY 1, 2
),
est AS (
  SELECT e.key, e.wsum, CAST(MIN(s.cnt) AS BIGINT) AS est
  FROM ex e JOIN sketch s USING (row, bucket)
  GROUP BY 1, 2
)
SELECT key AS host, est AS est_bytes, wsum AS exact_bytes,
       CAST(est - wsum AS BIGINT) AS overestimate,
       CAST(ROW_NUMBER() OVER (ORDER BY est DESC, key ASC) AS BIGINT) AS rank
FROM est QUALIFY rank <= {k}
"""
