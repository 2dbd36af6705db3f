"""Sessionization: packets/records -> flows/sessions.

The reference builds flows from packets with a 5-tuple hash + LRU state
table (reference src/ip_flow.c:81-230): a new flow starts when the gap
since the key's previous packet exceeds the protocol's idle lifetime
(src/ip_flow.c:72-77) or the previous packet carried TCP FIN/RST
(evaluate_tcp_flags, src/ip_flow.c:95).

Spark-first batch shape: lag() + a running sum of boundary flags over a
per-key event-time window — one shuffle on the key, ANSI-expressible, so
the DuckDB oracle replays it exactly. The streaming shape is
``session_window`` / ``applyInPandasWithState`` (streaming module);
this module is the batch semantics both are checked against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TCP_CLOSE_MASK = 5  # FIN(1) | RST(4)


def sessionize(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    gap_s: int,
    end_ts_col: str | None = None,
    tcp_flags_col: str | None = None,
    order_tiebreak: list[str] | None = None,
) -> DataFrame:
    """Assign ``session_id`` (0-based per key) to each record.

    A record opens a new session when its ``ts_col`` is more than
    ``gap_s`` seconds after the previous record's end (``end_ts_col`` or
    ``ts_col``), or when the previous record closed the flow with TCP
    FIN/RST (``tcp_flags_col``).
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (order_tiebreak or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    # exact epoch-micros gap compare (sub-second timestamps: SECOND-unit
    # datediff truncates differently across engines)
    gap_cond = (
        F.expr(
            f"unix_micros(CAST({ts_col} AS TIMESTAMP)) "
            f"- unix_micros(CAST(__prev_end AS TIMESTAMP))"
        )
        > F.lit(gap_s * 1_000_000)
    )
    out = df.withColumn("__prev_end", F.lag(end_ts_col or ts_col).over(w))
    drop = ["__prev_end", "__boundary"]
    if tcp_flags_col:
        out = out.withColumn("__prev_flags", F.lag(tcp_flags_col).over(w))
        gap_cond = gap_cond | (
            F.col("__prev_flags").bitwiseAND(TCP_CLOSE_MASK) != 0
        )
        drop.append("__prev_flags")
    boundary = F.when(F.col("__prev_end").isNull(), F.lit(1)).otherwise(
        gap_cond.cast("int")
    )
    out = out.withColumn("__boundary", boundary)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return out.withColumn("session_id", F.sum("__boundary").over(run) - 1).drop(*drop)


def session_stats(
    sessions: DataFrame,
    keys: list[str],
    ts_col: str,
    end_ts_col: str | None = None,
    counters: list[str] = ("bytes", "packets"),
) -> DataFrame:
    """Collapse sessionized records into one row per session: start/end
    timestamps, record count, summed counters — the flow record the
    reference's ip_flow table would emit."""
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(end_ts_col or ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_records"),
    ]
    for c in counters:
        if c in sessions.columns:
            aggs.append(F.sum(c).cast("bigint").alias(c))
    return sessions.groupBy(*keys, "session_id").agg(*aggs)


def sessionize_duck(
    source_sql: str,
    keys: list[str],
    ts_col: str,
    gap_s: int,
    end_ts_col: str | None = None,
    tcp_flags_col: str | None = None,
    order_tiebreak: list[str] | None = None,
) -> str:
    """DuckDB CTE chain replaying :func:`sessionize` (emits every source
    column plus ``session_id``)."""
    pk = ", ".join(keys)
    order = ", ".join([ts_col] + (order_tiebreak or []))
    end = end_ts_col or ts_col
    close = (
        f" OR (prev_flags & {TCP_CLOSE_MASK}) <> 0" if tcp_flags_col else ""
    )
    prev_flags = (
        f", LAG({tcp_flags_col}) OVER (PARTITION BY {pk} ORDER BY {order}) AS prev_flags"
        if tcp_flags_col
        else ""
    )
    return f"""
WITH __src AS ({source_sql}),
__lagged AS (
  SELECT *,
         LAG({end}) OVER (PARTITION BY {pk} ORDER BY {order}) AS prev_end
         {prev_flags}
  FROM __src
),
__flagged AS (
  SELECT *,
         CASE WHEN prev_end IS NULL THEN 1
              WHEN (epoch_us({ts_col}) - epoch_us(prev_end))
                   > {gap_s * 1_000_000}{close} THEN 1
              ELSE 0 END AS boundary
  FROM __lagged
),
__sess AS (
  SELECT *,
         CAST(SUM(boundary) OVER (PARTITION BY {pk} ORDER BY {order}
             ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
  FROM __flagged
)
"""
