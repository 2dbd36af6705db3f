"""Time-bucket (history) semantics: tumbling windows, calendar months,
round-off, multi-window explosion, pro-rating.

Reference semantics:
  - ``sql_history/print_history/kafka_history = N [s|m|h|d|w|M]`` buckets
    records into tumbling windows (parse_time, reference
    src/cfg_handlers.c:6733-6791; bucket assign src/plugin_common.c:251-254).
  - round-off aligns the bucket origin to a min/hour/day/week/month
    boundary (roundoff_time, reference src/sql_common.c:242-308).
  - a flow spanning several buckets can be *pro-rated*: its counters are
    split across the buckets proportional to overlap (reference
    src/plugin_common.c:256-271 and the bucket loop :460-463).

Everything here is exact integer arithmetic on epoch microseconds so a
SQL oracle reproduces it bit-for-bit; all expressions are built-in
(JVM-side, codegen-friendly) — no Python UDFs.

The bucket column is named ``stamp_inserted`` after the reference's SQL
schema (sql/pmacct-create-db_v9.mysql).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pmacct_spark.config import History

_CAL_TRUNC = {"M": "month", "w": "week", "d": "day", "h": "hour", "m": "minute"}


def _us(ts_expr: str) -> str:
    """Epoch microseconds of a TIMESTAMP_NTZ column (UTC session)."""
    return f"unix_micros(CAST({ts_expr} AS TIMESTAMP))"


def bucket_expr(
    ts_col: str,
    hist: History,
    roundoff: str | None = None,
    offset: int = 0,
) -> Column:
    """Tumbling-bucket start for ``ts_col`` as TIMESTAMP_NTZ.

    Calendar histories (months) truncate; linear histories floor epoch
    time, optionally re-anchored at a calendar boundary (round-off).

    ``offset`` (sql_history_offset family, CONFIG-KEYS:1413) shifts
    the bucket origin by N seconds: the reference rewinds basetime by
    ``timeslot + offset`` after round-off (src/plugin_common.c:959-966)
    so boundaries land at ``k*timeslot - offset`` — a 30m history with
    offset 900 bins at 10:15, 10:45, ... It must be < the timeslot
    (the reference exits otherwise, :961) and has no meaning for
    calendar months (no fixed timeslot to offset within)."""
    if hist.calendar:
        if hist.n != 1:
            raise ValueError("calendar buckets support N=1 (e.g. '1M') only")
        if offset:
            raise ValueError(
                "history_offset is not supported with calendar months"
            )
        return F.expr(f"CAST(date_trunc('month', {ts_col}) AS TIMESTAMP_NTZ)")
    n_us = hist.seconds * 1_000_000
    off_us = int(offset) * 1_000_000
    if off_us < 0 or off_us >= n_us:
        raise ValueError(
            "History offset (ie. sql_history_offset) must be >= 0 and "
            "< history (ie. sql_history)"
        )
    if roundoff:
        trunc = _CAL_TRUNC[roundoff]
        origin = f"unix_micros(CAST(date_trunc('{trunc}', {ts_col}) AS TIMESTAMP))"
        e = (
            f"CAST(timestamp_micros({origin} + "
            f"((({_us(ts_col)}) - ({origin}) + {off_us}) DIV {n_us}) * {n_us}"
            f" - {off_us}) AS TIMESTAMP_NTZ)"
        )
    else:
        e = (
            f"CAST(timestamp_micros(((({_us(ts_col)}) + {off_us}) DIV {n_us})"
            f" * {n_us} - {off_us}) AS TIMESTAMP_NTZ)"
        )
    return F.expr(e)


def assign_bucket(
    df: DataFrame,
    hist: History,
    ts_col: str = "ts",
    roundoff: str | None = None,
    out: str = "stamp_inserted",
    offset: int = 0,
) -> DataFrame:
    """Add the tumbling-bucket column (flow accounted to its start bucket)."""
    return df.withColumn(out, bucket_expr(ts_col, hist, roundoff, offset))


def explode_prorate(
    df: DataFrame,
    hist: History,
    counters: list[str],
    ts_col: str = "ts",
    end_col: str = "end_ts",
    roundoff: str | None = None,
    out: str = "stamp_inserted",
    offset: int = 0,
) -> DataFrame:
    """Pro-rating: explode each flow into one row per spanned bucket and
    split its counters proportional to overlap.

    The split is exact integer math: ``counter * overlap_us DIV
    duration_us`` (floor), zero-duration flows land whole in their start
    bucket — deterministic and oracle-reproducible. Spark shape:
    ``sequence()`` + ``explode()`` (no shuffle; the later groupBy
    re-shuffles on (bucket, keys) anyway).

    Calendar months (``1M``, reference src/plugin_common.c:256-271 with
    ``sql_history: 1M``): buckets have no fixed width, so the step is
    ``INTERVAL 1 MONTH`` and each bucket's width is computed as
    ``next_month_start - bucket_start`` in epoch microseconds — the
    overlap weights are month-length-exact (28/29/30/31 days) by
    construction.
    """
    start_bucket = bucket_expr(ts_col, hist, roundoff, offset)
    end_bucket = bucket_expr(end_col, hist, roundoff, offset)
    if hist.calendar:
        step = F.expr("INTERVAL 1 MONTH")
        bucket_end_us = f"unix_micros(CAST({out} + INTERVAL 1 MONTH AS TIMESTAMP))"
    else:
        n_us = hist.seconds * 1_000_000
        step = F.expr(f"INTERVAL {hist.seconds} SECOND")
        bucket_end_us = f"({_us(out)} + {n_us})"
    df = df.withColumn(
        out,
        F.explode(
            F.sequence(
                start_bucket.cast("timestamp"), end_bucket.cast("timestamp"), step
            )
        ),
    ).withColumn(out, F.col(out).cast("timestamp_ntz"))

    w_us = _us(out)
    ts_us, end_us = _us(ts_col), _us(end_col)
    overlap = (
        f"(LEAST({end_us}, {bucket_end_us}) - GREATEST({ts_us}, {w_us}))"
    )
    duration = f"({end_us} - {ts_us})"
    for c in counters:
        df = df.withColumn(
            c,
            F.expr(
                f"CASE WHEN {duration} = 0 THEN {c} "
                f"ELSE ({c} * {overlap}) DIV {duration} END"
            ),
        )
    return df


# ---------------------------------------------------------------------------
# DuckDB oracle renderers (kept adjacent so drift is caught by tests)
# ---------------------------------------------------------------------------

def duck_bucket_sql(
    ts_expr: str,
    hist: History,
    roundoff: str | None = None,
    offset: int = 0,
) -> str:
    """DuckDB expression matching :func:`bucket_expr`."""
    if hist.calendar:
        return f"date_trunc('month', {ts_expr})"
    n_us = hist.seconds * 1_000_000
    off_us = int(offset) * 1_000_000
    if roundoff:
        trunc = _CAL_TRUNC[roundoff]
        origin = f"epoch_us(date_trunc('{trunc}', {ts_expr}))"
        return (
            f"make_timestamp({origin} + "
            f"(((epoch_us({ts_expr})) - ({origin}) + {off_us}) // {n_us})"
            f" * {n_us} - {off_us})"
        )
    return (
        f"make_timestamp((((epoch_us({ts_expr})) + {off_us}) // {n_us})"
        f" * {n_us} - {off_us})"
    )


def duck_prorate_cte(
    hist: History,
    counters: list[str],
    key_exprs: str,
    source: str = "flows",
    ts_expr: str = "ts",
    end_expr: str = "end_ts",
) -> str:
    """DuckDB subquery matching :func:`explode_prorate`: per spanned
    bucket, pro-rated counters. ``key_exprs`` is the passthrough select
    list."""
    b0 = duck_bucket_sql(ts_expr, hist)
    b1 = duck_bucket_sql(end_expr, hist)
    if hist.calendar:
        step = "INTERVAL 1 MONTH"
        bucket_end_us = "epoch_us(stamp_inserted + INTERVAL 1 MONTH)"
    else:
        n_us = hist.seconds * 1_000_000
        step = f"INTERVAL {hist.seconds} SECOND"
        bucket_end_us = f"(epoch_us(stamp_inserted) + {n_us})"
    overlap = (
        f"(LEAST(epoch_us({end_expr}), {bucket_end_us}) "
        f"- GREATEST(epoch_us({ts_expr}), epoch_us(stamp_inserted)))"
    )
    duration = f"(epoch_us({end_expr}) - epoch_us({ts_expr}))"
    ctr_sql = ", ".join(
        f"CASE WHEN {duration} = 0 THEN {c} "
        f"ELSE ({c} * {overlap}) // {duration} END AS {c}"
        for c in counters
    )
    select = f"{key_exprs}, stamp_inserted"
    if ctr_sql:
        select += f", {ctr_sql}"
    return (
        f"SELECT {select} FROM ("
        f"SELECT *, unnest(generate_series({b0}, {b1}, "
        f"{step})) AS stamp_inserted FROM {source})"
    )


def sliding_buckets(
    df: DataFrame,
    duration_s: int,
    slide_s: int,
    ts_col: str = "ts",
    out: str = "window_start",
) -> DataFrame:
    """Sliding (hopping) windows: each record lands in
    ``duration_s/slide_s`` overlapping buckets (beyond the reference —
    pmacct has tumbling history buckets only, SURVEY.md §2.6).

    Implemented as an explicit explode over the k window offsets so the
    same code runs batch and streaming and the oracle can replay it;
    equivalent to ``F.window(ts, duration, slide)``. Map-side only — no
    shuffle until the caller aggregates on (window_start, keys).
    """
    if duration_s % slide_s:
        raise ValueError("duration must be a multiple of slide")
    m = duration_s // slide_s
    slide_us = slide_s * 1_000_000
    return df.withColumn(
        "_k", F.explode(F.sequence(F.lit(0), F.lit(m - 1)))
    ).withColumn(
        out,
        F.expr(
            f"CAST(timestamp_micros((({_us(ts_col)}) DIV {slide_us}) "
            f"* {slide_us} - _k * {slide_us}L) AS TIMESTAMP_NTZ)"
        ),
    ).drop("_k")


def duck_sliding_cte(
    duration_s: int,
    slide_s: int,
    source: str = "events",
    ts_expr: str = "ts",
    out: str = "window_start",
) -> str:
    """DuckDB subquery matching :func:`sliding_buckets`."""
    m = duration_s // slide_s
    slide_us = slide_s * 1_000_000
    ws = (
        f"make_timestamp(((epoch_us({ts_expr})) // {slide_us}) * {slide_us} "
        f"- k * {slide_us})"
    )
    return (
        f"SELECT *, {ws} AS {out} FROM {source}, "
        f"unnest(generate_series(0, {m - 1})) AS _t(k)"
    )
