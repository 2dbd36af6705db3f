"""Batch parquet loaders for the driver testdata tables.

The testdata parquet files store timestamps as TIMESTAMP(NANOS), which
Spark's vectorized parquet reader rejects unless
``spark.sql.legacy.parquet.nanosAsLong=true`` — under that flag the
column arrives as LongType nanoseconds-since-epoch. ``load_table``
normalizes those columns back to TIMESTAMP_NTZ (the source data is
micro-precision, so ``DIV 1000`` is lossless), giving every downstream
operator a uniform naive-UTC timestamp — the same thing DuckDB sees,
which keeps the oracle comparison exact.

Detection uses the parquet footer via pyarrow (driver-side, no data
read), so the conversion is schema-driven, not name-driven.
"""

from __future__ import annotations

import functools
import os

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@functools.lru_cache(maxsize=256)
def nano_ts_fields(path: str) -> tuple[str, ...]:
    """Names of TIMESTAMP(NANOS) columns, from the parquet footer."""
    schema = pq.read_schema(path)
    out = []
    for field in schema:
        t = field.type
        if str(t).startswith("timestamp[ns"):
            out.append(field.name)
    return tuple(out)


_nano_ts_fields = nano_ts_fields  # back-compat alias


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table with timestamps normalized to TIMESTAMP_NTZ."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    df = spark.read.parquet(path)
    for col in _nano_ts_fields(path):
        df = df.withColumn(
            col, F.expr(f"CAST(timestamp_micros(`{col}` DIV 1000) AS TIMESTAMP_NTZ)")
        )
    # Micro-precision timestamps read as TIMESTAMP (LTZ) under UTC —
    # normalize to NTZ so all tables agree.
    for col, dtype in df.dtypes:
        if dtype == "timestamp":
            df = df.withColumn(col, F.col(col).cast("timestamp_ntz"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view."""
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
