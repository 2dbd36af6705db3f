"""SQL-sink upsert semantics: the reference's UPDATE-then-INSERT purge
with stamp_inserted/stamp_updated bookkeeping (reference
src/sql_common.c:606,680-765; schema shape sql/pmacct-create-db_v9.mysql).

Re-expressed engine-side as a MERGE: the target table is any
DataFrame-backed store (parquet dir locally; Delta/Iceberg/JDBC MERGE
on a cluster — same plan shape). pmacct's semantics:

  - key = the aggregate primitives + stamp_inserted (the time bucket);
  - on match: counters are ADDED to the stored row (the purge carries
    partial sums; SQL does ``SET bytes=bytes+%lu``), stamp_updated set
    to the purge time;
  - on miss: INSERT with stamp_inserted = bucket, stamp_updated = purge
    time;
  - ``sql_dont_try_update``: blind INSERT (append) — dynamic tables.

The merge is one outer-shuffle join on the key — at scale this is the
same cost as the aggregation shuffle that produced the batch, and a
sorted/bucketed target store makes it co-located.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame | None,
    batch: DataFrame,
    keys: list[str],
    counters: list[str],
    stamp_updated: str,
) -> DataFrame:
    """Return the post-purge table state: target merged with batch.

    ``target`` None == empty table (first purge). ``stamp_updated`` is
    the purge wall-clock rendered as a literal timestamp string so runs
    are reproducible (the reference uses now()).
    """
    upd = F.lit(stamp_updated).cast("timestamp_ntz")
    if target is None:
        return batch.withColumn("stamp_updated", upd)

    t = target.alias("t")
    b = batch.alias("b")
    cond = None
    for k in keys:
        c = F.col(f"t.{k}").eqNullSafe(F.col(f"b.{k}"))
        cond = c if cond is None else cond & c
    joined = t.join(b, cond, "full_outer")

    out_cols = []
    for k in keys:
        out_cols.append(F.coalesce(F.col(f"t.{k}"), F.col(f"b.{k}")).alias(k))
    for c in counters:
        out_cols.append(
            (
                F.coalesce(F.col(f"t.{c}"), F.lit(0))
                + F.coalesce(F.col(f"b.{c}"), F.lit(0))
            ).alias(c)
        )
    # rows touched by this batch get the new stamp_updated
    touched = F.col(f"b.{keys[0]}").isNotNull()
    for k in keys[1:]:
        touched = touched | F.col(f"b.{k}").isNotNull()
    out_cols.append(
        F.when(touched, upd).otherwise(F.col("t.stamp_updated")).alias("stamp_updated")
    )
    passthrough = [
        c
        for c in target.columns
        if c not in keys and c not in counters and c != "stamp_updated"
    ]
    for c in passthrough:
        out_cols.append(F.coalesce(F.col(f"t.{c}"), F.col(f"b.{c}")).alias(c))
    return joined.select(*out_cols)


class ParquetUpsertTable:
    """A parquet-backed upsert target: the local stand-in for a JDBC /
    Delta MERGE sink, with the reference's purge semantics."""

    def __init__(self, spark, path: str, keys: list[str], counters: list[str]):
        self.spark = spark
        self.path = path
        self.keys = keys
        self.counters = counters
        self._exists = False

    def read(self) -> DataFrame | None:
        if not self._exists:
            return None
        return self.spark.read.parquet(self.path)

    def purge(self, batch: DataFrame, stamp_updated: str, append_only: bool = False):
        """One plugin purge cycle (sql_cache_purge). ``append_only`` is
        sql_dont_try_update."""
        if append_only:
            batch.withColumn(
                "stamp_updated", F.lit(stamp_updated).cast("timestamp_ntz")
            ).write.mode("append").parquet(self.path)
            self._exists = True
            return
        merged = merge_upsert(
            self.read(), batch, self.keys, self.counters, stamp_updated
        )
        # materialize before overwrite (can't overwrite what we read)
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(self.path)
        self._exists = True
