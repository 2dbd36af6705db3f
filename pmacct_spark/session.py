"""SparkSession factory tuned for the pmacct_spark engine.

Scale posture: these settings are what we'd ship to a 1000-executor
cluster — AQE on (runtime re-plan, skew-join splitting), partition
sizing caps, broadcast threshold for the small dimension tables the
reference uses as "maps" (networks_file, pre_tag_map, GeoIP ranges —
reference src/net_aggr.c, src/pretag.c). Locally we run local[N].
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Configs that must be honored even when the caller (e.g. the verify
# driver) hands us an already-built session.
RUNTIME_CONFS: dict[str, str] = {
    # testdata parquet writes TIMESTAMP(NANOS); Spark only reads it via
    # this legacy flag (as nanos-since-epoch LongType, converted back to
    # timestamp by sources.tables.load_table).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    # AQE: runtime shuffle-partition coalescing + skew-join splitting.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # pmacct "maps" are small dimensions — always broadcast them.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
}


def ship_package(spark: SparkSession) -> None:
    """Ship pmacct_spark to executor Python workers via ``addPyFile``.

    Any kernel that references module-level code (decoders, multimodal
    codecs) needs the package importable on the worker. On a cluster
    that's ``spark-submit --py-files``; when the session was built by an
    external driver from an arbitrary cwd, we add the packaged zip at
    runtime — once per SparkContext."""
    sc = spark.sparkContext
    if getattr(sc, "_pmacct_spark_shipped", False):
        return
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(
        tempfile.mkdtemp(prefix="pmacct_spark_pyfiles_"), "pmacct_spark.zip"
    )
    with zipfile.ZipFile(zpath, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    zf.write(full, rel)
    sc.addPyFile(zpath)
    sc._pmacct_spark_shipped = True


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Set runtime-settable confs on an externally provided session."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Static conf on a live session (e.g. timeZone is fine, some
            # are not) — keep going; the loader has per-read fallbacks.
            pass
    try:
        ship_package(spark)
    except Exception:
        # addPyFile can fail on exotic deployments; kernels that don't
        # touch module-level code still work.
        pass
    return spark


def get_spark(app_name: str = "pmacct_spark", cpus: int | None = None) -> SparkSession:
    """Create (or fetch) the engine session.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS or all local cores.
    """
    n = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{n}]")
        .config("spark.sql.shuffle.partitions", str(max(n, 8)))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return apply_runtime_confs(spark)
