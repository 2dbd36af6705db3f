"""pmacct_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of pmacct/pmacct.

pmacct (reference: /root/reference) is a network-flow accounting suite:
ingest network telemetry, normalize to flat flow records, enrich (BGP,
GeoIP, maps), aggregate by a user-chosen set of key "primitives" over
time buckets, and deliver to sinks. This package re-expresses that whole
surface Spark-first:

- ``registry``   — the primitive universe (reference src/pmacct-defines.h:172-283)
- ``config``     — plugin/channel configuration (reference CONFIG-KEYS)
- ``pipeline``   — config -> declarative DataFrame plan (the per-plugin
                   channel of reference src/plugin_common.c)
- ``operators``  — aggregation semantics, windows/pro-rating, LPM joins,
                   pretag rules engine, preprocess (HAVING), top-N, plus
                   large-scale data-pipeline extras (dedup, similarity
                   search, text analysis)
- ``sources``    — parquet/CSV/JSON loaders, NetFlow v5/v9/IPFIX binary
                   decoders (template-stateful), Kafka (gated)
- ``sinks``      — files w/ dynamic partitioning, memory table, Kafka/JDBC
- ``streaming``  — Structured Streaming jobs (tumbling windows, watermark
                   = sql_startup_delay, sessionization)
- ``client``     — the pmacct client query surface (-s/-M/-N/-T/-S/-e/-r)

Everything is DataFrame/SQL-declarative so Catalyst can push filters,
prune columns and pick join strategies; Python UDFs appear only in the
binary-decode path (Arrow-batched via mapInPandas).
"""

from pmacct_spark.config import PluginConfig
from pmacct_spark.pipeline import build_aggregation
from pmacct_spark.registry import PRIMITIVES, Primitive

__version__ = "0.1.0"

__all__ = [
    "PRIMITIVES",
    "Primitive",
    "PluginConfig",
    "build_aggregation",
    "__version__",
]
