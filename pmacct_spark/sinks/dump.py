"""Periodic RIB table dump — the reference's bgp_table_dump_file /
bmp_dump_file machinery (src/bgp/bgp_logdump.c bgp_peer_dump_init /
bgp_peer_dump_close, config keys bgp_table_dump_refresh_time,
bmp_dump_time_slots; exercised by its tests/203-BMP-dump and
207/304 dump-spreading families).

The reference walks each peer's RIB on a timer and writes one JSON
event stream per dump: a ``dump_init`` record per peer, one ``dump``
record per route (sequenced), and a ``dump_close`` record carrying
the per-peer entry count. "Dump spreading" staggers peers across the
refresh interval so a large RIB doesn't stall the collector at the
tick (time slots, each peer hashed to one).

Spark-first: the whole dump is ONE DataFrame — event rows derived
from the RIB with window functions (seq = row_number per peer,
entries = count per peer), unioned with init/close rows, written as
JSON lines partitioned by (slot, exporter, peer). No driver-side
loop over peers; a 1000-executor cluster writes all peers' dumps in
parallel, and the slot partition column IS the spreading schedule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PEER_KEY = ["exporter_ip", "peer_ip"]


def rib_dump_events(
    rib: DataFrame,
    dump_ts: int,
    refresh_secs: int = 60,
    time_slots: int = 1,
) -> DataFrame:
    """Render current RIB state (rib_state output) into the dump event
    stream. Columns: event_type (dump_init|dump|dump_close), seq,
    entries (close rows), dump_slot, scheduled_at, the peer key, and
    the route attributes (null on init/close rows).

    ``time_slots`` > 1 spreads peers across the refresh interval: a
    peer's slot is a stable hash of its key, and ``scheduled_at`` =
    dump_ts + slot * (refresh_secs / time_slots) — the reference's
    bmp_dump_time_slots semantics."""
    if time_slots < 1:
        raise ValueError("time_slots must be >= 1")
    slot = (
        F.pmod(F.xxhash64(*[F.col(c) for c in _PEER_KEY]), F.lit(time_slots))
        .cast("int")
        .alias("dump_slot")
    )
    sched = (
        F.lit(dump_ts)
        + F.col("dump_slot") * F.lit(refresh_secs // max(time_slots, 1))
    ).cast("bigint")

    # order on every route-identity column present so seq is
    # reproducible for v6 rows (prefix null) and multi-RD tables
    order_cols = [c for c in ("prefix", "prefix6", "masklen", "rd")
                  if c in rib.columns]
    w = Window.partitionBy(*_PEER_KEY).orderBy(
        *[F.asc_nulls_last(c) for c in order_cols]
    )
    routes = (
        rib.withColumn("event_type", F.lit("dump"))
        .withColumn("seq", F.row_number().over(w).cast("bigint"))
        .withColumn("entries", F.lit(None).cast("bigint"))
    )
    per_peer = rib.groupBy(*_PEER_KEY).agg(
        F.count(F.lit(1)).alias("__n")
    )
    attr_cols = [c for c in routes.columns
                 if c not in {"event_type", "seq", "entries",
                              "exporter_ip", "peer_ip"}]
    nulls = [
        F.lit(None).cast(dict(routes.dtypes)[c]).alias(c) for c in attr_cols
    ]
    inits = per_peer.select(
        "exporter_ip", "peer_ip",
        F.lit("dump_init").alias("event_type"),
        F.lit(0).cast("bigint").alias("seq"),
        F.lit(None).cast("bigint").alias("entries"),
        *nulls,
    )
    closes = per_peer.select(
        "exporter_ip", "peer_ip",
        F.lit("dump_close").alias("event_type"),
        (F.col("__n") + 1).cast("bigint").alias("seq"),
        F.col("__n").cast("bigint").alias("entries"),
        *nulls,
    )
    cols = ["exporter_ip", "peer_ip", "event_type", "seq", "entries",
            *attr_cols]
    events = (
        inits.select(cols)
        .unionByName(routes.select(cols))
        .unionByName(closes.select(cols))
    )
    return (
        events.withColumn("dump_slot", slot)
        .withColumn("scheduled_at", sched)
        .withColumn("dump_ts", F.lit(dump_ts).cast("bigint"))
    )


def write_rib_dump(
    rib: DataFrame,
    path: str,
    dump_ts: int,
    refresh_secs: int = 60,
    time_slots: int = 1,
    mode: str = "overwrite",
) -> None:
    """Write one dump as JSON lines partitioned by (dump_slot,
    exporter_ip, peer_ip) — the cluster-scalable form of the
    reference's per-peer dynamic filenames (cf. sinks/files.py)."""
    events = rib_dump_events(rib, dump_ts, refresh_secs, time_slots)
    (
        events.repartition("dump_slot", *_PEER_KEY)
        .sortWithinPartitions("seq")
        .write.mode(mode)
        .partitionBy("dump_slot", "exporter_ip", "peer_ip")
        .json(path)
    )


# RFC 7854 §4.8 counter vocabulary (reference bmp_stats_cnt_types,
# src/bmp/bmp.h:222-241 — typos 'Abj' included verbatim so renderings
# compare equal)
BMP_STATS_CNT_TYPES = [
    "Number of prefixes rejected by inbound policy",
    "Number of (known) duplicate prefix advertisements",
    "Number of (known) duplicate withdraws",
    "Number of updates invalidated due to CLUSTER_LIST loop",
    "Number of updates invalidated due to AS_PATH loop",
    "Number of updates invalidated due to ORIGINATOR_ID",
    "Number of updates invalidated due to AS_CONFED loop",
    "Number of routes in Adj-RIBs-In",
    "Number of routes in Loc-RIB",
    "Number of routes in per-AFI/SAFI Abj-RIB-In",
    "Number of routes in per-AFI/SAFI Loc-RIB",
    "Number of updates subjected to treat-as-withdraw",
    "Number of prefixes subjected to treat-as-withdraw",
    "Number of duplicate update messages received",
    "Number of routes in Adj-RIBs-Out Pre-Policy",
    "Number of routes in Adj-RIBs-Out Post-Policy",
    "Number of routes in per-AFI/SAFI Abj-RIB-Out Pre-Policy",
    "Number of routes in per-AFI/SAFI Abj-RIB-Out Post-Policy",
]


def bmp_stats_dump_events(
    events: DataFrame,
    dump_ts: int,
    refresh_secs: int = 60,
    time_slots: int = 1,
) -> DataFrame:
    """BMP Stats Reports (Type 1) rendered as dump records —
    bmp_dump's cached-stats path (bmp_dump_se_ll_append,
    src/bmp/bmp_msg.c:1124; record fields counter_type /
    counter_type_str / counter_value per bmp_log_msg_stats,
    src/bmp/bmp_logdump.c:377-445). Skipped entirely when
    ``bmp_dump_exclude_stats: true`` (CONFIG-KEYS:3217 — stats export
    once in real time via msglog but are not cached for the dump)."""
    st = events.filter(
        (F.col("msg_type") == 1) & F.col("stat_type").isNotNull()
    )
    name_cases = " ".join(
        f"WHEN {i} THEN '{n}'" for i, n in enumerate(BMP_STATS_CNT_TYPES)
    )
    slot = (
        F.pmod(F.xxhash64(*[F.col(c) for c in _PEER_KEY]), F.lit(time_slots))
        .cast("int")
        .alias("dump_slot")
    )
    w = Window.partitionBy(*_PEER_KEY).orderBy("seq")
    out = st.select(
        "exporter_ip", "peer_ip",
        F.lit("dump").alias("event_type"),
        F.lit("stats").alias("bmp_msg_type"),
        F.row_number().over(w).cast("bigint").alias("seq"),
        F.col("stat_type").cast("int").alias("counter_type"),
        F.expr(
            f"CASE CAST(stat_type AS INT) {name_cases} "
            "ELSE 'Unknown' END"
        ).alias("counter_type_str"),
        F.col("stat_value").cast("bigint").alias("counter_value"),
    ).withColumn("dump_slot", slot)
    sched = (
        F.lit(dump_ts)
        + F.col("dump_slot") * F.lit(refresh_secs // max(time_slots, 1))
    ).cast("bigint")
    return out.withColumn("scheduled_at", sched).withColumn(
        "dump_ts", F.lit(dump_ts).cast("bigint")
    )


def write_bmp_stats_dump(
    events: DataFrame,
    path: str,
    dump_ts: int,
    refresh_secs: int = 60,
    time_slots: int = 1,
) -> None:
    """Append the stats dump records into the same partition layout as
    :func:`write_rib_dump` (per-peer JSON line files coexist with the
    route stream, like the reference's interleaved dump lines)."""
    ev = bmp_stats_dump_events(events, dump_ts, refresh_secs, time_slots)
    (
        ev.repartition("dump_slot", *_PEER_KEY)
        .sortWithinPartitions("seq")
        .write.mode("append")
        .partitionBy("dump_slot", "exporter_ip", "peer_ip")
        .json(path)
    )
