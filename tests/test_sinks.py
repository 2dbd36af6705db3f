"""Sink semantics: dynamic-name partitioning, upsert purge cycles with
stamp bookkeeping, Kafka frame shaping, tee routing."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from pmacct_spark.config import PluginConfig
from pmacct_spark.driver_queries import flows
from pmacct_spark.pipeline import build_aggregation
from pmacct_spark.sinks.files import write_print
from pmacct_spark.sinks.kafka import kafka_frame
from pmacct_spark.sinks.tee import TeeReceiver, route
from pmacct_spark.sinks.upsert import ParquetUpsertTable
from tests.conftest import SF_DIR


def _agg(spark, history=None):
    cfg = PluginConfig(aggregate=["src_as", "dst_as"], history=history)
    return build_aggregation(flows(spark, SF_DIR), cfg)


def test_write_print_csv_dynamic_names(spark, tmp_path):
    agg = _agg(spark, history="1d")
    out = str(tmp_path / "csv")
    write_print(agg, out, fmt="csv", name_spec="flows-%Y%m%d")
    # one directory level per strftime token (y, m, d)
    assert any(p.startswith("y=") for p in os.listdir(out))
    back = spark.read.option("header", "true").csv(out)
    assert int(back.count()) == agg.count()


def test_write_print_json_roundtrip(spark, tmp_path):
    agg = _agg(spark)
    out = str(tmp_path / "json")
    write_print(agg, out, fmt="json")
    back = spark.read.json(out)
    assert back.count() == agg.count()
    assert back.agg(F.sum("bytes")).first()[0] == agg.agg(F.sum("bytes")).first()[0]


def test_upsert_purge_cycles(spark, tmp_path):
    """Two purges of the same aggregates must double counters (SQL sink
    adds on match: SET bytes=bytes+N) and refresh stamp_updated."""
    agg = _agg(spark).localCheckpoint(eager=True)
    n = agg.count()
    assert n > 0
    t = ParquetUpsertTable(
        spark, str(tmp_path / "t"), ["src_as", "dst_as"], ["bytes", "packets", "flows"]
    )
    t.purge(agg, "2024-02-01 00:00:00")
    first = t.read().localCheckpoint(eager=True)
    assert first.count() == n
    t.purge(agg, "2024-02-01 00:05:00")
    second = t.read()
    assert second.count() == n
    j = first.select("src_as", "dst_as", F.col("bytes").alias("b1")).join(
        second.select("src_as", "dst_as", "bytes", "stamp_updated"),
        ["src_as", "dst_as"],
    )
    assert j.filter(F.col("bytes") != 2 * F.col("b1")).count() == 0
    assert (
        j.filter(F.col("stamp_updated") != F.lit("2024-02-01 00:05:00").cast("timestamp_ntz")).count()
        == 0
    )


def test_upsert_append_only(spark, tmp_path):
    agg = _agg(spark).localCheckpoint(eager=True)
    n = agg.count()
    t = ParquetUpsertTable(
        spark, str(tmp_path / "t2"), ["src_as", "dst_as"], ["bytes", "packets", "flows"]
    )
    t.purge(agg, "2024-02-01 00:00:00", append_only=True)
    t.purge(agg, "2024-02-01 00:05:00", append_only=True)
    assert t.read().count() == 2 * n  # sql_dont_try_update: blind INSERT


def test_kafka_frame_shape(spark):
    agg = _agg(spark).limit(10)
    fr = kafka_frame(agg, "daisy.flow", key_cols=["src_as"], rr_topics=3)
    rows = fr.collect()
    assert set(fr.columns) == {"key", "value", "topic"}
    payload = json.loads(rows[0]["value"])
    assert {"src_as", "dst_as", "bytes", "packets", "flows"} <= set(payload)
    assert all(r["topic"].startswith("daisy.flow_") for r in rows)
    assert {r["topic"] for r in rows} <= {f"daisy.flow_{i}" for i in range(3)}


def test_tee_routing(spark):
    fl = flows(spark, SF_DIR).withColumn(
        "tag", (F.col("as_src") % 3).cast("int")
    )
    recv = [
        TeeReceiver("all"),
        TeeReceiver("tagged", tags=[1, 2]),
        TeeReceiver("pooled", tags=[1], pool=["h1:2055", "h2:2055"], balance="rr"),
    ]
    parts = route(fl, recv)
    total = fl.count()
    assert parts["all"].count() == total
    assert parts["tagged"].count() == fl.filter("tag IN (1,2)").count() < total
    pooled = parts["pooled"]
    per_ep = {r["endpoint"]: r["n"] for r in pooled.groupBy("endpoint").agg(F.count("*").alias("n")).collect()}
    assert set(per_ep) == {"h1:2055", "h2:2055"}


def test_nfprobe_v5_roundtrip(spark):
    """encode_v5 -> decode_v5 is lossless for the v5 field set."""
    from pmacct_spark.sinks.nfprobe import encode_v5
    from pmacct_spark.streaming.decode import decode_v5

    fl = (
        flows(spark, SF_DIR)
        .selectExpr(
            "ip_src_i", "ip_dst_i", "iface_in", "iface_out", "packets",
            "bytes", "unix_micros(CAST(ts AS TIMESTAMP)) DIV 1000 AS ts_ms",
            "unix_micros(CAST(end_ts AS TIMESTAMP)) DIV 1000 AS end_ts_ms",
            "port_src", "port_dst", "tcp_flags", "ip_proto", "tos",
            "as_src", "as_dst",
        )
        .limit(100)
        .coalesce(1)
        .localCheckpoint(eager=True)
    )
    dgrams = encode_v5(fl).localCheckpoint(eager=True)
    n_dg = dgrams.count()
    assert n_dg == 4  # 100 rows / 30 per datagram
    back = decode_v5(dgrams.select("exporter_ip", "payload"))
    a = fl.agg(
        F.sum("bytes"), F.sum("packets"), F.sum("ts_ms"), F.sum("end_ts_ms"),
        F.sum("ip_src_i"), F.sum("port_src"),
    ).first()
    b = back.agg(
        F.sum("bytes"), F.sum("packets"), F.sum("ts_ms"), F.sum("end_ts_ms"),
        F.sum("ip_src_i"), F.sum("port_src"),
    ).first()
    assert tuple(a) == tuple(b)
    assert back.count() == 100


def test_sfprobe_roundtrip(spark):
    """encode_sflow5 -> decode_sflow5 round-trips the 5-tuple and
    counters (bytes become the sampled frame length)."""
    from pmacct_spark.sinks.sfprobe import encode_sflow5
    from pmacct_spark.streaming.decode import decode_sflow5

    fl = (
        flows(spark, SF_DIR)
        .filter("ip_proto IN (6, 17)")
        .select(
            "ip_src_i", "ip_dst_i", "port_src", "port_dst", "ip_proto",
            "tos", "tcp_flags", "bytes", "iface_in", "iface_out",
        )
        .limit(25)
        .coalesce(1)
        .localCheckpoint(eager=True)
    )
    dg = encode_sflow5(fl, sampling_rate=64).localCheckpoint(eager=True)
    assert dg.count() == 3  # 25 samples / 10 per datagram
    back = decode_sflow5(dg.select("exporter_ip", "payload"))
    assert back.count() == 25
    a = fl.agg(F.sum("bytes"), F.sum("ip_src_i"), F.sum("port_dst"), F.sum("tcp_flags")).first()
    b = back.agg(F.sum("bytes"), F.sum("ip_src_i"), F.sum("port_dst"), F.sum("tcp_flags")).first()
    assert tuple(a) == tuple(b)
    assert back.filter("sampling_rate <> 64").count() == 0


def test_foreachbatch_hooks(spark, tmp_path):
    """custom_writer + trigger_exec fire per micro-batch purge with the
    batch's environment (sql_trigger_exec semantics)."""
    from pmacct_spark.sinks.hooks import custom_writer, trigger_exec
    from pmacct_spark.streaming.jobs import flows_stream, stream_aggregation

    out_dir = tmp_path / "purged"
    out_dir.mkdir()
    marker = tmp_path / "trigger.log"

    def write_fn(batch, batch_id):
        batch.write.mode("overwrite").json(str(out_dir / f"b{batch_id}"))

    hook = custom_writer(
        write_fn,
        then=trigger_exec(
            ["sh", "-c", f'echo "purge $BATCH_ID rows=$N_ROWS" >> {marker}'],
            env_from_batch=lambda b, i: {"N_ROWS": str(b.count())},
        ),
    )
    cfg = PluginConfig(aggregate=["src_as"], history="1d")
    stream = stream_aggregation(flows_stream(spark, str(SF_DIR)), cfg)
    q = (
        stream.writeStream.outputMode("complete")
        .foreachBatch(hook)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    written = spark.read.json(str(out_dir / "b0"))
    assert written.count() > 0
    log = marker.read_text()
    assert "purge 0 rows=" in log


# ---------------------------------------------------------------------------
# AMQP frame shaping (reference src/amqp_plugin.c cache->purge; the
# RabbitMQ twin of the Kafka frame contract)
# ---------------------------------------------------------------------------

def test_amqp_frame_shape(spark):
    import json

    from pmacct_spark.sinks.amqp import amqp_frame

    agg = spark.createDataFrame(
        [("10.0.0.1", 6, 1000, 10), ("10.0.0.2", 17, 2000, 20)],
        "ip_src string, proto int, bytes long, packets long",
    )
    rows = amqp_frame(
        agg, exchange="pmacct", routing_key="acct", persistent=True
    ).collect()
    assert {r.exchange for r in rows} == {"pmacct"}
    assert {r.exchange_type for r in rows} == {"direct"}
    assert {r.routing_key for r in rows} == {"acct"}
    assert {r.delivery_mode for r in rows} == {2}
    assert {r.content_type for r in rows} == {"application/json"}
    bodies = sorted(
        (json.loads(r.body) for r in rows), key=lambda d: d["ip_src"]
    )
    assert bodies[0] == {"ip_src": "10.0.0.1", "proto": 6, "bytes": 1000, "packets": 10}


def test_amqp_routing_key_modes(spark):
    from pmacct_spark.sinks.amqp import amqp_frame

    agg = spark.createDataFrame(
        [("a", i) for i in range(40)], "grp string, v int"
    ).withColumn("rk_col", (F.col("v") % 3).cast("string"))

    dyn = amqp_frame(agg, "ex", "unused", routing_key_col="rk_col").collect()
    assert {r.routing_key for r in dyn} == {"0", "1", "2"}

    rr = amqp_frame(agg.drop("rk_col"), "ex", "acct", rr=4).collect()
    keys = {r.routing_key for r in rr}
    assert keys <= {f"acct_{i}" for i in range(4)} and len(keys) > 1
    assert {r.delivery_mode for r in rr} == {1}

    # determinism: same rows -> same round-robin assignment
    rr2 = amqp_frame(agg.drop("rk_col"), "ex", "acct", rr=4).collect()
    assert sorted((r.body, r.routing_key) for r in rr) == sorted(
        (r.body, r.routing_key) for r in rr2
    )


# ---------------------------------------------------------------------------
# ZMQ frame shaping (reference src/zmq_common.c: 1-byte topic pub/sub +
# plugin-pipe buffer batching docs/INTERNALS:96-125)
# ---------------------------------------------------------------------------

def test_zmq_frame_shape(spark):
    import json

    from pmacct_spark.sinks.zmq import zmq_frame

    agg = spark.createDataFrame(
        [("10.0.0.1", 1000), ("10.0.0.2", 2000)], "ip_src string, bytes long"
    )
    rows = zmq_frame(agg, topic=7).collect()
    assert {r.topic for r in rows} == {7}
    got = sorted(json.loads(r.payload)["bytes"] for r in rows)
    assert got == [1000, 2000]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        zmq_frame(agg, topic=300)


def test_zmq_pipe_buffers(spark):
    import struct

    from pmacct_spark.sinks.zmq import zmq_pipe_buffers

    agg = spark.range(250).selectExpr("id", "id * 10 AS bytes").coalesce(1)
    bufs = sorted(
        zmq_pipe_buffers(agg, topic=3, records_per_buffer=100).collect(),
        key=lambda r: r.seq,
    )
    assert [b.n_records for b in bufs] == [100, 100, 50]
    seq, topic, blen = struct.unpack_from("!IBI", bytes(bufs[0].buffer), 0)
    assert (seq, topic) == (0, 3)
    body = bytes(bufs[0].buffer)[9:]
    assert len(body) == blen and body.count(b"\n") == 99


def test_duckdb_sql_table_matches_merge_semantics(spark, tmp_path):
    """The LIVE embedded-SQL sink (DuckDB executing the reference's
    UPDATE-then-INSERT cycle, src/sql_common.c:680-765) must land in
    exactly the state the Spark-side MERGE stand-in computes: same
    rows, doubled counters after a repeat purge, stamp_updated
    refreshed — a cross-implementation gate between the two sink
    paths."""
    from pmacct_spark.sinks.upsert import DuckDBSqlTable

    agg = _agg(spark).localCheckpoint(eager=True)
    n = agg.count()
    keys = ["src_as", "dst_as"]
    counters = ["bytes", "packets", "flows"]

    pq = ParquetUpsertTable(spark, str(tmp_path / "pq"), keys, counters)
    db = DuckDBSqlTable(str(tmp_path / "acct.duckdb"), "acct", keys, counters)
    for stamp in ("2024-02-01 00:00:00", "2024-02-01 00:05:00"):
        pq.purge(agg, stamp)
        db.purge(agg, stamp)

    cols, rows = db.read_rows()
    assert len(rows) == n
    want = {
        tuple(r[k] for k in keys): r
        for r in pq.read().collect()
    }
    for r in rows:
        rec = dict(zip(cols, r))
        w = want[tuple(rec[k] for k in keys)]
        for c in counters:
            assert rec[c] == w[c], (rec, w)
        assert str(rec["stamp_updated"]) == "2024-02-01 00:05:00"


def test_duckdb_sql_table_append_only(spark, tmp_path):
    from pmacct_spark.sinks.upsert import DuckDBSqlTable

    agg = _agg(spark).localCheckpoint(eager=True)
    n = agg.count()
    db = DuckDBSqlTable(
        str(tmp_path / "a2.duckdb"), "acct", ["src_as", "dst_as"],
        ["bytes", "packets", "flows"],
    )
    db.purge(agg, "2024-02-01 00:00:00", append_only=True)
    db.purge(agg, "2024-02-01 00:05:00", append_only=True)
    _, rows = db.read_rows()
    assert len(rows) == 2 * n  # sql_dont_try_update: blind INSERT


def test_zmq_pipe_roundtrip(spark):
    """pipe buffers -> unpack round-trips every record (the core ->
    plugin ring-buffer contract, both directions)."""
    from pmacct_spark.sinks.zmq import zmq_pipe_buffers, zmq_pipe_unpack

    agg = _agg(spark).coalesce(1).localCheckpoint(eager=True)
    n = agg.count()
    assert n > 10  # multiple buffers at 10 records each
    bufs = zmq_pipe_buffers(agg, topic=7, records_per_buffer=10)
    back = zmq_pipe_unpack(bufs)
    rows = back.collect()
    assert len(rows) == n
    assert all(r["topic"] == 7 for r in rows)
    import json as _json

    got = {
        (d["src_as"], d["dst_as"]): d["bytes"]
        for d in (_json.loads(r["payload"]) for r in rows)
    }
    want = {
        (r["src_as"], r["dst_as"]): r["bytes"] for r in agg.collect()
    }
    assert got == want


def test_kafka_avro_registry_frame(spark):
    """kafka_output: avro + schema registry: every Kafka value is a
    Confluent-framed datum resolvable through the registry."""
    from pmacct_spark.sinks.avro import StubSchemaRegistry, read_registry_frame
    from pmacct_spark.sinks.kafka import kafka_avro_frame

    reg = StubSchemaRegistry()
    agg = _agg(spark).limit(8)
    fr = kafka_avro_frame(agg, "daisy.flow", reg, key_cols=["src_as"])
    rows = fr.collect()
    assert len(rows) == 8
    assert {r["topic"] for r in rows} == {"daisy.flow"}
    want = {r["src_as"]: r["bytes"] for r in agg.collect()}
    for r in rows:
        sid, rec = read_registry_frame(bytes(r["value"]), reg)
        assert sid == 1
        assert want[rec["src_as"]] == rec["bytes"]


def test_write_print_formatted(spark, tmp_path):
    """print_output: formatted (the reference's default) writes the
    aligned fixed-width table the client renders."""
    import glob
    import os

    from pmacct_spark.sinks.files import write_print

    df = spark.createDataFrame(
        [("tcp", 100), ("udp", 20)], "proto string, bytes long"
    )
    out = str(tmp_path / "fmt")
    write_print(df, out, fmt="formatted")
    files = glob.glob(os.path.join(out, "*.txt"))
    assert len(files) == 1
    text = open(files[0]).read()
    lines = [ln for ln in text.splitlines() if ln]
    assert lines[0].split() == ["PROTO", "BYTES"]  # pmacct uppercases headers
    assert {tuple(ln.split()) for ln in lines[1:]} == {
        ("tcp", "100"), ("udp", "20")
    }
    # fixed-width: every row is as wide as the header
    assert len({len(ln) for ln in lines if ln.strip()}) <= 2


def test_sql_multi_values_and_copy_paths_match_insert(spark, tmp_path):
    """sql_multi_values (CONFIG-KEYS:1519) and sql_use_copy (:1502):
    the two INSERT-only fast paths must land byte-identical table
    contents vs the plain set-based INSERT — three engines' worth of
    statement shapes, one result. Tiny byte budget forces several
    multi-VALUES statements; strings carry quotes and the delimiter."""
    from pmacct_spark.sinks.upsert import DuckDBSqlTable

    rows = [
        ("10.0.0.1", "o'hara,x", 100, 1),
        ("10.0.0.2", "plain", 250, 2),
        ("10.0.0.3", None, 50, 3),      # NULL key: must stay NULL
        ("10.0.0.4", "d,e,f", 75, 4),   # delimiter inside the value
        ("10.0.0.5", "", 10, 5),        # empty string: must NOT -> NULL
        ("10.0.0.6", 'quo"te', 20, 6),  # CSV quote char
    ]
    batch = spark.createDataFrame(
        rows, "ip string, label string, bytes long, packets long"
    )
    results = {}
    for mode, kwargs in (
        ("insert", {}),
        ("multi", {"multi_values": 60}),
        ("copy", {"use_copy": True, "delimiter": "|"}),
    ):
        t = DuckDBSqlTable(
            str(tmp_path / f"db_{mode}.duckdb"), "acct",
            keys=["ip"], counters=["bytes", "packets"],
        )
        t.purge(batch, "2026-01-02 03:04:05", append_only=True, **kwargs)
        cols, got = t.read_rows()
        results[mode] = (cols, got)
    assert results["insert"] == results["multi"] == results["copy"]
    assert len(results["insert"][1]) == 6
    # the empty string survived as '' (not NULL) on every path
    labels = {r[0]: r[1] for r in results["copy"][1]}
    assert labels["10.0.0.5"] == "" and labels["10.0.0.3"] is None
    # guard: fast paths without sql_dont_try_update must refuse
    import pytest as _pytest

    t = DuckDBSqlTable(
        str(tmp_path / "db_err.duckdb"), "acct",
        keys=["ip"], counters=["bytes"],
    )
    with _pytest.raises(ValueError):
        t.purge(batch, "2026-01-02 03:04:05", multi_values=100)


def test_tee_emit_udp_live(spark):
    """The tee daemon's replication loop over REAL UDP sockets
    (src/tee_plugin/tee_plugin.c:274-293): datagrams tag-route to two
    live UdpSpool receivers; each receives exactly its share,
    byte-exact, sent distributed (per-partition sockets)."""
    import time

    from pmacct_spark.sinks.tee import emit_udp
    from pmacct_spark.sources.udp import UdpSpool

    rx_a = UdpSpool().start()
    rx_b = UdpSpool().start()
    try:
        dgrams = spark.createDataFrame(
            [
                ("10.0.0.1", i, bytearray(b"payload-%d" % i), i % 2)
                for i in range(10)
            ],
            "exporter_ip string, seqno long, payload binary, tag int",
        )
        recv = [
            TeeReceiver("even", tags=[0]),
            TeeReceiver("odd", tags=[1]),
        ]
        parts = route(dgrams, recv)
        emit_udp(parts["even"], default_endpoint=f"127.0.0.1:{rx_a.port}")
        emit_udp(parts["odd"], default_endpoint=f"127.0.0.1:{rx_b.port}")
        t0 = time.monotonic()
        while (
            rx_a.datagrams_received < 5 or rx_b.datagrams_received < 5
        ) and time.monotonic() - t0 < 10:
            time.sleep(0.05)
        rx_a.flush()
        rx_b.flush()
        got_a = {
            bytes(r["payload"]) for r in rx_a.batch(spark).collect()
        }
        got_b = {
            bytes(r["payload"]) for r in rx_b.batch(spark).collect()
        }
        assert got_a == {b"payload-%d" % i for i in range(0, 10, 2)}
        assert got_b == {b"payload-%d" % i for i in range(1, 10, 2)}
    finally:
        rx_a.stop()
        rx_b.stop()


def test_print_latest_file_pointer(spark, tmp_path):
    """print_latest_file (reference src/print_plugin.c
    link_latest_file): after every purge a pointer names the latest
    output — here a symlink to the newest dynamic-name partition
    directory, replaced atomically across purges."""
    import os

    import time as _time

    agg = _agg(spark, history="1d")
    out = str(tmp_path / "prints")
    latest = str(tmp_path / "flows-latest")
    write_print(
        agg, out, fmt="csv", name_spec="flows-%Y%m%d", latest_file=latest
    )
    assert os.path.islink(latest)
    first = os.readlink(latest)
    assert os.path.isdir(first) and "=" in os.path.basename(first)
    # a later purge with a new dynamic name moves the pointer to the
    # freshly written partition
    from pyspark.sql import functions as F

    shifted = agg.withColumn(
        "stamp_inserted", F.expr("stamp_inserted + INTERVAL 400 DAYS")
    )
    _time.sleep(1.1)  # distinct mtime for the new partition dirs
    write_print(
        shifted, out, fmt="csv", name_spec="flows-%Y%m%d",
        mode="append", latest_file=latest,
    )
    second = os.readlink(latest)
    assert os.path.isdir(second) and second != first


def test_print_markers_wrap_formatted_purge(spark, tmp_path):
    """print_markers (reference src/print_plugin.c:525,1437): the
    formatted purge is wrapped in --START (pid)-- / --END (pid)--
    delimiters for stream-parsing consumers."""
    import os
    import re

    from pmacct_spark.sinks.files import write_print

    df = spark.createDataFrame([(6, 100)], "proto int, bytes long")
    out = str(tmp_path / "marked")
    write_print(df, out, fmt="formatted", markers=True)
    text = open(os.path.join(out, "part-00000.txt")).read()
    lines = text.splitlines()
    assert re.fullmatch(r"--START \(\d+\)--", lines[0])
    assert re.fullmatch(r"--END \(\d+\)--", lines[-1])
    assert any("100" in ln for ln in lines[1:-1])


def test_write_print_event_csv_and_avro_json(spark, tmp_path):
    """print_output event_csv strips the bytes/packets counters
    (CONFIG-KEYS:1806); avro_json writes Avro's JSON encoding — every
    non-null value of a nullable field wrapped in a one-key object
    naming the union branch (write_avro_json_record_to_file,
    src/print_plugin.c:1410)."""
    import csv as _csv
    import glob as _glob
    import json as _json

    from pmacct_spark.sinks.files import write_print

    df = spark.createDataFrame(
        [("tcp", 100, 3, 1), (None, 50, 1, 1)],
        "proto string, bytes long, packets long, flows long",
    )
    ev_dir = str(tmp_path / "ev")
    write_print(df, ev_dir, fmt="event_csv")
    rows = []
    for f in _glob.glob(ev_dir + "/*.csv"):
        with open(f) as fh:
            rows += list(_csv.DictReader(fh))
    assert rows and all(
        set(r) == {"proto", "flows"} for r in rows
    )  # counters stripped

    aj_dir = str(tmp_path / "aj")
    write_print(df, aj_dir, fmt="avro_json")
    recs = []
    for f in _glob.glob(aj_dir + "/*.json"):
        with open(f) as fh:
            recs += [_json.loads(ln) for ln in fh if ln.strip()]
    tcp = next(r for r in recs if r.get("proto"))
    assert tcp["proto"] == {"string": "tcp"}
    assert tcp["bytes"] == {"long": 100}
    noproto = next(r for r in recs if "proto" not in r or r["proto"] is None)
    assert noproto["bytes"] == {"long": 50}


def test_pack_multi_values_chunking(spark):
    """[kafka|amqp]_multi_values (CONFIG-KEYS:1519): newline-packed
    messages bounded by the byte budget (a record flushes the buffer
    when it would overflow; an oversized record ships alone), record
    order preserved inside a chunk, nothing lost or duplicated."""
    from pmacct_spark.sinks.kafka import pack_multi_values

    vals = [f'{{"i": {i}, "pad": "{"x" * (i % 7) * 3}"}}' for i in range(40)]
    df = spark.createDataFrame(
        [(None, v, "t") for v in vals],
        "key string, value string, topic string",
    ).coalesce(1)
    budget = 120
    packed = [r["value"] for r in pack_multi_values(df, budget).collect()]
    # every record arrives exactly once, order preserved per chunk
    flat = [v for msg in packed for v in msg.split("\n")]
    assert sorted(flat) == sorted(vals)
    assert len(packed) < len(vals)  # actually packed
    for msg in packed:
        parts = msg.split("\n")
        # bounded: a chunk only exceeds the budget if a single record
        # does (the reference's flush-on-overflow buffer)
        if len(parts) > 1:
            assert len(msg) <= budget + max(len(p) + 1 for p in parts)


def test_pack_multi_values_binary_avro_datums(spark):
    """avro_buffer_size batching (CONFIG-KEYS:1866): multiple Avro
    datums per bus message, concatenated with NO separator — Avro
    binary is self-delimiting under the schema, so sequential
    read_datum calls recover every record."""
    import io

    from pmacct_spark.sinks.avro import (
        avro_frames,
        avro_schema_of,
        read_datum,
    )
    from pmacct_spark.sinks.kafka import pack_multi_values

    df = spark.createDataFrame(
        [(i, f"name{i}") for i in range(30)], "k long, name string"
    ).coalesce(1)
    schema = avro_schema_of(df.schema)
    frames = avro_frames(df).select(
        "key", "value", F.lit("t").alias("topic")
    )
    packed = pack_multi_values(frames, 128, binary=True).collect()
    assert 1 < len(packed) < 30  # actually batched, bounded
    got = []
    for r in packed:
        buf = io.BytesIO(bytes(r["value"]))
        end = len(bytes(r["value"]))
        while buf.tell() < end:
            got.append(read_datum(buf, schema))
    assert sorted(d["k"] for d in got) == list(range(30))
    assert all(d["name"] == f"name{d['k']}" for d in got)


def test_pack_multi_values_max_records_cap(spark):
    """The Avro flush rule caps records per message (multi_values
    count) on top of the byte bound."""
    from pmacct_spark.sinks.kafka import pack_multi_values

    df = spark.createDataFrame(
        [(None, f"v{i}", "t") for i in range(20)],
        "key string, value string, topic string",
    ).coalesce(1)
    packed = [
        r["value"]
        for r in pack_multi_values(df, 10_000, max_records=4).collect()
    ]
    assert all(len(m.split("\n")) <= 4 for m in packed)
    assert sorted(
        v for m in packed for v in m.split("\n")
    ) == sorted(f"v{i}" for i in range(20))
