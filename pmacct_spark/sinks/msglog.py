"""Per-event BGP/BMP message log — the reference's
``bgp_daemon_msglog_*`` / ``bmp_daemon_msglog_*`` machinery
(src/bgp/bgp_logdump.c:47 ``bgp_peer_log_msg``, :821
``bgp_peer_log_init``, :1111 ``bgp_peer_log_close``; config keys
bgp_daemon_msglog_file / _kafka_topic / _amqp_routing_key, CONFIG-KEYS
:615-624).

Reference behavior: when a peering session establishes, the daemon
writes a ``log_init`` record for the peer; every UPDATE route is
logged as an ``event_type: "log"`` record with a monotonic ``seq``, a
``log_type`` of update|withdraw, a timestamp, the peer address, the
prefix and its path attributes; session end writes ``log_close``.
Output goes to a per-peer file (the ``$peer_src_ip`` filename token)
or to a Kafka/AMQP broker.

Spark-first: the decoded BGP/BMP event stream
(streaming/bmp.BMP_EVENT_SCHEMA) already carries route rows AND peer
session rows (msg_type 3 up / 2 down), so msglog is ONE declarative
transform — event typing by msg_type, per-peer monotonic ``seq`` via
a window over the decoder's deterministic intra-stream order (the
reference's single-thread global counter has no distributed analog;
per-peer monotonicity is the property its consumers rely on), JSON
rendering via ``to_json`` (null fields dropped, like the reference's
conditional json_object_set calls). The per-peer dynamic filename
becomes a ``peer=<ip>`` partition directory — a 1000-executor cluster
writes every peer's log in parallel — and the Kafka transport ships
the same frames through the live wire-protocol producer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pmacct_spark.functions.addr import ipv4_ntoa


def _rd_col(events: DataFrame) -> str:
    """bmp_daemon_set_pd (CONFIG-KEYS:3331, pd_target
    src/bmp/bmp_logdump.c:423): the daemon renames the peer
    distinguisher column to "pd" before the sinks; every encoder then
    emits the field under that name."""
    return "pd" if "pd" in events.columns else "rd"


def msglog_events(events: DataFrame) -> DataFrame:
    """Shape decoded BGP/BMP events into the reference msglog event
    stream: one row per loggable event with event_type
    (log_init|log|log_close), log_type (update|withdraw, route rows
    only), per-peer monotonic msglog_seq, and presentation-form
    prefix / next-hop / attribute columns named as the reference
    emits them."""
    ev = events.filter(F.col("msg_type").isin(0, 2, 3))
    w = Window.partitionBy("exporter_ip", "peer_ip").orderBy("seq")
    return (
        ev.withColumn("msglog_seq", F.row_number().over(w).cast("bigint"))
        .withColumn(
            "event_type",
            F.when(F.col("msg_type") == 3, F.lit("log_init"))
            .when(F.col("msg_type") == 2, F.lit("log_close"))
            .otherwise(F.lit("log")),
        )
        .withColumn(
            "log_type",
            F.when(
                F.col("msg_type") == 0,
                F.when(F.col("is_withdrawal"), F.lit("withdraw")).otherwise(
                    F.lit("update")
                ),
            ),
        )
        .withColumn(
            "afi",
            F.when(F.col("prefix").isNotNull(), F.lit(1))
            .when(F.col("prefix6").isNotNull(), F.lit(2)),
        )
        .withColumn(
            # RD-instance peers carry L3VPN routes (SAFI 128); the
            # global table is unicast (reference logs afi/safi from
            # the route's table). The distinguisher column may arrive
            # renamed "pd" (bmp_daemon_set_pd, CONFIG-KEYS:3331).
            "safi",
            F.when(
                F.col("afi").isNotNull()
                & F.col(_rd_col(events)).isNotNull(),
                F.lit(128),
            ).when(F.col("afi").isNotNull(), F.lit(1)),
        )
        .withColumn(
            "ip_prefix",
            F.when(
                F.col("prefix").isNotNull(),
                F.concat_ws("/", ipv4_ntoa("prefix"), F.col("masklen")),
            ).when(
                F.col("prefix6").isNotNull(),
                F.concat_ws("/", F.col("prefix6"), F.col("masklen")),
            ),
        )
        .withColumn(
            "bgp_nexthop",
            F.when(F.col("next_hop").isNotNull(), ipv4_ntoa("next_hop"))
            .when(F.col("next_hop6").isNotNull(), F.col("next_hop6")),
        )
    )


def msglog_json(events: DataFrame) -> DataFrame:
    """Render msglog events to the reference's JSON lines:
    (exporter_ip, peer_ip, json). Null fields are omitted, matching
    the reference's conditional field writes; ``peer_ip_src`` is the
    peering address, ``seq`` the per-peer monotonic counter."""
    shaped = msglog_events(events)
    # tag/label ride along when a *_daemon_tag_map tagged the events
    # (reference pretag for BGP/BMP threads); to_json omits nulls so
    # untagged rows stay clean
    extras = []
    if "tag" in events.columns:
        extras.append(
            F.when(F.col("tag") != 0, F.col("tag")).alias("tag")
        )
    if "label" in events.columns:
        extras.append(
            F.when(F.col("label") != "", F.col("label")).alias("label")
        )
    payload = F.to_json(
        F.struct(
            *extras,
            F.col("msglog_seq").alias("seq"),
            F.col("ts_s").alias("timestamp"),
            F.col("peer_ip").alias("peer_ip_src"),
            F.col("event_type"),
            F.col("log_type"),
            F.col("afi"),
            F.col("safi"),
            F.col("ip_prefix"),
            F.col("path_id").alias("as_path_id"),
            F.col("bgp_nexthop"),
            F.col("as_path"),
            F.col("std_comm").alias("comms"),
            F.col("ext_comm").alias("ecomms"),
            F.col("lrg_comm").alias("lcomms"),
            F.col("local_pref"),
            F.col("med"),
            F.col(_rd_col(events)).alias(_rd_col(events)),
        )
    )
    return shaped.select(
        "exporter_ip", "peer_ip", "msglog_seq", payload.alias("json")
    )


def write_msglog(events: DataFrame, path: str) -> None:
    """File sink: JSON lines partitioned by peer — the distributed
    analog of the reference's ``$peer_src_ip`` dynamic filename
    (bgp_daemon_msglog_file). Within a peer directory, lines are
    written in seq order (one peer's log is one partition's worth of
    rows, sorted before the write)."""
    (
        msglog_json(events)
        .repartition("exporter_ip", "peer_ip")
        .sortWithinPartitions("exporter_ip", "peer_ip", "msglog_seq")
        .select(
            F.col("exporter_ip").alias("exporter"),
            F.col("peer_ip").alias("peer"),
            "json",
        )
        .write.partitionBy("exporter", "peer")
        .mode("overwrite")
        .text(path)
    )


def msglog_kafka_frames(events: DataFrame, topic: str) -> DataFrame:
    """Kafka sink half (bgp_daemon_msglog_kafka_topic): (key, value,
    topic) frames keyed by peer address — same-peer events keep their
    order within a partition, the guarantee the reference gets from
    librdkafka's per-key partitioning. Feed to
    sources/kafka_wire.produce_frames for the live wire transport."""
    return msglog_json(events).select(
        F.col("peer_ip").alias("key"),
        F.col("json").alias("value"),
        F.lit(topic).alias("topic"),
    )


def msglog_event_rows(events: DataFrame) -> DataFrame:
    """The msglog payload as STRUCTURED columns (one per field the
    JSON encoder emits, same names) — the record the Avro output path
    serializes (bgp/bmp_daemon_msglog_output: avro, reference
    src/bgp/bgp_logdump.c avro branches). ``peer_ip`` rides along for
    Kafka keying and is dropped by the framer."""
    shaped = msglog_events(events)
    cols = [
        F.col("msglog_seq").alias("seq"),
        F.col("ts_s").alias("timestamp"),
        F.col("peer_ip").alias("peer_ip_src"),
        F.col("event_type"),
        F.col("log_type"),
        F.col("afi"),
        F.col("safi"),
        F.col("ip_prefix"),
        F.col("path_id").alias("as_path_id"),
        F.col("bgp_nexthop"),
        F.col("as_path"),
        F.col("std_comm").alias("comms"),
        F.col("ext_comm").alias("ecomms"),
        F.col("lrg_comm").alias("lcomms"),
        F.col("local_pref"),
        F.col("med"),
        F.col(_rd_col(events)).alias(_rd_col(events)),
    ]
    if "tag" in events.columns:
        cols.append(F.col("tag"))
    if "label" in events.columns:
        cols.append(F.col("label"))
    return shaped.select(*cols, F.col("peer_ip"))


def msglog_avro_kafka_frames(
    events: DataFrame,
    topic: str,
    registry=None,
    schema_file: str | None = None,
) -> DataFrame:
    """(key, value, topic) frames with Avro-encoded values —
    ``*_daemon_msglog_output: avro`` (+ optional
    ``*_msglog_kafka_avro_schema_registry``: values carry the
    Confluent 5-byte registry frame, schema registered ONCE driver-
    side under ``<topic>-value``; and ``*_msglog_avro_schema_file``:
    the record schema dumped for registry-less consumers). Reference:
    the serdes branches of src/bgp/bgp_logdump.c + test
    tests/203-BMP-HUAWEI-dump's conf."""
    import json as _json

    from pmacct_spark.sinks.avro import (
        avro_frames,
        avro_registry_frames,
        avro_schema_of,
    )

    record = msglog_event_rows(events).drop("peer_ip")
    if schema_file:
        with open(schema_file, "w") as fh:
            _json.dump(avro_schema_of(record.schema), fh)
    # key by peer address like the JSON path (same-peer ordering);
    # peer_ip_src IS a record field, so the datum stays clean
    if registry is not None:
        frames = avro_registry_frames(
            record, registry, topic, key_cols=["peer_ip_src"]
        )
    else:
        frames = avro_frames(record, key_cols=["peer_ip_src"])
    return frames.select("key", "value", F.lit(topic).alias("topic"))


# --- sFlow counter log (the same logdump family) ---------------------
#
# sfacctd_counter_file / _kafka_topic (reference src/sfacctd.c:2366
# sf_cnt_log_msg): every decoded counter sample is logged as an
# event_type "log" JSON record with a per-exporter monotonic seq, the
# agent address as peer_ip_src, the sample's source/sequence identity,
# and the generic interface counter block under the reference's field
# names (readCounters_generic, src/sfv5_module.c).


def counter_log_events(counters: DataFrame) -> DataFrame:
    """decode_sflow_counters rows + the per-agent monotonic log_seq
    (the reference's bms->log_seq counter, one stream per agent)."""
    w = Window.partitionBy("exporter_ip").orderBy("seqno", "if_index")
    return counters.withColumn(
        "log_seq", F.row_number().over(w).cast("bigint")
    )


def counter_log_json(counters: DataFrame) -> DataFrame:
    """(exporter_ip, log_seq, json) from decode_sflow_counters rows."""
    shaped = counter_log_events(counters)
    payload = F.to_json(
        F.struct(
            F.col("log_seq").alias("seq"),
            F.col("exporter_ip").alias("peer_ip_src"),
            F.lit("log").alias("event_type"),
            F.col("source_id").alias("source_id_index"),
            F.col("seqno").alias("sflow_seq"),
            F.col("sflow_version"),
            F.col("if_index").alias("ifIndex"),
            F.col("if_type").alias("ifType"),
            F.col("if_speed").alias("ifSpeed"),
            F.col("if_status").alias("ifStatus"),
            F.col("if_in_octets").alias("ifInOctets"),
            F.col("if_in_ucast").alias("ifInUcastPkts"),
            F.col("if_in_errors").alias("ifInErrors"),
            F.col("if_out_octets").alias("ifOutOctets"),
            F.col("if_out_ucast").alias("ifOutUcastPkts"),
            F.col("if_out_errors").alias("ifOutErrors"),
        )
    )
    return shaped.select("exporter_ip", "log_seq", payload.alias("json"))


def write_counter_log(counters: DataFrame, path: str) -> None:
    """File sink: JSON lines partitioned per agent (exporter)."""
    (
        counter_log_json(counters)
        .repartition("exporter_ip")
        .sortWithinPartitions("exporter_ip", "log_seq")
        .select(F.col("exporter_ip").alias("exporter"), "json")
        .write.partitionBy("exporter")
        .mode("overwrite")
        .text(path)
    )


def counter_log_kafka_frames(counters: DataFrame, topic: str) -> DataFrame:
    """sfacctd_counter_kafka_topic: agent-keyed (key, value, topic)
    frames for the live wire producer."""
    return counter_log_json(counters).select(
        F.col("exporter_ip").alias("key"),
        F.col("json").alias("value"),
        F.lit(topic).alias("topic"),
    )


# --- telemetry msglog (telemetry_daemon_msglog_*) --------------------
#
# Reference src/telemetry/telemetry_logdump.c telemetry_log_msg: each
# telemetry message is wrapped in the draft ietf-telemetry-message
# envelope — telemetry-message-metadata (notification-event,
# session-protocol, a labels list carrying the seq, collection
# timestamp, export address/port), network-operator-metadata (the
# serialization label), data-collection-manifest (collector identity),
# and the decoded message itself under "payload". The payload is
# already JSON, so the envelope is composed around it verbatim (the
# reference embeds the parsed object the same way).


def _telemetry_shaped(
    msgs: DataFrame, tag_rules: list | None = None
) -> DataFrame:
    """Common shaping for the telemetry logdump family: JSON-validated
    payload string + per-node monotonic log_seq (+ tag/label when a
    telemetry_daemon_tag_map is configured)."""
    w = Window.partitionBy("exporter_ip").orderBy("seqno")
    shaped = (
        msgs.withColumn("payload_str", F.col("payload").cast("string"))
        # the reference validates each message's JSON before logging
        # (telemetry_msg.c decoder); a poison datagram must not
        # corrupt the envelope stream
        .filter(F.try_parse_json("payload_str").isNotNull())
        .withColumn("log_seq", F.row_number().over(w).cast("bigint"))
    )
    if tag_rules:
        from pmacct_spark.operators.pretag import apply_pretag

        shaped = apply_pretag(
            shaped.withColumn("peer_src_ip", F.col("exporter_ip")),
            tag_rules,
            label_out="label",
        ).drop("peer_src_ip", "tag2")
    return shaped


def telemetry_log_json(
    msgs: DataFrame,
    proc_name: str = "nfacctd",
    export_port: int = 0,
    tag_rules: list | None = None,
    event_type: str = "log",
) -> DataFrame:
    """(exporter_ip, log_seq, json) from telemetry datagram rows
    (exporter_ip, seqno, payload) whose payload is a JSON document.

    ``tag_rules`` (telemetry_daemon_tag_map, the pre_tag_map
    equivalent for the telemetry thread): the matched tag — or,
    tag-less, the label — joins the envelope's metadata ``labels``
    array as ``{"name": "tag", "number-value": N}`` /
    ``{"name": "label", "string-value": S}``
    (telemetry_tag_print_json, reference
    src/telemetry/telemetry_logdump.c:768).

    ``event_type``: msglog records render "update" in
    notification-event, dump records render "dump"
    (src/telemetry/telemetry_logdump.c:86-94)."""
    shaped = _telemetry_shaped(msgs, tag_rules)
    if tag_rules:

        def _entry(name, num, strv):
            return F.struct(
                name.alias("name"),
                num.cast("bigint").alias("number-value"),
                strv.cast("string").alias("string-value"),
            )

        null_i = F.lit(None).cast("bigint")
        null_s = F.lit(None).cast("string")
        labels = F.concat(
            F.array(_entry(F.lit("seq"), F.col("log_seq"), null_s)),
            # tag wins over label, like the reference's exit_lane
            F.when(
                F.col("tag") != 0,
                F.array(_entry(F.lit("tag"), F.col("tag"), null_s)),
            )
            .when(
                F.col("label") != "",
                F.array(_entry(F.lit("label"), null_i, F.col("label"))),
            )
            .otherwise(
                F.array().cast(
                    "array<struct<name:string,`number-value`:bigint,"
                    "`string-value`:string>>"
                )
            ),
        )
    else:
        labels = F.array(
            F.struct(
                F.lit("seq").alias("name"),
                F.col("log_seq").alias("number-value"),
            )
        )
    meta = F.to_json(
        F.struct(
            F.lit(
                "dump" if event_type == "dump" else "update"
            ).alias("notification-event"),
            F.lit("telemetry").alias("session-protocol"),
            labels.alias("labels"),
            F.col("exporter_ip").alias("export-address"),
            F.lit(export_port).alias("export-port"),
        )
    )
    netop = (
        '{"labels": [{"name": "serialization",'
        ' "string-value": "json-string"}]}'
    )
    manifest = F.to_json(
        F.struct(
            F.lit("pmacct").alias("vendor"),
            F.lit(proc_name).alias("name"),
            F.lit("pmacct_spark").alias("software-version"),
            F.lit("spark").alias("software-flavor"),
        )
    )
    envelope = F.concat(
        F.lit('{"ietf-telemetry-message:message": '
              '{"telemetry-message-metadata": '),
        meta,
        F.lit(', "network-operator-metadata": ' + netop),
        F.lit(', "data-collection-manifest": '),
        manifest,
        F.lit(', "payload": '),
        F.col("payload_str"),
        F.lit("}}"),
    )
    return shaped.select(
        "exporter_ip", "log_seq", envelope.alias("json")
    )


def write_telemetry_log(msgs: DataFrame, path: str, **kw) -> None:
    """telemetry_daemon_msglog_file: JSON lines per telemetry node."""
    (
        telemetry_log_json(msgs, **kw)
        .repartition("exporter_ip")
        .sortWithinPartitions("exporter_ip", "log_seq")
        .select(F.col("exporter_ip").alias("node"), "json")
        .write.partitionBy("node")
        .mode("overwrite")
        .text(path)
    )


def telemetry_msglog_kafka_frames(
    msgs: DataFrame, topic: str, **kw
) -> DataFrame:
    """telemetry_daemon_msglog_kafka_topic / telemetry_dump_kafka_topic
    (CONFIG-KEYS:961-962): one Kafka message per ietf-envelope record,
    keyed by the exporting node for per-node ordering."""
    return telemetry_log_json(msgs, **kw).select(
        F.col("exporter_ip").alias("key"),
        F.col("json").alias("value"),
        F.lit(topic).alias("topic"),
    )


def telemetry_msglog_avro_kafka_frames(
    msgs: DataFrame,
    topic: str,
    registry=None,
    schema_file: str | None = None,
    proc_name: str = "nfacctd",
    export_port: int = 0,
    tag_rules: list | None = None,
    event_type: str = "log",
) -> DataFrame:
    """``telemetry_daemon_msglog_output: avro`` — the telemetry twin
    of :func:`msglog_avro_kafka_frames`: the envelope's metadata
    fields as a flat Avro record with the raw JSON message text in
    ``payload`` (the reference caps the telemetry formats at json,
    src/telemetry/telemetry.c:520; this extends the BGP/BMP avro
    serdes — Confluent registry framing + schema-file dump — to the
    telemetry family with the same record-building machinery)."""
    import json as _json

    from pmacct_spark.sinks.avro import (
        avro_frames,
        avro_registry_frames,
        avro_schema_of,
    )

    shaped = _telemetry_shaped(msgs, tag_rules)
    cols = [
        F.lit("dump" if event_type == "dump" else "update").alias(
            "notification_event"
        ),
        F.col("exporter_ip").alias("export_address"),
        F.lit(int(export_port)).cast("bigint").alias("export_port"),
        F.col("log_seq").alias("seq"),
        F.lit(proc_name).alias("proc_name"),
        F.col("payload_str").alias("payload"),
    ]
    if tag_rules:
        cols[4:4] = [
            F.col("tag").cast("bigint").alias("tag"),
            F.col("label").cast("string").alias("label"),
        ]
    record = shaped.select(*cols)
    if schema_file:
        with open(schema_file, "w") as fh:
            _json.dump(avro_schema_of(record.schema), fh)
    if registry is not None:
        frames = avro_registry_frames(
            record, registry, topic, key_cols=["export_address"]
        )
    else:
        frames = avro_frames(record, key_cols=["export_address"])
    return frames.select("key", "value", F.lit(topic).alias("topic"))


def apply_rr_suffix(
    frames: DataFrame, col: str, base: str, n: int | None
) -> DataFrame:
    """[amqp_routing_key_rr | kafka_topic_rr] (CONFIG-KEYS:722 + the
    msglog/dump family at :979): load-balance over ``<base>_0`` ..
    ``<base>_{n-1}``. The reference round-robins a per-writer counter;
    the distributed analog is a deterministic row hash — same uniform
    spread, no cross-partition sequence point."""
    if not n:
        return frames
    hash_cols = [
        c for c in ("key", "value", "body") if c in frames.columns
    ]
    return frames.withColumn(
        col,
        F.concat(
            F.lit(f"{base}_"),
            (
                F.abs(F.xxhash64(*[F.col(c) for c in hash_cols]))
                % int(n)
            ).cast("string"),
        ),
    )


def msglog_amqp_frames(
    events: DataFrame,
    routing_key: str,
    exchange: str = "pmacct",
    exchange_type: str = "direct",
) -> DataFrame:
    """AMQP sink half (bgp_daemon_msglog_amqp_routing_key /
    _amqp_exchange, reference src/bgp/bgp_logdump.c amqp branches):
    the msglog JSON lines shaped into the publish contract for
    sinks/amqp_wire.publish_frames — one persistent-delivery message
    per event on the configured exchange/key."""
    return msglog_json(events).select(
        F.lit(exchange).alias("exchange"),
        F.lit(exchange_type).alias("exchange_type"),
        F.lit(routing_key).alias("routing_key"),
        F.col("json").alias("body"),
        F.lit(2).alias("delivery_mode"),  # the reference logs durably
        F.lit("application/json").alias("content_type"),
    )
