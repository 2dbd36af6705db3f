"""Gated queries: streaming-telemetry JSON decode (reference
src/telemetry/telemetry.c:72 — TCP/UDP/gRPC JSON lines -> rows via
from_json), custom primitives (aggregate_primitives map, reference
src/cfg.h:45-63, CONFIG-KEYS:174-181), label rendering (key%value
pairs, pkt_vlen_hdr_primitives src/network.h:520-523), and the
bgp_peer_src_as override map (reference src/pretag.c:43-47)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pmacct_spark.config import PluginConfig
from pmacct_spark.driver_queries import flows, register
from pmacct_spark.pipeline import build_aggregation
from pmacct_spark.registry import register_custom
from pmacct_spark.sources.tables import load_table
from pmacct_spark.views.flows import FLOWS_DUCK_CTE


# --- telemetry JSON payload decode: parse the props JSON, extract a
#     metric, aggregate per device (event_type stands in for the YANG
#     path). from_json keeps the parse JVM-side and vectorized.
@register(
    "telemetry_json_metrics",
    """
SELECT event_type AS sensor_path,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
       CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max,
       COUNT(*) AS n
FROM events GROUP BY 1""",
)
def telemetry_json_metrics(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.withColumn(
        "k", F.from_json("props", "k BIGINT").getField("k")
    )
    return parsed.groupBy(F.col("event_type").alias("sensor_path")).agg(
        F.sum("k").alias("k_sum"),
        F.max("k").alias("k_max"),
        F.count(F.lit(1)).alias("n"),
    )


# --- custom primitive: a user-declared column (decoded at source in
#     the reference, e.g. from an IPFIX enterprise IE) participating in
#     `aggregate` like any built-in. Here: app_class derived from the
#     telemetry payload.
@register(
    "custom_primitive_agg",
    f"""{FLOWS_DUCK_CTE}
SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS app_class,
       CAST(SUM(bytes) AS BIGINT) AS bytes,
       CAST(SUM(packets) AS BIGINT) AS packets,
       CAST(SUM(flows) AS BIGINT) AS flows
FROM flows GROUP BY 1""",
)
def custom_primitive_agg(spark, sf_dir):
    # props rides the flows view (no self-join back to events: the
    # join was two shuffles + SMJ for a column the scan already has)
    fl = flows(spark, sf_dir).withColumn(
        "app_class",
        F.from_json("props", "k BIGINT").getField("k") % 10,
    )
    register_custom("app_class", "app_class", "bigint")
    cfg = PluginConfig(aggregate=["app_class"])
    return build_aggregation(fl, cfg)


# --- label primitive: key%value pair list rendered the way pmacct
#     prints labels (vlen primitive, src/network.h:520-523)
@register(
    "label_render",
    f"""{FLOWS_DUCK_CTE}
SELECT 'exporter%' || peer_ip_src || ',proto%' || CAST(ip_proto AS VARCHAR)
         AS label,
       CAST(SUM(bytes) AS BIGINT) AS bytes, COUNT(*) AS flows
FROM flows GROUP BY 1""",
)
def label_render(spark, sf_dir):
    fl = flows(spark, sf_dir)
    label = F.concat(
        F.lit("exporter%"), F.col("peer_ip_src"),
        F.lit(",proto%"), F.col("ip_proto").cast("string"),
    )
    return (
        fl.withColumn("label", label)
        .groupBy("label")
        .agg(
            F.sum("bytes").cast("bigint").alias("bytes"),
            F.count(F.lit(1)).alias("flows"),
        )
    )


# --- bgp_peer_src_as override map: exporter -> fixed peer AS
#     (reference src/pretag.c:43-47,284-290) — broadcast equi join
@register(
    "bgp_peer_src_as_map",
    f"""{FLOWS_DUCK_CTE},
m AS (
  SELECT '192.0.2.' || CAST(r_regionkey AS VARCHAR) AS peer_ip,
         CAST(64512 + r_regionkey AS BIGINT) AS peer_src_as
  FROM region
)
SELECT m.peer_src_as, CAST(SUM(f.bytes) AS BIGINT) AS bytes,
       COUNT(*) AS flows
FROM flows f JOIN m ON f.peer_ip_src = m.peer_ip
GROUP BY 1""",
)
def bgp_peer_src_as_map(spark, sf_dir):
    region = load_table(spark, sf_dir, "region")
    m = region.select(
        F.concat(F.lit("192.0.2."), F.col("r_regionkey").cast("string")).alias(
            "peer_ip"
        ),
        (F.lit(64512) + F.col("r_regionkey")).cast("bigint").alias("peer_src_as"),
    )
    fl = flows(spark, sf_dir)
    return (
        fl.join(F.broadcast(m), fl.peer_ip_src == m.peer_ip)
        .groupBy("peer_src_as")
        .agg(
            F.sum("bytes").cast("bigint").alias("bytes"),
            F.count(F.lit(1)).alias("flows"),
        )
    )


# --- Cisco MDT dial-out framing on the wire (reference decoder
#     dispatch src/telemetry/telemetry.c:1009 + telemetry_msg.c:
#     150-246; header structs src/telemetry/telemetry.h:99-111):
#     every event becomes a v1 JSON frame; every 7th event also ships
#     a GPB-compact frame (opaque binary, surfaced with its decoder
#     tag, never parsed); every 13th a reset-compressor frame whose
#     payload LOOKS like JSON and would corrupt k_sum if the skip
#     logic mis-dispatched it. Decode -> JSON metrics + GPB counts per
#     device vs the direct oracle over events.
@register(
    "telemetry_cisco_mdt_wire_loop",
    """
SELECT event_type AS device,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
       CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max,
       COUNT(*) AS n_json,
       CAST(SUM(CASE WHEN event_id % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_gpb,
       CAST(SUM(CASE WHEN event_id % 5 = 0
                     THEN CAST(json_extract(props, '$.k') AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS kv_sum,
       CAST(SUM(CASE WHEN event_id % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kv
FROM events GROUP BY 1""",
)
def telemetry_cisco_mdt_loop(spark, sf_dir):
    """Extended round 8: every 5th event also ships a SELF-DESCRIBING
    KV GPB frame (Telemetry/TelemetryField tree — the reference's
    gpb_kv dispatch, src/telemetry/telemetry_msg.c:150-246) whose
    content/k leaf is decoded by the pure-Python varint/tag walker
    (streaming/telemetry.py decode_gpb_kv) and value-checked against
    the oracle — GPB-KV is no longer surfaced as opaque bytes."""
    from pmacct_spark.streaming.telemetry import (
        CISCO_GPB_COMPACT,
        CISCO_GPB_KV,
        CISCO_JSON,
        CISCO_RESET_COMPRESSOR,
        decode_cisco_mdt,
        decode_gpb_kv_fields,
        encode_cisco_frame,
        encode_gpb_kv,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "props"
    )

    def enc(batches):
        import pandas as pd

        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                chunk = b""
                if int(r.event_id) % 13 == 0:  # must be skipped intact
                    chunk += encode_cisco_frame(
                        CISCO_RESET_COMPRESSOR, b'{"k": 999999}'
                    )
                chunk += encode_cisco_frame(
                    CISCO_JSON, str(r.props).encode()
                )
                if int(r.event_id) % 7 == 0:
                    chunk += encode_cisco_frame(
                        CISCO_GPB_COMPACT, b"\x0a\x03gpb"
                    )
                if int(r.event_id) % 5 == 0:
                    import json as _json

                    k = int(_json.loads(r.props)["k"])
                    chunk += encode_cisco_frame(
                        CISCO_GPB_KV,
                        encode_gpb_kv(
                            str(r.event_type),
                            "Cisco-IOS-XR:stats",
                            {"k": k},
                            msg_timestamp=int(r.event_id),
                        ),
                    )
                out.append((str(r.event_type), int(r.event_id), chunk))
            yield pd.DataFrame(
                out, columns=["exporter_ip", "seqno", "payload"]
            )

    dg = ev.repartition(8).mapInPandas(
        enc, "exporter_ip string, seqno long, payload binary"
    )
    msgs = decode_cisco_mdt(dg, version=1)
    # KV leaves: the walker names them content/<field>; per-device sum
    # of the decoded k proves value-level (not just framing) parity
    kv = (
        decode_gpb_kv_fields(msgs.filter(F.col("decoder") == "gpb_kv"))
        .filter(F.col("name") == "content/k")
        .groupBy(F.col("exporter_ip").alias("device"))
        .agg(
            F.sum("uval").cast("bigint").alias("kv_sum"),
            F.count(F.lit(1)).alias("n_kv"),
        )
    )
    agg = msgs.groupBy(F.col("exporter_ip").alias("device")).agg(
        F.sum(
            F.when(
                F.col("decoder") == "json",
                F.from_json("payload_json", "k BIGINT").getField("k"),
            )
        ).alias("k_sum"),
        F.max(
            F.when(
                F.col("decoder") == "json",
                F.from_json("payload_json", "k BIGINT").getField("k"),
            )
        ).alias("k_max"),
        F.sum(F.when(F.col("decoder") == "json", 1).otherwise(0)).cast(
            "bigint"
        ).alias("n_json"),
        F.sum(
            F.when(F.col("decoder") == "gpb_compact", 1).otherwise(0)
        ).cast("bigint").alias("n_gpb"),
    )
    # devices are few (event_type cardinality), kv agg is tiny:
    # broadcast the joined side; devices with no %5 event get 0s
    return agg.join(F.broadcast(kv), "device", "left").select(
        "device", "k_sum", "k_max", "n_json", "n_gpb",
        F.coalesce("kv_sum", F.lit(0)).cast("bigint").alias("kv_sum"),
        F.coalesce("n_kv", F.lit(0)).cast("bigint").alias("n_kv"),
    )


# --- gRPC dial-out message layer (the mdt_dialout.MdtDialout stream;
#     reference bridges an external collector over ZMQ,
#     src/telemetry/telemetry.c:120-134 — the repo's HTTP/2 transport
#     lives in sources/grpc_wire.py and is tested live; this loop
#     gates the in-plan message layer): every event rides one
#     gRPC-framed MdtDialoutArgs with req_id = event_id and the JSON
#     props as data; every 7th event adds a GPB (non-JSON) message
#     exercising the decoder dispatch, every 13th carries the errors
#     field (reference field 3).
@register(
    "telemetry_grpc_dialout_wire_loop",
    """
SELECT event_type AS device,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
       COUNT(*) AS n_json,
       CAST(SUM(CASE WHEN event_id % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_gpb,
       CAST(SUM(event_id) AS BIGINT) AS req_id_sum,
       CAST(SUM(CASE WHEN event_id % 13 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_errors
FROM events GROUP BY 1""",
)
def telemetry_grpc_dialout_loop(spark, sf_dir):
    from pmacct_spark.sources.grpc_wire import (
        encode_mdt_dialout_args,
        grpc_frame,
    )
    from pmacct_spark.streaming.telemetry import decode_grpc_dialout

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "props"
    )

    def enc(batches):
        import pandas as pd

        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                eid = int(r.event_id)
                errors = "collector overrun" if eid % 13 == 0 else ""
                chunk = grpc_frame(
                    encode_mdt_dialout_args(
                        eid, str(r.props).encode(), errors
                    )
                )
                if eid % 7 == 0:
                    chunk += grpc_frame(
                        encode_mdt_dialout_args(eid, b"\x0a\x03gpb")
                    )
                out.append((str(r.event_type), chunk))
            yield pd.DataFrame(out, columns=["exporter_ip", "payload"])

    dg = ev.repartition(8).mapInPandas(
        enc, "exporter_ip string, payload binary"
    )
    msgs = decode_grpc_dialout(dg)
    is_json = F.col("decoder") == "json"
    k = F.from_json("payload_json", "k BIGINT").getField("k")
    return msgs.groupBy(F.col("exporter_ip").alias("device")).agg(
        F.sum(F.when(is_json, k)).alias("k_sum"),
        F.sum(F.when(is_json, 1).otherwise(0)).cast("bigint").alias("n_json"),
        F.sum(F.when(F.col("decoder") == "gpb", 1).otherwise(0)).cast(
            "bigint"
        ).alias("n_gpb"),
        F.sum(F.when(is_json, F.col("req_id"))).cast("bigint").alias(
            "req_id_sum"
        ),
        F.sum(
            F.when(is_json & F.col("errors").isNotNull(), 1).otherwise(0)
        ).cast("bigint").alias("n_errors"),
    )


# --- UDP-Notif transport (RFC 9742; reference tests/800 YANG push,
#     unyte collector src/telemetry/telemetry.c:468-504): every event
#     ships as one notification; every 5th is SEGMENTED across two
#     datagrams (the option the transport exists for) and must
#     reassemble byte-exact before the JSON parse.
@register(
    "telemetry_udp_notif_wire_loop",
    """
SELECT CAST(user_id % 4 AS BIGINT) AS observation_domain,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
       COUNT(*) AS n_notifications
FROM events GROUP BY 1""",
)
def telemetry_udp_notif_wire_loop(spark, sf_dir):
    from pmacct_spark.streaming.telemetry import (
        decode_udp_notif,
        encode_udp_notif,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "props"
    )

    def enc(batches):
        import pandas as pd

        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                od = int(r.user_id) % 4
                mid = int(r.event_id)
                body = str(r.props).encode()
                if mid % 5 == 0 and len(body) > 2:
                    cut = len(body) // 2
                    out.append(("203.0.113.9", mid, encode_udp_notif(
                        body[:cut], od, mid, segment=(0, False))))
                    out.append(("203.0.113.9", mid, encode_udp_notif(
                        body[cut:], od, mid, segment=(1, True))))
                else:
                    out.append(("203.0.113.9", mid,
                                encode_udp_notif(body, od, mid)))
            yield pd.DataFrame(
                out, columns=["exporter_ip", "seqno", "payload"]
            )

    dg = ev.repartition(8).mapInPandas(
        enc, "exporter_ip string, seqno long, payload binary"
    )
    msgs = decode_udp_notif(dg)
    return msgs.groupBy(
        F.col("observation_domain").cast("bigint").alias("observation_domain")
    ).agg(
        F.sum(
            F.from_json("payload_json", "k BIGINT").getField("k")
        ).alias("k_sum"),
        F.count(F.lit(1)).alias("n_notifications"),
    )


# --- gRPC dial-in message layer (IOS-XR gRPCConfigOper.CreateSubs
#     server-streaming replies; collector-as-client transport lives in
#     sources/grpc_wire.py:GrpcDialinCollector and is tested live —
#     this loop gates the in-plan CreateSubsReply message layer):
#     every event rides one gRPC-framed CreateSubsReply with
#     res_req_id = event_id and the JSON props as data; every 5th
#     event adds a GPB (non-JSON) reply exercising the decoder
#     dispatch, every 11th carries the errors field.
@register(
    "telemetry_grpc_dialin_wire_loop",
    """
SELECT event_type AS router,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
       COUNT(*) AS n_json,
       CAST(SUM(CASE WHEN event_id % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_gpb,
       CAST(SUM(event_id) AS BIGINT) AS res_req_id_sum,
       CAST(SUM(CASE WHEN event_id % 11 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_errors
FROM events GROUP BY 1""",
)
def telemetry_grpc_dialin_loop(spark, sf_dir):
    from pmacct_spark.sources.grpc_wire import (
        encode_create_subs_reply,
        grpc_frame,
    )
    from pmacct_spark.streaming.telemetry import decode_grpc_dialin

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "props"
    )

    def enc(batches):
        import pandas as pd

        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                eid = int(r.event_id)
                errors = "subscription lagging" if eid % 11 == 0 else ""
                chunk = grpc_frame(
                    encode_create_subs_reply(
                        eid, str(r.props).encode(), errors
                    )
                )
                if eid % 5 == 0:
                    chunk += grpc_frame(
                        encode_create_subs_reply(eid, b"\x0a\x03gpb")
                    )
                out.append((str(r.event_type), chunk))
            yield pd.DataFrame(out, columns=["exporter_ip", "payload"])

    dg = ev.repartition(8).mapInPandas(
        enc, "exporter_ip string, payload binary"
    )
    msgs = decode_grpc_dialin(dg)
    is_json = F.col("decoder") == "json"
    k = F.from_json("payload_json", "k BIGINT").getField("k")
    return msgs.groupBy(F.col("router_ip").alias("router")).agg(
        F.sum(F.when(is_json, k)).alias("k_sum"),
        F.sum(F.when(is_json, 1).otherwise(0)).cast("bigint").alias("n_json"),
        F.sum(F.when(F.col("decoder") == "gpb", 1).otherwise(0)).cast(
            "bigint"
        ).alias("n_gpb"),
        F.sum(F.when(is_json, F.col("res_req_id"))).cast("bigint").alias(
            "res_req_id_sum"
        ),
        F.sum(
            F.when(is_json & F.col("errors").isNotNull(), 1).otherwise(0)
        ).cast("bigint").alias("n_errors"),
    )
