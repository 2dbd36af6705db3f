"""Golden-output scenario: pretag rules + JSON-encoded Kafka output —
the reference's tests/103-IPFIXv10-CISCO-pretag-JSON_encoding: flows
are tagged by a pretag map (exporter/interface matches incl. jeq
composition), then leave as JSON messages on the Kafka contract with
the tag/label fields in the payload. The golden is the parsed JSON
payload set itself — every field the reference's output-flow json
would carry for these records, with the volatile stamps excluded.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from pmacct_spark.operators.pretag import Rule, apply_pretag
from pmacct_spark.sinks.kafka import kafka_frame


def test_pretag_json_encoding_golden(spark):
    flows = spark.createDataFrame(
        [
            # exporter A iface 10 -> rule 1 (tag 100, customer-a)
            ("192.0.2.31", 10, 0x0A000001, 1500, 10),
            ("192.0.2.31", 10, 0x0A000002, 500, 5),
            # exporter A iface 20 -> rule 2 (tag 200, customer-b)
            ("192.0.2.31", 20, 0x0A000003, 700, 7),
            # exporter B any iface -> rule 3 (tag 300, customer-c)
            ("192.0.2.32", 10, 0x0A000004, 900, 9),
            # unmatched exporter -> tag 0, no label
            ("203.0.113.99", 1, 0x0A000005, 111, 1),
        ],
        "peer_src_ip string, iface_in int, ip_src_i long, bytes long, "
        "packets long",
    )
    rules = [
        Rule(match={"peer_src_ip": "192.0.2.31", "iface_in": 10},
             set_tag=100, set_label="customer-a"),
        Rule(match={"peer_src_ip": "192.0.2.31", "iface_in": 20},
             set_tag=200, set_label="customer-b"),
        Rule(match={"peer_src_ip": "192.0.2.32"},
             set_tag=300, set_label="customer-c"),
    ]
    tagged = apply_pretag(flows, rules, label_out="label")
    agg = tagged.groupBy("peer_src_ip", "tag", "label").agg(
        F.sum("bytes").alias("bytes"),
        F.sum("packets").alias("packets"),
        F.count(F.lit(1)).alias("flows"),
    )
    frame = kafka_frame(agg, "daisy.flow", key_cols=["peer_src_ip"])
    rows = frame.collect()
    assert all(r["topic"] == "daisy.flow" for r in rows)
    got = {json.dumps(json.loads(r["value"]), sort_keys=True) for r in rows}
    golden = {
        json.dumps(d, sort_keys=True)
        for d in [
            {"peer_src_ip": "192.0.2.31", "tag": 100, "label": "customer-a",
             "bytes": 2000, "packets": 15, "flows": 2},
            {"peer_src_ip": "192.0.2.31", "tag": 200, "label": "customer-b",
             "bytes": 700, "packets": 7, "flows": 1},
            {"peer_src_ip": "192.0.2.32", "tag": 300, "label": "customer-c",
             "bytes": 900, "packets": 9, "flows": 1},
            # unmatched: tag 0; to_json drops the null label field,
            # matching the reference's null-field-omitting composer
            {"peer_src_ip": "203.0.113.99", "tag": 0,
             "bytes": 111, "packets": 1, "flows": 1},
        ]
    }
    assert got == golden
    # partition keys: per-exporter ordering downstream
    keys = {r["key"] for r in rows}
    assert keys == {"192.0.2.31", "192.0.2.32", "203.0.113.99"}
