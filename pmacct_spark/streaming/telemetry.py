"""Streaming-telemetry transport decoders beyond plain JSON lines.

The reference's pmtelemetryd takes telemetry over UDP/TCP (JSON or
Cisco-framed), ZeroMQ and Kafka, with four payload decoders
(src/telemetry/telemetry.h:49-53: json / gpb / cisco_v0 / cisco_v1;
dispatch src/telemetry/telemetry.c:1009 and telemetry_msg.c:150-246).

Implemented here, Spark-first:

  - Cisco MDT dial-out framing v0 ([type u32][flags u32][len u32])
    and v1 ([type u16][encap u16][version u16][flags u16][len u32])
    over the universal datagram contract — the same rows a
    ``TcpSpool(framing='cisco_v0'|'cisco_v1')`` session spools.
  - Per-message type dispatch exactly as telemetry_recv_cisco
    (telemetry_msg.c:214-246): reset-compressor (1) skipped, JSON (2)
    surfaced as a string payload, GPB compact/kv (3/4) surfaced as
    opaque binary with the decoder tag — real protobuf decode needs
    schema-specific bindings the sandbox lacks; the Spark-side
    plumbing (schema, dispatch, framing) is real and tested.
  - ZMQ/Kafka transports reuse the engine's existing frame contracts
    (sources/kafka.py, sinks/zmq.py) — a telemetry payload is just a
    value frame; tests wire JSON telemetry through those seams into
    the same metrics pipeline.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

# Cisco MDT message types (reference src/telemetry/telemetry.h:65-68)
CISCO_RESET_COMPRESSOR = 1
CISCO_JSON = 2
CISCO_GPB_COMPACT = 3
CISCO_GPB_KV = 4

TELEMETRY_MSG_SCHEMA = T.StructType(
    [
        T.StructField("exporter_ip", T.StringType()),
        T.StructField("seqno", T.LongType()),
        # 'json' | 'gpb_compact' | 'gpb_kv' — reset-compressor and
        # unknown types are dropped (telemetry_recv_jump)
        T.StructField("decoder", T.StringType()),
        T.StructField("payload_json", T.StringType()),  # decoder='json'
        T.StructField("payload_raw", T.BinaryType()),  # gpb_* opaque
    ]
)

_DECODER_NAMES = {
    CISCO_JSON: "json",
    CISCO_GPB_COMPACT: "gpb_compact",
    CISCO_GPB_KV: "gpb_kv",
}


def encode_cisco_frame(
    msg_type: int, payload: bytes, version: int = 1, encap: int = 0
) -> bytes:
    """One Cisco MDT dial-out frame (v0 or v1 header)."""
    if version == 0:
        return (
            int(msg_type).to_bytes(4, "big")
            + (0).to_bytes(4, "big")
            + len(payload).to_bytes(4, "big")
            + payload
        )
    return (
        int(msg_type).to_bytes(2, "big")
        + int(encap).to_bytes(2, "big")
        + (1).to_bytes(2, "big")
        + (0).to_bytes(2, "big")
        + len(payload).to_bytes(4, "big")
        + payload
    )


def _walk_cisco(b: bytes, version: int) -> list[tuple[str, bytes]]:
    """[(decoder_name, payload)] for one session chunk; skips
    reset-compressor and unknown types (telemetry_recv_jump)."""
    out = []
    off = 0
    while off + 12 <= len(b):
        if version == 0:
            mtype = int.from_bytes(b[off : off + 4], "big")
        else:
            mtype = int.from_bytes(b[off : off + 2], "big")
            # v1 over TCP: dispatch keys on the header TYPE field for
            # the reset/JSON/GPB classes, mirroring
            # telemetry_recv_cisco_v1 -> telemetry_recv_cisco(type=...)
        plen = int.from_bytes(b[off + 8 : off + 12], "big")
        payload = b[off + 12 : off + 12 + plen]
        off += 12 + plen
        name = _DECODER_NAMES.get(mtype)
        if name is not None:
            out.append((name, payload))
    return out


def decode_cisco_mdt(datagrams: DataFrame, version: int = 1) -> DataFrame:
    """Decode Cisco-framed telemetry session chunks (the datagram
    contract: exporter_ip, seqno, payload) into per-message rows."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in TELEMETRY_MSG_SCHEMA.fields]
        for pdf in batches:
            rows = []
            seqnos = pdf["seqno"] if "seqno" in pdf.columns else None
            for i, (exporter, payload) in enumerate(
                zip(pdf["exporter_ip"], pdf["payload"])
            ):
                seq0 = int(seqnos.iloc[i]) << 16 if seqnos is not None else 0
                for k, (name, body) in enumerate(
                    _walk_cisco(bytes(payload), version)
                ):
                    rows.append(
                        {
                            "exporter_ip": str(exporter),
                            "seqno": seq0 + k,
                            "decoder": name,
                            "payload_json": (
                                body.decode("utf-8", "replace")
                                if name == "json"
                                else None
                            ),
                            "payload_raw": body if name != "json" else None,
                        }
                    )
            yield pd.DataFrame(
                [[r.get(c) for c in cols] for r in rows], columns=cols
            )

    return datagrams.mapInPandas(gen, TELEMETRY_MSG_SCHEMA)


def decode_gpb_payload(raw: bytes):  # pragma: no cover - capability guard
    """Real GPB (compact or self-describing KV) decode requires the
    platform's protobuf bindings, absent in this environment. The
    framing/dispatch above is complete; plug a generated decoder here."""
    raise NotImplementedError(
        "GPB telemetry payload decode requires protobuf bindings; "
        "payload_raw carries the intact message bytes"
    )
