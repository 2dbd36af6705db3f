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


# --- UDP-Notif (RFC 9742 / draft-ietf-netconf-udp-notif; the
#     reference's tests/800 YANG push transport, consumed via the
#     unyte collector src/telemetry/telemetry.c:112,468-504 and
#     constrained to the JSON decoder :258-262) -----------------------

UDP_NOTIF_MEDIA_JSON = 1
_UDP_NOTIF_OPT_SEGMENT = 1

UDP_NOTIF_SCHEMA = T.StructType(
    [
        T.StructField("exporter_ip", T.StringType()),
        T.StructField("observation_domain", T.LongType()),
        T.StructField("message_id", T.LongType()),
        T.StructField("media_type", T.IntegerType()),
        T.StructField("payload_json", T.StringType()),
    ]
)


def encode_udp_notif(
    payload: bytes,
    observation_domain: int = 1,
    message_id: int = 0,
    media_type: int = UDP_NOTIF_MEDIA_JSON,
    segment: tuple[int, bool] | None = None,
) -> bytes:
    """One UDP-Notif datagram. ``segment=(number, is_last)`` adds the
    segmentation option (15-bit segment number + L flag)."""
    opts = b""
    if segment is not None:
        num, last = segment
        opts = bytes([_UDP_NOTIF_OPT_SEGMENT, 4]) + (
            (num << 1) | (1 if last else 0)
        ).to_bytes(2, "big")
    hlen = 12 + len(opts)
    header = (
        bytes([(1 << 5) | (media_type & 0x0F), hlen])
        + (hlen + len(payload)).to_bytes(2, "big")
        + int(observation_domain).to_bytes(4, "big")
        + int(message_id).to_bytes(4, "big")
        + opts
    )
    return header + payload


def decode_udp_notif(datagrams: DataFrame) -> DataFrame:
    """Decode UDP-Notif datagrams into per-message rows, reassembling
    segmented messages per (exporter, observation domain, message id)
    — segments of one message share the id and carry the segmentation
    option; the L-flagged segment closes it. Non-segmented messages
    pass straight through. Incomplete messages (missing segments) are
    dropped, as the unyte collector does."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in UDP_NOTIF_SCHEMA.fields]
        # per-partition reassembly state, keyed like the reference's
        # per-peer message bookkeeping
        pending: dict[tuple, dict] = {}
        for pdf in batches:
            rows = []
            for exporter, payload in zip(pdf["exporter_ip"], pdf["payload"]):
                b = bytes(payload)
                if len(b) < 12:
                    continue
                ver = b[0] >> 5
                media = b[0] & 0x0F
                hlen = b[1]
                mlen = int.from_bytes(b[2:4], "big")
                if ver != 1 or hlen < 12 or mlen > len(b):
                    continue  # malformed: drop the datagram
                od = int.from_bytes(b[4:8], "big")
                mid = int.from_bytes(b[8:12], "big")
                seg_num, seg_last = None, False
                p = 12
                while p + 2 <= hlen:
                    ot, ol = b[p], b[p + 1]
                    if ol < 2 or p + ol > hlen:
                        break
                    if ot == _UDP_NOTIF_OPT_SEGMENT and ol >= 4:
                        v = int.from_bytes(b[p + 2 : p + 4], "big")
                        seg_num, seg_last = v >> 1, bool(v & 1)
                    p += ol
                body = b[hlen:mlen]
                if seg_num is None:
                    rows.append((str(exporter), od, mid, media,
                                 body.decode("utf-8", "replace")))
                    continue
                key = (str(exporter), od, mid)
                st = pending.setdefault(key, {"parts": {}, "last": None})
                st["parts"][seg_num] = body
                if seg_last:
                    st["last"] = seg_num
                if st["last"] is not None and all(
                    i in st["parts"] for i in range(st["last"] + 1)
                ):
                    whole = b"".join(
                        st["parts"][i] for i in range(st["last"] + 1)
                    )
                    rows.append((key[0], od, mid, media,
                                 whole.decode("utf-8", "replace")))
                    del pending[key]
            yield pd.DataFrame(rows, columns=cols)

    return datagrams.mapInPandas(gen, UDP_NOTIF_SCHEMA)


# --------------------------------------------------------------------
# gRPC dial-out (the mdt_dialout.MdtDialout stream — transport in
# sources/grpc_wire.py; this is the in-plan message layer)
# --------------------------------------------------------------------

GRPC_DIALOUT_SCHEMA = T.StructType(
    [
        T.StructField("exporter_ip", T.StringType()),
        T.StructField("req_id", T.LongType()),
        T.StructField("errors", T.StringType()),
        # 'json' when the bridged payload is a JSON document (the
        # reference's collector-emits-JSON shape), else 'gpb' opaque
        T.StructField("decoder", T.StringType()),
        T.StructField("payload_json", T.StringType()),
        T.StructField("payload_raw", T.BinaryType()),
    ]
)


def decode_grpc_dialout(datagrams: DataFrame) -> DataFrame:
    """Decode per-row byte chunks of gRPC-framed MdtDialoutArgs
    messages (``[0][len][protobuf]``, the exact bytes a dial-out
    stream's DATA frames carry) into per-message rows. JSON payloads
    surface as strings, anything else as opaque GPB bytes — the same
    dispatch honesty as :func:`decode_cisco_mdt` (reference consumes
    these via the ZMQ bridge, src/telemetry/telemetry.c:120-134)."""
    import json as _json

    from pmacct_spark.sources.grpc_wire import (
        parse_grpc_messages,
        parse_mdt_dialout_args,
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in GRPC_DIALOUT_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for exporter, payload in zip(pdf["exporter_ip"], pdf["payload"]):
                msgs, tail = parse_grpc_messages(bytes(payload))
                if tail:
                    raise ValueError(
                        f"trailing {len(tail)} bytes after last gRPC frame"
                    )
                for m in msgs:
                    args = parse_mdt_dialout_args(m)
                    data = args["data"]
                    decoder, pj, pr = "gpb", None, data
                    if data[:1] == b"{":
                        try:
                            _json.loads(data)
                            decoder, pj, pr = (
                                "json", data.decode("utf-8"), None,
                            )
                        except (ValueError, UnicodeDecodeError):
                            pass
                    rows.append(
                        {
                            "exporter_ip": str(exporter),
                            "req_id": int(args["req_id"]),
                            "errors": args["errors"] or None,
                            "decoder": decoder,
                            "payload_json": pj,
                            "payload_raw": pr,
                        }
                    )
            yield pd.DataFrame(
                [[r.get(c) for c in cols] for r in rows], columns=cols
            )

    return datagrams.mapInPandas(gen, GRPC_DIALOUT_SCHEMA)


GRPC_DIALIN_SCHEMA = T.StructType(
    [
        T.StructField("router_ip", T.StringType()),
        T.StructField("res_req_id", T.LongType()),
        T.StructField("errors", T.StringType()),
        T.StructField("decoder", T.StringType()),
        T.StructField("payload_json", T.StringType()),
        T.StructField("payload_raw", T.BinaryType()),
    ]
)


def decode_grpc_dialin(datagrams: DataFrame) -> DataFrame:
    """Decode per-row byte chunks of gRPC-framed CreateSubsReply
    messages (the DATA-frame bytes a dial-in subscription streams back)
    into per-message rows — the dial-in twin of
    :func:`decode_grpc_dialout`, same JSON-vs-opaque-GPB dispatch."""
    import json as _json

    from pmacct_spark.sources.grpc_wire import (
        parse_create_subs_reply,
        parse_grpc_messages,
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in GRPC_DIALIN_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for router, payload in zip(pdf["exporter_ip"], pdf["payload"]):
                msgs, tail = parse_grpc_messages(bytes(payload))
                if tail:
                    raise ValueError(
                        f"trailing {len(tail)} bytes after last gRPC frame"
                    )
                for m in msgs:
                    reply = parse_create_subs_reply(m)
                    data = reply["data"]
                    decoder, pj, pr = "gpb", None, data
                    if data[:1] == b"{":
                        try:
                            _json.loads(data)
                            decoder, pj, pr = (
                                "json", data.decode("utf-8"), None,
                            )
                        except (ValueError, UnicodeDecodeError):
                            pass
                    rows.append(
                        {
                            "router_ip": str(router),
                            "res_req_id": int(reply["res_req_id"]),
                            "errors": reply["errors"] or None,
                            "decoder": decoder,
                            "payload_json": pj,
                            "payload_raw": pr,
                        }
                    )
            yield pd.DataFrame(
                [[r.get(c) for c in cols] for r in rows], columns=cols
            )

    return datagrams.mapInPandas(gen, GRPC_DIALIN_SCHEMA)
