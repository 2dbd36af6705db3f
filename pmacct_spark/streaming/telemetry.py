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

import struct
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


# --- GPB self-describing KV (Cisco MDT telemetry "big.proto":
#     Telemetry / TelemetryField, public cisco-ie/cisco-proto; the
#     reference dispatches gpb/gpb_kv payloads in
#     src/telemetry/telemetry_msg.c:150-246). The KV flavor is
#     SELF-DESCRIBING — every field carries its own name and value
#     type — so a generic varint/tag walker decodes it completely
#     without generated bindings. Only gpb_compact (positional fields
#     against a per-path .proto) genuinely needs platform schemas.


def _pb_read_varint(b: bytes, off: int) -> tuple[int, int]:
    x = s = 0
    while True:
        c = b[off]
        off += 1
        x |= (c & 0x7F) << s
        if not c & 0x80:
            return x, off
        s += 7


def _pb_walk(b: bytes):
    """Yield (field_no, wire_type, value) over one message's bytes.
    wt 0 -> int, wt 1/5 -> 8/4 raw bytes, wt 2 -> bytes."""
    off, n = 0, len(b)
    while off < n:
        key, off = _pb_read_varint(b, off)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            val, off = _pb_read_varint(b, off)
        elif wt == 1:
            val, off = b[off : off + 8], off + 8
        elif wt == 2:
            ln, off = _pb_read_varint(b, off)
            val, off = b[off : off + ln], off + ln
        elif wt == 5:
            val, off = b[off : off + 4], off + 4
        else:
            raise ValueError(f"unsupported protobuf wire type {wt}")
        yield fno, wt, val


def _kv_leaves(buf: bytes, prefix: tuple[str, ...]) -> list[tuple[str, object]]:
    """Flatten one TelemetryField subtree to [(joined_name, value)].
    Field numbers per the public big.proto: 2 name; 4 bytes / 5 string
    / 6 bool / 7 uint32 / 8 uint64 / 9 sint32 / 10 sint64 / 11 double
    / 12 float (the value_by_type oneof); 15 nested fields."""
    name = ""
    value: object | None = None
    children: list[bytes] = []
    for fno, wt, val in _pb_walk(buf):
        if fno == 2 and wt == 2:
            name = val.decode("utf-8", "replace")
        elif fno == 4 and wt == 2:
            value = bytes(val)
        elif fno == 5 and wt == 2:
            value = val.decode("utf-8", "replace")
        elif fno == 6 and wt == 0:
            value = bool(val)
        elif fno in (7, 8) and wt == 0:
            value = int(val)
        elif fno in (9, 10) and wt == 0:  # zigzag
            value = (val >> 1) ^ -(val & 1)
        elif fno == 11 and wt == 1:
            value = struct.unpack("<d", val)[0]
        elif fno == 12 and wt == 5:
            value = struct.unpack("<f", val)[0]
        elif fno == 15 and wt == 2:
            children.append(val)
    path = prefix + ((name,) if name else ())
    if children:
        out: list[tuple[str, object]] = []
        for c in children:
            out.extend(_kv_leaves(c, path))
        return out
    if value is None:
        return []
    return [("/".join(path), value)]


def decode_gpb_kv(raw: bytes) -> dict:
    """Parse one self-describing-KV Telemetry message: header strings
    (node_id_str=1, subscription_id_str=3, encoding_path=6,
    msg_timestamp=10) plus the data_gpbkv (11) trees flattened to
    (slash-joined name, typed value) leaves."""
    out: dict = {
        "node_id": None,
        "subscription_id": None,
        "encoding_path": None,
        "msg_timestamp": None,
        "fields": [],
    }
    for fno, wt, val in _pb_walk(raw):
        if fno == 1 and wt == 2:
            out["node_id"] = val.decode("utf-8", "replace")
        elif fno == 3 and wt == 2:
            out["subscription_id"] = val.decode("utf-8", "replace")
        elif fno == 6 and wt == 2:
            out["encoding_path"] = val.decode("utf-8", "replace")
        elif fno == 10 and wt == 0:
            out["msg_timestamp"] = int(val)
        elif fno == 11 and wt == 2:
            out["fields"].extend(_kv_leaves(val, ()))
    return out


def _pb_varint(x: int) -> bytes:
    # Varints encode UNSIGNED 64-bit values; negatives must arrive
    # pre-masked (two's complement) or zigzag-encoded by the caller —
    # `x >>= 7` on a negative Python int never reaches 0 and would
    # spin forever, so reject instead of hanging the executor.
    if x < 0:
        raise ValueError(
            f"_pb_varint requires a non-negative int, got {x}; "
            "mask to 64 bits (x & (1<<64)-1) or zigzag-encode first"
        )
    out = bytearray()
    while True:
        b7 = x & 0x7F
        x >>= 7
        if x:
            out.append(b7 | 0x80)
        else:
            out.append(b7)
            return bytes(out)


def _pb_field(fno: int, wt: int, payload: bytes | int) -> bytes:
    key = _pb_varint((fno << 3) | wt)
    if wt == 0:
        # int64/uint64 varint semantics: a negative int64 goes on the
        # wire as its 64-bit two's complement (10-byte varint), the
        # same bytes protoc emits for e.g. msg_timestamp = -1.
        return key + _pb_varint(int(payload) & ((1 << 64) - 1))
    if wt == 2:
        return key + _pb_varint(len(payload)) + payload
    return key + payload  # wt 1 / 5: caller passes fixed-width bytes


def _encode_kv_field(name: str, value) -> bytes:
    """One TelemetryField: leaf for scalars, nested tree for dicts."""
    body = _pb_field(2, 2, name.encode())
    if isinstance(value, dict):
        for k, v in value.items():
            body += _pb_field(15, 2, _encode_kv_field(k, v))
    elif isinstance(value, bool):
        body += _pb_field(6, 0, int(value))
    elif isinstance(value, int):
        if value >= 0:
            body += _pb_field(8, 0, value)  # uint64_value
        else:  # sint64_value, zigzag
            body += _pb_field(10, 0, ((value << 1) ^ (value >> 63)) & ((1 << 64) - 1))
    elif isinstance(value, float):
        body += _pb_field(11, 1, struct.pack("<d", value))
    elif isinstance(value, bytes):
        body += _pb_field(4, 2, value)
    else:
        body += _pb_field(5, 2, str(value).encode())
    return body


def encode_gpb_kv(
    node_id: str,
    encoding_path: str,
    kv: dict,
    msg_timestamp: int = 0,
    subscription_id: str = "sub0",
) -> bytes:
    """One self-describing-KV Telemetry message (test/export side)."""
    msg = (
        _pb_field(1, 2, node_id.encode())
        + _pb_field(3, 2, subscription_id.encode())
        + _pb_field(6, 2, encoding_path.encode())
        + _pb_field(10, 0, msg_timestamp)
        + _pb_field(11, 2, _encode_kv_field("keys", {}))
        + _pb_field(11, 2, _encode_kv_field("content", kv))
    )
    return msg


GPB_KV_SCHEMA = T.StructType(
    [
        T.StructField("exporter_ip", T.StringType()),
        T.StructField("seqno", T.LongType()),
        T.StructField("node_id", T.StringType()),
        T.StructField("encoding_path", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("uval", T.LongType()),
        T.StructField("sval", T.StringType()),
    ]
)


def decode_gpb_kv_fields(msgs: DataFrame) -> DataFrame:
    """Explode decoder='gpb_kv' messages into one row per KV leaf —
    integer-family values in ``uval``, everything else rendered to
    ``sval``. Arrow-batched; non-KV rows pass through untouched
    upstream (filter on decoder first to prune the scan)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in GPB_KV_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.decoder != "gpb_kv" or r.payload_raw is None:
                    continue
                t = decode_gpb_kv(bytes(r.payload_raw))
                for name, v in t["fields"]:
                    is_int = isinstance(v, (bool, int))
                    rows.append(
                        (
                            str(r.exporter_ip),
                            int(r.seqno),
                            t["node_id"],
                            t["encoding_path"],
                            name,
                            int(v) if is_int else None,
                            None if is_int else str(v),
                        )
                    )
            yield pd.DataFrame(rows, columns=cols)

    return msgs.mapInPandas(gen, GPB_KV_SCHEMA)


def decode_gpb_compact(raw: bytes, fields: dict) -> dict:
    """Declarative compact-GPB decode — the schema the platform would
    generate from the per-encoding-path .proto, supplied as data:
    ``fields`` maps field_no -> (name, kind) with kind in {'uint',
    'sint', 'bool', 'string', 'bytes', 'double', 'float'}, or
    field_no -> (name, nested_fields_dict) for a sub-message (decoded
    recursively; repeated sub-messages accumulate into a list). The
    same declarative-schema-as-config idea as CustomIE for IPFIX
    enterprise IEs. Unknown field numbers are skipped, as protobuf
    requires."""
    out: dict = {}
    for fno, wt, val in _pb_walk(raw):
        spec = fields.get(fno)
        if spec is None:
            continue
        name, kind = spec
        if isinstance(kind, dict):
            child = decode_gpb_compact(val, kind)
            if name in out:
                prev = out[name]
                out[name] = (prev if isinstance(prev, list) else [prev])
                out[name].append(child)
            else:
                out[name] = child
        elif kind == "uint":
            out[name] = int(val)
        elif kind == "sint":
            out[name] = (val >> 1) ^ -(val & 1)
        elif kind == "bool":
            out[name] = bool(val)
        elif kind == "string":
            out[name] = val.decode("utf-8", "replace")
        elif kind == "bytes":
            out[name] = bytes(val)
        elif kind == "double":
            out[name] = struct.unpack("<d", val)[0]
        elif kind == "float":
            out[name] = struct.unpack("<f", val)[0]
        else:
            raise ValueError(f"unknown gpb field kind: {kind!r}")
    return out


def decode_gpb_payload(raw: bytes, kind: str = "gpb_kv", fields: dict | None = None):
    """Self-describing KV decodes natively (``decode_gpb_kv`` — no
    bindings needed). Compact GPB decodes when the per-path schema is
    supplied declaratively (``fields`` — see ``decode_gpb_compact``);
    without a schema the payload stays opaque by protobuf's nature
    (positional fields carry no names or value types)."""
    if kind == "gpb_kv":
        return decode_gpb_kv(raw)
    if fields is not None:
        return decode_gpb_compact(raw, fields)
    raise NotImplementedError(
        "compact GPB decode requires the per-path schema (pass "
        "fields={field_no: (name, kind)}); payload_raw carries the "
        "intact message bytes"
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
