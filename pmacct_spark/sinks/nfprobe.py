"""nfprobe sink: re-export flow records as NetFlow v5 datagrams
(reference src/nfprobe_plugin/nfprobe_plugin.c:120-187 — pmacct's
collector side becomes an exporter; v5 pack in
src/nfprobe_plugin/netflow5.c).

Arrow-batched ``mapInPandas`` encoder: each partition packs its rows
into datagrams of <= 30 records (the v5 on-wire maximum), emitting
``(exporter_ip, payload: binary)`` rows a downstream UDP forwarder (or
test) consumes. Timestamps are encoded sysuptime-relative exactly as
the decoder expects, so encode -> decode is lossless for the v5 field
set.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

import struct

from pmacct_spark.streaming.decode import V5_HEADER_FMT, V5_RECORD_FMT

V5_MAX_RECORDS = 30

DATAGRAM_SCHEMA = T.StructType(
    [
        T.StructField("exporter_ip", T.StringType()),
        T.StructField("seqno", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

_COLS = (
    "ip_src_i", "ip_dst_i", "iface_in", "iface_out", "packets", "bytes",
    "ts_ms", "end_ts_ms", "port_src", "port_dst", "tcp_flags", "ip_proto",
    "tos", "as_src", "as_dst",
)


def encode_v5(
    flows: DataFrame,
    exporter_ip: str = "127.0.0.1",
    engine: tuple[int, int] = (0, 0),
) -> DataFrame:
    """Pack flow rows into NetFlow v5 datagrams. ``flows`` needs the
    decoder's column set (streaming.decode.FLOW_SCHEMA names).
    ``engine`` is nfprobe_engine's v5 form (CONFIG-KEYS:2550):
    (engine_type, engine_id), each 8-bit, header bytes 20-21."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from pmacct_spark.streaming.decode import _v5_rec_dtype

        hdr_st = struct.Struct(V5_HEADER_FMT)
        dt = _v5_rec_dtype()
        seqno = 0  # v5 seqno counts total flows exported (per stream)
        for pdf in batches:
            # vectorized pack: fill one structured array for the whole
            # batch, then slice 30-record datagrams out of it (first/
            # last are chunk-base-relative, patched per slice)
            n = len(pdf)
            rec = np.zeros(n, dtype=dt)
            col = {c: pdf[c].to_numpy() for c in _COLS}
            rec["src"] = col["ip_src_i"]
            rec["dst"] = col["ip_dst_i"]
            rec["inp"] = col["iface_in"]
            rec["outp"] = col["iface_out"]
            rec["pkts"] = col["packets"]
            rec["octets"] = col["bytes"]
            rec["sport"] = col["port_src"]
            rec["dport"] = col["port_dst"]
            rec["flags"] = col["tcp_flags"]
            rec["proto"] = col["ip_proto"]
            rec["tos"] = col["tos"]
            rec["sas"] = col["as_src"].astype(np.int64) & 0xFFFF
            rec["das"] = col["as_dst"].astype(np.int64) & 0xFFFF
            ts = col["ts_ms"].astype(np.int64)
            end = col["end_ts_ms"].astype(np.int64)
            out = []
            for lo in range(0, n, V5_MAX_RECORDS):
                hi = min(lo + V5_MAX_RECORDS, n)
                base_ms = int(ts[lo:hi].min())
                chunk = rec[lo:hi].copy()
                chunk["first"] = ts[lo:hi] - base_ms
                chunk["last"] = end[lo:hi] - base_ms
                hdr = hdr_st.pack(
                    5, hi - lo, 0, base_ms // 1000,
                    (base_ms % 1000) * 1_000_000, seqno,
                    engine[0] & 0xFF, engine[1] & 0xFF, 1,
                )
                out.append((exporter_ip, seqno, hdr + chunk.tobytes()))
                seqno += hi - lo
            yield pd.DataFrame(out, columns=["exporter_ip", "seqno", "payload"])

    return flows.mapInPandas(gen, DATAGRAM_SCHEMA)


# ---------------------------------------------------------------------------
# NetFlow v9 export (template + data flowsets)
# ---------------------------------------------------------------------------

V9_TEMPLATE_ID = 256
V9_MAX_RECORDS = 30

# (IE, length) field list for the export template — IEs from the
# decoder's V9_IE_COLUMNS; 8-byte timestamps so epoch-ms fits.
V9_EXPORT_FIELDS = (
    (8, 4), (12, 4), (10, 4), (14, 4), (2, 4), (1, 4),
    (22, 8), (21, 8), (7, 2), (11, 2), (6, 1), (4, 1), (5, 1),
    (16, 4), (17, 4),
)


def _v9_export_fields(
    tstamp_usec: bool = False, with_direction: bool = False
):
    """nfprobe_tstamp_usec (CONFIG-KEYS:2613): IEs 154/155 at length
    16 — two 8-byte values (seconds, then microseconds), exactly the
    reference's encode (src/nfprobe_plugin/netflow9.c:1723-1736) —
    replace the 8-byte epoch-ms 22/21 pair. ``with_direction``
    (nfprobe_direction, :2575) appends DIRECTION (IE 61, 1 byte:
    0=ingress, 1=egress), as the reference's template does when the
    knob is configured."""
    fields = V9_EXPORT_FIELDS
    if tstamp_usec:
        fields = tuple(
            [(154, 16) if f == (22, 8) else (155, 16) if f == (21, 8)
             else f for f in fields]
        )
    if with_direction:
        fields = fields + ((61, 1),)
    return fields


def _v9_rec_dtype(tstamp_usec: bool = False, with_direction: bool = False):
    import numpy as np

    time_fields = (
        [("first_s", ">u8"), ("first_us", ">u8"),
         ("last_s", ">u8"), ("last_us", ">u8")]
        if tstamp_usec
        else [("first", ">u8"), ("last", ">u8")]
    )
    dt = np.dtype(
        [
            ("src", ">u4"), ("dst", ">u4"), ("inp", ">u4"), ("outp", ">u4"),
            ("pkts", ">u4"), ("octets", ">u4"),
            *time_fields,
            ("sport", ">u2"), ("dport", ">u2"),
            ("flags", "u1"), ("proto", "u1"), ("tos", "u1"),
            ("sas", ">u4"), ("das", ">u4"),
            *([("dirn", "u1")] if with_direction else []),
        ]
    )
    assert dt.itemsize == sum(
        ln for _, ln in _v9_export_fields(tstamp_usec, with_direction)
    )
    return dt


def encode_v9(
    flows: DataFrame,
    exporter_ip: str = "127.0.0.1",
    source_id: int = 1,
    tstamp_usec: bool = False,
    with_direction: bool = False,
) -> DataFrame:
    """Pack flow rows into NetFlow v9: one template datagram first, then
    30-record data flowsets — the stateful-decode contract (template
    must precede data within the stream; reference nfprobe v9 export,
    src/nfprobe_plugin/netflow9.c). Vectorized like encode_v5."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        fields = _v9_export_fields(tstamp_usec, with_direction)
        dt = _v9_rec_dtype(tstamp_usec, with_direction)
        hdr = struct.Struct("!HHIIII")  # V9_HEADER_FMT
        tmpl_body = struct.pack(
            "!HH", V9_TEMPLATE_ID, len(fields)
        ) + b"".join(struct.pack("!HH", ie, ln) for ie, ln in fields)
        tmpl_set = struct.pack("!HH", 0, 4 + len(tmpl_body)) + tmpl_body
        seqno = 0
        sent_template = False
        for pdf in batches:
            n = len(pdf)
            out = []
            if not sent_template and n:
                out.append(
                    (
                        exporter_ip,
                        seqno,
                        hdr.pack(9, 1, 0, 0, seqno, source_id) + tmpl_set,
                    )
                )
                sent_template = True
                seqno += 1
            if n:
                rec = np.zeros(n, dtype=dt)
                rec["src"] = pdf["ip_src_i"].to_numpy()
                rec["dst"] = pdf["ip_dst_i"].to_numpy()
                rec["inp"] = pdf["iface_in"].to_numpy()
                rec["outp"] = pdf["iface_out"].to_numpy()
                rec["pkts"] = pdf["packets"].to_numpy()
                rec["octets"] = pdf["bytes"].to_numpy()
                if tstamp_usec:
                    # caller supplies epoch-microsecond columns
                    tus = pdf["ts_us"].to_numpy().astype(np.uint64)
                    eus = pdf["end_ts_us"].to_numpy().astype(np.uint64)
                    rec["first_s"] = tus // 1_000_000
                    rec["first_us"] = tus % 1_000_000
                    rec["last_s"] = eus // 1_000_000
                    rec["last_us"] = eus % 1_000_000
                else:
                    rec["first"] = pdf["ts_ms"].to_numpy().astype(
                        np.uint64
                    )
                    rec["last"] = pdf["end_ts_ms"].to_numpy().astype(
                        np.uint64
                    )
                rec["sport"] = pdf["port_src"].to_numpy()
                rec["dport"] = pdf["port_dst"].to_numpy()
                rec["flags"] = pdf["tcp_flags"].to_numpy().astype(np.int64) & 0xFF
                rec["proto"] = pdf["ip_proto"].to_numpy()
                rec["tos"] = pdf["tos"].to_numpy()
                rec["sas"] = pdf["as_src"].to_numpy()
                rec["das"] = pdf["as_dst"].to_numpy()
                if with_direction:
                    rec["dirn"] = (
                        pdf["direction"].to_numpy().astype(np.int64)
                        & 0xFF
                    )
                blob = rec.tobytes()
                sz = dt.itemsize
                for lo in range(0, n, V9_MAX_RECORDS):
                    hi = min(lo + V9_MAX_RECORDS, n)
                    body = blob[lo * sz : hi * sz]
                    pad = (-len(body)) % 4
                    fs = (
                        struct.pack("!HH", V9_TEMPLATE_ID, 4 + len(body) + pad)
                        + body
                        + b"\x00" * pad
                    )
                    out.append(
                        (
                            exporter_ip,
                            seqno,
                            hdr.pack(9, hi - lo, 0, 0, seqno, source_id) + fs,
                        )
                    )
                    seqno += 1
            yield pd.DataFrame(out, columns=["exporter_ip", "seqno", "payload"])

    return flows.mapInPandas(gen, DATAGRAM_SCHEMA)


# ---------------------------------------------------------------------------
# IPFIX v6 export: IPv6 address IEs + prefix lengths + flowLabel + a
# variable-length vrfName IE (RFC 7011 §7). Mirrors the decoder's
# extended IE families (streaming.decode: V6_ADDR_IES / EXT_UINT_IES /
# VLEN_STR_IES; reference IE tables src/nfv9_template.c:1179, vlen
# resolution src/nfv9_template.h:333).
# ---------------------------------------------------------------------------

V6_TEMPLATE_ID = 257
# order matters: decode walks fields in template order
V6_EXPORT_FIELDS = (
    (27, 16), (28, 16), (62, 16),     # sourceIPv6Address, destinationIPv6Address, ipNextHopIPv6Address
    (29, 1), (30, 1),                 # sourceIPv6PrefixLength, destinationIPv6PrefixLength
    (31, 4),                          # flowLabelIPv6
    (1, 4), (2, 4),                   # octetDeltaCount, packetDeltaCount
    (7, 2), (11, 2), (4, 1),          # ports, protocolIdentifier
    (236, 65535),                     # vrfName (VARIABLE length)
)
V6_MAX_RECORDS = 30


def _v6_addr_bytes(s: str) -> bytes:
    return bytes.fromhex(s.replace(":", ""))


def encode_ipfix6(
    flows: DataFrame,
    exporter_ip: str = "127.0.0.1",
    domain: int = 6,
    with_srv6: bool = False,
) -> DataFrame:
    """Pack dual-stack flow rows into IPFIX messages with IPv6 +
    variable-length IEs. ``flows`` needs columns: ip6_src, ip6_dst,
    ip6_nexthop, mask6_src, mask6_dst, flow_label, bytes, packets,
    port_src, port_dst, ip_proto, vrf_name.

    Records are variable-length (vrfName); alternating rows use the
    1-byte short form and the 255-escape long form so BOTH wire
    encodings round-trip through the decoder. ``with_srv6`` appends a
    second vlen IE (srhSegmentIPv6ListSection 497, reference
    src/nfv9_template.h:188) carrying the row's ``srv6_segs`` —
    a csv of uncompressed v6 addresses — as concatenated 16-byte
    segments."""
    fields = V6_EXPORT_FIELDS + ((497, 65535),) if with_srv6 else V6_EXPORT_FIELDS

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tmpl_body = struct.pack(
            "!HH", V6_TEMPLATE_ID, len(fields)
        ) + b"".join(struct.pack("!HH", ie, ln) for ie, ln in fields)
        tmpl_set = struct.pack("!HH", 2, 4 + len(tmpl_body)) + tmpl_body
        seqno = 0
        sent_template = False

        def msg(sets: bytes, seq: int) -> bytes:
            return struct.pack("!HHIII", 10, 16 + len(sets), 0, seq, domain) + sets

        for pdf in batches:
            n = len(pdf)
            out = []
            if not sent_template and n:
                out.append((exporter_ip, seqno, msg(tmpl_set, seqno)))
                sent_template = True
                seqno += 1
            recs: list[bytes] = []
            for i, r in enumerate(pdf.itertuples(index=False)):
                vrf = str(r.vrf_name).encode("utf-8")
                if i % 2 == 0 and len(vrf) < 255:
                    vl = bytes([len(vrf)]) + vrf
                else:  # 255-escape long form (valid for any length)
                    vl = b"\xff" + len(vrf).to_bytes(2, "big") + vrf
                if with_srv6:
                    segs = b"".join(
                        _v6_addr_bytes(s)
                        for s in str(r.srv6_segs).split(",")
                        if s
                    )
                    # RFC 7011 §7: short form only below 255; a 16+
                    # segment list (256 bytes) needs the 255-escape,
                    # same as the vrf field above.
                    if len(segs) < 255:
                        vl += bytes([len(segs)]) + segs
                    else:
                        vl += b"\xff" + len(segs).to_bytes(2, "big") + segs
                recs.append(
                    _v6_addr_bytes(r.ip6_src)
                    + _v6_addr_bytes(r.ip6_dst)
                    + _v6_addr_bytes(r.ip6_nexthop)
                    + struct.pack(
                        "!BBIIIHHB",
                        int(r.mask6_src) & 0xFF,
                        int(r.mask6_dst) & 0xFF,
                        int(r.flow_label) & 0xFFFFFFFF,
                        int(r.bytes) & 0xFFFFFFFF,
                        int(r.packets) & 0xFFFFFFFF,
                        int(r.port_src) & 0xFFFF,
                        int(r.port_dst) & 0xFFFF,
                        int(r.ip_proto) & 0xFF,
                    )
                    + vl
                )
            for lo in range(0, len(recs), V6_MAX_RECORDS):
                body = b"".join(recs[lo : lo + V6_MAX_RECORDS])
                pad = (-len(body)) % 4
                ds = (
                    struct.pack("!HH", V6_TEMPLATE_ID, 4 + len(body) + pad)
                    + body
                    + b"\x00" * pad
                )
                out.append((exporter_ip, seqno, msg(ds, seqno)))
                seqno += 1
            yield pd.DataFrame(out, columns=["exporter_ip", "seqno", "payload"])

    return flows.mapInPandas(gen, DATAGRAM_SCHEMA)


# Tunnel export: layer2SegmentId IE 351 (8 bytes: type byte 0x01
# VXLAN / 0x02 NVGRE + low-3-byte segment id; reference
# src/nfv9_template.h:180,242, handler src/pkt_handlers.c:4624-4662).
TUNNEL_TEMPLATE_ID = 258
TUNNEL_EXPORT_FIELDS = (
    (8, 4), (12, 4),          # src/dst IPv4
    (1, 4), (2, 4),           # octets, packets
    (4, 1),                   # protocolIdentifier
    (351, 8),                 # layer2SegmentId
)


def encode_ipfix_tunnel(
    flows: DataFrame, exporter_ip: str = "127.0.0.1", domain: int = 7
) -> DataFrame:
    """Pack tunnel-bearing flow rows into IPFIX with layer2SegmentId.
    ``flows`` needs: ip_src_i, ip_dst_i, bytes, packets, ip_proto,
    l2sid (the pre-composed 8-byte value: type<<56 | segment-id)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        dt = np.dtype(
            [
                ("src", ">u4"), ("dst", ">u4"),
                ("octets", ">u4"), ("pkts", ">u4"),
                ("proto", "u1"), ("l2sid", ">u8"),
            ]
        )
        assert dt.itemsize == sum(ln for _, ln in TUNNEL_EXPORT_FIELDS)
        tmpl_body = struct.pack(
            "!HH", TUNNEL_TEMPLATE_ID, len(TUNNEL_EXPORT_FIELDS)
        ) + b"".join(struct.pack("!HH", ie, ln) for ie, ln in TUNNEL_EXPORT_FIELDS)
        tmpl_set = struct.pack("!HH", 2, 4 + len(tmpl_body)) + tmpl_body
        seqno = 0
        sent_template = False

        def msg(sets: bytes, seq: int) -> bytes:
            return struct.pack("!HHIII", 10, 16 + len(sets), 0, seq, domain) + sets

        for pdf in batches:
            n = len(pdf)
            out = []
            if not sent_template and n:
                out.append((exporter_ip, seqno, msg(tmpl_set, seqno)))
                sent_template = True
                seqno += 1
            if n:
                rec = np.zeros(n, dtype=dt)
                rec["src"] = pdf["ip_src_i"].to_numpy()
                rec["dst"] = pdf["ip_dst_i"].to_numpy()
                rec["octets"] = pdf["bytes"].to_numpy()
                rec["pkts"] = pdf["packets"].to_numpy()
                rec["proto"] = pdf["ip_proto"].to_numpy()
                rec["l2sid"] = pdf["l2sid"].to_numpy().astype(np.uint64)
                blob = rec.tobytes()
                sz = dt.itemsize
                for lo in range(0, n, V9_MAX_RECORDS):
                    hi = min(lo + V9_MAX_RECORDS, n)
                    body = blob[lo * sz : hi * sz]
                    pad = (-len(body)) % 4
                    ds = (
                        struct.pack(
                            "!HH", TUNNEL_TEMPLATE_ID, 4 + len(body) + pad
                        )
                        + body
                        + b"\x00" * pad
                    )
                    out.append((exporter_ip, seqno, msg(ds, seqno)))
                    seqno += 1
            yield pd.DataFrame(out, columns=["exporter_ip", "seqno", "payload"])

    return flows.mapInPandas(gen, DATAGRAM_SCHEMA)


# NAT export: post-NAT addresses/ports + natEvent (reference
# NF9_POST_NAT_* / NF9_NAT_EVENT src/nfv9_template.h:149-154).
NAT_TEMPLATE_ID = 259
NAT_EXPORT_FIELDS = (
    (225, 4), (226, 4),   # postNATSource/DestinationIPv4Address
    (227, 2), (228, 2),   # postNAPT ports
    (230, 1),             # natEvent
    (1, 4), (2, 4), (4, 1),
)


def encode_ipfix_nat(
    flows: DataFrame, exporter_ip: str = "127.0.0.1", domain: int = 8
) -> DataFrame:
    """Pack NAT-event rows into IPFIX. ``flows`` needs:
    post_nat_ip_src_i, post_nat_ip_dst_i, post_nat_port_src,
    post_nat_port_dst, nat_event, bytes, packets, ip_proto."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        dt = np.dtype(
            [
                ("pnsrc", ">u4"), ("pndst", ">u4"),
                ("pnsp", ">u2"), ("pndp", ">u2"), ("nev", "u1"),
                ("octets", ">u4"), ("pkts", ">u4"), ("proto", "u1"),
            ]
        )
        assert dt.itemsize == sum(ln for _, ln in NAT_EXPORT_FIELDS)
        tmpl_body = struct.pack(
            "!HH", NAT_TEMPLATE_ID, len(NAT_EXPORT_FIELDS)
        ) + b"".join(struct.pack("!HH", ie, ln) for ie, ln in NAT_EXPORT_FIELDS)
        tmpl_set = struct.pack("!HH", 2, 4 + len(tmpl_body)) + tmpl_body
        seqno, sent_template = 0, False

        def msg(sets: bytes, seq: int) -> bytes:
            return struct.pack("!HHIII", 10, 16 + len(sets), 0, seq, domain) + sets

        for pdf in batches:
            n = len(pdf)
            out = []
            if not sent_template and n:
                out.append((exporter_ip, seqno, msg(tmpl_set, seqno)))
                sent_template = True
                seqno += 1
            if n:
                rec = np.zeros(n, dtype=dt)
                rec["pnsrc"] = pdf["post_nat_ip_src_i"].to_numpy()
                rec["pndst"] = pdf["post_nat_ip_dst_i"].to_numpy()
                rec["pnsp"] = pdf["post_nat_port_src"].to_numpy()
                rec["pndp"] = pdf["post_nat_port_dst"].to_numpy()
                rec["nev"] = pdf["nat_event"].to_numpy()
                rec["octets"] = pdf["bytes"].to_numpy()
                rec["pkts"] = pdf["packets"].to_numpy()
                rec["proto"] = pdf["ip_proto"].to_numpy()
                blob = rec.tobytes()
                sz = dt.itemsize
                for lo in range(0, n, V9_MAX_RECORDS):
                    hi = min(lo + V9_MAX_RECORDS, n)
                    body = blob[lo * sz : hi * sz]
                    pad = (-len(body)) % 4
                    ds = (
                        struct.pack("!HH", NAT_TEMPLATE_ID, 4 + len(body) + pad)
                        + body + b"\x00" * pad
                    )
                    out.append((exporter_ip, seqno, msg(ds, seqno)))
                    seqno += 1
            yield pd.DataFrame(out, columns=["exporter_ip", "seqno", "payload"])

    return flows.mapInPandas(gen, DATAGRAM_SCHEMA)


# MPLS export: 3-byte label IEs 70/71 (reference NF9_MPLS_LABEL_1..10
# src/nfv9_template.h:99-108; label value in the top 20 bits).
MPLS_TEMPLATE_ID = 260
MPLS_EXPORT_FIELDS = ((70, 3), (71, 3), (1, 4), (2, 4), (4, 1))


def encode_ipfix_mpls(
    flows: DataFrame, exporter_ip: str = "127.0.0.1", domain: int = 9
) -> DataFrame:
    """Pack MPLS-labeled rows into IPFIX: label IEs are 3 bytes with
    the 20-bit label pre-shifted (<< 4). ``flows`` needs:
    mpls_label_top, mpls_label_bottom, bytes, packets, ip_proto."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        dt = np.dtype(
            [
                ("l1a", "u1"), ("l1b", "u1"), ("l1c", "u1"),
                ("l2a", "u1"), ("l2b", "u1"), ("l2c", "u1"),
                ("octets", ">u4"), ("pkts", ">u4"), ("proto", "u1"),
            ]
        )
        assert dt.itemsize == sum(ln for _, ln in MPLS_EXPORT_FIELDS)
        tmpl_body = struct.pack(
            "!HH", MPLS_TEMPLATE_ID, len(MPLS_EXPORT_FIELDS)
        ) + b"".join(struct.pack("!HH", ie, ln) for ie, ln in MPLS_EXPORT_FIELDS)
        tmpl_set = struct.pack("!HH", 2, 4 + len(tmpl_body)) + tmpl_body
        seqno, sent_template = 0, False

        def msg(sets: bytes, seq: int) -> bytes:
            return struct.pack("!HHIII", 10, 16 + len(sets), 0, seq, domain) + sets

        for pdf in batches:
            n = len(pdf)
            out = []
            if not sent_template and n:
                out.append((exporter_ip, seqno, msg(tmpl_set, seqno)))
                sent_template = True
                seqno += 1
            if n:
                rec = np.zeros(n, dtype=dt)
                top = pdf["mpls_label_top"].to_numpy().astype(np.int64) << 4
                bot = pdf["mpls_label_bottom"].to_numpy().astype(np.int64) << 4
                rec["l1a"], rec["l1b"], rec["l1c"] = (
                    (top >> 16) & 0xFF, (top >> 8) & 0xFF, top & 0xFF
                )
                rec["l2a"], rec["l2b"], rec["l2c"] = (
                    (bot >> 16) & 0xFF, (bot >> 8) & 0xFF, bot & 0xFF
                )
                rec["octets"] = pdf["bytes"].to_numpy()
                rec["pkts"] = pdf["packets"].to_numpy()
                rec["proto"] = pdf["ip_proto"].to_numpy()
                blob = rec.tobytes()
                sz = dt.itemsize
                for lo in range(0, n, V9_MAX_RECORDS):
                    hi = min(lo + V9_MAX_RECORDS, n)
                    body = blob[lo * sz : hi * sz]
                    pad = (-len(body)) % 4
                    ds = (
                        struct.pack("!HH", MPLS_TEMPLATE_ID, 4 + len(body) + pad)
                        + body + b"\x00" * pad
                    )
                    out.append((exporter_ip, seqno, msg(ds, seqno)))
                    seqno += 1
            yield pd.DataFrame(out, columns=["exporter_ip", "seqno", "payload"])

    return flows.mapInPandas(gen, DATAGRAM_SCHEMA)


# Custom-primitive export (aggregate_primitives map on the wire:
# reference src/cfg.h:45-63): vendor IEs carry the enterprise bit +
# 4-byte PEN in the template field spec (RFC 7011 §3.2).
CUSTOM_TEMPLATE_ID = 261


def encode_ipfix_custom(
    flows: DataFrame,
    customs: list,
    exporter_ip: str = "127.0.0.1",
    domain: int = 11,
) -> DataFrame:
    """Pack rows into IPFIX where each :class:`CustomIE` in ``customs``
    becomes an (enterprise) template field of its declared length,
    followed by the standard counters (1, 2, 4). ``flows`` needs one
    column per custom name + bytes, packets, ip_proto. u_int customs
    encode big-endian; string customs encode utf-8, null-padded to the
    declared width."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tmpl_body = struct.pack(
            "!HH", CUSTOM_TEMPLATE_ID, len(customs) + 3
        )
        for c in customs:
            if c.pen:
                tmpl_body += struct.pack("!HHI", 0x8000 | c.ie, c.length, c.pen)
            else:
                tmpl_body += struct.pack("!HH", c.ie, c.length)
        for ie, ln in ((1, 4), (2, 4), (4, 1)):
            tmpl_body += struct.pack("!HH", ie, ln)
        tmpl_set = struct.pack("!HH", 2, 4 + len(tmpl_body)) + tmpl_body
        seqno, sent_template = 0, False

        def msg(sets: bytes, seq: int) -> bytes:
            return struct.pack("!HHIII", 10, 16 + len(sets), 0, seq, domain) + sets

        import numpy as np

        # vectorized record pack: u_int customs fold into big-endian
        # byte columns, string customs null-pad via S-dtype assignment
        dt_fields = []
        for i, c in enumerate(customs):
            if c.semantics == "u_int" and c.length in (1, 2, 4, 8):
                dt_fields.append((f"c{i}", f">u{c.length}"))
            else:
                dt_fields.append((f"c{i}", f"S{c.length}"))
        dt_fields += [("octets", ">u4"), ("pkts", ">u4"), ("proto", "u1")]
        dt = np.dtype(dt_fields)

        for pdf in batches:
            n = len(pdf)
            out = []
            if not sent_template and n:
                out.append((exporter_ip, seqno, msg(tmpl_set, seqno)))
                sent_template = True
                seqno += 1
            if n:
                rec = np.zeros(n, dtype=dt)
                for i, c in enumerate(customs):
                    col = pdf[c.name]
                    if dt[f"c{i}"].kind != "S":
                        rec[f"c{i}"] = col.to_numpy().astype(np.int64)
                    elif c.semantics == "u_int":
                        # odd-width uint (e.g. 3 bytes): big-endian
                        # byte split into the S-field
                        v = col.to_numpy().astype(np.int64)
                        bts = np.zeros((n, c.length), dtype=np.uint8)
                        for j in range(c.length):
                            bts[:, c.length - 1 - j] = (v >> (8 * j)) & 0xFF
                        rec[f"c{i}"] = np.frombuffer(
                            bts.tobytes(), dtype=f"S{c.length}"
                        )
                    else:
                        rec[f"c{i}"] = np.asarray(
                            col.astype(str), dtype=f"S{c.length}"
                        )
                rec["octets"] = pdf["bytes"].to_numpy()
                rec["pkts"] = pdf["packets"].to_numpy()
                rec["proto"] = pdf["ip_proto"].to_numpy()
                blob = rec.tobytes()
                sz = dt.itemsize
                for lo in range(0, n, V9_MAX_RECORDS):
                    hi = min(lo + V9_MAX_RECORDS, n)
                    body = blob[lo * sz : hi * sz]
                    pad = (-len(body)) % 4
                    ds = (
                        struct.pack(
                            "!HH", CUSTOM_TEMPLATE_ID, 4 + len(body) + pad
                        )
                        + body + b"\x00" * pad
                    )
                    out.append((exporter_ip, seqno, msg(ds, seqno)))
                    seqno += 1
            yield pd.DataFrame(out, columns=["exporter_ip", "seqno", "payload"])

    return flows.mapInPandas(gen, DATAGRAM_SCHEMA)


# L2 export: MAC IEs 56/57 (6 bytes, reference NF9_IN_SRC_MAC /
# NF9_OUT_DST_MAC src/nfv9_template.h:90-91), VLAN 58, ETHERTYPE 256.
L2_TEMPLATE_ID = 262
L2_EXPORT_FIELDS = (
    (56, 6), (57, 6),     # source / destination MAC
    (58, 2), (256, 2),    # dot1qVlanId, ethernetType
    (1, 4), (2, 4), (4, 1),
)


def encode_ipfix_l2(
    flows: DataFrame, exporter_ip: str = "127.0.0.1", domain: int = 12
) -> DataFrame:
    """Pack L2-bearing rows into IPFIX. ``flows`` needs: mac_src,
    mac_dst (colon-hex strings), vlan, etype, bytes, packets, ip_proto.
    MAC packing is vectorized: strip colons, one unhexlify over the
    whole batch, reinterpret as S6 fields."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import binascii

        import numpy as np

        dt = np.dtype(
            [
                ("smac", "S6"), ("dmac", "S6"),
                ("vlan", ">u2"), ("etype", ">u2"),
                ("octets", ">u4"), ("pkts", ">u4"), ("proto", "u1"),
            ]
        )
        assert dt.itemsize == sum(ln for _, ln in L2_EXPORT_FIELDS)
        tmpl_body = struct.pack(
            "!HH", L2_TEMPLATE_ID, len(L2_EXPORT_FIELDS)
        ) + b"".join(struct.pack("!HH", ie, ln) for ie, ln in L2_EXPORT_FIELDS)
        tmpl_set = struct.pack("!HH", 2, 4 + len(tmpl_body)) + tmpl_body
        seqno, sent_template = 0, False

        def msg(sets: bytes, seq: int) -> bytes:
            return struct.pack("!HHIII", 10, 16 + len(sets), 0, seq, domain) + sets

        def macs_to_s6(col: pd.Series, n: int) -> "np.ndarray":
            hexcat = "".join(col.str.replace(":", "", regex=False))
            return np.frombuffer(binascii.unhexlify(hexcat), dtype="S6", count=n)

        for pdf in batches:
            n = len(pdf)
            out = []
            if not sent_template and n:
                out.append((exporter_ip, seqno, msg(tmpl_set, seqno)))
                sent_template = True
                seqno += 1
            if n:
                rec = np.zeros(n, dtype=dt)
                rec["smac"] = macs_to_s6(pdf["mac_src"], n)
                rec["dmac"] = macs_to_s6(pdf["mac_dst"], n)
                rec["vlan"] = pdf["vlan"].to_numpy()
                rec["etype"] = pdf["etype"].to_numpy()
                rec["octets"] = pdf["bytes"].to_numpy()
                rec["pkts"] = pdf["packets"].to_numpy()
                rec["proto"] = pdf["ip_proto"].to_numpy()
                blob = rec.tobytes()
                sz = dt.itemsize
                for lo in range(0, n, V9_MAX_RECORDS):
                    hi = min(lo + V9_MAX_RECORDS, n)
                    body = blob[lo * sz : hi * sz]
                    pad = (-len(body)) % 4
                    ds = (
                        struct.pack("!HH", L2_TEMPLATE_ID, 4 + len(body) + pad)
                        + body + b"\x00" * pad
                    )
                    out.append((exporter_ip, seqno, msg(ds, seqno)))
                    seqno += 1
            yield pd.DataFrame(out, columns=["exporter_ip", "seqno", "payload"])

    return flows.mapInPandas(gen, DATAGRAM_SCHEMA)


# Options export: sampling exposition keyed by a System scope
# (reference sampling-options tests/104-*; v9 options template set id
# 1, IPFIX options template set id 3 — dispatch src/nfacctd.c:1965).
OPTIONS_TEMPLATE_ID = 512
_OPT_SCOPE_FIELDS = ((1, 4),)            # scope: System, 4 bytes
_OPT_OPTION_FIELDS = ((48, 2), (50, 4))  # samplerId, samplerRandomInterval


def encode_options(
    rates: DataFrame, version: int = 9
) -> DataFrame:
    """Pack per-exporter sampling-options rows into one options
    datagram each. ``rates`` needs: exporter_ip, sysid, sampler_id,
    sampling_rate. ``version`` 9 -> v9 set 1 layout; 10 -> IPFIX set 3
    layout (both decode through decode_options)."""
    if version not in (9, 10):
        raise ValueError(f"unsupported options wire version {version}")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if version == 9:
            tmpl_body = struct.pack(
                "!HHH", OPTIONS_TEMPLATE_ID,
                4 * len(_OPT_SCOPE_FIELDS), 4 * len(_OPT_OPTION_FIELDS),
            )
        else:
            tmpl_body = struct.pack(
                "!HHH", OPTIONS_TEMPLATE_ID,
                len(_OPT_SCOPE_FIELDS) + len(_OPT_OPTION_FIELDS),
                len(_OPT_SCOPE_FIELDS),
            )
        for ie, ln in _OPT_SCOPE_FIELDS + _OPT_OPTION_FIELDS:
            tmpl_body += struct.pack("!HH", ie, ln)
        pad_t = (-len(tmpl_body)) % 4
        tmpl_set = (
            struct.pack(
                "!HH", 1 if version == 9 else 3, 4 + len(tmpl_body) + pad_t
            )
            + tmpl_body + b"\x00" * pad_t
        )
        seqno = 0
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                data = struct.pack(
                    "!IHI",
                    int(r.sysid), int(r.sampler_id), int(r.sampling_rate),
                )
                pad = (-len(data)) % 4
                data_set = (
                    struct.pack("!HH", OPTIONS_TEMPLATE_ID, 4 + len(data) + pad)
                    + data + b"\x00" * pad
                )
                if version == 9:
                    dgram = (
                        struct.pack("!HHIIII", 9, 2, 0, 0, seqno, 0)
                        + tmpl_set + data_set
                    )
                else:
                    sets = tmpl_set + data_set
                    dgram = (
                        struct.pack("!HHIII", 10, 16 + len(sets), 0, seqno, 0)
                        + sets
                    )
                out.append((str(r.exporter_ip), seqno, dgram))
                seqno += 1
            yield pd.DataFrame(out, columns=["exporter_ip", "seqno", "payload"])

    return rates.mapInPandas(gen, DATAGRAM_SCHEMA)


def encode_ipfix(
    flows: DataFrame,
    exporter_ip: str = "127.0.0.1",
    domain: int = 1,
    tstamp_usec: bool = False,
    with_direction: bool = False,
) -> DataFrame:
    """Pack flow rows into IPFIX (v10) messages: 16-byte header,
    template set (id 2) first, then data sets — same vectorized record
    blob as v9 (RFC 7011 framing)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        fields = _v9_export_fields(tstamp_usec, with_direction)
        dt = _v9_rec_dtype(tstamp_usec, with_direction)
        tmpl_body = struct.pack(
            "!HH", V9_TEMPLATE_ID, len(fields)
        ) + b"".join(struct.pack("!HH", ie, ln) for ie, ln in fields)
        tmpl_set = struct.pack("!HH", 2, 4 + len(tmpl_body)) + tmpl_body
        seqno = 0
        sent_template = False

        def msg(sets: bytes, seq: int) -> bytes:
            return struct.pack("!HHIII", 10, 16 + len(sets), 0, seq, domain) + sets

        for pdf in batches:
            n = len(pdf)
            out = []
            if not sent_template and n:
                out.append((exporter_ip, seqno, msg(tmpl_set, seqno)))
                sent_template = True
                seqno += 1
            if n:
                rec = np.zeros(n, dtype=dt)
                rec["src"] = pdf["ip_src_i"].to_numpy()
                rec["dst"] = pdf["ip_dst_i"].to_numpy()
                rec["inp"] = pdf["iface_in"].to_numpy()
                rec["outp"] = pdf["iface_out"].to_numpy()
                rec["pkts"] = pdf["packets"].to_numpy()
                rec["octets"] = pdf["bytes"].to_numpy()
                if tstamp_usec:
                    # caller supplies epoch-microsecond columns
                    tus = pdf["ts_us"].to_numpy().astype(np.uint64)
                    eus = pdf["end_ts_us"].to_numpy().astype(np.uint64)
                    rec["first_s"] = tus // 1_000_000
                    rec["first_us"] = tus % 1_000_000
                    rec["last_s"] = eus // 1_000_000
                    rec["last_us"] = eus % 1_000_000
                else:
                    rec["first"] = pdf["ts_ms"].to_numpy().astype(
                        np.uint64
                    )
                    rec["last"] = pdf["end_ts_ms"].to_numpy().astype(
                        np.uint64
                    )
                rec["sport"] = pdf["port_src"].to_numpy()
                rec["dport"] = pdf["port_dst"].to_numpy()
                rec["flags"] = pdf["tcp_flags"].to_numpy().astype(np.int64) & 0xFF
                rec["proto"] = pdf["ip_proto"].to_numpy()
                rec["tos"] = pdf["tos"].to_numpy()
                rec["sas"] = pdf["as_src"].to_numpy()
                rec["das"] = pdf["as_dst"].to_numpy()
                if with_direction:
                    rec["dirn"] = (
                        pdf["direction"].to_numpy().astype(np.int64)
                        & 0xFF
                    )
                blob = rec.tobytes()
                sz = dt.itemsize
                for lo in range(0, n, V9_MAX_RECORDS):
                    hi = min(lo + V9_MAX_RECORDS, n)
                    body = blob[lo * sz : hi * sz]
                    pad = (-len(body)) % 4
                    ds = (
                        struct.pack("!HH", V9_TEMPLATE_ID, 4 + len(body) + pad)
                        + body
                        + b"\x00" * pad
                    )
                    out.append((exporter_ip, seqno, msg(ds, seqno)))
                    seqno += 1
            yield pd.DataFrame(out, columns=["exporter_ip", "seqno", "payload"])

    return flows.mapInPandas(gen, DATAGRAM_SCHEMA)


# --- name/RD exposition options (the tests/112 & 500 option families:
# VRF name map, MPLS VPN RD, interface name; reference maps fed at
# src/nfacctd.c options handling, scenario README tests/112) ---------

OPTIONS_NAME_TEMPLATE_ID = 513
_OPTNAME_SCOPE = ((234, 4),)          # ingressVRFID
_OPTNAME_FIELDS = ((236, 16), (90, 8), (82, 20))  # vrfName, RD, ifName


def encode_options_names(maps: DataFrame) -> DataFrame:
    """Pack VRF exposition rows into IPFIX options datagrams (set 3
    layout): scope ingressVRFID(234) -> vrfName(236, 16B null-padded)
    + mplsVpnRD(90, 8B big-endian of ``rd_int``) + interfaceName(82,
    20B). ``maps`` needs: exporter_ip, seq (header sequence — later
    rounds overwrite earlier ones in options_map), vrf_id, vrf_name,
    rd_int, iface_name. Each datagram is self-contained (template set
    first), like encode_options."""
    tmpl_body = struct.pack(
        "!HHH", OPTIONS_NAME_TEMPLATE_ID,
        len(_OPTNAME_SCOPE) + len(_OPTNAME_FIELDS), len(_OPTNAME_SCOPE),
    )
    for ie, ln in _OPTNAME_SCOPE + _OPTNAME_FIELDS:
        tmpl_body += struct.pack("!HH", ie, ln)
    tmpl_set = struct.pack("!HH", 3, 4 + len(tmpl_body)) + tmpl_body

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                data = (
                    struct.pack("!I", int(r.vrf_id))
                    + str(r.vrf_name).encode()[:16].ljust(16, b"\x00")
                    + struct.pack("!Q", int(r.rd_int))
                    + str(r.iface_name).encode()[:20].ljust(20, b"\x00")
                )
                ds = struct.pack(
                    "!HH", OPTIONS_NAME_TEMPLATE_ID, 4 + len(data)
                ) + data
                sets = tmpl_set + ds
                dgram = struct.pack(
                    "!HHIII", 10, 16 + len(sets), 0, int(r.seq), 0
                ) + sets
                out.append((str(r.exporter_ip), int(r.seq), dgram))
            yield pd.DataFrame(
                out, columns=["exporter_ip", "seqno", "payload"]
            )

    return maps.mapInPandas(gen, DATAGRAM_SCHEMA)


NEXTHOP_TEMPLATE_ID = 276
NEXTHOP_EXPORT_FIELDS = [
    (15, 4),  # ipNextHopIPv4Address
    (8, 4), (12, 4), (1, 4), (2, 4), (4, 1),
]


def encode_ipfix_nexthop(
    flows: DataFrame, exporter_ip: str = "127.0.0.1", domain: int = 11
) -> DataFrame:
    """Pack rows carrying the IP next hop (IE 15 — the
    use_ip_next_hop source field) into IPFIX. ``flows`` needs:
    ip_nexthop_i, ip_src_i, ip_dst_i, bytes, packets, ip_proto."""
    import struct as _struct

    from collections.abc import Iterator as _Iterator

    import pandas as _pd

    def gen(batches):
        import numpy as np

        dt = np.dtype(
            [
                ("nh", ">u4"), ("src", ">u4"), ("dst", ">u4"),
                ("octets", ">u4"), ("pkts", ">u4"), ("proto", "u1"),
            ]
        )
        assert dt.itemsize == sum(ln for _, ln in NEXTHOP_EXPORT_FIELDS)
        tmpl_body = _struct.pack(
            "!HH", NEXTHOP_TEMPLATE_ID, len(NEXTHOP_EXPORT_FIELDS)
        ) + b"".join(
            _struct.pack("!HH", ie, ln) for ie, ln in NEXTHOP_EXPORT_FIELDS
        )
        tmpl_set = _struct.pack("!HH", 2, 4 + len(tmpl_body)) + tmpl_body
        seqno, sent_template = 0, False

        def msg(sets: bytes, seq: int) -> bytes:
            return _struct.pack(
                "!HHIII", 10, 16 + len(sets), 0, seq, domain
            ) + sets

        for pdf in batches:
            n = len(pdf)
            out = []
            if not sent_template and n:
                out.append((exporter_ip, seqno, msg(tmpl_set, seqno)))
                sent_template = True
                seqno += 1
            if n:
                rec = np.zeros(n, dtype=dt)
                rec["nh"] = pdf["ip_nexthop_i"].to_numpy()
                rec["src"] = pdf["ip_src_i"].to_numpy()
                rec["dst"] = pdf["ip_dst_i"].to_numpy()
                rec["octets"] = pdf["bytes"].to_numpy()
                rec["pkts"] = pdf["packets"].to_numpy()
                rec["proto"] = pdf["ip_proto"].to_numpy()
                blob = rec.tobytes()
                sz = dt.itemsize
                for lo in range(0, n, V9_MAX_RECORDS):
                    hi = min(lo + V9_MAX_RECORDS, n)
                    body = blob[lo * sz : hi * sz]
                    pad = (-len(body)) % 4
                    ds = (
                        _struct.pack(
                            "!HH", NEXTHOP_TEMPLATE_ID, 4 + len(body) + pad
                        )
                        + body + b"\x00" * pad
                    )
                    out.append((exporter_ip, seqno, msg(ds, seqno)))
                    seqno += 1
            yield _pd.DataFrame(
                out, columns=["exporter_ip", "seqno", "payload"]
            )

    return flows.mapInPandas(
        gen, "exporter_ip string, seqno long, payload binary"
    )
