"""sfprobe sink: re-export flow rows as sFlow v5 datagrams (reference
src/sfprobe_plugin/sfprobe_plugin.c — pmacct as an sFlow agent).

Each flow row becomes one flow sample carrying a synthesized
ethernet/IPv4/L4 header (the reverse of the sfacctd dissection in
streaming.decode), so encode -> decode_sflow5 round-trips the 5-tuple,
tos, tcp_flags, frame length and sampling_rate.
"""

from __future__ import annotations

import socket
import struct


def _agent_field(agent_ip: str) -> bytes:
    """sFlow Agent Address field — the exporter identity every sFlow
    implementation ships in the datagram header (sfacctd uses it by
    default, CONFIG-KEYS:2213): address type 1 + 4 bytes for IPv4,
    type 2 + 16 bytes for IPv6 (the reference's str_to_addr accepts
    both). An unparseable sfprobe_source_ip is a config error, not a
    purge-time crash."""
    try:
        if ":" in agent_ip:
            return struct.pack("!I", 2) + socket.inet_pton(
                socket.AF_INET6, agent_ip
            )
        return struct.pack("!I", 1) + socket.inet_aton(agent_ip)
    except OSError:
        raise ValueError(
            f"sfprobe agent ip {agent_ip!r} is not a valid IPv4/IPv6 "
            "address — set sfprobe_source_ip to a real address"
        ) from None
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

SFPROBE_SCHEMA = T.StructType(
    [
        T.StructField("exporter_ip", T.StringType()),
        T.StructField("seqno", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

SAMPLES_PER_DATAGRAM = 10


def _l2l3l4(r) -> bytes:
    eth = b"\x02" * 6 + b"\x04" * 6 + b"\x08\x00"
    proto = int(r.ip_proto)
    ip = (
        bytes([0x45, int(r.tos)])
        + (40).to_bytes(2, "big")
        + b"\x00" * 4
        + bytes([64, proto])
        + b"\x00\x00"
        + int(r.ip_src_i).to_bytes(4, "big")
        + int(r.ip_dst_i).to_bytes(4, "big")
    )
    if proto == 6:
        l4 = (
            int(r.port_src).to_bytes(2, "big")
            + int(r.port_dst).to_bytes(2, "big")
            + b"\x00" * 9
            + bytes([int(r.tcp_flags) & 0xFF])
            + b"\x00" * 6
        )
    elif proto == 17:
        l4 = (
            int(r.port_src).to_bytes(2, "big")
            + int(r.port_dst).to_bytes(2, "big")
            + b"\x00\x08\x00\x00"
        )
    else:
        l4 = b""
    return eth + ip + l4


def _sample_dtype(l4: str):
    """numpy structured dtype for one complete flow sample record —
    sample header + body + flow-record header + raw header + synthetic
    eth/IPv4/L4 — byte-identical to the row-at-a-time pack."""
    import numpy as np

    fields = [
        ("stag", ">u4"), ("slen", ">u4"),
        ("sseq", ">u4"), ("ssrc", ">u4"), ("rate", ">u4"),
        ("pool", ">u4"), ("drops", ">u4"),
        ("inp", ">u4"), ("outp", ">u4"), ("nrec", ">u4"),
        ("rtag", ">u4"), ("rlen", ">u4"),
        ("hproto", ">u4"), ("flen", ">u4"),
        ("stripped", ">u4"), ("hlen", ">u4"),
        ("eth", "S14"),
        ("verihl", "u1"), ("tos", "u1"), ("totlen", ">u2"),
        ("ipid", ">u4"), ("ttl", "u1"), ("proto", "u1"),
        ("csum", ">u2"), ("src", ">u4"), ("dst", ">u4"),
    ]
    if l4 == "tcp":
        fields += [
            ("sport", ">u2"), ("dport", ">u2"), ("l4pad", "S9"),
            ("flags", "u1"), ("l4tail", "S6"),
        ]
    elif l4 == "udp":
        fields += [
            ("sport", ">u2"), ("dport", ">u2"),
            ("ulen", ">u2"), ("ucsum", ">u2"),
        ]
    return np.dtype(fields)


# ---------------------------------------------------------------------------
# IPv6 + 802.1Q flow-sample export: sampled headers carrying a VLAN
# tag and an IPv6 inner packet (reference eth_handler VLAN walk
# src/ll.c:29, ip6_handler src/nl.c) — the dual-stack sFlow path.
# ---------------------------------------------------------------------------

def _v6_hdr_bytes(s: str) -> bytes:
    return bytes.fromhex(s.replace(":", ""))


def encode_sflow5_v6(
    flows: DataFrame,
    agent_ip: str = "127.0.0.1",
    sampling_rate: int = 1,
    agent_subid: int = 1402,
) -> DataFrame:
    """Pack IPv6 flow rows into sFlow v5 datagrams whose sampled
    headers are eth + 802.1Q(vlan) + IPv6 + TCP/UDP. ``flows`` needs:
    ip6_src, ip6_dst, vlan, port_src, port_dst, ip_proto, tos,
    tcp_flags, bytes, iface_in, iface_out."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seqno = 0
        for pdf in batches:
            out = []
            samples = []
            for r in pdf.itertuples(index=False):
                proto = int(r.ip_proto)
                eth = (
                    b"\x02" * 6 + b"\x04" * 6
                    + b"\x81\x00"
                    + (int(r.vlan) & 0x0FFF).to_bytes(2, "big")
                    + b"\x86\xdd"
                )
                if proto == 6:
                    l4 = (
                        int(r.port_src).to_bytes(2, "big")
                        + int(r.port_dst).to_bytes(2, "big")
                        + b"\x00" * 9
                        + bytes([int(r.tcp_flags) & 0xFF])
                        + b"\x00" * 6
                    )
                elif proto == 17:
                    l4 = (
                        int(r.port_src).to_bytes(2, "big")
                        + int(r.port_dst).to_bytes(2, "big")
                        + b"\x00\x08\x00\x00"
                    )
                else:
                    l4 = b""
                vtc_fl = (6 << 28) | ((int(r.tos) & 0xFF) << 20)
                ip6 = (
                    vtc_fl.to_bytes(4, "big")
                    + len(l4).to_bytes(2, "big")
                    + bytes([proto, 64])
                    + _v6_hdr_bytes(r.ip6_src)
                    + _v6_hdr_bytes(r.ip6_dst)
                )
                hdr = eth + ip6 + l4
                pad = (-len(hdr)) % 4
                raw = (
                    struct.pack("!IIII", 1, int(r.bytes), 4, len(hdr))
                    + hdr + b"\x00" * pad
                )
                body = (
                    struct.pack(
                        "!IIIIIIII", seqno + len(samples), 1, sampling_rate,
                        1000, 0, int(r.iface_in), int(r.iface_out), 1,
                    )
                    + struct.pack("!II", 1, len(raw))
                    + raw
                )
                samples.append(struct.pack("!II", 1, len(body)) + body)
            for lo in range(0, len(samples), SAMPLES_PER_DATAGRAM):
                chunk = samples[lo : lo + SAMPLES_PER_DATAGRAM]
                dgram = (
                    struct.pack("!I", 5) + _agent_field(agent_ip)
                    + struct.pack(
                        "!IIII", agent_subid, seqno + lo, 0, len(chunk)
                    )
                ) + b"".join(chunk)
                out.append((agent_ip, seqno + lo, dgram))
            seqno += len(samples)
            yield pd.DataFrame(out, columns=["exporter_ip", "seqno", "payload"])

    return flows.mapInPandas(gen, SFPROBE_SCHEMA)


# ---------------------------------------------------------------------------
# counter-sample export (generic interface counters, the other half of
# sFlow's value; reference counter-sample processing
# src/sfacctd.c:1578-1581). v5 wraps the 88-byte generic block in a
# counted record inside a counter sample (type 2); v2/v4 (RFC 3176)
# inline it after (seq, source_id, interval, counters_version).
# ---------------------------------------------------------------------------

_CTR_COLS = (
    "if_index", "if_type", "if_speed", "if_status",
    "if_in_octets", "if_in_ucast", "if_in_errors",
    "if_out_octets", "if_out_ucast", "if_out_errors",
)


def _gen_counters_blob(r) -> bytes:
    return struct.pack(
        "!IIQIIQIIIIIIQIIIIII",
        int(r.if_index), int(r.if_type), int(r.if_speed),
        0,  # ifDirection
        int(r.if_status),
        int(r.if_in_octets), int(r.if_in_ucast), 0, 0, 0,
        int(r.if_in_errors), 0,
        int(r.if_out_octets), int(r.if_out_ucast), 0, 0, 0,
        int(r.if_out_errors),
        0,  # promiscuous
    )


def encode_sflow_counters(
    ifaces: DataFrame,
    agent_ip: str = "127.0.0.1",
    version: int = 5,
    agent_subid: int = 1402,
) -> DataFrame:
    """Pack per-interface counter rows (``_CTR_COLS``) into sFlow
    counter-sample datagrams, one sample per row, in the chosen wire
    version (5 or 4; 2 uses the v4 layout)."""
    if version not in (2, 4, 5):
        raise ValueError(f"unsupported sFlow version {version}")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seqno = 0
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                blob = _gen_counters_blob(r)
                if version == 5:
                    body = (
                        struct.pack("!III", seqno, int(r.if_index), 1)
                        + struct.pack("!II", 1, len(blob))
                        + blob
                    )
                    dgram = (
                        struct.pack("!I", 5) + _agent_field(agent_ip)
                        + struct.pack("!IIII", agent_subid, seqno, 0, 1)
                    ) + struct.pack("!II", 2, len(body)) + body
                else:  # v2/v4: no sub-agent, no sample length framing
                    sample = (
                        struct.pack("!I", 2)
                        + struct.pack(
                            "!IIII", seqno, int(r.if_index), 30, 1
                        )
                        + blob
                    )
                    dgram = (
                        struct.pack("!I", version)
                        + _agent_field(agent_ip)
                        + struct.pack("!III", seqno, 0, 1)
                    ) + sample
                out.append((agent_ip, seqno, dgram))
                seqno += 1
            yield pd.DataFrame(out, columns=["exporter_ip", "seqno", "payload"])

    return ifaces.mapInPandas(gen, SFPROBE_SCHEMA)


def encode_sflow5(
    flows: DataFrame,
    agent_ip: str = "127.0.0.1",
    sampling_rate: int = 1,
    agent_subid: int = 1402,
) -> DataFrame:
    """Pack flow rows (decoder column set) into sFlow v5 datagrams.

    Vectorized: per L4 class (TCP / UDP / other — the record layouts
    are fixed within a class) one structured array is filled from
    numpy columns; per-row byte strings come out of a single
    ``tobytes`` and are stitched into 10-sample datagrams."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        eth_const = b"\x02" * 6 + b"\x04" * 6 + b"\x08\x00"
        seqno = 0
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                yield pd.DataFrame(
                    [], columns=["exporter_ip", "seqno", "payload"]
                )
                continue
            proto = pdf["ip_proto"].to_numpy().astype(np.int64)
            sample_bytes: "np.ndarray" = np.empty(n, dtype=object)
            for cls, l4len in (("tcp", 20), ("udp", 8), ("other", 0)):
                if cls == "tcp":
                    m = proto == 6
                elif cls == "udp":
                    m = proto == 17
                else:
                    m = (proto != 6) & (proto != 17)
                k = int(m.sum())
                if not k:
                    continue
                dt = _sample_dtype(cls)
                hdr_len = 14 + 20 + l4len
                raw_len = 16 + hdr_len
                body_len = 32 + 8 + raw_len
                a = np.zeros(k, dtype=dt)
                a["stag"] = 1
                a["slen"] = body_len
                a["sseq"] = (seqno + np.flatnonzero(m)).astype(np.uint32)
                a["ssrc"] = 1
                a["rate"] = sampling_rate
                a["inp"] = pdf["iface_in"].to_numpy()[m]
                a["outp"] = pdf["iface_out"].to_numpy()[m]
                a["nrec"] = 1
                a["rtag"] = 1
                a["rlen"] = raw_len
                a["hproto"] = 1
                a["flen"] = pdf["bytes"].to_numpy()[m]
                a["stripped"] = 4
                a["hlen"] = hdr_len
                a["eth"] = eth_const
                a["verihl"] = 0x45
                a["tos"] = pdf["tos"].to_numpy()[m]
                a["totlen"] = 40
                a["ttl"] = 64
                a["proto"] = proto[m]
                a["src"] = pdf["ip_src_i"].to_numpy()[m]
                a["dst"] = pdf["ip_dst_i"].to_numpy()[m]
                if cls in ("tcp", "udp"):
                    a["sport"] = pdf["port_src"].to_numpy()[m]
                    a["dport"] = pdf["port_dst"].to_numpy()[m]
                if cls == "tcp":
                    a["flags"] = (
                        pdf["tcp_flags"].to_numpy()[m].astype(np.int64) & 0xFF
                    )
                elif cls == "udp":
                    a["ulen"] = 8
                blob = a.tobytes()
                sz = dt.itemsize
                idxs = np.flatnonzero(m)
                for j, ridx in enumerate(idxs):
                    sample_bytes[ridx] = blob[j * sz : (j + 1) * sz]
            out = []
            for lo in range(0, n, SAMPLES_PER_DATAGRAM):
                hi = min(lo + SAMPLES_PER_DATAGRAM, n)
                dgram = (
                    struct.pack("!I", 5) + _agent_field(agent_ip)
                    + struct.pack(
                        "!IIII", agent_subid, seqno + lo, 0, hi - lo
                    )
                ) + b"".join(sample_bytes[lo:hi])
                out.append((agent_ip, seqno + lo, dgram))
            seqno += n
            yield pd.DataFrame(out, columns=["exporter_ip", "seqno", "payload"])

    return flows.mapInPandas(gen, SFPROBE_SCHEMA)
