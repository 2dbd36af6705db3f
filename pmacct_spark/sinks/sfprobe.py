"""sfprobe sink: re-export flow rows as sFlow v5 datagrams (reference
src/sfprobe_plugin/sfprobe_plugin.c — pmacct as an sFlow agent).

Each flow row becomes one flow sample carrying a synthesized
ethernet/IPv4/L4 header (the reverse of the sfacctd dissection in
streaming.decode), so encode -> decode_sflow5 round-trips the 5-tuple,
tos, tcp_flags, frame length and sampling_rate.
"""

from __future__ import annotations

import struct
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


def encode_sflow5(
    flows: DataFrame, agent_ip: str = "127.0.0.1", sampling_rate: int = 1
) -> DataFrame:
    """Pack flow rows (decoder column set) into sFlow v5 datagrams."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seqno = 0
        for pdf in batches:
            out = []
            for lo in range(0, len(pdf), SAMPLES_PER_DATAGRAM):
                chunk = pdf.iloc[lo : lo + SAMPLES_PER_DATAGRAM]
                samples = b""
                for i, r in enumerate(chunk.itertuples(index=False)):
                    hdr = _l2l3l4(r)
                    raw = struct.pack("!IIII", 1, int(r.bytes), 4, len(hdr)) + hdr
                    body = (
                        struct.pack(
                            "!IIIIIIII",
                            seqno + i, 1, sampling_rate, 0, 0,
                            int(r.iface_in), int(r.iface_out), 1,
                        )
                        + struct.pack("!II", 1, len(raw))
                        + raw
                    )
                    samples += struct.pack("!II", 1, len(body)) + body
                dgram = (
                    struct.pack(
                        "!IIIIIII", 5, 1, 0x7F000001, 0, seqno, 0, len(chunk)
                    )
                    + samples
                )
                out.append((agent_ip, seqno, dgram))
                seqno += len(chunk)
            yield pd.DataFrame(out, columns=["exporter_ip", "seqno", "payload"])

    return flows.mapInPandas(gen, SFPROBE_SCHEMA)
