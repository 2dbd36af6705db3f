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


def encode_v5(flows: DataFrame, exporter_ip: str = "127.0.0.1") -> DataFrame:
    """Pack flow rows into NetFlow v5 datagrams. ``flows`` needs the
    decoder's column set (streaming.decode.FLOW_SCHEMA names)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        hdr_st = struct.Struct(V5_HEADER_FMT)
        rec_st = struct.Struct(V5_RECORD_FMT)
        seqno = 0  # v5 seqno counts total flows exported (per stream)
        for pdf in batches:
            out = []
            for lo in range(0, len(pdf), V5_MAX_RECORDS):
                chunk = pdf.iloc[lo : lo + V5_MAX_RECORDS]
                base_ms = int(chunk["ts_ms"].min())
                hdr = hdr_st.pack(
                    5, len(chunk), 0, base_ms // 1000,
                    (base_ms % 1000) * 1_000_000, seqno, 0, 0, 1,
                )
                body = b""
                for r in chunk[list(_COLS)].itertuples(index=False):
                    body += rec_st.pack(
                        int(r.ip_src_i), int(r.ip_dst_i), 0,
                        int(r.iface_in), int(r.iface_out),
                        int(r.packets), int(r.bytes),
                        int(r.ts_ms) - base_ms, int(r.end_ts_ms) - base_ms,
                        int(r.port_src), int(r.port_dst), 0,
                        int(r.tcp_flags), int(r.ip_proto), int(r.tos),
                        int(r.as_src) & 0xFFFF, int(r.as_dst) & 0xFFFF,
                        0, 0, 0,
                    )
                out.append((exporter_ip, seqno, hdr + body))
                seqno += len(chunk)
            yield pd.DataFrame(out, columns=["exporter_ip", "seqno", "payload"])

    return flows.mapInPandas(gen, DATAGRAM_SCHEMA)
