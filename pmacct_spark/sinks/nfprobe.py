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
                    (base_ms % 1000) * 1_000_000, seqno, 0, 0, 1,
                )
                out.append((exporter_ip, seqno, hdr + chunk.tobytes()))
                seqno += hi - lo
            yield pd.DataFrame(out, columns=["exporter_ip", "seqno", "payload"])

    return flows.mapInPandas(gen, DATAGRAM_SCHEMA)
