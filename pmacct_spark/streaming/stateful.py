"""Custom stateful streaming: the flow-cache operator
(``applyInPandasWithState``) — pmacct's packets->flows state table with
idle expiry (reference src/ip_flow.c:81-230 hash+LRU lifetimes;
nfprobe flow cache expiry src/nfprobe_plugin/nfprobe_plugin.c:170-187).

Semantics per key (the flow/aggregation key):
  - arriving records extend the current open session/flow;
  - a record more than ``idle_s`` after the session end CLOSES the old
    session (emitted immediately) and opens a new one;
  - a session with no traffic for ``idle_s`` expires via event-time
    timeout when the watermark passes (emitted without a closing
    record) — the LRU-lifetime purge;
  - sessions still open at stream end remain in state (checkpointed),
    exactly like the reference's table surviving across purges.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def decode_v9_stream(
    dgram_stream: DataFrame, order_col: str = "seqno"
) -> DataFrame:
    """STREAMING-grade stateful v9/IPFIX decode: the per-exporter
    template cache lives in ``applyInPandasWithState`` state, so a
    template learned in one micro-batch decodes data flowsets arriving
    in LATER micro-batches — the exact semantics of the reference's
    long-lived per-socket cache (src/nfv9_template.c:1179) which a
    per-batch mapInPandas decoder cannot provide (its state dies with
    the batch). State is the JSON-serialized template dict keyed
    (source_id, template_id); datagrams sort by ``order_col`` within
    each batch."""
    import json

    from pmacct_spark.streaming.decode import (
        FLOW_SCHEMA,
        _flow_frame,
        _v9_packet,
        _v10_packet,
    )

    state_schema = T.StructType([T.StructField("tmpl_json", T.StringType())])
    cols = [f.name for f in FLOW_SCHEMA.fields]

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        exporter = key[0]
        templates: dict = {}
        if state.exists:
            (tj,) = state.get
            for k, spec in json.loads(tj).items():
                sid, tid = k.split(":")
                templates[(exporter, int(sid), int(tid))] = spec
        items: list = []
        compiled: dict = {}  # per-call dtype cache (templates persist
        # in state; the compiled numpy form rebuilds per batch, cheap)
        for pdf in pdfs:
            if order_col in pdf.columns:
                pdf = pdf.sort_values(order_col)
            for payload in pdf["payload"]:
                b = bytes(payload)
                ver = int.from_bytes(b[:2], "big") if len(b) >= 2 else 0
                if ver == 9:
                    items.extend(
                        _v9_packet(exporter, b, templates, compiled=compiled)
                    )
                elif ver == 10:
                    items.extend(
                        _v10_packet(exporter, b, templates, compiled=compiled)
                    )
        state.update(
            (
                json.dumps(
                    {f"{k[1]}:{k[2]}": spec for k, spec in templates.items()}
                ),
            )
        )
        frame = _flow_frame(items, cols)
        if len(frame):
            yield frame

    return dgram_stream.groupBy("exporter_ip").applyInPandasWithState(
        fn,
        outputStructType=FLOW_SCHEMA,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def flow_cache(
    stream: DataFrame,
    keys: list[str],
    idle_s: int,
    evt_col: str = "__evt",
) -> DataFrame:
    """Apply the flow-cache operator to a WATERMARKED streaming DF with
    an event-time column ``evt_col`` and ``bytes``/``packets`` counters.
    Emits one row per CLOSED flow."""

    out_schema = T.StructType(
        [T.StructField(k, T.LongType()) for k in keys]
        + [
            T.StructField("session_start_ms", T.LongType()),
            T.StructField("session_end_ms", T.LongType()),
            T.StructField("n_records", T.LongType()),
            T.StructField("bytes", T.LongType()),
            T.StructField("packets", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("start_ms", T.LongType()),
            T.StructField("end_ms", T.LongType()),
            T.StructField("n", T.LongType()),
            T.StructField("b", T.LongType()),
            T.StructField("p", T.LongType()),
        ]
    )
    idle_ms = idle_s * 1000
    cols = [f.name for f in out_schema.fields]

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        closed: list[tuple] = []
        if state.hasTimedOut:
            # idle expiry: the watermark passed end + idle with no traffic
            (start, end, n, b, p) = state.get
            state.remove()
            yield pd.DataFrame([key + (start, end, n, b, p)], columns=cols)
            return
        cur = state.get if state.exists else None
        for pdf in pdfs:
            pdf = pdf.sort_values(evt_col)
            for evt, b_, p_ in zip(pdf[evt_col], pdf["bytes"], pdf["packets"]):
                ts = int(evt.value // 1_000_000)  # ns -> ms
                b_, p_ = int(b_), int(p_)
                if cur is None:
                    cur = (ts, ts, 1, b_, p_)
                elif ts - cur[1] > idle_ms:
                    closed.append(key + cur)  # gap closes the old flow
                    cur = (ts, ts, 1, b_, p_)
                else:
                    cur = (cur[0], max(cur[1], ts), cur[2] + 1, cur[3] + b_, cur[4] + p_)
        if cur is not None:
            state.update(cur)
            state.setTimeoutTimestamp(cur[1] + idle_ms)
        if closed:
            yield pd.DataFrame(closed, columns=cols)

    return stream.groupBy(*keys).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
