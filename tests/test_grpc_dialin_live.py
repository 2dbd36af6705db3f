"""gRPC dial-in telemetry over the LIVE minimal HTTP/2 stack: the
collector is the gRPC CLIENT calling the router's CreateSubs
server-streaming rpc (public mdt_grpc_dialin.proto shapes). The
reference consumes dial-in via the same external-helper ZMQ bridge as
dial-out (src/telemetry/telemetry.c:120-134); here the collector
speaks the protocol itself and an in-process router serves the tests."""

import json
import pathlib
import time

import pytest
from pyspark.sql import SparkSession

from pmacct_spark.sources.grpc_wire import (
    ENC_GPB,
    ENC_JSON,
    GrpcDialinCollector,
    GrpcDialinRouter,
    encode_create_subs_args,
    encode_create_subs_reply,
    parse_create_subs_args,
    parse_create_subs_reply,
)


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


def test_protobuf_create_subs_roundtrip():
    """CreateSubsArgs (two varints + string) and CreateSubsReply
    (MdtDialoutArgs wire shape) walk both directions."""
    for rid, enc_, sub in [
        (1, ENC_JSON, "sub-a"),
        (0, ENC_GPB, ""),
        (2**40, 3, "x" * 300),
    ]:
        got = parse_create_subs_args(encode_create_subs_args(rid, enc_, sub))
        assert got == {"req_id": rid, "encoding": enc_, "subidstr": sub}
    r = parse_create_subs_reply(encode_create_subs_reply(9, b"pay", "err"))
    assert r == {"res_req_id": 9, "data": b"pay", "errors": "err"}


def test_grpc_dialin_live_subscription_stream_flow_control():
    """LIVE loopback: the collector subscribes, the router streams the
    subscription's payloads back — past the 64 KiB default windows
    (stalls forever unless the collector replenishes via
    WINDOW_UPDATE) — and closes with grpc-status 0."""
    payloads = [b'{"k": 1}', b"x" * 40000, b"y" * 40000, b'{"k": 2}']
    rtr = GrpcDialinRouter({"sub-cpu": payloads}).start()
    got = []
    try:
        col = GrpcDialinCollector(
            "127.0.0.1",
            rtr.port,
            "sub-cpu",
            deliver=lambda peer, data, rid: got.append((peer, rid, data)),
            req_id=42,
        ).start()
        assert col.wait(20)
        assert col.grpc_status == 0
        assert col.messages_received == 4
        assert [d for _p, _r, d in got] == payloads
        # ResReqId echoes the subscription request id
        assert all(r == 42 for _p, r, _d in got)
        assert rtr.streams_served == 1
    finally:
        rtr.stop()


def test_grpc_dialin_unknown_subscription_and_wrong_path():
    """Unknown subidstr answers grpc-status 5 (NOT_FOUND) with zero
    messages; a wrong rpc path answers 12 (UNIMPLEMENTED)."""
    rtr = GrpcDialinRouter({"sub-cpu": [b'{"k": 1}']}).start()
    try:
        col = GrpcDialinCollector(
            "127.0.0.1", rtr.port, "nope", deliver=lambda *a: None
        ).start()
        assert col.wait(20)
        assert col.grpc_status == 5
        assert col.messages_received == 0

        col2 = GrpcDialinCollector(
            "127.0.0.1",
            rtr.port,
            "sub-cpu",
            deliver=lambda *a: None,
            path="/other.Service/Rpc",
        ).start()
        assert col2.wait(20)
        assert col2.grpc_status == 12
        assert col2.messages_received == 0
    finally:
        rtr.stop()


def test_grpc_dialin_router_survives_malformed_peer():
    """A peer sending garbage after the preface kills its own
    connection; the router keeps serving healthy collectors."""
    import socket

    rtr = GrpcDialinRouter({"s": [b'{"k": 7}']}).start()
    try:
        c = socket.create_connection(("127.0.0.1", rtr.port), timeout=5)
        c.sendall(b"GET / HTTP/1.1\r\nHost: x\r\n\r\n" + b"\x00" * 8)
        c.close()
        c = socket.create_connection(("127.0.0.1", rtr.port), timeout=5)
        c.sendall(b"PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n")
        c.sendall(b"\xff\xff\xff\x00\x00\x00\x00\x00\x00")
        c.close()
        got = []
        col = GrpcDialinCollector(
            "127.0.0.1", rtr.port, "s",
            deliver=lambda p, d, r: got.append(d),
        ).start()
        assert col.wait(20)
        assert col.grpc_status == 0 and got == [b'{"k": 7}']
    finally:
        rtr.stop()


def test_daemon_grpc_dialin_live(spark, tmp_path):
    """End-to-end: telemetry_daemon_grpc_dialin dials the live router,
    subscribes, and the streamed CreateSubsReply payloads land in the
    telemetry spool and come out of the msglog in the
    ietf-telemetry-message envelope — the identical path UDP and
    dial-out telemetry ride."""
    from pmacct_spark.daemon import Daemon

    payloads = [
        json.dumps({"k": k, "sensor_path": "cpu"}).encode() for k in (1, 2, 3)
    ]
    rtr = GrpcDialinRouter({"sub-cpu": payloads}).start()
    log_dir = str(tmp_path / "dialinlog")
    conf = f"""
telemetry_daemon_grpc_dialin: 127.0.0.1:{rtr.port},sub-cpu
telemetry_daemon_msglog_file: {log_dir}
core_proc_name: pmtelemetryd
"""
    d = Daemon.from_conf(spark, conf, spool_dir=str(tmp_path / "dialinspool"))
    try:
        assert d.flavor == "telemetry"
        assert d.grpc_dialin is not None
        t0 = time.monotonic()
        while d.spool.datagrams_received < 3 and time.monotonic() - t0 < 15:
            time.sleep(0.05)
        assert d.spool.datagrams_received == 3
        assert d.grpc_dialin.grpc_status == 0
        d.spool.flush()
        assert d.run_available() == {}  # no accounting channels
        assert d.write_msglog_if_configured() == [log_dir]
    finally:
        d.stop()
        rtr.stop()
    lines = []
    for f in pathlib.Path(log_dir).rglob("*.txt"):
        lines += [
            json.loads(ln) for ln in f.read_text().splitlines() if ln.strip()
        ]
    assert len(lines) == 3
    msgs = [ln["ietf-telemetry-message:message"] for ln in lines]
    assert sorted(m["payload"]["k"] for m in msgs) == [1, 2, 3]
    meta = msgs[0]["telemetry-message-metadata"]
    assert meta["export-address"] == "127.0.0.1"
