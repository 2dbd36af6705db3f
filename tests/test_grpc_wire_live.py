"""gRPC dial-out telemetry over the LIVE minimal HTTP/2 stack
(sources/grpc_wire.py): RFC 7540 framing + RFC 7541 HPACK + gRPC
length-prefixed messages + the public mdt_dialout.MdtDialoutArgs
protobuf shape. The reference consumes this via an external collector
bridged over ZMQ (src/telemetry/telemetry.c:120-134); here the
in-process server IS the collector, feeding the same telemetry spool
as the UDP socket."""

import json
import pathlib
import socket
import struct
import time

import pytest
from pyspark.sql import SparkSession

from pmacct_spark.sources.grpc_wire import (
    GrpcDialoutClient,
    GrpcDialoutServer,
    HpackCodec,
    encode_mdt_dialout_args,
    grpc_frame,
    parse_grpc_messages,
    parse_mdt_dialout_args,
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


def test_protobuf_mdt_dialout_roundtrip():
    """MdtDialoutArgs varint/length-delimited walk, incl. unknown-field
    skipping and negative ReqId (two's-complement int64)."""
    for rid, data, errors in [
        (1, b"payload", ""),
        (0, b"", "boom"),
        (2**40, b"\x00" * 100, "x" * 300),
        (-5, b"neg", ""),
    ]:
        buf = encode_mdt_dialout_args(rid, data, errors)
        got = parse_mdt_dialout_args(buf)
        want_rid = rid if rid >= 0 else rid + (1 << 64)
        assert got == {"req_id": want_rid, "data": data, "errors": errors}
    # unknown field (4, fixed64) between known ones is skipped
    buf = (
        b"\x08\x07"  # ReqId=7
        + b"\x21" + b"\x00" * 8  # field 4, wire type 1
        + b"\x12\x02ab"
    )
    assert parse_mdt_dialout_args(buf) == {
        "req_id": 7, "data": b"ab", "errors": "",
    }


def test_grpc_message_framing_partial():
    """parse_grpc_messages consumes only complete frames and returns
    the split tail, as DATA-frame boundaries land anywhere."""
    m1, m2 = grpc_frame(b"aaa"), grpc_frame(b"bbbb")
    whole = m1 + m2
    for cut in range(len(whole) + 1):
        msgs, tail = parse_grpc_messages(whole[:cut])
        rest_msgs, rest_tail = parse_grpc_messages(tail + whole[cut:])
        assert [b"aaa", b"bbbb"] == msgs + rest_msgs
        assert rest_tail == b""


def test_hpack_dynamic_table_roundtrip():
    """Custom headers enter the dynamic table on first use and are
    indexed on reuse; decoder tracks insertions/evictions in step."""
    enc, dec = HpackCodec(), HpackCodec()
    h1 = [
        (":method", "POST"),
        (":path", "/mdt_dialout.gRPCMdtDialout/MdtDialout"),
        ("content-type", "application/grpc"),
        ("x-node-id", "router-1"),
    ]
    b1 = enc.encode(h1)
    assert dec.decode(b1) == h1
    # second block reuses the dynamic entries: strictly smaller
    b2 = enc.encode(h1)
    assert len(b2) < len(b1)
    assert dec.decode(b2) == h1
    # eviction: overflow the table, old entries must be gone
    small_enc, small_dec = HpackCodec(max_size=64), HpackCodec(max_size=64)
    for i in range(5):
        hs = [(f"x-h{i}", "v" * 20)]
        assert small_dec.decode(small_enc.encode(hs)) == hs
    assert len(small_enc.dynamic) == len(small_dec.dynamic) == 1
    # Huffman-coded strings are rejected with a clear error
    with pytest.raises(ValueError, match="Huffman"):
        dec.decode(bytes([0x40, 0x83, 0xFF, 0xFF, 0xFF]))


def test_grpc_dialout_live_roundtrip_flow_control_multistream():
    """LIVE loopback: preface + SETTINGS exchange, HEADERS/HPACK, DATA
    past the 64 KiB default windows (server must replenish via
    WINDOW_UPDATE), two streams on one connection, grpc-status 0
    trailers, and the UNIMPLEMENTED path for a wrong method."""
    got = []
    srv = GrpcDialoutServer(
        lambda peer, data, rid: got.append((peer, rid, data))
    ).start()
    try:
        cli = GrpcDialoutClient("127.0.0.1", srv.port)
        sid = cli.open_stream()
        cli.send(sid, 1, b'{"k": 1}')
        # 3 x 40 KiB exceeds both default windows: stalls forever
        # unless the server replenishes
        for i in range(3):
            cli.send(sid, 10 + i, b"x" * 40000)
        sid2 = cli.open_stream()  # interleaved second stream
        cli.send(sid2, 99, b'{"k": 3}')
        assert cli.close_stream(sid).get("grpc-status") == "0"
        assert cli.close_stream(sid2).get("grpc-status") == "0"
        cli.close()
        assert [(r, len(d)) for _p, r, d in got] == [
            (1, 8), (10, 40000), (11, 40000), (12, 40000), (99, 8),
        ]
        assert all(p == "127.0.0.1" for p, _r, _d in got)
        assert srv.streams_completed == 2
        # wrong rpc path: consumed, answered UNIMPLEMENTED (12)
        cli2 = GrpcDialoutClient(
            "127.0.0.1", srv.port, path="/other.Service/Rpc"
        )
        s = cli2.open_stream()
        assert cli2.close_stream(s).get("grpc-status") == "12"
        cli2.close()
    finally:
        srv.stop()


def test_grpc_server_survives_malformed_peers():
    """Poison peers (HTTP/1 request, truncated frame, bad protobuf in
    DATA) drop their own connection; the server keeps serving."""
    got = []
    srv = GrpcDialoutServer(
        lambda peer, data, rid: got.append(data)
    ).start()
    try:
        # HTTP/1.1 request instead of the h2 preface
        c = socket.create_connection(("127.0.0.1", srv.port), timeout=5)
        c.sendall(b"GET / HTTP/1.1\r\nHost: x\r\n\r\n" + b"\x00" * 8)
        c.close()
        # valid preface, then a frame with a huge declared length
        c = socket.create_connection(("127.0.0.1", srv.port), timeout=5)
        c.sendall(b"PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n")
        c.sendall(b"\xff\xff\xff\x00\x00\x00\x00\x00\x00")
        c.close()
        # a well-formed stream whose DATA carries garbage protobuf:
        # the connection dies, not the server
        cli = GrpcDialoutClient("127.0.0.1", srv.port)
        sid = cli.open_stream()
        from pmacct_spark.sources.grpc_wire import _frame, F_DATA

        bad = b"\x00" + struct.pack(">I", 3) + b"\x07\xff\xff"
        cli.sock.sendall(_frame(F_DATA, 0, sid, bad))
        cli.sock.close()
        # server still serves a healthy client
        cli3 = GrpcDialoutClient("127.0.0.1", srv.port)
        s3 = cli3.open_stream()
        cli3.send(s3, 7, b'{"k": 9}')
        assert cli3.close_stream(s3).get("grpc-status") == "0"
        cli3.close()
        assert got[-1] == b'{"k": 9}'
    finally:
        srv.stop()


def test_daemon_grpc_dialout_live(spark, tmp_path):
    """End-to-end: telemetry_daemon_grpc_port starts the dial-out
    collector; a router client streams JSON payloads over LIVE gRPC;
    they land in the telemetry spool and come out of the msglog in the
    ietf-telemetry-message envelope — the identical path UDP telemetry
    rides (reference: external collector bridged over ZMQ)."""
    from pmacct_spark.daemon import Daemon

    log_dir = str(tmp_path / "grpclog")
    conf = f"""
telemetry_daemon_grpc_port: 0
telemetry_daemon_msglog_file: {log_dir}
core_proc_name: pmtelemetryd
"""
    d = Daemon.from_conf(spark, conf, spool_dir=str(tmp_path / "grpcspool"))
    try:
        assert d.flavor == "telemetry"
        assert d.grpc is not None
        cli = GrpcDialoutClient("127.0.0.1", d.grpc.port)
        sid = cli.open_stream()
        for k in (1, 2, 3):
            cli.send(
                sid, k, json.dumps({"k": k, "sensor_path": "cpu"}).encode()
            )
        assert cli.close_stream(sid).get("grpc-status") == "0"
        cli.close()
        t0 = time.monotonic()
        while d.spool.datagrams_received < 3 and time.monotonic() - t0 < 15:
            time.sleep(0.05)
        d.spool.flush()
        assert d.run_available() == {}  # no accounting channels
        assert d.write_msglog_if_configured() == [log_dir]
    finally:
        d.stop()
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
    assert msgs[0]["data-collection-manifest"]["name"] == "pmtelemetryd"
