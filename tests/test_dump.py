"""RIB table dump — reference tests/203-BMP-dump (init/route/close
event stream per peer) and 207/304 dump spreading (peers staggered
across the refresh interval via time slots)."""

from __future__ import annotations

import glob
import json
import os

from pmacct_spark.sinks.dump import rib_dump_events, write_rib_dump
from pmacct_spark.streaming.bmp import decode_bmp, rib_state
from tests.test_streaming import _bgp_update, _bmp_msg

PEER_A = 0xC0000205
PEER_B = 0xC0000206


def _rib(spark):
    msgs = (
        _bmp_msg(3, PEER_A, 64500)
        + _bmp_msg(0, PEER_A, 64500, _bgp_update([], [(0x0A010000, 16)], lp=100))
        + _bmp_msg(0, PEER_A, 64500, _bgp_update([], [(0x0A020000, 16)], lp=200))
        + _bmp_msg(3, PEER_B, 64510)
        + _bmp_msg(0, PEER_B, 64510, _bgp_update([], [(0x0A030000, 16)], lp=70))
    )
    dg = spark.createDataFrame(
        [("203.0.113.9", bytearray(msgs))], "exporter_ip string, payload binary"
    )
    return rib_state(decode_bmp(dg))


def test_dump_event_stream_golden(spark):
    ev = rib_dump_events(_rib(spark), dump_ts=1_700_000_100).toPandas()
    a = ev[ev.peer_ip == "192.0.2.5"].sort_values("seq")
    b = ev[ev.peer_ip == "192.0.2.6"].sort_values("seq")
    assert list(a.event_type) == ["dump_init", "dump", "dump", "dump_close"]
    assert list(b.event_type) == ["dump_init", "dump", "dump_close"]
    # close rows carry the per-peer entry count; routes are sequenced
    assert int(a[a.event_type == "dump_close"].entries.iloc[0]) == 2
    assert int(b[b.event_type == "dump_close"].entries.iloc[0]) == 1
    assert list(a[a.event_type == "dump"].seq) == [1, 2]
    # route attributes survive on dump rows, null on init/close
    assert set(a[a.event_type == "dump"].local_pref) == {100, 200}
    assert a[a.event_type == "dump_init"].local_pref.isna().all()
    # single slot: everything scheduled at the tick
    assert set(ev.dump_slot) == {0}
    assert set(ev.scheduled_at) == {1_700_000_100}


def test_dump_spreading_slots(spark):
    ev = rib_dump_events(
        _rib(spark), dump_ts=1000, refresh_secs=60, time_slots=4
    ).toPandas()
    # a peer maps to exactly one slot, and its whole event stream
    # (init, routes, close) shares that slot + schedule
    for _, g in ev.groupby("peer_ip"):
        assert g.dump_slot.nunique() == 1
        assert g.scheduled_at.nunique() == 1
        slot = int(g.dump_slot.iloc[0])
        assert 0 <= slot < 4
        assert int(g.scheduled_at.iloc[0]) == 1000 + slot * 15


def test_write_rib_dump_files(spark, tmp_path):
    out = str(tmp_path / "dump")
    write_rib_dump(_rib(spark), out, dump_ts=1_700_000_100)
    # one directory per (slot, exporter, peer) — the dynamic-name form
    peers = sorted(
        os.path.basename(p)
        for p in glob.glob(os.path.join(out, "dump_slot=0", "exporter_ip=*", "peer_ip=*"))
    )
    assert peers == ["peer_ip=192.0.2.5", "peer_ip=192.0.2.6"]
    rows = []
    for f in glob.glob(os.path.join(out, "**", "*.json"), recursive=True):
        with open(f) as fh:
            rows += [json.loads(line) for line in fh if line.strip()]
    assert sum(r["event_type"] == "dump_init" for r in rows) == 2
    assert sum(r["event_type"] == "dump" for r in rows) == 3
    closes = [r for r in rows if r["event_type"] == "dump_close"]
    assert sorted(c["entries"] for c in closes) == [1, 2]


def test_daemon_bmp_dump_kafka_topic_live(spark, tmp_path):
    """bmp_dump_kafka_topic (src/bgp/bgp_logdump.c kafka branches):
    the dump event stream ships through the LIVE wire broker keyed by
    peer — dump_init/dump/dump_close per peer with the route rows."""
    import json
    import socket
    import time

    from pmacct_spark.daemon import Daemon
    from pmacct_spark.sources.kafka_wire import (
        KafkaWireClient,
        MiniKafkaBroker,
    )
    from tests.test_msglog import _bgp_update, _bmp_msg

    broker = MiniKafkaBroker(npartitions=1).start()
    d = None
    try:
        conf = f"""
nfacctd_port: 0
bmp_daemon: true
bmp_daemon_port: 0
bmp_dump_kafka_topic: daisy.bmp.dump
bmp_dump_kafka_broker_port: {broker.port}
plugins: memory[routes]
aggregate[routes]: as_path
"""
        d = Daemon.from_conf(
            spark, conf, spool_dir=str(tmp_path / "dumpk")
        )
        peer = 0xC0000205
        msgs = (
            _bmp_msg(3, peer, 64500)
            + _bmp_msg(0, peer, 64500, _bgp_update([], [(0x0A010000, 16)]))
        )
        c = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        c.connect(("127.0.0.1", d.bmp_port))
        c.sendall(msgs)
        c.close()
        t0 = time.monotonic()
        while d.bmp_spool.messages_spooled < 1 and time.monotonic() - t0 < 15:
            time.sleep(0.05)
        time.sleep(0.5)
        wrote = d.dump_rib_if_configured()
        assert wrote == f"kafka://127.0.0.1:{broker.port}/daisy.bmp.dump"
        cli = KafkaWireClient("127.0.0.1", broker.port)
        _, recs = cli.fetch("daisy.bmp.dump", 0, 0, with_hwm=True)
        cli.close()
        events = [json.loads(bytes(v)) for (_o, _k, v) in recs]
        types = sorted(e["event_type"] for e in events)
        assert types == ["dump", "dump_close", "dump_init"]
        route = next(e for e in events if e["event_type"] == "dump")
        assert (route["prefix"], route["masklen"]) == (0x0A010000, 16)
        close = next(e for e in events if e["event_type"] == "dump_close")
        assert close["entries"] == 1
        # frames are keyed by the event's peer identity (per-peer
        # ordering within a partition)
        keys = {k.decode() for (_o, k, _v) in recs}
        assert keys == {e["peer_ip"] for e in events}
    finally:
        if d is not None:
            d.stop()
        broker.stop()


def _stats_pdu(entries):
    """RFC 7854 §4.8 Stats Report body: count + [type len value] TLVs."""
    out = len(entries).to_bytes(4, "big")
    for st, ln, val in entries:
        out += st.to_bytes(2, "big") + ln.to_bytes(2, "big")
        out += val.to_bytes(ln, "big")
    return out


def test_bmp_dump_stats_records_and_exclude_toggle(spark, tmp_path):
    """BMP Type-1 Stats Reports are cached into the dump by default
    (bmp_dump_se_ll_append src/bmp/bmp_msg.c:1124) with the reference's
    counter_type / counter_type_str / counter_value record fields
    (bmp_log_msg_stats src/bmp/bmp_logdump.c:377-445);
    bmp_dump_exclude_stats: true keeps them msglog-only
    (CONFIG-KEYS:3217). bmp_dump_latest_file tracks the newest leaf."""
    import socket
    import time

    from pmacct_spark.daemon import Daemon

    def run_one(tag, exclude):
        dump_dir = tmp_path / f"bmpdump_{tag}"
        latest = tmp_path / f"bmpdump_latest_{tag}"
        conf = f"""
nfacctd_port: 0
bmp_daemon: true
bmp_daemon_port: 0
bmp_dump_file: {dump_dir}
bmp_dump_latest_file: {latest}
bmp_dump_exclude_stats: {'true' if exclude else 'false'}
plugins: memory[m]
aggregate[m]: proto
"""
        d = Daemon.from_conf(
            spark, conf, spool_dir=str(tmp_path / f"spoolSD{tag}")
        )
        try:
            peer = 0xC0000205
            msgs = (
                _bmp_msg(3, peer, 64500)
                + _bmp_msg(
                    0, peer, 64500,
                    _bgp_update([], [(0x0A010000, 16)], lp=100),
                )
                + _bmp_msg(
                    1, peer, 64500,
                    _stats_pdu([(0, 4, 12), (7, 8, 34567)]),
                )
            )
            c = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            c.connect(("127.0.0.1", d.bmp_port))
            c.sendall(msgs)
            c.close()
            t0 = time.monotonic()
            while (
                d.bmp_spool.messages_spooled < 1
                and time.monotonic() - t0 < 15
            ):
                time.sleep(0.05)
            time.sleep(0.5)
            assert d.dump_rib_if_configured() == str(dump_dir)
        finally:
            d.stop()
        recs = []
        for f in glob.glob(str(dump_dir / "**" / "*.json"),
                           recursive=True):
            with open(f) as fh:
                recs += [json.loads(ln) for ln in fh if ln.strip()]
        assert latest.is_symlink() or latest.exists()
        return recs

    recs = run_one("incl", exclude=False)
    stats = [r for r in recs if r.get("bmp_msg_type") == "stats"]
    assert {
        (s["counter_type"], s["counter_value"]) for s in stats
    } == {(0, 12), (7, 34567)}
    s0 = next(s for s in stats if s["counter_type"] == 0)
    assert s0["counter_type_str"] == (
        "Number of prefixes rejected by inbound policy"
    )
    assert s0["event_type"] == "dump"
    # route stream still intact alongside the stats lines
    assert any(r.get("event_type") == "dump_init" for r in recs)

    recs = run_one("excl", exclude=True)
    assert not [r for r in recs if r.get("bmp_msg_type") == "stats"]
    assert any(r.get("event_type") == "dump_init" for r in recs)
