"""End-to-end daemon scenario: a reference-format config drives the
whole collector — live UDP socket -> v5 wire decode -> two plugin
channels (memory + print) -> sinks — and the emitted aggregates match
a hand-computed golden. This is the nfacctd top loop as one test.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from pmacct_spark.daemon import Daemon
from pmacct_spark.sources.udp import send_datagrams
from tests.test_streaming import _v5_datagram

CONF = """
! collector
nfacctd_ip: 127.0.0.1
nfacctd_port: 0            ! ephemeral for the test
plugins: memory[imt], print[files]
aggregate[imt]: src_host, dst_host
sql_history[imt]: 5m
aggregate[files]: proto
print_history[files]: 5m
print_output[files]: csv
"""


def _fire(port: int) -> dict:
    """Send two v5 datagrams; return the expected per-proto golden."""
    recs1 = [
        {"src": 0x0A000001, "dst": 0x0B000001, "pkts": 10, "bytes": 1000,
         "sport": 1234, "dport": 443, "proto": 6},
        {"src": 0x0A000002, "dst": 0x0B000001, "pkts": 2, "bytes": 200,
         "sport": 53, "dport": 53, "proto": 17},
    ]
    recs2 = [
        {"src": 0x0A000001, "dst": 0x0B000001, "pkts": 5, "bytes": 500,
         "sport": 1235, "dport": 443, "proto": 6},
    ]
    sent = send_datagrams(
        [_v5_datagram(1, recs1), _v5_datagram(2, recs2)], "127.0.0.1", port
    )
    assert sent == 2
    return {6: (1500, 15, 2), 17: (200, 2, 1)}


def test_daemon_conf_to_sinks(spark, tmp_path):
    conf = CONF + f"print_output_file[files]: {tmp_path / 'out_csv'}\n"
    d = Daemon.from_conf(
        spark, conf, spool_dir=str(tmp_path / "spool")
    )
    try:
        golden = _fire(d.port)
        t0 = time.monotonic()
        while d.spool.datagrams_received < 2 and time.monotonic() - t0 < 15:
            time.sleep(0.05)
        assert d.spool.datagrams_received == 2
        results = d.run_available()
    finally:
        d.stop()

    # memory plugin: src/dst host keys, IMT table registered
    imt = results["imt"]
    assert spark.table("imt_imt").count() == imt.count()
    rows = {
        (r["src_host"], r["dst_host"]): (r["bytes"], r["packets"], r["flows"])
        for r in imt.collect()
    }
    assert rows == {
        ("10.0.0.1", "11.0.0.1"): (1500, 15, 2),
        ("10.0.0.2", "11.0.0.1"): (200, 2, 1),
    }

    # print plugin: per-proto channel, CSV on disk with header
    got = {
        int(r["proto"]): (int(r["bytes"]), int(r["packets"]), int(r["flows"]))
        for r in spark.read.option("header", "true")
        .csv(str(tmp_path / "out_csv"))
        .collect()
    }
    assert got == golden


def test_daemon_batch_replay_equals_streaming(spark, tmp_path):
    """The same spool replayed as a BATCH plan (pcap-savefile shape)
    produces the identical channel result."""
    d = Daemon.from_conf(
        spark, CONF, spool_dir=str(tmp_path / "spool2")
    )
    try:
        _fire(d.port)
        t0 = time.monotonic()
        while d.spool.datagrams_received < 2 and time.monotonic() - t0 < 15:
            time.sleep(0.05)
        live = {
            tuple(r)
            for r in results_select(d.run_available(streaming=True)["files"])
        }
        replay = {
            tuple(r)
            for r in results_select(d.run_available(streaming=False)["files"])
        }
    finally:
        d.stop()
    assert live == replay and live


def results_select(df):
    return df.select(
        "stamp_inserted", "proto", "bytes", "packets", "flows"
    ).collect()
