"""Stateful ImtTable semantics: -r reset-after-read, -e erase, file:
match specs — side effects the oracle can't express (reference
src/server.c:158 set_reset_flag, :216-235 erase)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pmacct_spark.client import ImtTable, compile_match
from pmacct_spark.config import PluginConfig
from pmacct_spark.driver_queries import flows
from pmacct_spark.pipeline import build_aggregation
from tests.conftest import SF_DIR


def _table(spark) -> ImtTable:
    cfg = PluginConfig(aggregate=["src_as", "dst_as"])
    agg = build_aggregation(flows(spark, SF_DIR), cfg)
    return ImtTable(agg, ["src_as", "dst_as"], ["bytes", "packets", "flows"])


def test_match_reset_zeroes_only_matched(spark):
    t = _table(spark)
    before = t.stats().count()
    served = t.match("64505,*", reset_after=True)
    assert served.count() > 0
    # matched rows remain, counters zeroed; row count unchanged
    assert t.stats().count() == before
    zeroed = t.df.filter(F.col("src_as") == 64505)
    assert zeroed.filter("bytes <> 0 OR packets <> 0 OR flows <> 0").count() == 0
    untouched = t.df.filter(F.col("src_as") == 64506)
    assert untouched.filter("bytes > 0").count() > 0


def test_erase_empties_table(spark):
    t = _table(spark)
    assert t.stats().count() > 0
    t.erase()
    assert t.stats().count() == 0


def test_file_spec(spark, tmp_path):
    t = _table(spark)
    p = tmp_path / "specs.txt"
    p.write_text("64505,*\n64510,64513\n")
    via_file = t.match(f"file:{p}").count()
    inline = t.match("64505,*;64510,64513").count()
    assert via_file == inline > 0


def test_wildcard_only_spec_matches_all(spark):
    t = _table(spark)
    assert t.match("*,*").count() == t.stats().count()


def test_compile_match_field_count_mismatch(spark):
    try:
        compile_match(["a", "b"], "1,2,3")
    except ValueError as e:
        assert "3 fields" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_cli_adapter(spark):
    """Client flags map to the served-table API; outputs render in the
    reference's three formats."""
    from pmacct_spark.client.cli import ClientRequest, render, run_client
    from pmacct_spark.config import PluginConfig
    from pmacct_spark.pipeline import build_aggregation

    cfg = PluginConfig(aggregate=["proto", "dst_port"])
    agg = build_aggregation(flows(spark, SF_DIR), cfg)
    t = ImtTable(agg, ["proto", "dst_port"], ["bytes", "packets", "flows"])

    topn = run_client(t, ClientRequest(topn=("bytes", 3)))
    assert topn.count() == 3
    out = render(topn, "csv")
    assert out.splitlines()[0] == "proto,dst_port,bytes,packets,flows"
    # -u off: proto rendered by name
    assert any(p in out for p in ("tcp", "udp", "icmp"))
    numeric = run_client(t, ClientRequest(topn=("bytes", 3), numeric_protos=True))
    assert not any(p in render(numeric, "csv") for p in ("tcp", "udp", "icmp"))

    m = run_client(t, ClientRequest(match="6,443", counters_only=True))
    assert set(m.columns) == {"bytes", "packets", "flows"}
    import json
    j = render(run_client(t, ClientRequest(match="6,*")), "json")
    assert all(json.loads(ln)["proto"] == "tcp" for ln in j.splitlines())
    fmt = render(run_client(t, ClientRequest(show_all=True)), "formatted")
    assert fmt.splitlines()[0].startswith("PROTO")
    run_client(t, ClientRequest(erase=True))
    assert t.stats().count() == 0


def test_addr_functions(spark):
    from pmacct_spark.functions.addr import (
        ipv4_aton,
        ipv4_mask_apply,
        ipv4_ntoa,
        ipv6_canonical,
    )

    df = spark.createDataFrame(
        [("10.1.2.3",), ("192.168.255.1",), ("0.0.0.0",)], "ip string"
    ).withColumn("i", ipv4_aton("ip"))
    back = df.withColumn("rt", ipv4_ntoa("i")).collect()
    for r in back:
        assert r["rt"] == r["ip"]
    assert back[0]["i"] == 10 * 16777216 + 1 * 65536 + 2 * 256 + 3
    masked = df.withColumn("net", ipv4_ntoa(ipv4_mask_apply("i", 24))).collect()
    assert masked[0]["net"] == "10.1.2.0"
    assert masked[1]["net"] == "192.168.255.0"
    v6 = spark.createDataFrame(
        [("2001:0DB8:0000:0001::0001",), ("FE80::1",)], "a string"
    ).select(ipv6_canonical("a").alias("c")).collect()
    assert v6[0]["c"] == "2001:db8:0:1::1"
    assert v6[1]["c"] == "fe80::1"
def test_cli_status_and_primitive_listing(spark):
    """-t: table status summary; -a: registry primitive listing."""
    from pmacct_spark.client.cli import ClientRequest, list_primitives, run_client
    from pmacct_spark.config import PluginConfig
    from pmacct_spark.pipeline import build_aggregation

    cfg = PluginConfig(aggregate=["proto"])
    agg = build_aggregation(flows(spark, SF_DIR), cfg)
    t = ImtTable(agg, ["proto"], ["bytes", "packets", "flows"])

    st = run_client(t, ClientRequest(status=True)).first()
    assert st["entries"] == agg.count()
    assert st["total_bytes"] == agg.agg({"bytes": "sum"}).first()[0]

    prims = list_primitives()
    assert "src_host" in prims and "sum_host" in prims and "none" in prims
    assert "vxlan" in prims and "srv6_seg_ipv6_list" in prims  # full vocab
    pa = run_client(t, ClientRequest(list_primitives=True))
    assert pa.count() == len(prims)


def test_argv_main_end_to_end(spark):
    """`python -m pmacct_spark.client` flag surface: -c/-s/-T/-O/-N."""
    from pmacct_spark.client.cli import main, parse_argv

    out = main(["-c", "proto", "-s", "-O", "csv", "-u"], spark=spark)
    lines = out.splitlines()
    assert lines[0].startswith("proto")
    assert len(lines) > 1

    out = main(["-c", "proto", "-T", "bytes,2", "-O", "json", "-u"], spark=spark)
    assert len(out.splitlines()) == 2

    req, keys, _ = parse_argv(["-c", "src_host,dst_host", "-N", "*,10.0.0.1", "-S"])
    assert keys == ["src_host", "dst_host"]
    assert req.counters_only and req.sum_matches and req.match == "*,10.0.0.1"

    assert "src_host" in main(["-a"], spark=spark).splitlines()


def test_imt_socket_server(spark, tmp_path):
    """The -s/-M/-N/-T/-t/-e vocabulary over a UNIX socket (reference
    src/server.c): concurrent client requests against a served table."""
    from pmacct_spark.client.imt import ImtTable
    from pmacct_spark.client.server import ImtServer, query

    df = spark.createDataFrame(
        [("10.0.0.1", 6, 100, 1), ("10.0.0.2", 17, 50, 2),
         ("10.0.0.1", 17, 7, 3)],
        "src_host string, proto long, bytes long, packets long",
    )
    table = ImtTable(df, keys=["src_host", "proto"], counters=["bytes", "packets"])
    srv = ImtServer(table, str(tmp_path / "collect.pipe")).start()
    try:
        r = query(srv.path, {"cmd": "stats"})
        assert r["ok"] and len(r["rows"]) == 3

        r = query(srv.path, {"cmd": "match", "spec": "10.0.0.1,*"})
        assert len(r["rows"]) == 2

        r = query(srv.path, {"cmd": "match", "spec": "10.0.0.1,*", "sum": True})
        assert r["columns"] == ["bytes", "packets"]
        assert r["rows"][0] == [107, 4]

        r = query(srv.path, {"cmd": "topn", "counter": "bytes", "n": 1})
        assert r["rows"][0][r["columns"].index("bytes")] == 100

        r = query(srv.path, {"cmd": "status"})
        assert r["ok"]

        r = query(srv.path, {"cmd": "nope"})
        assert not r["ok"] and "unknown cmd" in r["error"]

        r = query(srv.path, {"cmd": "erase"})
        assert r["ok"]
        assert query(srv.path, {"cmd": "stats"})["rows"] == []
    finally:
        srv.stop()
