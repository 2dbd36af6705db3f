"""Reference-format config/map loaders: a pmacct user's files drive
this engine. Fixtures are original but follow the documented grammars
(CONFIG-KEYS key files, examples/*.example map formats).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pmacct_spark import conffile

CONF = """
! daemon config
daemonize: false
timestamps_secs: true
plugins: kafka[k1], print[p1]
aggregate[k1]: src_host, dst_host, proto
aggregate[p1]: proto
kafka_history[k1]: 5m
kafka_history_roundoff[k1]: m
print_history[p1]: 1h
print_preprocess[p1]: minb=100,maxbpp=1500
aggregate_filter[p1]: proto = 6    ! tcp only
pre_tag_filter[k1]: 100,200
nfacctd_stitching: true
nfacctd_renormalize: true
"""


def test_parse_conf_and_channels():
    conf = conffile.parse_conf(CONF)
    assert conf.plugins == [("kafka", "k1"), ("print", "p1")]
    assert conf.getbool("timestamps_secs")
    assert conf.get("kafka_history", "k1") == "5m"

    chans = conffile.channels(conf)
    assert set(chans) == {"k1", "p1"}
    k1, p1 = chans["k1"], chans["p1"]
    assert k1.aggregate == ["src_host", "dst_host", "proto"]
    assert k1.history == "5m" and k1.history_roundoff == "m"
    assert k1.pre_tag_filter == [100, 200]
    assert k1.stitching and k1.renormalize and k1.timestamps_secs
    assert p1.history == "1h"
    assert p1.aggregate_filter == "proto = 6"
    assert p1.preprocess.minb == 100 and p1.preprocess.maxbpp == 1500
    assert "bytes >= 100" in p1.preprocess.having_sql()


def test_channels_drive_real_aggregation(spark):
    """A parsed channel builds the same plan a hand-written
    PluginConfig does."""
    from pmacct_spark.driver_queries import flows
    from pmacct_spark.pipeline import build_aggregation
    from tests.conftest import SF_DIR

    conf = conffile.parse_conf(
        "plugins: memory[m1]\naggregate[m1]: proto\nsql_history[m1]: 5m\n"
    )
    cfg = conffile.channels(conf)["m1"]
    got = build_aggregation(flows(spark, SF_DIR), cfg)
    assert {"stamp_inserted", "proto", "bytes", "packets", "flows"} <= set(
        got.columns
    )
    assert got.count() > 0


PRETAG_MAP = """
! ordered rules, first full match wins
set_tag=100 set_label=cust-a ip=192.0.2.31/32 in=10
set_tag=200 ip=192.0.2.31 in=-10 jeq=others
set_tag=300 label=others ip=192.0.2.32 src_port=443
set_tag=400 ip=192.0.2.32
"""


def test_parse_pretag_map_applies(spark):
    rules = conffile.parse_pretag_map(PRETAG_MAP)
    assert len(rules) == 4
    assert rules[0].set_tag == 100 and rules[0].set_label == "cust-a"
    assert rules[0].match == {"peer_src_ip": "192.0.2.31", "iface_in": 10}
    assert rules[1].match["iface_in"] == ("!=", 10)  # negation
    assert rules[1].jeq == "others" and rules[2].label == "others"

    from pmacct_spark.operators.pretag import apply_pretag

    df = spark.createDataFrame(
        [
            ("192.0.2.31", 10, 80),
            ("192.0.2.31", 20, 80),   # in!=10 -> rule 2, jeq skips rule 3
            ("192.0.2.32", 1, 443),
            ("192.0.2.32", 1, 80),
        ],
        "peer_src_ip string, iface_in int, src_port int",
    ).withColumnRenamed("src_port", "port_src")
    got = {
        (r["peer_src_ip"], r["iface_in"], r["port_src"]): r["tag"]
        for r in apply_pretag(df, rules).collect()
    }
    assert got == {
        ("192.0.2.31", 10, 80): 100,
        ("192.0.2.31", 20, 80): 200,
        ("192.0.2.32", 1, 443): 300,
        ("192.0.2.32", 1, 80): 400,
    }


NETWORKS = """
! all four documented row formats
192.168.95.0/24
65001,10.0.0.0/8
64512_65002,172.16.0.0/12
10.0.0.254,65003,192.168.0.0/16
2001:db8::/32
"""


def test_parse_networks_file_and_lpm(spark):
    rows = conffile.parse_networks_file(NETWORKS)
    assert len(rows) == 5
    by_mask = {r["masklen"]: r for r in rows if not r["v6"]}
    assert by_mask[24]["asn"] is None
    assert by_mask[8]["asn"] == 65001
    assert by_mask[12]["peer_as"] == 64512 and by_mask[12]["asn"] == 65002
    assert by_mask[16]["nexthop"] == "10.0.0.254"
    assert any(r["v6"] and r["masklen"] == 32 for r in rows)

    from pmacct_spark.operators.lpm import lpm_join

    nets = spark.createDataFrame(
        [
            (r["net_int"], r["masklen"], r["asn"] or 0)
            for r in rows
            if not r["v6"] and r["asn"]
        ],
        "net_int long, masklen int, asn long",
    )
    fl = spark.createDataFrame(
        [(1, 0x0A010101), (2, 0xAC100101)], "rid long, ip long"
    )
    got = {
        r["rid"]: r["src_as"]
        for r in lpm_join(fl, nets, "ip", {"asn": "src_as"}).collect()
    }
    assert got == {1: 65001, 2: 65002}


def test_parse_ports_sampling_customs():
    assert conffile.parse_ports_file("! c\n22\n443\n22\n") == [22, 443]

    # protos_file: names and numbers; 255 ('others') and garbage skip
    assert conffile.parse_protos_file(
        "! keep\ntcp\nUDP\n1\n255\nnotaproto\nospf\n"
    ) == [1, 6, 17, 89]

    smap = conffile.parse_sampling_map(
        "id=64 ip=192.0.2.31/32\nid=1024 ip=192.0.2.32 in=9\n"
    )
    assert smap == [
        {"rate": 64, "exporter_ip": "192.0.2.31"},
        {"rate": 1024, "exporter_ip": "192.0.2.32", "iface_in": 9},
    ]

    cust = conffile.parse_custom_primitives(
        "name=vrf_id_ingress field_type=234 len=4 semantics=u_int\n"
        "name=app_name field_type=42:2 len=8 semantics=string\n"
    )
    assert cust[0].name == "vrf_id_ingress" and cust[0].ie == 234
    assert cust[0].pen == 0 and cust[0].length == 4
    assert cust[1].pen == 42 and cust[1].ie == 2
    assert cust[1].semantics == "string"
    assert cust[1].key == (42 << 16) | 2


def test_pretag_unsupported_key_skips_line():
    """A rule using a MATCH key the engine doesn't carry (e.g. the BPF
    'filter=') must skip the WHOLE line — keeping the recognized keys
    only would compile an overbroad (possibly match-all) rule that
    dead-codes every later rule (code-review r4)."""
    rules = conffile.parse_pretag_map(
        "set_tag=100 filter=port_80\n"        # unsupported key -> skip
        "set_tag=150\n"                        # no match at all: keep
        "garbage line without keys\n"          # nothing parsed -> skip
        "set_tag=200 ip=192.0.2.1\n"
    )
    tags = [r.set_tag for r in rules]
    assert tags == [150, 200]
    assert rules[1].match == {"peer_src_ip": "192.0.2.1"}


def test_pretag_ip_cidr_prefix_match(spark):
    """pre_tag_map ip= with a non-host CIDR prefix-matches the
    exporter address (reference src/pretag.c), instead of a
    never-firing string equality."""
    from pmacct_spark.conffile import parse_pretag_map
    from pmacct_spark.operators.pretag import apply_pretag

    rules = parse_pretag_map(
        "set_tag=100 ip=10.1.0.0/16\n"
        "set_tag=200 ip=10.0.0.0/8\n"
    )
    df = spark.createDataFrame(
        [("10.1.2.3",), ("10.9.9.9",), ("192.0.2.1",)],
        "peer_src_ip string",
    )
    got = {r.peer_src_ip: r.tag for r in apply_pretag(df, rules).collect()}
    assert got == {"10.1.2.3": 100, "10.9.9.9": 200, "192.0.2.1": 0}


def test_conf_typed_prefers_plugin_type(spark):
    """A scoped print_history[p] beats a global sql_history for a
    print channel; sfacctd_renormalize is honored like nfacctd_."""
    from pmacct_spark.conffile import channels, parse_conf

    conf = parse_conf(
        "plugins: print[p1], sql[s1]\n"
        "sql_history: 60m\n"
        "print_history[p1]: 5m\n"
        "sfacctd_renormalize: true\n"
        "aggregate[p1]: proto\naggregate[s1]: proto\n"
    )
    ch = channels(conf)
    assert ch["p1"].history == "5m"
    assert ch["s1"].history == "60m"
    assert ch["p1"].renormalize and ch["s1"].renormalize


def test_pretag_ip_v6_slash32_is_prefix_not_host(spark):
    """A v6 /32 in ip= is a huge prefix, not a host address: the line
    must be skipped as unsupported (v6 exporters aren't columned),
    never kept as a silently-never-matching equality rule."""
    from pmacct_spark.conffile import parse_pretag_map

    rules = parse_pretag_map(
        "set_tag=5 ip=2001:db8::/32\n"        # v6 prefix: skip line
        "set_tag=6 ip=2001:db8::1/128\n"      # v6 host: equality ok
        "set_tag=7 ip=10.0.0.1/32\n"          # v4 host: equality ok
    )
    assert len(rules) == 2
    assert rules[0].match == {"peer_src_ip": "2001:db8::1"}
    assert rules[1].match == {"peer_src_ip": "10.0.0.1"}


def test_refresh_time_resolves_per_channel(spark):
    """print_refresh_time[p] overrides the default trigger for that
    channel only (the reference's per-plugin purge cadence)."""
    from pmacct_spark.conffile import _typed, parse_conf

    conf = parse_conf(
        "plugins: print[p1], sql[s1]\n"
        "print_refresh_time[p1]: 30\n"
        "sql_refresh_time: 300\n"
    )
    assert _typed(conf, "p1", "refresh_time", "print") == "30"
    assert _typed(conf, "s1", "refresh_time", "sql") == "300"


def test_parse_bgp_xconnect_map():
    from pmacct_spark.conffile import parse_bgp_xconnect_map

    e = parse_bgp_xconnect_map(
        "! comment\n"
        "bgp_dst=10.0.0.1:17901\tbgp_src=192.168.0.1\n"
        "bgp_dst=10.0.0.1:17910\tbgp_src=192.168.10.0/24\n"
        "bgp_dst=[2001:db8::1]:179 bgp_src=2001:db8:f::/48\n"
        "bgp_src=1.2.3.4\n"  # no SET key: skipped
    )
    assert len(e) == 3
    assert e[0]["dst_host"] == "10.0.0.1" and e[0]["dst_port"] == 17901
    assert str(e[1]["src"]) == "192.168.10.0/24"
    assert e[2]["dst_host"] == "2001:db8::1" and e[2]["dst_port"] == 179


def test_parse_bgp_md5_file():
    from pmacct_spark.conffile import parse_bgp_md5_file

    keys = parse_bgp_md5_file(
        "!\n! Sample BGP MD5 map\n!\n"
        "192.168.1.1, arealsmartpwd\n"
        "192.168.1.2, TestTest\n"
        "! trailing comment\n"
    )
    assert keys == {
        "192.168.1.1": b"arealsmartpwd",
        "192.168.1.2": b"TestTest",
    }


def test_match_xconnect_first_match_wins():
    from pmacct_spark.conffile import parse_bgp_xconnect_map
    from pmacct_spark.sources.xconnect import match_xconnect

    e = parse_bgp_xconnect_map(
        "bgp_dst=10.0.0.1:1 bgp_src=192.168.0.1\n"
        "bgp_dst=10.0.0.1:2 bgp_src=192.168.0.0/24\n"
    )
    assert match_xconnect(e, "192.168.0.1")["dst_port"] == 1
    assert match_xconnect(e, "192.168.0.7")["dst_port"] == 2
    assert match_xconnect(e, "10.9.9.9") is None


def test_parse_kafka_config_file():
    """kafka_config_file (CONFIG-KEYS:851): CSV <type, key, value>
    lines, type in {global, topic}; the value field is NOT parsed so
    it may contain commas; bad lines warn and skip."""
    from pmacct_spark.conffile import parse_kafka_config_file

    cfg = parse_kafka_config_file(
        "! librdkafka tuning\n"
        "topic, compression.codec, snappy\n"
        "global, socket.keepalive.enable, true\n"
        "global, request.required.acks, 0\n"
        "global, metadata.broker.list, h1:9092,h2:9092\n"  # commas ok
        "bogus line\n"
        "neither, a, b\n"
    )
    assert cfg["topic"] == {"compression.codec": "snappy"}
    assert cfg["global"]["request.required.acks"] == "0"
    assert cfg["global"]["metadata.broker.list"] == "h1:9092,h2:9092"
    assert "a" not in cfg["global"] and "a" not in cfg["topic"]


def test_wire_producer_options_mapping():
    """The wire producer honors acks/timeout/batch properties; the
    rest are accepted-but-inert with a warning (pass-through contract
    of the reference: no validation on key/value)."""
    from pmacct_spark.conffile import parse_kafka_config_file
    from pmacct_spark.sources.kafka_wire import wire_producer_options

    opts = wire_producer_options(parse_kafka_config_file(
        "global, request.required.acks, 0\n"
        "global, request.timeout.ms, 2500\n"
        "global, batch.num.messages, 64\n"
        "topic, compression.codec, snappy\n"   # inert, warns
        "global, sasl.mechanisms, PLAIN\n"     # inert, warns
    ))
    assert opts == {"acks": 0, "timeout_ms": 2500, "batch_messages": 64}


def test_parse_tee_receivers_kafka_entries():
    """tee_receivers kafka_broker/kafka_topic keys
    (examples/tee_receivers.lst.example): a pool may route to a Kafka
    broker instead of UDP receivers; kafka_topic is mandatory when
    kafka_broker is set."""
    from pmacct_spark.conffile import parse_tee_receivers

    e = parse_tee_receivers(
        "id=1 kafka_broker=127.0.0.1:9092 kafka_topic=tee.rx\n"
        "id=2 ip=192.168.1.1:2100\n"
        "id=3 kafka_broker=127.0.0.1:9092\n"  # missing topic: skipped
    )
    assert len(e) == 2
    assert e[0]["kafka_broker"] == "127.0.0.1:9092"
    assert e[0]["kafka_topic"] == "tee.rx"
    assert e[1]["pool"] == ["192.168.1.1:2100"]


def test_parse_bgp_peer_dst_ip_map():
    """bgp_peer_dst_ip_map (CONFIG-KEYS:3011): id (mapped address) +
    bgp_nexthop entries, bad lines skipped."""
    from pmacct_spark.conffile import parse_bgp_peer_dst_ip_map

    e = parse_bgp_peer_dst_ip_map(
        "! RSVP-TE tail-ends\n"
        "id=198.51.100.1 bgp_nexthop=172.32.0.1\n"
        "id=198.51.100.2 bgp_nexthop=172.32.1.1 ip=192.0.2.1\n"
        "id=not-an-ip bgp_nexthop=172.32.2.1\n"
        "id=198.51.100.9\n"
    )
    assert len(e) == 2
    assert e[0] == {"id": "198.51.100.1", "bgp_nexthop": "172.32.0.1"}
    assert e[1]["ip"] == "192.0.2.1"


def test_pretag_sample_type_vocabulary():
    """pre_tag_map sample_type (PT_map_sample_type_handler
    src/pretag_handlers.c:718-744): the NetFlow vocabulary maps onto
    flow_type code points (src/pmacct-defines.h:588-609), 'flow'
    collapses the traffic range, '-' negates, and the sFlow N:M form
    (no sample-type column in this engine) skips the rule like any
    unsupported key."""
    from pmacct_spark.conffile import parse_pretag_map

    rules = parse_pretag_map(
        "set_tag=100 sample_type=option\n"
        "set_tag=200 sample_type=flow\n"
        "set_tag=300 sample_type=flow-ipv6\n"
        "set_tag=400 sample_type=event\n"
        "set_tag=500 sample_type=-option\n"
        "set_tag=600 sample_type=-flow\n"
        "set_tag=700 sample_type=0:3\n"      # sFlow form: skipped
        "set_tag=800 sample_type=bogus\n"    # typo: skipped
    )
    assert [r.set_tag for r in rules] == [100, 200, 300, 400, 500, 600]
    specs = [r.match["flow_type"] for r in rules]
    assert specs == [
        200,
        ("range", (1, 99)),
        3,
        100,
        ("!=", 200),
        ("not range", (1, 99)),
    ]


def test_custom_primitives_vlen():
    """primitives.lst len=vlen (the CONFIG-KEYS:2090
    nfacctd_account_options example) parses to the vlen sentinel
    instead of raising."""
    from pmacct_spark.conffile import parse_custom_primitives

    out = parse_custom_primitives(
        "name=vrf_id   field_type=234 len=4    semantics=u_int\n"
        "name=vrf_name field_type=236 len=vlen semantics=str\n"
    )
    assert [(c.name, c.length) for c in out] == [
        ("vrf_id", 4), ("vrf_name", 65535),
    ]


def test_tee_receiver_pool_caps():
    """tee_max_receiver_pools / tee_max_receivers (CONFIG-KEYS:3486,
    3492): pools beyond the cap drop whole, receivers beyond the
    per-pool cap truncate — the reference's fixed allocations made
    these hard limits."""
    from pmacct_spark.conffile import parse_tee_receivers

    text = (
        "id=1 ip=10.0.0.1:2100,10.0.0.2:2100,10.0.0.3:2100\n"
        "id=2 ip=10.0.1.1:2100\n"
        "id=3 ip=10.0.2.1:2100\n"
    )
    out = parse_tee_receivers(text, max_pools=2, max_receivers=2)
    assert [e["id"] for e in out] == ["1", "2"]
    assert out[0]["pool"] == ["10.0.0.1:2100", "10.0.0.2:2100"]
    # defaults keep everything
    assert len(parse_tee_receivers(text)) == 3
