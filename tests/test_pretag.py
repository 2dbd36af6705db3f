"""Unit semantics of the pre_tag_map compiler: first-match stop, jeq
forward jumps, stack composition, negation — mirrors the reference's
rule evaluation (src/pretag.c:1117; tests/102-*, tests/103-*)."""

from __future__ import annotations

import pytest

from pmacct_spark.operators.pretag import Rule, apply_pretag


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        # (exporter, iface, asn)
        ("10.0.0.1", 1, 65001),
        ("10.0.0.1", 2, 65002),
        ("10.0.0.2", 1, 65001),
        ("10.0.0.3", 9, 65003),
    ]
    return spark.createDataFrame(rows, "peer_ip_src string, iface_in int, as_src int")


def tags(df, rules, col="tag"):
    out = apply_pretag(df, rules)
    return {
        (r.peer_ip_src, r.iface_in): r[col]
        for r in out.collect()
    }


def test_first_match_stops(df):
    rules = [
        Rule(match={"peer_ip_src": "10.0.0.1"}, set_tag=10),
        Rule(match={"iface_in": 1}, set_tag=20),  # also matches row 1
    ]
    t = tags(df, rules)
    assert t[("10.0.0.1", 1)] == 10  # first rule wins, no fallthrough
    assert t[("10.0.0.2", 1)] == 20
    assert t[("10.0.0.3", 9)] == 0  # default


def test_jeq_continues_at_label(df):
    rules = [
        Rule(match={"peer_ip_src": "10.0.0.1"}, set_tag=10, jeq="ifc"),
        Rule(match={"peer_ip_src": "10.0.0.2"}, set_tag=20),
        Rule(label="ifc", match={"iface_in": 2}, set_tag=99),
    ]
    t = tags(df, rules)
    # row (10.0.0.1, 2): rule0 matches -> jump to 'ifc' -> matches -> tag
    # overwritten (no stack)
    assert t[("10.0.0.1", 2)] == 99
    # row (10.0.0.1, 1): rule0 matches, jumps, 'ifc' does not match -> 10
    assert t[("10.0.0.1", 1)] == 10
    assert t[("10.0.0.2", 1)] == 20


def test_stack_sum_composes(df):
    rules = [
        Rule(match={"peer_ip_src": "10.0.0.1"}, set_tag=100, jeq="ifc"),
        Rule(label="ifc", match={"iface_in": 2}, set_tag=5, stack="sum"),
    ]
    t = tags(df, rules)
    assert t[("10.0.0.1", 2)] == 105
    assert t[("10.0.0.1", 1)] == 100


def test_stack_or_composes(df):
    rules = [
        Rule(match={"peer_ip_src": "10.0.0.1"}, set_tag=8, jeq="ifc"),
        Rule(label="ifc", match={"iface_in": ("in", [1, 2])}, set_tag=3, stack="or"),
    ]
    t = tags(df, rules)
    assert t[("10.0.0.1", 1)] == 11  # 8 | 3
    assert t[("10.0.0.3", 9)] == 0


def test_negation(df):
    rules = [Rule(match={"peer_ip_src": ("!=", "10.0.0.1")}, set_tag=7)]
    t = tags(df, rules)
    assert t[("10.0.0.1", 1)] == 0
    assert t[("10.0.0.2", 1)] == 7


def test_jeq_backward_rejected(df):
    rules = [
        Rule(label="a", match={}, set_tag=1),
        Rule(match={"iface_in": 1}, set_tag=2, jeq="a"),
    ]
    with pytest.raises(ValueError, match="non-forward"):
        apply_pretag(df, rules)


def test_tag2_independent(df):
    rules = [
        Rule(match={"peer_ip_src": "10.0.0.1"}, set_tag=1, set_tag2=42),
        Rule(match={"iface_in": 1}, set_tag2=43),
    ]
    out = apply_pretag(df, rules)
    got = {(r.peer_ip_src, r.iface_in): (r.tag, r.tag2) for r in out.collect()}
    assert got[("10.0.0.1", 1)] == (1, 42)
    assert got[("10.0.0.2", 1)] == (0, 43)


def test_sample_type_range_op(df, spark):
    """sample_type=flow collapses the 1..99 traffic range at match
    time (pretag_sample_type_handler src/pretag_handlers.c:2327);
    option records match the exact 200 code point. Both the Spark
    compile and the duck_case_sql rendering must agree."""
    import duckdb

    from pmacct_spark.operators.pretag import duck_case_sql

    rows = [(2,), (7,), (99,), (100,), (200,)]
    ft = spark.createDataFrame(rows, "flow_type int")
    rules = [
        Rule(match={"flow_type": 200}, set_tag=100),
        Rule(match={"flow_type": ("range", (1, 99))}, set_tag=200),
    ]
    got = {
        r.flow_type: r.tag for r in apply_pretag(ft, rules).collect()
    }
    assert got == {2: 200, 7: 200, 99: 200, 100: 0, 200: 100}
    sql = duck_case_sql(rules)
    duck = {
        ftv: duckdb.sql(
            f"SELECT {sql} FROM (SELECT {ftv} AS flow_type)"
        ).fetchone()[0]
        for (ftv,) in rows
    }
    assert duck == got


def test_label_filter_keep_semantics(spark):
    """pre_tag_label_filter compile vs evaluate_labels_v2 (reference
    src/util.c:2289): token-set match on comma-separated labels, 'null'
    for unlabelled, ordered evaluation where a matching positive entry
    delivers, the FIRST negated entry always decides, and an exhausted
    filter drops."""
    from pmacct_spark.operators.pretag import label_filter_keep

    rows = [
        ("edge",), ("core,edge",), ("core",), (None,), ("",), ("edgy",),
    ]
    df = spark.createDataFrame(rows, "label string")

    def kept(entries):
        return sorted(
            r["label"] or "<null>"
            for r in df.filter(label_filter_keep(entries)).collect()
        )

    # positive OR list
    assert kept(["edge"]) == ["core,edge", "edge"]
    assert kept(["edge", "core"]) == ["core", "core,edge", "edge"]
    # 'null' keyword matches unlabelled (NULL and empty both)
    assert kept(["null"]) == ["<null>", "<null>"]
    # negation: '-edge' drops edge-labelled, delivers everything else
    # (a non-matching negated entry delivers immediately)
    assert kept(["-edge"]) == ["<null>", "<null>", "core", "edgy"]
    # positive before negated: 'core' delivers, then '-edge' decides
    # the rest (edge rows drop, remainder delivers)
    assert kept(["core", "-edge"]) == [
        "<null>", "<null>", "core", "core,edge", "edgy",
    ]
    # exact token match, not substring: 'edgy' != 'edge'
    assert kept(["edgy"]) == ["edgy"]
    # empty filter = routing disabled
    assert kept([]) == sorted(
        r["label"] or "<null>" for r in df.collect()
    )
