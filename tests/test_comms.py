"""Community pattern filter semantics (evaluate_comm_patterns
src/bgp/bgp_util.c:1014) — hand-computed goldens on both engines."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from pmacct_spark.operators.comms import (
    comm_pattern_duck,
    comm_pattern_sql,
    comm_to_asn_cols,
    comm_to_asn_duck,
    split_patterns,
)

SRC = "64496:64 64496:641 65100:95 65100:950"

CASES = [
    # substring match repeats across tokens (find_again loop)
    (["64496:64"], "64496:64 64496:641"),
    # dot pattern: FIRST prefix occurrence (65100:95) fails the
    # length test -> the pattern aborts; 65100:950 is NOT emitted
    # even though it would pass (bgp_util.c:1041 ptr=NULL, no retry)
    (["65100:9.."], ""),
    # multiple patterns emit in pattern order
    (["64496:64", "65100:950"], "64496:64 64496:641 65100:950"),
    # a mid-token match emits the token SUFFIX from the match start
    (["496:64"], "496:64 496:641"),
    # no match at all
    (["99999:"], ""),
]


@pytest.mark.parametrize("pats,want", CASES)
def test_comm_pattern_spark(spark, pats, want):
    df = spark.createDataFrame([(SRC,)], "c string")
    got = df.select(
        F.expr(comm_pattern_sql("c", pats)).alias("o")
    ).collect()[0].o
    assert got == want


@pytest.mark.parametrize("pats,want", CASES)
def test_comm_pattern_duckdb(pats, want):
    expr = comm_pattern_duck(f"'{SRC}'", pats)
    assert duckdb.connect().execute(f"SELECT {expr}").fetchone()[0] == want


def test_comm_pattern_dot_pass_both_engines(spark):
    src = "64496:641 65100:950"
    want = "65100:950"
    df = spark.createDataFrame([(src,)], "c string")
    got = df.select(
        F.expr(comm_pattern_sql("c", ["65100:9.."])).alias("o")
    ).collect()[0].o
    assert got == want
    expr = comm_pattern_duck(f"'{src}'", ["65100:9.."])
    assert duckdb.connect().execute(f"SELECT {expr}").fetchone()[0] == want


def test_comm_to_asn_first_match_split(spark):
    """copy_stdcomm_to_asn (bgp_util.c:1156): first filtered community
    splits at ':' -> (peer, origin); a large community's third field
    is ignored (:1174)."""
    df = spark.createDataFrame(
        [("64999:7 65020:12:3 65020:44:5",)], "c string"
    )
    p, o = comm_to_asn_cols(comm_pattern_sql("c", ["65020:"]))
    r = df.select(p.alias("p"), o.alias("o")).collect()[0]
    assert (r.p, r.o) == (65020, 12)
    dp, do = comm_to_asn_duck(
        comm_pattern_duck("'64999:7 65020:12:3'", ["65020:"])
    )
    assert duckdb.connect().execute(
        f"SELECT {dp}, {do}"
    ).fetchone() == (65020, 12)
    # no match -> 0 (the untouched as_t)
    p0, o0 = comm_to_asn_cols(comm_pattern_sql("c", ["77777:"]))
    r = df.select(p0.alias("p"), o0.alias("o")).collect()[0]
    assert (r.p, r.o) == (0, 0)


def test_split_patterns():
    assert split_patterns(" 64496:64, 65100:9.. ") == [
        "64496:64", "65100:9..",
    ]


def test_first_last_asn_semantics(spark):
    """evaluate_first_asn / evaluate_last_asn (src/bgp/bgp_util.c:1080)
    replayed over every segment-rendering shape, including the
    bgp_peer_as_skip_subas walk — and its reference quirk: inside a
    multi-AS confed segment the second sub-AS token (no leading paren)
    terminates the walk."""
    from pmacct_spark.operators.comms import first_asn_sql, last_asn_sql

    rows = [
        # (path, first, first_skip_subas, last)
        ("174 3356 65010", 174, 174, 65010),
        ("(65001 65002) 174", 65001, 65002, 174),  # the C quirk
        ("(65001) 174", 65001, 174, 174),
        ("(65001 65002)", 65001, 65002, 65002),
        ("(65001)", 65001, 65001, 65001),  # all-confed: first sub-AS
        ("{64512,64513} 174", 0, 0, 174),  # AS_SET first: strtoul -> 0
        ("174 {64512,64513}", 174, 174, 64513),  # last_as spans sets
        ("", 0, 0, 0),
    ]
    df = spark.createDataFrame([(p,) for p, *_ in rows], "p string")
    got = {
        r["p"]: (r["f"], r["fs"], r["l"])
        for r in df.selectExpr(
            "p",
            first_asn_sql("p") + " AS f",
            first_asn_sql("p", skip_subas=True) + " AS fs",
            last_asn_sql("p") + " AS l",
        ).collect()
    }
    for p, f, fs, last in rows:
        assert got[p] == (f, fs, last), p


def test_aspath_segment_rendering_from_wire():
    """AS_PATH segment delimiters (aspath_delimiter_char,
    src/bgp/bgp_aspath.c:324): AS_SET {a,b}, AS_CONFED_SEQUENCE (a b),
    AS_CONFED_SET [a,b], AS_SEQUENCE plain — decoded from real
    UPDATE attribute bytes."""
    from pmacct_spark.streaming.bmp import _parse_attrs

    def seg(stype, asns):
        out = bytes([stype, len(asns)])
        for a in asns:
            out += a.to_bytes(4, "big")
        return out

    val = (
        seg(3, [65001, 65002])  # AS_CONFED_SEQUENCE
        + seg(2, [174, 3356])   # AS_SEQUENCE
        + seg(1, [64512, 64513])  # AS_SET
        + seg(4, [64999])       # AS_CONFED_SET
    )
    attr = bytes([0x40, 2, len(val)]) + val  # well-known, AS_PATH
    attrs = _parse_attrs(attr)
    assert attrs["as_path"] == (
        "(65001 65002) 174 3356 {64512,64513} [64999]"
    )
