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
