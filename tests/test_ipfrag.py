"""IPv4 fragment reassembly (reference src/ip_frag.c): complete chains
reassemble byte-exact regardless of arrival order; gaps, missing
tails, duplicates, and trailing data after the final fragment are
dropped like the reference's timeout discard. Plus a hypothesis
round-trip against a Python splitter.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pmacct_spark.operators.ipfrag import ip_defrag

KEYS = ("ip_src_i", "ip_dst_i", "ip_id", "ip_proto")
DDL = (
    "ip_src_i long, ip_dst_i long, ip_id int, ip_proto int, "
    "frag_offset long, more_frags boolean, payload binary"
)


def _rows(key, chunks, drop=(), dup=None, tail_mf=False):
    """Fragment rows for payload ``chunks`` under ``key``; optionally
    drop indices, duplicate one, or mark the tail as non-final."""
    out, off = [], 0
    n = len(chunks)
    for i, c in enumerate(chunks):
        mf = (i < n - 1) or tail_mf
        if i not in drop:
            out.append((*key, off, mf, bytearray(c)))
        if dup == i:
            out.append((*key, off, mf, bytearray(c)))
        off += len(c)
    return out


def test_reassembly_order_independent(spark):
    k1 = (1, 2, 100, 6)
    k2 = (1, 2, 101, 6)  # same endpoints, different ip_id: separate
    rows = _rows(k1, [b"AAAA", b"BB", b"CCCCCC"]) + _rows(k2, [b"xy", b"z"])
    import random

    random.Random(7).shuffle(rows)
    got = {
        tuple(r[k] for k in KEYS): (bytes(r["payload"]), r["total_len"], r["n_frags"])
        for r in ip_defrag(spark.createDataFrame(rows, DDL)).collect()
    }
    assert got == {
        k1: (b"AAAABBCCCCCC", 12, 3),
        k2: (b"xyz", 3, 2),
    }


def test_incomplete_and_malformed_chains_dropped(spark):
    good = _rows((9, 9, 1, 17), [b"ok", b"!"])
    gap = _rows((1, 1, 2, 6), [b"AA", b"BB", b"CC"], drop={1})     # hole
    no_tail = _rows((1, 1, 3, 6), [b"AA", b"BB"], tail_mf=True)     # no mf=0
    dup = _rows((1, 1, 4, 6), [b"AA", b"BB"], dup=0)                # overlap
    df = spark.createDataFrame(good + gap + no_tail + dup, DDL)
    got = ip_defrag(df).collect()
    assert len(got) == 1
    assert bytes(got[0]["payload"]) == b"ok!"


def test_single_fragment_datagram(spark):
    """An unfragmented datagram (offset 0, mf=false) passes through."""
    df = spark.createDataFrame(_rows((5, 6, 7, 6), [b"whole"]), DDL)
    got = ip_defrag(df).collect()
    assert len(got) == 1 and bytes(got[0]["payload"]) == b"whole"


def test_defrag_stays_jvm_side(spark):
    """The reassembly plan contains no Python stage."""
    df = spark.createDataFrame(_rows((5, 6, 7, 6), [b"a", b"b"]), DDL)
    plan = ip_defrag(df)._sc._jvm.PythonSQLUtils.explainString(
        ip_defrag(df)._jdf.queryExecution(), "formatted"
    )
    assert "EvalPython" not in plan and "InPandas" not in plan


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.binary(min_size=1, max_size=64), min_size=1, max_size=8
    ),
    st.randoms(),
)
def test_defrag_roundtrip_property(spark, chunks, rng):
    """split -> shuffle -> reassemble round-trips any payload."""
    rows = _rows((3, 4, 5, 6), chunks)
    rng.shuffle(rows)
    got = ip_defrag(spark.createDataFrame(rows, DDL)).collect()
    assert len(got) == 1
    assert bytes(got[0]["payload"]) == b"".join(chunks)
