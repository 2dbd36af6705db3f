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


# ---------------------------------------------------------------------------
# IPv6 (reference src/ip_frag.c:302-315, RFC 8200 §4.5)
# ---------------------------------------------------------------------------

from pmacct_spark.operators.ipfrag import ip6_defrag, ip6_parse_fragments


def _v6_packet(src, dst, ident, proto, off, mf, chunk, exts=()):
    """Build an RFC 8200 packet: fixed header + optional walkable
    extension headers + Fragment header + chunk. ``exts`` is a list of
    extension type codes drawn from (0, 43, 60), chained in order."""
    chain = list(exts) + [44]
    first_nh = chain[0]
    body = b""
    for i, t in enumerate(chain[:-1]):
        nxt = chain[i + 1]
        body += bytes([nxt, 0]) + b"\x00" * 6  # len=0 -> 8 bytes
    fo_field = (off & ~7) | (1 if mf else 0)
    body += bytes([proto, 0]) + fo_field.to_bytes(2, "big") + ident.to_bytes(4, "big")
    payload = body + chunk
    hdr = (
        b"\x60\x00\x00\x00"
        + len(payload).to_bytes(2, "big")
        + bytes([first_nh, 64])
        + src
        + dst
    )
    return hdr + payload


def _v6_rows(spark, pkts):
    return spark.createDataFrame([(bytearray(p),) for p in pkts], "pkt binary")


def test_ip6_ext_chain_walk_and_parse(spark):
    """The parser walks hop-by-hop -> routing -> dest-options to the
    Fragment header and decodes offset (8-octet units), M bit, ident,
    and the first fragment's next-header protocol."""
    src, dst = b"\x20\x01" + b"\x00" * 14, b"\x20\x02" + b"\x00" * 14
    pkts = [
        _v6_packet(src, dst, 7, 17, 0, True, b"A" * 16, exts=(0, 43, 60)),
        _v6_packet(src, dst, 7, 17, 16, False, b"B" * 4, exts=(0, 43, 60)),
        # a non-fragment packet must be dropped by the parser
        b"\x60\x00\x00\x00\x00\x04\x06\x40" + src + dst + b"data",
    ]
    rows = ip6_parse_fragments(_v6_rows(spark, pkts)).collect()
    assert len(rows) == 2
    by_off = {r["frag_offset"]: r for r in rows}
    assert by_off[0]["more_frags"] and not by_off[16]["more_frags"]
    assert all(r["ip6_id"] == 7 and r["ip_proto"] == 17 for r in rows)
    assert bytes(by_off[0]["payload"]) == b"A" * 16
    asm = ip6_defrag(ip6_parse_fragments(_v6_rows(spark, pkts))).collect()
    assert len(asm) == 1
    assert bytes(asm[0]["payload"]) == b"A" * 16 + b"B" * 4
    assert asm[0]["ip_proto"] == 17 and asm[0]["total_len"] == 20


def test_ip6_incomplete_chain_dropped(spark):
    """A chain missing its tail (no M=0 fragment) reassembles to
    nothing, like the reference's timeout discard."""
    src, dst = b"\x20\x01" + b"\x00" * 14, b"\x20\x02" + b"\x00" * 14
    pkts = [_v6_packet(src, dst, 9, 6, 0, True, b"A" * 8)]
    assert ip6_defrag(ip6_parse_fragments(_v6_rows(spark, pkts))).count() == 0


def test_ip6_parse_stays_jvm_side(spark):
    """Extension-chain walk + reassembly contain no Python stage."""
    src, dst = b"\x20\x01" + b"\x00" * 14, b"\x20\x02" + b"\x00" * 14
    df = ip6_defrag(
        ip6_parse_fragments(
            _v6_rows(spark, [_v6_packet(src, dst, 1, 6, 0, False, b"x" * 8)])
        )
    )
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "EvalPython" not in plan and "InPandas" not in plan


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.binary(min_size=8, max_size=64).map(
            lambda b: b[: (len(b) // 8) * 8]  # non-final frags: 8-octet multiple
        ),
        min_size=1,
        max_size=6,
    ),
    st.binary(min_size=0, max_size=37),  # final fragment: any length
    st.randoms(),
)
def test_ip6_roundtrip_property(spark, chunks, tail, rng):
    """split (8-octet-aligned) -> shuffle -> parse -> reassemble
    round-trips any payload, exts varying per fragment."""
    src, dst = b"\xfd\x00" + b"\x00" * 14, b"\xfd\x01" + b"\x00" * 14
    all_chunks = [c for c in chunks if c] + [tail]
    pkts, off = [], 0
    ext_choices = [(), (0,), (0, 60), (43,)]
    for i, c in enumerate(all_chunks):
        mf = i < len(all_chunks) - 1
        pkts.append(
            _v6_packet(src, dst, 3, 6, off, mf, c, exts=ext_choices[i % 4])
        )
        off += len(c)
    rng.shuffle(pkts)
    got = ip6_defrag(ip6_parse_fragments(_v6_rows(spark, pkts))).collect()
    assert len(got) == 1
    assert bytes(got[0]["payload"]) == b"".join(all_chunks)


# ---------------------------------------------------------------------------
# IPv4 wire parse (src/nl.c ip_handler dissection feeding ip_frag.c)
# ---------------------------------------------------------------------------

from pmacct_spark.operators.ipfrag import ip4_parse_fragments


def _v4_packet(ident, proto, off, mf, chunk, src=0x0A000001,
               dst=0x0A000002, opts=b""):
    import struct as _s

    ihl = 5 + len(opts) // 4
    fo = (0x2000 if mf else 0) | (off // 8)
    hdr = _s.pack(
        "!BBHHHBBHII", (4 << 4) | ihl, 0, ihl * 4 + len(chunk),
        ident, fo, 64, proto, 0, src, dst,
    )
    return hdr + opts + chunk


def test_ip4_wire_parse_and_reassemble(spark):
    pkts = [
        _v4_packet(7, 17, 0, True, b"A" * 16),
        _v4_packet(7, 17, 16, False, b"B" * 4),
        # IHL > 5 (4 bytes of options) must still find the payload
        _v4_packet(9, 6, 0, False, b"solo", opts=b"\x01\x01\x01\x01"),
    ]
    df = spark.createDataFrame([(bytearray(p),) for p in pkts], "pkt binary")
    rows = {
        (r["ip_id"], r["frag_offset"]): r
        for r in ip4_parse_fragments(df).collect()
    }
    assert rows[(7, 0)]["more_frags"] and not rows[(7, 16)]["more_frags"]
    assert bytes(rows[(9, 0)]["payload"]) == b"solo"
    asm = {
        r["ip_id"]: (bytes(r["payload"]), r["n_frags"])
        for r in ip_defrag(ip4_parse_fragments(df)).collect()
    }
    assert asm == {7: (b"A" * 16 + b"B" * 4, 2), 9: (b"solo", 1)}


def test_ip4_wire_parse_stays_jvm_side(spark):
    df = spark.createDataFrame(
        [(bytearray(_v4_packet(1, 6, 0, False, b"x")),)], "pkt binary"
    )
    out = ip_defrag(ip4_parse_fragments(df))
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "EvalPython" not in plan and "InPandas" not in plan
