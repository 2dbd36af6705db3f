"""Unit tests for operators/curation.py: connected components
(transitive propagation, not just 1-hop), quota-sampling determinism
and cap, decontamination semantics, and the broadcast plan gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from pmacct_spark.operators import curation, dedup


def test_connected_components_transitive(spark):
    # chain 1-2-3-4 (diameter 3: needs multiple propagation rounds),
    # separate pair 10-11, triangle 20-21-22
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "doc_a long, doc_b long",
    )
    got = {
        (r.node, r.cluster_id)
        for r in curation.connected_components(edges).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }


def test_connected_components_direction_agnostic(spark):
    # edges given "backwards" (a > b) must produce the same clusters
    edges = spark.createDataFrame(
        [(4, 3), (3, 2), (2, 1)], "doc_a long, doc_b long"
    )
    got = {
        (r.node, r.cluster_id)
        for r in curation.connected_components(edges).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1)}


def test_quota_sample_cap_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, f"g{i % 3}") for i in range(100)], "doc_id long, source string"
    )
    a = curation.quota_sample(df, "source", "doc_id", 5)
    rows_a = sorted((r.source, r.doc_id) for r in a.collect())
    counts = {}
    for src, _ in rows_a:
        counts[src] = counts.get(src, 0) + 1
    assert all(v == 5 for v in counts.values())
    # rerun → identical selection (hash rank, not random)
    b = curation.quota_sample(df, "source", "doc_id", 5)
    assert rows_a == sorted((r.source, r.doc_id) for r in b.collect())


def test_quota_sample_small_groups_kept_whole(spark):
    df = spark.createDataFrame(
        [(1, "only"), (2, "only")], "doc_id long, source string"
    )
    assert curation.quota_sample(df, "source", "doc_id", 10).count() == 2


def test_decontaminate_full_and_partial(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),      # benchmark
            (2, "alpha beta gamma delta"),      # fully contained copy
            (3, "zeta eta theta iota"),         # disjoint -> absent
            (4, "alpha beta gamma epsilon"),    # shares 1 of 2 shingles
        ],
        "doc_id long, text string",
    )
    sets = dedup.shingle_hash_sets(docs, "doc_id", "text", n=3)
    bench = sets.filter(F.col("doc_id") == 1)
    corpus = sets.filter(F.col("doc_id") != 1)
    got = {
        r.doc_id: (r.n_shingles, r.n_contaminated, r.contam_pm)
        for r in curation.decontaminate(corpus, bench).collect()
    }
    assert got == {2: (2, 2, 1000), 4: (2, 1, 500)}


def test_arrow_fold_matches_sql_fold(spark):
    """The Arrow/numpy polyhash kernel is bit-identical to the SQL
    expression chain it replaced (_token_states_spark +
    _shingle_hash_from_states / _window_hashes_from_states), including
    the probed Spark edge semantics: leading/trailing empty tokens from
    \\s+ split, the empty-token (h=0, p=131) state, mixed case, tabs
    and newlines as Java \\s whitespace."""
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again"),
            (2, " leading space pad pad"),
            (3, "trailing space pad pad "),
            (4, "a  b   c d e"),
            (5, "MiXeD CaSe TEXT here ok yes"),
            (6, "tab\tsep\ttokens and\nnewline here"),
            (7, "x y"),  # fewer tokens than any window
        ],
        "doc_id long, text string",
    )
    for n in (2, 3):
        sql = docs.filter("doc_id <> 7").withColumn(
            "_ts", F.expr(dedup._token_states_spark("text"))
        ).select(
            "doc_id",
            F.expr(dedup._shingle_hash_from_states("_ts", n)).alias("hvs"),
        )
        want = {r.doc_id: r.hvs for r in sql.collect()}
        got = {
            r.doc_id: r.hvs
            for r in dedup._shingle_sets_arrow(
                docs.filter("doc_id <> 7"), "doc_id", "text", n
            ).collect()
        }
        assert got == want, (n, got, want)
    for w in (3, 5):
        sql = docs.withColumn(
            "_ts", F.expr(dedup._token_states_spark("text"))
        ).select(
            "doc_id",
            F.posexplode(
                F.expr(dedup._window_hashes_from_states("_ts", w))
            ).alias("p0", "hv"),
        ).select("doc_id", F.expr("p0 + 1").alias("p"), "hv")
        want = {(r.doc_id, r.p, r.hv) for r in sql.collect()}
        got = {
            (r.doc_id, r.p, r.hv)
            for r in dedup._window_rows_arrow(
                docs, "doc_id", "text", w
            ).collect()
        }
        assert got == want, (w, len(got), len(want))


def test_decontaminate_plan_broadcasts_benchmark(spark):
    docs = spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2} w{i+3}") for i in range(20)],
        "doc_id long, text string",
    )
    sets = dedup.shingle_hash_sets(docs, "doc_id", "text", n=3)
    plan = curation.decontaminate(
        sets.filter("doc_id >= 5"), sets.filter("doc_id < 5")
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


def test_bpe_train_merges_matches_reference_loop(spark):
    """The Spark BPE trainer reproduces a straight-Python Sennrich
    loop: count-weighted pair stats, lexicographic tiebreak, and
    left-to-right NON-OVERLAPPING merges ('aaa' -> ['aa','a'], never
    ['aa','aa'] from shared boundaries)."""
    from collections import Counter

    from pmacct_spark.operators.text import bpe_train_merges

    texts = [
        "aaa banana aaa",
        "banana bandana",
        "aaa aaa naan",
    ]

    def ref_merges(texts, n):
        import re

        vocab = Counter()
        for t in texts:
            for w in re.split("[^a-z]+", t.lower()):
                if w:
                    vocab[w] += 1
        seqs = {w: list(w) for w in vocab}
        out = []
        for rank in range(1, n + 1):
            pc = Counter()
            for w, toks in seqs.items():
                for a, b in zip(toks, toks[1:]):
                    pc[(a, b)] += vocab[w]
            if not pc:
                break
            (l, r), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
            out.append((rank, l, r, l + r, c))
            for w, toks in seqs.items():
                merged, i = [], 0
                while i < len(toks):
                    if i + 1 < len(toks) and toks[i] == l and toks[i + 1] == r:
                        merged.append(l + r)
                        i += 2
                    else:
                        merged.append(toks[i])
                        i += 1
                seqs[w] = merged
        return out

    docs = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                 "doc_id long, text string")
    got = [
        (r["merge_rank"], r["lhs"], r["rhs"], r["merged"], r["pair_count"])
        for r in bpe_train_merges(docs, n_merges=4)
        .orderBy("merge_rank").collect()
    ]
    assert got == ref_merges(texts, 4)
