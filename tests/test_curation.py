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
