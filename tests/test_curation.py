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
