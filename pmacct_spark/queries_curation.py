"""Gated queries: corpus-curation operators (operators/curation.py) —
test-set decontamination, deterministic quota sampling, quality-rule
gating, and near-dup cluster assignment by connected components.

These complete the training-data pipeline tier: dedup/similarity find
the duplicates, these decide what the corpus keeps.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pmacct_spark.driver_queries import register
from pmacct_spark.operators import curation, dedup, text
from pmacct_spark.operators.curation import sample_rank_sql
from pmacct_spark.sources.tables import load_table

# Decontamination shingle width: 5-token shingles (wider than the
# dedup n=3 — decontamination wants high-precision matches).
_DECON_N = 5

# Benchmark slice: sources src0/src1 play the held-out eval set.
_BENCH_SOURCES = ("src0", "src1")
_BENCH_SQL = ", ".join(f"'{s}'" for s in _BENCH_SOURCES)


@register(
    "decontaminate_benchmark_overlap",
    f"""
WITH sets AS (
  SELECT doc_id, source, {dedup.shingle_hashes_duck('text', _DECON_N)} AS hvs
  FROM documents
),
bench AS (
  SELECT DISTINCT unnest(hvs) AS hv FROM sets WHERE source IN ({_BENCH_SQL})
),
corp AS (
  SELECT doc_id, len(hvs) AS n_shingles, unnest(hvs) AS hv
  FROM sets WHERE source NOT IN ({_BENCH_SQL})
)
SELECT c.doc_id, c.n_shingles, COUNT(*) AS n_contaminated,
       CAST(COUNT(*) * 1000 // c.n_shingles AS BIGINT) AS contam_pm
FROM corp c JOIN bench b USING (hv)
GROUP BY 1, 2""",
)
def decontaminate_benchmark_overlap(spark, sf_dir):
    """Test-set decontamination: flag corpus docs sharing 5-token
    shingles with the benchmark slice. Benchmark hash set broadcasts;
    the corpus side never shuffles (explode -> broadcast join ->
    re-collapse with partial aggregation)."""
    docs = load_table(spark, sf_dir, "documents")
    # Materialize the hash sets before the explode/join stages: without
    # the persist barrier, InferFiltersFromGenerate pushes a
    # size(hvs)>0 predicate whose inlined expression re-evaluates the
    # whole token-state fold per element_at reference (measured 240s ->
    # 1s at sf0.1). Same pattern as dedup.minhash_dedup_pairs.
    sets = dedup.shingle_hash_sets(
        docs, "doc_id", "text", n=_DECON_N, extra_cols=("source",)
    ).persist()
    bench = sets.filter(F.col("source").isin(*_BENCH_SOURCES))
    corpus = sets.filter(~F.col("source").isin(*_BENCH_SOURCES))
    return curation.decontaminate(corpus, bench)


_QUOTA_K = 10


@register(
    "quota_sample_per_source",
    f"""
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY {sample_rank_sql('doc_id')}, doc_id) AS rn
  FROM documents
) t WHERE rn <= {_QUOTA_K}""",
)
def quota_sample_per_source(spark, sf_dir):
    """Per-domain mixing quota: keep at most K docs per source, chosen
    by deterministic LCG hash rank — rerun-stable, oracle-replayable,
    and one shuffle on the group key (running top-k per group)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return curation.quota_sample(docs, "source", "doc_id", _QUOTA_K)


# Gopher-ish quality gate thresholds (integer per-mille features from
# operators/text.py): token count window, mean token length window,
# stopword floor, vocabulary-diversity floor.
_Q_RULES = (
    ("n_tokens BETWEEN 30 AND 50000", 1),
    ("mean_tok_len_pm BETWEEN 3000 AND 10000", 2),
    ("stop_pm >= 20", 4),
    ("uniq_pm >= 200", 8),
)
_FAIL_SQL = " + ".join(
    f"(CASE WHEN NOT ({cond}) THEN {bit} ELSE 0 END)" for cond, bit in _Q_RULES
)


@register(
    "quality_rules_filter",
    f"""
SELECT doc_id, CAST({_FAIL_SQL} AS BIGINT) AS rules_failed,
       CAST(CASE WHEN {_FAIL_SQL} = 0 THEN 1 ELSE 0 END AS BIGINT) AS keep_flag
FROM ({text.quality_features_duck('text')}) q""",
)
def quality_rules_filter(spark, sf_dir):
    """Composite quality gate: each doc gets a failed-rules bitmap and
    a keep flag. Pure per-row integer expressions (JVM codegen, no
    shuffle) — the gate composes with any downstream filter."""
    docs = load_table(spark, sf_dir, "documents")
    q = text.quality_features(docs, "text")
    return q.select(
        "doc_id",
        F.expr(f"CAST({_FAIL_SQL} AS BIGINT)").alias("rules_failed"),
        F.expr(
            f"CAST(CASE WHEN {_FAIL_SQL} = 0 THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("keep_flag"),
    )


@register(
    "dedup_cc_clusters",
    curation.cc_duck(dedup.minhash_dedup_duck()),
)
def dedup_cc_clusters(spark, sf_dir):
    """Near-dup cluster assignment: MinHash-LSH pairs -> connected
    components (iterative min-label propagation) -> (node, cluster_id)
    with cluster_id = min doc id of the component. The oracle replays
    the closure with a recursive CTE."""
    docs = load_table(spark, sf_dir, "documents")
    edges = dedup.minhash_dedup_pairs(docs, "doc_id", "text")
    return curation.connected_components(edges)
