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
    # The historical barrier here guarded the EXPRESSION hash sets
    # against InferFiltersFromGenerate inlining the token-state fold
    # per element_at reference (measured 240s -> 1s at sf0.1). The
    # Arrow kernel's hvs is an opaque Python node Catalyst cannot
    # inline into, so the barrier is now only the multi-consumer
    # rescan guard — scale-adaptive (stage_if_heavy).
    from pmacct_spark.operators.staging import stage_if_heavy

    sets = stage_if_heavy(dedup.shingle_hash_sets(
        docs, "doc_id", "text", n=_DECON_N, extra_cols=("source",)
    ), docs)
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


@register(
    "train_val_test_split",
    f"""
SELECT split, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars
FROM (
  SELECT CASE
    WHEN {sample_rank_sql('doc_id')} % 100 < 80 THEN 'train'
    WHEN {sample_rank_sql('doc_id')} % 100 < 90 THEN 'val'
    ELSE 'test' END AS split, n_chars
  FROM documents
) GROUP BY 1""",
)
def train_val_test_split(spark, sf_dir):
    """Deterministic 80/10/10 corpus split on the LCG hash of doc_id —
    rerun-stable, leakage-free (a doc's split never depends on the rest
    of the corpus), pure map-side until the audit aggregation."""
    docs = load_table(spark, sf_dir, "documents")
    r = sample_rank_sql("doc_id")
    return (
        docs.withColumn(
            "split",
            F.expr(
                f"CASE WHEN {r} % 100 < 80 THEN 'train' "
                f"WHEN {r} % 100 < 90 THEN 'val' ELSE 'test' END"
            ),
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("n_chars"),
        )
    )


_PACK_BUDGET = 2048  # token budget per packed training sequence


@register(
    "pack_token_batches",
    f"""
WITH t AS (
  SELECT doc_id, source,
         len(string_split_regex(lower(text), '\\s+')) AS n_tokens
  FROM documents
),
c AS (
  SELECT *, SUM(n_tokens) OVER (
    PARTITION BY source ORDER BY doc_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM t
)
SELECT source, CAST((cum - n_tokens) // {_PACK_BUDGET} AS BIGINT) AS bin_id,
       COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
FROM c GROUP BY 1, 2""",
)
def pack_token_batches(spark, sf_dir):
    """Sequence packing for training batches: contiguous-fill documents
    into ~budget-token bins per source (bin = prefix-sum DIV budget —
    deterministic, order-defined, one window shuffle on the pack key).
    At 100 TB the pack key is the output shard: each bin maps to one
    training sequence file."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", "source",
        F.expr("size(split(lower(text), '\\\\s+'))").alias("n_tokens"),
    )
    c = t.withColumn(
        "cum",
        F.expr(
            "SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        ),
    )
    return (
        c.withColumn(
            "bin_id", F.expr(f"(cum - n_tokens) DIV {_PACK_BUDGET}")
        )
        .groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
    )


@register(
    "corpus_curation_pipeline",
    f"""
WITH q AS (
  SELECT doc_id, source, n_chars, text,
         CAST({_FAIL_SQL} AS BIGINT) AS rules_failed
  FROM ({text.quality_features_duck('text')}) t
),
keep_q AS (
  SELECT doc_id, source, n_chars, text FROM q
  WHERE rules_failed = 0 AND source NOT IN ({_BENCH_SQL})
),
sets AS (
  SELECT doc_id, {dedup.shingle_hashes_duck('text', _DECON_N)} AS hvs
  FROM documents WHERE source IN ({_BENCH_SQL})
),
bench AS (SELECT DISTINCT unnest(hvs) AS hv FROM sets),
corp_sets AS (
  SELECT doc_id, {dedup.shingle_hashes_duck('text', _DECON_N)} AS hvs
  FROM keep_q
),
contam AS (
  SELECT c.doc_id
  FROM (SELECT doc_id, len(hvs) AS n_shingles, unnest(hvs) AS hv
        FROM corp_sets) c
  JOIN bench b USING (hv)
  GROUP BY c.doc_id, c.n_shingles
  HAVING COUNT(*) * 1000 // c.n_shingles >= 500
),
clean AS (
  SELECT * FROM keep_q WHERE doc_id NOT IN (SELECT doc_id FROM contam)
),
survivors AS (
  SELECT md5(text) AS digest, MIN(doc_id) AS doc_id FROM clean GROUP BY 1
)
SELECT k.source, COUNT(*) AS n_kept,
       CAST(SUM(k.n_chars) AS BIGINT) AS total_chars
FROM survivors s JOIN clean k ON k.doc_id = s.doc_id
GROUP BY 1""",
)
def corpus_curation_pipeline(spark, sf_dir):
    """The full pretraining-corpus curation pipeline as ONE DataFrame
    DAG: quality gate -> benchmark decontamination (>=50% shingle
    overlap drops the doc) -> exact dedup (min-id survivor) ->
    per-source audit. Every stage reuses the gated operators; Catalyst
    sees the whole plan, so the corpus is scanned once, the only
    shuffles are the dedup digest groupBy and the final audit, and the
    benchmark hash set broadcasts."""
    docs = load_table(spark, sf_dir, "documents")
    q = text.quality_features(docs, "text")
    # materialize both hash-set sides and the gated corpus before the
    # explode/join stages (the InferFiltersFromGenerate inlining trap —
    # see decontaminate_benchmark_overlap)
    from pmacct_spark.operators.staging import stage

    keep_q = stage(q.filter(
        F.expr(f"({_FAIL_SQL}) = 0")
        & ~F.col("source").isin(*_BENCH_SOURCES)
    ).select("doc_id", "source", "n_chars", "text"))
    from pmacct_spark.operators.staging import stage_if_heavy

    bench_sets = stage_if_heavy(dedup.shingle_hash_sets(
        docs.filter(F.col("source").isin(*_BENCH_SOURCES)),
        "doc_id", "text", n=_DECON_N,
    ), docs)
    corp_sets = stage_if_heavy(dedup.shingle_hash_sets(
        keep_q, "doc_id", "text", n=_DECON_N
    ), keep_q)
    contam = curation.decontaminate(corp_sets, bench_sets).filter(
        F.col("contam_pm") >= 500
    ).select("doc_id")
    clean = keep_q.join(contam, "doc_id", "left_anti")
    survivors = (
        clean.groupBy(F.md5("text").alias("digest"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    return (
        clean.join(survivors, "doc_id", "left_semi")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@register(
    "pii_redaction",
    f"""
WITH red AS (
  SELECT source, text, {text.redact_pii_duck('text')} AS redacted
  FROM documents
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(length(text) - length(redacted)) AS BIGINT) AS delta_chars,
       CAST(SUM(CASE WHEN redacted <> text THEN 1 ELSE 0 END) AS BIGINT)
         AS n_redacted
FROM red GROUP BY 1""",
)
def pii_redaction(spark, sf_dir):
    """PII-style scrubbing (emails, IPv4 literals, long digit runs ->
    typed placeholders) as pure JVM regexp_replace — per-row, zero
    shuffle before the audit aggregation; the oracle runs the identical
    regexes with DuckDB's global flag."""
    docs = load_table(spark, sf_dir, "documents")
    red = text.redact_pii(docs, "text", "redacted")
    return red.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text") - F.length("redacted"))
        .cast("bigint")
        .alias("delta_chars"),
        F.sum(
            F.when(F.col("redacted") != F.col("text"), 1).otherwise(0)
        ).cast("bigint").alias("n_redacted"),
    )


@register(
    "dedup_survivor_selection",
    f"""
WITH cc AS ({curation.cc_duck(dedup.minhash_dedup_duck())}),
j AS (
  SELECT c.cluster_id, c.node, d.n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY c.cluster_id
           ORDER BY d.n_chars DESC, c.node ASC) AS rn
  FROM cc c JOIN documents d ON d.doc_id = c.node
)
SELECT cluster_id,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(MAX(CASE WHEN rn = 1 THEN node END) AS BIGINT) AS survivor_id,
       CAST(MAX(n_chars) AS BIGINT) AS survivor_chars
FROM j GROUP BY 1""",
)
def dedup_survivor_selection(spark, sf_dir):
    """The step after cluster assignment in a real dedup pipeline:
    keep ONE survivor per near-dup cluster, chosen by quality (here:
    longest document, doc_id as deterministic tiebreak — smaller id
    wins among equals). Composition of minhash pairs -> connected
    components -> per-cluster max_by; the per-cluster choice is one
    partial-aggregated shuffle on cluster_id."""
    docs = load_table(spark, sf_dir, "documents")
    edges = dedup.minhash_dedup_pairs(docs, "doc_id", "text")
    clusters = curation.connected_components(edges)
    joined = clusters.join(
        docs.select(F.col("doc_id").alias("node"), "n_chars"), "node"
    )
    return joined.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.expr("max_by(node, struct(n_chars, -node))")
        .cast("bigint")
        .alias("survivor_id"),
        F.max("n_chars").cast("bigint").alias("survivor_chars"),
    )


# --- temperature-2 source mixing (count^(1/2) reweighting): the
#     standard training-mix operator — upsample small sources, damp
#     huge ones. Quotas are floor(sqrt(n))*4 (IEEE sqrt is correctly
#     rounded, so cross-engine exact with no float SUM anywhere);
#     membership via the deterministic LCG rank.
@register(
    "temperature_mix_sampling",
    f"""
WITH q AS (
  SELECT source,
         GREATEST(1, CAST(FLOOR(SQRT(COUNT(*)) * 4) AS BIGINT)) AS quota
  FROM documents GROUP BY 1
),
ranked AS (
  SELECT d.doc_id, d.source, q.quota,
         row_number() OVER (
           PARTITION BY d.source
           ORDER BY {sample_rank_sql('d.doc_id')}, d.doc_id) AS rn
  FROM documents d JOIN q USING (source)
)
SELECT source, COUNT(*) AS sampled,
       CAST(SUM(doc_id) AS BIGINT) AS id_sum
FROM ranked WHERE rn <= quota GROUP BY 1""",
)
def temperature_mix_sampling(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    mixed = curation.temperature_mix(docs, "source", "doc_id", scale=4)
    return mixed.groupBy("source").agg(
        F.count(F.lit(1)).alias("sampled"),
        F.sum("doc_id").cast("bigint").alias("id_sum"),
    )


# --- cross-corpus near-dedup: flag NEW docs (even ids, the incoming
#     crawl) near-duplicating any REFERENCE doc (odd ids, the
#     existing training set). new x ref band join only — no ref x ref
#     work, both sides shuffle-joinable at billions of docs.
@register(
    "dedup_cross_corpus",
    dedup.minhash_cross_duck("doc_id % 2 = 0", "doc_id % 2 = 1"),
)
def dedup_cross_corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return dedup.minhash_cross_pairs(
        docs.filter("doc_id % 2 = 0"),
        docs.filter("doc_id % 2 = 1"),
        "doc_id",
        "text",
    )


# --- DSIR importance resampling (Xie et al. 2023, arXiv 2302.03169):
#     hashed-bigram importance score of every raw doc against the
#     target subset (lang='en'), fixed-point linear-ratio weights (see
#     operators/curation.py for the exact-rational substitution). The
#     lambda table is B=1024 rows broadcast onto per-doc bucket counts
#     — the corpus shuffles once.
@register("dsir_importance_weights", curation.dsir_importance_duck())
def dsir_importance_weights(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    )
    return curation.dsir_importance(docs)


# --- UniMax multilingual budget allocation (Chung et al. 2023, arXiv
#     2304.09151): total budget 1.5N split across languages as
#     uniformly as possible with a 2-epoch per-language cap —
#     closed-form water-filling over cumulative sums, one window pass
#     on the per-language count table (constant-sized; the corpus is
#     touched once for the counts).
@register("unimax_lang_budget", curation.unimax_allocate_duck())
def unimax_lang_budget(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("lang")
    return curation.unimax_allocate(docs)
