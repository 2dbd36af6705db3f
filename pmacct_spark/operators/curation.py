"""Corpus-curation operators for training-data pipelines: test-set
decontamination, per-group quota sampling, quality-rule gating, and
near-dup cluster assignment via connected components.

These extend the dedup/text family (operators/dedup.py, operators/
text.py) with the remaining steps of a real pretraining data pipeline:

  - decontamination: drop/flag corpus documents that share n-gram
    shingles with a benchmark (evaluation) set. Scale shape: the
    benchmark side is small by construction -> its distinct shingle
    hashes BROADCAST; the 100 TB corpus side explodes shingles
    map-side and the join never shuffles the corpus.
  - quota sampling: deterministic per-group cap (per domain / per
    language mixing quotas). Scale shape: rank-by-hash inside each
    group is one shuffle on the group key; with AQE skew handling a
    hot domain splits automatically. Determinism (hash order, not
    random) makes reruns and oracle replay exact.
  - connected components: collapse pairwise near-dup edges into
    clusters so each group keeps one survivor. Iterative min-label
    propagation; O(diameter) rounds, each one shuffle keyed by node.
    Near-dup graphs are overwhelmingly tiny stars, so this converges
    in 2-3 rounds in practice.

Reference anchor: pmacct has none of these (SURVEY.md §2.5: no
distinct/dedup surface) — this is the beyond-reference tier the
engine adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# LCG constants (glibc) for the deterministic sampling rank — exact in
# int64 for any id < 2^32, replayable verbatim in DuckDB SQL.
_LCG_A = 1103515245
_LCG_C = 12345
_LCG_M = 2147483647


def sample_rank_sql(id_col: str) -> str:
    """Cross-engine deterministic pseudo-random rank for quota sampling
    (same text works as a Spark and a DuckDB expression)."""
    return f"({id_col} * {_LCG_A} + {_LCG_C}) % {_LCG_M}"


def quota_sample(
    df: DataFrame, group_col: str, id_col: str, k: int
) -> DataFrame:
    """Keep at most ``k`` rows per group, chosen by deterministic hash
    rank (id tiebreak). One shuffle on the group key; the window is a
    running top-k, which Spark executes with a partial sort — no
    group's full row set is ever held unsorted in memory."""
    w = F.expr(
        f"row_number() OVER (PARTITION BY {group_col} "
        f"ORDER BY {sample_rank_sql(id_col)}, {id_col})"
    )
    return (
        df.withColumn("smp_rank", w)
        .filter(F.col("smp_rank") <= k)
        .drop("smp_rank")
    )


def decontaminate(
    corpus_hashes: DataFrame,
    benchmark_hashes: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Flag corpus docs sharing shingle hashes with the benchmark set.

    Inputs are (id, hvs array<bigint>) as produced by
    ``dedup.shingle_hash_sets``. Returns one row per contaminated doc:
    (doc_id, n_shingles, n_contaminated, contam_pm).

    The benchmark's distinct hash set is broadcast (eval sets are
    thousands of docs, not billions); the corpus side stays un-shuffled
    — explode + broadcast-hash-join + partial-agg re-collapse.
    """
    bench = benchmark_hashes.select(
        F.explode("hvs").alias("hv")
    ).distinct()
    exploded = corpus_hashes.select(
        F.col(id_col),
        F.size("hvs").alias("n_shingles"),
        F.explode("hvs").alias("hv"),
    )
    return (
        exploded.join(F.broadcast(bench), "hv")
        .groupBy(id_col, "n_shingles")
        .agg(F.count("*").alias("n_contaminated"))
        .withColumn(
            "contam_pm",
            F.expr("n_contaminated * 1000 DIV n_shingles"),
        )
        .select(id_col, "n_shingles", "n_contaminated", "contam_pm")
    )


def connected_components(
    edges: DataFrame,
    a: str = "doc_a",
    b: str = "doc_b",
    max_iter: int = 64,
) -> DataFrame:
    """Connected components of an undirected pair graph by iterative
    min-label propagation: every node repeatedly adopts the smallest
    label among itself and its neighbours until fixpoint.

    Returns (node, cluster_id) for every node appearing in ``edges``,
    where cluster_id = min node id of the component.

    Scale notes: each round is one groupBy shuffle keyed by node over
    the (symmetrized) edge list; lineage is truncated per round with
    localCheckpoint so long chains don't build a mile-long plan.
    Rounds needed = graph diameter; near-dup graphs are star-ish
    (diameter ~2). The convergence check is an aggregate (sum of
    labels — monotonically non-increasing), not a collect of rows.

    CONVERGENCE IS VERIFIED, never assumed: if the label-sum fixpoint
    is not reached within ``max_iter`` rounds the function raises
    RuntimeError rather than silently returning wrong cluster ids (a
    diameter-``max_iter`` path graph is pathological for near-dup
    data, and a wrong answer with no signal is worse than an error).
    """
    from pyspark.sql import Observation

    sym = edges.select(
        F.col(a).alias("u"), F.col(b).alias("v")
    ).unionByName(
        edges.select(F.col(b).alias("u"), F.col(a).alias("v"))
    ).localCheckpoint()
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    prev_sum = labels.agg(F.sum("label")).first()[0]
    converged = False
    for i in range(max_iter):
        neigh = (
            sym.join(labels, sym["v"] == labels["node"])
            .groupBy("u")
            .agg(F.min("label").alias("nlabel"))
        )
        # convergence metric rides along with the checkpoint
        # materialization (Observation) — ONE job per round, not two
        obs = Observation(f"cc_round_{i}")
        labels = (
            labels.join(neigh, labels["node"] == neigh["u"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nlabel", F.col("label"))
                ).alias("label"),
            )
            .observe(obs, F.sum("label").alias("s"))
            .localCheckpoint()
        )
        cur_sum = obs.get["s"]
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        raise RuntimeError(
            f"connected_components did not reach the label fixpoint in "
            f"{max_iter} rounds (component diameter exceeds max_iter); "
            f"raise max_iter"
        )
    return labels.select(
        F.col("node"), F.col("label").alias("cluster_id")
    )


def cc_duck(edges_sql: str) -> str:
    """DuckDB oracle for :func:`connected_components`: transitive
    closure by recursive CTE (every (node, reachable-label) pair), then
    MIN(label) per node. Exponentially more work than the Spark plan —
    fine for oracle-sized graphs, not the scale path."""
    return f"""
WITH RECURSIVE edges AS ({edges_sql}),
sym AS (
  SELECT doc_a AS u, doc_b AS v FROM edges
  UNION
  SELECT doc_b AS u, doc_a AS v FROM edges
),
walk(node, label) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM sym) t
  UNION
  SELECT s.v, w.label FROM walk w JOIN sym s ON s.u = w.node
)
SELECT node, CAST(MIN(label) AS BIGINT) AS cluster_id
FROM walk GROUP BY node
"""


def temperature_mix(
    df: DataFrame, group_col: str, id_col: str, scale: int = 4
) -> DataFrame:
    """Temperature-2 source mixing: keep ``max(1, floor(sqrt(n_g)) *
    scale)`` rows per group, where n_g is the group's row count — the
    standard sub-linear reweighting that upsamples small sources and
    damps huge ones in a training mix (count^(1/T) with T=2).

    sqrt is IEEE-correctly-rounded so the quota is cross-engine exact
    (no cross-group float SUM anywhere — a normalized-to-total variant
    would order-depend on float addition); rows are chosen by the same
    deterministic LCG rank as :func:`quota_sample`. Plan shape: one
    count aggregation (tiny, one row per source) broadcast back, then
    the running-top-k window per group — the corpus shuffles once."""
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    quota = counts.withColumn(
        "__quota",
        F.greatest(
            F.lit(1).cast("bigint"),
            F.floor(F.sqrt(F.col("__n")) * scale).cast("bigint"),
        ),
    ).drop("__n")
    w = F.expr(
        f"row_number() OVER (PARTITION BY {group_col} "
        f"ORDER BY {sample_rank_sql(id_col)}, {id_col})"
    )
    return (
        df.join(F.broadcast(quota), group_col)
        .withColumn("smp_rank", w)
        .filter(F.col("smp_rank") <= F.col("__quota"))
        .drop("smp_rank", "__quota")
    )


# ---------------------------------------------------------------------------
# DSIR: data selection with importance resampling (Xie et al. 2023,
# arXiv 2302.03169)
# ---------------------------------------------------------------------------
#
# DSIR scores each raw document by how target-like its hashed n-gram
# feature distribution is: score(x) = sum_f c_f(x) * log(p_target(f) /
# p_raw(f)) with add-1-smoothed bucket probabilities over B hashed
# bigram features. This implementation keeps the exact-rational
# discipline of the gated suite (no ln(), no float sums): the log-ratio
# weight is replaced by the signed fixed-point LINEAR ratio deviation
# lam_f = FP * p_t(f)/p_r(f) - FP, computed with integer DIV — monotone
# in the true log weight per feature, so single-feature orderings are
# identical and multi-feature scores differ only in how features weigh
# against each other (the same substitution the BM25 idf uses,
# operators/text.py:262).
#
# Scale shape (100 TB): bigram hashes come from the SAME per-token fold
# states the dedup family uses (one tokenize pass, map-side); per-doc
# bucket counts are one shuffle on (id, bucket) — mostly map-side since
# a doc's windows are colocated; the bucket-stat table is B rows
# (constant!), so the lambda table BROADCASTS and the corpus never
# shuffles again. Int64 stays exact up to ~3e9 total feature windows
# with FP=1e6; beyond that lift the lambda arithmetic to DECIMAL(38,0)
# / HUGEINT (the per-doc score stays int64 either way).


def dsir_importance(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_pred: str = "lang = 'en'",
    n_buckets: int = 1024,
    fp: int = 1_000_000,
) -> DataFrame:
    """(id, n_features, dsir_score_fp, selected): fixed-point DSIR
    importance score per document against the ``target_pred`` subset;
    ``selected`` flags docs whose feature mix is more target-like than
    raw (score > 0)."""
    from pmacct_spark.operators.dedup import (
        _token_states_spark,
        _window_hashes_from_states,
    )
    from pmacct_spark.operators.staging import stage

    base = df.select(
        id_col,
        F.expr(f"CASE WHEN {target_pred} THEN 1 ELSE 0 END")
        .cast("bigint")
        .alias("tgt"),
        F.expr(_token_states_spark(text_col)).alias("_ts"),
    )
    feat = base.select(
        id_col,
        "tgt",
        F.explode(F.expr(_window_hashes_from_states("_ts", 2))).alias("hv"),
    ).withColumn("bkt", F.expr(f"hv % {n_buckets}").cast("bigint"))
    # staged: feeds both the bucket-stat aggregate and the score join
    per = stage(
        feat.groupBy(id_col, "tgt", "bkt").agg(
            F.count(F.lit(1)).cast("bigint").alias("c")
        )
    )
    g = per.groupBy("bkt").agg(
        F.sum(F.expr("CASE WHEN tgt = 1 THEN c ELSE 0 END"))
        .cast("bigint")
        .alias("tb"),
        F.sum("c").cast("bigint").alias("rb"),
    )
    tot = g.agg(
        F.sum("tb").cast("bigint").alias("tt"),
        F.sum("rb").cast("bigint").alias("rr"),
    )
    lam = (
        g.crossJoin(F.broadcast(tot))
        .withColumn(
            "lam",
            F.expr(
                f"CAST(LEAST(((tb + 1) * (rr + {n_buckets}) * {fp}) DIV "
                f"((rb + 1) * (tt + {n_buckets})), {fp} * 1000) AS BIGINT) "
                f"- {fp}"
            ),
        )
        .select("bkt", "lam")
    )
    return (
        per.join(F.broadcast(lam), "bkt")
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("bigint").alias("n_features"),
            F.sum(F.expr("c * lam")).cast("bigint").alias("dsir_score_fp"),
        )
        .withColumn(
            "selected",
            F.expr("CASE WHEN dsir_score_fp > 0 THEN 1 ELSE 0 END").cast(
                "bigint"
            ),
        )
    )


def dsir_importance_duck(
    id_col: str = "doc_id",
    text_col: str = "text",
    target_pred: str = "lang = 'en'",
    n_buckets: int = 1024,
    fp: int = 1_000_000,
    source: str = "documents",
) -> str:
    from pmacct_spark.operators.dedup import (
        _window_hash_duck,
        _window_states_duck,
    )

    th, pp = _window_states_duck(text_col)
    return f"""
WITH states AS (
  SELECT {id_col},
         CAST(CASE WHEN {target_pred} THEN 1 ELSE 0 END AS BIGINT) AS tgt,
         {th} AS th, {pp} AS pp
  FROM {source}
),
win AS (
  SELECT {id_col}, tgt, ({_window_hash_duck(2)}) % {n_buckets} AS bkt
  FROM states, unnest(range(1, greatest(len(th) - 1, 0) + 1)) AS t(i)
),
per AS (
  SELECT {id_col}, tgt, bkt, CAST(COUNT(*) AS BIGINT) AS c
  FROM win GROUP BY 1, 2, 3
),
g AS (
  SELECT bkt,
         CAST(SUM(CASE WHEN tgt = 1 THEN c ELSE 0 END) AS BIGINT) AS tb,
         CAST(SUM(c) AS BIGINT) AS rb
  FROM per GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(tb) AS BIGINT) AS tt, CAST(SUM(rb) AS BIGINT) AS rr FROM g
),
lam AS (
  SELECT bkt,
         CAST(LEAST(((tb + 1) * (rr + {n_buckets}) * {fp}) //
              ((rb + 1) * (tt + {n_buckets})), {fp} * 1000) AS BIGINT)
           - {fp} AS lam
  FROM g, tot
)
SELECT {id_col}, CAST(SUM(c) AS BIGINT) AS n_features,
       CAST(SUM(c * lam) AS BIGINT) AS dsir_score_fp,
       CAST(CASE WHEN SUM(c * lam) > 0 THEN 1 ELSE 0 END AS BIGINT)
         AS selected
FROM per JOIN lam USING (bkt) GROUP BY 1
"""


# ---------------------------------------------------------------------------
# UniMax: fairer multilingual sampling with per-language epoch caps
# (Chung et al. 2023, arXiv 2304.09151)
# ---------------------------------------------------------------------------
#
# UniMax allocates a total example budget B across languages so that
# every language is sampled as uniformly as possible without repeating
# any language more than E epochs: process languages by ascending cap
# (cap_l = n_l * E); a language whose cap fits within an equal share of
# the remaining budget is fully capped, the rest split the remainder
# evenly. The sequential water-filling has a closed form over cumulative
# sums, so the allocation is ONE window pass over the per-language
# count table — no loop, no driver-side iteration. Integer arithmetic
# throughout (equal split by DIV, remainder to the smallest-cap
# languages first), so the oracle replays it exactly.
#
# Scale shape (100 TB): the corpus is touched once for the per-language
# counts (map-side combined); everything after runs on a table with one
# row per LANGUAGE (constant-sized; the single-partition window is on
# that tiny table, never on the corpus).


def unimax_allocate(
    df: DataFrame,
    lang_col: str = "lang",
    total_budget_expr: str = "(3 * total) DIV 2",
    epochs: int = 2,
) -> DataFrame:
    """(lang, n_docs, cap, allocated, full_epochs, partial_docs):
    UniMax budget allocation. ``total_budget_expr`` may reference
    ``total`` (the corpus row count) so the budget scales with the
    data; the default 1.5N with E=2 leaves small languages capped and
    large ones budget-limited."""
    from pyspark.sql.window import Window

    counts = df.groupBy(F.col(lang_col).alias("lang")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = counts.agg(F.sum("n").cast("bigint").alias("total"))
    c = (
        counts.crossJoin(F.broadcast(tot))
        .withColumn("cap", F.expr(f"n * {epochs}").cast("bigint"))
        .withColumn("budget", F.expr(total_budget_expr).cast("bigint"))
    )
    asc = Window.orderBy("cap", "lang")
    run = asc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    allr = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    o = (
        c.withColumn("i", F.row_number().over(asc).cast("bigint"))
        .withColumn("L", F.count(F.lit(1)).over(allr).cast("bigint"))
        .withColumn("cum", F.sum("cap").over(run).cast("bigint"))
        # fits: this language's cap is within an equal share of what
        # remains if every smaller language took its full cap
        .withColumn(
            "fits",
            F.expr(
                "CASE WHEN cap * (L - i + 1) <= budget - (cum - cap) "
                "THEN 1 ELSE 0 END"
            ),
        )
    )
    g = (
        o.withColumn("capped", F.min("fits").over(run))
        .withColumn(
            "capped_sum",
            F.sum(F.expr("CASE WHEN capped = 1 THEN cap ELSE 0 END")).over(
                allr
            ),
        )
        .withColumn("m", F.sum(F.expr("1 - capped")).over(allr))
        .withColumn(
            "uidx",
            F.sum(F.expr("CASE WHEN capped = 0 THEN 1 ELSE 0 END")).over(run),
        )
    )
    return g.select(
        "lang",
        F.col("n").alias("n_docs"),
        "cap",
        F.expr(
            "CAST(CASE WHEN capped = 1 THEN cap ELSE "
            "(budget - capped_sum) DIV m + "
            "CASE WHEN uidx <= (budget - capped_sum) % m THEN 1 ELSE 0 END "
            "END AS BIGINT)"
        ).alias("allocated"),
    ).select(
        "lang",
        "n_docs",
        "cap",
        "allocated",
        F.expr("allocated DIV n_docs").cast("bigint").alias("full_epochs"),
        F.expr("allocated % n_docs").cast("bigint").alias("partial_docs"),
    )


def unimax_allocate_duck(
    lang_col: str = "lang",
    total_budget_expr: str = "(3 * total) // 2",
    epochs: int = 2,
    source: str = "documents",
) -> str:
    return f"""
WITH counts AS (
  SELECT {lang_col} AS lang, CAST(COUNT(*) AS BIGINT) AS n
  FROM {source} GROUP BY 1
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM counts),
c AS (
  SELECT lang, n, CAST(n * {epochs} AS BIGINT) AS cap,
         CAST({total_budget_expr} AS BIGINT) AS budget
  FROM counts, tot
),
o AS (
  SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY cap, lang) AS BIGINT) AS i,
         CAST(COUNT(*) OVER () AS BIGINT) AS L,
         CAST(SUM(cap) OVER (ORDER BY cap, lang
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM c
),
f AS (
  SELECT *, CASE WHEN cap * (L - i + 1) <= budget - (cum - cap)
                 THEN 1 ELSE 0 END AS fits
  FROM o
),
g AS (
  SELECT *, MIN(fits) OVER (ORDER BY i ROWS UNBOUNDED PRECEDING) AS capped
  FROM f
),
s AS (
  SELECT *,
         SUM(CASE WHEN capped = 1 THEN cap ELSE 0 END) OVER () AS capped_sum,
         SUM(1 - capped) OVER () AS m,
         SUM(CASE WHEN capped = 0 THEN 1 ELSE 0 END)
           OVER (ORDER BY i ROWS UNBOUNDED PRECEDING) AS uidx
  FROM g
)
SELECT lang, n AS n_docs, cap,
       CAST(CASE WHEN capped = 1 THEN cap ELSE
            (budget - capped_sum) // m +
            CASE WHEN uidx <= (budget - capped_sum) % m THEN 1 ELSE 0 END
            END AS BIGINT) AS allocated,
       CAST(CASE WHEN capped = 1 THEN cap ELSE
            (budget - capped_sum) // m +
            CASE WHEN uidx <= (budget - capped_sum) % m THEN 1 ELSE 0 END
            END // n AS BIGINT) AS full_epochs,
       CAST(CASE WHEN capped = 1 THEN cap ELSE
            (budget - capped_sum) // m +
            CASE WHEN uidx <= (budget - capped_sum) % m THEN 1 ELSE 0 END
            END % n AS BIGINT) AS partial_docs
FROM s
"""
