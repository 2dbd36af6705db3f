"""Deduplication operators for training-data pipelines: exact hash,
shingle MinHash + LSH, SimHash, n-gram Jaccard verification.

Scale shapes (the whole point of these over naive pairwise):
  - exact: one groupBy on the content hash — a single shuffle keyed by
    digest; survivors picked with min(id) (deterministic).
  - MinHash-LSH: explode distinct shingles (map-side), one shuffle to
    build signatures, one shuffle per band for the bucket self-join.
    Candidate pairs ~ O(near-dups), not O(n²). Verification joins token
    sets back only for candidates.
  - SimHash: signature is a pure per-row expression (no shuffle at
    all); bucketing by signature gives Hamming-0 candidates, rotated
    band tables give Hamming<=k.

Hashes are the cross-engine polynomial family (functions.hashing) so a
DuckDB oracle replays the exact pipeline; pass ``fast=True`` for
xxhash64 signatures when oracle parity isn't needed.

Reference anchor: pmacct has no dedup (SURVEY.md §2.5: no distinct);
these are the beyond-reference operators the engine adds for
large-scale data pipelines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pmacct_spark.functions.hashing import (
    MINHASH_A,
    MINHASH_B,
    P,
    poly_hash_duck_sql,
    poly_hash_spark_sql,
)

K = 16  # minhash permutations
DEFAULT_BANDS = 8  # 8 bands x 2 rows: ~0.9 recall at jaccard 0.5


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup on content digest: one row per distinct text with the
    smallest id as survivor and the duplicate count."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("digest"))
        .groupBy("digest")
        .agg(
            F.min(id_col).alias("survivor_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# ---------------------------------------------------------------------------
# shingles
# ---------------------------------------------------------------------------

def _shingles_spark(text_col: str, n: int = 3) -> str:
    """Spark SQL expr: distinct ``n``-word shingles of lowercased text."""
    toks = f"split(lower({text_col}), '\\\\s+')"
    parts = ", ' ', ".join(f"element_at({toks}, CAST(i + {j} AS INT))" for j in range(n))
    return (
        f"array_distinct(transform(sequence(1, greatest(size({toks}) - {n - 1}, 0)), "
        f"i -> concat({parts})))"
    )


def shingles_duck(text_col: str, n: int = 3) -> str:
    toks = f"string_split_regex(lower({text_col}), '\\s+')"
    parts = " || ' ' || ".join(f"s[i + {j}]" for j in range(n))
    return (
        f"list_distinct(list_transform(range(1, greatest(len(s) - {n - 2}, 1)), "
        f"i -> {parts}))".replace("len(s)", f"len({toks})").replace("s[i", f"({toks})[i")
    )


def with_shingles(df: DataFrame, text_col: str, n: int = 3, out: str = "shingles") -> DataFrame:
    return df.withColumn(out, F.expr(_shingles_spark(text_col, n)))


# ---------------------------------------------------------------------------
# minhash + LSH
# ---------------------------------------------------------------------------

def minhash_signature(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, fast: bool = False
) -> DataFrame:
    """K-permutation MinHash over distinct n-word shingles.

    Plan: explode shingles (narrow) -> hash (narrow) -> groupBy(id) with
    K min() aggregates (one shuffle, map-side combined).
    """
    sh = with_shingles(df.select(id_col, text_col), text_col, n)
    tok = sh.select(id_col, F.explode("shingles").alias("sh"))
    if fast:
        # reduce into the prime field first so a_i * hv stays in int64
        hv = f"pmod(xxhash64(sh), {P})"
    else:
        hv = poly_hash_spark_sql("sh")
    tok = tok.withColumn("hv", F.expr(hv))
    aggs = [
        F.min(F.expr(f"({MINHASH_A[i]} * hv + {MINHASH_B[i]}) % {P}")).alias(f"mh{i}")
        for i in range(K)
    ]
    return tok.groupBy(id_col).agg(*aggs)


def band_keys(sig: DataFrame, id_col: str, bands: int = DEFAULT_BANDS) -> DataFrame:
    """Concatenate signature rows into per-band bucket keys."""
    rows = K // bands
    cols = [F.col(id_col)]
    for b in range(bands):
        parts = []
        for r in range(rows):
            parts.append(F.col(f"mh{b * rows + r}").cast("string"))
            parts.append(F.lit("-"))
        cols.append(F.concat(*parts[:-1]).alias(f"band{b}"))
    return sig.select(*cols)


def lsh_candidate_pairs(
    bandsdf: DataFrame, id_col: str, bands: int = DEFAULT_BANDS
) -> DataFrame:
    """Distinct id pairs (a < b) sharing at least one band bucket."""
    pairs = None
    for b in range(bands):
        left = bandsdf.select(
            F.col(id_col).alias("doc_a"), F.col(f"band{b}").alias("bk")
        )
        right = bandsdf.select(
            F.col(id_col).alias("doc_b"), F.col(f"band{b}").alias("bk")
        )
        p = left.join(right, "bk").filter(F.col("doc_a") < F.col("doc_b")).select(
            "doc_a", "doc_b"
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    return pairs.distinct()


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    bands: int = DEFAULT_BANDS,
    threshold_pm: int = 500,
    fast: bool = False,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: signatures -> band buckets ->
    candidate pairs -> exact shingle-Jaccard verification (integer
    per-mille)."""
    sig = minhash_signature(df, id_col, text_col, n, fast=fast)
    cands = lsh_candidate_pairs(band_keys(sig, id_col, bands), id_col, bands)
    sh = with_shingles(df.select(id_col, text_col), text_col, n).select(
        F.col(id_col), F.col("shingles")
    )
    a = sh.select(F.col(id_col).alias("doc_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("doc_b"), F.col("shingles").alias("sh_b"))
    verified = (
        cands.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn(
            "jaccard_pm",
            F.expr(
                "size(array_intersect(sh_a, sh_b)) * 1000 "
                "DIV size(array_union(sh_a, sh_b))"
            ),
        )
        .filter(F.col("jaccard_pm") >= threshold_pm)
        .select("doc_a", "doc_b", "jaccard_pm")
    )
    return verified


def minhash_dedup_duck(
    source: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    bands: int = DEFAULT_BANDS,
    threshold_pm: int = 500,
) -> str:
    """DuckDB oracle replaying the exact MinHash-LSH pipeline."""
    rows = K // bands
    mins = ", ".join(
        f"MIN(({MINHASH_A[i]} * hv + {MINHASH_B[i]}) % {P}) AS mh{i}"
        for i in range(K)
    )
    band_cols = ", ".join(
        " || '-' || ".join(
            f"CAST(mh{b * rows + r} AS VARCHAR)" for r in range(rows)
        )
        + f" AS band{b}"
        for b in range(bands)
    )
    band_joins = "\nUNION\n".join(
        f"SELECT a.{id_col} AS doc_a, b.{id_col} AS doc_b "
        f"FROM bands a JOIN bands b ON a.band{b} = b.band{b} "
        f"AND a.{id_col} < b.{id_col}"
        for b in range(bands)
    )
    return f"""
WITH sh AS (
  SELECT {id_col}, {shingles_duck(text_col, n)} AS shingles FROM {source}
),
tok AS (SELECT {id_col}, unnest(shingles) AS s FROM sh),
h AS (SELECT {id_col}, {poly_hash_duck_sql('s')} AS hv FROM tok),
sig AS (SELECT {id_col}, {mins} FROM h GROUP BY {id_col}),
bands AS (SELECT {id_col}, {band_cols} FROM sig),
cand AS ({band_joins}),
ver AS (
  SELECT c.doc_a, c.doc_b,
         len(list_intersect(sa.shingles, sb.shingles)) * 1000
           // len(list_distinct(list_concat(sa.shingles, sb.shingles))) AS jaccard_pm
  FROM cand c
  JOIN sh sa ON sa.{id_col} = c.doc_a
  JOIN sh sb ON sb.{id_col} = c.doc_b
)
SELECT doc_a, doc_b, CAST(jaccard_pm AS BIGINT) AS jaccard_pm
FROM ver WHERE jaccard_pm >= {threshold_pm}
"""


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

def simhash(
    df: DataFrame, id_col: str, text_col: str, bits: int = 16
) -> DataFrame:
    """Per-document SimHash fingerprint over unigram tokens: bit j is
    the sign of the sum of ±1 votes from each distinct token whose hash
    has bit j set. Pure per-row expressions after one explode+groupBy.
    """
    toks = f"array_distinct(split(lower({text_col}), '\\\\s+'))"
    tok = df.select(id_col, F.explode(F.expr(toks)).alias("t"))
    tok = tok.withColumn("hv", F.expr(poly_hash_spark_sql("t")))
    votes = [
        F.sum(
            F.expr(f"CASE WHEN (hv DIV {1 << j}) % 2 = 1 THEN 1 ELSE -1 END")
        ).alias(f"v{j}")
        for j in range(bits)
    ]
    per_doc = tok.groupBy(id_col).agg(*votes)
    fp = " + ".join(f"CASE WHEN v{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(bits))
    return per_doc.select(F.col(id_col), F.expr(f"CAST({fp} AS BIGINT)").alias("simhash"))


def simhash_duck(
    source: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 16,
) -> str:
    votes = ", ".join(
        f"SUM(CASE WHEN (hv // {1 << j}) % 2 = 1 THEN 1 ELSE -1 END) AS v{j}"
        for j in range(bits)
    )
    fp = " + ".join(f"CASE WHEN v{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(bits))
    return f"""
WITH tok AS (
  SELECT {id_col}, unnest(list_distinct(string_split_regex(lower({text_col}), '\\s+'))) AS t
  FROM {source}
),
h AS (SELECT {id_col}, {poly_hash_duck_sql('t')} AS hv FROM tok),
v AS (SELECT {id_col}, {votes} FROM h GROUP BY {id_col})
SELECT {id_col}, CAST({fp} AS BIGINT) AS simhash FROM v
"""
