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


def _token_states_spark(text_col: str) -> str:
    """Per-token fold state (h = polyhash(token), p = 131^len(token) mod P)
    in one pass over each token's characters."""
    from pmacct_spark.functions.hashing import MUL

    return (
        f"transform(split(lower({text_col}), '\\\\s+'), t -> "
        f"aggregate(split(t, ''), "
        f"named_struct('h', 0L, 'p', 1L), "
        f"(acc, c) -> named_struct("
        f"'h', (acc.h * {MUL} + ascii(c)) % {P}, 'p', (acc.p * {MUL}) % {P})))"
    )


def _shingle_hash_from_states(st: str, n: int) -> str:
    """Shingle hash by combining n token states: identical value to
    polyhash('t1 t2 ... tn') — h(a⊔b) = ((h_a*131+32) mod P)*p_b + h_b.
    All intermediates < 2^60, exact in int64."""
    from pmacct_spark.functions.hashing import MUL

    h = f"element_at({st}, CAST(i AS INT)).h"
    for j in range(1, n):
        e = f"element_at({st}, CAST(i + {j} AS INT))"
        h = f"((({h} * {MUL} + 32) % {P}) * {e}.p + {e}.h) % {P}"
    return (
        f"array_distinct(transform("
        f"sequence(1, greatest(size({st}) - {n - 1}, 0)), i -> {h}))"
    )


def shingle_hashes_duck(text_col: str, n: int = 3) -> str:
    return (
        f"list_distinct(list_transform({shingles_duck(text_col, n)}, "
        f"s -> {poly_hash_duck_sql('s', idx='j')}))"
    )


# ---------------------------------------------------------------------------
# Arrow/numpy kernel for the portable polyhash token fold (guide §4.2)
# ---------------------------------------------------------------------------
#
# The per-character fold (_token_states_spark) is an interpreted
# higher-order lambda per character; at ~0.4 s/pass after spread() it
# was the dominant map-side cost of every portable-hash dedup query
# (~10 queries). The kernel computes the SAME arithmetic vectorized;
# bit-equivalence is asserted against the SQL fold in
# tests/test_dedup.py::test_arrow_fold_matches_sql_fold and every
# consumer stays oracle-gated.
#
# Spark semantics replicated exactly (probed on this Spark build):
#   - split(lower(t), '\\s+') keeps LEADING and TRAILING empty tokens
#     (limit -1); Java \s is [ \t\n\x0B\f\r] (no Unicode classes)
#   - split('', '') == [''] and ascii('') == 0, so an EMPTY token
#     folds exactly one zero character: state (h=0, p=131)
#   - ascii(c) is the codepoint of the character (ord)
#   - docs with fewer than n tokens: the window form's CASE guard
#     yields an empty array (the unguarded shingle form throws
#     INVALID_ARRAY_INDEX under ANSI — unreachable on any corpus this
#     engine accepts; the kernel yields the empty array)
#
# Production hazards documented (not exercised by any fixture, which
# is pure ASCII): Java vs Python lowercasing of non-ASCII codepoints
# (e.g. dotted I) and \s vs Python's Unicode whitespace class can
# diverge; both sides of every consumer are oracle-gated, so a corpus
# that trips them fails loudly at the hash gate, not silently.

_JAVA_WS_RE = "[ \t\n\x0b\f\r]+"


def _fold_token_states(texts):
    """(doc_tok_offsets, h, p) numpy arrays for a batch of documents:
    flat per-token fold states, exactly _token_states_spark."""
    import re

    import numpy as np

    from pmacct_spark.functions.hashing import MUL

    ws = re.compile(_JAVA_WS_RE)
    all_tokens: list[str] = []
    offsets = np.empty(len(texts) + 1, dtype=np.int64)
    offsets[0] = 0
    for k, s in enumerate(texts):
        if s is None:
            offsets[k + 1] = offsets[k]
            continue
        toks = ws.split(s.lower())
        all_tokens.extend(toks)
        offsets[k + 1] = offsets[k] + len(toks)
    ntok = len(all_tokens)
    if ntok == 0:
        return offsets, np.empty(0, np.int64), np.empty(0, np.int64)
    # empty token == one zero char (split('','')==[''], ascii('')==0)
    lens = np.fromiter(
        (len(t) or 1 for t in all_tokens), dtype=np.int64, count=ntok
    )
    starts = np.zeros(ntok, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    blob = "".join(t if t else "\x00" for t in all_tokens)
    codes = np.frombuffer(
        blob.encode("utf-32-le"), dtype=np.uint32
    ).astype(np.int64)
    h = np.zeros(ntok, dtype=np.int64)
    alive = np.arange(ntok)
    for j in range(int(lens.max())):
        alive = alive[lens[alive] > j]
        if alive.size == 0:
            break
        h[alive] = (h[alive] * MUL + codes[starts[alive] + j]) % P
    maxlen = int(lens.max())
    pow_table = np.empty(maxlen + 1, dtype=np.int64)
    pow_table[0] = 1
    for j in range(1, maxlen + 1):
        pow_table[j] = (pow_table[j - 1] * MUL) % P
    return offsets, h, pow_table[lens]


def _fold_window_hashes(offsets, h, p, n: int):
    """Flat combined hashes of every n-token window + per-doc window
    offsets. Combine per extra token:
    h = (((h*131 + 32) % P) * p_next + h_next) % P — every
    intermediate < 2**60, exact in int64 (_shingle_hash_from_states)."""
    import numpy as np

    from pmacct_spark.functions.hashing import MUL

    ndocs = offsets.size - 1
    nwin = np.maximum(np.diff(offsets) - (n - 1), 0)
    woff = np.zeros(ndocs + 1, dtype=np.int64)
    np.cumsum(nwin, out=woff[1:])
    total = int(woff[-1])
    if total == 0:
        return woff, np.empty(0, np.int64)
    doc_of_win = np.repeat(np.arange(ndocs), nwin)
    first_tok = (
        offsets[doc_of_win] + np.arange(total) - woff[doc_of_win]
    )
    hw = h[first_tok].copy()
    for j in range(1, n):
        t = first_tok + j
        hw = (((hw * MUL + 32) % P) * p[t] + h[t]) % P
    return woff, hw


def _shingle_sets_arrow(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, extras..., hvs): distinct (first-occurrence order) n-token
    shingle hashes per doc via the numpy fold — the Arrow twin of the
    _token_states_spark + _shingle_hash_from_states expression chain."""
    from pyspark.sql.types import ArrayType, LongType, StructField, StructType

    from pmacct_spark.session import ship_package

    # the kernel references module-level fold helpers: the package must
    # be importable on the worker (multimodal.decode_features pattern)
    ship_package(df.sparkSession)
    src = df.select(id_col, *extra_cols, text_col)
    text_idx = len(src.columns) - 1

    def kernel(batches):
        import numpy as np
        import pyarrow as pa

        for rb in batches:
            if rb.num_rows == 0:
                continue
            texts = rb.column(text_idx).to_pylist()
            offs, h, p = _fold_token_states(texts)
            woff, hw = _fold_window_hashes(offs, h, p, n)
            vals: list[int] = []
            out_off = np.empty(len(texts) + 1, dtype=np.int32)
            out_off[0] = 0
            for k in range(len(texts)):
                seen: set = set()
                dd = vals.append
                for v in hw[woff[k] : woff[k + 1]].tolist():
                    if v not in seen:
                        seen.add(v)
                        dd(v)
                out_off[k + 1] = len(vals)
            cols = [rb.column(i) for i in range(text_idx)]
            cols.append(
                pa.ListArray.from_arrays(
                    pa.array(out_off, type=pa.int32()),
                    pa.array(vals, type=pa.int64()),
                )
            )
            yield pa.RecordBatch.from_arrays(
                cols, names=list(rb.schema.names[:text_idx]) + ["hvs"]
            )

    out_schema = StructType(
        [src.schema.fields[i] for i in range(text_idx)]
        + [StructField("hvs", ArrayType(LongType()))]
    )
    return src.mapInArrow(kernel, out_schema)


def _window_rows_arrow(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(id, p, hv): one row per n-token window position (1-based) via
    the numpy fold — the Arrow twin of _window_hashes_from_states +
    posexplode (the explode happens inside the kernel: mapInArrow may
    change cardinality, so the per-window rows never exist as an
    intermediate array column)."""
    from pyspark.sql.types import LongType, StructField, StructType

    from pmacct_spark.session import ship_package

    ship_package(df.sparkSession)
    src = df.select(id_col, text_col)

    def kernel(batches):
        import numpy as np
        import pyarrow as pa

        for rb in batches:
            if rb.num_rows == 0:
                continue
            texts = rb.column(1).to_pylist()
            offs, h, p = _fold_token_states(texts)
            woff, hw = _fold_window_hashes(offs, h, p, n)
            nwin = np.diff(woff)
            ids = np.repeat(
                np.asarray(rb.column(0), dtype=np.int64), nwin
            )
            pos = np.arange(int(woff[-1]), dtype=np.int64) - np.repeat(
                woff[:-1], nwin
            ) + 1
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, type=pa.int64()),
                    pa.array(pos, type=pa.int64()),
                    pa.array(hw, type=pa.int64()),
                ],
                names=[id_col, "p", "hv"],
            )

    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("p", LongType()),
            StructField("hv", LongType()),
        ]
    )
    return src.mapInArrow(kernel, out_schema)


def shingle_hash_sets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    fast: bool = False,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, hvs: array<bigint>) — each doc's distinct shingle hashes.

    Hashing shingles to int64 once — instead of carrying shingle strings
    through joins — keeps every downstream compare/intersect on fixed
    8-byte values; at 100 TB this is the difference between shuffling
    strings and shuffling longs. The portable path is an Arrow numpy
    kernel (guide §4.2) computing the character fold vectorized,
    bit-identical to the _token_states_spark expression chain (asserted
    in tests); it replaced the interpreted per-character HOF fold AND
    the spread() repartition that parallelized it — the kernel is
    ~100x cheaper per row, so the full-text shuffle that spread() paid
    on single-file inputs (the dedup_cross_corpus regression, VERDICT
    r13 #2) buys nothing and is gone."""
    if fast:
        body = f"pmod(xxhash64(s), {P})"
        return df.select(
            id_col,
            *extra_cols,
            F.expr(
                f"array_distinct(transform({_shingles_spark(text_col, n)}, "
                f"s -> {body}))"
            ).alias("hvs"),
        )
    return _shingle_sets_arrow(df, id_col, text_col, n, extra_cols)


# ---------------------------------------------------------------------------
# minhash + LSH
# ---------------------------------------------------------------------------

def minhash_signature(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, fast: bool = False
) -> DataFrame:
    """K-permutation MinHash over distinct n-word shingles.

    Plan: hash shingles per row (narrow) -> explode (narrow) ->
    groupBy(id) with K min() aggregates (one shuffle, map-side combined).
    """
    sets = shingle_hash_sets(df, id_col, text_col, n, fast=fast)
    if fast:
        # materialization barrier: see _signature_from_sets — exploding
        # a raw EXPRESSION hvs recomputes the per-doc hash array once
        # per shingle (the inlining trap). The portable path's hvs
        # comes out of the Arrow kernel, an opaque Python node Catalyst
        # cannot inline into — the barrier there was a pure
        # write+read (~0.5 s/pass measured, fenced A/B).
        from pmacct_spark.operators.staging import stage

        sets = stage(sets)
    return _signature_from_sets(sets, id_col)


def _signature_from_sets(sets: DataFrame, id_col: str) -> DataFrame:
    """explode + K codegen'd min() aggregates over the PERSISTED hash
    sets.

    Measured both shapes at sf0.1: a per-row
    ``array_min(transform(...))`` expression avoids the shuffle but
    runs 16 interpreted higher-order lambdas per doc (7.5s cold /
    2.0s warm); the explode feeds whole-stage-codegen min aggregates
    (2.4s cold / 1.6s warm) — the small exchange is cheaper than
    leaving codegen. CAUTION: only valid over a persisted/cached
    ``sets`` — over the raw expression Spark inlines the array
    computation into the generator and recomputes it PER EXPLODED ROW
    (measured 137s)."""
    tok = sets.select(id_col, F.explode("hvs").alias("hv"))
    aggs = [
        F.min(F.expr(f"({MINHASH_A[i]} * hv + {MINHASH_B[i]}) % {P}")).alias(f"mh{i}")
        for i in range(K)
    ]
    return tok.groupBy(id_col).agg(*aggs)


def band_keys_long(
    sig: DataFrame, id_col: str, bands: int = DEFAULT_BANDS
) -> DataFrame:
    """Signature -> long format (id, band_idx, bucket_key): one row per
    band, so candidate generation is ONE self-join on (band_idx, key)
    instead of ``bands`` separate joins — one shuffle, and the upstream
    signature plan is computed once, not 2x per band."""
    rows = K // bands
    band_exprs = []
    for b in range(bands):
        parts = ", '-', ".join(f"CAST(mh{b * rows + r} AS STRING)" for r in range(rows))
        band_exprs.append(f"concat({parts})")
    return sig.select(
        F.col(id_col),
        F.posexplode(F.expr(f"array({', '.join(band_exprs)})")).alias("bidx", "bk"),
    )


def lsh_candidate_pairs(
    bands_long: DataFrame, id_col: str
) -> DataFrame:
    """Distinct id pairs (a < b) sharing at least one band bucket."""
    left = bands_long.select(F.col(id_col).alias("doc_a"), "bidx", "bk")
    right = bands_long.select(F.col(id_col).alias("doc_b"), "bidx", "bk")
    return (
        left.join(right, ["bidx", "bk"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    bands: int = DEFAULT_BANDS,
    threshold_pm: int = 500,
    fast: bool = False,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: shingle-hash sets ->
    signatures -> banded buckets -> candidate pairs -> exact
    hashed-shingle Jaccard verification (integer per-mille).

    The per-doc hash set feeds both the signature and the verification
    join: when the corpus is heavy it is staged once (narrow parquet
    beats rescanning text per consumer); below the size threshold the
    Arrow fold just re-evaluates (stage_if_heavy). The fast path's
    expression hvs always stages — the explode-inlining trap. All
    pairwise work happens on int64 arrays, never on shingle strings.
    """
    from pmacct_spark.operators.staging import stage, stage_if_heavy

    sets = shingle_hash_sets(df, id_col, text_col, n, fast=fast)
    sets = stage(sets) if fast else stage_if_heavy(sets, df)
    sig = _signature_from_sets(sets, id_col)
    cands = lsh_candidate_pairs(band_keys_long(sig, id_col, bands), id_col)
    a = sets.select(F.col(id_col).alias("doc_a"), F.col("hvs").alias("hv_a"))
    b = sets.select(F.col(id_col).alias("doc_b"), F.col("hvs").alias("hv_b"))
    return (
        cands.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn(
            "jaccard_pm",
            F.expr(
                "size(array_intersect(hv_a, hv_b)) * 1000 "
                "DIV size(array_union(hv_a, hv_b))"
            ),
        )
        .filter(F.col("jaccard_pm") >= threshold_pm)
        .select("doc_a", "doc_b", "jaccard_pm")
    )


def _mins_duck_sql() -> str:
    """The K minhash aggregates (shared by the self-join and
    cross-corpus oracles so the hash family can never drift between
    them)."""
    return ", ".join(
        f"MIN(({MINHASH_A[i]} * hv + {MINHASH_B[i]}) % {P}) AS mh{i}"
        for i in range(K)
    )


def _band_cols_duck_sql(bands: int) -> str:
    rows = K // bands
    return ", ".join(
        " || '-' || ".join(
            f"CAST(mh{b * rows + r} AS VARCHAR)" for r in range(rows)
        )
        + f" AS band{b}"
        for b in range(bands)
    )


_JACCARD_PM_SQL = (
    "len(list_intersect(sa.hvs, sb.hvs)) * 1000 "
    "// len(list_distinct(list_concat(sa.hvs, sb.hvs)))"
)


def minhash_dedup_duck(
    source: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    bands: int = DEFAULT_BANDS,
    threshold_pm: int = 500,
) -> str:
    """DuckDB oracle replaying the exact MinHash-LSH pipeline (same hash
    family, same hashed-shingle Jaccard)."""
    mins = _mins_duck_sql()
    band_cols = _band_cols_duck_sql(bands)
    band_joins = "\nUNION\n".join(
        f"SELECT a.{id_col} AS doc_a, b.{id_col} AS doc_b "
        f"FROM bands a JOIN bands b ON a.band{b} = b.band{b} "
        f"AND a.{id_col} < b.{id_col}"
        for b in range(bands)
    )
    return f"""
WITH sh AS (
  SELECT {id_col}, {shingle_hashes_duck(text_col, n)} AS hvs FROM {source}
),
tok AS (SELECT {id_col}, unnest(hvs) AS hv FROM sh),
sig AS (SELECT {id_col}, {mins} FROM tok GROUP BY {id_col}),
bands AS (SELECT {id_col}, {band_cols} FROM sig),
cand AS ({band_joins}),
ver AS (
  SELECT c.doc_a, c.doc_b, {_JACCARD_PM_SQL} AS jaccard_pm
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


def minhash_cross_pairs(
    new_df: DataFrame,
    ref_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    bands: int = DEFAULT_BANDS,
    threshold_pm: int = 500,
    fast: bool = False,
    ref_sets: DataFrame | None = None,
) -> DataFrame:
    """Cross-corpus near-dedup: flag NEW docs that near-duplicate any
    REFERENCE doc — the incremental-ingest case (dedup an incoming
    crawl against the existing training set) where self-join dedup
    would waste work on ref x ref pairs.

    Same LSH shape as :func:`minhash_dedup_pairs` but the band join is
    new x ref only: a shuffle equi-join on (band index, band key) —
    both sides scale to billions of docs, no broadcast, no all-pairs.
    Returns (new_id, ref_id, jaccard_pm >= threshold)."""
    from pmacct_spark.operators.staging import stage, stage_if_heavy

    new_sets = shingle_hash_sets(new_df, id_col, text_col, n, fast=fast)
    new_sets = (
        stage(new_sets) if fast else stage_if_heavy(new_sets, new_df)
    )
    if ref_sets is None:
        # the static training-set side dominates the cost: callers
        # ingesting repeatedly should compute it once via
        # shingle_hash_sets + stage and pass it back in each batch
        ref_sets = shingle_hash_sets(ref_df, id_col, text_col, n, fast=fast)
        ref_sets = (
            stage(ref_sets) if fast else stage_if_heavy(ref_sets, ref_df)
        )
    nb = band_keys_long(
        _signature_from_sets(new_sets, id_col), id_col, bands
    ).select(F.col(id_col).alias("new_id"), "bidx", "bk")
    rb = band_keys_long(
        _signature_from_sets(ref_sets, id_col), id_col, bands
    ).select(F.col(id_col).alias("ref_id"), "bidx", "bk")
    cands = nb.join(rb, ["bidx", "bk"]).select("new_id", "ref_id").distinct()
    a = new_sets.select(F.col(id_col).alias("new_id"), F.col("hvs").alias("hv_a"))
    b = ref_sets.select(F.col(id_col).alias("ref_id"), F.col("hvs").alias("hv_b"))
    return (
        cands.join(a, "new_id")
        .join(b, "ref_id")
        .withColumn(
            "jaccard_pm",
            F.expr(
                "size(array_intersect(hv_a, hv_b)) * 1000 "
                "DIV size(array_union(hv_a, hv_b))"
            ),
        )
        .filter(F.col("jaccard_pm") >= threshold_pm)
        .select("new_id", "ref_id", "jaccard_pm")
    )


def minhash_cross_duck(
    new_pred: str,
    ref_pred: str,
    source: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    bands: int = DEFAULT_BANDS,
    threshold_pm: int = 500,
) -> str:
    """DuckDB oracle for :func:`minhash_cross_pairs` (same hash family,
    same banded join, new/ref split by the given predicates)."""
    mins = _mins_duck_sql()
    band_cols = _band_cols_duck_sql(bands)
    band_joins = "\nUNION\n".join(
        f"SELECT a.{id_col} AS new_id, b.{id_col} AS ref_id "
        f"FROM nbands a JOIN rbands b ON a.band{b} = b.band{b}"
        for b in range(bands)
    )
    return f"""
WITH sh AS (
  SELECT {id_col}, {shingle_hashes_duck(text_col, n)} AS hvs FROM {source}
),
tok AS (SELECT {id_col}, unnest(hvs) AS hv FROM sh),
sig AS (SELECT {id_col}, {mins} FROM tok GROUP BY {id_col}),
bands AS (SELECT {id_col}, {band_cols} FROM sig),
nbands AS (SELECT * FROM bands WHERE {new_pred}),
rbands AS (SELECT * FROM bands WHERE {ref_pred}),
cand AS ({band_joins}),
ver AS (
  SELECT c.new_id, c.ref_id, {_JACCARD_PM_SQL} AS jaccard_pm
  FROM cand c
  JOIN sh sa ON sa.{id_col} = c.new_id
  JOIN sh sb ON sb.{id_col} = c.ref_id
)
SELECT new_id, ref_id, CAST(jaccard_pm AS BIGINT) AS jaccard_pm
FROM ver WHERE jaccard_pm >= {threshold_pm}
"""


# ---------------------------------------------------------------------------
# exact-substring duplication (Lee et al. 2021, "Deduplicating Training
# Data Makes Language Models Better", arXiv 2107.06499)
# ---------------------------------------------------------------------------
#
# The ExactSubstr criterion: a length-W token window that occurs more
# than once in the corpus is duplicated text. The paper builds a suffix
# array; the distributed re-expression is rolling-hash W-grams — every
# window position hashes in O(1) from the per-token fold states (the
# same combination MinHash shingles use), so the corpus is tokenized
# and hashed ONCE, map-side. Per doc we report the duplicated-window
# fraction, the signal the paper cuts on.
#
# Scale shape (100 TB): explode is W-gram-positional but narrow
# (doc_id + int64); groupBy(doc_id, hv) combines map-side (a doc's
# windows are colocated in its input split), the global hash-count
# table is one row per DISTINCT window (sublinear under duplication),
# and the join back is hash-partitioned on hv with AQE free to pick
# the strategy. No suffix array, no sort, no quadratic anything.


def _window_hashes_from_states(st: str, n: int) -> str:
    """Positional (non-distinct) W-gram hashes from token fold states:
    one hash per window start, hash identical to polyhash of the
    space-joined window string (see :func:`_shingle_hash_from_states`)."""
    from pmacct_spark.functions.hashing import MUL

    h = f"element_at({st}, CAST(i AS INT)).h"
    for j in range(1, n):
        e = f"element_at({st}, CAST(i + {j} AS INT))"
        h = f"((({h} * {MUL} + 32) % {P}) * {e}.p + {e}.h) % {P}"
    return (
        f"CASE WHEN size({st}) >= {n} THEN "
        f"transform(sequence(1, size({st}) - {n - 1}), i -> {h}) "
        f"ELSE CAST(array() AS ARRAY<BIGINT>) END"
    )


def exact_substring_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    w: int = 5,
    fast: bool = False,
) -> DataFrame:
    """(id, n_windows, n_dup_windows, dup_permille): per-doc fraction of
    length-``w`` token windows whose content occurs >= 2 times anywhere
    in the corpus (including elsewhere in the same doc, per the paper).

    ``fast=True`` hashes windows with ``xxhash64`` (one JVM intrinsic
    per window instead of per-character folds — the production path,
    ~same convention as MinHash ``fast``); the default portable hash is
    what the DuckDB oracle replays."""
    if fast:
        toks = f"split(lower({text_col}), '\\\\s+')"
        parts = ", ' ', ".join(
            f"element_at(tk, CAST(i + {j} AS INT))" for j in range(w)
        )
        expr = (
            f"CASE WHEN size({toks}) >= {w} THEN "
            f"transform(array({toks}), tk -> "
            f"transform(sequence(1, size(tk) - {w - 1}), "
            f"i -> pmod(xxhash64(concat({parts})), {P})))[0] "
            f"ELSE CAST(array() AS ARRAY<BIGINT>) END"
        )
        wh = df.select(id_col, F.explode(F.expr(expr)).alias("hv"))
    else:
        # Arrow numpy fold (guide §4.2): bit-identical to the
        # _token_states_spark chain, explode included — see
        # shingle_hash_sets for why spread() is gone too
        wh = _window_rows_arrow(df, id_col, text_col, w).select(
            id_col, "hv"
        )
    from pmacct_spark.operators.staging import stage_if_heavy

    # the narrow (id, hv, c) projection feeds BOTH the global
    # hash-count aggregate and the join back: stage it when the corpus
    # is heavy (rescan cost), re-evaluate below the threshold (the
    # Arrow fold is cheap and the groupBy exchange canonicalizes for
    # runtime reuse) — fenced A/B at sf0.1 measured the barrier a
    # slight net cost at this volume
    per = stage_if_heavy(
        wh.groupBy(id_col, "hv").agg(
            F.count(F.lit(1)).cast("bigint").alias("c")
        ),
        df,
    )
    tot = per.groupBy("hv").agg(F.sum("c").cast("bigint").alias("tot"))
    return (
        per.join(tot, "hv")
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("bigint").alias("n_windows"),
            F.sum(F.when(F.col("tot") >= 2, F.col("c")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("n_dup_windows"),
        )
        .withColumn(
            "dup_permille",
            F.expr("(1000 * n_dup_windows) DIV n_windows").cast("bigint"),
        )
    )


def exact_substring_remove(
    df: DataFrame,
    id_col: str,
    text_col: str,
    w: int = 5,
) -> DataFrame:
    """(id, n_tokens, n_removed, cleaned): the REMOVAL half of Lee et
    al. 2021 (``exact_substring_stats`` is the measurement half) —
    every token covered by a length-``w`` window whose content occurs
    >= 2 times anywhere in the corpus is cut, overlapping duplicated
    spans merging naturally; ``cleaned`` is the surviving token stream
    (lowercased / whitespace-normalized, the operator's tokenization).

    Scale shape: one tokenize+hash pass (staged — it feeds both the
    global duplicate set and the position join), the duplicate-hash
    aggregate is one row per distinct window, and the cut itself is a
    per-doc HOF over (tokens, sorted duplicate starts) — map-side
    after ONE join back on the doc id. The per-doc exists() scan is
    O(tokens x dup_starts) worst case; dup_starts is bounded by tokens
    and in real corpora by the duplicated fraction."""
    from pmacct_spark.operators.staging import stage_if_heavy

    # Arrow numpy fold (guide §4.2) with the posexplode folded into the
    # kernel — bit-identical to the _token_states_spark chain; staged
    # only over a heavy corpus (two consumers read it back)
    wpos = stage_if_heavy(_window_rows_arrow(df, id_col, text_col, w), df)
    dups = (
        wpos.groupBy("hv")
        .agg(F.count(F.lit(1)).alias("tot"))
        .filter("tot >= 2")
        .select("hv")
    )
    starts = (
        wpos.join(dups, "hv")
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list("p")).alias("ss"))
    )
    covered = f"exists(ss, s -> s <= t AND t <= s + {w - 1})"
    # the O(tokens x dup_starts) covered-scan is the expensive part;
    # computing n_removed and cleaned as separate projections ran it
    # twice per token. One generator binds the kept-token array as a
    # lambda var and derives all three outputs from a single pass
    # (covered NULL — no duplicate starts — keeps the token, so the
    # old fillna(n_removed=0) falls out of the same expression).
    ka = (
        f"transform(sequence(1, size(tk)), "
        f"t -> IF({covered}, NULL, element_at(tk, CAST(t AS INT))))"
    )
    rec = (
        f"explode(transform(array({ka}), ka -> named_struct("
        f"'n_tokens', CAST(size(ka) AS BIGINT), "
        # coalesce restores the old fillna(n_removed=0) for NULL-text
        # docs (tk NULL -> size(filter(NULL)) NULL, ADVICE r13)
        f"'n_removed', CAST(coalesce(size(filter(ka, x -> x IS NULL)), 0)"
        f" AS BIGINT), "
        f"'cleaned', concat_ws(' ', filter(ka, x -> x IS NOT NULL)))))"
    )
    return (
        df.select(
            id_col,
            F.expr(f"split(lower({text_col}), '\\\\s+')").alias("tk"),
        )
        .join(starts, id_col, "left")
        .select(id_col, F.expr(rec).alias("__r"))
        .select(id_col, "__r.*")
    )


def exact_substring_remove_duck(
    id_col: str, text_col: str, w: int = 5, source: str = "documents"
) -> str:
    """DuckDB replay of :func:`exact_substring_remove` (element-wise
    list ops only — no list_reduce struct folds, whose field aliasing
    differs across versions)."""
    th, pp = _window_states_duck(text_col)
    covered = f"len(list_filter(ss, s -> s <= t AND t <= s + {w - 1})) > 0"
    return f"""
WITH states AS (
  SELECT {id_col}, {th} AS th, {pp} AS pp FROM {source}
),
win AS (
  SELECT {id_col}, CAST(i AS BIGINT) AS p, {_window_hash_duck(w)} AS hv
  FROM states, unnest(range(1, greatest(len(th) - {w - 1}, 0) + 1)) AS t(i)
),
dups AS (SELECT hv FROM win GROUP BY 1 HAVING COUNT(*) >= 2),
st AS (
  SELECT {id_col}, list_sort(list(p)) AS ss
  FROM win JOIN dups USING (hv) GROUP BY 1
),
tk AS (
  SELECT {id_col},
         string_split_regex(lower({text_col}), '\\s+') AS tk
  FROM {source}
),
j AS (
  SELECT tk.{id_col}, tk.tk,
         coalesce(st.ss, CAST([] AS BIGINT[])) AS ss
  FROM tk LEFT JOIN st USING ({id_col})
)
SELECT {id_col}, CAST(len(tk) AS BIGINT) AS n_tokens,
  CAST(len(list_filter(range(1, len(tk) + 1), t -> {covered}))
    AS BIGINT) AS n_removed,
  coalesce(array_to_string(list_transform(
    list_filter(range(1, len(tk) + 1), t -> NOT ({covered})),
    t -> tk[CAST(t AS INT)]), ' '), '') AS cleaned
FROM j"""


def _window_states_duck(text_col: str) -> tuple[str, str]:
    """DuckDB per-token fold states as two parallel lists (th = token
    polyhash, pp = 131^len(token) mod P), mirroring
    :func:`_token_states_spark`."""
    from pmacct_spark.functions.hashing import MUL

    tk = f"string_split_regex(lower({text_col}), '\\s+')"
    th = f"list_transform({tk}, t -> {poly_hash_duck_sql('t', idx='j')})"
    pp = (
        f"list_transform({tk}, t -> list_reduce(list_prepend("
        f"CAST(1 AS BIGINT), list_transform(range(1, length(t) + 1), "
        f"j -> CAST(0 AS BIGINT))), (acc, z) -> (acc * {MUL}) % {P}))"
    )
    return th, pp


def _window_hash_duck(n: int) -> str:
    from pmacct_spark.functions.hashing import MUL

    h = "th[i]"
    for j in range(1, n):
        h = f"((({h} * {MUL} + 32) % {P}) * pp[i + {j}] + th[i + {j}]) % {P}"
    return h


def exact_substring_duck(
    id_col: str, text_col: str, w: int = 5, source: str = "documents"
) -> str:
    th, pp = _window_states_duck(text_col)
    return f"""
WITH states AS (
  SELECT {id_col}, {th} AS th, {pp} AS pp FROM {source}
),
win AS (
  SELECT {id_col}, {_window_hash_duck(w)} AS hv
  FROM states, unnest(range(1, greatest(len(th) - {w - 1}, 0) + 1)) AS t(i)
),
per AS (
  SELECT {id_col}, hv, CAST(COUNT(*) AS BIGINT) AS c FROM win GROUP BY 1, 2
),
tot AS (SELECT hv, CAST(SUM(c) AS BIGINT) AS tot FROM per GROUP BY 1)
SELECT {id_col}, CAST(SUM(c) AS BIGINT) AS n_windows,
       CAST(SUM(CASE WHEN tot >= 2 THEN c ELSE 0 END) AS BIGINT)
         AS n_dup_windows,
       CAST((1000 * SUM(CASE WHEN tot >= 2 THEN c ELSE 0 END)) // SUM(c)
         AS BIGINT) AS dup_permille
FROM per JOIN tot USING (hv) GROUP BY 1
"""
