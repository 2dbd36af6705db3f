"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with Arrow-batched decode / feature-extract / resize /
frame-sample stages.

Schema convention (the part that matters at 100 TB):

    payload   binary        -- the encoded bytes (never parsed by JVM)
    media     struct<kind string, codec string, width int, height int,
                     duration_ms bigint, sample_rate int>
    content_id bigint       -- stable id for partitioning / joins

Plumbing rules:
  - binary stays opaque to Catalyst; all per-item work happens in
    ``mapInPandas`` (Arrow batches) so Python touches columnar buffers,
    never row objects;
  - partition by ``content_id`` hash before decode so batch sizes are
    uniform (decode cost is per-byte, and skewed batches stall a stage);
  - decode output is a new column, not a mutation — lineage stays
    replayable.

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so
the decode kernels are STUBS: ``decode_image``/``decode_audio`` raise
``NotImplementedError`` unless ``fake=True``, in which case they emit a
deterministic fake feature vector derived from the payload bytes — the
Spark-side schema, batching, and partitioning are real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

MEDIA_STRUCT = (
    "struct<kind: string, codec: string, width: int, height: int, "
    "duration_ms: bigint, sample_rate: int>"
)

FEATURE_DIM = 8


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a real decoder: cheap rolling stats
    over the bytes. Replace with PIL/ffmpeg kernels in a full deploy.
    Scalar REFERENCE implementation — the Arrow kernel runs
    :func:`_fake_features_batch`, which must stay bit-identical (the
    DuckDB oracles replay this hash family value-exactly)."""
    if not payload:
        return [0.0] * dim
    out = []
    n = len(payload)
    for j in range(dim):
        acc = 0
        for i in range(j, n, dim):
            acc = (acc * 31 + payload[i]) % 1_000_003
        out.append(acc / 1_000_003.0)
    return out


def _fake_acc_grid(live_payloads: list, dim: int):
    """INTEGER accumulator grid [n_live, dim] of the decode stub: the
    per-lane rolling hash acc = (acc*31 + byte) % p walks dim lanes in
    lock-step across ALL documents at once (one [docs, dim] numpy op
    per stride step, masked past each document's length — masking
    preserves the scalar semantics exactly, a padded 0 byte never
    touches the accumulator). The scalar path was the measured hot
    spot of the streaming pHash state query (a per-byte interpreted
    loop, ~0.3 ms/doc); this folds the same math into ~len/dim numpy
    steps per batch."""
    import numpy as np

    lens = np.array([len(p) for p in live_payloads], dtype=np.int64)
    max_len = int(lens.max()) if len(live_payloads) else 0
    steps = max(1, (max_len + dim - 1) // dim)
    buf = np.zeros((len(live_payloads), steps * dim), dtype=np.int64)
    for r, p in enumerate(live_payloads):
        if len(p):
            buf[r, : len(p)] = np.frombuffer(p, dtype=np.uint8)
    grid = buf.reshape(len(live_payloads), steps, dim)
    acc = np.zeros((len(live_payloads), dim), dtype=np.int64)
    lane = np.arange(dim, dtype=np.int64)
    p_mod = 1_000_003
    for t in range(steps):
        mask = (t * dim + lane)[None, :] < lens[:, None]
        np.copyto(acc, (acc * 31 + grid[:, t, :]) % p_mod, where=mask)
    return acc


def _fake_features_batch(payloads: list, dim: int = FEATURE_DIM) -> list:
    """Vectorized :func:`_fake_features` over a whole Arrow batch (see
    :func:`_fake_acc_grid` for the fold). None payloads stay None;
    empty ones yield the all-zero grid, both as in the scalar
    reference."""
    out: list = [None] * len(payloads)
    live = [(k, p) for k, p in enumerate(payloads) if p is not None]
    if not live:
        return out
    feats = _fake_acc_grid([p for _, p in live], dim) / 1_000_003.0
    for r, (k, _p) in enumerate(live):
        out[k] = feats[r]
    return out


def decode_features(
    df: DataFrame,
    payload_col: str = "payload",
    out_col: str = "features",
    fake: bool = False,
    batch_partitions: int | None = None,
    dim: int = FEATURE_DIM,
) -> DataFrame:
    """Decode + feature-extract over Arrow batches.

    Adds ``out_col: array<float>`` of length ``dim`` (a real decoder
    resizes to the requested grid — e.g. the 9x8 = 72-cell grayscale
    grid dHash wants; the stub samples the payload at stride ``dim``,
    same total byte work whatever the dim). With ``fake=False`` this
    raises at executor time (codec libs absent here) — the plumbing is
    what this module ships.
    """
    if not fake:
        raise NotImplementedError(
            "real media decode requires PIL/ffmpeg (not in this container); "
            "pass fake=True for the deterministic stub"
        )
    # the kernel references module-level code: make the package
    # importable on executor Python workers regardless of which query
    # ran first on this context
    from pmacct_spark.session import ship_package

    try:
        ship_package(df.sparkSession)
    except Exception:
        pass
    schema = StructType(
        df.schema.fields + [StructField(out_col, ArrayType(FloatType()))]
    )
    cols = df.columns

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = _fake_features_batch(
                [
                    bytes(p) if p is not None else None
                    for p in pdf[payload_col]
                ],
                dim,
            )
            yield pdf

    if batch_partitions:
        df = df.repartition(batch_partitions, "content_id")
    return df.mapInPandas(kernel, schema=schema)


def frame_sample(
    df: DataFrame,
    every_ms: int = 1000,
    payload_col: str = "payload",
    fake: bool = False,
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame
    (content_id, frame_idx, frame_ts_ms, features). Row-expanding
    mapInPandas — output batch larger than input, which Arrow handles
    natively (no explode of a materialized array needed)."""
    if not fake:
        raise NotImplementedError(
            "real frame sampling requires ffmpeg; pass fake=True for the stub"
        )
    schema = StructType(
        [
            StructField("content_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame_ts_ms", LongType()),
            StructField("features", ArrayType(FloatType())),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for cid, media, raw in zip(
                pdf["content_id"], pdf["media"], pdf[payload_col]
            ):
                dur = int(media["duration_ms"] or 0)
                payload = bytes(raw) if raw is not None else b""
                for k, ts in enumerate(range(0, max(dur, 1), every_ms)):
                    rows.append(
                        {
                            "content_id": cid,
                            "frame_idx": k,
                            "frame_ts_ms": ts,
                            "features": _fake_features(
                                payload[k % max(len(payload), 1):] if payload else b""
                            ),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.mapInPandas(kernel, schema=schema)


def media_table_from_documents(docs: DataFrame) -> DataFrame:
    """Build a synthetic media table from `documents` (text bytes as the
    opaque payload) — exercises the schema/partitioning end-to-end with
    real Arrow batches."""
    return docs.select(
        F.col("doc_id").alias("content_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.expr(
            "named_struct('kind', 'image', 'codec', 'fake', "
            "'width', CAST(n_chars AS INT), 'height', CAST(16 AS INT), "
            "'duration_ms', CAST(n_chars * 10 AS BIGINT), "
            "'sample_rate', CAST(0 AS INT))"
        ).alias("media"),
    )


# ---------------------------------------------------------------------------
# Perceptual-hash near-duplicate detection (the multimodal sibling of
# the text near-dup family in operators/dedup.py): dHash row-gradient
# bits over the decoded feature grid, then a banded Hamming-LSH join.
# A real deploy feeds this from PIL's 9x8 grayscale resize; here the
# grid comes from decode_features(dim=72)'s deterministic stub, so the
# DuckDB oracle replays every bit (same frozen-hash-family discipline
# as minhash / HLL).
# ---------------------------------------------------------------------------

DHASH_ROWS = 8
DHASH_COLS = 9  # 8 horizontal gradients per row -> 64-bit hash
# 16-bit slices; complete for Hamming <= 3 (pigeonhole). Band WIDTH is
# the scale lever: 8-bit bands (8 of them, complete to Hamming 7) have
# only 256 bucket values, so RANDOM-hash collisions alone grow as
# n^2/256 — measured 12.6x at a 10x scale-up. 16-bit bands make the
# bucket space 65536 and the same measurement linear; corpora past
# ~10^8 items should widen the hash itself (e.g. a 256-bit grid in 4
# bigint words, 32-bit bands) rather than narrow the bands.
PHASH_BANDS = 4


def _quant(features_col: str, i: int) -> str:
    """Grid cell as the exact integer the stub derived it from —
    comparing ints keeps Spark and the SQL oracle bit-identical
    (float32 order happens to match, but why rely on it)."""
    return (
        f"CAST(round(element_at({features_col}, {i + 1}) * 1000003) "
        "AS BIGINT)"
    )


def dhash64(
    df: DataFrame,
    features_col: str = "features",
    out_col: str = "phash",
    rows: int = DHASH_ROWS,
    cols: int = DHASH_COLS,
) -> DataFrame:
    """dHash: bit (r*(cols-1)+c) set iff grid[r][c] > grid[r][c+1] —
    row gradients of the rows x cols feature grid (features flattened
    row-major). Pure JVM column expression; one 64-bit integer per
    item, whatever the media size."""
    bits = []
    for r in range(rows):
        for c in range(cols - 1):
            i = r * cols + c
            bit = r * (cols - 1) + c
            bits.append(
                f"IF({_quant(features_col, i)} > {_quant(features_col, i + 1)}, "
                f"shiftleft(CAST(1 AS BIGINT), {bit}), CAST(0 AS BIGINT))"
            )
        # NB: no cross-row comparison — (r, cols-1) vs (r+1, 0) is not
        # a spatial gradient
    return df.withColumn(out_col, F.expr(" + ".join(bits)))


def decode_phash64(
    df: DataFrame,
    id_col: str = "content_id",
    payload_col: str = "payload",
    rows: int = DHASH_ROWS,
    cols: int = DHASH_COLS,
) -> DataFrame:
    """Decode + dHash fused into ONE Arrow kernel: (id, phash).

    Guide §4.1/§4.2 applied to the measured profile of the pHash
    queries — the decode_features -> dhash64 chain cost ~0.6 s per
    2.3k-doc batch, of which ~0.3 s was the 64-term JVM expression
    (128 element_at + round casts per row) and the rest the Arrow
    round-trip of columns dHash never needed (media struct, the
    features array shipped back to the JVM). The fused kernel crosses
    (id, payload) only and returns 16 bytes per row.

    Bit-exactness: dhash64's quant term CAST(round(f32 * 1000003) AS
    BIGINT) provably RECOVERS the integer accumulator the stub divided
    by 1000003 (acc < 2**20, float32 mantissa 24 bits -> |f*p - acc| <
    0.07), and the DuckDB oracle (_phash_expr_duck) compares those
    integer accs directly — so comparing the int64 grid in numpy IS
    the oracle's own arithmetic. NULL/empty payloads produce phash 0,
    exactly as dhash64-over-NULL-features summed 64 zero IF branches.
    Pinned by test_decode_phash64_matches_expression_chain."""
    from pyspark.sql.types import LongType, StructField, StructType

    from pmacct_spark.session import ship_package

    try:
        ship_package(df.sparkSession)
    except Exception:
        pass
    dim = rows * cols
    src = df.select(id_col, payload_col)

    def kernel(batches):
        import numpy as np
        import pyarrow as pa

        for rb in batches:
            if rb.num_rows == 0:
                continue
            payloads = rb.column(1).to_pylist()
            phash = np.zeros(rb.num_rows, dtype=np.uint64)
            live = [
                (k, p) for k, p in enumerate(payloads) if p is not None
            ]
            if live:
                acc = _fake_acc_grid([p for _, p in live], dim)
                ph = np.zeros(len(live), dtype=np.uint64)
                for r in range(rows):
                    for c in range(cols - 1):
                        i = r * cols + c
                        bit = r * (cols - 1) + c
                        ph |= (acc[:, i] > acc[:, i + 1]).astype(
                            np.uint64
                        ) << np.uint64(bit)
                phash[[k for k, _ in live]] = ph
            yield pa.RecordBatch.from_arrays(
                [
                    rb.column(0),
                    pa.array(phash.view(np.int64), type=pa.int64()),
                ],
                names=[id_col, "phash"],
            )

    out_schema = StructType(
        [src.schema.fields[0], StructField("phash", LongType())]
    )
    return src.mapInArrow(kernel, out_schema)


def phash_band_keys(
    hashed: DataFrame,
    id_col: str = "content_id",
    hash_col: str = "phash",
    bands: int = PHASH_BANDS,
) -> DataFrame:
    """(id, hash, bidx, bval): the banded Hamming-LSH key table — the
    64-bit hash sliced into ``bands`` equal bit-fields (pigeonhole-
    complete for Hamming <= bands-1, see :func:`phash_near_dup_pairs`).
    This is the per-batch index a streaming dedup persists and
    min-merges into its owner state."""
    width = 64 // bands
    mask = (1 << width) - 1
    # bind the hash ONCE as a lambda variable before slicing: when
    # hash_col is itself a wide expression (dhash64's 64-term sum), a
    # plain array(shiftright(h,0)&m, shiftright(h,16)&m, ...) lets
    # Catalyst inline that producer into every slice + the output
    # column (5 evaluations/row, interpreted under the generator) —
    # the projection-collapsing trap. transform()'s lambda var
    # evaluates it once.
    slices = (
        f"transform(array({hash_col}), ph -> transform("
        f"sequence(0, {bands - 1}), "
        f"b -> shiftright(ph, CAST(b AS INT) * {width}) & {mask}))[0]"
    )
    return hashed.select(
        F.col(id_col),
        F.col(hash_col),
        F.posexplode(F.expr(slices)).alias("bidx", "bval"),
    )


def phash_near_dup_pairs(
    hashed: DataFrame,
    id_col: str = "content_id",
    hash_col: str = "phash",
    bands: int = PHASH_BANDS,
    max_hamming: int = PHASH_BANDS - 1,
) -> DataFrame:
    """(doc_a, doc_b, hamming): pairs within ``max_hamming`` bits.

    Scale shape — same as the minhash band join (dedup.py): slice the
    64-bit hash into ``bands`` equal bit-fields; a pair with Hamming
    distance <= bands-1 differs in at most bands-1 slices, so at least
    one slice MATCHES (pigeonhole) — the banded equi-self-join is
    provably COMPLETE for max_hamming <= bands-1, costs ONE shuffle on
    (band_idx, band_value), and never goes all-pairs. Candidates then
    pass the exact bit_count(xor) filter."""
    if max_hamming > bands - 1:
        raise ValueError(
            f"banded join is only complete for max_hamming <= bands-1 "
            f"({bands - 1}), got {max_hamming}"
        )
    # materialization barrier: both sides of the banded self-join
    # would otherwise recompute the upstream lineage — which here is
    # the Arrow DECODE kernel, the single expensive stage. Staging the
    # 2-column (id, hash) table runs the decode ONCE; the join reads
    # staged parquet twice (operators/staging.py rationale).
    from pmacct_spark.operators.staging import stage

    hashed = stage(hashed.select(id_col, hash_col))
    width = 64 // bands
    mask = (1 << width) - 1
    slices = ", ".join(
        f"shiftright({hash_col}, {b * width}) & {mask}" for b in range(bands)
    )
    bl = hashed.select(
        F.col(id_col),
        F.col(hash_col),
        F.posexplode(F.expr(f"array({slices})")).alias("bidx", "bval"),
    )
    left = bl.select(
        F.col(id_col).alias("doc_a"), F.col(hash_col).alias("ha"),
        "bidx", "bval",
    )
    right = bl.select(
        F.col(id_col).alias("doc_b"), F.col(hash_col).alias("hb"),
        "bidx", "bval",
    )
    return (
        left.join(right, ["bidx", "bval"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.expr("CAST(bit_count(ha ^ hb) AS BIGINT)").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
