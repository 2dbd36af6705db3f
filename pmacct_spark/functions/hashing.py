"""Deterministic, engine-portable hashing for dedup/similarity ops.

Spark's ``xxhash64`` and DuckDB's ``hash`` disagree, so every hash used
by an oracle-gated operator is a polynomial rolling hash over character
codes, mod a 31-bit prime — expressible as higher-order functions in
both engines and exact in int64 at every step (acc < 2^30, *131 + 255
< 2^38).

For production-scale paths (where no cross-engine oracle is needed),
prefer ``F.xxhash64`` — it's one JVM intrinsic per row instead of a
per-character fold. Operators take a ``fast=`` flag for that.

MinHash permutation family: h_i(x) = (A[i] * x + B[i]) mod P — the
standard universal-hash construction; constants are fixed (seeded
offline) so plans and oracles agree forever.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

P = 1_000_000_007
MUL = 131

# 16 (a, b) pairs, generated once with random.Random(42), frozen here.
MINHASH_A = [
    329690530, 982063968, 51993047, 142379550, 939964347, 907754878,
    235569528, 655848561, 437904368, 313463746, 78518278, 223507624,
    304950615, 655214944, 640280713, 806694364,
]
MINHASH_B = [
    876966115, 671508445, 194704584, 769656836, 906800700, 690537074,
    76609293, 900678096, 309703454, 625787869, 227606906, 610892998,
    207579065, 470403779, 106666329, 304302897,
]


def poly_hash(col: str) -> Column:
    """Polynomial rolling hash of a string column (Spark side)."""
    return F.expr(poly_hash_spark_sql(col))


def poly_hash_spark_sql(col: str, idx: str = "i") -> str:
    """``idx`` prefixes the lambda variable — pick a fresh one when
    nesting inside another higher-order function.

    Folds over ``split(col, '')`` (one array, one lambda per char)
    rather than sequence+substr (two arrays, two lambdas per char):
    HOF lambdas are interpreted, not codegen'd, so halving the lambda
    count is ~5x wall-clock on hash-heavy pipelines. Same values.
    """
    return (
        f"aggregate(split({col}, ''), 0L, "
        f"(acc{idx}, c{idx}) -> (acc{idx} * {MUL} + ascii(c{idx})) % {P})"
    )


def poly_hash_duck_sql(col: str, idx: str = "i") -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(range(1, length({col}) + 1), "
        f"{idx} -> CAST(ascii(substr({col}, CAST({idx} AS INT), 1)) AS BIGINT))), "
        f"(acc, ch) -> (acc * {MUL} + ch) % {P})"
    )


def minhash_perm_sql(i: int, hash_expr: str) -> str:
    """h_i over a base-hash expression — identical text in both SQL
    dialects (pure int64 arithmetic: a*h < 2^30*2^30 = 2^60)."""
    return f"(({MINHASH_A[i]} * {hash_expr} + {MINHASH_B[i]}) % {P})"
