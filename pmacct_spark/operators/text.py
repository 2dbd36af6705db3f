"""Text-analysis operators for training-data pipelines: tokenization,
language ID, quality scoring, token counting, document fingerprinting.

Design rules for 100 TB:
  - everything is built-in column expressions (split/transform/
    aggregate/size) — JVM-side, codegen, no Python in the hot path;
  - scores are exact integer per-mille ratios (``x * 1000 DIV y``), not
    floats, so results are order-independent, hash-stable, and
    cross-engine reproducible;
  - per-doc work is linear in document length; nothing shuffles until
    the caller aggregates.

Each operator has a DuckDB renderer for the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pmacct_spark.functions.hashing import (
    MUL,
    P,
    poly_hash_duck_sql,
    poly_hash_spark_sql,
)

# Tiny English stopword list (enough for ratio features; a real deploy
# would broadcast a fuller set — the expression shape is identical).
STOPWORDS = ["the", "a", "an", "of", "to", "in", "is", "and", "for", "on"]

_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)


def tokens_expr(col: str) -> Column:
    """Whitespace tokenization of lowercased text."""
    return F.split(F.lower(F.col(col)), r"\s+")


def tokens_duck(col: str) -> str:
    return f"string_split_regex(lower({col}), '\\s+')"


def token_count(col: str) -> Column:
    return F.size(tokens_expr(col))


def distinct_token_count(col: str) -> Column:
    return F.size(F.array_distinct(tokens_expr(col)))


def stopword_permille(col: str) -> Column:
    """⌊1000 * stopword_tokens / tokens⌋ — exact integer feature."""
    toks = tokens_expr(col)
    stop = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    return F.expr(
        f"size(filter({_toks_sql(col)}, t -> t IN ({_STOP_SQL}))) * 1000 "
        f"DIV size({_toks_sql(col)})"
    )


def _toks_sql(col: str) -> str:
    return f"split(lower({col}), '\\\\s+')"


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add the quality-scoring feature columns:

    n_tokens, n_distinct (vocabulary), stop_pm (stopword per-mille),
    mean_tok_len_pm (mean token length, per-mille), uniq_pm (distinct/
    total per-mille). A downstream filter like ``stop_pm BETWEEN 20 AND
    600 AND n_tokens >= 50`` is the classic quality gate.
    """
    toks = _toks_sql(text_col)
    return (
        df.withColumn("n_tokens", F.expr(f"size({toks})"))
        .withColumn("n_distinct", F.expr(f"size(array_distinct({toks}))"))
        .withColumn(
            "stop_pm",
            F.expr(
                f"size(filter({toks}, t -> t IN ({_STOP_SQL}))) * 1000 "
                f"DIV size({toks})"
            ),
        )
        .withColumn(
            "mean_tok_len_pm",
            F.expr(
                f"aggregate({toks}, 0L, (a, t) -> a + length(t)) * 1000 "
                f"DIV size({toks})"
            ),
        )
        .withColumn(
            "uniq_pm",
            F.expr(f"size(array_distinct({toks})) * 1000 DIV size({toks})"),
        )
    )


def quality_features_duck(text_col: str = "text", source: str = "documents") -> str:
    """DuckDB SELECT mirroring :func:`quality_features` feature columns."""
    toks = f"string_split_regex(lower({text_col}), '\\s+')"
    return f"""
SELECT *,
  len(toks) AS n_tokens,
  len(list_distinct(toks)) AS n_distinct,
  len(list_filter(toks, t -> t IN ({_STOP_SQL}))) * 1000 // len(toks) AS stop_pm,
  CAST(list_sum(list_transform(toks, t -> length(t))) * 1000 // len(toks)
       AS BIGINT) AS mean_tok_len_pm,
  len(list_distinct(toks)) * 1000 // len(toks) AS uniq_pm
FROM (SELECT *, {toks} AS toks FROM {source})
"""


def lang_id(df: DataFrame, text_col: str = "text", out: str = "lang_pred") -> DataFrame:
    """Heuristic language ID: English if the stopword ratio clears a
    threshold (n-gram/stopword heuristic — the standard cheap LID
    baseline). Deterministic integer decision."""
    toks = _toks_sql(text_col)
    return df.withColumn(
        out,
        F.expr(
            f"CASE WHEN size(filter({toks}, t -> t IN ({_STOP_SQL}))) * 1000 "
            f"DIV size({toks}) >= 30 THEN 'en' ELSE 'unk' END"
        ),
    )


def fingerprint(df: DataFrame, text_col: str = "text", out: str = "fp") -> DataFrame:
    """Document fingerprint: polynomial rolling hash of the whole text
    (mod-prime; cross-engine exact). For scale-path fingerprinting use
    ``F.xxhash64`` instead (one intrinsic per row)."""
    return df.withColumn(out, F.expr(poly_hash_spark_sql(text_col)))


def fingerprint_duck(text_col: str = "text") -> str:
    return poly_hash_duck_sql(text_col)


def bpe_ish_token_count(df: DataFrame, text_col: str = "text", out: str = "n_bpe") -> DataFrame:
    """Sub-word-ish token count: words plus punctuation/digit splits via
    regex — the cheap stand-in for a BPE tokenizer's token count."""
    return df.withColumn(
        out,
        F.size(
            F.split(F.lower(F.col(text_col)), r"[\s]+|(?<=[a-z])(?=[0-9])")
        ),
    )


# ---------------------------------------------------------------------------
# PII-style redaction (beyond-reference pipeline op): scrub emails,
# IPv4 literals, and long digit runs from document text with pure JVM
# regexp_replace — per-row, zero shuffle, identical regex semantics in
# the DuckDB oracle.
# ---------------------------------------------------------------------------

PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}", "<IP>"),
    (r"\d{9,}", "<NUM>"),
)


def redact_pii(df: DataFrame, text_col: str = "text", out: str = "redacted") -> DataFrame:
    expr = F.col(text_col)
    for pat, repl in PII_PATTERNS:
        expr = F.regexp_replace(expr, pat, repl)
    return df.withColumn(out, expr)


def redact_pii_duck(text_col: str = "text") -> str:
    expr = text_col
    for pat, repl in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    return expr


# --- repetition / boilerplate signals (the Gopher-style repetition
#     rules used to drop templated or stuttering documents) ---------------

def repetition_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add exact integer repetition signals per document:

    - ``n_lines``: newline-split line count;
    - ``dup_line_pm``: per-mille of lines that are duplicates of an
      earlier line (templated/boilerplate detector);
    - ``top_bigram_pm``: per-mille of token bigrams occupied by the
      single most frequent bigram (stutter/keyword-spam detector).

    All built-in expressions — JVM-side and cross-engine exact. The
    bigram mode is array_sort + a run-length fold, O(n log n) per doc.
    Two formulation traps, both hit and fixed here: a naive
    distinct×filter mode is O(n²); and staging the token array in a
    helper column lets Catalyst's projection collapsing INLINE the
    split() into every array subscript (re-tokenizing the document per
    bigram element — O(n²) again, invisible in the logical plan). The
    token array is therefore bound ONCE as a lambda variable via
    transform(array(split(...)), t -> ...), which Catalyst cannot
    inline through."""
    toks = _toks_sql(text_col)
    # run-length fold over the SORTED bigrams of lambda-bound t: the
    # longest run is the mode's count
    top_bigram = (
        f"CAST(element_at(transform(array({toks}), t -> "
        "CASE WHEN size(t) >= 2 THEN "
        "aggregate("
        "  array_sort(transform(sequence(0, size(t) - 2), "
        "    i -> concat(t[i], ' ', t[i + 1]))), "
        "  struct('' AS prev, 0 AS run, 0 AS best), "
        "  (a, x) -> struct(x, "
        "    IF(x = a.prev, a.run + 1, 1), "
        "    GREATEST(a.best, IF(x = a.prev, a.run + 1, 1))), "
        "  a -> a.best) * 1000 DIV (size(t) - 1) "
        "ELSE 0 END), 1) AS INT)"
    )
    lines = f"split({text_col}, '\\n')"
    dup_line = (
        f"CAST(element_at(transform(array({lines}), l -> "
        "(size(l) - size(array_distinct(l))) * 1000 DIV size(l)), 1) AS INT)"
    )
    return (
        df.withColumn("n_lines", F.expr(f"size({lines})"))
        .withColumn("dup_line_pm", F.expr(dup_line))
        .withColumn("top_bigram_pm", F.expr(top_bigram))
    )


def repetition_duck(text_col: str = "text", source: str = "documents") -> str:
    """DuckDB replay of :func:`repetition_features` (the mode count
    uses a correlated unnest+GROUP BY — hash-linear per doc)."""
    return f"""
WITH __tk AS (
  SELECT *, string_split_regex(lower({text_col}), '\\s+') AS __t,
         string_split({text_col}, chr(10)) AS __lines
  FROM {source}
),
__bgx AS (
  SELECT *, CASE WHEN len(__t) >= 2 THEN
      list_transform(range(1, len(__t)), i -> __t[i] || ' ' || __t[i + 1])
    ELSE [] END AS __bg
  FROM __tk
)
SELECT * EXCLUDE (__t, __lines, __bg),
  len(__lines) AS n_lines,
  CAST((len(__lines) - len(list_distinct(__lines))) * 1000
       // len(__lines) AS INT) AS dup_line_pm,
  CAST(CASE WHEN len(__t) >= 2 THEN
    (SELECT MAX(c) FROM (
       SELECT COUNT(*) AS c FROM unnest(__bg) AS u(x) GROUP BY x
     )) * 1000 // (len(__t) - 1) ELSE 0 END AS INT) AS top_bigram_pm
FROM __bgx
"""
