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


# --- BM25 ranked keyword retrieval -----------------------------------
#
# Real BM25 machinery (postings, document frequency, length
# normalization, top-k per query) with one cross-engine twist: the
# scoring function is BM25's exact RATIONAL form. With k1 = 6/5 and
# b = 3/4, the term gain tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
# equals 44*tf*avgdl / (20*tf*avgdl + 6*avgdl + 18*dl) exactly, and the
# Robertson idf odds (N - df + 0.5)/(df + 0.5) equals
# (2N - 2df + 1)/(2df + 1) exactly — so the per-term score is a ratio
# of int64s, evaluated in 1e-6 fixed point with integer DIV. That keeps
# the oracle hash-exact (no ln(), no float summation order), while the
# ranking machinery is the production shape: the idf ln() is monotone
# per term, so single-term rankings are identical to textbook BM25 and
# multi-term rankings differ only in how term contributions weigh
# against each other.
#
# Scale shape (100 TB corpus): the corpus is scanned ONCE; query terms
# are applied as an array filter BEFORE the explode, so only matching
# postings ever shuffle; df and the global (N, avgdl) aggregate are
# tiny and broadcast. One shuffle builds postings, one ranks top-k.

BM25_QUERIES: list[tuple[int, list[str]]] = [
    (0, ["hash", "join"]),
    (1, ["window", "sort"]),
    (2, ["spark", "batch", "merge"]),
    (3, ["table", "scan"]),
]

_BM25_FP = 1_000_000

# exact-rational BM25 per-term gain at k1=6/5, b=3/4 (see block comment)
_BM25_TERM = (
    "((2 * n_docs - 2 * df + 1) * 44 * tf * avgdl * {fp}) DIV "
    "((2 * df + 1) * (20 * tf * avgdl + 6 * avgdl + 18 * dl))"
)


def bm25_topk(
    docs: DataFrame,
    queries: list[tuple[int, list[str]]] = BM25_QUERIES,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, doc_id, score, rank): BM25 top-k docs per query."""
    terms = sorted({t for _, ts in queries for t in ts})
    term_list = ", ".join(f"'{t}'" for t in terms)
    from pmacct_spark.operators.staging import stage_if_heavy

    # ONE corpus scan over a heavy corpus: stage the slim (doc_id, dl,
    # matched-tokens) projection — dl for every doc feeds the global
    # stats, the query-term-filtered token array feeds the postings.
    # Staging this row-linear-but-narrow projection (~tens of
    # bytes/doc) is far cheaper than re-scanning and re-tokenizing the
    # full text for the stats pass; below the size threshold the
    # re-tokenize is cheaper than the barrier (stage_if_heavy).
    slim = stage_if_heavy(
        docs.select(
            F.col(id_col).alias("doc_id"), tokens_expr(text_col).alias("tk")
        ).select(
            "doc_id",
            F.size("tk").cast("bigint").alias("dl"),
            # drop non-query tokens BEFORE the explode: at corpus scale
            # this is the difference between shuffling every token and
            # shuffling only the handful of matching postings
            F.expr(f"filter(tk, t -> t IN ({term_list}))").alias("mt"),
        ),
        docs,
    )
    # global corpus stats: one row, broadcast onto the postings
    stats = slim.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.expr("SUM(dl) DIV COUNT(*)").cast("bigint").alias("avgdl"),
    )
    postings = (
        slim.select("doc_id", "dl", F.explode("mt").alias("tok"))
        .groupBy("doc_id", "dl", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    return bm25_score_postings(postings, stats, queries, k)


def bm25_score_postings(
    postings: DataFrame,
    stats: DataFrame,
    queries: list[tuple[int, list[str]]] = BM25_QUERIES,
    k: int = 10,
) -> DataFrame:
    """Rank from a materialized postings table: (doc_id, dl, tok, tf)
    + a one-row (n_docs, avgdl) stats frame -> (query_id, doc_id,
    score, rank). Shared by the batch path above and the STREAMING
    index (stream_bm25_index), whose foreachBatch MERGE maintains the
    postings as versioned state — identical scoring, so the streaming
    replay hits the same DuckDB oracle."""
    from pyspark.sql.window import Window

    spark = postings.sparkSession
    qdf = spark.createDataFrame(
        [(qid, t) for qid, ts in queries for t in ts],
        "query_id BIGINT, tok STRING",
    )
    dfreq = postings.groupBy("tok").agg(
        F.count_distinct("doc_id").cast("bigint").alias("df")
    )
    scored = (
        postings.join(F.broadcast(qdf), "tok")
        .join(F.broadcast(dfreq), "tok")
        .join(F.broadcast(stats))
        .withColumn("term_fp", F.expr(_BM25_TERM.format(fp=_BM25_FP)))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("term_fp").cast("bigint").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        scored.withColumn(
            "rank", F.row_number().over(w).cast("bigint")
        )
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )


def bm25_topk_duck(
    queries: list[tuple[int, list[str]]] = BM25_QUERIES,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    source: str = "documents",
) -> str:
    """DuckDB replay of :func:`bm25_topk` (same fixed-point rational)."""
    qvals = ", ".join(
        f"({qid}, '{t}')" for qid, ts in queries for t in ts
    )
    terms = sorted({t for _, ts in queries for t in ts})
    term_list = ", ".join(f"'{t}'" for t in terms)
    term = _BM25_TERM.format(fp=_BM25_FP).replace(" DIV ", " // ")
    return f"""
WITH q(query_id, tok) AS (VALUES {qvals}),
base AS (
  SELECT {id_col} AS doc_id,
         string_split_regex(lower({text_col}), '\\s+') AS tk
  FROM {source}
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(tk)) // COUNT(*) AS BIGINT) AS avgdl
  FROM base
),
ex AS (
  SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl, unnest(tk) AS tok
  FROM base
),
postings AS (
  SELECT doc_id, dl, tok, CAST(COUNT(*) AS BIGINT) AS tf
  FROM ex WHERE tok IN ({term_list}) GROUP BY 1, 2, 3
),
dfreq AS (
  SELECT tok, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
  FROM postings GROUP BY 1
),
scored AS (
  SELECT CAST(q.query_id AS BIGINT) AS query_id, p.doc_id,
         CAST(SUM({term}) AS BIGINT) AS score
  FROM postings p
  JOIN q ON q.tok = p.tok
  JOIN dfreq d ON d.tok = p.tok
  CROSS JOIN stats
  GROUP BY 1, 2
)
SELECT query_id, doc_id, score,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY query_id
         ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
FROM scored QUALIFY rank <= {k}
"""


# ---------------------------------------------------------------------------
# BPE merge training (Sennrich et al. 2016) — the iterative loop whose
# per-round candidate table `bpe_pair_counts` already computes
# ---------------------------------------------------------------------------


def _bpe_train_merges_list(
    docs: DataFrame, text_col: str = "text", n_merges: int = 5
) -> list[tuple]:
    """Train the first ``n_merges`` BPE merges over a corpus: per
    round, count adjacent symbol pairs across the (count-weighted)
    word vocabulary, pick the most frequent pair (ties: lexicographic),
    and merge it left-to-right non-overlapping in every word.

    Returns (merge_rank, lhs, rhs, merged, pair_count) — the ordered
    merge table a tokenizer ships.

    Scale shape: the corpus is scanned ONCE (word histogram — one
    shuffle on the word key, vocabulary-bounded output); every round
    after that runs on the vocabulary table, not the corpus, exactly
    like a real BPE trainer. Per round: one vocabulary-bounded
    aggregation + a 1-row argmax pulled to the driver as a literal
    (the codebook-as-literal pattern of the IVF k-means trainer) + a
    map-side rewrite. Token strings carry each symbol as "(sym)", so
    the merge is a plain string replace — per-token delimiters make
    left-to-right replace exactly BPE's non-overlapping merge
    ("(a)(a)(a)" -> "(aa)(a)", never "(aa)(aa)" from shared
    boundaries; the zipped pair count still sees "aaa" as two (a,a)
    candidates, matching the reference algorithm).
    """
    from pmacct_spark.operators.staging import stage

    spark = docs.sparkSession
    # STAGED: each merge round triggers its own action, and without a
    # materialization barrier every round's lazy lineage would re-run
    # the corpus scan + histogram shuffle (round r would cost r extra
    # corpus passes). Staging the vocabulary-bounded histogram makes
    # "corpus scanned once" true across the whole loop.
    words = stage(
        docs.select(
            F.explode(
                F.split(F.lower(F.col(text_col)), "[^a-z]+")
            ).alias("w")
        )
        .filter("w <> ''")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    cur = words.select(
        "cnt",
        # native-regex per-char wrap (same rewrite as the apply pass)
        F.expr("regexp_replace(w, '(.)', '($1)')").alias("ts"),
    )
    merges: list[tuple] = []
    for rank in range(1, n_merges + 1):
        # bind the token array ONCE as a lambda var (projection-
        # collapse guard), guard 1-token words from sequence(1, 0)
        pairs = cur.select(
            "cnt",
            F.explode(
                F.expr(
                    "transform(array(split(replace(substring(ts, 2, "
                    "length(ts) - 2), ')(', ' '), ' ')), tk -> "
                    "CASE WHEN size(tk) < 2 THEN "
                    "  CAST(array() AS array<struct<l: string, r: string>>) "
                    "ELSE transform(sequence(1, size(tk) - 1), "
                    "  i -> struct(element_at(tk, i) AS l, "
                    "              element_at(tk, i + 1) AS r)) END)[0]"
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy("p.l", "p.r")
            .agg(F.sum("cnt").cast("bigint").alias("c"))
            .orderBy(F.desc("c"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        lhs, rhs, c = best[0]["l"], best[0]["r"], int(best[0]["c"])
        merges.append((rank, lhs, rhs, lhs + rhs, c))
        cur = cur.select(
            "cnt",
            F.expr(
                f"replace(ts, '({lhs})({rhs})', '({lhs}{rhs})')"
            ).alias("ts"),
        )
    return merges


def bpe_train_merges(
    docs: DataFrame, text_col: str = "text", n_merges: int = 5
) -> DataFrame:
    return docs.sparkSession.createDataFrame(
        _bpe_train_merges_list(docs, text_col=text_col, n_merges=n_merges),
        "merge_rank bigint, lhs string, rhs string, "
        "merged string, pair_count bigint",
    )


def bpe_train_merges_duck(
    n_merges: int = 5, source: str = "documents", text_col: str = "text"
) -> str:
    """Unrolled-CTE replay of :func:`bpe_train_merges` (the k-means-
    trainer oracle pattern): identical histogram, pair count, argmax
    tiebreak, and per-token-delimited replace per round."""
    parts = [
        f"""words AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
    SELECT unnest(string_split_regex(lower({text_col}), '[^a-z]+')) AS w
    FROM {source}) WHERE w <> '' GROUP BY 1
),
t0 AS (
  SELECT cnt, array_to_string(list_transform(range(1, length(w) + 1),
         i -> '(' || substr(w, i, 1) || ')'), '') AS ts
  FROM words
)"""
    ]
    for r in range(n_merges):
        parts.append(
            f"""tk{r} AS (
  SELECT cnt,
         string_split(replace(substr(ts, 2, length(ts) - 2), ')(', ' '),
                      ' ') AS tk
  FROM t{r}
),
pc{r} AS (
  SELECT tk[i] AS l, tk[i + 1] AS r, CAST(SUM(cnt) AS BIGINT) AS c
  FROM tk{r}, unnest(range(1, len(tk))) AS u(i) GROUP BY 1, 2
),
b{r} AS (SELECT l, r, c FROM pc{r} ORDER BY c DESC, l ASC, r ASC LIMIT 1),
t{r + 1} AS (
  SELECT cnt, replace(ts, '(' || b.l || ')(' || b.r || ')',
                      '(' || b.l || b.r || ')') AS ts
  FROM t{r}, b{r} AS b
)"""
        )
    sel = " UNION ALL ".join(
        f"SELECT {r + 1} AS merge_rank, l AS lhs, r AS rhs, "
        f"l || r AS merged, c AS pair_count FROM b{r}"
        for r in range(n_merges)
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT CAST(merge_rank AS BIGINT) AS merge_rank, lhs, rhs, merged,
       pair_count
FROM ({sel})"""
    )


def bpe_apply_token_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Tokenize every document with an already-trained ordered BPE
    merge list: per doc, words wrap as "(c)(h)(a)(r)" strings joined
    by spaces (the space breaks "(l)(r)" patterns at word boundaries,
    so merges never cross words), then the merges apply as a CHAIN of
    plain string replaces in training order — each replace IS the
    left-to-right non-overlapping merge (see bpe_train_merges). Token
    count falls out as the count of '(' delimiters. Pure JVM, zero
    shuffles: tokenization is embarrassingly parallel, which is the
    whole point at 100 TB — the merge table is driver-side literals
    exactly like a shipped tokenizer's vocab file."""
    # per-char wrap via native JVM regex: one pass per word instead of
    # the interpreted sequence/substring/concat fold (~2x on the scan,
    # measured; byte-identical output on the [a-z]+ word alphabet)
    wrapped = (
        "concat_ws(' ', transform("
        f"  filter(split(lower({text_col}), '[^a-z]+'), w -> w <> ''), "
        "  w -> regexp_replace(w, '(.)', '($1)')))"
    )
    applied = wrapped
    for lhs, rhs in merges:
        applied = f"replace({applied}, '({lhs})({rhs})', '({lhs}{rhs})')"

    # bind each string once as a lambda var: the '(' count reads it
    # twice and inlining the whole replace chain per read would double
    # the work (the projection-collapse trap)
    def count_tokens(expr: str) -> str:
        return (
            f"transform(array({expr}), "
            "s -> length(s) - length(replace(s, '(', '')))[0]"
        )

    return docs.withColumn(
        "n_tokens", F.expr(count_tokens(applied)).cast("bigint")
    ).withColumn(
        "n_base_tokens", F.expr(count_tokens(wrapped)).cast("bigint")
    )


def bpe_train_apply_counts(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 5,
    group_col: str = "lang",
) -> DataFrame:
    """Train ``n_merges`` BPE merges, then tokenize the corpus with
    them: per ``group_col``, document count, post-merge token count
    and base (character) token count — the compression a tokenizer
    evaluation reports. The merge table is tiny driver-side state
    (it already materialized during training); the apply pass is one
    map-side scan."""
    # the trainer's merge table IS driver-side state already (each
    # round's argmax was collected as a literal) — round-tripping it
    # through createDataFrame + orderBy + collect was a ~0.6 s no-op
    merges = [
        (lhs, rhs)
        for _, lhs, rhs, _, _ in _bpe_train_merges_list(
            docs, text_col=text_col, n_merges=n_merges
        )
    ]
    tok = bpe_apply_token_counts(docs, merges, text_col=text_col)
    return tok.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.sum("n_base_tokens").cast("bigint").alias("n_base_tokens"),
    )


def bpe_apply_duck(
    n_merges: int = 5,
    source: str = "documents",
    text_col: str = "text",
    group_col: str = "lang",
) -> str:
    """Unrolled replay of :func:`bpe_train_apply_counts`: the training
    CTEs of :func:`bpe_train_merges_duck` plus a chained-replace apply
    over per-word wrapped token strings."""
    train = bpe_train_merges_duck(n_merges, source, text_col)
    ctes = train[len("WITH ") : train.rindex("\nSELECT ")]
    wrapped = (
        "array_to_string(list_transform("
        f"  list_filter(string_split_regex(lower({text_col}), '[^a-z]+'),"
        "   w -> w <> ''), "
        "  w -> array_to_string(list_transform(range(1, length(w) + 1), "
        "       i -> '(' || substr(w, i, 1) || ')'), '')), ' ')"
    )
    applied = wrapped
    for r in range(n_merges):
        applied = (
            f"replace({applied}, "
            f"'(' || b{r}.l || ')(' || b{r}.r || ')', "
            f"'(' || b{r}.l || b{r}.r || ')')"
        )
    joins = ", ".join(f"b{r}" for r in range(n_merges))
    return f"""WITH {ctes},
doc_tok AS (
  SELECT {group_col},
         {applied} AS ts,
         {wrapped} AS base_ts
  FROM {source}, {joins}
)
SELECT {group_col}, COUNT(*) AS docs,
       CAST(SUM(length(ts) - length(replace(ts, '(', ''))) AS BIGINT)
         AS n_tokens,
       CAST(SUM(length(base_ts) - length(replace(base_ts, '(', '')))
         AS BIGINT) AS n_base_tokens
FROM doc_tok GROUP BY 1"""
