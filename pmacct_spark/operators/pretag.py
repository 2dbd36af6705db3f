"""pre_tag_map rules engine: ordered match rules -> tag/tag2/label.

The reference's pre_tag_map is an ordered table of rules (struct
id_entry, reference src/pretag.h:224-243; evaluation src/pretag.c:1117;
~60 matchable keys, src/pretag.h:37-108). Semantics:

  - rules evaluate in order; the first full match sets tag/tag2/label
    and evaluation STOPS — unless the matched rule has
  - ``jeq <label>``: jump (forward only) to the rule tagged with that
    ``label=`` and continue matching from there;
  - ``stack=sum|or``: when a later rule matches after a jeq, compose
    its tag with the accumulated one (sum or bitwise-or) instead of
    overwriting;
  - per-key negation (``key!=value``).

Spark-first compilation: the rule graph is static config, so we
enumerate every execution path at plan-build time (jeq is forward-only,
hence a DAG) and emit one flat CASE/COALESCE chain of column
expressions — fully JVM-side, no UDF, Catalyst-foldable. This is the
same trick the reference's ``maps_index`` plays (pre-compiled hash
indexes, src/pretag.c:126) taken to its logical end.

A rule's ``match`` is a dict: column -> value, (op, value), or
("!=", value). Values may be lists (OR within the key).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Rule:
    match: dict[str, object] = field(default_factory=dict)
    set_tag: int | None = None
    set_tag2: int | None = None
    set_label: str | None = None
    label: str | None = None  # entry label (jeq target)
    jeq: str | None = None  # forward jump target label
    stack: str | None = None  # 'sum' | 'or' composition


def _key_cond(col: str, spec: object) -> Column:
    if isinstance(spec, tuple) and len(spec) == 2 and isinstance(spec[0], str):
        op, v = spec
        c = F.col(col)
        # lazy dispatch: a dict literal would evaluate EVERY branch,
        # and isin(list(v)) raises for scalar v before the lookup
        ops = {
            "=": lambda: c == v,
            "!=": lambda: c != v,
            ">": lambda: c > v,
            ">=": lambda: c >= v,
            "<": lambda: c < v,
            "<=": lambda: c <= v,
            "in": lambda: c.isin(list(v)),
            "not in": lambda: ~c.isin(list(v)),
            # ("range", (lo, hi)): closed-interval match — the
            # sample_type=flow collapse (any traffic code point
            # PM_FTYPE_TRAFFIC..PM_FTYPE_TRAFFIC_MAX, reference
            # pretag_sample_type_handler src/pretag_handlers.c:2327)
            "range": lambda: c.between(v[0], v[1]),
            "not range": lambda: ~c.between(v[0], v[1]),
            # ("cidr", (net_int, masklen)): prefix-match a dotted-quad
            # exporter address (reference pre_tag_map ip= handler)
            "cidr": lambda: F.expr(
                f"(CAST(split({col}, '\\\\.')[0] AS BIGINT) * 16777216"
                f" + CAST(split({col}, '\\\\.')[1] AS BIGINT) * 65536"
                f" + CAST(split({col}, '\\\\.')[2] AS BIGINT) * 256"
                f" + CAST(split({col}, '\\\\.')[3] AS BIGINT))"
                f" DIV {1 << (32 - v[1])}"
            ) == (v[0] >> (32 - v[1])) if v[1] else F.lit(True),
        }
        return ops[op]()
    if isinstance(spec, (list, set, tuple)):
        return F.col(col).isin(list(spec))
    return F.col(col) == spec


def _rule_cond(rule: Rule) -> Column:
    cond = F.lit(True)
    for col, spec in rule.match.items():
        cond = cond & _key_cond(col, spec)
    return cond


def _paths(rules: list[Rule]) -> list[tuple[list[tuple[int, bool]], list[int]]]:
    """Enumerate execution paths.

    Returns a list of (trace, matched) pairs: ``trace`` is the ordered
    list of (rule_idx, matched?) decisions that uniquely identify the
    path, ``matched`` the rule indices whose set_* apply (in order).
    """
    label_pos = {r.label: i for i, r in enumerate(rules) if r.label}
    out: list[tuple[list[tuple[int, bool]], list[int]]] = []

    def walk(i: int, trace: list[tuple[int, bool]], matched: list[int]):
        if i >= len(rules):
            out.append((trace, matched))
            return
        r = rules[i]
        # branch: rule matches
        m_trace = trace + [(i, True)]
        m_matched = matched + [i]
        if r.jeq:
            nxt = label_pos.get(r.jeq)
            if nxt is None or nxt <= i:
                raise ValueError(f"jeq {r.jeq!r}: unknown or non-forward label")
            walk(nxt, m_trace, m_matched)
        else:
            out.append((m_trace, m_matched))  # first-match stop
        # branch: rule does not match -> next rule
        walk(i + 1, trace + [(i, False)], matched)

    walk(0, [], [])
    return out


def compile_rules(
    rules: list[Rule],
    tag_out: str = "tag",
    tag2_out: str = "tag2",
    label_out: str | None = None,
    default_tag: int = 0,
) -> dict[str, Column]:
    """Compile the ruleset to output column expressions."""
    conds = [_rule_cond(r) for r in rules]
    paths = _paths(rules)

    def path_cond(trace: list[tuple[int, bool]]) -> Column:
        c = F.lit(True)
        for idx, matched in trace:
            c = c & (conds[idx] if matched else ~conds[idx])
        return c

    def fold_tag(matched: list[int], getter, default: int) -> int | None:
        acc: int | None = None
        for i in matched:
            v = getter(rules[i])
            if v is None:
                continue
            if acc is None or rules[i].stack is None:
                acc = v
            elif rules[i].stack == "sum":
                acc = acc + v
            elif rules[i].stack == "or":
                acc = acc | v
            else:
                raise ValueError(f"unknown stack {rules[i].stack!r}")
        return acc

    def build(getter, default: int | str | None) -> Column:
        expr: Column = F.lit(default)
        # later whens win in when-chains, so build from the last path
        # backwards; semantically paths are disjoint so order is moot.
        chain = None
        for trace, matched in paths:
            val = fold_tag(matched, getter, 0)
            if val is None:
                val = default
            branch_cond = path_cond(trace)
            chain = (
                F.when(branch_cond, F.lit(val))
                if chain is None
                else chain.when(branch_cond, F.lit(val))
            )
        return chain.otherwise(F.lit(default)) if chain is not None else expr

    out = {
        tag_out: build(lambda r: r.set_tag, default_tag),
        tag2_out: build(lambda r: r.set_tag2, default_tag),
    }
    if label_out:
        out[label_out] = build(lambda r: r.set_label, None)
    return out


def apply_pretag(
    df: DataFrame,
    rules: list[Rule],
    tag_out: str = "tag",
    tag2_out: str = "tag2",
    label_out: str | None = None,
) -> DataFrame:
    """Apply the compiled ruleset — adds tag/tag2(/label) columns
    (find_id analogue, reference src/pretag.c:1117)."""
    for name, col in compile_rules(rules, tag_out, tag2_out, label_out).items():
        df = df.withColumn(name, col)
    return df


def label_filter_keep(entries: list[str], label_col: str = "label") -> Column:
    """pre_tag_label_filter (CONFIG-KEYS:2327) as one boolean column —
    a faithful compile of evaluate_labels_v2 (reference
    src/util.c:2289, consulted from the plugin channel gate
    src/plugin_hooks.c:452):

      - the record's label is a comma-separated token SET; an entry
        matches when any token equals it exactly;
      - an unlabelled record evaluates as the single token 'null'
        (so the documented 'null' keyword matches it);
      - entries evaluate in order: a matching positive entry delivers;
        the FIRST negated entry always decides (match -> drop,
        non-match -> deliver — the reference returns on a negated
        entry either way, making later entries unreachable);
      - a filter exhausted without a decision drops the record.
    """
    eff = F.when(
        F.col(label_col).isNull() | (F.col(label_col) == ""),
        F.lit("null"),
    ).otherwise(F.col(label_col))
    tokens = F.split(eff, ",")
    chain = None

    def when(cond: Column, val: bool):
        nonlocal chain
        lit = F.lit(val)
        chain = F.when(cond, lit) if chain is None else chain.when(cond, lit)

    for raw in entries:
        neg = raw.startswith("-")
        val = raw[1:] if neg else raw
        m = F.array_contains(tokens, val)
        if neg:
            when(m, False)
            # a non-matching negated entry delivers immediately;
            # later entries are unreachable in the reference walk
            return chain.otherwise(F.lit(True))
        when(m, True)
    if chain is None:  # empty filter: routing disabled, deliver all
        return F.lit(True)
    return chain.otherwise(F.lit(False))


def duck_case_sql(
    rules: list[Rule], getter_attr: str = "set_tag", default: int = 0
) -> str:
    """Render the equivalent flat CASE expression in ANSI SQL (DuckDB
    oracle). Only exact-match / in-list / != specs are rendered."""

    def key_sql(col: str, spec: object) -> str:
        if isinstance(spec, tuple) and isinstance(spec[0], str):
            op, v = spec
            if op in ("in", "not in"):
                vals = ", ".join(_sql_lit(x) for x in v)
                return f"{col} {op.upper()} ({vals})"
            if op == "range":
                return f"{col} BETWEEN {_sql_lit(v[0])} AND {_sql_lit(v[1])}"
            if op == "not range":
                return (
                    f"{col} NOT BETWEEN {_sql_lit(v[0])} AND {_sql_lit(v[1])}"
                )
            return f"{col} {op} {_sql_lit(v)}"
        if isinstance(spec, (list, set, tuple)):
            vals = ", ".join(_sql_lit(x) for x in spec)
            return f"{col} IN ({vals})"
        return f"{col} = {_sql_lit(spec)}"

    conds = [
        " AND ".join(key_sql(c, s) for c, s in r.match.items()) or "TRUE"
        for r in rules
    ]
    paths = _paths(rules)
    whens = []
    for trace, matched in paths:
        parts = [
            (conds[i] if ok else f"NOT ({conds[i]})") for i, ok in trace
        ]
        acc = None
        for i in matched:
            v = getattr(rules[i], getter_attr)
            if v is None:
                continue
            if acc is None or rules[i].stack is None:
                acc = v
            elif rules[i].stack == "sum":
                acc = acc + v
            elif rules[i].stack == "or":
                acc = acc | v
        if acc is None:
            acc = default
        whens.append(f"WHEN ({' AND '.join(parts)}) THEN {_sql_lit(acc)}")
    return "CASE " + " ".join(whens) + f" ELSE {_sql_lit(default)} END"


def _sql_lit(v: object) -> str:
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return str(v)
