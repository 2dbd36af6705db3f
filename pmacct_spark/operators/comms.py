"""BGP community pattern filters (bgp_stdcomm_pattern /
bgp_extcomm_pattern / bgp_lrgcomm_pattern and the *_pattern_to_asn
variants — reference evaluate_comm_patterns src/bgp/bgp_util.c:1014,
copy_stdcomm_to_asn/:1156 copy_lrgcomm_to_asn/:1174;
CONFIG-KEYS:2872-2894).

Reference semantics, reproduced exactly:

- A pattern is matched by SUBSTRING search (strstr) against the
  space-separated community string: ``12345:64`` matches communities
  whose text CONTAINS it — values 64, 640-649, 6400-6499, 64000-64999
  (CONFIG-KEYS:2878). What is emitted is the text from the match
  position to the end of the community token (strstr position -> next
  space), so a mid-token match emits a token SUFFIX.
- ``.`` wildcards exactly one character: the emitted candidate (match
  position to token end) must have the SAME length as the pattern and
  agree with it on every non-dot position. Crucially, a dot-pattern
  tests only the FIRST occurrence of its literal prefix in the whole
  string: if that candidate fails the length/mask test the pattern
  gives up entirely — later tokens that would pass are NOT emitted
  (the ``ptr = NULL`` with no find_again in bgp_util.c:1041-1048).
- Matches of one pattern repeat across tokens (the find_again loop
  resumes after the emitted token). Multiple comma-separated patterns
  run in order; all emissions join with single spaces.
- *_pattern_to_asn: the FIRST emitted community splits at ``:``; part
  one maps to the peer-AS field, part two to the origin-AS field
  (atoi stops at the next non-digit, so a large community's third
  part is ignored — matching the reference's strtoul behavior).

Both engines implement the same token fold independently: Spark as an
``aggregate()`` higher-order function over ``split(col, ' ')`` (JVM
whole-stage codegen, no Python), DuckDB as ``list_reduce`` with the
state carried in a flag-prefixed string (:func:`comm_pattern_duck`).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _sq(s: str) -> str:
    """Escape a pattern for embedding in a single-quoted SQL literal."""
    return s.replace("\\", "\\\\").replace("'", "''")


def split_patterns(spec: str) -> list[str]:
    """Comma-separated config value -> pattern list (CONFIG-KEYS:2880
    'Multiple patterns can be supplied comma-separated')."""
    return [p.strip() for p in str(spec).split(",") if p.strip()]


def _mask_checks(pattern: str, cand: str) -> list[str]:
    """SQL equality conditions for the non-dot runs of ``pattern``
    against the candidate expression ``cand`` (1-based substr)."""
    checks = []
    i = 0
    while i < len(pattern):
        if pattern[i] == ".":
            i += 1
            continue
        j = i
        while j < len(pattern) and pattern[j] != ".":
            j += 1
        seg = pattern[i:j]
        checks.append(
            f"substr({cand}, {i + 1}, {len(seg)}) = '{_sq(seg)}'"
        )
        i = j
    return checks or ["true"]


def _one_pattern_sql(src: str, pattern: str) -> str:
    """SQL (Spark dialect) emitting the space-joined matches of ONE
    pattern against the community string ``src`` via the token fold."""
    prefix = pattern.split(".", 1)[0]
    has_dot = "." in pattern
    p_lit = _sq(prefix)
    # the emitted candidate: from the first occurrence of the literal
    # prefix inside the token to the token's end
    cand = f"substr(t, instr(t, '{p_lit}'))"
    emit = (
        "struct(concat(s.acc, CASE WHEN s.acc = '' THEN '' ELSE ' ' "
        f"END, {cand}) AS acc, s.stopped AS stopped)"
    )
    if not has_dot:
        step = f"""CASE
          WHEN s.stopped THEN s
          WHEN instr(t, '{p_lit}') = 0 THEN s
          ELSE {emit} END"""
    else:
        ok = " AND ".join(
            [f"length({cand}) = {len(pattern)}"]
            + _mask_checks(pattern, cand)
        )
        step = f"""CASE
          WHEN s.stopped THEN s
          WHEN instr(t, '{p_lit}') = 0 THEN s
          WHEN {ok} THEN {emit}
          ELSE struct(s.acc AS acc, true AS stopped) END"""
    return (
        f"aggregate(split({src}, ' '), "
        "struct(CAST('' AS STRING) AS acc, false AS stopped), "
        f"(s, t) -> {step}, s -> s.acc)"
    )


def comm_pattern_sql(src: str, patterns: list[str]) -> str:
    """Spark SQL expression: ``src`` filtered by ``patterns``, all
    emissions joined with single spaces in pattern order."""
    if not patterns:
        return src
    parts = ", ".join(
        f"nullif({_one_pattern_sql(src, p)}, '')" for p in patterns
    )
    return f"concat_ws(' ', {parts})"


def comm_pattern_col(src: str, patterns: list[str]) -> Column:
    return F.expr(comm_pattern_sql(src, patterns))


def comm_to_asn_cols(filtered: str) -> tuple[Column, Column]:
    """(peer_asn, origin_asn) from the FIRST filtered community:
    ``XXXXX:YYYYY`` -> Peer-AS=XXXXX, Origin-AS=YYYYY
    (copy_stdcomm_to_asn src/bgp/bgp_util.c:1156; a large community's
    third field is ignored, :1174). No match -> 0, the untouched
    ``as_t`` the reference leaves behind."""
    tok = f"split_part({filtered}, ' ', 1)"
    peer = (
        f"coalesce(try_cast(split_part({tok}, ':', 1) AS BIGINT), 0)"
    )
    origin = (
        f"coalesce(try_cast(split_part({tok}, ':', 2) AS BIGINT), 0)"
    )
    return F.expr(peer), F.expr(origin)


# --- DuckDB twin -----------------------------------------------------------

def _one_pattern_duck(src: str, pattern: str) -> str:
    """The same token fold for DuckDB: list_reduce with the state as a
    flag-prefixed string ('0|<acc>' running, '1|<acc>' stopped)."""
    prefix = pattern.split(".", 1)[0]
    has_dot = "." in pattern
    p_lit = _sq(prefix)
    cand = f"t[strpos(t, '{p_lit}'):]"
    emit = (
        "('0|' || substr(a, 3) || "
        f"(CASE WHEN length(a) > 2 THEN ' ' ELSE '' END) || {cand})"
    )
    if not has_dot:
        step = f"""CASE
          WHEN a[1] = '1' THEN a
          WHEN strpos(t, '{p_lit}') = 0 THEN a
          ELSE {emit} END"""
    else:
        ok = " AND ".join(
            [f"length({cand}) = {len(pattern)}"]
            + _mask_checks(pattern, cand)
        )
        step = f"""CASE
          WHEN a[1] = '1' THEN a
          WHEN strpos(t, '{p_lit}') = 0 THEN a
          WHEN {ok} THEN {emit}
          ELSE '1|' || substr(a, 3) END"""
    return (
        f"substr(list_reduce(list_prepend('0|', "
        f"str_split({src}, ' ')), (a, t) -> {step}), 3)"
    )


def comm_pattern_duck(src: str, patterns: list[str]) -> str:
    if not patterns:
        return src
    parts = ", ".join(
        f"nullif({_one_pattern_duck(src, p)}, '')" for p in patterns
    )
    return f"concat_ws(' ', {parts})"


def comm_to_asn_duck(filtered: str) -> tuple[str, str]:
    tok = f"split_part({filtered}, ' ', 1)"
    return (
        f"coalesce(try_cast(split_part({tok}, ':', 1) AS BIGINT), 0)",
        f"coalesce(try_cast(split_part({tok}, ':', 2) AS BIGINT), 0)",
    )


def first_asn_sql(col: str, skip_subas: bool = False) -> str:
    """evaluate_first_asn (src/bgp/bgp_util.c:1087) as a SQL
    expression: the peer-AS source (peer_src_as / peer_dst_as from the
    path's first hop). strtoul semantics — leading digits of the first
    token, a leading '(' (confed sub-AS) stripped, 0 when non-numeric
    (an AS_SET '{...}' first segment yields 0, like the reference).

    ``skip_subas`` replays bgp_peer_as_skip_subas (CONFIG-KEYS): the
    first token NOT starting with '(' is reported — including the
    reference's quirk that inside a multi-AS confed segment the
    SECOND sub-AS (no leading paren on its token) satisfies the walk —
    falling back to the first sub-AS when the whole path is
    confederated or the candidate parses to 0."""
    first_tok = f"try_element_at(split({col}, ' '), 1)"
    first_num = (
        f"coalesce(try_cast(regexp_extract({first_tok},"
        " '^\\\\(?([0-9]+)', 1) AS BIGINT), 0)"
    )
    if not skip_subas:
        return first_num
    cand_tok = (
        f"try_element_at(filter(split({col}, ' '),"
        " t -> substring(t, 1, 1) <> '('), 1)"
    )
    cand = (
        f"coalesce(try_cast(regexp_extract({cand_tok},"
        " '^([0-9]+)', 1) AS BIGINT), 0)"
    )
    return f"CASE WHEN {cand} > 0 THEN {cand} ELSE {first_num} END"


def last_asn_sql(col: str) -> str:
    """evaluate_last_asn (src/bgp/bgp_util.c:1080): the origin AS —
    the LAST ASN that appears anywhere in the rendered path (the
    reference's last_as is updated across every segment type, so a
    trailing '{64512,64513}' set yields 64513)."""
    return (
        f"coalesce(try_cast(regexp_extract({col},"
        " '([0-9]+)[^0-9]*$', 1) AS BIGINT), 0)"
    )
