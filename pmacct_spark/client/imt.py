"""In-memory-table (IMT) serving layer: pmacct client query semantics
over an aggregated DataFrame.

The reference keeps aggregates in a shared-memory hash table queried over
a UNIX socket (reference src/imt_plugin.c:41,235; src/server.c:31-480).
Query language reproduced here (reference QUICKSTART:878-928,
src/pmacct.c:89-121):

    -s            full-table stats            -> ``stats()``
    -M <spec>     match, full rows            -> ``match(spec)``
    -N <spec>     match, counters only        -> ``match(spec, counters_only=True)``
    spec grammar  comma-separated values, one per key primitive in
                  ``-c`` order; ``*`` wildcards a field; ``;`` separates
                  OR'd specs (server-side masked scan,
                  src/server.c:363-430); ``file:<path>`` reads specs
                  from a file (one per line)
    -S            sum counters across matches -> ``sum_matches=True``
                  (Accumulate_Counters, src/server.c:386,432)
    -T <c>,<N>    top-N by counter            -> ``topn()``
                  (client_counters_merge_sort, src/pmacct.c:3152)
    -r            reset counters after read   -> ``reset_after=True``
    -e            erase the whole table       -> ``erase()``

Spark-first shape: the table is a cached DataFrame (the engine's analog
of the shared-memory segment); match specs compile to one Catalyst
boolean expression, so a point lookup is a pruned scan over the cache —
the reference's crc32 point lookup (src/server.c:237-335) relies on a
hash index, which Spark answers with predicate-pushdown over the
in-memory columnar cache instead. Reset/erase are implemented as
overlay recomputation on the cached plan (the serving layer owns that
state, like the IMT process owns its segment).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _parse_specs(spec: str | list[str]) -> list[list[str]]:
    """`';'`-separated OR-list of comma-separated per-field values."""
    if isinstance(spec, str):
        if spec.startswith("file:"):
            with open(spec[5:], encoding="utf-8") as fh:
                parts = [ln.strip() for ln in fh if ln.strip()]
        else:
            parts = [p for p in spec.split(";") if p.strip()]
    else:
        parts = list(spec)
    return [[v.strip() for v in p.split(",")] for p in parts]


def compile_match(keys: list[str], spec: str | list[str]) -> F.Column:
    """Compile a pmacct match spec into one boolean Column.

    Each OR'd alternative is an AND over the key primitives in ``keys``
    order; ``*`` skips the field (wildcard). Values compare against the
    key column cast to string, matching the client's text protocol.
    """
    alts = []
    for values in _parse_specs(spec):
        if len(values) != len(keys):
            raise ValueError(
                f"match spec has {len(values)} fields, key set has {len(keys)}"
            )
        conds = [
            F.col(k).cast("string") == F.lit(v)
            for k, v in zip(keys, values)
            if v != "*"
        ]
        alt = conds[0] if conds else F.lit(True)
        for c in conds[1:]:
            alt = alt & c
        alts.append(alt)
    out = alts[0]
    for a in alts[1:]:
        out = out | a
    return out


class ImtTable:
    """A served aggregate table with pmacct client query semantics.

    ``df`` must contain ``keys`` plus ``counters`` columns. The table is
    cached on first query (the IMT segment analog); ``reset``/``erase``
    swap in an overlaid plan and re-cache.
    """

    def __init__(self, df: DataFrame, keys: list[str], counters: list[str]):
        self.keys = list(keys)
        self.counters = list(counters)
        self._df = df.cache()

    @property
    def df(self) -> DataFrame:
        return self._df

    # -- -s -----------------------------------------------------------
    def stats(self) -> DataFrame:
        """Full-table scan (WANT_STATS, src/server.c:160-215)."""
        return self._df

    # -- -M / -N / -S -------------------------------------------------
    def match(
        self,
        spec: str | list[str],
        counters_only: bool = False,
        sum_matches: bool = False,
        reset_after: bool = False,
    ) -> DataFrame:
        pred = compile_match(self.keys, spec)
        hit = self._df.filter(pred)
        if sum_matches:
            out = hit.agg(
                *[F.sum(c).alias(c) for c in self.counters]
            )
        elif counters_only:
            out = hit.select(*self.counters)
        else:
            out = hit
        if reset_after:
            # WANT_RESET (-r): zero matched counters after serving.
            # Materialize the answer first, then swap the cache.
            out = out.localCheckpoint(eager=True)
            self._swap(
                self._df.withColumns(
                    {
                        c: F.when(pred, F.lit(0)).otherwise(F.col(c))
                        for c in self.counters
                    }
                )
            )
        return out

    # -- -t -----------------------------------------------------------
    def status(self) -> DataFrame:
        """WANT_STATUS (-t): table health summary (the reference prints
        hash-bucket/chain stats, src/server.c:216-235; the columnar
        analogue is entry count + counter totals)."""
        return self._df.agg(
            F.count(F.lit(1)).alias("entries"),
            *[F.sum(c).alias(f"total_{c}") for c in self.counters],
        )

    # -- -T -----------------------------------------------------------
    def topn(self, counter: str, n: int) -> DataFrame:
        order = [F.desc(counter)] + [F.asc(k) for k in self.keys]
        return self._df.orderBy(*order).limit(n)

    # -- -e -----------------------------------------------------------
    def erase(self) -> None:
        """WANT_ERASE: drop every entry (src/server.c:216-235)."""
        self._swap(self._df.limit(0))

    def _swap(self, new_df: DataFrame) -> None:
        materialized = new_df.localCheckpoint(eager=True)
        self._df.unpersist()
        self._df = materialized.cache()
