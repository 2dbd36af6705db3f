"""One-off scale-up fixture builder (VERDICT r4 task #1 'Done' bar).

Derives an sfN TPC-H-ish dataset from an existing driver-generated SF
directory by replicating each SF-linear table K times with disjoint key
offsets, so every join key keeps referential integrity and per-key
cardinalities match a genuine K-times-larger scale factor.  Fixed-size
dims (nation/region) are copied verbatim.  Used to prove the TPC-H
plans survive a 10x scale-up (SCALE.md §"sf1 proof"); NOT used by any
gated query or test fixture — driver testdata stays the only
correctness input.

Usage: python tools/make_sf_scaled.py SRC_DIR DST_DIR K
"""
from __future__ import annotations

import os
import sys

import duckdb


def main(src: str, dst: str, k: int) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    # Key spans per table, used as offsets per replica. Span = MAX+1:
    # fixture ids are 0-based, so offsetting by MAX alone would collide
    # copy i's highest id with copy i+1's lowest at every seam
    # (duplicate keys -> join fan-out, breaking the referential-
    # integrity invariant this tool promises).
    spans = {}
    for t, key in [("customer", "c_custkey"), ("orders", "o_orderkey"),
                   ("supplier", "s_suppkey"), ("part", "p_partkey")]:
        spans[t] = con.execute(
            f"SELECT MAX({key}) + 1 FROM read_parquet('{src}/{t}.parquet')"
        ).fetchone()[0]

    def rep(table: str, remap: dict[str, str]) -> None:
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{src}/{table}.parquet')"
        ).fetchall()]
        sel = ", ".join(remap.get(c, c) + f" AS {c}" for c in cols)
        parts = " UNION ALL ".join(
            f"SELECT {sel.replace('@I', str(i))} "
            f"FROM read_parquet('{src}/{table}.parquet')"
            for i in range(k)
        )
        con.execute(f"COPY ({parts}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
        print(table, con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{dst}/{table}.parquet')"
        ).fetchone()[0])

    C, O, S, P = (spans[t] for t in ("customer", "orders", "supplier", "part"))
    rep("customer", {"c_custkey": f"c_custkey + @I * {C}"})
    rep("supplier", {"s_suppkey": f"s_suppkey + @I * {S}"})
    rep("part", {"p_partkey": f"p_partkey + @I * {P}"})
    rep("orders", {"o_orderkey": f"o_orderkey + @I * {O}",
                   "o_custkey": f"o_custkey + @I * {C}"})
    rep("lineitem", {"l_orderkey": f"l_orderkey + @I * {O}",
                     "l_partkey": f"l_partkey + @I * {P}",
                     "l_suppkey": f"l_suppkey + @I * {S}"})
    for t in ("nation", "region"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )

    # Non-relational families (wire loops derive datagrams from events;
    # ANN/dedup/text run over embeddings/documents). Same disjoint-key
    # replication. Replicated embeddings deliberately do NOT extend the
    # centroid/PQ-train/query id sets (all bounded predicates on low
    # vec_ids) — the index stays fixed while the item side grows K×,
    # which is exactly the serving-scale shape.
    for t, keys in [
        ("events", ["event_id", "user_id"]),
        ("documents", ["doc_id"]),
        ("embeddings", ["vec_id"]),
    ]:
        path = f"{src}/{t}.parquet"
        if not os.path.exists(path):
            continue
        span = {
            k2: con.execute(
                f"SELECT MAX({k2}) + 1 FROM read_parquet('{path}')"
            ).fetchone()[0]
            for k2 in keys
        }
        if t == "embeddings" and span["vec_id"] <= 1000:
            # the fixed-index claim holds only when every replica id
            # clears the centroid/PQ-train/query predicates
            # (vec_id < 1000 / < 300 / < 10 — operators/similarity.py)
            print(
                f"WARNING: source max vec_id {span['vec_id'] - 1} <= 1000;"
                " replicated ids fall inside the ANN index predicates,"
                " so the index does NOT stay fixed at this scale-up",
                file=sys.stderr,
            )
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{path}')"
        ).fetchall()]
        sel = ", ".join(
            (f"{c} + @I * {span[c]} AS {c}" if c in span else c)
            for c in cols
        )
        parts = " UNION ALL ".join(
            f"SELECT {sel.replace('@I', str(i))} FROM read_parquet('{path}')"
            for i in range(k)
        )
        con.execute(
            f"COPY ({parts}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(t, con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{dst}/{t}.parquet')"
        ).fetchone()[0])


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
