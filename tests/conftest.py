"""Shared fixtures: one SparkSession per test run, a DuckDB connection
with the testdata views registered (mirroring the driver's oracle
setup), and a comparison helper replicating the driver's check
(row count + schema + order-insensitive values)."""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("PMACCT_SPARK_TEST_SF", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    from pmacct_spark.session import get_spark

    s = get_spark("pmacct_spark-tests", cpus=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Column-name-sorted, row-sorted frame for order-insensitive compare."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    return pdf.reset_index(drop=True)


def assert_matches_oracle(spark_df, duck_con, sql: str, float_cols: set[str] = frozenset()):
    got = normalize(spark_df.toPandas())
    want = normalize(duck_con.execute(sql).df())
    assert list(got.columns) == list(want.columns), (
        f"schema mismatch:\n spark={list(got.columns)}\n duck ={list(want.columns)}"
    )
    assert len(got) == len(want), f"row count {len(got)} != {len(want)}"
    for c in got.columns:
        gk = got[c].dtype.kind
        wk = want[c].dtype.kind
        norm = lambda k: "i" if k in "iu" else k
        assert norm(gk) == norm(wk) or "O" in (gk, wk), (
            f"column {c!r} dtype kind mismatch: spark={got[c].dtype} "
            f"duck={want[c].dtype} (HUGEINT->float64 leak? cast the oracle)"
        )
    for c in got.columns:
        g, w = got[c], want[c]
        if c in float_cols or str(g.dtype).startswith("float"):
            pd.testing.assert_series_equal(
                g.astype("float64"), w.astype("float64"), check_names=False,
                rtol=1e-9, atol=1e-12,
            )
        else:
            try:
                pd.testing.assert_series_equal(
                    g, w, check_names=False, check_dtype=False
                )
            except AssertionError as e:
                diff = (g != w)
                idx = diff[diff].index[:5].tolist()
                raise AssertionError(
                    f"column {c!r} differs at rows {idx}:\n"
                    f" spark={g.iloc[idx[:5]].tolist() if idx else []}\n"
                    f" duck ={w.iloc[idx[:5]].tolist() if idx else []}"
                ) from e
