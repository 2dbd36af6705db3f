"""Stateful ImtTable semantics: -r reset-after-read, -e erase, file:
match specs — side effects the oracle can't express (reference
src/server.c:158 set_reset_flag, :216-235 erase)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pmacct_spark.client import ImtTable, compile_match
from pmacct_spark.config import PluginConfig
from pmacct_spark.driver_queries import flows
from pmacct_spark.pipeline import build_aggregation
from tests.conftest import SF_DIR


def _table(spark) -> ImtTable:
    cfg = PluginConfig(aggregate=["src_as", "dst_as"])
    agg = build_aggregation(flows(spark, SF_DIR), cfg)
    return ImtTable(agg, ["src_as", "dst_as"], ["bytes", "packets", "flows"])


def test_match_reset_zeroes_only_matched(spark):
    t = _table(spark)
    before = t.stats().count()
    served = t.match("64505,*", reset_after=True)
    assert served.count() > 0
    # matched rows remain, counters zeroed; row count unchanged
    assert t.stats().count() == before
    zeroed = t.df.filter(F.col("src_as") == 64505)
    assert zeroed.filter("bytes <> 0 OR packets <> 0 OR flows <> 0").count() == 0
    untouched = t.df.filter(F.col("src_as") == 64506)
    assert untouched.filter("bytes > 0").count() > 0


def test_erase_empties_table(spark):
    t = _table(spark)
    assert t.stats().count() > 0
    t.erase()
    assert t.stats().count() == 0


def test_file_spec(spark, tmp_path):
    t = _table(spark)
    p = tmp_path / "specs.txt"
    p.write_text("64505,*\n64510,64513\n")
    via_file = t.match(f"file:{p}").count()
    inline = t.match("64505,*;64510,64513").count()
    assert via_file == inline > 0


def test_wildcard_only_spec_matches_all(spark):
    t = _table(spark)
    assert t.match("*,*").count() == t.stats().count()


def test_compile_match_field_count_mismatch(spark):
    try:
        compile_match(["a", "b"], "1,2,3")
    except ValueError as e:
        assert "3 fields" in str(e)
    else:
        raise AssertionError("expected ValueError")
