"""Operator registry — the single source of truth behind ``__spark_entry__.py``.

Every operator from SURVEY.md §2 registers here with:
  * a Spark implementation ``fn(spark, sf_dir) -> DataFrame``;
  * optionally a DuckDB-runnable ANSI-SQL oracle string (same parquet tables,
    pre-registered views per __spark_entry__.py). Omitted oracle ⇒ the driver
    records a weaker rows-only check (approx/streaming/binary ops).

Hash-match discipline enforced by convention in every registered query
(SURVEY.md §5.3): aggregate DOUBLE outputs wrapped ROUND(x,4) on BOTH sides,
identical column aliases on both sides, collect_list sorted + joined to
string, LIMIT only under total order, UTC timestamps.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    key: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None ⇒ rows-only check
    category: str       # SURVEY §2 section, e.g. "2.C joins"


REGISTRY: dict[str, QuerySpec] = {}

# Modules whose import registers operators. Extended as categories land.
_OPERATOR_MODULES = [
    "training_feed_kinesis_spark.operators.scans",
    "training_feed_kinesis_spark.operators.filters",
    "training_feed_kinesis_spark.operators.joins",
    "training_feed_kinesis_spark.operators.aggregates",
    "training_feed_kinesis_spark.operators.windows",
    "training_feed_kinesis_spark.operators.sorts_setops",
    "training_feed_kinesis_spark.operators.functions_scalar",
    "training_feed_kinesis_spark.operators.llm_text",
    "training_feed_kinesis_spark.operators.llm_dedup",
    "training_feed_kinesis_spark.operators.llm_similarity",
    "training_feed_kinesis_spark.operators.multimodal",
    "training_feed_kinesis_spark.operators.udfs",
    "training_feed_kinesis_spark.operators.workloads",
    "training_feed_kinesis_spark.operators.workloads_tpch",
    "training_feed_kinesis_spark.operators.analytics",
    "training_feed_kinesis_spark.operators.pipeline_ops",
    "training_feed_kinesis_spark.operators.rollups",
    "training_feed_kinesis_spark.operators.modern_sql",
    "training_feed_kinesis_spark.operators.extras",
    "training_feed_kinesis_spark.operators.sampling",
    "training_feed_kinesis_spark.operators.surface2",
    "training_feed_kinesis_spark.operators.structured_text",
    "training_feed_kinesis_spark.operators.graph",
    "training_feed_kinesis_spark.operators.timeseries2",
    "training_feed_kinesis_spark.operators.surface3",
    "training_feed_kinesis_spark.operators.ml_relational",
    "training_feed_kinesis_spark.operators.quality_mining",
    "training_feed_kinesis_spark.operators.llm_text2",
    "training_feed_kinesis_spark.operators.fuzzy_attrib",
    "training_feed_kinesis_spark.operators.engine_surface",
    "training_feed_kinesis_spark.operators.pii_activity",
    "training_feed_kinesis_spark.operators.reporting2",
    "training_feed_kinesis_spark.operators.misc_fns",
    "training_feed_kinesis_spark.operators.drift_stats",
    "training_feed_kinesis_spark.operators.feed_packing",
    "training_feed_kinesis_spark.operators.stats2",
    "training_feed_kinesis_spark.operators.corpus_quality",
    "training_feed_kinesis_spark.operators.ml_eval",
    "training_feed_kinesis_spark.operators.season_spatial",
    "training_feed_kinesis_spark.operators.cep",
    "training_feed_kinesis_spark.operators.ml_tree",
    "training_feed_kinesis_spark.operators.stats3",
    "training_feed_kinesis_spark.operators.engine_surface2",
    "training_feed_kinesis_spark.operators.ml_pipeline2",
    "training_feed_kinesis_spark.operators.quality_graph2",
    "training_feed_kinesis_spark.operators.pipeline_ops2",
    "training_feed_kinesis_spark.operators.surface4",
    "training_feed_kinesis_spark.operators.sketches_curation",
    "training_feed_kinesis_spark.operators.curation_wave5",
    "training_feed_kinesis_spark.operators.scale_ops",
    "training_feed_kinesis_spark.operators.surface_wave7",
    "training_feed_kinesis_spark.operators.training_feed8",
    "training_feed_kinesis_spark.operators.ops_wave9",
    "training_feed_kinesis_spark.operators.ops_wave10",
    "training_feed_kinesis_spark.operators.ops_wave11",
    "training_feed_kinesis_spark.operators.ops_wave12",
    "training_feed_kinesis_spark.operators.ops_wave13",
    "training_feed_kinesis_spark.operators.ops_wave14",
    "training_feed_kinesis_spark.operators.ops_wave15",
    "training_feed_kinesis_spark.operators.ops_wave16",
    "training_feed_kinesis_spark.operators.ops_wave17",
    "training_feed_kinesis_spark.operators.ops_wave18",
    "training_feed_kinesis_spark.operators.ops_wave19",
    "training_feed_kinesis_spark.operators.feed_e2e",
    "training_feed_kinesis_spark.operators.ops_wave21",
    "training_feed_kinesis_spark.operators.ops_wave22",
    "training_feed_kinesis_spark.operators.ops_wave23",
    "training_feed_kinesis_spark.operators.ops_wave24",
    "training_feed_kinesis_spark.operators.ops_wave25",
    "training_feed_kinesis_spark.operators.ops_wave26",
    "training_feed_kinesis_spark.operators.ops_wave28",
    "training_feed_kinesis_spark.operators.ops_wave29",
    "training_feed_kinesis_spark.operators.ops_wave30",
    "training_feed_kinesis_spark.operators.ops_wave31",
    "training_feed_kinesis_spark.operators.ops_wave32",
    "training_feed_kinesis_spark.operators.ops_wave33",
    "training_feed_kinesis_spark.operators.ops_wave34",
    "training_feed_kinesis_spark.operators.ops_wave35",
    "training_feed_kinesis_spark.operators.ops_wave36",
    "training_feed_kinesis_spark.operators.ops_wave37",
    "training_feed_kinesis_spark.operators.ops_wave38",
    "training_feed_kinesis_spark.operators.ops_wave39",
    "training_feed_kinesis_spark.operators.ops_wave40",
    "training_feed_kinesis_spark.operators.ops_wave41",
    "training_feed_kinesis_spark.operators.ops_wave42",
    "training_feed_kinesis_spark.operators.ops_wave43",
    "training_feed_kinesis_spark.operators.ops_wave44",
    "training_feed_kinesis_spark.operators.ops_wave45",
    "training_feed_kinesis_spark.operators.ops_wave46",
    "training_feed_kinesis_spark.operators.ops_wave48",
    "training_feed_kinesis_spark.operators.ops_wave49",
    "training_feed_kinesis_spark.operators.ops_wave50",
    "training_feed_kinesis_spark.operators.ops_wave51",
    "training_feed_kinesis_spark.operators.ops_wave52",
    "training_feed_kinesis_spark.operators.ops_wave53",
    "training_feed_kinesis_spark.operators.ops_wave54",
    "training_feed_kinesis_spark.operators.ops_wave55",
    "training_feed_kinesis_spark.operators.ops_wave56",
    "training_feed_kinesis_spark.operators.ops_wave57",
    "training_feed_kinesis_spark.operators.ops_wave58",
    "training_feed_kinesis_spark.operators.ops_wave59",
    "training_feed_kinesis_spark.operators.ops_wave60",
    "training_feed_kinesis_spark.operators.ops_wave61",
    "training_feed_kinesis_spark.operators.ops_wave62",
    "training_feed_kinesis_spark.operators.ops_wave63",
    "training_feed_kinesis_spark.operators.ops_wave64",
    "training_feed_kinesis_spark.operators.ops_wave65",
    "training_feed_kinesis_spark.operators.ops_wave66",
    "training_feed_kinesis_spark.operators.ops_wave67",
    "training_feed_kinesis_spark.operators.ops_wave68",
    "training_feed_kinesis_spark.operators.ops_wave69",
    "training_feed_kinesis_spark.operators.ops_wave70",
    "training_feed_kinesis_spark.operators.ops_wave71",
    "training_feed_kinesis_spark.operators.ops_wave72",
    "training_feed_kinesis_spark.operators.ops_wave73",
    "training_feed_kinesis_spark.operators.ops_wave74",
    "training_feed_kinesis_spark.operators.ops_wave75",
    "training_feed_kinesis_spark.operators.ops_wave76",
    "training_feed_kinesis_spark.operators.ops_wave77",
    "training_feed_kinesis_spark.operators.ops_wave78",
    "training_feed_kinesis_spark.operators.ops_wave79",
    "training_feed_kinesis_spark.operators.ops_wave80",
    "training_feed_kinesis_spark.operators.ops_wave81",
    "training_feed_kinesis_spark.operators.ops_wave82",
    "training_feed_kinesis_spark.operators.ops_wave83",
    "training_feed_kinesis_spark.operators.ops_wave84",
    "training_feed_kinesis_spark.operators.ops_wave85",
    "training_feed_kinesis_spark.operators.ops_wave86",
    "training_feed_kinesis_spark.operators.ops_wave87",
    "training_feed_kinesis_spark.operators.ops_wave88",
    "training_feed_kinesis_spark.operators.ops_wave89",
    "training_feed_kinesis_spark.operators.ops_wave90",
    "training_feed_kinesis_spark.operators.ops_wave91",
    "training_feed_kinesis_spark.operators.ops_wave92",
    "training_feed_kinesis_spark.operators.ops_wave93",
    "training_feed_kinesis_spark.operators.ops_wave94",
    "training_feed_kinesis_spark.operators.ops_wave95",
    "training_feed_kinesis_spark.operators.ops_wave96",
    "training_feed_kinesis_spark.sources.pyds",
    "training_feed_kinesis_spark.streaming.queries",
]


def register(key: str, category: str, oracle: str | None = None):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``key``."""

    def deco(fn: QueryFn) -> QueryFn:
        if key in REGISTRY:
            raise ValueError(f"duplicate operator key: {key}")
        REGISTRY[key] = QuerySpec(key=key, fn=fn, oracle=oracle, category=category)
        return fn

    return deco


# The driver's correctness gate samples the FIRST 50 registered keys each
# round. Round-6 rotation (VERDICT r5 item 1, fifth consecutive rotation):
# all 50 slots are drawn from the 286 never-driver-verified oracled keys —
# the 30 staged round-5 front-of-line entries, verbatim, plus the next 20
# never-sampled oracled keys in registration order. Rows-only-by-design
# keys are excluded (their slot is better spent on hash-checkable keys).
# Entries past 50 are front-of-line for round 7.
_PRIORITY_KEYS = [
    # round-5 staged front-of-line, verbatim
    "fn_str_to_map", "fn_url", "graph_degree", "graph_pagerank",
    "ts_ewma", "ts_wow_growth", "join_interval_overlap", "ts_ohlc",
    "win_rolling_median", "agg_product", "fn_width_bucket",
    "rollup_rank_report", "source_text", "ml_kmeans_step",
    "ml_linear_score", "vec_pca_power", "dq_profile", "assoc_rules",
    "llm_zipf_slope", "llm_keywords_topk", "fn_sentences", "join_fuzzy",
    "agg_corr_matrix", "attribution_last_touch", "sql_correlated_scalar",
    "sql_inline_values", "sink_sorted_zonemap", "cbo_join_reorder",
    "fn_mask", "agg_listagg",
    # next-oldest never-driver-sampled oracled keys, registration order
    "multimodal_dedup", "events_dau_wau", "ts_yoy_same_quarter",
    "customer_clv_decay", "shard_assignment", "fn_collation_ci",
    "orders_backlog_aging", "agg_percentile_multi", "fn_datetime_make",
    "fn_json_array", "fn_array_setops", "dq_drift_psi",
    "stat_ks_2sample", "agg_entropy_gini", "ts_autocorr",
    "ts_page_hinkley", "llm_pack_chunks", "events_path_topk",
    "q12_shipmode_priority", "sql_group_by_all",
    # --- 50-key window boundary; below = round-7 front-of-line ---
    # (staged to a FULL 50 at the end of round 6: the 30 entries staged
    # mid-round plus the next 20 never-driver-sampled oracled keys in
    # registration order — round 7 rotates by moving this block to the
    # front and staging a fresh block for round 8)
    "sql_distinct_on", "stat_chi2_independence", "dq_benford",
    "ts_gap_islands", "events_anomaly_mad", "agg_weighted_median",
    "vec_label_centroid_sim", "llm_chunk_overlap", "llm_repetition_score",
    "llm_prefix_dedup", "ml_auc_rank", "ml_confusion",
    "ml_calibration_lift", "ml_feature_ig", "ml_naive_bayes",
    "fn_inline_structs", "ts_seasonal_dow", "ts_index_rebase",
    "geo_grid_knn", "fn_zorder_tile", "events_seq_match",
    "ml_tree_split", "ml_logreg_step", "ml_knn_classify",
    "ml_precision_at_k", "stat_ttest_welch", "events_hour_heatmap",
    "revenue_abc_class", "ts_theil_sen", "customer_gini",
    "join_dpp_partitioned", "join_bloom_filter", "llm_ngram_novelty",
    "ts_cross_correlation", "ml_kfold_assign", "vec_norm_outliers",
    "vec_dim_stats", "llm_quality_gopher", "win_frame_time_range",
    "graph_link_predict", "ts_burstiness", "llm_lsh_recall",
    "stream_fanout_sinks", "customer_migration_matrix",
    "stat_bootstrap_ci", "events_user_similarity", "scan_cache_reuse",
    "sql_parameterized", "vec_pq_error", "agg_countmin",
]


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module (idempotent) and return the registry,
    reordered so ``_PRIORITY_KEYS`` come first (driver sample window)."""
    for mod in _OPERATOR_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as e:
            # tolerate not-yet-written category modules during incremental build
            if e.name and e.name.startswith("training_feed_kinesis_spark"):
                continue
            raise
    missing = [k for k in _PRIORITY_KEYS if k not in REGISTRY]
    if missing:
        # a typo here would silently shrink the driver's 50-key sample
        # window; fail loudly instead
        raise KeyError(f"_PRIORITY_KEYS not in REGISTRY: {missing}")
    ordered = {k: REGISTRY[k] for k in _PRIORITY_KEYS}
    for k, spec in list(REGISTRY.items()):
        if k not in ordered:
            ordered[k] = spec
    REGISTRY.clear()
    REGISTRY.update(ordered)
    return REGISTRY


def get_queries() -> dict[str, QueryFn]:
    return {k: spec.fn for k, spec in load_all().items()}


def get_oracles() -> dict[str, str]:
    return {k: spec.oracle for k, spec in load_all().items() if spec.oracle is not None}
