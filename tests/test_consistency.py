"""Cross-operator consistency: independent implementations of the same
semantics must agree with each other — a second differential axis on top of
the DuckDB oracles (engine-vs-engine there, operator-vs-operator here).
"""

from __future__ import annotations

import pytest

from .conftest import SF_DIR


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.fixture(scope="module")
def registry():
    from training_feed_kinesis_spark.registry import load_all

    return load_all()


def test_streaming_session_equals_batch_sessionize(spark, registry):
    """session_window over a drained stream ≡ lag-gap-cumsum batch
    sessionization — same gap, same (start, end, count) per session."""
    stream = registry["stream_session"].fn(spark, SF_DIR)
    batch = registry["batch_sessionize"].fn(spark, SF_DIR)
    cols = ("user_id", "session_start", "session_end", "n_events")
    assert _rows(stream, *cols) == _rows(batch, *cols)


def test_streaming_dedup_equals_batch_aggregate(spark, registry):
    """Doubled-delivery stream after stateful dedup ≡ exactly-once batch
    aggregate over the original events."""
    from training_feed_kinesis_spark.tables import load_table
    from pyspark.sql import functions as F

    streamed = registry["stream_dedup"].fn(spark, SF_DIR)
    batch = (
        load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )
    cols = ("event_type", "n", "total_value")
    assert _rows(streamed, *cols) == _rows(batch, *cols)


def test_watermark_late_drops_rows(spark, registry):
    """The shuffled replay under a tight watermark in append mode MUST lose
    rows (that is the semantics being demonstrated): emitted on-time counts
    are strictly fewer than the batch total."""
    from pyspark.sql import functions as F

    late = registry["stream_watermark_late"].fn(spark, SF_DIR)
    emitted = late.agg(F.sum("n_ontime")).first()[0] or 0
    from training_feed_kinesis_spark.tables import load_table

    total = load_table(spark, SF_DIR, "events").count()
    assert 0 < emitted < total
    if SF_DIR.endswith("sf0.001"):
        # deterministic replay — pin the exact on-time total (measured
        # twice identical, 2026-08-14) so a Spark version bump changing
        # late-drop behavior fails loudly; re-pin after testdata regen
        assert (emitted, late.count()) == (500, 360), (emitted, late.count())


def test_salted_equals_plain_aggregation(spark, registry):
    """Two-phase salted aggregation ≡ plain groupBy for algebraic aggs."""
    from training_feed_kinesis_spark.tables import load_table
    from pyspark.sql import functions as F

    salted = registry["agg_skew_twophase"].fn(spark, SF_DIR)
    plain = (
        load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
            F.round(F.max("value"), 4).alias("max_value"),
        )
    )
    cols = ("event_type", "n", "total_value", "max_value")
    assert _rows(salted, *cols) == _rows(plain, *cols)


def test_bucketed_join_equals_plain_join(spark, registry):
    """Bucketed co-located join ≡ plain shuffle join, row for row."""
    from training_feed_kinesis_spark.tables import load_table
    from pyspark.sql import functions as F

    bucketed = registry["join_bucketed"].fn(spark, SF_DIR)
    li = load_table(spark, SF_DIR, "lineitem")
    o = load_table(spark, SF_DIR, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    plain = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "o_orderdate",
        "o_totalprice",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
            "revenue"
        ),
    )
    cols = ("l_orderkey", "o_orderdate", "o_totalprice", "revenue")
    assert _rows(bucketed, *cols) == _rows(plain, *cols)


def test_approx_quantile_close_to_exact(spark, registry):
    """The quantile sketch must land near the exact percentiles (the
    oracled agg_percentile path is the ground truth)."""
    from training_feed_kinesis_spark.tables import load_table
    from pyspark.sql import functions as F

    approx = {
        r["event_type"]: (r["p50_approx"], r["p95_approx"])
        for r in registry["agg_approx_quantile"].fn(spark, SF_DIR).collect()
    }
    exact = {
        r["event_type"]: (r["p50"], r["p95"])
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.95)").alias("p95"),
        )
        .collect()
    }
    assert approx.keys() == exact.keys()
    # tolerance: approx_percentile returns an actual sample value while
    # exact percentile INTERPOLATES between order statistics — at ~100-row
    # test groups adjacent samples sit ~5 apart on the 0-200 domain, so the
    # bound covers one inter-sample gap, not sketch failure
    for et in exact:
        for a, e in zip(approx[et], exact[et]):
            assert abs(a - e) <= 10.0, (et, approx[et], exact[et])


def test_rocksdb_state_store_matches_default(spark, registry):
    """The tumbling-window drain must produce identical results under the
    RocksDB state-store provider — the large-state production path (state
    spills off-heap/disk instead of living in executor heap, which is what
    makes 100 TB streaming state survivable). Provider choice is pure conf:
    no operator code changes."""
    from training_feed_kinesis_spark.streaming.replay import drain, replay_stream
    from pyspark.sql import functions as F

    def tumbling():
        stream = replay_stream(spark, SF_DIR, "ordered")
        return (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    baseline = _rows(
        drain(tumbling(), "complete").select("event_type", "n"), "event_type", "n"
    )
    conf = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(conf, None)
    spark.conf.set(
        conf,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        rocks = _rows(
            drain(tumbling(), "complete").select("event_type", "n"), "event_type", "n"
        )
    finally:
        if prev is None:
            spark.conf.unset(conf)
        else:
            spark.conf.set(conf, prev)
    assert rocks == baseline


def test_dedup_watermark_runs_on_rocksdb_provider(spark, registry):
    """stream_dedup_watermark declares the RocksDB state store (the 100 TB
    state posture — VERDICT r3 gap). Assert from the query's own final
    StreamingQueryProgress that the RocksDB provider actually executed
    (its customMetrics are provider-specific), not merely that the conf
    was set; result correctness vs the DuckDB oracle is covered by the
    per-operator differential test."""
    from training_feed_kinesis_spark.streaming import replay

    df = registry["stream_dedup_watermark"].fn(spark, SF_DIR)
    assert df.count() > 0
    prog = replay.LAST_PROGRESS
    assert prog is not None and prog.get("stateOperators"), prog
    metrics = prog["stateOperators"][0].get("customMetrics", {})
    rocks_keys = [k for k in metrics if "rocksdb" in k.lower()]
    assert rocks_keys, f"no rocksdb custom metrics in progress: {metrics}"
    # and the per-drain conf scope restored the session default afterwards
    assert "RocksDB" not in (
        spark.conf.get("spark.sql.streaming.stateStore.providerClass", "") or ""
    ) or __import__("os").environ.get("TFK_ROCKSDB_STATE")


def test_template_detect_clusters_seeded_skeletons(spark, registry, tmp_path):
    """De-vacuization guard (VERDICT r3 'what's wrong' #1): two documents
    with DIFFERENT words but the same quantized token-width skeleton must
    land in one template family; a doc with a different skeleton must not
    join it. Runs the registered operator against a seeded corpus so the
    core grouping logic is asserted directly, independent of whether the
    synthetic corpus happens to contain families."""
    d = str(tmp_path / "tpl")
    __import__("os").makedirs(d, exist_ok=True)
    rows = [
        # same skeleton: token lengths 4,2,6,3 → buckets 1,0,2,1
        (0, "dear sir please find", "en", "src0", 20),
        (1, "good day kindly call", "en", "src0", 20),
        # different skeleton: lengths 13,1,x → bucket sequence differs
        (2, "extraordinary a completely different shape", "en", "src1", 43),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = registry["llm_template_detect"].fn(spark, d).collect()
    assert len(out) == 1, out
    assert out[0]["n_docs"] == 2 and out[0]["exemplar_doc"] == 0


def test_template_detect_non_vacuous_on_corpus(spark, registry):
    """The driver-sampled green must verify something: the quantized
    signature must yield ≥1 family on the synthetic corpus itself."""
    assert registry["llm_template_detect"].fn(spark, SF_DIR).count() >= 1


def test_checkpoint_recovery_processes_each_file_once(spark):
    """Crash/resume semantics: a second drain reusing the SAME checkpoint
    must pick up only files that arrived after the first drain — offsets in
    the checkpoint WAL are the exactly-once source contract (SURVEY §1.1:
    sequence-number checkpointing). Each event must appear exactly once in
    the sink across both runs."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from training_feed_kinesis_spark.operators.scans import scratch_dir
    from training_feed_kinesis_spark.streaming.replay import _prepare
    from training_feed_kinesis_spark.tables import load_table

    prepared = _prepare(spark, SF_DIR, "ordered")
    parts = sorted(
        f for f in os.listdir(prepared)
        if f.startswith("part-") and not f.endswith(".crc")
    )
    assert len(parts) >= 2
    src = scratch_dir("ckpt_rec_src_")
    sink = scratch_dir("ckpt_rec_sink_")
    ckpt = scratch_dir("ckpt_rec_wal_")
    # phase 1: all but the last file
    for f in parts[:-1]:
        shutil.copy(os.path.join(prepared, f), os.path.join(src, f))

    schema = load_table(spark, SF_DIR, "events").schema

    def run_drain():
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .select("event_id")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_drain()
    n_phase1 = spark.read.parquet(sink).count()
    # "crash", then a new file arrives; resume from the same checkpoint
    shutil.copy(os.path.join(prepared, parts[-1]), os.path.join(src, parts[-1]))
    run_drain()
    out = spark.read.parquet(sink)
    n_total_events = load_table(spark, SF_DIR, "events").count()
    assert n_phase1 < n_total_events  # phase 1 genuinely partial
    assert out.count() == n_total_events  # resume processed ONLY the new file
    # exactly once: no event_id appears twice across the two drains
    assert out.groupBy("event_id").count().filter(F.col("count") > 1).count() == 0


def test_stream_cdc_merge_equals_batch_compaction(spark, registry):
    """Incremental foreachBatch CDC merge over the replay ≡ one-shot batch
    changelog compaction (per-key argmax is associative across any batch
    split)."""
    stream = registry["stream_cdc_merge"].fn(spark, SF_DIR)
    batch = registry["cdc_latest_merge"].fn(spark, SF_DIR)
    cols = ("user_id", "last_ts", "last_type", "last_value")
    assert _rows(stream, *cols) == _rows(batch, *cols)


def test_dedup_apply_census_consistent_with_clusters(spark, registry):
    """The apply-step census must account for every vector exactly once:
    Σ(csize · n_clusters) = corpus size, Σ n_dropped = corpus − keepers."""
    from training_feed_kinesis_spark.tables import load_table

    census = registry["llm_dedup_apply"].fn(spark, SF_DIR).collect()
    clusters = registry["llm_dedup_clusters"].fn(spark, SF_DIR)
    n_vecs = load_table(spark, SF_DIR, "embeddings").count()
    n_components = clusters.select("component").distinct().count()
    assert sum(r["csize"] * r["n_clusters"] for r in census) == n_vecs
    assert sum(r["n_dropped"] for r in census) == n_vecs - n_components


def test_gapfill_preserves_event_totals(spark, registry):
    """Zero-filling must neither lose nor invent events: the gap-filled
    series sums to the raw event count, and every user's series is a dense
    hour grid (span hours == row count)."""
    from pyspark.sql import functions as F

    from training_feed_kinesis_spark.tables import load_table

    grid = registry["ts_resample_gapfill"].fn(spark, SF_DIR)
    total = grid.agg(F.sum("n_events")).collect()[0][0]
    assert total == load_table(spark, SF_DIR, "events").count()
    dense = (
        grid.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            (
                (F.unix_timestamp(F.max("h")) - F.unix_timestamp(F.min("h")))
                / 3600 + 1
            ).cast("long").alias("span_hours"),
        )
        .filter(F.col("rows") != F.col("span_hours"))
        .count()
    )
    assert dense == 0


def test_weighted_sample_prefers_long_docs(spark, registry):
    """The n_chars-weighted sample must skew long: its mean length exceeds
    the corpus mean (sanity on the -ln(u)/w key direction)."""
    from pyspark.sql import functions as F

    from training_feed_kinesis_spark.tables import load_table

    sample_mean = (
        registry["sample_weighted"].fn(spark, SF_DIR)
        .agg(F.avg("n_chars")).collect()[0][0]
    )
    corpus_mean = (
        load_table(spark, SF_DIR, "documents")
        .agg(F.avg("n_chars")).collect()[0][0]
    )
    assert sample_mean > corpus_mean


def test_ann_recall_floor(spark, registry):
    """The cosine-LSH candidate generator must retain ≥80% of exact top-k
    neighbors at test scale — the quality gate for swapping the exact path
    out at scale."""
    row = registry["llm_ann_recall"].fn(spark, SF_DIR).collect()[0]
    assert row["n_queries"] > 0
    assert row["avg_recall"] >= 0.8, row


def test_results_invariant_under_partitioning(spark, registry):
    """Cluster-layout independence: the same query must produce identical
    results with a different shuffle-partition count — the property that
    makes every deterministic operator reproducible across cluster sizes
    (md5 selection, rounded ranking keys, and total orders exist precisely
    for this). Representative keys cover sampling, sketching, windowing,
    and top-k."""
    keys = ["sample_weighted", "llm_minhash_sig", "win_ranking", "topk_per_group"]
    baseline = {
        k: sorted(map(repr, registry[k].fn(spark, SF_DIR).collect()))
        for k in keys
    }
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "5")
    try:
        for k in keys:
            again = sorted(map(repr, registry[k].fn(spark, SF_DIR).collect()))
            assert again == baseline[k], f"{k} changed under repartitioning"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_pagerank_mass_conservation(spark, registry):
    """PageRank is a probability distribution: ranks are positive and sum
    to 1 (within rounding of the published 4dp values)."""
    rows = registry["graph_pagerank"].fn(spark, SF_DIR).collect()
    total = sum(r.pagerank for r in rows)
    assert abs(total - 1.0) < 1e-2, total
    assert all(r.pagerank > 0 for r in rows)


def test_kmeans_membership_accounting(spark, registry):
    """Every embedding lands in exactly one cluster: membership counts sum
    to the table's row count and dispersion bounds are ordered."""
    from training_feed_kinesis_spark.tables import load_table

    rows = registry["ml_kmeans_step"].fn(spark, SF_DIR).collect()
    n_total = load_table(spark, SF_DIR, "embeddings").count()
    assert sum(r.n_members for r in rows) == n_total
    assert all(r.mean_d2 <= r.max_d2 for r in rows)


def test_dau_never_exceeds_wau(spark, registry):
    """A day's actives are a subset of its trailing week's actives."""
    rows = registry["events_dau_wau"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.dau <= r.wau
        assert 0 < r.stickiness <= 1.0


def test_bitmap_distinct_equals_direct_count_distinct(spark, registry):
    """Bucket-sharded bitmap cardinalities must equal a plain
    count-distinct over the same grouping — exactness, not approximation."""
    from pyspark.sql import functions as F
    from training_feed_kinesis_spark.tables import load_table

    got = _rows(registry["agg_bitmap"].fn(spark, SF_DIR), "event_type", "exact_users")
    direct = _rows(
        load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("exact_users")),
        "event_type",
        "exact_users",
    )
    assert got == direct


def test_assoc_rules_are_symmetric_and_bounded(spark, registry):
    """Directed rules come in mirrored pairs with the same support, and
    confidence is a conditional probability (0, 1]."""
    rows = registry["assoc_rules"].fn(spark, SF_DIR).collect()
    assert rows
    support = {(r.antecedent, r.consequent): r.pair_count for r in rows}
    for (a, b), s in support.items():
        assert support.get((b, a)) == s
    assert all(0 < r.confidence <= 1.0 for r in rows)


def test_ohlc_bounds_ordered(spark, registry):
    """Candle invariant: low <= open, close <= high on every candle."""
    rows = registry["ts_ohlc"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.low <= r.open <= r.high
        assert r.low <= r.close <= r.high


def test_auc_bounded_and_confusion_consistent(spark, registry):
    """AUC ∈ [0,1]; confusion-matrix cells partition the example count
    used by the AUC query (same base relation, same label)."""
    auc = registry["ml_auc_rank"].fn(spark, SF_DIR).collect()[0]
    assert 0.0 <= auc["auc"] <= 1.0
    cm = registry["ml_confusion"].fn(spark, SF_DIR).collect()[0]
    assert cm["tp"] + cm["fn"] == auc["n_pos"]
    assert cm["fp"] + cm["tn"] == auc["n_neg"]


def test_calibration_deciles_partition_examples(spark, registry):
    """Calibration deciles cover every scored example exactly once and
    positives sum to the AUC query's positive count."""
    rows = registry["ml_calibration_lift"].fn(spark, SF_DIR).collect()
    auc = registry["ml_auc_rank"].fn(spark, SF_DIR).collect()[0]
    assert sum(r["n"] for r in rows) == auc["n_pos"] + auc["n_neg"]
    assert sum(r["pos"] for r in rows) == auc["n_pos"]
    assert sorted(r["decile"] for r in rows) == list(range(1, 11))


def test_tree_split_gain_nonnegative(spark, registry):
    """Gini gain of any binary split is >= 0 (impurity never increases),
    and left-side counts are bounded by the split totals."""
    for r in registry["ml_tree_split"].fn(spark, SF_DIR).collect():
        assert r["gini_gain"] >= 0.0
        assert 0 <= r["pl"] <= r["nl"]


def test_feature_ig_bounded_by_label_entropy(spark, registry):
    """Information gain is bounded by H(label) <= 1 bit for a binary
    label, and is non-negative."""
    for r in registry["ml_feature_ig"].fn(spark, SF_DIR).collect():
        assert -1e-9 <= r["info_gain"] <= 1.0


def test_grid_knn_is_locally_optimal(spark, registry):
    """Each reported neighbor is at least as close as any OTHER point in
    the same cell as the query point (same-cell candidates are always in
    the 3x3 probe set)."""
    rows = registry["geo_grid_knn"].fn(spark, SF_DIR).collect()
    pts = {r["c_custkey"]: (r["gx"], r["gy"]) for r in rows}
    cell = {k: (x // 64, y // 64) for k, (x, y) in pts.items()}
    nn = {r["c_custkey"]: r["nn_d2"] for r in rows}
    for k, (x, y) in pts.items():
        for j, (xj, yj) in pts.items():
            if j != k and cell[j] == cell[k]:
                d2 = (x - xj) ** 2 + (y - yj) ** 2
                assert nn[k] <= d2


@pytest.fixture(scope="module")
def funnel_planted_sf(tmp_path_factory):
    """events plus PLANTED funnel chains with known arithmetic (the
    de-vacuization demanded by VERDICT r7 item 3: on the synthetic
    cadence — median per-user inter-event gap ~7.4 h — a complete
    view→click→purchase chain at ≤30-min hops is a coincidence, so the
    driver's sf0.01 result is legitimately 0 rows and the detection
    power of the operator was untested). User 9001: one clean chain
    (view +0, click +10 min, purchase +20 min) → 1 chain. User 9002:
    two views (+0, +5 min), one click (+15 min), two purchases
    (+25, +35 min) → every view precedes the click within 30 min and
    both purchases follow it within 30 min → 2×1×2 = 4 chains over 2
    distinct purchases. User 9003: view → purchase with NO click
    (+0, +10 min) → must NOT match."""
    import shutil

    import duckdb as _dd

    from training_feed_kinesis_spark.tables import TABLES

    d = tmp_path_factory.mktemp("funnelplanted")
    for t in TABLES:
        if t != "events":
            shutil.copy(f"{SF_DIR}/{t}.parquet", d / f"{t}.parquet")
    planted = [
        (900101, "2024-06-01 12:00:00", 9001, "view"),
        (900102, "2024-06-01 12:10:00", 9001, "click"),
        (900103, "2024-06-01 12:20:00", 9001, "purchase"),
        (900201, "2024-06-02 08:00:00", 9002, "view"),
        (900202, "2024-06-02 08:05:00", 9002, "view"),
        (900203, "2024-06-02 08:15:00", 9002, "click"),
        (900204, "2024-06-02 08:25:00", 9002, "purchase"),
        (900205, "2024-06-02 08:35:00", 9002, "purchase"),
        (900301, "2024-06-03 09:00:00", 9003, "view"),
        (900302, "2024-06-03 09:10:00", 9003, "purchase"),
    ]
    values = ", ".join(
        f"({eid}, TIMESTAMP '{ts}', {uid}, '{et}', 1.0, NULL)"
        for eid, ts, uid, et in planted
    )
    _dd.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('{SF_DIR}/events.parquet')
          UNION ALL
          SELECT * FROM (VALUES {values})
            t(event_id, ts, user_id, event_type, value, props)
        ) TO '{d}/events.parquet' (FORMAT PARQUET)
        """
    )
    return str(d)


def test_seq_match_detects_planted_funnels(spark, registry, funnel_planted_sf):
    """Detection-power proof: the chain counter fires with exactly the
    planted arithmetic, and the Spark result still matches the DuckDB
    oracle on the planted table."""
    import duckdb as _dd

    from training_feed_kinesis_spark.tables import TABLES

    from .conftest import assert_matches_oracle

    spec = registry["events_seq_match"]
    got = {
        r["user_id"]: (r["n_chains"], r["n_purchases"])
        for r in spec.fn(spark, funnel_planted_sf).collect()
    }
    assert got[9001] == (1, 1)
    assert got[9002] == (4, 2)
    assert 9003 not in got  # no click → no chain
    con = _dd.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{funnel_planted_sf}/{t}.parquet')"
        )
    try:
        assert_matches_oracle(
            spec.fn(spark, funnel_planted_sf), con, spec.oracle
        )
    finally:
        con.close()


def test_seq_match_users_subset_of_purchasers(spark, registry):
    """Users with a completed view->click->purchase chain must be a
    subset of users who purchased at all."""
    from training_feed_kinesis_spark.tables import load_table
    from pyspark.sql import functions as F

    chains = registry["events_seq_match"].fn(spark, SF_DIR)
    ev = load_table(spark, SF_DIR, "events")
    purchasers = {
        r["user_id"]
        for r in ev.filter(F.col("event_type") == "purchase")
        .select("user_id").distinct().collect()
    }
    for r in chains.collect():
        assert r["user_id"] in purchasers


def test_page_hinkley_drawup_nonnegative(spark, registry):
    """The PH drawup statistic (rise above running min) is >= 0 by
    construction, and alarm implies drawup > lambda."""
    for r in registry["ts_page_hinkley"].fn(spark, SF_DIR).collect():
        assert r["drawup"] >= 0.0
        if r["alarm"]:
            assert r["drawup"] > 50.0


def test_zorder_tiles_partition_points(spark, registry):
    """Z-curve tiles hold every customer exactly once and tile z-ranges
    never overlap (min_z/max_z are nested inside disjoint 16384 blocks)."""
    from training_feed_kinesis_spark.tables import load_table

    rows = registry["fn_zorder_tile"].fn(spark, SF_DIR).collect()
    n_cust = load_table(spark, SF_DIR, "customer").count()
    assert sum(r["n"] for r in rows) == n_cust
    for r in rows:
        assert r["tile"] * 16384 <= r["min_z"] <= r["max_z"] < (r["tile"] + 1) * 16384


def test_watermark_bounds_state_growth_under_out_of_order_replay(spark):
    """State-size discipline: under heavy out-of-order arrival (shuffled
    replay — every file spans the whole time range) a watermarked tumbling
    aggregation must (a) evict closed windows, keeping final state rows far
    below the total window count × arrival disorder, and (b) record
    watermark-dropped rows rather than buffering them forever. This is the
    guarantee that makes streaming state survivable at 100 TB: state is
    bounded by the watermark horizon, not by stream length. Runs under the
    RocksDB provider — the production large-state backend."""
    from pyspark.sql import functions as F

    from training_feed_kinesis_spark.operators.scans import scratch_dir
    from training_feed_kinesis_spark.streaming.replay import replay_stream

    conf = "spark.sql.streaming.stateStore.providerClass"
    prev_provider = spark.conf.get(conf, None)
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        conf,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        stream = replay_stream(spark, SF_DIR, "shuffled")
        agg = (
            stream.withWatermark("ts", "2 hours")
            .groupBy(F.window("ts", "1 hour"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        q = (
            agg.writeStream.format("memory")
            .queryName("tfk_state_growth")
            .outputMode("append")
            .option("checkpointLocation", scratch_dir("state_growth_ckpt_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        progresses = [p for p in q.recentProgress if p["stateOperators"]]
    finally:
        if prev_provider is None:
            spark.conf.unset(conf)
        else:
            spark.conf.set(conf, prev_provider)
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)

    assert progresses, "no stateful progress recorded"
    # the event corpus spans ~30 days ⇒ ~720 hourly windows; with a 2-hour
    # watermark over 4 shuffled files the watermark only advances between
    # batches, so live state may hold up to ~one batch's window span, but
    # NEVER the whole stream's windows times re-opened late state
    last = progresses[-1]["stateOperators"][0]
    n_windows = 24 * 31
    assert 0 < last["numRowsTotal"] <= n_windows, last
    # shuffled arrival MUST have produced late rows that the watermark
    # dropped instead of buffering (that drop is the state bound)
    dropped = sum(
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in progresses
    )
    assert dropped > 0, progresses


def test_pack_bestfit_invariants(spark, registry):
    """FFD packing (no SQL oracle): every bin respects the 512 budget,
    fill+waste == budget, every doc lands in exactly one bin, and the
    manifest is deterministic across runs. Best-fit must also never use
    MORE bins than the naive concat packer's ceiling for that shard."""
    from pyspark.sql import functions as F

    from training_feed_kinesis_spark.tables import load_table

    out = registry["llm_pack_bestfit"].fn(spark, SF_DIR).cache()
    rows = out.collect()
    assert rows, "empty packing manifest"
    for r in rows:
        assert 0 < r.fill <= 512, r
        assert r.fill + r.waste == 512, r
        assert r.n_docs >= 1, r

    d = load_table(spark, SF_DIR, "documents").select(
        "lang", F.size(F.split("text", " ")).cast("long").alias("tok")
    )
    per_lang = {
        r.lang: (r.n, r.toks)
        for r in d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.least("tok", F.lit(512))).alias("toks"),
        )
        .collect()
    }
    packed = {
        r.lang: (r.docs, r.bins)
        for r in out.groupBy("lang")
        .agg(F.sum("n_docs").alias("docs"), F.count(F.lit(1)).alias("bins"))
        .collect()
    }
    assert set(packed) == set(per_lang)
    for lang, (docs, bins) in packed.items():
        n, toks = per_lang[lang]
        assert docs == n, f"{lang}: {docs} packed != {n} docs"
        # lower bound: can't beat ceil(total_tokens / budget)
        assert bins >= -(-toks // 512), (lang, bins, toks)

    again = sorted(
        (r.lang, r.bin_id, r.n_docs, r.fill)
        for r in registry["llm_pack_bestfit"].fn(spark, SF_DIR).collect()
    )
    first = sorted((r.lang, r.bin_id, r.n_docs, r.fill) for r in rows)
    assert again == first, "packing not deterministic"
    out.unpersist()


def test_compression_ratio_matches_plain_python(spark, registry):
    """The pandas-UDF zlib ratio (rows-only for the driver) recomputed in
    plain Python over the raw parquet must agree per language slice."""
    import zlib

    import duckdb
    from pyspark.sql import functions as F  # noqa: F401

    got = {
        r.lang: (r.n_docs, r.avg_ratio)
        for r in registry["llm_compression_ratio"].fn(spark, SF_DIR).collect()
    }
    rows = duckdb.sql(
        f"SELECT lang, text FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    agg: dict = {}
    for lang, text in rows:
        b = text.encode("utf-8")
        r = len(zlib.compress(b, 6)) / max(len(b), 1)
        n, s = agg.get(lang, (0, 0.0))
        agg[lang] = (n + 1, s + r)
    assert set(got) == set(agg)
    for lang, (n, s) in agg.items():
        assert got[lang][0] == n
        assert abs(got[lang][1] - round(s / n, 4)) <= 1e-4, lang


def test_wav_decode_is_a_real_parser():
    """The multimodal feature kernel must actually parse the RIFF
    container: corrupting the magic or the fmt tag must raise, and a
    hand-built WAV with known samples must decode to exact features —
    no Spark needed, the kernel is a plain Arrow-batch function."""
    import pandas as pd
    import pytest as _pt

    from training_feed_kinesis_spark.operators.multimodal import (
        _wav_decode_batch,
        _wav_encode_batch,
    )

    enc = next(
        _wav_encode_batch(
            iter([pd.DataFrame({"doc_id": [7], "payload": [bytes(range(16))]})])
        )
    )
    wav = bytes(enc["wav"][0])
    out = next(_wav_decode_batch(iter([pd.DataFrame({"doc_id": [7], "wav": [wav]})])))
    r = out.iloc[0]
    assert (
        r["channels"],
        r["sample_rate"],
        r["bits_per_sample"],
        r["n_samples"],
    ) == (1, 8000 + (7 % 3) * 4000, 8, 16)
    assert r["mean_amplitude"] == sum(range(16)) / 16.0
    for pos in (0, 12):  # RIFF magic, fmt tag
        bad = wav[:pos] + b"X" + wav[pos + 1 :]
        with _pt.raises(ValueError):
            next(_wav_decode_batch(iter([pd.DataFrame({"doc_id": [7], "wav": [bad]})])))


def test_tws_sessionizer_matches_batch_when_available(spark, registry, duck):
    """transformWithStateInPandas sessionizer (4th independent spelling)
    must equal the shared session oracle — skipped where google.protobuf
    (a hard dependency of Spark's TWS Python runner) is absent, in which
    case the key is deliberately unregistered so the driver never samples
    an unrunnable operator."""
    from training_feed_kinesis_spark.streaming.queries import HAS_PROTOBUF

    if not HAS_PROTOBUF:
        assert "stream_stateful_tws" not in registry
        pytest.skip("google.protobuf absent: transformWithState runner cannot start")
    from .conftest import assert_matches_oracle

    spec = registry["stream_stateful_tws"]
    assert_matches_oracle(spec.fn(spark, SF_DIR), duck, spec.oracle)


def test_sketch_merge_within_hll_error(spark, registry):
    """agg_sketch_merge is rows-only (HLL is approx) but not assertion-free:
    the union-merged monthly estimate must land within the sketch's design
    error (lgK=12 → rsd≈1.6%; 5% ≈ 3σ) of the oracled exact distinct count,
    and the day count must equal the calendar days present."""
    from pyspark.sql import functions as F

    from training_feed_kinesis_spark.tables import load_table

    r = registry["agg_sketch_merge"].fn(spark, SF_DIR).collect()[0]
    ev = load_table(spark, SF_DIR, "events")
    exact = ev.select(F.countDistinct("user_id")).first()[0]
    days = ev.select(F.countDistinct(F.dayofmonth("ts"))).first()[0]
    assert r["n_days"] == days
    assert abs(r["approx_monthly_users"] - exact) <= max(0.05 * exact, 1), (
        r["approx_monthly_users"],
        exact,
    )


def test_schema_drift_flags_all_three_change_classes(spark, registry):
    """dq_schema_drift is rows-only (its subject is parquet footers) but the
    v1/v2 writer schemas are KNOWN: props was dropped (removed), schema_ver
    appeared (added), value narrowed double→float (type_changed), and every
    other column is unchanged — assert the exact verdict per column."""
    out = {
        r["column"]: (r["verdict"], r["v1_type"], r["v2_type"])
        for r in registry["dq_schema_drift"].fn(spark, SF_DIR).collect()
    }
    assert out["props"][0] == "removed"
    assert out["schema_ver"][0] == "added"
    assert out["value"] == ("type_changed", "double", "float")
    for c in ("event_id", "ts", "user_id", "event_type"):
        assert out[c][0] == "unchanged", (c, out[c])


def test_file_lineage_partitions_row_space(spark, registry):
    """scan_file_lineage is rows-only (paths are environment-specific) but
    its accounting is exact: per-file row_index must be dense 0..n-1 and
    the file totals must partition the table row count."""
    from training_feed_kinesis_spark.tables import load_table

    rows = registry["scan_file_lineage"].fn(spark, SF_DIR).collect()
    total = load_table(spark, SF_DIR, "documents").count()
    assert sum(r["n_rows"] for r in rows) == total
    for r in rows:
        assert r["first_row"] == 0
        assert r["last_row"] == r["n_rows"] - 1


def test_mapinpandas_is_a_partition_of_the_input(spark, registry):
    """udf_mapinpandas is rows-only (batch numbering has no SQL analogue)
    but conservation is exact: the output must contain every event exactly
    once, and each reported batch size must be positive."""
    from pyspark.sql import functions as F

    from training_feed_kinesis_spark.tables import load_table

    out = registry["udf_mapinpandas"].fn(spark, SF_DIR)
    ev = load_table(spark, SF_DIR, "events")
    assert out.count() == ev.count()
    assert (
        out.select("event_id").distinct().count()
        == ev.select("event_id").distinct().count()
    )
    assert out.filter(F.col("batch_rows") <= 0).count() == 0


def test_histogram_numeric_mass_and_bounds(spark, registry):
    """agg_histogram_numeric is rows-only (centroids are approx) but two
    invariants are exact by construction of Ben-Haim/Tom-Tov merges: bin
    heights per group sum to the group's row count (mass conservation) and
    every centroid lies inside the group's [min, max] value range."""
    from pyspark.sql import functions as F

    from training_feed_kinesis_spark.tables import load_table

    hist = registry["agg_histogram_numeric"].fn(spark, SF_DIR).collect()
    ev = load_table(spark, SF_DIR, "events")
    stats = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .collect()
    }
    by_type: dict = {}
    for r in hist:
        by_type.setdefault(r["event_type"], []).append(r)
    assert by_type.keys() == stats.keys()
    for et, bins in by_type.items():
        assert len(bins) <= 10
        assert abs(sum(b["height"] for b in bins) - stats[et]["n"]) < 1e-6
        for b in bins:
            assert stats[et]["lo"] - 1e-9 <= b["centroid"] <= stats[et]["hi"] + 1e-9


def test_codec_sizes_reported_and_content_identical(spark, registry):
    """sink_parquet_codecs oracles content digests; the environment-
    dependent half (file sizes) is asserted here: every codec produced
    nonempty data files, and zstd/gzip compress no worse than half again
    of snappy's size on this data (loose sanity bound, not a benchmark)."""
    import glob
    import os

    from training_feed_kinesis_spark.operators.scans import SCRATCH

    # snapshot-and-diff instead of glob-latest: any OTHER invocation of
    # the key (e.g. the empty-corpus replay) also writes codec_* scratch
    # dirs, and "latest by name" may pick one of those up
    before = set(glob.glob(os.path.join(SCRATCH, "codec_*")))
    rows = registry["sink_parquet_codecs"].fn(spark, SF_DIR).collect()
    digests = {r["codec"]: r["content_digest"] for r in rows}
    assert len(set(digests.values())) == 1, digests
    new_dirs = set(glob.glob(os.path.join(SCRATCH, "codec_*"))) - before

    sizes = {}
    for codec in ("snappy", "zstd", "gzip"):
        dirs = [d for d in new_dirs if f"codec_{codec}_" in d]
        assert dirs, codec
        sizes[codec] = sum(
            os.path.getsize(os.path.join(d, f))
            for d in dirs
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )
    assert all(v > 0 for v in sizes.values()), sizes
    assert sizes["zstd"] <= 1.5 * sizes["snappy"], sizes


def test_isotonic_fit_is_monotone_and_mean_preserving(spark, registry):
    """The minimax isotonic fit must be (a) non-decreasing in score and
    (b) mass-preserving: sum(n * iso) == sum(k) (the pooled means
    property of least-squares isotonic regression)."""
    rows = sorted(
        registry["ml_isotonic_calibration"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["score"],
    )
    assert len(rows) > 10
    for a, b in zip(rows, rows[1:]):
        assert a["isotonic_rate"] <= b["isotonic_rate"] + 1e-9
    mass = sum(r["n"] * r["isotonic_rate"] for r in rows)
    k_tot = sum(r["k"] for r in rows)
    # iso is rounded to 4dp per row → tolerance scales with total n
    assert abs(mass - k_tot) <= 1e-4 * sum(r["n"] for r in rows) + 1e-6


def test_shapley_r2_sums_to_full(spark, registry):
    """Shapley efficiency axiom: the two attributions must sum to the
    full-model R² (within the 4dp rounding of each term)."""
    r = registry["ml_shapley_r2"].fn(spark, SF_DIR).collect()[0]
    assert abs((r["shapley_x1"] + r["shapley_x2"]) - r["r2_full"]) <= 2e-4, r
    assert 0 <= r["r2_full"] <= 1


def test_heaps_curve_monotone_and_conserving(spark, registry):
    """Vocabulary and token counts must be non-decreasing in subset size,
    and new_types must sum to the full vocabulary."""
    rows = sorted(
        registry["llm_heaps_law_curve"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["subset_pct"],
    )
    assert [r["subset_pct"] for r in rows] == [25, 50, 100]
    for a, b in zip(rows, rows[1:]):
        assert a["n_tokens"] < b["n_tokens"]
        assert a["vocab_size"] <= b["vocab_size"]
    assert sum(r["new_types"] for r in rows) == rows[-1]["vocab_size"]


def test_watermark_null_corpus_not_flagged(spark, registry):
    """The synthetic corpus is not watermarked with this key: green
    shares must sit near 0.5 and no source may be flagged (a flag here
    would mean the detector's null calibration is wrong)."""
    rows = registry["llm_watermark_detect"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert not r["flagged"], r
        assert 0.4 <= r["green_share"] <= 0.6, r


def test_peak_concurrency_bounded_by_active_users(spark, registry):
    """Daily peak concurrent sessions can never exceed that day's
    distinct active users (each user has at most one open session)."""
    from pyspark.sql import functions as F

    from training_feed_kinesis_spark.tables import load_table

    peaks = {
        r["day"]: r["peak_concurrent"]
        for r in registry["events_peak_concurrency"].fn(spark, SF_DIR).collect()
    }
    ev = load_table(spark, SF_DIR, "events")
    actives = {
        r["day"]: r["n"]
        for r in ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert peaks
    for day, peak in peaks.items():
        # sessions can span midnight: allow the previous day's actives too
        cap = actives.get(day, 0) + max(actives.values())
        assert 0 < peak <= cap, (day, peak)


def test_watermark_gap_census_conserves_rows(spark, registry):
    """stream_watermark_gap_census: every input row is attributed to
    exactly one of emitted / late_dropped / silent_gap (SURVEY §5.3.7b).
    The interleaved replay guarantees genuine late drops, and the silent
    gap — rows between watermarkForLateEvents and watermarkForEviction —
    must be nonnegative and bounded by the dropped volume (it is the
    sliver the late filter admits but eviction already finalized)."""
    row = registry["stream_watermark_gap_census"].fn(spark, SF_DIR).collect()[0]
    assert row["input_rows"] == (
        row["emitted_rows"] + row["late_dropped"] + row["silent_gap"]
    ), row
    assert row["late_dropped"] > 0, row
    assert 0 <= row["silent_gap"] <= row["late_dropped"], row
    assert row["n_data_batches"] == 5, row  # 4 data files + sentinel
    if SF_DIR.endswith("sf0.001"):
        # The replay is fully deterministic, so pin the EXACT partition
        # (measured twice identical, 2026-08-14): a Spark version bump that
        # changes the watermarkForLateEvents/watermarkForEviction gap
        # semantics must fail loudly here, not drift silently. If the
        # testdata regenerates, re-measure and re-pin.
        assert (
            row["input_rows"],
            row["emitted_rows"],
            row["late_dropped"],
            row["silent_gap"],
        ) == (1000, 502, 495, 3), row


def test_registry_survey_ledger_parity(registry):
    """SURVEY.md IS the contract (§0.1), so the ledger must not drift from
    the registry (VERDICT r4 item 5): every registered key must appear in
    SURVEY.md as a backticked `key`, and every key cell in a §2 table must
    name a registered operator. Environment-gated keys that cannot
    register in this container are the only allowed exceptions."""
    import pathlib
    import re

    survey = (
        pathlib.Path(__file__).resolve().parents[1] / "SURVEY.md"
    ).read_text()
    undocumented = [k for k in registry if f"`{k}`" not in survey]
    assert not undocumented, (
        f"{len(undocumented)} registry keys missing from SURVEY.md "
        f"(add a §2.L ledger row): {undocumented[:20]}"
    )
    # gated on google.protobuf (Spark's TWS runner requirement) — documented
    # in §2.L round 3 but unregistrable in this container
    env_gated = {"stream_stateful_tws"}
    in_s2, stale = False, []
    for line in survey.splitlines():
        if line.startswith("## "):
            in_s2 = line.startswith("## §2")
        if in_s2:
            for key in re.findall(r"`([a-z][a-z0-9_]+)`", line.split("|")[1] if line.startswith("| `") else ""):
                if key not in registry and key not in env_gated:
                    stale.append(key)
    assert not stale, f"SURVEY §2 table keys not in registry: {stale}"


def test_contamination_hashed_shingles_equivalent(spark, registry, monkeypatch):
    """llm_contamination's TFK_HASH_SHINGLES=1 path (xxhash64 8-byte
    shuffle keys — the 100 TB spelling) must produce IDENTICAL results to
    the string-key oracle path: hashing before the distinct/semi-join can
    only diverge on a 64-bit collision between distinct corpus shingles,
    which the test corpus cannot produce."""
    fn = registry["llm_contamination"].fn
    monkeypatch.delenv("TFK_HASH_SHINGLES", raising=False)
    plain = sorted(
        (r["doc_id"], r["n_shared"]) for r in fn(spark, SF_DIR).collect()
    )
    monkeypatch.setenv("TFK_HASH_SHINGLES", "1")
    hashed_df = fn(spark, SF_DIR)
    hashed = sorted(
        (r["doc_id"], r["n_shared"]) for r in hashed_df.collect()
    )
    assert plain and plain == hashed
    # and the hashed plan must actually shuffle BIGINT keys (xxhash64
    # applied below the exchange), not strings
    plan = hashed_df._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in plan, plan


def test_dedup_tier_census_nonvacuous_and_monotone(spark, registry):
    """llm_dedup_tier_census: the tier ladder must be monotone
    (distinct_raw ≥ distinct_bag ≥ distinct_set) and NON-vacuous on this
    corpus — the word-set tier is the first that collapses documents, so
    a census reporting zero everywhere means a key stopped canonicalizing."""
    r = registry["llm_dedup_tier_census"].fn(spark, SF_DIR).collect()[0]
    assert r["n_docs"] >= r["distinct_raw"] >= r["distinct_bag"] >= r["distinct_set"], r
    assert r["extra_set"] > 0, r
    assert r["dups_raw"] + r["extra_bag"] + r["extra_set"] == (
        r["n_docs"] - r["distinct_set"]
    ), r


def test_rev_s_constants_identical():
    """workloads._REV_S is a textual duplicate of workloads_tpch._REV_S
    (an import would flip the modules' registration order, which the
    driver's sample-window rotation keys off). Pin them equal so the
    spellings can't drift apart."""
    from training_feed_kinesis_spark.operators import workloads, workloads_tpch

    assert workloads._REV_S == workloads_tpch._REV_S


@pytest.mark.parametrize(
    "key",
    [
        "agg_basic",
        "q9_product_profit",
        "q11_important_parts",
        "q3_shipping_priority",
        "rollup_rank_report",
        "revenue_pareto",
        # §5.3.6c decimal-widened accumulators: exactness (and thus
        # partition invariance) must survive the DECIMAL(38,0) widening
        "revenue_abc_class",
        "customer_gini",
        "ts_cusum_changepoint",
        "win_ratio_to_report",
    ],
)
def test_money_results_partition_invariant(spark, registry, key):
    """The §5.3.6b campaign's core claim, pinned: exact-integer money
    arithmetic makes these results BIT-identical under different shuffle
    partition counts (different reduction orders). A double-sum spelling
    regressing into any of these keys shows up here as a last-ulp (or
    ROUND-boundary) difference between the two runs."""
    spec = registry[key]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    prev_coalesce = spark.conf.get(
        "spark.sql.adaptive.coalescePartitions.enabled", "true"
    )

    def run(n):
        # coalescing OFF: at test scale AQE would merge both the 3- and
        # 17-partition shuffles down to the same post-shuffle layout,
        # giving both runs the same reduction order and making the pin
        # vacuous (code review r6)
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions", str(n))
        try:
            return sorted(repr(r) for r in spec.fn(spark, SF_DIR).collect())
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
            spark.conf.set(
                "spark.sql.adaptive.coalescePartitions.enabled", prev_coalesce
            )

    a, b = run(3), run(17)
    assert a == b


def test_dup_span_census_nonvacuous_and_bounded(spark, registry):
    """llm_dup_span_census must DISCRIMINATE on this corpus: some but not
    all documents carry a cross-doc 24-char span (at SPAN_K=24 roughly
    half do — at 12 every doc shares vocabulary-level grams and the
    census degenerates). Spans must stay inside their document and the
    merged-span accounting must be internally consistent."""
    from training_feed_kinesis_spark.operators.ops_wave96 import SPAN_K
    from training_feed_kinesis_spark.tables import load_table

    rows = registry["llm_dup_span_census"].fn(spark, SF_DIR).collect()
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert 0 < len(rows) < n_docs, (len(rows), n_docs)
    for r in rows:
        assert r["n_spans"] >= 1, r
        # each merged span is at least one full gram long
        assert r["dup_chars"] >= SPAN_K * 1, r
        assert r["dup_chars"] <= r["doc_len"], r
        assert 0 < r["dup_frac_x1e4"] <= 10000, r


def test_twostage_rerank_dominates_sq8(spark, registry):
    """Two-stage retrieval (SQ8 shortlist of 25 → exact rerank) can never
    recall FEWER exact top-5 neighbors than plain SQ8 top-5: the
    shortlist is a superset of the code-ranking top-5, and the exact
    rerank always surfaces any true top-5 member the shortlist contains.
    A violation means the two keys' stage-1 rankings drifted apart."""
    two = {
        r["probe"]: r["hits"]
        for r in registry["vec_twostage_rerank"].fn(spark, SF_DIR).collect()
    }
    sq8 = {
        r["probe"]: r["hits"]
        for r in registry["vec_sq8_recall"].fn(spark, SF_DIR).collect()
    }
    assert set(two) == set(sq8) and len(two) == 10, (two, sq8)
    assert all(two[p] >= sq8[p] for p in two), (two, sq8)
    # non-vacuity: the rerank must actually recover something
    assert sum(two.values()) > 0, two


def test_dup_span_census_hashed_grams_equivalent(spark, registry, monkeypatch):
    """llm_dup_span_census's TFK_HASH_SHINGLES=1 path (8-byte xxhash64
    gram keys — the 100 TB shuffle spelling) must produce IDENTICAL
    results to the md5-hex oracle path, and the hashed plan must really
    shuffle BIGINT keys (xxhash64 below the exchange), not strings."""
    fn = registry["llm_dup_span_census"].fn
    monkeypatch.delenv("TFK_HASH_SHINGLES", raising=False)
    plain = sorted(tuple(r) for r in fn(spark, SF_DIR).collect())
    monkeypatch.setenv("TFK_HASH_SHINGLES", "1")
    hashed_df = fn(spark, SF_DIR)
    hashed = sorted(tuple(r) for r in hashed_df.collect())
    assert plain and plain == hashed
    plan = hashed_df._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in plan, plan
