"""Wave 52: feed abuse audit, latency distribution, embedding energy,
exact kNN eval, chained stateful streaming aggregation.

  * ``events_rate_limit_audit``: per-user burst hours over a rate
    threshold — the abuse/bot gate a feed runs before letting a
    producer's events into training data.
  * ``orders_ship_latency``: order→ship latency distribution per
    priority class (exact percentiles) — the operational-latency report
    shape on the TPC-H substrate.
  * ``vec_energy_profile``: per-label share of vector energy in the
    first k dims (k = 8/16/32/64) — the measurement that justifies (or
    vetoes) Matryoshka-style prefix truncation before ANN.
  * ``ml_knn_eval``: leave-one-out k-NN label accuracy on integer-exact
    quantized distances — the classifier-free embedding-quality number.
  * ``stream_chained_aggs``: TWO stateful windowed aggregations chained
    in one streaming query (15-min counts → hourly peak), the multi-
    stateful-operator capability Spark added in 3.4+ — drained ≡ the
    batch double aggregate.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from .llm_similarity import VEC_ADMIT_SQL, load_embeddings_admitted
from ..tables import load_table, sane_ts

CAT_REP = "2.L reporting"
CAT_VEC = "2.J llm-pipeline (similarity)"
CAT_ML = "2.L relational ML"
CAT_STREAM = "2.I streaming"

_BURST_THRESHOLD = 3  # events per user-hour that flags a burst


@register(
    "events_rate_limit_audit",
    CAT_REP,
    f"""
    WITH per_hour AS (
      SELECT user_id, date_trunc('hour', ts) AS hr, COUNT(*)::BIGINT AS n
      FROM events GROUP BY 1, 2
    )
    SELECT user_id,
           COUNT(*)::BIGINT AS active_hours,
           COUNT(*) FILTER (WHERE n >= {_BURST_THRESHOLD})::BIGINT
             AS burst_hours,
           MAX(n)::BIGINT AS peak_rate,
           CAST(SUM(CASE WHEN n >= {_BURST_THRESHOLD} THEN n ELSE 0 END)
                AS BIGINT) AS burst_events
    FROM per_hour GROUP BY user_id
    HAVING COUNT(*) FILTER (WHERE n >= {_BURST_THRESHOLD}) > 0
    """,
)
def events_rate_limit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-limit audit: bucket each user's events into hours, flag hours
    at or above the burst threshold, and report per flagged user their
    burst-hour count, peak hourly rate, and how many events arrived
    inside bursts — the producer-abuse gate that runs before a feed's
    events are admitted to training (the enforcement twin of
    ``sample_user_cap``, which caps; this one measures and names).

    Scale shape: one groupBy(user, hour) with map-side partial counts,
    then an O(user-hours) per-user rollup — no window over raw events,
    no self-join. The threshold is a broadcast constant."""
    ev = load_table(spark, sf_dir, "events")
    per_hour = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count(F.lit(1)).alias("n"))
    burst = F.col("n") >= _BURST_THRESHOLD
    return (
        per_hour.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("active_hours"),
            F.sum(burst.cast("int")).cast("bigint").alias("burst_hours"),
            F.max("n").cast("bigint").alias("peak_rate"),
            F.sum(F.when(burst, F.col("n")).otherwise(0))
            .cast("bigint")
            .alias("burst_events"),
        )
        .filter(F.col("burst_hours") > 0)
    )


@register(
    "orders_ship_latency",
    CAT_REP,
    """
    WITH lat AS (
      SELECT o.o_orderpriority,
             date_diff('day', o.o_orderdate, l.l_shipdate) AS lat_days
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    )
    SELECT o_orderpriority,
           COUNT(*)::BIGINT AS n_lines,
           CAST(MIN(lat_days) AS BIGINT) AS min_days,
           ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY lat_days), 4)
             AS p50_days,
           ROUND(percentile_cont(0.95) WITHIN GROUP (ORDER BY lat_days), 4)
             AS p95_days,
           CAST(MAX(lat_days) AS BIGINT) AS max_days
    FROM lat GROUP BY o_orderpriority
    """,
)
def orders_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order→ship latency distribution per priority class: exact P50/P95
    plus min/max of (l_shipdate − o_orderdate) in days — the operational
    SLA report (does URGENT actually ship faster?). Integer day deltas
    keep the percentile inputs exact; only the interpolated percentile
    itself is a rounded double.

    Scale shape: one fact-fact equi join on the shared orderkey (both
    sides shuffle-partition on it; bucketed layout makes it co-located),
    then a 5-group exact-percentile aggregate."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lat = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "o_orderpriority",
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias("lat_days"),
    )
    return lat.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.min("lat_days").cast("bigint").alias("min_days"),
        F.round(F.expr("percentile(lat_days, 0.5)"), 4).alias("p50_days"),
        F.round(F.expr("percentile(lat_days, 0.95)"), 4).alias("p95_days"),
        F.max("lat_days").cast("bigint").alias("max_days"),
    )


@register(
    "vec_energy_profile",
    CAT_VEC,
    # prefix-energy shares from BIGINT-quantized squared values: the
    # numerator/denominator are exact integer sums, so the only double
    # is the final rounded ratio
    f"""
    WITH {VEC_ADMIT_SQL},
    sq AS (
      SELECT label, vec_id, pos,
             CAST(ROUND(CAST(embedding[pos] AS DOUBLE) * 10000, 0) AS BIGINT)
               * CAST(ROUND(CAST(embedding[pos] AS DOUBLE) * 10000, 0) AS BIGINT)
               AS e2
      FROM embeddings_adm, (SELECT unnest(range(1, 65)) AS pos)
    ),
    per_vec AS (
      SELECT label, vec_id, k,
             SUM(CASE WHEN pos <= k THEN e2 ELSE 0 END) AS pre,
             SUM(e2) AS tot
      FROM sq, (SELECT unnest([8, 16, 32, 64]) AS k)
      GROUP BY label, vec_id, k
    )
    SELECT label, k,
           COUNT(*)::BIGINT AS n_vectors,
           ROUND(AVG(CAST(pre AS DOUBLE) / tot), 4) AS energy_share
    FROM per_vec GROUP BY label, k
    """,
)
def vec_energy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-energy profile: per label and prefix length k ∈ {8,16,32,64},
    the mean fraction of a vector's squared norm carried by its first k
    dims. This is the go/no-go measurement for Matryoshka-style prefix
    truncation (``vec_trunc_recall`` measures the recall consequence;
    this explains it): if energy_share at k=16 is already ~k/64, the
    embedding spreads information uniformly and truncation costs recall
    proportionally. Squared values quantize to BIGINTs first, so the
    per-vector shares divide exact integers.

    Scale shape: posexplode → per-(vector, k) conditional sums (map-side
    partial over 64·4 terms per vector) → O(labels × 4) final groups."""
    em = load_embeddings_admitted(spark, sf_dir)
    sq = em.select(
        "label",
        "vec_id",
        F.posexplode(
            F.expr(
                "transform(embedding, x -> cast(round(cast(x AS double) * 10000, 0)"
                " AS bigint) * cast(round(cast(x AS double) * 10000, 0) AS bigint))"
            )
        ).alias("pos0", "e2"),
    ).select("label", "vec_id", (F.col("pos0") + 1).alias("pos"), "e2")
    ks = spark.range(1).select(
        F.explode(F.array(*[F.lit(k) for k in (8, 16, 32, 64)])).alias("k")
    )
    per_vec = (
        sq.crossJoin(F.broadcast(ks))
        .groupBy("label", "vec_id", "k")
        .agg(
            F.sum(F.when(F.col("pos") <= F.col("k"), F.col("e2")).otherwise(0)).alias(
                "pre"
            ),
            F.sum("e2").alias("tot"),
        )
    )
    return per_vec.groupBy("label", "k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        F.round(F.avg(F.col("pre").cast("double") / F.col("tot")), 4).alias(
            "energy_share"
        ),
    )


_KNN_K = 5


@register(
    "ml_knn_eval",
    CAT_ML,
    # integer-exact distances (quantized BIGINT squared L2) make the
    # neighbor ranking deterministic; majority vote ties break toward
    # the smaller label on both engines
    f"""
    WITH {VEC_ADMIT_SQL},
    q AS (
      SELECT vec_id, label,
             list_transform(embedding, x ->
               CAST(ROUND(CAST(x AS DOUBLE) * 10000, 0) AS BIGINT)) AS vq
      FROM embeddings_adm
    ),
    pairs AS (
      SELECT a.vec_id, a.label AS true_label, b.label AS cand_label,
             list_sum(list_transform(range(1, 65),
               i -> (a.vq[i] - b.vq[i]) * (a.vq[i] - b.vq[i]))) AS d2,
             b.vec_id AS cand_id
      FROM q a JOIN q b ON a.vec_id != b.vec_id
      WHERE a.vec_id < 500
    ),
    topk AS (
      SELECT vec_id, true_label, cand_label,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cand_id)
               AS rn
      FROM pairs
    ),
    votes AS (
      SELECT vec_id, true_label, cand_label, COUNT(*) AS v
      FROM topk WHERE rn <= {_KNN_K}
      GROUP BY vec_id, true_label, cand_label
    ),
    pred AS (
      SELECT vec_id, true_label, cand_label AS pred_label,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY v DESC, cand_label NULLS LAST) AS pr
      FROM votes
    )
    SELECT true_label AS label,
           COUNT(*)::BIGINT AS n_vectors,
           CAST(SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           ROUND(SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 4) AS accuracy
    FROM pred WHERE pr = 1
    GROUP BY true_label
    """,
)
def ml_knn_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out k-NN (k=5) label accuracy per class — the
    classifier-free measure of how label-separable the embedding space
    is (random labels → accuracy ≈ 1/n_classes; clustered labels → high).
    Distances are integer-exact (quantized BIGINT squared L2), so the
    neighbor ranking and majority vote are bit-reproducible across
    engines; vote ties break toward the smaller label.

    Scale note: the probe side is a FIXED 500-vector evaluation panel
    (vec_id < 500 — deterministic, engine-portable) scanned exactly
    against the full corpus: eval cost is O(panel × corpus), never
    O(corpus²), and the panel estimate of LOO accuracy is unbiased. At
    corpus scale the candidate set additionally comes from the IVF
    router (llm_sim_ivf) or LSH buckets and THIS plan runs unchanged on
    the pruned pairs. The probe panel broadcasts; ranking shuffles only
    (vec_id, cand, d2) triples."""
    em = load_embeddings_admitted(spark, sf_dir)
    q = em.select(
        "vec_id",
        "label",
        F.expr(
            "transform(embedding, x -> cast(round(cast(x AS double) * 10000, 0)"
            " AS bigint))"
        ).alias("vq"),
    )
    a = q.filter(F.col("vec_id") < 500).select(
        F.col("vec_id").alias("a_id"),
        F.col("label").alias("true_label"),
        F.col("vq").alias("a_vq"),
    )
    b = q.select(
        F.col("vec_id").alias("cand_id"),
        F.col("label").alias("cand_label"),
        F.col("vq").alias("b_vq"),
    )
    d2 = F.expr(
        "aggregate(zip_with(a_vq, b_vq, (x, y) -> (x - y) * (x - y)),"
        " 0L, (acc, v) -> acc + v)"
    )
    pairs = (
        F.broadcast(a)
        .join(b, F.col("a_id") != F.col("cand_id"))
        .select("a_id", "true_label", "cand_label", "cand_id", d2.alias("d2"))
    )
    w_rank = Window.partitionBy("a_id").orderBy("d2", "cand_id")
    topk = pairs.withColumn("rn", F.row_number().over(w_rank)).filter(
        F.col("rn") <= _KNN_K
    )
    votes = topk.groupBy("a_id", "true_label", "cand_label").agg(
        F.count(F.lit(1)).alias("v")
    )
    # NULLS LAST pinned both engines (Spark ASC = NULLS FIRST, DuckDB =
    # NULLS LAST): same latent tie divergence the NULL-attribute replay
    # caught in ml_knn_classify
    w_vote = Window.partitionBy("a_id").orderBy(
        F.col("v").desc(), F.col("cand_label").asc_nulls_last()
    )
    pred = votes.withColumn("pr", F.row_number().over(w_vote)).filter(
        F.col("pr") == 1
    )
    correct = F.when(F.col("cand_label") == F.col("true_label"), 1).otherwise(0)
    return pred.groupBy(F.col("true_label").alias("label")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        F.sum(correct).cast("bigint").alias("n_correct"),
        F.round(F.sum(correct) / F.count(F.lit(1)).cast("double"), 4).alias(
            "accuracy"
        ),
    )


@register(
    "stream_chained_aggs",
    CAT_STREAM,
    # drained chained stateful aggs ≡ batch double aggregate
    """
    WITH q AS (
      SELECT time_bucket(INTERVAL '15 minutes', ts) AS w15, event_type,
             COUNT(*)::BIGINT AS n
      FROM events WHERE ts IS NOT NULL AND (ts IS NULL OR (ts >= TIMESTAMP '1970-01-01' AND ts < TIMESTAMP '2200-01-01')) GROUP BY 1, 2
    )
    SELECT date_trunc('hour', w15) AS hour_start, event_type,
           MAX(n)::BIGINT AS peak_quarter_hour,
           CAST(SUM(n) AS BIGINT) AS total
    FROM q GROUP BY 1, 2
    """,
)
def stream_chained_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO stateful aggregations chained inside ONE streaming query —
    15-minute counts re-aggregated to the hourly peak quarter-hour via
    ``window_time`` (the multiple-stateful-operator support Spark added
    in 3.4; before it this required two queries glued by a sink). The
    first agg's windows finalize on watermark advance and feed the
    second as append-mode rows; the far-future sentinel flushes both
    levels before AvailableNow terminates. Drained ≡ the batch double
    aggregate, which is exactly what the oracle computes.

    State shape at scale: level 1 holds keys × open 15-min windows,
    level 2 keys × open hours — both watermark-bounded; the chain saves
    a full sink/re-read round trip and a second checkpoint."""
    from ..streaming.replay import drain, replay_stream

    # NULL event-time rows dropped on both engines (r8 NULL-time seam)
    stream = replay_stream(spark, sf_dir, "ordered", sentinel=True).filter(
        F.col("ts").isNotNull() & sane_ts("ts")  # temporal admission (r12)
    )
    q15 = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "15 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    hourly = q15.groupBy(
        F.window(F.window_time("window"), "1 hour"), "event_type"
    ).agg(
        F.max("n").alias("peak_quarter_hour"),
        F.sum("n").alias("total"),
    )
    res = drain(hourly, "append")
    return res.filter(F.col("event_type") != "sentinel").select(
        F.col("window.start").alias("hour_start"),
        "event_type",
        F.col("peak_quarter_hour").cast("bigint"),
        F.col("total").cast("bigint"),
    )
