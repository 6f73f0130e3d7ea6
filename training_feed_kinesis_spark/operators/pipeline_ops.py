"""§2.N Pipeline utilities — the ops a production feed runs around the queries.

Data-quality gating, CDC compaction, slowly-changing-dimension history, and
embedding quantization: each is a standard component of a training-data
platform (validate the feed, compact the changelog, keep state history,
shrink the vector footprint), expressed as pure DataFrame compositions with
DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load_table, sane_ts, sane_ts_sql

CAT = "2.N pipeline utilities"


@register(
    "dq_constraints",
    CAT,
    """
    WITH s AS (
      SELECT COUNT(*) AS n_rows,
             COUNT(*) FILTER (WHERE o_totalprice <= 0) AS v_price,
             COUNT(*) FILTER (WHERE o_orderstatus NOT IN ('F','O','P')) AS v_status,
             COUNT(*) FILTER (WHERE o_orderdate <  TIMESTAMP '1995-01-01'
                                 OR o_orderdate >= TIMESTAMP '2002-01-01') AS v_date
      FROM orders),
    fk AS (
      SELECT COUNT(*) AS v_orphan
      FROM orders LEFT JOIN customer ON o_custkey = c_custkey
      WHERE c_custkey IS NULL)
    SELECT 'price_nonpositive' AS rule, v_price AS n_violations, n_rows FROM s
    UNION ALL
    SELECT 'status_invalid', v_status, n_rows FROM s
    UNION ALL
    SELECT 'date_out_of_range', v_date, n_rows FROM s
    UNION ALL
    SELECT 'custkey_orphan', v_orphan, (SELECT n_rows FROM s) FROM fk
    """,
)
def dq_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality report: violation counts for four rules
    (domain, set-membership, range, referential integrity) over one pass.

    The three row-local rules share a single scan (one aggregate computing
    all counters via count_if); the FK rule is a broadcast anti-join count.
    The per-rule layout comes from unpivoting the 1-row aggregate — rules
    scale without rescanning. At 100 TB this is the shape of an
    expectations suite: O(rules) counters, O(1) passes.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    s = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(F.col("o_totalprice") <= 0).alias("v_price"),
        F.count_if(~F.col("o_orderstatus").isin("F", "O", "P")).alias("v_status"),
        F.count_if(
            (F.col("o_orderdate") < "1995-01-01")
            | (F.col("o_orderdate") >= "2002-01-01")
        ).alias("v_date"),
    )
    orphans = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("v_orphan"))
    )
    wide = s.crossJoin(F.broadcast(orphans))
    return wide.select(
        F.expr(
            "stack(4, "
            "'price_nonpositive', v_price, "
            "'status_invalid', v_status, "
            "'date_out_of_range', v_date, "
            "'custkey_orphan', v_orphan) AS (rule, n_violations)"
        ),
        "n_rows",
    )


@register(
    "cdc_latest_merge",
    CAT,
    """
    WITH ranked AS (
      SELECT user_id, ts, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE {sane})
    SELECT user_id, ts AS last_ts, event_type AS last_type,
           ROUND(value, 4) AS last_value
    FROM ranked
    WHERE rn = 1 AND event_type <> 'error'
    """.format(sane=sane_ts_sql("ts")),
)
def cdc_latest_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog compaction: latest-wins state per key, with tombstone
    semantics — a key whose newest change is an ``error`` event is treated
    as deleted and dropped from the merged snapshot.

    One window over (user_id, ts DESC, event_id DESC) — the event_id
    tiebreak makes the merge deterministic under equal timestamps
    (at-least-once replays land on the same winner). At 100 TB this runs
    per micro-batch over the delta only, then MERGEs into the snapshot;
    the full-history spelling here is the bootstrap/backfill path.
    """
    # temporal admission (r12): a 9999-12-31 sentinel would WIN the
    # latest-wins merge for its key forever — the classic CDC poisoning
    ev = load_table(spark, sf_dir, "events").filter(sane_ts("ts"))
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select(
            "user_id",
            F.col("ts").alias("last_ts"),
            F.col("event_type").alias("last_type"),
            F.round("value", 4).alias("last_value"),
        )
    )


@register(
    "scd2_intervals",
    CAT,
    """
    WITH marked AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN event_type = LAG(event_type) OVER w THEN 0 ELSE 1 END AS chg
      FROM events WHERE ts IS NOT NULL AND {sane}
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    islands AS (
      SELECT user_id, ts, event_type,
             CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island
      FROM marked)
    SELECT user_id, event_type AS state, island,
           MIN(ts) AS valid_from, MAX(ts) AS last_seen,
           COUNT(*) AS n_events
    FROM islands
    GROUP BY user_id, event_type, island
    """.format(sane=sane_ts_sql("ts")),
)
def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-type-2 history: collapse each user's event sequence into
    validity islands of consecutive identical states (gaps-and-islands via
    lag-change-flag + running sum), one row per island with its span.

    Both windows and the final aggregate partition by user_id — a single
    shuffle, reused across the three stages. This is the batch spelling of
    what `stream_stateful` maintains incrementally. NULL ts dropped on
    both engines (the r8 NULL-time seam: a NULL-ts row sits at opposite
    ends of the island order across engines and renumbers every island).
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & sane_ts("ts")  # r12 contract
    )
    wo = Window.partitionBy("user_id").orderBy("ts", F.col("event_id").asc_nulls_last())
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts", F.col("event_id").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = ev.withColumn(
        "chg",
        F.when(
            F.col("event_type") == F.lag("event_type").over(wo), F.lit(0)
        ).otherwise(F.lit(1)),
    )
    islands = marked.withColumn("island", F.sum("chg").over(wrun))
    return (
        islands.groupBy("user_id", F.col("event_type").alias("state"), "island")
        .agg(
            F.min("ts").alias("valid_from"),
            F.max("ts").alias("last_seen"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@register(
    "vec_quantize_int8",
    CAT,
    """
    WITH q AS (
      SELECT label,
             list_min(embedding)::DOUBLE AS mn,
             list_max(embedding)::DOUBLE AS mx,
             embedding
      FROM embeddings),
    err AS (
      SELECT label,
             CASE WHEN mx = mn THEN 0.0 ELSE
               list_avg(list_transform(embedding,
                 x -> pow(mn + round((x::DOUBLE - mn) / ((mx - mn) / 255.0))
                            * ((mx - mn) / 255.0) - x::DOUBLE, 2)))
             END AS mse
      FROM q)
    SELECT label, COUNT(*) AS n_vecs,
           ROUND(AVG(sqrt(mse)), 4) AS avg_rmse
    FROM err
    GROUP BY label
    """,
)
def vec_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector int8 scalar quantization (min/max affine, 256 levels) and
    its reconstruction error, reported as average RMSE per label — the
    measurement that decides whether a corpus's embeddings can ship
    quantized (4× smaller, broadcastable at 4× the row count).

    Everything runs inside array higher-order functions on the JVM — no
    explode, no UDF: per-row min/max, transform to squared reconstruction
    error, aggregate to MSE. Shuffle carries only (label, mse) pairs.
    """
    e = load_table(spark, sf_dir, "embeddings")
    q = e.select(
        "label",
        F.array_min("embedding").cast("double").alias("mn"),
        F.array_max("embedding").cast("double").alias("mx"),
        "embedding",
    )
    mse = F.when(F.col("mx") == F.col("mn"), F.lit(0.0)).otherwise(
        F.expr(
            "aggregate(transform(embedding, "
            "x -> pow(mn + round((cast(x AS DOUBLE) - mn) / ((mx - mn) / 255.0D)) "
            "* ((mx - mn) / 255.0D) - cast(x AS DOUBLE), 2)), "
            "0.0D, (a, b) -> a + b) / size(embedding)"
        )
    )
    return (
        q.select("label", mse.alias("mse"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg(F.sqrt("mse")), 4).alias("avg_rmse"),
        )
    )
