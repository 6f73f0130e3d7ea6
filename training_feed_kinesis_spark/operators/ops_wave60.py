"""Wave 60: built-in bitmap aggregates, SQL session variables, VARIANT
explosion, peak-concurrency sweep line.

  * ``agg_bitmap_builtin``: Spark 3.5's bitmap_construct_agg /
    bitmap_count surface for exact distinct counting — the built-in
    twin of the hand-rolled ``agg_bitmap``, verified against DuckDB's
    plain COUNT(DISTINCT).
  * ``sql_session_variables``: DECLARE / SET VAR / parameterized use —
    Spark 4's session-variable surface, oracled with inlined constants.
  * ``fn_variant_explode``: the VARIANT lateral table function (Spark 4)
    turning semi-structured arrays into typed rows.
  * ``events_peak_concurrency``: maximum concurrent user sessions per
    day via the classic +1/−1 sweep line over session endpoints.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from .exact import CENTS_SUM_SQL, cents_sum
from ..tables import load_table, sane_ts, sane_ts_sql

# exact integer-cents SUM of events.value, unrounded (r11 projected-
# magnitude lint, SURVEY 5.3.9a): total_value is a SUM-driven grower
_VAL_CENTS_SUM = CENTS_SUM_SQL.format(col="value")

CAT_AGG = "2.D aggregations"
CAT_SQL = "2.L sql surface"
CAT_FN = "2.H scalar functions"
CAT_REP = "2.L reporting"


@register(
    "agg_bitmap_builtin",
    CAT_AGG,
    """
    SELECT event_type,
           COUNT(DISTINCT user_id)::BIGINT AS distinct_users,
           COUNT(*)::BIGINT AS n_events
    FROM events GROUP BY event_type
    """,
)
def agg_bitmap_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counting through Spark 3.5's BUILT-IN bitmap
    aggregate surface: ids are bucketed (bitmap_bucket_number), each
    bucket builds a fixed-width bitmap (bitmap_construct_agg over
    bitmap_bit_position), and the distinct count is the SUM of per-bucket
    bitmap_count — the mergeable exact-distinct layout the hand-rolled
    ``agg_bitmap`` builds manually. The oracle is plain COUNT(DISTINCT),
    so the whole bucket/position/count pipeline is differential-tested.

    Scale shape: per (group, bucket) partial bitmaps combine map-side and
    OR-merge associatively — the reaggregatable-distinct property that
    lets a 100 TB rollup store bitmap bytes per grain and merge upward,
    exactly (unlike HLL's approximation)."""
    ev = load_table(spark, sf_dir, "events")
    per_bucket = (
        ev.select("event_type", "user_id")
        .groupBy(
            "event_type", F.expr("bitmap_bucket_number(user_id)").alias("bucket")
        )
        .agg(
            F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias(
                "bm"
            ),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return per_bucket.groupBy("event_type").agg(
        F.sum(F.expr("bitmap_count(bm)")).cast("bigint").alias("distinct_users"),
        F.sum("n").cast("bigint").alias("n_events"),
    )


@register(
    "sql_session_variables",
    CAT_SQL,
    f"""
    SELECT event_type, COUNT(*)::BIGINT AS n,
           {_VAL_CENTS_SUM} AS total_value
    FROM events
    WHERE value > 75.0 AND event_type != 'error'
    GROUP BY event_type
    """,
)
def sql_session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL session variables (Spark 4): DECLARE a typed variable, SET it,
    and reference it from a query — the session-scoped configuration
    surface for dashboards and notebooks (thresholds the analyst tweaks
    without editing query text). Variables fold to constants at plan
    time, so pushdown sees them exactly like literals; the oracle inlines
    the same constants.
    """
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("events_var_v")
    spark.sql("DECLARE OR REPLACE VARIABLE min_value DOUBLE DEFAULT 0.0")
    spark.sql("DECLARE OR REPLACE VARIABLE skip_type STRING DEFAULT ''")
    spark.sql("SET VAR min_value = 75.0")
    spark.sql("SET VAR skip_type = 'error'")
    return spark.sql(
        f"""
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               {_VAL_CENTS_SUM} AS total_value
        FROM events_var_v
        WHERE value > min_value AND event_type != skip_type
        GROUP BY event_type
        """
    )


@register(
    "fn_variant_explode",
    CAT_FN,
    # the oracle re-derives the rows from first principles (the array
    # elements are pure functions of event_id) — it does not trust any
    # JSON machinery, making it a fully independent derivation
    """
    SELECT event_id, CAST(pos AS INT) AS pos,
           (CASE pos WHEN 0 THEN event_id % 5
                     WHEN 1 THEN event_id % 7
                     ELSE event_id % 11 END)::BIGINT AS val
    FROM events, (SELECT unnest([0, 1, 2]) AS pos)
    WHERE event_id < 1000
    """,
)
def fn_variant_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT explosion (Spark 4): parse a JSON array into VARIANT and
    expand it to typed rows with the ``variant_explode`` lateral table
    function — the open-schema path for semi-structured payloads (a
    Kinesis feed's natural shape) where the element types are asserted
    at READ time, not ingest time. The oracle re-derives the rows from
    the arithmetic that generated the arrays — no JSON machinery at all,
    a fully independent derivation.

    Scale: variant_explode is a generator inside codegen; fan-out is
    bounded by array length (3 here)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    src = ev.select(
        "event_id",
        F.concat(
            F.lit("["),
            (F.col("event_id") % 5).cast("string"),
            F.lit(","),
            (F.col("event_id") % 7).cast("string"),
            F.lit(","),
            (F.col("event_id") % 11).cast("string"),
            F.lit("]"),
        ).alias("arr"),
    )
    src.createOrReplaceTempView("variant_src_v")
    return spark.sql(
        """
        SELECT event_id, CAST(v.pos AS INT) AS pos,
               CAST(v.value AS BIGINT) AS val
        FROM variant_src_v,
             LATERAL variant_explode(parse_json(arr)) AS v
        """
    )


@register(
    "events_peak_concurrency",
    CAT_REP,
    """
    WITH gaps AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_session
      FROM events WHERE {sane}
    ),
    sess AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM gaps
    ),
    intervals AS (
      SELECT user_id, MIN(ts) AS s, MAX(ts) + INTERVAL '30 minutes' AS e
      FROM sess GROUP BY user_id, session_id
    ),
    pts AS (
      SELECT s AS t, 1 AS delta FROM intervals
      UNION ALL
      SELECT e AS t, -1 AS delta FROM intervals
    ),
    run AS (
      SELECT t, SUM(delta) OVER (ORDER BY t, delta
                                 ROWS UNBOUNDED PRECEDING) AS active
      FROM pts
    )
    SELECT date_trunc('day', t) AS day,
           MAX(active)::BIGINT AS peak_concurrent,
           COUNT(*)::BIGINT AS n_boundary_events
    FROM run GROUP BY date_trunc('day', t)
    """.format(sane=sane_ts_sql("ts")),
)
def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day — the capacity-planning number —
    via the classic sweep line: sessionize (same 30-min-gap spelling as
    the shared session oracle), emit +1 at each session start and −1 at
    each end, running-sum over the ordered boundary stream, take the
    daily max. Tie order pins −1 before +1 at identical timestamps
    (ORDER BY t, delta), so back-to-back sessions never double-count.

    Scale shape: sessionization is one user-keyed window; the sweep is
    one global sort over 2×#sessions boundary points (tiny vs events).
    At extreme session counts the sweep shards by day first (sessions
    here never span days) and sorts within shards."""
    # temporal admission (r12): sentinel days are phantom capacity
    # partitions and their raw day stamps are uncollectable
    ev = load_table(spark, sf_dir, "events").filter(sane_ts("ts"))
    w_u = Window.partitionBy("user_id").orderBy("ts")
    gaps = ev.select(
        "user_id",
        "ts",
        F.when(
            F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w_u)
            > 1800,
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    sess = gaps.withColumn(
        "session_id",
        F.sum("new_session").over(w_u.rowsBetween(Window.unboundedPreceding, 0)),
    )
    intervals = sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("s"),
        (F.max("ts") + F.expr("INTERVAL 30 MINUTES")).alias("e"),
    )
    pts = intervals.select(F.col("s").alias("t"), F.lit(1).alias("delta")).unionByName(
        intervals.select(F.col("e").alias("t"), F.lit(-1).alias("delta"))
    )
    w_sweep = Window.orderBy("t", "delta").rowsBetween(
        Window.unboundedPreceding, 0
    )
    run = pts.withColumn("active", F.sum("delta").over(w_sweep))
    return run.groupBy(F.date_trunc("day", "t").alias("day")).agg(
        F.max("active").cast("bigint").alias("peak_concurrent"),
        F.count(F.lit(1)).cast("bigint").alias("n_boundary_events"),
    )
