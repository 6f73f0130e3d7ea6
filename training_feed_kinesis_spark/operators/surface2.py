"""Aggregate/window surface round 2: argmin/argmax, bitmap exact-distinct,
approx numeric histograms, printf formatting, and running distinct counts.

Why these matter at 100 TB:
  * ``max_by``/``min_by`` compute "row of the extreme" in ONE hash-agg pass —
    the naive spelling (self-join back on the max) costs an extra shuffle and
    a join; at fact-table scale that is the difference between one stage and
    three.
  * Bitmap aggregates give EXACT distinct counts that are *mergeable*: daily
    bitmaps OR-merge into monthly ones without re-scanning the raw events —
    the exact-count sibling of the HLL sketch rollup (``agg_sketch_merge``).
    For bounded int domains (user ids) this beats count-distinct re-scans.
  * ``histogram_numeric`` is a fixed-size mergeable summary (Ben-Haim/Tom-Tov
    streaming histogram) — constant memory per group regardless of input rows.
  * A running ``collect_set`` window is the standard "new vs returning
    behaviour breadth" primitive; Spark keeps the frame state per partition,
    no shuffle beyond the window's own.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md §0.1);
capability surface reconstructed per SURVEY.md §2 and BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load_table

CAT_AGG = "2.D aggregations"
CAT_WIN = "2.E window functions"
CAT_FN = "2.H scalar functions"


@register(
    "agg_max_by",
    CAT_AGG,
    """
    WITH ranked AS (
      SELECT event_type, user_id, value, event_id,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value DESC, event_id) AS rn_max,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value ASC, event_id) AS rn_min
      FROM events
    )
    SELECT event_type,
           MAX(CASE WHEN rn_max = 1 THEN user_id END)::BIGINT AS top_user,
           MAX(CASE WHEN rn_min = 1 THEN user_id END)::BIGINT AS bottom_user,
           ROUND(MAX(CASE WHEN rn_max = 1 THEN value END), 4) AS top_value
    FROM ranked
    GROUP BY event_type
    """,
)
def agg_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arg-extremes in one hash aggregation: which user produced the
    highest/lowest value per event type. ``max_by`` with a composite
    ``struct(value, -event_id)`` ordering key is fully deterministic under
    value ties (smallest event_id wins, matching the oracle's tiebreak),
    and runs as a single partial+final agg — no join-back, no second
    shuffle. The oracle spells the same thing with ranking windows.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.expr("max_by(user_id, struct(value, -event_id))").alias("top_user"),
        F.expr("min_by(user_id, struct(value, event_id))").alias("bottom_user"),
        F.round(F.max("value"), 4).alias("top_value"),
    )


@register(
    "agg_bitmap",
    CAT_AGG,
    """
    SELECT event_type,
           COUNT(DISTINCT user_id)::BIGINT AS exact_users,
           COUNT(DISTINCT date_trunc('day', ts))::BIGINT AS active_days
    FROM events
    GROUP BY event_type
    """,
)
def agg_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable EXACT distinct counts via bitmap aggregates: build one
    bitmap per (event_type, day), then OR-merge the daily bitmaps into the
    per-type total. ``bitmap_count(or_agg(...))`` equals COUNT(DISTINCT)
    but the daily bitmaps are reusable summaries — the 100 TB pattern is
    to persist them per partition-day and never rescan raw events for a
    distinct count again (exact sibling of the HLL rollup). Bit positions
    are bounded by the user-id domain, so each bitmap is a few KB.
    """
    ev = load_table(spark, sf_dir, "events")
    # One bitmap spans a single 32768-position bucket, so the id space is
    # sharded by bitmap_bucket_number (ids shifted +1: position(0) would
    # alias into the previous bucket). This is exactly the shape that
    # scales: bitmaps stay small per (group, bucket), counts sum exactly.
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("day", "ts").alias("day"),
        F.expr("bitmap_bucket_number(user_id + 1)").alias("bucket"),
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(user_id + 1))").alias(
            "user_bm"
        )
    )
    users = (
        daily.groupBy("event_type", "bucket")
        .agg(F.expr("bitmap_count(bitmap_or_agg(user_bm))").alias("bucket_users"))
        .groupBy("event_type")
        .agg(F.sum("bucket_users").cast("long").alias("exact_users"))
    )
    days = daily.groupBy("event_type").agg(
        F.count_distinct("day").alias("active_days")
    )
    # null-SAFE join: a NULL event_type is a legitimate group on both
    # sides, and a plain equality join silently drops it (caught by the
    # NULL-attribute corruption replay)
    d2 = F.broadcast(
        days.select(
            F.col("event_type").alias("et_d"), "active_days"
        )
    )
    return (
        users.join(d2, users.event_type.eqNullSafe(d2.et_d))
        .select("event_type", "exact_users", "active_days")
    )


@register("agg_histogram_numeric", CAT_AGG, None)  # approx summary: rows-only
def agg_histogram_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ben-Haim/Tom-Tov streaming histogram of event values per type:
    constant-memory mergeable summary (nb bins regardless of row count),
    the right shape for 100 TB profiling passes. Approximate bin centroids
    ⇒ no cross-engine hash oracle; rows-only check (10 bins per type).
    """
    ev = load_table(spark, sf_dir, "events")
    hist = ev.groupBy("event_type").agg(
        F.expr("histogram_numeric(value, 10)").alias("bins")
    )
    return hist.select(
        "event_type",
        F.posexplode("bins").alias("bin", "xy"),
    ).select(
        "event_type",
        "bin",
        F.col("xy.x").alias("centroid"),
        F.col("xy.y").alias("height"),
    )


@register(
    "fn_printf",
    CAT_FN,
    """
    SELECT event_id,
           printf('%s|%05d|%.4f', COALESCE(event_type, '-'),
                  COALESCE(user_id, -1), ROUND(value, 4)) AS line,
           printf('%08X', event_id) AS hex_id
    FROM events
    WHERE event_id < 500
    """,
)
def fn_printf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """printf-style record formatting (the classic log/export line).
    ``format_string`` is JVM-side codegen. Doubles are pre-rounded to the
    printed precision so both engines format the identical decimal — %.4f
    of round(x,4) round-trips exactly; formatting unrounded doubles would
    expose Java-vs-C half-way rounding divergence. NULL args are rendered
    through explicit sentinels ('-' / -1) on BOTH engines: Java's
    Formatter prints the text "null" where DuckDB's printf NULLs the whole
    line (caught by the NULL-attribute corruption replay).
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_id") < 500)
        .select(
            "event_id",
            F.format_string(
                "%s|%05d|%.4f",
                F.coalesce(F.col("event_type"), F.lit("-")),
                F.coalesce(F.col("user_id"), F.lit(-1)),
                F.round(F.col("value"), 4),
            ).alias("line"),
            F.format_string("%08X", F.col("event_id")).alias("hex_id"),
        )
    )


@register(
    "win_running_distinct",
    CAT_WIN,
    """
    SELECT user_id, event_id,
           COUNT(DISTINCT event_type)
             OVER (PARTITION BY user_id ORDER BY ts NULLS LAST, event_id
                   ROWS UNBOUNDED PRECEDING) AS types_seen
    FROM events
    """,
)
def win_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running behaviour breadth: how many distinct event types each user
    has exhibited as of each event. Spark spells it ``size(collect_set)``
    over a running frame (per-partition state, no extra shuffle); DuckDB
    spells it COUNT(DISTINCT) OVER. Full (ts, event_id) tiebreak keeps
    both engines' frames identical. The set is bounded by the event-type
    domain (5), so window state stays O(1) per row at any scale.
    ts NULLS LAST both engines (the r8 NULL-time seam).
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc_nulls_last(), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.size(F.collect_set("event_type").over(w)).alias("types_seen"),
    )
