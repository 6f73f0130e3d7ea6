"""Wave 72: stream-capacity planning for the feed's ingest tier.

The reference class is a Kinesis feed processor (SURVEY.md §1.1): its
operational questions — is a shard hot, how far behind is the consumer,
how well does producer-side record aggregation amortize API calls, where
do we split — are analytics queries over the event log. This wave
expresses each as a one-pass relational plan:

  * ``events_backlog_queue``: consumer backlog per day via the Lindley
    recursion B_t = max(0, B_{t-1} + A_t − C), computed WITHOUT a
    sequential fold using the reflection identity
    B_t = S_t − min(0, min_{s≤t} S_s) over the prefix sums
    S_t = Σ(A−C) — two window passes, exact BIGINT arithmetic.
  * ``events_shard_utilization``: per-shard daily load census with
    relative hot-cell flags (md5 keyspace routing per shard_assignment).
  * ``events_kpl_pack_sim``: producer-side record-aggregation packing
    (25 KiB aggregated records, ≤100 user records each) — API-call
    amortization per shard, integer ceil-div only.
  * ``events_shard_split_plan``: hot shards (>1.25× fair share) get
    their first-hex-digit keyspace halved at the second digit — the
    resharding plan as a table.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table, sane_ts, sane_ts_sql

CAT_STREAM = "2.L stream capacity planning"

_SHARD_SQL = "substr(md5(user_id::VARCHAR), 1, 1)"


def _shard_spark() -> F.Column:
    return F.substring(F.md5(F.col("user_id").cast("string")), 1, 1)


@register(
    "events_backlog_queue",
    CAT_STREAM,
    """
    WITH d AS (
      SELECT date_trunc('day', ts) AS day, COUNT(*)::BIGINT AS arrivals
      FROM events WHERE {sane} GROUP BY 1
    ),
    cap AS (
      SELECT CAST((SUM(arrivals) * 102 + 100 * COUNT(*) - 1)
                  // (100 * COUNT(*)) AS BIGINT) AS capacity
      FROM d
    ),
    s AS (
      SELECT day, arrivals, c.capacity,
             SUM(arrivals - c.capacity) OVER (ORDER BY day) AS run
      FROM d CROSS JOIN cap c
    )
    SELECT day, arrivals, capacity,
           CAST(run - LEAST(0, MIN(run) OVER (ORDER BY day)) AS BIGINT)
             AS backlog,
           CAST((2 * (run - LEAST(0, MIN(run) OVER (ORDER BY day))) * 10000
                 + capacity) // (2 * capacity) AS BIGINT)
             AS iter_age_days_x1e4,
           (run - LEAST(0, MIN(run) OVER (ORDER BY day))) > 0 AS congested
    FROM s
    """.format(sane=sane_ts_sql("ts")),
)
def events_backlog_queue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consumer-lag simulation: a fixed-capacity consumer (2% above the
    mean daily arrival rate, integer ceil) drains the feed; the daily
    backlog follows the Lindley recursion B_t = max(0, B_{t-1}+A_t−C).
    The recursion is NOT computed as a fold: the reflection identity
    B_t = S_t − min(0, min_{s≤t} S_s) turns it into a prefix sum plus a
    running minimum — two ordered-window passes over the day spine, no
    sequential state, exact BIGINT throughout. iterator-age (days of
    work queued) is emitted in integer half-up 1e-4 units.

    Scale shape: the queue series lives at the DAY grain — one
    map-combinable aggregate collapses the raw events, then the windows
    run over a domain-sized frame. At 100 TB the same identity holds
    per (stream, shard) partition: Window.partitionBy(shard) keeps every
    prefix scan local to its key."""
    # temporal admission (r12): a sentinel-dated phantom day corrupts the
    # Lindley recursion (and its raw day stamp is uncollectable)
    ev = load_table(spark, sf_dir, "events").filter(sane_ts("ts"))
    d = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("arrivals")
    )
    cap = d.agg(
        F.expr(
            "CAST((SUM(arrivals) * 102 + 100 * COUNT(*) - 1)"
            " DIV (100 * COUNT(*)) AS BIGINT)"
        ).alias("capacity")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    s = d.crossJoin(F.broadcast(cap)).withColumn(
        "run", F.sum(F.col("arrivals") - F.col("capacity")).over(w)
    )
    s = s.withColumn(
        "backlog",
        (F.col("run") - F.least(F.lit(0).cast("long"),
                                F.min("run").over(w))).cast("long"),
    )
    return s.select(
        "day",
        "arrivals",
        "capacity",
        "backlog",
        F.expr(
            "CAST((2 * backlog * 10000 + capacity)"
            " DIV (2 * capacity) AS BIGINT)"
        ).alias("iter_age_days_x1e4"),
        (F.col("backlog") > 0).alias("congested"),
    )


@register(
    "events_shard_utilization",
    CAT_STREAM,
    f"""
    WITH cells AS (
      SELECT {_SHARD_SQL} AS shard, date_trunc('day', ts) AS day,
             COUNT(*)::BIGINT AS recs,
             SUM(25 + length(event_type) + length(props))::BIGINT AS bytes
      FROM events GROUP BY 1, 2
    ),
    tot AS (
      SELECT COUNT(*)::BIGINT AS n_cells, SUM(recs)::BIGINT AS total_recs
      FROM cells
    )
    SELECT shard,
           COUNT(*)::BIGINT AS n_days,
           SUM(CASE WHEN 2 * recs * t.n_cells > 3 * t.total_recs
                    THEN 1 ELSE 0 END)::BIGINT AS hot_days,
           MAX(recs)::BIGINT AS max_day_recs,
           SUM(bytes)::BIGINT AS total_bytes,
           CAST((2 * SUM(recs) * 10000 + t.total_recs)
                // (2 * t.total_recs) AS BIGINT) AS traffic_share_x1e4
    FROM cells CROSS JOIN tot t
    GROUP BY shard, t.n_cells, t.total_recs
    """,
)
def events_shard_utilization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard load census under the engine-portable md5 first-hex
    routing (same keyspace as shard_assignment): daily records and
    wire bytes (25-byte record envelope + type + props payload) per
    shard, hot-cell days flagged RELATIVE to the fleet (a cell is hot
    when its load exceeds 1.5× the mean cell load — spelled with cross
    products so the comparison is exact integers, no float threshold).

    Scale shape: one (shard, day) aggregate — map-combinable — then a
    16-row rollup against a broadcast 1-row total. The relative
    threshold auto-scales with sf; absolute Kinesis limits
    (1000 rec/s, 1 MiB/s) would slot into the same plan as literals."""
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        _shard_spark().alias("shard"), F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("recs"),
        F.sum(
            F.lit(25) + F.length("event_type") + F.length("props")
        ).alias("bytes"),
    )
    tot = cells.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("recs").alias("total_recs"),
    )
    return (
        cells.crossJoin(F.broadcast(tot))
        .groupBy("shard", "n_cells", "total_recs")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum(
                F.when(
                    2 * F.col("recs") * F.col("n_cells")
                    > 3 * F.col("total_recs"),
                    1,
                ).otherwise(0)
            ).alias("hot_days"),
            F.max("recs").alias("max_day_recs"),
            F.sum("bytes").alias("total_bytes"),
            F.expr(
                "CAST((2 * SUM(recs) * 10000 + total_recs)"
                " DIV (2 * total_recs) AS BIGINT)"
            ).alias("traffic_share_x1e4"),
        )
        .drop("n_cells", "total_recs")
    )


@register(
    "events_kpl_pack_sim",
    CAT_STREAM,
    f"""
    WITH cells AS (
      SELECT {_SHARD_SQL} AS shard, date_trunc('day', ts) AS day,
             COUNT(*)::BIGINT AS recs,
             SUM(25 + length(event_type) + length(props))::BIGINT AS bytes
      FROM events GROUP BY 1, 2
    ),
    packed AS (
      SELECT shard, recs, bytes,
             GREATEST((bytes + 25599) // 25600,
                      (recs + 99) // 100) AS agg_recs
      FROM cells
    )
    SELECT shard,
           SUM(recs)::BIGINT AS user_records,
           SUM(agg_recs)::BIGINT AS aggregated_records,
           CAST((2 * SUM(recs) * 10000 + SUM(agg_recs))
                // (2 * SUM(agg_recs)) AS BIGINT) AS recs_per_agg_x1e4,
           CAST((2 * (SUM(recs) - SUM(agg_recs)) * 10000 + SUM(recs))
                // (2 * SUM(recs)) AS BIGINT) AS api_call_saving_x1e4
    FROM packed
    GROUP BY shard
    """,
)
def events_kpl_pack_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Producer-side record aggregation (the KPL pattern): user records
    bound for one shard-day are packed into aggregated records capped at
    25 KiB wire bytes AND 100 user records each, so the per-cell count
    is max of two integer ceil-divs. Emits per shard the API-call
    amortization: records per aggregated record and the saved-call
    fraction, both as integer half-up 1e-4 units (no float until the
    reader divides).

    Scale shape: identical single-aggregate plan to
    events_shard_utilization — packing arithmetic is row-local on the
    (shard, day) cell grain, then a 16-row shard rollup."""
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        _shard_spark().alias("shard"), F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("recs"),
        F.sum(
            F.lit(25) + F.length("event_type") + F.length("props")
        ).alias("bytes"),
    )
    packed = cells.withColumn(
        "agg_recs",
        F.greatest(
            F.expr("CAST((bytes + 25599) DIV 25600 AS BIGINT)"),
            F.expr("CAST((recs + 99) DIV 100 AS BIGINT)"),
        ),
    )
    return packed.groupBy("shard").agg(
        F.sum("recs").alias("user_records"),
        F.sum("agg_recs").alias("aggregated_records"),
        F.expr(
            "CAST((2 * SUM(recs) * 10000 + SUM(agg_recs))"
            " DIV (2 * SUM(agg_recs)) AS BIGINT)"
        ).alias("recs_per_agg_x1e4"),
        F.expr(
            "CAST((2 * (SUM(recs) - SUM(agg_recs)) * 10000 + SUM(recs))"
            " DIV (2 * SUM(recs)) AS BIGINT)"
        ).alias("api_call_saving_x1e4"),
    )


@register(
    "events_shard_split_plan",
    CAT_STREAM,
    f"""
    WITH loads AS (
      SELECT {_SHARD_SQL} AS shard, COUNT(*)::BIGINT AS recs
      FROM events GROUP BY 1
    ),
    tot AS (SELECT SUM(recs)::BIGINT AS total, COUNT(*)::BIGINT AS n FROM loads)
    SELECT shard, recs,
           4 * recs * t.n > 5 * t.total AS is_hot,
           CASE WHEN 4 * recs * t.n > 5 * t.total
                THEN shard || '0-' || shard || '7' END AS child_lo,
           CASE WHEN 4 * recs * t.n > 5 * t.total
                THEN shard || '8-' || shard || 'f' END AS child_hi
    FROM loads CROSS JOIN tot t
    """,
)
def events_shard_split_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resharding plan: a shard owning more than 1.25× its fair share of
    traffic (integer cross-product comparison — no float threshold) is
    split at the midpoint of its md5 keyspace: first-hex-digit range
    [d0, d7] / [d8, df]. Cold shards keep NULL children. This is the
    split-decision table an autoscaler for a sharded ingest tier acts
    on; the hash keyspace arithmetic is plain string math, so the plan
    is reproducible on any engine.

    Scale shape: a 16-row aggregate against a broadcast scalar — the
    decision input is the shard census, never the raw events twice."""
    ev = load_table(spark, sf_dir, "events")
    loads = ev.groupBy(_shard_spark().alias("shard")).agg(
        F.count(F.lit(1)).alias("recs")
    )
    tot = loads.agg(
        F.sum("recs").alias("total"), F.count(F.lit(1)).alias("n")
    )
    hot = 4 * F.col("recs") * F.col("n") > 5 * F.col("total")
    return (
        loads.crossJoin(F.broadcast(tot))
        .select(
            "shard",
            "recs",
            hot.alias("is_hot"),
            F.when(hot, F.concat(F.col("shard"), F.lit("0-"),
                                 F.col("shard"), F.lit("7"))).alias("child_lo"),
            F.when(hot, F.concat(F.col("shard"), F.lit("8-"),
                                 F.col("shard"), F.lit("f"))).alias("child_hi"),
        )
    )
