"""Wave 9: temporal SCD2 stream enrichment, partition-volume sentry.

  * ``join_stream_scd2``: streaming events enriched against a
    two-version SCD2 dimension with a validity-interval condition —
    the time-correct dimension lookup (each event sees the dim version
    that was current AT ITS EVENT TIME, not the latest one).
  * ``dq_partition_sentry``: per-day row-count z-scores against the
    corpus's own mean/σ — the circuit breaker that halts a training
    ingest when a partition arrives half-empty or doubled.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .exact import CENTS_SUM_SQL, cents_sum
from ..tables import load_table, sane_ts, sane_ts_sql

# exact integer-cents SUM of events.value, unrounded (r11 projected-
# magnitude lint, SURVEY 5.3.9a): total_value is a SUM-driven grower
_VAL_CENTS_SUM = CENTS_SUM_SQL.format(col="value")

CAT_JOIN = "2.C joins"
CAT_WORK = "2.M workloads"

_SCD_FLIP = "2024-01-15 00:00:00"


@register(
    "join_stream_scd2",
    CAT_JOIN,
    f"""
    SELECT CASE WHEN ts < TIMESTAMP '{_SCD_FLIP}' THEN 'bronze'
                WHEN strpos('02468ace', substr(md5(user_id::VARCHAR), 1, 1)) > 0
                  THEN 'gold' ELSE 'silver' END AS tier,
           COUNT(*) AS n, {_VAL_CENTS_SUM} AS total_value
    FROM events WHERE ts IS NOT NULL AND {sane_ts_sql("ts")} GROUP BY 1
    """,
)
def join_stream_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming enrichment against an SCD2 dimension: every user carries
    two tier versions — 'bronze' before the flip date, then 'gold' or
    'silver' (hash-assigned) after — and each streamed event joins the
    version whose [valid_from, valid_to) interval contains its EVENT
    time. This is the time-correct dimension lookup: a latest-version
    join would silently relabel history after every dim update.

    Plan shape: broadcast hash join on user_id with the interval bounds
    as residual predicates — stateless per micro-batch, so watermarks
    aren't involved; the dim broadcast is re-resolved each batch exactly
    like ``join_stream_static``. At 100 TB the SCD dim stays dimension-
    sized (versions × users) and time-bucketing the validity interval
    into the join key keeps even a non-broadcastable dim an equi join."""
    from ..streaming.replay import drain, replay_stream

    users = load_table(spark, sf_dir, "events").select("user_id").distinct()
    hexdig = F.substring(F.md5(F.col("user_id").cast("string")), 1, 1)
    lo = F.lit("1900-01-01 00:00:00").cast("timestamp")
    flip = F.lit(_SCD_FLIP).cast("timestamp")
    # dim coverage must contain the sane-ts admission window end, else a
    # gated-in event past the dim horizon drops on the interval join only
    hi = F.lit("2200-01-01 00:00:00").cast("timestamp")
    v1 = users.select(
        "user_id",
        F.lit("bronze").alias("tier"),
        lo.alias("valid_from"),
        flip.alias("valid_to"),
    )
    v2 = users.select(
        "user_id",
        F.when(hexdig.isin(*"02468ace"), "gold").otherwise("silver").alias("tier"),
        flip.alias("valid_from"),
        hi.alias("valid_to"),
    )
    dim = v1.unionByName(v2)
    # NULL event-time rows dropped on both engines (the r8 NULL-time
    # seam): an event with no event time cannot be time-correctly
    # enriched — the interval predicates would silently drop it on
    # Spark while the oracle's CASE still assigned it a tier
    # temporal admission (r12): an out-of-window event time falls outside
    # every dim validity interval and silently drops on the join side
    # while the oracle's CASE would still label it — gate both spellings
    stream = replay_stream(spark, sf_dir, "ordered").filter(
        F.col("ts").isNotNull() & sane_ts("ts")
    )
    # null-SAFE key equality: the distinct-user dim legitimately carries
    # a NULL-user version pair, and the oracle's CASE assigns NULL-keyed
    # events a tier (bronze/silver) — a plain equality join would drop
    # them instead (NULL-attribute corruption replay)
    enriched = stream.join(
        F.broadcast(dim),
        stream.user_id.eqNullSafe(dim.user_id)
        & (stream.ts >= dim.valid_from)
        & (stream.ts < dim.valid_to),
    )
    agg = enriched.groupBy("tier").agg(
        F.count(F.lit(1)).alias("n"),
        cents_sum("value").alias("total_value"),
    )
    return drain(agg, "complete")


@register(
    "dq_partition_sentry",
    CAT_WORK,
    """
    WITH daily AS (
      SELECT date_trunc('day', ts) AS d, COUNT(*)::DOUBLE AS n
      FROM events WHERE {sane} GROUP BY 1
    ),
    stats AS (
      SELECT AVG(n) AS mu, stddev_samp(n) AS sigma FROM daily
    )
    SELECT d AS day, n::BIGINT AS n_rows,
           ROUND((n - mu) / sigma, 4) AS z,
           ABS((n - mu) / sigma) > 2 AS breaker_tripped
    FROM daily, stats
    """.format(sane=sane_ts_sql("ts")),
)
def dq_partition_sentry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-volume sentry: each ingest day's row count z-scored
    against the corpus's own daily mean/σ, with the |z| > 2 circuit
    breaker a training pipeline checks BEFORE consuming a partition —
    the cheap guard against half-delivered or double-delivered days.

    Scale shape: one date-keyed count (map-side combinable), a 2-number
    broadcast of the moments, then a row-local z — cost is O(days) after
    the first aggregate regardless of corpus size. Production keeps a
    trailing-window baseline instead of the full-corpus moments; same
    plan with a window filter."""
    # temporal admission (r12): sentinel-dated rows land in phantom
    # day-partitions whose raw day stamp is uncollectable; the date
    # sanity census, not the volume sentry, owns those rows
    ev = load_table(spark, sf_dir, "events").filter(sane_ts("ts"))
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    stats = daily.agg(
        F.avg("n").alias("mu"), F.stddev_samp("n").alias("sigma")
    )
    z = (F.col("n") - F.col("mu")) / F.col("sigma")
    return daily.crossJoin(F.broadcast(stats)).select(
        "day",
        F.col("n").cast("long").alias("n_rows"),
        F.round(z, 4).alias("z"),
        (F.abs(z) > 2).alias("breaker_tripped"),
    )
