"""Complex-event-processing style sequence matching over the events feed.

``events_seq_match`` is the windowFunnel / MATCH_RECOGNIZE-lite pattern:
find per-user chains view → click → purchase where each step follows the
previous within 30 minutes. Spelled as two user-keyed range self-joins —
the equi key (user_id) drives an ordinary shuffled join and the time bound
is a residual predicate, so the plan scales like any keyed join (state
bounded by per-user-per-30min event density, never |events|²).

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

CAT = "2.L quality & mining"


@register(
    "events_seq_match",
    CAT,
    """
    WITH v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
    c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
    p AS (SELECT user_id, ts, event_id FROM events
          WHERE event_type = 'purchase')
    SELECT v.user_id,
           COUNT(*)::BIGINT AS n_chains,
           COUNT(DISTINCT p.event_id)::BIGINT AS n_purchases,
           strftime(MIN(p.ts), '%Y-%m-%d %H:%M:%S.%f') AS first_completion
    FROM v
    JOIN c ON c.user_id = v.user_id
          AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 30 MINUTE
    JOIN p ON p.user_id = c.user_id
          AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    GROUP BY v.user_id
    """,
)
def events_seq_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ordered-funnel chains (view→click→purchase, each hop ≤30
    min): chain count, distinct completing purchases, and the earliest
    completion time. Timestamps are µs-aligned in the test data so the
    interval boundaries agree bit-for-bit across engines; the completion
    time is emitted as a formatted string (no raw temporal exchange,
    SURVEY §5.3.6).

    The driver's 0-row result at sf0.01 is DATA CADENCE, not a dead
    operator (probed r8): the synthetic events space each user's events
    ~7.4 h apart at the median, so two consecutive ≤30-min hops with
    exactly the view→click→purchase types is a coincidence — 0 complete
    chains exist at sf0.01 and exactly 1 at sf0.1 (view→click pairs
    alone: 23 and 175). Detection power is proven by the planted-funnel
    fixture (tests/test_consistency.py::test_seq_match_detects_planted_
    funnels): known chain arithmetic 1 and 2×1×2=4, a click-less decoy
    that must not match, and an oracle match on the planted table.
    """
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("v_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_id"),
    )
    chains = (
        v.join(
            c,
            (F.col("c_user") == F.col("user_id"))
            & (F.col("c_ts") > F.col("v_ts"))
            & (F.col("c_ts") <= F.col("v_ts") + F.expr("INTERVAL 30 MINUTES")),
        )
        .join(
            p,
            (F.col("p_user") == F.col("c_user"))
            & (F.col("p_ts") > F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTES")),
        )
    )
    return chains.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_chains"),
        F.countDistinct("p_id").cast("bigint").alias("n_purchases"),
        F.date_format(F.min("p_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "first_completion"
        ),
    )
