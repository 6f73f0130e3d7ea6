"""Wave 81: tokenizer-training variant, session-definition sensitivity,
skyline, rate comparison.

  * ``llm_wordpiece_merge_step``: one WordPiece training iteration —
    same pair census as llm_bpe_merge_step, but ranked by the WordPiece
    LIKELIHOOD score count(ab)/(count(a)·count(b)) instead of raw
    frequency; rare-but-cohesive pairs win over merely-common ones (the
    criterion difference between the two published tokenizer trainers).
  * ``events_session_gap_sweep``: session counts and mean session size
    under 10/30/60-minute gap definitions, all from ONE lag pass — the
    sensitivity table that justifies (or indicts) the 30-minute
    default every sessionizer hardcodes.
  * ``orders_skyline``: the 2-D skyline / Pareto front (maximize
    total price AND recency) via the sort + running-max pass — the
    classic operator (Börzsönyi et al., ICDE'01) relational engines
    lack natively, spelled as a window.
  * ``events_poisson_two_rate``: business-hours vs off-hours purchase
    RATE comparison — counts normalized by exposure hours, Wald z on
    exact integers.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

CAT_TEXT = "2.J llm text analysis"
CAT_EV = "2.L event analytics"
CAT_REL = "2.L relational extensions"

TOP_PAIRS = 10


@register(
    "llm_wordpiece_merge_step",
    CAT_TEXT,
    f"""
    WITH words AS (
      SELECT tok, COUNT(*)::BIGINT AS cnt
      FROM (SELECT unnest(string_split(translate(trim(text, ' '), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ')) AS tok
            FROM documents)
      WHERE len(tok) >= 2 GROUP BY tok
    ),
    pairs AS (
      SELECT substring(tok, i, 2) AS pair,
             substring(tok, i, 1) AS a, substring(tok, i + 1, 1) AS b, cnt
      FROM (SELECT tok, cnt, unnest(range(1, len(tok))) AS i FROM words)
    ),
    pair_census AS (
      SELECT pair, SUM(cnt)::BIGINT AS c_pair FROM pairs GROUP BY pair
    ),
    unit_census AS (
      SELECT u, SUM(cnt)::BIGINT AS c_u FROM (
        SELECT a AS u, cnt FROM pairs
        UNION ALL SELECT b AS u, cnt FROM pairs
      ) GROUP BY u
    )
    SELECT p.pair, p.c_pair,
           ua.c_u AS c_left, ub.c_u AS c_right,
           ROUND(1e6 * p.c_pair / (CAST(ua.c_u AS DOUBLE) * ub.c_u), 4)
             AS wp_score_x1e6,
           ROW_NUMBER() OVER (
             ORDER BY 1e6 * p.c_pair / (CAST(ua.c_u AS DOUBLE) * ub.c_u)
               DESC, p.pair ASC) AS rank_pos
    FROM pair_census p
    JOIN unit_census ua ON ua.u = substring(p.pair, 1, 1)
    JOIN unit_census ub ON ub.u = substring(p.pair, 2, 1)
    ORDER BY wp_score_x1e6 DESC, p.pair ASC
    LIMIT {TOP_PAIRS}
    """,
)
def llm_wordpiece_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One WordPiece training iteration: adjacent-character pairs over
    the word-type table (weighted by corpus word counts), ranked by the
    WordPiece likelihood score c(ab)/(c(a)·c(b)) — merge the pair whose
    JOINT frequency most exceeds what its parts predict, not the most
    frequent pair (BPE's rule, llm_bpe_merge_step). The score is a
    ratio of exact BIGINTs, so both engines rank identical doubles
    (string tiebreak pins equal scores).

    Scale shape: identical to the BPE step — the character-pair work
    runs over the VOCABULARY (word types), which the first aggregate
    reduced from corpus scale; unit counts are alphabet-sized and
    broadcast."""
    d = load_table(spark, sf_dir, "documents")
    words = (
        d.select(
            F.explode(F.split(F.expr("translate(trim(text), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz')"), " ")).alias(
                "tok"
            )
        )
        .filter(F.length("tok") >= 2)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    pairs = words.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(tok) - 1),"
                " i -> struct(substring(tok, i, 2) AS pair,"
                " substring(tok, i, 1) AS a,"
                " substring(tok, i + 1, 1) AS b))"
            )
        ).alias("p"),
        "cnt",
    ).select("p.pair", "p.a", "p.b", "cnt")
    pair_census = pairs.groupBy("pair").agg(F.sum("cnt").alias("c_pair"))
    unit_census = (
        pairs.select(F.col("a").alias("u"), "cnt")
        .unionByName(pairs.select(F.col("b").alias("u"), "cnt"))
        .groupBy("u")
        .agg(F.sum("cnt").alias("c_u"))
    )
    ua = unit_census.alias("ua")
    ub = unit_census.alias("ub")
    score = (
        1e6
        * F.col("c_pair")
        / (F.col("ua.c_u").cast("double") * F.col("ub.c_u"))
    )
    scored = (
        pair_census.join(
            F.broadcast(ua), F.col("ua.u") == F.substring("pair", 1, 1)
        )
        .join(F.broadcast(ub), F.col("ub.u") == F.substring("pair", 2, 1))
        .select(
            "pair",
            "c_pair",
            F.col("ua.c_u").alias("c_left"),
            F.col("ub.c_u").alias("c_right"),
            F.round(score, 4).alias("wp_score_x1e6"),
            F.row_number()
            .over(Window.orderBy(score.desc(), F.col("pair").asc()))
            .alias("rank_pos"),
        )
    )
    return scored.orderBy(
        F.col("wp_score_x1e6").desc(), F.col("pair").asc()
    ).limit(TOP_PAIRS)


@register(
    "events_session_gap_sweep",
    CAT_EV,
    """
    WITH gaps AS (
      SELECT user_id,
             epoch_us(ts) - epoch_us(LAG(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
      FROM events
    ),
    tot AS (
      SELECT COUNT(*)::BIGINT AS n_events,
             COUNT(DISTINCT user_id)::BIGINT AS n_users
      FROM events
    )
    SELECT g.gap_min,
           CAST(t.n_users + COUNT(*) FILTER (
             WHERE gap_us > g.gap_min * 60000000::BIGINT) AS BIGINT) AS n_sessions,
           CAST((2 * t.n_events * 10000
                 + (t.n_users + COUNT(*) FILTER (WHERE gap_us > g.gap_min * 60000000::BIGINT)))
                // (2 * (t.n_users + COUNT(*) FILTER (
                     WHERE gap_us > g.gap_min * 60000000::BIGINT))) AS BIGINT)
             AS events_per_session_x1e4
    FROM gaps CROSS JOIN (SELECT unnest([10, 30, 60]) AS gap_min) g
    CROSS JOIN tot t
    WHERE gaps.gap_us IS NOT NULL
    GROUP BY g.gap_min, t.n_events, t.n_users
    """,
)
def events_session_gap_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-definition sensitivity: the number of sessions (and mean
    session size) under inactivity gaps of 10/30/60 minutes, computed
    from ONE lag pass — a session boundary is just an inter-event gap
    exceeding the threshold, so sessions(G) = users + |{gaps > G}| and
    the whole sweep is three conditional sums over the same gap table.
    If the downstream metric moves a lot across this table, "session"
    is doing load-bearing work the 30-minute folklore can't justify
    (the sessionizer companion of events_funnel_window_sensitivity).

    Scale shape: one shuffle by user for the lag, then a 3-row grid
    broadcast over the gap stream — sweep cost is independent of the
    number of thresholds' sessionizations."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", F.col("event_id").asc_nulls_last())
    gaps = ev.select(
        "user_id",
        (
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
        ).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    tot = ev.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )
    grid = spark.range(1).select(
        F.explode(F.array(F.lit(10), F.lit(30), F.lit(60))).alias("gap_min")
    )
    boundaries = F.sum(
        F.when(
            F.col("gap_us") > F.col("gap_min").cast("long") * 60000000, 1
        ).otherwise(0)
    )
    return (
        gaps.crossJoin(F.broadcast(grid))
        .crossJoin(F.broadcast(tot))
        .groupBy("gap_min", "n_events", "n_users")
        .agg(boundaries.alias("_b"))
        .select(
            "gap_min",
            (F.col("n_users") + F.col("_b")).cast("long").alias("n_sessions"),
            F.expr(
                "CAST((2 * n_events * 10000 + (n_users + _b))"
                " DIV (2 * (n_users + _b)) AS BIGINT)"
            ).alias("events_per_session_x1e4"),
        )
    )


@register(
    "orders_skyline",
    CAT_REL,
    """
    WITH pts AS (
      SELECT o_orderkey,
             CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS price_cents,
             CAST(o_orderdate AS DATE) - DATE '1992-01-01' AS recency
      -- identity-less orders are excluded (r10 max-tie sweep): the
      -- skyline is a CITATION of orderkeys, and a NULL-key row tying a
      -- real row on price has no deterministic place in the running-max
      -- order (two tied NULL-key rows with different recency would be
      -- engine-unstable even with a pinned null order)
      FROM orders WHERE o_orderkey IS NOT NULL
    ),
    ranked AS (
      SELECT o_orderkey, price_cents, recency,
             MAX(recency) OVER (
               ORDER BY price_cents DESC, o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_rec
      FROM pts
    )
    SELECT o_orderkey, price_cents, recency
    FROM ranked WHERE best_rec IS NULL OR recency > best_rec
    """,
)
def orders_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto front) of orders maximizing BOTH total price
    and recency: an order survives iff no other order is at least as
    good on both axes and better on one. The classic SKYLINE operator
    (Börzsönyi et al., ICDE'01) spelled relationally: sort by price
    descending, keep a row iff its recency strictly exceeds the running
    maximum recency of everything pricier — one window pass, exact
    integer comparisons (price in cents, recency in days; the unique
    orderkey tiebreak makes dominance by an equal-price row count,
    matching the strict-dominance definition under the total order).

    Scale shape: a global sort — at 100 TB, range-partition by price
    and run the running max per partition plus a per-partition prefix
    max merge (the standard distributed-skyline two-phase plan); the
    window spelling is that plan's one-node degenerate case.

    Identity-less orders (NULL o_orderkey) are excluded on both engines
    (r10 max-tie sweep): the skyline cites orderkeys, and NULL-key rows
    tied on price have no deterministic running-max position."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey").isNotNull()
    )
    pts = o.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias(
            "price_cents"
        ),
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01")).alias(
            "recency"
        ),
    )
    w = (
        Window.orderBy(F.col("price_cents").desc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = pts.withColumn("best_rec", F.max("recency").over(w))
    return ranked.filter(
        F.col("best_rec").isNull() | (F.col("recency") > F.col("best_rec"))
    ).select("o_orderkey", "price_cents", "recency")


@register(
    "events_poisson_two_rate",
    CAT_EV,
    """
    WITH lab AS (
      SELECT CASE WHEN hour(ts) BETWEEN 9 AND 17 THEN 'biz' ELSE 'off' END
               AS slot
      FROM events WHERE event_type = 'purchase'
    ),
    cnt AS (
      SELECT COUNT(*) FILTER (WHERE slot = 'biz')::BIGINT AS k1,
             COUNT(*) FILTER (WHERE slot = 'off')::BIGINT AS k2
      FROM lab
    ),
    days AS (
      SELECT COUNT(DISTINCT date_trunc('day', ts))::BIGINT AS d FROM events
    )
    SELECT k1 AS purchases_biz, k2 AS purchases_off,
           CAST(d * 9 AS BIGINT) AS hours_biz,
           CAST(d * 15 AS BIGINT) AS hours_off,
           ROUND(CAST(k1 AS DOUBLE) / (NULLIF(d, 0) * 9), 4) AS rate_biz,
           ROUND(CAST(k2 AS DOUBLE) / (NULLIF(d, 0) * 15), 4) AS rate_off,
           ROUND((CAST(k1 AS DOUBLE) / (NULLIF(d, 0) * 9)
                  - CAST(k2 AS DOUBLE) / (NULLIF(d, 0) * 15))
                 / sqrt(CAST(k1 AS DOUBLE) / pow(NULLIF(d, 0) * 9.0, 2)
                        + CAST(k2 AS DOUBLE) / pow(NULLIF(d, 0) * 15.0, 2)),
                 4) AS wald_z
    FROM cnt CROSS JOIN days
    """,
)
def events_poisson_two_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Poisson rate comparison: purchases per exposure hour
    during business hours (09–17, 9 h/day) vs off hours (15 h/day),
    with the Wald z for the rate difference — the test that correctly
    normalizes by UNEQUAL exposure windows, where a raw count
    comparison would claim business hours are quiet simply because
    they are shorter. All inputs exact integers; one conditional
    aggregate plus a day census.

    Scale shape: map-combinable counts; no joins beyond two broadcast
    scalars."""
    ev = load_table(spark, sf_dir, "events")
    lab = ev.filter(F.col("event_type") == "purchase").select(
        F.when(F.hour("ts").between(9, 17), "biz").otherwise("off").alias(
            "slot"
        )
    )
    # COALESCE: the oracle's COUNT FILTER arms are 0 over an empty
    # corpus where SUM is NULL (empty-corpus census r6)
    cnt = lab.agg(
        F.coalesce(
            F.sum(F.when(F.col("slot") == "biz", 1).otherwise(0)), F.lit(0)
        ).alias("k1"),
        F.coalesce(
            F.sum(F.when(F.col("slot") == "off", 1).otherwise(0)), F.lit(0)
        ).alias("k2"),
    )
    days = ev.agg(
        F.countDistinct(F.date_trunc("day", "ts")).alias("d")
    )
    # NULLIF the exposure divisor: d = 0 over an empty corpus means the
    # rates are NULL on both engines rather than an ANSI
    # divide-by-zero error (empty-corpus census r6)
    d_nz = F.expr("NULLIF(d, 0)")
    r1 = F.col("k1").cast("double") / (d_nz * 9)
    r2 = F.col("k2").cast("double") / (d_nz * 15)
    return cnt.crossJoin(F.broadcast(days)).select(
        F.col("k1").alias("purchases_biz"),
        F.col("k2").alias("purchases_off"),
        (F.col("d") * 9).cast("long").alias("hours_biz"),
        (F.col("d") * 15).cast("long").alias("hours_off"),
        F.round(r1, 4).alias("rate_biz"),
        F.round(r2, 4).alias("rate_off"),
        F.round(
            (r1 - r2)
            / F.sqrt(
                F.col("k1").cast("double") / F.pow(d_nz * 9.0, 2)
                + F.col("k2").cast("double") / F.pow(d_nz * 15.0, 2)
            ),
            4,
        ).alias("wald_z"),
    )
