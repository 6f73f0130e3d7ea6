"""Wave 87: Markov removal-effect attribution + categorical-domain drift.

  * ``events_attribution_markov_removal``: the removal-effect
    attribution model (Anderl et al. 2014) — conversion credit per
    channel is how much the chain's start→purchase absorption
    probability DROPS when that channel is knocked out (its value
    clamped to 0, journeys through it die). The principled alternative
    to the first/last/linear heuristics of attribution_model_compare:
    one transition census, then 12 value-iteration steps over a
    (removed-channel × state) grid that is domain-sized by
    construction. The oracle unrolls the identical iterations as
    generated chained CTEs.
  * ``dq_category_drift``: first-half vs second-half categorical domain
    comparison — values appearing only in the current window (new
    categories: upstream enum grew) or only in the baseline
    (disappeared: producer dropped a code path), per column. The
    value-domain companion of dq_schema_drift (columns) and
    dq_drift_psi (distributions).

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ._json_compat import duck_json_int, spark_json_int
from ..tables import load_table

CAT_EV = "2.L event analytics"
CAT_DQ = "2.L data quality / privacy"

N_ITERS = 12
CHANNELS = ("click", "view", "signup", "error")

# journeys: per user, events ordered, truncated AT the first purchase
# (absorbing); transitions from every non-purchase event to the next
# event type, or to 'null' at sequence end; plus ('start', first type).
_TRANS_SQL = """
    seq AS (
      SELECT user_id, event_type, ts, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events WHERE ts IS NOT NULL
    ),
    fp AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'purchase' THEN rn END) AS prn
      FROM seq GROUP BY user_id
    ),
    journey AS (
      SELECT s.* FROM seq s JOIN fp USING (user_id)
      WHERE fp.prn IS NULL OR s.rn <= fp.prn
    ),
    hops AS (
      SELECT user_id, event_type AS frm,
             COALESCE(LEAD(event_type) OVER (PARTITION BY user_id
                                             ORDER BY rn), 'null') AS to_s
      FROM journey
    ),
    trans AS (
      SELECT frm, to_s, COUNT(*)::BIGINT AS n
      FROM hops WHERE frm != 'purchase' GROUP BY 1, 2
      UNION ALL
      SELECT 'start' AS frm, event_type AS to_s, COUNT(*)::BIGINT AS n
      FROM journey WHERE rn = 1 GROUP BY event_type
    ),
    probs AS MATERIALIZED (
      SELECT frm, to_s,
             CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY frm) AS p
      FROM trans
    )
"""


def _removal_oracle() -> str:
    removed = "', '".join(("none",) + CHANNELS)
    sql = f"""
    WITH {_TRANS_SQL},
    grid0 AS MATERIALIZED (
      SELECT r.removed, s.state, CAST(0.0 AS DOUBLE) AS v
      FROM (SELECT unnest(['{removed}']) AS removed) r
      CROSS JOIN (SELECT DISTINCT frm AS state FROM probs) s
    )"""
    prev = "grid0"
    for t in range(1, N_ITERS + 1):
        sql += f""",
    grid{t} AS MATERIALIZED (
      SELECT g.removed, p.frm AS state,
             CASE WHEN p.frm = g.removed THEN 0.0 ELSE
               SUM(p.p * CASE WHEN p.to_s = 'purchase' THEN 1.0
                              WHEN p.to_s = 'null' THEN 0.0
                              WHEN p.to_s = g.removed THEN 0.0
                              ELSE COALESCE(gv.v, 0.0) END)
             END AS v
      FROM probs p
      JOIN (SELECT DISTINCT removed FROM {prev}) g ON TRUE
      LEFT JOIN {prev} gv ON gv.removed = g.removed AND gv.state = p.to_s
      GROUP BY g.removed, p.frm
    )"""
        prev = f"grid{t}"
    return sql + f"""
    ,
    conv AS (
      SELECT removed, v FROM {prev} WHERE state = 'start'
    ),
    base AS (SELECT v AS base_conv FROM conv WHERE removed = 'none'),
    effects AS (
      SELECT c.removed AS channel, b.base_conv, c.v AS removed_conv,
             (b.base_conv - c.v) / b.base_conv AS effect
      FROM conv c CROSS JOIN base b WHERE c.removed != 'none'
    ),
    etot AS (SELECT SUM(effect) AS te FROM effects)
    SELECT e.channel,
           ROUND(e.base_conv, 4) AS base_conv,
           ROUND(e.removed_conv, 4) AS removed_conv,
           ROUND(e.effect, 4) AS removal_effect,
           ROUND(e.effect / t.te, 4) AS credit_share
    FROM effects e CROSS JOIN etot t
    """


def _transition_probs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fact-scale half of the Markov attribution: journeys truncated
    at first purchase → (frm, to_s, p) transition census. Exposed as a
    helper so tests can plan-assert the census (partial aggregation, no
    cartesian) independently of the driver-side value iteration."""
    # NULL ts dropped on both engines (the r8 NULL-time seam)
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", F.col("event_id").asc_nulls_last())
    seq = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    )
    fp = seq.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("rn"))
        ).alias("prn")
    )
    journey = seq.join(fp, "user_id").filter(
        F.col("prn").isNull() | (F.col("rn") <= F.col("prn"))
    )
    wj = Window.partitionBy("user_id").orderBy("rn")
    hops = journey.select(
        F.col("event_type").alias("frm"),
        F.coalesce(F.lead("event_type").over(wj), F.lit("null")).alias(
            "to_s"
        ),
    ).filter(F.col("frm") != "purchase")
    starts = journey.filter(F.col("rn") == 1).select(
        F.lit("start").alias("frm"), F.col("event_type").alias("to_s")
    )
    trans = (
        hops.unionByName(starts)
        .groupBy("frm", "to_s")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wfrm = Window.partitionBy("frm")
    return trans.select(
        "frm",
        "to_s",
        (F.col("n").cast("double") / F.sum("n").over(wfrm)).alias("p"),
    )


@register("events_attribution_markov_removal", CAT_EV, _removal_oracle())
def events_attribution_markov_removal(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Markov removal-effect attribution: model user journeys (truncated
    at first purchase) as a first-order chain with absorbing 'purchase'
    and 'null' ends; each channel's credit is the relative drop in
    start→purchase absorption probability when journeys through that
    channel are killed (its state value clamped to 0 — the standard
    knock-out, no renormalization). Absorption is computed by 12
    synchronous value-iteration steps over the (removed × state) grid —
    enough to converge far below the 4-dp report for a 5-state chain —
    identically unrolled on both engines.

    Why it exists: first/last/linear attribution (attribution_model_
    compare) credit positions; removal effect credits CAUSAL
    participation — a channel no journey needs gets zero credit even
    if it appears everywhere.

    Scale shape: one window pass builds the transition census; all
    iteration state is |channels+2| × |states| rows — iterate on
    aggregates (the graph_pagerank discipline); the census collect is
    domain-sized by construction."""
    probs = _transition_probs(spark, sf_dir)
    # domain-sized collect: |states|^2 transition cells at most
    cells = probs.collect()
    states = sorted({r["frm"] for r in cells})
    p = {}
    for r in cells:
        p.setdefault(r["frm"], []).append((r["to_s"], r["p"]))
    if "start" not in p:
        # no journeys at all (r9 empty-table sweep: v['start'] was a
        # driver-side KeyError) — no channels, no credit, empty report
        # on both engines
        return spark.createDataFrame(
            [],
            "channel string, base_conv double, removed_conv double,"
            " removal_effect double, credit_share double",
        )
    results = []
    for removed in ("none",) + CHANNELS:
        v = {s: 0.0 for s in states}
        for _ in range(N_ITERS):
            nv = {}
            for s in states:
                if s == removed:
                    nv[s] = 0.0
                    continue
                acc = 0.0
                for to_s, pr in p[s]:
                    if to_s == "purchase":
                        acc += pr * 1.0
                    elif to_s == "null" or to_s == removed:
                        acc += pr * 0.0
                    else:
                        acc += pr * v.get(to_s, 0.0)
                nv[s] = acc
            v = nv
        results.append((removed, v["start"]))
    base = dict(results)["none"]
    effects = [
        (ch, base, conv, (base - conv) / base)
        for ch, conv in results
        if ch != "none"
    ]
    te = sum(e for *_x, e in effects)
    rows = [
        (
            ch,
            round(base, 4),
            round(conv, 4),
            round(eff, 4),
            round(eff / te, 4),
        )
        for ch, _b, conv, eff in effects
    ]
    return spark.createDataFrame(
        rows,
        "channel string, base_conv double, removed_conv double,"
        " removal_effect double, credit_share double",
    )


@register(
    "dq_category_drift",
    CAT_DQ,
    f"""
    WITH bounds AS (
      SELECT (epoch_us(MIN(ts)) + epoch_us(MAX(ts))) // 2 AS mid_us
      FROM events
    ),
    wined AS (
      SELECT CASE WHEN epoch_us(e.ts) < b.mid_us THEN 'baseline'
                  ELSE 'current' END AS win,
             e.event_type,
             CAST(CAST(floor(e.value / 50.0) AS BIGINT) AS VARCHAR)
               AS value_band,
             CAST({duck_json_int("e.props", "$.k", "BIGINT")} % 5
                  AS VARCHAR) AS props_k_band
      FROM events e CROSS JOIN bounds b
    ),
    labeled AS (
      SELECT win, 'event_type' AS col, event_type AS val FROM wined
      UNION ALL
      SELECT win, 'value_band', value_band FROM wined
      UNION ALL
      SELECT win, 'props_k_band', props_k_band FROM wined
    ),
    doms AS (
      SELECT col, val,
             MAX(CASE WHEN win = 'baseline' THEN 1 ELSE 0 END) AS in_base,
             MAX(CASE WHEN win = 'current' THEN 1 ELSE 0 END) AS in_cur,
             COUNT(*)::BIGINT AS n
      FROM labeled GROUP BY col, val
    )
    SELECT col, val, n,
           CASE WHEN in_base = 0 THEN 'new_category'
                WHEN in_cur = 0 THEN 'disappeared' END AS drift_class
    FROM doms WHERE in_base = 0 OR in_cur = 0
    """,
)
def dq_category_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical-domain drift between the first and second half of
    the time range: values present only in the current window are NEW
    categories (an upstream enum grew — downstream CASE statements are
    silently mis-bucketing them), values present only in the baseline
    DISAPPEARED (a producer code path died). Checked across three
    derived categorical columns in one unpivoted pass. Completes the
    drift triptych: dq_schema_drift watches columns, dq_drift_psi
    watches distributions, this watches the value domain itself.

    Scale shape: one scan unpivoted row-locally to (column, value)
    pairs, then a domain-sized presence census — no joins."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.expr(
            "(unix_micros(MIN(ts)) + unix_micros(MAX(ts))) DIV 2"
        ).alias("mid_us")
    )
    labeled = (
        ev.crossJoin(F.broadcast(bounds))
        .select(
            F.when(F.unix_micros("ts") < F.col("mid_us"), "baseline")
            .otherwise("current")
            .alias("win"),
            F.explode(
                F.array(
                    F.struct(
                        F.lit("event_type").alias("col"),
                        F.col("event_type").alias("val"),
                    ),
                    F.struct(
                        F.lit("value_band").alias("col"),
                        F.floor(F.col("value") / 50.0)
                        .cast("long")
                        .cast("string")
                        .alias("val"),
                    ),
                    F.struct(
                        F.lit("props_k_band").alias("col"),
                        (
                            spark_json_int("props", "$.k", "long")
                            % 5
                        )
                        .cast("string")
                        .alias("val"),
                    ),
                )
            ).alias("cv"),
        )
        .select("win", F.col("cv.col").alias("col"), F.col("cv.val").alias("val"))
    )
    doms = labeled.groupBy("col", "val").agg(
        F.max(F.when(F.col("win") == "baseline", 1).otherwise(0)).alias(
            "in_base"
        ),
        F.max(F.when(F.col("win") == "current", 1).otherwise(0)).alias(
            "in_cur"
        ),
        F.count(F.lit(1)).alias("n"),
    )
    return doms.filter(
        (F.col("in_base") == 0) | (F.col("in_cur") == 0)
    ).select(
        "col",
        "val",
        "n",
        F.when(F.col("in_base") == 0, "new_category")
        .when(F.col("in_cur") == 0, "disappeared")
        .alias("drift_class"),
    )
