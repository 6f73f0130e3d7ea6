"""Wave 77: release-gate privacy + sketch-accuracy + rounding surface.

  * ``dq_tcloseness``: t-closeness audit — earth-mover's distance
    between each QI group's sensitive-attribute distribution and the
    global one, on the ordered balance bands. Completes the
    k-anonymity / l-diversity / t-closeness release-gate triple
    (ops_wave51): k blocks re-identification, l blocks attribute
    disclosure by count, t blocks it by DISTRIBUTION skew. The EMD is
    computed entirely in BIGINT via common denominators — the ≤0.2
    violation flag is an exact integer comparison.
  * ``agg_approx_percentile_bound``: Spark's GK-sketch
    ``approx_percentile`` checked against its own rank guarantee —
    the approx value's true rank must sit within ε·N of the target
    rank (ε = 1/accuracy). The exact percentiles are DuckDB-oracled;
    the guarantee booleans are the cross-checked invariant (the
    sketch value itself has no cross-engine oracle).
  * ``fn_bround``: HALF_EVEN (banker's) vs HALF_UP rounding on exact
    .5 midpoints of both signs — the oracle restates Spark's
    HALF_EVEN contract in portable CASE arithmetic (DuckDB has no
    native banker's rounding on DOUBLE).

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

CAT_DQ = "2.L data quality / privacy"
CAT_AGG = "2.D aggregations"
CAT_FN = "2.H scalar functions"


@register(
    "dq_tcloseness",
    CAT_DQ,
    """
    WITH cells AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 2000.0) AS BIGINT) AS band,
             COUNT(*)::BIGINT AS cnt
      FROM customer GROUP BY 1, 2, 3
    ),
    bands AS (SELECT DISTINCT band FROM cells),
    grps AS (
      SELECT c_nationkey, c_mktsegment, SUM(cnt)::BIGINT AS n_g
      FROM cells GROUP BY 1, 2
    ),
    gdist AS (
      SELECT band, SUM(cnt)::BIGINT AS n_b FROM cells GROUP BY 1
    ),
    tot AS (
      SELECT SUM(n_b)::BIGINT AS n,
             (SELECT COUNT(*) FROM bands)::BIGINT AS m
      FROM gdist
    ),
    spine AS (
      SELECT g.c_nationkey, g.c_mktsegment, g.n_g, b.band,
             COALESCE(c.cnt, 0)::BIGINT AS cnt
      FROM grps g CROSS JOIN bands b
      LEFT JOIN cells c ON c.c_nationkey = g.c_nationkey
        AND c.c_mktsegment = g.c_mktsegment AND c.band = b.band
    ),
    cum AS (
      SELECT s.c_nationkey, s.c_mktsegment, s.n_g, s.band,
             SUM(s.cnt) OVER (PARTITION BY s.c_nationkey, s.c_mktsegment
                              ORDER BY s.band) AS cum_g,
             SUM(gl.n_b) OVER (PARTITION BY s.c_nationkey, s.c_mktsegment
                               ORDER BY s.band) AS cum_all
      FROM spine s JOIN gdist gl ON gl.band = s.band
    )
    SELECT c.c_nationkey, c.c_mktsegment, MAX(c.n_g) AS n_g,
           CAST((2 * SUM(ABS(c.cum_g * t.n - c.cum_all * c.n_g)) * 10000
                 + (t.m - 1) * MAX(c.n_g) * t.n)
                // (2 * (t.m - 1) * MAX(c.n_g) * t.n) AS BIGINT)
             AS emd_x1e4,
           5 * SUM(ABS(c.cum_g * t.n - c.cum_all * c.n_g))
             > (t.m - 1) * MAX(c.n_g) * t.n AS violates_t02
    FROM cum c CROSS JOIN tot t
    GROUP BY c.c_nationkey, c.c_mktsegment, t.m, t.n
    """,
)
def dq_tcloseness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit over the (nation, segment) quasi-identifier
    groups: the earth-mover's distance between each group's
    balance-band distribution and the global one, where EMD over an
    ordered equal-spaced attribute is the mean absolute difference of
    CDFs: EMD = Σ_b |P_cum − Q_cum| / (m−1). A group failing t=0.2
    leaks its members' balance profile even if k-anonymous and
    l-diverse. Spelled over the common denominator n_g·N so every
    comparison and the 1e-4-unit EMD are exact integers.

    Scale shape: one QI×band census (map-combinable), a bounded
    group×band spine (|QI groups| · m rows), cumulative windows
    partitioned by group — never a row-grain pass after the census."""
    c = load_table(spark, sf_dir, "customer")
    cells = c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 2000.0).cast("long").alias("band"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    bands = cells.select("band").distinct()
    grps = cells.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("cnt").alias("n_g")
    )
    glob = cells.groupBy("band").agg(F.sum("cnt").alias("n_b"))
    tot = glob.agg(F.sum("n_b").alias("n")).crossJoin(
        F.broadcast(bands.agg(F.count(F.lit(1)).alias("m")))
    )
    spine = (
        grps.crossJoin(F.broadcast(bands))
        .join(cells, ["c_nationkey", "c_mktsegment", "band"], "left")
        .select(
            "c_nationkey",
            "c_mktsegment",
            "n_g",
            "band",
            F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"),
        )
    )
    w = (
        Window.partitionBy("c_nationkey", "c_mktsegment")
        .orderBy("band")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = spine.join(F.broadcast(glob), "band").select(
        "c_nationkey",
        "c_mktsegment",
        "n_g",
        F.sum("cnt").over(w).alias("cum_g"),
        F.sum("n_b").over(w).alias("cum_all"),
    )
    s_int = F.sum(
        F.abs(F.col("cum_g") * F.col("n") - F.col("cum_all") * F.col("n_g"))
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("c_nationkey", "c_mktsegment", "m", "n")
        .agg(
            F.max("n_g").alias("_ng"),
            s_int.alias("_s"),
        )
        .select(
            "c_nationkey",
            "c_mktsegment",
            F.col("_ng").alias("n_g"),
            F.expr(
                "CAST((2 * _s * 10000 + (m - 1) * _ng * n)"
                " DIV (2 * (m - 1) * _ng * n) AS BIGINT)"
            ).alias("emd_x1e4"),
            (5 * F.col("_s") > (F.col("m") - 1) * F.col("_ng") * F.col("n"))
            .alias("violates_t02"),
        )
    )


@register(
    "agg_approx_percentile_bound",
    CAT_AGG,
    """
    SELECT COUNT(*)::BIGINT AS n,
           ROUND(quantile_cont(value, 0.5), 4) AS exact_p50,
           ROUND(quantile_cont(value, 0.9), 4) AS exact_p90,
           ROUND(quantile_cont(value, 0.99), 4) AS exact_p99,
           TRUE AS within_p50, TRUE AS within_p90, TRUE AS within_p99
    FROM events
    """,
)
def agg_approx_percentile_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald–Khanna sketch, accuracy 10000)
    checked against its own contract: the returned value's TRUE rank
    must lie within ε·N (+1 for interpolation slack) of the target
    rank, ε = 1/accuracy. The exact interpolated percentiles are
    DuckDB-oracled; the three guarantee booleans are computed on the
    Spark side from exact integer ranks and asserted TRUE by the
    oracle — if the sketch ever violated its bound, the driver's hash
    would catch it (the composed-invariant pattern of llm_ann_recall).

    Scale shape: the sketch is a fixed-memory single-pass aggregate —
    THE way to get percentiles at 100 TB where exact percentile's
    global sort is off the table; the rank check adds one conditional
    aggregate against the broadcast 1-row sketch output."""
    ev = load_table(spark, sf_dir, "events")
    sk = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(
            "approx_percentile(value, array(0.5D, 0.9D, 0.99D), 10000)"
        ).alias("ap"),
        F.expr("percentile(value, array(0.5D, 0.9D, 0.99D))").alias("ep"),
    )
    ranks = (
        ev.crossJoin(F.broadcast(sk))
        .agg(
            F.max("n").alias("n"),
            F.first("ep").alias("ep"),
            F.sum(
                F.when(F.col("value") <= F.expr("element_at(ap, 1)"), 1)
                .otherwise(0)
            ).alias("r50"),
            F.sum(
                F.when(F.col("value") <= F.expr("element_at(ap, 2)"), 1)
                .otherwise(0)
            ).alias("r90"),
            F.sum(
                F.when(F.col("value") <= F.expr("element_at(ap, 3)"), 1)
                .otherwise(0)
            ).alias("r99"),
        )
    )
    # |100·r − pct·N| ≤ 100·(εN + 1) with ε = 1e-4  ⇒  ≤ N div 100 + 100
    def ok(r: str, pct: int):
        return F.expr(
            f"ABS(100 * {r} - {pct} * n) <= n DIV 100 + 100"
        )

    # COALESCE: over an empty corpus n is 0 (not NULL) and the bound
    # checks are vacuously TRUE, matching the oracle's literals
    # (empty-corpus census r6)
    return ranks.select(
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
        F.round(F.expr("element_at(ep, 1)"), 4).alias("exact_p50"),
        F.round(F.expr("element_at(ep, 2)"), 4).alias("exact_p90"),
        F.round(F.expr("element_at(ep, 3)"), 4).alias("exact_p99"),
        F.coalesce(ok("r50", 50), F.lit(True)).alias("within_p50"),
        F.coalesce(ok("r90", 90), F.lit(True)).alias("within_p90"),
        F.coalesce(ok("r99", 99), F.lit(True)).alias("within_p99"),
    )


@register(
    "fn_bround",
    CAT_FN,
    """
    WITH halves AS (
      SELECT (o_orderkey % 19 - 9) / 2.0 AS v FROM orders
    )
    SELECT v, COUNT(*)::BIGINT AS n,
           round(v) AS round_half_away,
           CASE WHEN v - floor(v) = 0.5 THEN
                  CASE WHEN CAST(floor(v) AS BIGINT) % 2 = 0
                       THEN floor(v) ELSE floor(v) + 1 END
                ELSE round(v) END AS round_half_even
    FROM halves GROUP BY v
    """,
)
def fn_bround(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HALF_EVEN (banker's) rounding beside HALF_UP on a grid of exact
    .5 midpoints of both signs (k/2 for k ∈ −9..9): bround(−4.5) = −4
    while round(−4.5) = −5 — the difference that silently biases
    summed money columns when the rounding convention is mixed across
    engines. DuckDB has no banker's rounding on DOUBLE, so the oracle
    restates the HALF_EVEN contract in portable floor/parity CASE
    arithmetic (same restated-semantics pattern as fn_try_cast) —
    Spark's builtin must agree with the from-first-principles spelling
    on every midpoint.

    Scale shape: trivially map-only; grouped to the 19-value domain."""
    o = load_table(spark, sf_dir, "orders")
    halves = o.select(((F.col("o_orderkey") % 19 - 9) / 2.0).alias("v"))
    return (
        halves.groupBy("v")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "v",
            "n",
            F.round(F.col("v"), 0).alias("round_half_away"),
            F.bround(F.col("v"), 0).alias("round_half_even"),
        )
    )
