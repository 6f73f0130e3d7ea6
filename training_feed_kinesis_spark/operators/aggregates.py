"""§2.D Aggregations.

All hash/partial aggregation physics belongs to Tungsten (partial + final
hash-agg with map-side combine is automatic for every groupBy here — we never
hand-build it). Our job: sargable filters before aggs, ROUND(…,4) on every
aggregated DOUBLE on both engine sides (SURVEY §5.3.1), deterministic
first/last via min_by/max_by on the unique event_id.

Scale notes (100 TB): group-by keys here (returnflag×linestatus, event_type,
user_id) are low-to-medium cardinality → partial agg collapses almost all
rows map-side; the shuffle carries only group states. High-cardinality
groupBy(user_id) relies on AQE coalescing; skewed users would be handled by
AQE skew mitigation (aggs pre-combine, so skew is already absorbed map-side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table
from .exact import CENTS_SUM_SQL

FLAGSHIP_CATEGORY = "2.D aggregations"


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary — the engine's flagship query.

    scan → sargable filter (pushed to parquet) → derived columns → hash agg
    → sort. Exercises the whole relational core in one plan; Catalyst keeps
    it a single shuffle (partial agg map-side, final agg post-shuffle).

    Money arithmetic runs in EXACT INTEGER CENTS: the source columns are
    2-decimal (verified to float epsilon at every sf), so the disc/charge
    terms expand to integer component sums — S0=Σcents, Sd=Σcents·d100,
    St=Σcents·t100, Sdt=Σcents·d100·t100 — each a plain BIGINT sum
    (Tungsten long-add fast path; measured +35% vs the double sums where
    a single DECIMAL(38,0) accumulator cost +71%), recombined POST-AGG on
    the handful of group rows in DECIMAL(38,0) (where 10000·S0 may exceed
    int64) and divided back to dollars once. Overflow headroom per
    component at d100≤10, t100≤8, cents≤1.05e7: the largest (Sdt ≤
    8.4e8/row) fits int64 past 10¹⁰ rows (~1 PB of lineitem), and ANSI
    mode makes any excess a loud error, never a wrap. A double SUM here
    is order-dependent across engines, and a round-5 star-corruption
    fixture landed one group's sum exactly on the ROUND(,4) half-digit
    boundary — the last float-hash-divergence class the flagship carried.
    """
    li = load_table(spark, sf_dir, "lineitem")
    cents = "CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)"
    d100 = "CAST(ROUND(l_discount * 100, 0) AS BIGINT)"
    t100 = "CAST(ROUND(l_tax * 100, 0) AS BIGINT)"
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.expr("SUM(CAST(ROUND(l_quantity * 4, 0) AS BIGINT))").alias(
                "sq4"
            ),
            F.expr(f"SUM({cents})").alias("s0"),
            F.expr(f"SUM({cents} * {d100})").alias("sd"),
            F.expr(f"SUM({cents} * {t100})").alias("st"),
            F.expr(f"SUM({cents} * {d100} * {t100})").alias("sdt"),
            F.expr(f"SUM({d100})").alias("sdisc"),
            F.count(F.lit(1)).alias("n"),
        )
        .selectExpr(
            "l_returnflag",
            "l_linestatus",
            # grower sums emitted UNROUNDED (r11 projected-magnitude
            # lint, §5.3.9(a)): the exact-integer-moment quotient is the
            # identical double on both engines at ANY magnitude, while a
            # terminal ROUND flips once the x·10⁴ product passes 2^53
            # (~9e11 — crossed by these sums at the 100 TB target). The
            # avg_* ratios below are bounded and keep the 4dp round.
            "CAST(sq4 AS DOUBLE) / 4.0 AS sum_qty",
            "CAST(s0 AS DOUBLE) / 100.0 AS sum_base_price",
            "CAST(CAST(s0 AS DECIMAL(38,0)) * 100 - sd AS DOUBLE)"
            " / 10000.0 AS sum_disc_price",
            "CAST(CAST(s0 AS DECIMAL(38,0)) * 10000"
            " + CAST(st AS DECIMAL(38,0)) * 100"
            " - CAST(sd AS DECIMAL(38,0)) * 100 - sdt AS DOUBLE)"
            " / 1000000.0 AS sum_charge",
            "ROUND(CAST(sq4 AS DOUBLE) / 4.0 / n, 4) AS avg_qty",
            "ROUND(CAST(s0 AS DOUBLE) / 100.0 / n, 4) AS avg_price",
            "ROUND(CAST(sdisc AS DOUBLE) / 100.0 / n, 4) AS avg_disc",
            "n AS count_order",
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# The oracle mirrors the integer-cents component spelling term for term.
# DuckDB's CAST(double AS BIGINT) rounds where Spark's truncates — every
# cast operand is therefore made exactly integral FIRST: the money terms
# via ROUND(x*100, 0), the quantity via ROUND(x*4, 0) quarter-scaling
# (identity×4 on the integral l_quantity domain, exact on quarter-
# granular fractional domains, and — unlike a FLOOR — sum_qty stays the
# TRUE quantity sum, not a sum of floors). DuckDB SUM(BIGINT)
# widens to HUGEINT, so the post-agg recombination needs no explicit
# DECIMAL cast there; both engines cast the same exact integer to DOUBLE
# (IEEE nearest) and run the same fixed-order divisions.
FLAGSHIP_ORACLE = """
WITH comp AS (
  SELECT
    l_returnflag,
    l_linestatus,
    SUM(CAST(ROUND(l_quantity * 4, 0) AS BIGINT)) AS sq4,
    SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS s0,
    SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
        * CAST(ROUND(l_discount * 100, 0) AS BIGINT)) AS sd,
    SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
        * CAST(ROUND(l_tax * 100, 0) AS BIGINT)) AS st,
    SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
        * CAST(ROUND(l_discount * 100, 0) AS BIGINT)
        * CAST(ROUND(l_tax * 100, 0) AS BIGINT)) AS sdt,
    SUM(CAST(ROUND(l_discount * 100, 0) AS BIGINT)) AS sdisc,
    COUNT(*) AS n
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '1998-09-02'
  GROUP BY l_returnflag, l_linestatus
)
SELECT
  l_returnflag,
  l_linestatus,
  CAST(sq4 AS DOUBLE) / 4.0 AS sum_qty,
  CAST(s0 AS DOUBLE) / 100.0 AS sum_base_price,
  CAST(s0 * 100 - sd AS DOUBLE) / 10000.0 AS sum_disc_price,
  CAST(s0 * 10000 + st * 100 - sd * 100 - sdt AS DOUBLE)
        / 1000000.0 AS sum_charge,
  ROUND(CAST(sq4 AS DOUBLE) / 4.0 / n, 4) AS avg_qty,
  ROUND(CAST(s0 AS DOUBLE) / 100.0 / n, 4) AS avg_price,
  ROUND(CAST(sdisc AS DOUBLE) / 100.0 / n, 4) AS avg_disc,
  n AS count_order
FROM comp
ORDER BY l_returnflag, l_linestatus
"""

register("agg_basic", FLAGSHIP_CATEGORY, FLAGSHIP_ORACLE)(flagship)


@register(
    "agg_count_distinct",
    "2.D aggregations",
    """
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*)                AS n_events
    FROM events GROUP BY event_type
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register("agg_approx_distinct", "2.D aggregations")  # rows-only: HLL++ ≠ DuckDB HLL
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++). No oracle — approx sketches differ by
    engine (SURVEY §5.3.4); the exact variant is oracled in agg_count_distinct."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("approx_users")
    )


# agg_stats moment algebra, shared VERBATIM by both engines over
# identically-named DECIMAL(38,0) moment columns (r10 ROUND-magnitude
# seam, §5.3.9): variance of prices is ~9e8, where (a) native
# VAR_SAMP/CORR accumulate floats in engine-specific order and (b)
# DuckDB ROUND(x, 4) itself is lossy (it rounds the float product
# x*10000, whose grid at ~9e12 is 2e-3). Exact integer-cent moments
# with per-term DECIMAL widening make every statistic ONE identical
# float expression on identical inputs; var_price is emitted UNROUNDED
# (its magnitude forbids a 4dp round), the small-magnitude stats keep
# their rounds. NULL handling mirrors the native aggregates: per-column
# deletion for sd/var, pairwise deletion for corr/covar.
_STATS_MATH = {
    "sd_qty": (
        "CASE WHEN nq > 1 THEN ROUND(sqrt(CAST(nq * sqq - sq * sq AS DOUBLE)"
        " / (CAST(nq AS DOUBLE) * (nq - 1)) / 1e4), 4) END"
    ),
    "var_price": (
        "CASE WHEN np > 1 THEN CAST(np * spp - sp * sp AS DOUBLE)"
        " / (CAST(np AS DOUBLE) * (np - 1)) / 1e4 END"
    ),
    "corr_qty_price": (
        "CASE WHEN nxy > 1 THEN ROUND(CAST(nxy * sxy - sxq * syp AS DOUBLE)"
        " / NULLIF(sqrt(CAST(nxy * sxx - sxq * sxq AS DOUBLE)"
        "               * CAST(nxy * syy - syp * syp AS DOUBLE)),"
        " CAST(0 AS DOUBLE)), 4)"
        " END"
    ),
    "covar_qty_price": (
        "CASE WHEN nxy > 0 THEN ROUND(CAST(nxy * sxy - sxq * syp AS DOUBLE)"
        " / (CAST(nxy AS DOUBLE) * nxy) / 1e4, 4) END"
    ),
}

_STATS_SELECT = ", ".join(
    f"{expr} AS {name}" for name, expr in _STATS_MATH.items()
)


@register(
    "agg_stats",
    "2.D aggregations",
    f"""
    WITH q AS (
      SELECT l_returnflag,
             CAST(ROUND(l_quantity * 100, 0) AS BIGINT) AS qc,
             CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS pc
      FROM lineitem
    ),
    m AS (
      SELECT l_returnflag,
             COUNT(qc)::DECIMAL(38,0) AS nq,
             CAST(COALESCE(SUM(CAST(qc AS DECIMAL(38,0))), 0) AS DECIMAL(38,0)) AS sq,
             CAST(COALESCE(SUM(CAST(qc AS DECIMAL(38,0)) * qc), 0) AS DECIMAL(38,0)) AS sqq,
             COUNT(pc)::DECIMAL(38,0) AS np,
             CAST(COALESCE(SUM(CAST(pc AS DECIMAL(38,0))), 0) AS DECIMAL(38,0)) AS sp,
             CAST(COALESCE(SUM(CAST(pc AS DECIMAL(38,0)) * pc), 0) AS DECIMAL(38,0)) AS spp,
             COUNT(CASE WHEN qc IS NOT NULL AND pc IS NOT NULL THEN 1 END)::DECIMAL(38,0) AS nxy,
             CAST(COALESCE(SUM(CASE WHEN pc IS NOT NULL THEN CAST(qc AS DECIMAL(38,0)) END), 0) AS DECIMAL(38,0)) AS sxq,
             CAST(COALESCE(SUM(CASE WHEN qc IS NOT NULL THEN CAST(pc AS DECIMAL(38,0)) END), 0) AS DECIMAL(38,0)) AS syp,
             CAST(COALESCE(SUM(CASE WHEN pc IS NOT NULL THEN CAST(qc AS DECIMAL(38,0)) * qc END), 0) AS DECIMAL(38,0)) AS sxx,
             CAST(COALESCE(SUM(CASE WHEN qc IS NOT NULL THEN CAST(pc AS DECIMAL(38,0)) * pc END), 0) AS DECIMAL(38,0)) AS syy,
             CAST(COALESCE(SUM(CAST(qc AS DECIMAL(38,0)) * pc), 0) AS DECIMAL(38,0)) AS sxy
      FROM q GROUP BY l_returnflag
    )
    SELECT l_returnflag, {_STATS_SELECT}
    FROM m
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group sd/var/corr/covar over exact integer-cent moments (see
    _STATS_MATH): the shuffle carries 12 decimal partial sums per group
    (map-side combinable), and every emitted statistic is one float
    expression — shared verbatim with the oracle — over bit-identical
    inputs. The native VAR_SAMP/CORR spellings were retired in r10: their
    float accumulation order is engine-specific, and at var_price's ~9e8
    magnitude the 4dp round sits inside both engines' noise AND DuckDB's
    lossy ROUND grid (§5.3.9)."""
    li = load_table(spark, sf_dir, "lineitem")
    q = li.select(
        "l_returnflag",
        F.expr("CAST(ROUND(l_quantity * 100, 0) AS BIGINT)").alias("qc"),
        F.expr("CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)").alias("pc"),
    )
    m = q.groupBy("l_returnflag").agg(
        F.expr("CAST(COUNT(qc) AS DECIMAL(38,0))").alias("nq"),
        F.expr("CAST(COALESCE(SUM(CAST(qc AS DECIMAL(38,0))), 0) AS DECIMAL(38,0))").alias("sq"),
        F.expr("CAST(COALESCE(SUM(CAST(qc AS DECIMAL(38,0)) * qc), 0) AS DECIMAL(38,0))").alias("sqq"),
        F.expr("CAST(COUNT(pc) AS DECIMAL(38,0))").alias("np"),
        F.expr("CAST(COALESCE(SUM(CAST(pc AS DECIMAL(38,0))), 0) AS DECIMAL(38,0))").alias("sp"),
        F.expr("CAST(COALESCE(SUM(CAST(pc AS DECIMAL(38,0)) * pc), 0) AS DECIMAL(38,0))").alias("spp"),
        F.expr("CAST(COUNT(CASE WHEN qc IS NOT NULL AND pc IS NOT NULL THEN 1 END) AS DECIMAL(38,0))").alias("nxy"),
        F.expr("CAST(COALESCE(SUM(CASE WHEN pc IS NOT NULL THEN CAST(qc AS DECIMAL(38,0)) END), 0) AS DECIMAL(38,0))").alias("sxq"),
        F.expr("CAST(COALESCE(SUM(CASE WHEN qc IS NOT NULL THEN CAST(pc AS DECIMAL(38,0)) END), 0) AS DECIMAL(38,0))").alias("syp"),
        F.expr("CAST(COALESCE(SUM(CASE WHEN pc IS NOT NULL THEN CAST(qc AS DECIMAL(38,0)) * qc END), 0) AS DECIMAL(38,0))").alias("sxx"),
        F.expr("CAST(COALESCE(SUM(CASE WHEN qc IS NOT NULL THEN CAST(pc AS DECIMAL(38,0)) * pc END), 0) AS DECIMAL(38,0))").alias("syy"),
        F.expr("CAST(COALESCE(SUM(CAST(qc AS DECIMAL(38,0)) * pc), 0) AS DECIMAL(38,0))").alias("sxy"),
    )
    return m.select(
        "l_returnflag",
        *[F.expr(expr).alias(name) for name, expr in _STATS_MATH.items()],
    )


@register(
    "agg_percentile",
    "2.D aggregations",
    """
    SELECT event_type,
           ROUND(percentile_cont(0.25) WITHIN GROUP (ORDER BY value), 4) AS p25,
           ROUND(percentile_cont(0.5)  WITHIN GROUP (ORDER BY value), 4) AS p50,
           ROUND(percentile_cont(0.95) WITHIN GROUP (ORDER BY value), 4) AS p95
    FROM events GROUP BY event_type
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.25)), 4).alias("p25"),
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("value", F.lit(0.95)), 4).alias("p95"),
    )


@register(
    "agg_collect",
    "2.D aggregations",
    # sort-then-join-to-string: collect order is nondeterministic across
    # partitions, so both sides emit a canonical sorted string (SURVEY §5.3.5)
    """
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation GROUP BY n_regionkey
    """,
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    na = load_table(spark, sf_dir, "nation")
    return na.groupBy("n_regionkey").agg(
        F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations")
    )


@register(
    "agg_filtered",
    "2.D aggregations",
    """
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'purchase')                 AS n_purchases,
           ROUND(SUM(value) FILTER (WHERE event_type = 'purchase'), 4)    AS purchase_value,
           COUNT(*) FILTER (WHERE event_type = 'error')                   AS n_errors
    FROM events GROUP BY user_id
    """,
)
def agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchase = F.col("event_type") == "purchase"
    return ev.groupBy("user_id").agg(
        F.count_if(purchase).alias("n_purchases"),
        F.round(F.sum(F.when(purchase, F.col("value"))), 4).alias("purchase_value"),
        F.count_if(F.col("event_type") == "error").alias("n_errors"),
    )


@register(
    "agg_rollup",
    "2.D aggregations",
    """
    SELECT r_name, n_name,
           COUNT(*)                  AS n_customers,
           CAST(SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) AS DOUBLE)
             / 100.0                 AS total_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    -- empty-input parity (r10 joint-corruption sweep: an EMPTY region
    -- dim empties the join — the r6 precondition met in the wild);
    -- standard SQL emits the () grand row over zero input, Spark's
    -- rollup emits nothing; COUNT > 0 on any non-empty input
    HAVING COUNT(*) > 0
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empty-input parity via HAVING COUNT(*) > 0 in the oracle (the r9
    ts_rollup_hierarchy pattern): Spark's rollup emits nothing over zero
    joined rows, standard SQL emits the () grand row — an empty dim
    (r10 joint-corruption campaign) empties the whole join. agg_cube /
    agg_grouping_sets still carry the r6 non-empty-input precondition
    (their fact tables are never empty in any replay class; pinned by
    tests/test_null_injection.py::test_grouping_sets_empty_divergence_pinned)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = c.join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    ).join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    # exact integer cents (§5.3.6b), projected before the rollup so the
    # term is computed once per row, not once per Expand duplicate
    projected = joined.select(
        "r_name",
        "n_name",
        F.expr("CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)").alias("bal_c"),
    )
    return projected.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        (F.sum("bal_c").cast("double") / 100.0).alias("total_bal"),
    )


@register(
    "agg_cube",
    "2.D aggregations",
    """
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*)                    AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS DOUBLE)
             / 100.0                   AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    # exact integer cents (§5.3.6b), projected before the cube so the
    # term is computed once per row, not once per Expand duplicate (4x)
    projected = o.select(
        "o_orderstatus",
        "o_orderpriority",
        F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)").alias("pr_c"),
    )
    return projected.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        (F.sum("pr_c").cast("double") / 100.0).alias("total_price"),
    )


@register(
    "agg_grouping_sets",
    "2.D aggregations",
    """
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_gs")
    # SQL entry point — GROUPING SETS has no direct DataFrame spelling
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

@register(
    "agg_pivot",
    "2.D aggregations",
    # manual CASE-WHEN spread: DuckDB PIVOT column ordering differs (SURVEY §5.3.6)
    """
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
           COUNT(*) FILTER (WHERE event_type = 'error')    AS error,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
           COUNT(*) FILTER (WHERE event_type = 'view')     AS view
    FROM events GROUP BY user_id
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # explicit pivot values: skips the extra distinct-values job AND pins schema
    df = ev.groupBy("user_id").pivot("event_type", _EVENT_TYPES).count()
    # pivot emits NULL for empty cells; COUNT FILTER emits 0 — normalize
    return df.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in _EVENT_TYPES],
    )


@register(
    "agg_first_last",
    "2.D aggregations",
    # deterministic first/last: arg-min/max on the globally-unique
    # event_id. The selected expression rides through a COALESCE sentinel
    # because DuckDB's arg_min/arg_max SKIP rows whose value argument is
    # NULL while Spark's min_by/max_by return them — "the event_type of
    # the extremal event, even if unlabeled" is the intended semantics on
    # both engines (caught by the NULL-attribute corruption replay).
    # Sentinel is chr(1) (ASCII SOH), a control character outside any
    # plausible event_type domain — a printable sentinel like '(null)'
    # would silently map a legitimate value of that exact string to NULL
    """
    SELECT user_id,
           NULLIF(arg_min(COALESCE(event_type, chr(1)), event_id),
                  chr(1)) AS first_type,
           NULLIF(arg_max(COALESCE(event_type, chr(1)), event_id),
                  chr(1)) AS last_type,
           ROUND(arg_min(value, event_id), 4) AS first_value,
           ROUND(arg_max(value, event_id), 4) AS last_value
    FROM events GROUP BY user_id
    """,
)
def agg_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    et = F.coalesce(F.col("event_type"), F.lit("\x01"))
    return ev.groupBy("user_id").agg(
        F.nullif(F.min_by(et, F.col("event_id")), F.lit("\x01")).alias(
            "first_type"
        ),
        F.nullif(F.max_by(et, F.col("event_id")), F.lit("\x01")).alias(
            "last_type"
        ),
        F.round(F.min_by("value", "event_id"), 4).alias("first_value"),
        F.round(F.max_by("value", "event_id"), 4).alias("last_value"),
    )


@register(
    "agg_skew_twophase",
    FLAGSHIP_CATEGORY,
    f"""
    SELECT event_type, COUNT(*) AS n,
           {CENTS_SUM_SQL.format(col='value')} AS total_value,
           ROUND(MAX(value), 4) AS max_value
    FROM events GROUP BY event_type
    """,
)
def agg_skew_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase (salted) aggregation for skewed group keys: phase 1 groups
    by (key, salt) — a hot key's rows split across N reducers — phase 2
    re-aggregates the N partials per key. For algebraic aggregates
    (count/sum/max) the composition is exact, so the plain-group-by oracle
    must match. This is the manual fallback when one group key dominates:
    Spark's map-side partial aggregation already handles MOST skew (each
    mapper pre-collapses its rows), but when a single key's partials still
    overwhelm one reducer — think 10^9-row groups at 100 TB — the salt
    bounds any reducer's share to 1/N of the hot key."""
    ev = load_table(spark, sf_dir, "events")
    salted = ev.withColumn(
        "salt", F.pmod(F.xxhash64("event_id"), F.lit(16)).cast("int")
    )
    # exact integer-cents partials (r11 magnitude lint, §5.3.9(a)): the
    # two-phase composition stays exact at any scale, and the grower sum
    # is emitted unrounded — phase order can never move the total. The
    # special-float counters ride the partials so the recomposed total
    # reproduces CENTS_SUM_SQL's IEEE poisoning (NaN dominates, ±Inf
    # propagate, mixed signs → NaN): the oracle is the one-phase
    # fragment and both must poison identically on corrupt input.
    nonfinite = (
        "isnan(value) OR value = CAST('Infinity' AS DOUBLE)"
        " OR value = CAST('-Infinity' AS DOUBLE)"
    )
    partial = salted.groupBy("event_type", "salt").agg(
        F.count(F.lit(1)).alias("pn"),
        F.expr(
            f"SUM(CASE WHEN {nonfinite} THEN NULL"
            " ELSE CAST(ROUND(value * 100, 0) AS BIGINT) END)"
        ).alias("psum_c"),
        F.expr("SUM(CASE WHEN isnan(value) THEN 1 ELSE 0 END)").alias(
            "p_nan"
        ),
        F.expr(
            "SUM(CASE WHEN value = CAST('Infinity' AS DOUBLE)"
            " THEN 1 ELSE 0 END)"
        ).alias("p_pinf"),
        F.expr(
            "SUM(CASE WHEN value = CAST('-Infinity' AS DOUBLE)"
            " THEN 1 ELSE 0 END)"
        ).alias("p_ninf"),
        F.max("value").alias("pmax"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n"),
        F.expr(
            "CASE"
            " WHEN SUM(p_nan) > 0 OR (SUM(p_pinf) > 0 AND SUM(p_ninf) > 0)"
            " THEN CAST('NaN' AS DOUBLE)"
            " WHEN SUM(p_pinf) > 0 THEN CAST('Infinity' AS DOUBLE)"
            " WHEN SUM(p_ninf) > 0 THEN CAST('-Infinity' AS DOUBLE)"
            " ELSE CAST(SUM(psum_c) AS DOUBLE) / 100.0 END"
        ).alias("total_value"),
        F.round(F.max("pmax"), 4).alias("max_value"),
    )


@register("agg_approx_quantile", FLAGSHIP_CATEGORY)  # rows-only: approx sketch
def agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna-style quantile sketch) per event
    type — mergeable sketch states partial-aggregate map-side, so the
    shuffle is O(groups × sketch), independent of row count: the quantile
    operator that still works at 100 TB where exact percentile must shuffle
    whole groups. No SQL oracle (sketch internals engine-specific);
    agg_percentile beside it is the oracled exact variant, and tests bound
    the sketch error against it."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("approx_percentile(value, 0.5, 1000)"), 4).alias("p50_approx"),
        F.round(F.expr("approx_percentile(value, 0.95, 1000)"), 4).alias("p95_approx"),
    )


@register(
    "agg_mode",
    "2.D aggregations",
    # deterministic mode: highest count, ties broken by smallest value —
    # never the engines' native mode() (tie-breaking is engine-defined)
    """
    SELECT user_id, event_type AS mode_type, n FROM (
      SELECT user_id, event_type, COUNT(*) AS n,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY COUNT(*) DESC, event_type ASC) AS rn
      FROM events GROUP BY user_id, event_type
    ) WHERE rn = 1
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode (most frequent value) per group, deterministically tie-broken —
    count-then-rank instead of native mode() because tie order is
    engine-defined. Scale shape: ONE shuffle on (user_id, event_type)
    partial-aggregated map-side, then a per-user rank over at most
    |event_type| rows — no second full shuffle of raw events."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("user_id").orderBy(F.col("n").desc(), F.col("event_type").asc())
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("mode_type"), "n")
    )


@register(
    "agg_unpivot",
    "2.D aggregations",
    # pivot∘unpivot must be the identity on the long form — over the
    # ENUMERATED pivot domain: the pivot's column list IS a domain
    # restriction, so the oracle restricts identically (a NULL or
    # out-of-domain lang has no pivot column to land in; caught by the
    # NULL-attribute corruption replay)
    """
    SELECT source, lang, COUNT(*) AS n_docs
    FROM documents WHERE lang IN ('de', 'en', 'es', 'fr', 'zh')
    GROUP BY source, lang
    """,
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long melt): pivots per-source language counts wide,
    then unpivots back — proving pivot and unpivot are inverses, which is
    the property reporting pipelines rely on when they round-trip between
    matrix and tidy layouts. Empty cells (NULL after pivot) are dropped on
    unpivot, restoring exactly the original long form. The identity holds
    over the enumerated pivot domain; rows whose lang is NULL or outside
    the pivot list are excluded on BOTH engines by construction."""
    d = load_table(spark, sf_dir, "documents")
    langs = ["de", "en", "es", "fr", "zh"]
    wide = d.groupBy("source").pivot("lang", langs).count()
    long = wide.unpivot("source", langs, "lang", "n_docs")
    return long.filter(F.col("n_docs").isNotNull()).select(
        "source", "lang", F.col("n_docs").cast("bigint").alias("n_docs")
    )


@register(
    "agg_boolean",
    "2.D aggregations",
    """
    SELECT user_id,
           bool_and(value >= 0)                  AS all_nonneg,
           bool_or(event_type = 'error')         AS any_error,
           CAST(count_if(event_type = 'purchase') AS BIGINT) AS n_purchases
    FROM events GROUP BY user_id
    """,
)
def agg_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregate family: every/any/count_if — the predicates-per-
    group shape behind data-quality gates (all rows valid? any poison
    marker? how many conversions?). Plain partial-aggregating hash agg."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.bool_and(F.col("value") >= 0).alias("all_nonneg"),
        F.bool_or(F.col("event_type") == "error").alias("any_error"),
        F.count_if(F.col("event_type") == "purchase").alias("n_purchases"),
    )
