"""Histogram-based tree learning + gradient-descent step, spelled
relationally.

  * ``ml_tree_split``: LightGBM-style split finding — build a per-feature
    value histogram FIRST (the 100 TB trick: the scan reduces to a dust-
    sized (feature, value, n, positives) table), then evaluate a fixed
    candidate-threshold grid against the histogram and report the Gini
    gain of every (feature, threshold).
  * ``ml_logreg_step``: one batch gradient-descent step of logistic
    regression from fixed weights — the gradient is three conditional
    sums; the model update never leaves the driver-side single row.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

CAT = "2.L ML-relational"

_LABEL_SQL = "(case when l_returnflag = 'R' then 1 else 0 end)"

# (feature, value-expression) pairs — all exact numerics on either engine.
_FVAL_SPARK = (
    "stack(3,"
    " 'quantity', cast(l_quantity as double),"
    " 'disc_pct', cast(cast(round(l_discount * 100, 0) as int) as double),"
    " 'price_k',  cast(floor(l_extendedprice / 1000) as double)"
    ") as (feature, fval)"
)

# Fixed candidate-threshold grids (histogram-boundary style, no data-
# dependent quantiles → identical on every engine and every cluster size).
_GRID = {
    "quantity": [5, 10, 15, 20, 25, 30, 35, 40, 45],
    "disc_pct": [1, 2, 3, 4, 5, 6, 7, 8, 9, 10],
    "price_k": [10, 20, 30, 40, 50, 60, 70, 80, 90],
}
_GRID_ROWS = ", ".join(
    f"('{f}', {t})" for f, ts in _GRID.items() for t in ts
)


@register(
    "ml_tree_split",
    CAT,
    f"""
    WITH b AS (
      SELECT {_LABEL_SQL} AS lab,
             l_quantity::DOUBLE AS quantity,
             round(l_discount * 100, 0)::INT::DOUBLE AS disc_pct,
             floor(l_extendedprice / 1000)::DOUBLE AS price_k
      FROM lineitem
    ),
    u AS (
      SELECT 'quantity' AS feature, quantity AS fval, lab FROM b
      UNION ALL SELECT 'disc_pct', disc_pct, lab FROM b
      UNION ALL SELECT 'price_k', price_k, lab FROM b
    ),
    h AS (
      SELECT feature, fval, COUNT(*)::BIGINT AS n, SUM(lab)::BIGINT AS p
      FROM u GROUP BY feature, fval
    ),
    cand(feature, thr) AS (VALUES {_GRID_ROWS}),
    s AS (
      SELECT c.feature, c.thr,
             SUM(CASE WHEN h.fval <= c.thr THEN h.n ELSE 0 END)::BIGINT AS nl,
             SUM(CASE WHEN h.fval <= c.thr THEN h.p ELSE 0 END)::BIGINT AS pl,
             SUM(h.n)::BIGINT AS nt, SUM(h.p)::BIGINT AS pt
      FROM cand c JOIN h ON h.feature = c.feature
      GROUP BY c.feature, c.thr
    )
    SELECT feature, thr::BIGINT AS thr, nl, pl,
           ROUND(
             (1.0 - (pt*pt + (nt-pt)*(nt-pt))::DOUBLE / (nt*nt))
             - CASE WHEN nl = 0 OR nl = nt THEN
                 1.0 - (pt*pt + (nt-pt)*(nt-pt))::DOUBLE / (nt*nt)
               ELSE
                 (nl::DOUBLE / nt) *
                   (1.0 - (pl*pl + (nl-pl)*(nl-pl))::DOUBLE / (nl*nl))
               + ((nt-nl)::DOUBLE / nt) *
                   (1.0 - ((pt-pl)*(pt-pl)
                           + ((nt-nl)-(pt-pl))*((nt-nl)-(pt-pl)))::DOUBLE
                          / ((nt-nl)*(nt-nl)))
               END, 4) AS gini_gain
    FROM s
    """,
)
def ml_tree_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-tree split evaluation the histogram way: one scan folds
    the data to a (feature, value) histogram (map-side combinable; ≤ a few
    hundred rows regardless of data size), then every candidate threshold
    is scored against the histogram — the full Gini-gain table for 28
    candidate splits costs one shuffle of kilobytes. Degenerate splits
    (empty side) report gain 0. All counts stay BIGINT; the gain is the
    only float and is rounded. This is exactly how LightGBM/XGBoost-hist
    scale split finding; the emitted table is the input to the greedy
    tree grower.
    """
    li = load_table(spark, sf_dir, "lineitem")
    b = li.select(F.expr(_LABEL_SQL).alias("lab"), "l_quantity", "l_discount",
                  "l_extendedprice")
    u = b.select(F.expr(_FVAL_SPARK), "lab")
    h = u.groupBy("feature", "fval").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("lab").cast("bigint").alias("p"),
    )
    cand = spark.createDataFrame(
        [(f, t) for f, ts in _GRID.items() for t in ts], "feature string, thr long"
    )
    s = (
        F.broadcast(cand)
        .join(h, "feature")
        .groupBy("feature", "thr")
        .agg(
            F.sum(F.when(F.col("fval") <= F.col("thr"), F.col("n")).otherwise(0))
            .cast("bigint")
            .alias("nl"),
            F.sum(F.when(F.col("fval") <= F.col("thr"), F.col("p")).otherwise(0))
            .cast("bigint")
            .alias("pl"),
            F.sum("n").cast("bigint").alias("nt"),
            F.sum("p").cast("bigint").alias("pt"),
        )
    )
    gini_parent = F.expr(
        "1.0D - cast(pt*pt + (nt-pt)*(nt-pt) as double) / (nt*nt)"
    )
    gain = F.expr(
        "CASE WHEN nl = 0 OR nl = nt THEN"
        " 1.0D - cast(pt*pt + (nt-pt)*(nt-pt) as double) / (nt*nt)"
        " ELSE"
        " (cast(nl as double) / nt) *"
        "   (1.0D - cast(pl*pl + (nl-pl)*(nl-pl) as double) / (nl*nl))"
        " + (cast(nt-nl as double) / nt) *"
        "   (1.0D - cast((pt-pl)*(pt-pl)"
        "          + ((nt-nl)-(pt-pl))*((nt-nl)-(pt-pl)) as double)"
        "         / ((nt-nl)*(nt-nl)))"
        " END"
    )
    return s.select(
        "feature",
        "thr",
        "nl",
        "pl",
        F.round(gini_parent - gain, 4).alias("gini_gain"),
    )


@register(
    "ml_logreg_step",
    CAT,
    f"""
    WITH b AS (
      SELECT {_LABEL_SQL}::DOUBLE AS y,
             l_quantity / 50.0 AS x1,
             round(l_discount * 100, 0) / 10.0 AS x2
      FROM lineitem
    ),
    z AS (
      SELECT y, x1, x2,
             1.0 / (1.0 + exp(-(0.5 * x1 - 0.5 * x2 + 0.1))) AS prob
      FROM b
    ),
    g AS (
      SELECT COUNT(*)::BIGINT AS n,
             AVG((prob - y) * x1) AS g1,
             AVG((prob - y) * x2) AS g2,
             AVG(prob - y) AS gb,
             AVG(-(y * ln(prob) + (1 - y) * ln(1 - prob))) AS ll
      FROM z
    )
    SELECT n,
           ROUND(0.5 - 0.1 * g1, 4) AS w1_new,
           ROUND(-0.5 - 0.1 * g2, 4) AS w2_new,
           ROUND(0.1 - 0.1 * gb, 4) AS b_new,
           ROUND(ll, 4) AS logloss
    FROM g
    """,
)
def ml_logreg_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One batch gradient step of logistic regression (fixed start
    w=(0.5,−0.5), b=0.1, lr=0.1) over exact-rational features: the whole
    step is FOUR averages in one map-side-combinable pass — the classic
    'iterative ML as repeated aggregation' pattern (same shape as
    ml_kmeans_step / vec_pca_power: per-iteration cost = one scan, model
    stays a broadcast-sized row). ROUND(4) after the averages absorbs
    cross-engine exp/ln ulp noise.
    """
    li = load_table(spark, sf_dir, "lineitem")
    b = li.select(
        F.expr(_LABEL_SQL).cast("double").alias("y"),
        (F.col("l_quantity") / 50.0).alias("x1"),
        (F.round(F.col("l_discount") * 100, 0) / 10.0).alias("x2"),
    )
    z = b.withColumn(
        "prob", F.expr("1.0D / (1.0D + exp(-(0.5D * x1 - 0.5D * x2 + 0.1D)))")
    )
    g = z.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.avg((F.col("prob") - F.col("y")) * F.col("x1")).alias("g1"),
        F.avg((F.col("prob") - F.col("y")) * F.col("x2")).alias("g2"),
        F.avg(F.col("prob") - F.col("y")).alias("gb"),
        F.avg(
            -(
                F.col("y") * F.log("prob")
                + (1 - F.col("y")) * F.log(1 - F.col("prob"))
            )
        ).alias("ll"),
    )
    return g.select(
        "n",
        F.round(0.5 - 0.1 * F.col("g1"), 4).alias("w1_new"),
        F.round(-0.5 - 0.1 * F.col("g2"), 4).alias("w2_new"),
        F.round(0.1 - 0.1 * F.col("gb"), 4).alias("b_new"),
        F.round("ll", 4).alias("logloss"),
    )
