"""Relational ML evaluation: the metrics a training-data pipeline computes
over scored examples, spelled entirely in aggregates + tiny windows.

  * ``ml_auc_rank``: exact ROC AUC via the Mann-Whitney rank identity,
    computed on score-GROUPS (not rows) so the only window runs over the
    distinct-score table (97 rows here, bounded by score cardinality).
  * ``ml_confusion``: thresholded confusion matrix + precision/recall/F1
    with exact-integer 4dp rounding (no float midpoint hazard).
  * ``ml_calibration_lift``: score-decile calibration & lift table — the
    standard "is the model ranked-well" report.
  * ``ml_feature_ig``: information-gain feature ranking (entropy of the
    label minus conditional entropy per categorical feature).
  * ``ml_naive_bayes``: Laplace-smoothed Naive Bayes training table
    (class priors + per-value log-likelihoods) as one groupBy.

The "model" is a fixed engine-portable integer score in [0, 97) derived
from exact lineitem fields (quantity is integral, discount is an exact
percent step), so every engine computes the identical score and the
metrics hash-match. Label = (l_returnflag = 'R').

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

CAT = "2.L ML-relational"

# Engine-portable integer score 0..96: all terms are exact integers on any
# engine (quantity is integral-valued DOUBLE; discount is k/100 for k in
# 0..10, recovered exactly by round(*100)).
_SCORE_SQL = (
    "((cast(l_quantity as int) * 7"
    " + cast(round(l_discount * 100, 0) as int) * 13"
    " + l_linenumber * 3"
    " + cast(l_orderkey % 10 as int)) % 97)"
)
_LABEL_SQL = "(case when l_returnflag = 'R' then 1 else 0 end)"

# Exact HALF_UP 4dp rounding of an integer ratio num/den (both BIGINT):
# avoids float midpoint divergence (SURVEY §5.3.1 / memory gotcha 8).
def _ratio4(num: str, den: str) -> str:
    # cast to double BEFORE the final divide: Spark's 10000.0 literal is
    # DECIMAL(5,1) and bigint/decimal yields DECIMAL, which the driver's
    # value-hash treats as a different type than the oracle's DOUBLE.
    return (
        f"cast((({num}) * 20000 + ({den})) div (2 * ({den})) as double)"
        " / 10000.0"
    )


def _ratio4_duck(num: str, den: str) -> str:
    return f"(({num}) * 20000 + ({den})) // (2 * ({den})) / 10000.0"


@register(
    "ml_auc_rank",
    CAT,
    f"""
    WITH b AS (
      -- an unscorable row (NULL l_orderkey => NULL score, NULL-PK r9)
      -- is excluded: the score-ordered window would place the NULL
      -- group at opposite ends on the two engines
      SELECT {_SCORE_SQL} AS score, {_LABEL_SQL} AS lab
      FROM lineitem WHERE {_SCORE_SQL} IS NOT NULL
    ),
    g AS (
      SELECT score, COUNT(*)::BIGINT AS n, SUM(lab)::BIGINT AS p,
             (COUNT(*) - SUM(lab))::BIGINT AS neg
      FROM b GROUP BY score
    ),
    w AS (
      SELECT p, neg,
             COALESCE(SUM(neg) OVER (ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cneg
      FROM g
    ),
    t AS (
      SELECT SUM(p * (2 * cneg + neg))::BIGINT AS num,
             SUM(p)::BIGINT AS n_pos, SUM(neg)::BIGINT AS n_neg
      FROM w
    )
    SELECT n_pos, n_neg,
           {_ratio4_duck('num', '2 * n_pos * n_neg')} AS auc
    FROM t
    """,
)
def ml_auc_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC AUC with correct tie handling via the Mann-Whitney
    identity: AUC = sum over score groups of p_g*(cum_neg_below + neg_g/2)
    / (P*N). Aggregating per distinct score FIRST means the ordered window
    runs over |scores| rows (97), not |examples| — at 100 TB the plan is
    one map-side-combinable groupBy + a dust-sized window, never a global
    per-row sort. The numerator stays in exact BIGINT (doubled to absorb
    the half-credit term) and the final divide uses exact HALF_UP 4dp.
    """
    b = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.expr(_SCORE_SQL).alias("score"),
            F.expr(_LABEL_SQL).alias("lab"),
        )
        .filter(F.col("score").isNotNull())
    )
    g = b.groupBy("score").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("lab").cast("bigint").alias("p"),
        (F.count(F.lit(1)) - F.sum("lab")).cast("bigint").alias("neg"),
    )
    w = g.select(
        "p",
        "neg",
        F.coalesce(
            F.sum("neg").over(
                Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("cneg"),
    )
    t = w.agg(
        F.sum(F.col("p") * (2 * F.col("cneg") + F.col("neg")))
        .cast("bigint")
        .alias("num"),
        F.sum("p").cast("bigint").alias("n_pos"),
        F.sum("neg").cast("bigint").alias("n_neg"),
    )
    return t.select(
        "n_pos",
        "n_neg",
        F.expr(_ratio4("num", "2 * n_pos * n_neg")).alias("auc"),
    )


@register(
    "ml_confusion",
    CAT,
    f"""
    WITH b AS (
      SELECT {_SCORE_SQL} AS score, {_LABEL_SQL} AS lab FROM lineitem
    ),
    t AS (
      SELECT
        SUM(CASE WHEN score >= 49 AND lab = 1 THEN 1 ELSE 0 END)::BIGINT AS tp,
        SUM(CASE WHEN score >= 49 AND lab = 0 THEN 1 ELSE 0 END)::BIGINT AS fp,
        SUM(CASE WHEN score < 49 AND lab = 1 THEN 1 ELSE 0 END)::BIGINT AS fn,
        SUM(CASE WHEN score < 49 AND lab = 0 THEN 1 ELSE 0 END)::BIGINT AS tn
      FROM b
    )
    SELECT tp, fp, fn, tn,
           {_ratio4_duck('tp', 'tp + fp')} AS precision_,
           {_ratio4_duck('tp', 'tp + fn')} AS recall_,
           {_ratio4_duck('2 * tp', '2 * tp + fp + fn')} AS f1
    FROM t
    """,
)
def ml_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix at threshold score>=49 plus precision / recall /
    F1 — one conditional-count scan (map-side combinable, no shuffle of
    rows, 4 BIGINTs cross the wire). Ratios round via exact integer
    HALF_UP so engines can never disagree on a 4dp midpoint.
    """
    b = load_table(spark, sf_dir, "lineitem").select(
        F.expr(_SCORE_SQL).alias("score"), F.expr(_LABEL_SQL).alias("lab")
    )
    pred = F.col("score") >= 49
    t = b.agg(
        F.sum(F.when(pred & (F.col("lab") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("tp"),
        F.sum(F.when(pred & (F.col("lab") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("fp"),
        F.sum(F.when(~pred & (F.col("lab") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("fn"),
        F.sum(F.when(~pred & (F.col("lab") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("tn"),
    )
    return t.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.expr(_ratio4("tp", "tp + fp")).alias("precision_"),
        F.expr(_ratio4("tp", "tp + fn")).alias("recall_"),
        F.expr(_ratio4("2 * tp", "2 * tp + fp + fn")).alias("f1"),
    )


@register(
    "ml_calibration_lift",
    CAT,
    f"""
    WITH b AS (
      SELECT {_SCORE_SQL} AS score, {_LABEL_SQL} AS lab,
             l_orderkey, l_linenumber
      FROM lineitem
    ),
    d AS (
      SELECT lab,
             NTILE(10) OVER (ORDER BY score DESC, l_orderkey, l_linenumber)
               AS decile
      FROM b
    ),
    g AS (
      SELECT decile, COUNT(*)::BIGINT AS n, SUM(lab)::BIGINT AS pos
      FROM d GROUP BY decile
    ),
    t AS (SELECT SUM(n) AS nt, SUM(pos) AS pt FROM g)
    SELECT decile, n, pos,
           {_ratio4_duck('pos', 'n')} AS pos_rate,
           {_ratio4_duck('pos * nt', 'n * pt')} AS lift
    FROM g CROSS JOIN t
    """,
)
def ml_calibration_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score-decile calibration & lift: ntile(10) over (score desc, full
    unique tiebreak) so every engine builds the identical deciles, then a
    per-decile positive-rate and lift-vs-base-rate, both exact-rounded.
    The global ntile is a distributed range-sort (Spark's exchange does a
    sampled range partition — no single-node sort even at 10^9 rows); the
    per-decile rollup and the totals broadcast are dust.
    """
    b = load_table(spark, sf_dir, "lineitem").select(
        F.expr(_SCORE_SQL).alias("score"),
        F.expr(_LABEL_SQL).alias("lab"),
        "l_orderkey",
        "l_linenumber",
    )
    d = b.select(
        "lab",
        F.ntile(10)
        .over(
            Window.orderBy(
                F.col("score").desc(), F.col("l_orderkey"), F.col("l_linenumber")
            )
        )
        .alias("decile"),
    )
    g = d.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("lab").cast("bigint").alias("pos"),
    )
    t = g.agg(
        F.sum("n").alias("nt"), F.sum("pos").alias("pt")
    )
    return (
        g.crossJoin(F.broadcast(t))
        .select(
            "decile",
            "n",
            "pos",
            F.expr(_ratio4("pos", "n")).alias("pos_rate"),
            F.expr(_ratio4("pos * nt", "n * pt")).alias("lift"),
        )
    )


_FEATURES_SPARK = (
    "stack(4,"
    " 'linestatus', l_linestatus,"
    " 'qty_bucket', cast(cast(l_quantity as int) div 10 as string),"
    " 'disc_pct', cast(cast(round(l_discount * 100, 0) as int) as string),"
    " 'ship_month', cast(month(l_shipdate) as string)"
    ") as (feature, value)"
)


@register(
    "ml_feature_ig",
    CAT,
    f"""
    WITH b AS (
      SELECT {_LABEL_SQL} AS lab,
             l_linestatus,
             (l_quantity::INT // 10)::VARCHAR AS qty_bucket,
             round(l_discount * 100, 0)::INT::VARCHAR AS disc_pct,
             month(l_shipdate)::VARCHAR AS ship_month
      FROM lineitem
    ),
    u AS (
      SELECT 'linestatus' AS feature, l_linestatus AS value, lab FROM b
      UNION ALL SELECT 'qty_bucket', qty_bucket, lab FROM b
      UNION ALL SELECT 'disc_pct', disc_pct, lab FROM b
      UNION ALL SELECT 'ship_month', ship_month, lab FROM b
    ),
    g AS (
      SELECT feature, value, COUNT(*)::BIGINT AS n, SUM(lab)::BIGINT AS p
      FROM u GROUP BY feature, value
    ),
    f AS (
      SELECT feature,
             SUM(n) AS nt, SUM(p) AS pt,
             COUNT(*)::BIGINT AS n_values,
             SUM(n * (
               CASE WHEN p = 0 OR p = n THEN 0.0
                    ELSE -(p::DOUBLE / n) * log2(p::DOUBLE / n)
                         - ((n - p)::DOUBLE / n) * log2((n - p)::DOUBLE / n)
               END)) AS cond_sum
      FROM g GROUP BY feature
    )
    SELECT feature, n_values,
           ROUND(
             (CASE WHEN pt = 0 OR pt = nt THEN 0.0
                   ELSE -(pt::DOUBLE / nt) * log2(pt::DOUBLE / nt)
                        - ((nt - pt)::DOUBLE / nt) * log2((nt - pt)::DOUBLE / nt)
              END) - cond_sum / nt, 4) AS info_gain
    FROM f
    """,
)
def ml_feature_ig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Information-gain feature ranking: H(label) − Σ_v p(v)·H(label|v)
    for four categorical features, unpivoted with one ``stack`` so the
    whole ranking is ONE scan + one groupBy on (feature, value) + a
    per-feature rollup. Entropies are O(1)-magnitude doubles; ROUND(4)
    absorbs cross-engine libm ulp noise. At 100 TB the (feature, value)
    key space stays tiny (≤ features × cardinality), so the shuffle after
    the map-side combine is measured in kilobytes.
    """
    b = load_table(spark, sf_dir, "lineitem").select(
        F.expr(_LABEL_SQL).alias("lab"),
        "l_linestatus",
        "l_quantity",
        "l_discount",
        "l_shipdate",
    )
    u = b.select(F.expr(_FEATURES_SPARK), "lab")
    g = u.groupBy("feature", "value").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("lab").cast("bigint").alias("p"),
    )
    h_v = F.expr(
        "CASE WHEN p = 0 OR p = n THEN 0.0D ELSE "
        "-(cast(p as double)/n)*log2(cast(p as double)/n) "
        "- (cast(n-p as double)/n)*log2(cast(n-p as double)/n) END"
    )
    f = g.groupBy("feature").agg(
        F.sum("n").alias("nt"),
        F.sum("p").alias("pt"),
        F.count(F.lit(1)).cast("bigint").alias("n_values"),
        F.sum(F.col("n") * h_v).alias("cond_sum"),
    )
    h_global = F.expr(
        "CASE WHEN pt = 0 OR pt = nt THEN 0.0D ELSE "
        "-(cast(pt as double)/nt)*log2(cast(pt as double)/nt) "
        "- (cast(nt-pt as double)/nt)*log2(cast(nt-pt as double)/nt) END"
    )
    return f.select(
        "feature",
        "n_values",
        F.round(h_global - F.col("cond_sum") / F.col("nt"), 4).alias("info_gain"),
    )


@register(
    "ml_naive_bayes",
    CAT,
    f"""
    WITH b AS (
      SELECT l_returnflag AS class, month(l_shipdate)::INT AS v
      FROM lineitem
    ),
    cv AS (
      SELECT class, v, COUNT(*)::BIGINT AS n_cv FROM b GROUP BY class, v
    ),
    c AS (SELECT class, COUNT(*)::BIGINT AS n_c FROM b GROUP BY class),
    tot AS (
      SELECT COUNT(*)::BIGINT AS n, COUNT(DISTINCT v)::BIGINT AS vocab FROM b
    )
    SELECT cv.class, cv.v, cv.n_cv,
           {_ratio4_duck('c.n_c', 'tot.n')} AS prior,
           ROUND(ln((cv.n_cv + 1.0) / (c.n_c + tot.vocab)), 4) AS loglik
    FROM cv JOIN c ON cv.class = c.class CROSS JOIN tot
    """,
)
def ml_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Naive Bayes training as pure relational algebra: class priors and
    Laplace-smoothed (k=1) log-likelihoods ln((n_cv+1)/(n_c+V)) for
    class = returnflag over feature v = ship month. Three aggregates on
    one scan; the per-class and vocabulary totals are broadcast back onto
    the (class, value) table — no row-level data ever re-shuffles. The
    emitted table IS the model (scoring is then ml_linear_score-style
    broadcast inference).
    """
    b = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("class"),
        F.month("l_shipdate").cast("int").alias("v"),
    )
    cv = b.groupBy("class", "v").agg(F.count(F.lit(1)).cast("bigint").alias("n_cv"))
    c = b.groupBy("class").agg(F.count(F.lit(1)).cast("bigint").alias("n_c"))
    tot = b.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.countDistinct("v").cast("bigint").alias("vocab"),
    )
    return (
        cv.join(F.broadcast(c), "class")
        .crossJoin(F.broadcast(tot))
        .select(
            "class",
            "v",
            "n_cv",
            F.expr(_ratio4("n_c", "n")).alias("prior"),
            F.round(F.log((F.col("n_cv") + 1.0) / (F.col("n_c") + F.col("vocab"))), 4).alias(
                "loglik"
            ),
        )
    )
