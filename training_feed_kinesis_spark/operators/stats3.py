"""Third statistics/ML wave: classification, inference tests, concentration
and robust-trend analytics.

  * ``ml_knn_classify``: k-nearest-neighbor majority-vote label prediction
    over the embedding corpus — the eval loop for any embedding model.
  * ``stat_ttest_welch``: Welch's unequal-variance t-test between two event
    cohorts (click vs purchase spend) with Welch–Satterthwaite dof.
  * ``events_hour_heatmap``: ISO-weekday × hour traffic heatmap with share
    of total — the load-profile matrix behind capacity planning.
  * ``revenue_abc_class``: ABC (80/15/5) inventory classification of parts
    by revenue using exact integer-cents cumulative shares.
  * ``ts_theil_sen``: Theil–Sen robust trend (median of pairwise slopes)
    over the monthly revenue series — outlier-immune, unlike OLS.
  * ``customer_gini``: Gini coefficient of customer revenue concentration
    via the exact rank formula on integer cents.

Cross-engine determinism notes (SURVEY.md §5.3): anywhere a DOUBLE would
order rows or cross a threshold, the value is first collapsed to integer
cents (exact in both engines) or rounded to 4dp; pairwise slopes are pure
per-row IEEE ops on already-rounded inputs (bit-identical cross-engine).

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md §0.1);
capability surface reconstructed per SURVEY.md §2 and BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load_table, parallelize

CAT_ML = "2.L ML-relational"
CAT_QM = "2.L quality & mining"
CAT_TS = "2.L time-series analytics"
CAT_REP = "2.L reporting"

KNN_K = 5
KNN_PROBES = 40  # vec_id < 40 are the held-out queries; the rest vote

_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "0D, (acc, v) -> acc + v)"
)
_NORM_SQL = "sqrt(list_sum(list_transform({v}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
_DOT_SQL = (
    "list_sum(list_transform(range(1, 65), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)


# shared kNN candidate CTE (probes vs voting corpus, rounded-cosine top-k)
_KNN_CTES = f"""
    pairs AS (
      SELECT a.vec_id AS query_id, a.label AS true_label,
             b.vec_id AS neighbor_id, b.label AS neighbor_label,
             ROUND({_DOT_SQL.format(a='a.embedding', b='b.embedding')}
                   / ({_NORM_SQL.format(v='a.embedding')}
                      * {_NORM_SQL.format(v='b.embedding')}), 4) AS cosine
      FROM embeddings a JOIN embeddings b ON b.vec_id >= {KNN_PROBES}
      WHERE a.vec_id < {KNN_PROBES}
    ),
    knn AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY cosine DESC, neighbor_id ASC) AS rn
        FROM pairs) WHERE rn <= {KNN_K}
    )"""


def _knn_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k cosine neighbors of each probe among the voting corpus:
    (query_id, true_label, neighbor_id, neighbor_label, cosine, rn≤k).
    Probe side broadcasts; corpus side scans map-only with per-side
    precomputed norms; cosine rounds to 4dp BEFORE ranking so neighbor
    order is reproducible cross-engine (same pattern as llm_sim_topk)."""
    em = load_table(spark, sf_dir, "embeddings")
    norm = lambda c: F.sqrt(  # noqa: E731
        F.expr(f"aggregate({c}, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")
    )
    probes = (
        em.filter(F.col("vec_id") < KNN_PROBES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("label").alias("true_label"),
            F.col("embedding").alias("q_emb"),
        )
        .withColumn("q_norm", norm("q_emb"))
    )
    corpus = (
        parallelize(em.filter(F.col("vec_id") >= KNN_PROBES))
        .select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").alias("neighbor_label"),
            F.col("embedding").alias("c_emb"),
        )
        .withColumn("c_norm", norm("c_emb"))
    )
    dot = F.expr(_DOT.format(a="q_emb", b="c_emb"))
    pairs = F.broadcast(probes).crossJoin(corpus).select(
        "query_id",
        "true_label",
        "neighbor_id",
        "neighbor_label",
        F.round(dot / (F.col("q_norm") * F.col("c_norm")), 4).alias("cosine"),
    )
    w_knn = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return pairs.withColumn("rn", F.row_number().over(w_knn)).filter(
        F.col("rn") <= KNN_K
    )


@register(
    "ml_knn_classify",
    CAT_ML,
    f"""
    WITH {_KNN_CTES},
    votes AS (
      SELECT query_id, true_label, neighbor_label,
             COUNT(*)::BIGINT AS n_votes
      FROM knn GROUP BY 1, 2, 3
    )
    SELECT query_id, true_label, neighbor_label AS pred_label, n_votes,
           CASE WHEN neighbor_label = true_label THEN 1 ELSE 0 END AS correct
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY n_votes DESC, neighbor_label ASC NULLS LAST) AS vr
      FROM votes) WHERE vr = 1
    """,
)
def ml_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN majority-vote classifier: held-out probes (vec_id < 40) vs the
    voting corpus, k=5 cosine neighbors, majority label with deterministic
    (count DESC, label ASC) tie-break.

    Physical shape mirrors llm_sim_topk: the probe side broadcasts, the
    corpus side is scanned once map-only (norms precomputed per side), and
    only the tiny top-k + vote tables shuffle. Cosine is rounded to 4dp
    BEFORE ranking so neighbor order is reproducible cross-engine. At 100 TB
    this is the linear-scan kNN eval; swap the candidate generator for
    llm_sim_lsh when the probe batch itself is huge.
    """
    knn = _knn_neighbors(spark, sf_dir)
    votes = knn.groupBy("query_id", "true_label", "neighbor_label").agg(
        F.count(F.lit(1)).alias("n_votes")
    )
    # NULLS LAST pinned on BOTH engines (Spark ASC defaults NULLS FIRST,
    # DuckDB NULLS LAST): an unlabeled-neighbor vote group must lose a
    # tie to any real label identically — caught by the NULL-attribute
    # corruption replay (tests/test_null_injection.py class 7)
    w_vote = Window.partitionBy("query_id").orderBy(
        F.col("n_votes").desc(), F.col("neighbor_label").asc_nulls_last()
    )
    return (
        votes.withColumn("vr", F.row_number().over(w_vote))
        .filter(F.col("vr") == 1)
        .select(
            "query_id",
            "true_label",
            F.col("neighbor_label").alias("pred_label"),
            "n_votes",
            F.when(F.col("neighbor_label") == F.col("true_label"), 1)
            .otherwise(0)
            .alias("correct"),
        )
    )


@register(
    "ml_precision_at_k",
    CAT_ML,
    f"""
    WITH {_KNN_CTES},
    per_query AS (
      SELECT query_id, true_label,
             COUNT(*) FILTER (WHERE neighbor_label = true_label)::DOUBLE
               / {KNN_K} AS prec
      FROM knn GROUP BY 1, 2
    )
    SELECT true_label, COUNT(*)::BIGINT AS n_queries,
           ROUND(AVG(prec), 4) AS precision_at_k
    FROM per_query GROUP BY true_label
    """,
)
def ml_precision_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality metric over the same kNN candidates as
    ml_knn_classify: per-probe precision@5 (share of top-5 neighbors whose
    label matches the probe's), averaged per true label. Per-query values
    are exact multiples of 1/k, so only the final mean needs the 4dp round.

    Scale: identical physical shape to the classifier — the metric is one
    extra tiny aggregate over the top-k table.
    """
    knn = _knn_neighbors(spark, sf_dir)
    per_query = knn.groupBy("query_id", "true_label").agg(
        (
            F.count(F.when(F.col("neighbor_label") == F.col("true_label"), 1))
            .cast("double")
            / KNN_K
        ).alias("prec")
    )
    return per_query.groupBy("true_label").agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.round(F.avg("prec"), 4).alias("precision_at_k"),
    )


@register(
    "stat_ttest_welch",
    CAT_QM,
    """
    WITH s AS (
      SELECT
        COUNT(*) FILTER (WHERE event_type = 'click')::BIGINT AS n1,
        COUNT(*) FILTER (WHERE event_type = 'purchase')::BIGINT AS n2,
        AVG(value) FILTER (WHERE event_type = 'click') AS m1,
        AVG(value) FILTER (WHERE event_type = 'purchase') AS m2,
        VAR_SAMP(value) FILTER (WHERE event_type = 'click') AS v1,
        VAR_SAMP(value) FILTER (WHERE event_type = 'purchase') AS v2
      FROM events
    )
    SELECT n1 AS n_click, n2 AS n_purchase,
           ROUND(m1, 4) AS mean_click, ROUND(m2, 4) AS mean_purchase,
           ROUND((m1 - m2) / SQRT(v1 / n1 + v2 / n2), 4) AS t_stat,
           ROUND(POWER(v1 / n1 + v2 / n2, 2)
                 / (POWER(v1 / n1, 2) / (n1 - 1)
                    + POWER(v2 / n2, 2) / (n2 - 1)), 4) AS dof
    FROM s
    """,
)
def stat_ttest_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test: does click spend differ from
    purchase spend? One conditional-aggregate pass produces both cohorts'
    moments; t and the Welch–Satterthwaite dof are scalar arithmetic on the
    aggregate row. Rounded at 4dp (variance accumulation order differs
    across engines in the last ulp).

    Scale: a single map-side-combinable scan regardless of event volume —
    the entire test is O(1) state per partition.
    """
    ev = load_table(spark, sf_dir, "events")
    click = F.col("event_type") == "click"
    purch = F.col("event_type") == "purchase"
    s = ev.agg(
        F.count(F.when(click, 1)).alias("n1"),
        F.count(F.when(purch, 1)).alias("n2"),
        F.avg(F.when(click, F.col("value"))).alias("m1"),
        F.avg(F.when(purch, F.col("value"))).alias("m2"),
        F.variance(F.when(click, F.col("value"))).alias("v1"),
        F.variance(F.when(purch, F.col("value"))).alias("v2"),
    )
    se2 = F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2")
    return s.select(
        F.col("n1").alias("n_click"),
        F.col("n2").alias("n_purchase"),
        F.round("m1", 4).alias("mean_click"),
        F.round("m2", 4).alias("mean_purchase"),
        F.round((F.col("m1") - F.col("m2")) / F.sqrt(se2), 4).alias("t_stat"),
        F.round(
            F.pow(se2, 2)
            / (
                F.pow(F.col("v1") / F.col("n1"), 2) / (F.col("n1") - 1)
                + F.pow(F.col("v2") / F.col("n2"), 2) / (F.col("n2") - 1)
            ),
            4,
        ).alias("dof"),
    )


@register(
    "events_hour_heatmap",
    CAT_REP,
    """
    WITH c AS (
      SELECT isodow(ts)::INT AS dow, hour(ts)::INT AS hr,
             COUNT(*)::BIGINT AS n
      FROM events GROUP BY 1, 2
    )
    SELECT dow, hr, n,
           CAST((2 * n * 10000 + SUM(n) OVER ())
                // (2 * SUM(n) OVER ()) AS BIGINT) / 10000.0 AS share
    FROM c
    """,
)
def events_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO-weekday × hour-of-day traffic heatmap with share of total.
    Encoded as isodow (1=Mon..7=Sun) — Spark's ``weekday`` (0=Mon) + 1 —
    because Spark's ``dayofweek`` and DuckDB's ``dayofweek`` disagree on
    Sunday. Share denominator is an exact integer window sum.

    Scale: counts are map-side combinable; the window runs over ≤168 cells.
    """
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy(
        (F.weekday("ts") + 1).cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hr"),
    ).agg(F.count(F.lit(1)).alias("n"))
    # integer half-up share (SURVEY §5.3.1b): n/total lands EXACTLY on
    # 4th-decimal half-points whenever total is a power-of-ten multiple
    # (sf0.1: total=100000, every n ending in 5) and the engines' ROUND
    # disagree there — caught by the sf0.1 sweep, invisible at sf0.01.
    # PRECONDITION: numerator >= 0 (counts here); the (2a+b) div (2b)
    # spelling is half-up only for nonnegative numerators.
    return c.withColumn(
        "tot", F.sum("n").over(Window.partitionBy())
    ).select(
        "dow",
        "hr",
        "n",
        (
            F.expr("(2 * n * 10000 + tot) div (2 * tot)").cast("bigint")
            / 10000.0
        ).alias("share"),
    )


@register(
    "revenue_abc_class",
    CAT_REP,
    """
    WITH per_part AS (
      -- per-ROW cent quantization (r8 float-sum convention): ROUND of
      -- a float SUM flips a cent with accumulation order (r9
      -- permutation sweep); cents keep whale rows inside BIGINT
      -- (wave-97 whale fixture)
      SELECT l_partkey,
             SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)
                      AS BIGINT)) AS rev_s
      FROM lineitem GROUP BY 1
    ),
    ranked AS (
      SELECT l_partkey, rev_s,
             SUM(rev_s) OVER (ORDER BY rev_s DESC, l_partkey ASC
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum_s,
             SUM(rev_s) OVER () AS tot_s
      FROM per_part
    ),
    classed AS (
      SELECT CASE WHEN cum_s * 5 <= tot_s * 4 THEN 'A'
                  WHEN cum_s * 20 <= tot_s * 19 THEN 'B'
                  ELSE 'C' END AS abc_class,
             rev_s, tot_s
      FROM ranked
    )
    SELECT abc_class, COUNT(*)::BIGINT AS n_parts,
           -- unrounded exact-cents quotient (r11 magnitude lint,
           -- 5.3.9a): corpus revenue is THE canonical grower
           SUM(rev_s) / 100.0 AS revenue,
           ROUND(SUM(rev_s)::DOUBLE / MAX(tot_s), 4) AS rev_share
    FROM classed GROUP BY 1
    """,
)
def revenue_abc_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification: parts sorted by revenue, class A = the
    prefix holding ≤80% of cumulative revenue, B ≤95%, C the tail. All
    threshold comparisons run on exact integer cents (cum*5 ≤ tot*4 is
    0.80 without ever touching a float), so the class boundary cannot flip
    on cross-engine summation order.

    Scale: per-part revenue is one shuffled aggregate; the running sum is a
    single global-ordered window over |parts| rows — at 100 TB, parts is
    the small side (items, not transactions), so the single-partition
    window is fine; if it weren't, two-pass cumulative sum over range
    partitions replaces it.
    """
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(
            F.expr(
                "CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)"
                " AS BIGINT)"
            )
        ).alias("rev_s")
    )
    # cumulative and total accumulators range over CORPUS revenue — and
    # the ×5/×20 threshold cross-multiplications exceed int64 well before
    # the sums themselves do — so both windows widen to DECIMAL(38,0)
    # over the part-grain rows (§5.3.6c; DuckDB widens to HUGEINT on its
    # own). The fact-grain per-part sum keeps the BIGINT fast path.
    rev_d = F.col("rev_s").cast("decimal(38,0)")
    w_cum = (
        Window.orderBy(F.col("rev_s").desc(), F.col("l_partkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = per_part.select(
        "l_partkey",
        "rev_s",
        F.sum(rev_d).over(w_cum).alias("cum_s"),
        F.sum(rev_d).over(Window.partitionBy()).alias("tot_s"),
    )
    classed = ranked.select(
        F.when(F.col("cum_s") * 5 <= F.col("tot_s") * 4, "A")
        .when(F.col("cum_s") * 20 <= F.col("tot_s") * 19, "B")
        .otherwise("C")
        .alias("abc_class"),
        "rev_s",
        "tot_s",
    )
    return classed.groupBy("abc_class").agg(
        F.count(F.lit(1)).alias("n_parts"),
        (F.sum(rev_d).cast("double") / 100.0).alias("revenue"),
        F.round(
            F.sum(rev_d).cast("double") / F.max("tot_s").cast("double"),
            4,
        ).alias("rev_share"),
    )


@register(
    "ts_theil_sen",
    CAT_TS,
    """
    WITH monthly AS (
      SELECT (year(o_orderdate) * 12 + month(o_orderdate))::BIGINT AS mi,
             SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS y_c
      FROM orders GROUP BY 1
    ),
    slopes AS (
      -- per-ROW slope quantization to integer 1e-4 dollar units (r10
      -- max-tie sweep: a raw-double median interpolates with a 1-ulp
      -- engine difference that flipped the 4dp round of a ~1e9
      -- intercept); medians over exact integers interpolate identically
      SELECT CAST(ROUND((b.y_c - a.y_c) * 100.0 / (b.mi - a.mi), 0)
                  AS BIGINT) AS slope_q
      FROM monthly a JOIN monthly b ON a.mi < b.mi
    ),
    med AS (
      SELECT percentile_cont(0.5) WITHIN GROUP (ORDER BY slope_q)
               AS slope_qm
      FROM slopes
    )
    SELECT (SELECT COUNT(*)::BIGINT FROM monthly) AS n_months,
           -- NO terminal ROUND: the quotient of an exact integer(.5)
           -- median is already bit-identical across engines, and DuckDB
           -- ROUND(x, 4) is itself lossy for |x|*1e4 above ~2^43 (it
           -- rounds the float product x*10000, whose grid is coarser
           -- than the sub-1e-4 digits — the r10 max-tie flip at the
           -- ~1e9 intercept came from THIS, not from the median)
           slope_qm / 10000.0 AS slope,
           -- residuals in exact 1e-4 units: cents*100 - slope_qm*mi is
           -- exact double arithmetic (slope_qm is k or k+0.5)
           (SELECT percentile_cont(0.5)
              WITHIN GROUP (ORDER BY y_c * 100.0 - med.slope_qm * mi)
            FROM monthly) / 10000.0 AS intercept
    FROM med
    """,
)
def ts_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend estimator over the monthly revenue series:
    slope = median of all pairwise slopes, intercept = median(y − slope·x).
    A single wild month cannot move it — unlike the OLS fit in
    llm_zipf_slope/agg_regression. Every pairwise slope is quantized to
    integer 1e-4 dollar units PER ROW before the median, the medians run
    over exact integers, and the outputs are UNROUNDED quotients of
    those exact medians (r10 max-tie sweep + bit-level probe, SURVEY
    §5.3.9: the flip was DuckDB's ROUND(x, 4) rounding the float product
    x·10⁴, whose grid at the ~1e9 intercept is coarser than the 4dp
    digits — both engines held the IDENTICAL pre-round double).

    Scale: the series is an aggregate (months, not transactions) — the
    O(m²) pair join is over ~80 rows no matter how big the fact table is.
    """
    od = load_table(spark, sf_dir, "orders")
    monthly = od.groupBy(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("bigint")
        .alias("mi")
    ).agg(
        # exact integer cents (§5.3.6b)
        F.sum(F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"))
        .alias("y_c")
    )
    a = monthly.alias("a")
    b = monthly.alias("b")
    slopes = a.join(b, F.col("a.mi") < F.col("b.mi")).select(
        F.round(
            (F.col("b.y_c") - F.col("a.y_c")) * 100.0
            / (F.col("b.mi") - F.col("a.mi")),
            0,
        )
        .cast("long")
        .alias("slope_q")
    )
    med = slopes.agg(
        F.expr("percentile(slope_q, 0.5)").alias("slope_qm")
    )
    n = monthly.agg(F.count(F.lit(1)).alias("n_months"))
    # NO terminal ROUND (see oracle comment): the quotient of the exact
    # integer(.5) median is bit-identical across engines, and DuckDB
    # ROUND is lossy at this magnitude (float x*10000 grid)
    resid = (
        monthly.crossJoin(F.broadcast(med))
        .select(
            (F.col("y_c") * 100.0 - F.col("slope_qm") * F.col("mi")).alias("r_q")
        )
        .agg(
            (F.expr("percentile(r_q, 0.5)") / 10000.0).alias("intercept")
        )
    )
    return (
        n.crossJoin(med)
        .crossJoin(resid)
        .select(
            "n_months",
            (F.col("slope_qm") / 10000.0).alias("slope"),
            "intercept",
        )
    )


@register(
    "customer_gini",
    CAT_QM,
    """
    WITH per_cust AS (
      SELECT o_custkey,
             CAST(ROUND(SUM(o_totalprice) * 100, 0) AS BIGINT) AS rev_cents
      FROM orders GROUP BY 1
    ),
    ranked AS (
      SELECT rev_cents,
             ROW_NUMBER() OVER (ORDER BY rev_cents ASC, o_custkey ASC) AS i
      FROM per_cust
    )
    SELECT COUNT(*)::BIGINT AS n_customers,
           ROUND(2.0 * SUM(CAST(i AS HUGEINT) * rev_cents)
                 / (COUNT(*) * SUM(CAST(rev_cents AS HUGEINT)))
                 - (COUNT(*) + 1.0) / COUNT(*), 4) AS gini
    FROM ranked
    """,
)
def customer_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue concentration via the exact
    rank formula G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over ascending-sorted
    integer-cents revenue. Both Σ terms are exact BIGINT sums — the only
    float op is the final division, so the statistic is deterministic to
    the last bit before its 4dp round.

    Scale: same posture as revenue_abc_class — the ranked window runs over
    customers (the aggregated side), not orders.
    """
    od = load_table(spark, sf_dir, "orders")
    per_cust = od.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice") * 100, 0).cast("bigint").alias("rev_cents")
    )
    ranked = per_cust.select(
        "rev_cents",
        F.row_number()
        .over(Window.orderBy(F.col("rev_cents").asc(), F.col("o_custkey").asc()))
        .alias("i"),
    )
    # the rank-weighted sum Σ(i·xᵢ) is the earliest int64 overflow in the
    # registry (~n²·x̄, quadratic in customer count: ~10²⁶ at 100 TB), and
    # even the PER-ROW product i·xᵢ exceeds int64 for whale customers at
    # scale (rank ~10¹⁰ × a 10¹³-cent whale) — so the rank widens to
    # DECIMAL BEFORE the multiply and BOTH Σ accumulators run in
    # DECIMAL(38,0) over the customer-grain rows (§5.3.6c; the oracle
    # widens with HUGEINT in lockstep). Each exact integer converts to
    # DOUBLE before any float op — the same convert-then-divide order
    # DuckDB applies to its HUGEINT sums.
    n = F.count(F.lit(1))
    s_ix = F.sum(F.col("i").cast("decimal(19,0)") * F.col("rev_cents"))
    s_x = F.sum(F.col("rev_cents").cast("decimal(38,0)"))
    return ranked.agg(
        n.alias("n_customers"),
        F.round(
            2.0 * s_ix.cast("double") / (n * s_x).cast("double")
            - (n + 1.0) / n,
            4,
        ).alias("gini"),
    )
