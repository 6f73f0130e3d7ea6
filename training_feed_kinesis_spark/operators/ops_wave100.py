"""Wave 100 (round 8): dimension conformity, effect size, market
efficiency, graph mixing, and robust curation stats — five oracled keys
(net-new held far under the <=20 throttle while the driver-verdict debt
clears; VERDICT r7 item 1).

  * ``dq_dim_conformity``: the detection side of the round-8
    region/nation corruption campaign — per-dimension PK-duplication
    excess, NULL business names, and referential orphans, the gate a
    warehouse runs before trusting its broadcast dims.
  * ``stat_cramers_v``: Cramér's V effect size (Cramér 1946) on the
    event_type × day-of-week contingency — the companion every chi²
    report needs at large n, where significance is guaranteed and only
    effect size is informative.
  * ``ts_variance_ratio``: the Lo–MacKinlay variance-ratio statistic
    (RFS 1988) on daily revenue — Var of rolling 7-day sums against
    7×Var of daily values, the classic random-walk / mean-reversion
    probe, spelled in exact integer cents end-to-end.
  * ``graph_assortativity``: Newman's degree assortativity coefficient
    (PRL 2002) over the co-purchase graph — do hubs link to hubs? —
    from exact integer degree sums with one terminal division.
  * ``llm_length_winsor``: winsorized and trimmed per-language document
    length statistics — the robust location estimates a curation
    dashboard publishes when raw means are outlier-dominated.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load_table

CAT_DQ = "2.L data quality"
CAT_STAT = "2.L statistics"
CAT_TS = "2.L time-series analytics"
CAT_GRAPH = "2.L graph analytics"
CAT_TEXT = "2.J llm-pipeline (text)"


@register(
    "dq_dim_conformity",
    CAT_DQ,
    """
    SELECT 'region' AS tbl,
           COUNT(*)::BIGINT AS n_rows,
           COUNT(DISTINCT r_regionkey)::BIGINT AS n_keys,
           (COUNT(*) - COUNT(DISTINCT r_regionkey))::BIGINT AS dup_excess,
           COALESCE(SUM(CASE WHEN r_name IS NULL THEN 1 END), 0)::BIGINT
             AS n_null_name,
           0::BIGINT AS n_null_fk,
           0::BIGINT AS n_orphan
    FROM region
    UNION ALL
    SELECT 'nation',
           COUNT(*)::BIGINT,
           COUNT(DISTINCT n_nationkey)::BIGINT,
           (COUNT(*) - COUNT(DISTINCT n_nationkey))::BIGINT,
           COALESCE(SUM(CASE WHEN n_name IS NULL THEN 1 END), 0)::BIGINT,
           COALESCE(SUM(CASE WHEN n_regionkey IS NULL THEN 1 END),
                    0)::BIGINT,
           COALESCE(SUM(CASE WHEN n_regionkey IS NOT NULL
                          AND n_regionkey NOT IN
                              (SELECT r_regionkey FROM region
                               WHERE r_regionkey IS NOT NULL)
                         THEN 1 END),
                    0)::BIGINT
    FROM nation
    """,
)
def dq_dim_conformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension conformity census: per dim table, row count vs distinct
    PK count (dup_excess > 0 = re-ingested dim rows — the r8 campaign's
    corruption signature), NULL business-name count, and referential
    orphans (nation.n_regionkey outside region's key set). This is the
    admission gate in front of every broadcast-dim join: the campaign
    proved the join family survives duplicated/NULL-named dims, and this
    census is how a pipeline notices it should care.

    Scale shape: dims are tiny by definition; both censuses are
    single-pass aggregates and the orphan probe is a broadcast semi —
    at 100 TB the dims are still MBs and this runs in milliseconds."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    zero = F.lit(0).cast("bigint")
    region_census = r.agg(
        F.lit("region").alias("tbl"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.countDistinct("r_regionkey").cast("bigint").alias("n_keys"),
        (F.count(F.lit(1)) - F.countDistinct("r_regionkey"))
        .cast("bigint")
        .alias("dup_excess"),
        F.coalesce(F.sum(F.when(F.col("r_name").isNull(), 1)), F.lit(0))
        .cast("bigint")
        .alias("n_null_name"),
        zero.alias("n_null_fk"),
        zero.alias("n_orphan"),
    )
    # orphan := NON-NULL FK with no parent. The NULL-key guard matters
    # on BOTH sides: a left_anti RETAINS a NULL-FK nation row (it
    # matches nothing) where SQL NOT IN yields NULL (not counted), and
    # a NULL r_regionkey in region poisons NOT IN for every unmatched
    # key — the r8 ADVICE seam. NULL FKs are censused separately as
    # n_null_fk (same discipline as dq_orphan_census, ops_wave95).
    orphans = (
        n.filter(F.col("n_regionkey").isNotNull())
        .join(
            F.broadcast(
                r.select("r_regionkey").filter(
                    F.col("r_regionkey").isNotNull()
                )
            ),
            n.n_regionkey == F.col("r_regionkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orphan"))
    )
    nation_census = n.agg(
        F.lit("nation").alias("tbl"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.countDistinct("n_nationkey").cast("bigint").alias("n_keys"),
        (F.count(F.lit(1)) - F.countDistinct("n_nationkey"))
        .cast("bigint")
        .alias("dup_excess"),
        F.coalesce(F.sum(F.when(F.col("n_name").isNull(), 1)), F.lit(0))
        .cast("bigint")
        .alias("n_null_name"),
        F.coalesce(
            F.sum(F.when(F.col("n_regionkey").isNull(), 1)), F.lit(0)
        )
        .cast("bigint")
        .alias("n_null_fk"),
    ).crossJoin(F.broadcast(orphans))
    return region_census.unionByName(nation_census)


@register(
    "stat_cramers_v",
    CAT_STAT,
    """
    WITH c AS (
      SELECT event_type AS et, dayofweek(ts) AS dw, COUNT(*)::BIGINT AS n
      FROM events GROUP BY 1, 2
    ),
    m AS (
      SELECT n,
             SUM(n) OVER (PARTITION BY et)::BIGINT AS rt,
             SUM(n) OVER (PARTITION BY dw)::BIGINT AS ct,
             SUM(n) OVER ()::BIGINT AS tot,
             et, dw
      FROM c
    ),
    s AS (
      SELECT SUM(POWER(n - rt::DOUBLE * ct / tot, 2)
                 / (rt::DOUBLE * ct / tot)) AS chi2,
             COUNT(DISTINCT et)::BIGINT AS r,
             COUNT(DISTINCT dw)::BIGINT AS k,
             MAX(tot) AS n_events
      FROM m
    )
    SELECT ROUND(chi2, 4) AS chi2,
           ((r - 1) * (k - 1))::BIGINT AS dof,
           ROUND(SQRT(chi2 / (n_events * LEAST(r - 1, k - 1))), 4)
             AS cramers_v,
           n_events
    FROM s
    """,
)
def stat_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V effect size for the event_type × day-of-week
    contingency: V = sqrt(chi² / (n·min(r−1, k−1))) ∈ [0, 1]. The
    mandatory companion to stat_chi2_independence at event-log scale —
    with n in the millions, chi² rejects everything and only V says
    whether the association matters. Contingency spelling mirrors the
    chi2 key exactly (margins via three window sums over the |types|×7
    cell grid); V derives from the UNROUNDED chi² on both engines.

    Scale: one map-combinable cell count; everything downstream runs on
    the domain-sized grid."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy(
        F.col("event_type").alias("et"), F.dayofweek("ts").alias("dw")
    ).agg(F.count(F.lit(1)).alias("n"))
    m = c.select(
        "n",
        F.sum("n").over(Window.partitionBy("et")).alias("rt"),
        F.sum("n").over(Window.partitionBy("dw")).alias("ct"),
        F.sum("n").over(Window.partitionBy()).alias("tot"),
        "et",
        "dw",
    )
    e = F.col("rt").cast("double") * F.col("ct") / F.col("tot")
    s = m.agg(
        F.sum(F.pow(F.col("n") - e, 2) / e).alias("chi2"),
        F.countDistinct("et").cast("bigint").alias("r"),
        F.countDistinct("dw").cast("bigint").alias("k"),
        F.max("tot").alias("n_events"),
    )
    return s.select(
        F.round("chi2", 4).alias("chi2"),
        ((F.col("r") - 1) * (F.col("k") - 1)).cast("bigint").alias("dof"),
        F.round(
            F.sqrt(
                F.col("chi2")
                / (F.col("n_events") * F.least(F.col("r") - 1, F.col("k") - 1))
            ),
            4,
        ).alias("cramers_v"),
        "n_events",
    )


@register(
    "ts_variance_ratio",
    CAT_TS,
    """
    WITH daily AS (
      SELECT o_orderdate AS day,
             CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS x
      FROM orders WHERE o_orderdate IS NOT NULL GROUP BY o_orderdate
    ),
    rolled AS (
      SELECT x,
             CASE WHEN COUNT(*) OVER w7 = 7
                  THEN SUM(x) OVER w7 END AS y
      FROM daily
      WINDOW w7 AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    ),
    s AS (
      SELECT COUNT(*)::HUGEINT AS n1,
             SUM(x::HUGEINT) AS sx,
             SUM(x::HUGEINT * x::HUGEINT) AS sxx,
             COUNT(y)::HUGEINT AS n7,
             SUM(y::HUGEINT) AS sy,
             SUM(y::HUGEINT * y::HUGEINT) AS syy
      FROM rolled
    )
    SELECT CAST(n1 AS BIGINT) AS n_days,
           CAST(n7 AS BIGINT) AS n_windows,
           ROUND(CAST(n1 * n1 * (n7 * syy - sy * sy) AS DOUBLE)
                 / CAST(7 * n7 * n7 * (n1 * sxx - sx * sx) AS DOUBLE), 4)
             AS vr7
    FROM s
    """,
)
def ts_variance_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lo–MacKinlay variance ratio (RFS 1988), q = 7 days, on daily
    order revenue: VR(7) = Var(rolling 7-day sums) / (7 · Var(daily)).
    A random walk gives VR ≈ 1; VR < 1 is mean reversion, VR > 1 is
    momentum. Both variances come from exact integer cent sums via the
    n·Σx² − (Σx)² identity — Σx² of 1e8-cent days exceeds 2⁶³, so the
    accumulators widen to DECIMAL(38,0) (§5.3.6c; DuckDB HUGEINT), the
    entire ratio stays one exact-integer numerator over one
    exact-integer denominator, and the ONLY float operation is the
    terminal division — bit-identical under any partitioning. NULL
    order dates are dropped on both engines (the r8 NULL-time seam).

    Scale shape: one map-combinable day aggregate, one 7-row frame
    window over the day series, one constant-size moment row."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull()
    )
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(
            F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)")
        ).alias("x")
    )
    w7 = Window.orderBy("day").rowsBetween(-6, 0)
    rolled = daily.select(
        "x",
        F.when(
            F.count(F.lit(1)).over(w7) == 7, F.sum("x").over(w7)
        ).alias("y"),
    )
    dec = "decimal(38,0)"
    s = rolled.agg(
        F.count(F.lit(1)).cast(dec).alias("n1"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("x").cast(dec) * F.col("x").cast(dec)).alias("sxx"),
        F.count("y").cast(dec).alias("n7"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum(F.col("y").cast(dec) * F.col("y").cast(dec)).alias("syy"),
    )
    num = F.expr(
        "CAST(n1 * n1 * (n7 * syy - sy * sy) AS DOUBLE)"
    )
    den = F.expr(
        "CAST(7 * n7 * n7 * (n1 * sxx - sx * sx) AS DOUBLE)"
    )
    return s.select(
        F.col("n1").cast("bigint").alias("n_days"),
        F.col("n7").cast("bigint").alias("n_windows"),
        F.round(num / den, 4).alias("vr7"),
    )


# graph.py's shared edge CTE, re-spelled for this oracle (same text as
# _EDGES_SQL; the Spark side reuses the memoized _edges substrate)
_ASSORT_EDGES_SQL = """
    WITH pairs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    edges AS (
      SELECT pa, pb FROM pairs GROUP BY pa, pb HAVING COUNT(*) >= 2
    )
"""


@register(
    "graph_assortativity",
    CAT_GRAPH,
    _ASSORT_EDGES_SQL
    + """,
    deg AS (
      SELECT node, COUNT(*)::BIGINT AS d FROM (
        SELECT pa AS node FROM edges
        UNION ALL SELECT pb FROM edges
      ) GROUP BY node
    ),
    ed AS (
      SELECT da.d AS j, db.d AS k
      FROM edges e
      JOIN deg da ON da.node = e.pa
      JOIN deg db ON db.node = e.pb
    ),
    s AS (
      SELECT COUNT(*)::HUGEINT AS m,
             SUM(j::HUGEINT * k::HUGEINT) AS a,
             SUM(j::HUGEINT + k::HUGEINT) AS b2,
             SUM(j::HUGEINT * j::HUGEINT + k::HUGEINT * k::HUGEINT) AS c2
      FROM ed
    )
    SELECT m::BIGINT AS n_edges,
           ROUND(CAST(4 * m * a - b2 * b2 AS DOUBLE)
                 / CAST(2 * m * c2 - b2 * b2 AS DOUBLE), 4)
             AS assortativity
    FROM s
    """,
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman's degree assortativity coefficient (PRL 89:208701, 2002)
    over the co-purchase graph: the Pearson correlation of endpoint
    degrees across edges — positive when hubs attach to hubs (social
    mixing), negative when hubs attach to leaves (hub-and-spoke). With
    integer degrees the standard estimator collapses to exact integer
    sums A = Σjk, B2 = Σ(j+k), C2 = Σ(j²+k²) over the M edges:
    r = (4MA − B2²) / (2MC2 − B2²) — one terminal float division,
    bit-identical under any partitioning.

    Scale shape: rides the memoized support-thinned edge substrate
    (graph.py _edges — one basket-keyed shuffle at any corpus size);
    degrees are one aggregate over edge endpoints and join back onto
    the sparse edge list by node key. No float accumulation anywhere."""
    from .graph import _edges

    e = _edges(spark, sf_dir)
    deg = (
        e.select(F.col("pa").alias("node"))
        .unionAll(e.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    da = deg.select(F.col("node").alias("pa"), F.col("d").alias("j"))
    db = deg.select(F.col("node").alias("pb"), F.col("d").alias("k"))
    ed = e.join(da, "pa").join(db, "pb")
    return _assortativity_from_jk(ed)


def _assortativity_from_jk(ed: DataFrame) -> DataFrame:
    """Newman r from an (j, k) endpoint-degree edge frame.

    Widen PER ROW, not just per sum: at degree 2^31 the BIGINT row term
    j²+k² is already 2^63 (ANSI Spark raises ARITHMETIC_OVERFLOW — the
    planted-degree test hit exactly this), and the SUMS and the
    closed-form numerator/denominator overflow long before that at
    graph scale. DECIMAL(38,0) here = the oracle's per-row ::HUGEINT,
    exactly like ts_variance_ratio above (r8 ADVICE: DuckDB errors on
    int64 overflow where non-ANSI Spark silently wraps — the engines
    must fail or succeed together)."""
    dec = "decimal(38,0)"
    j, k = F.col("j").cast(dec), F.col("k").cast(dec)
    s = ed.agg(
        F.count(F.lit(1)).cast(dec).alias("m"),
        F.sum(j * k).alias("a"),
        F.sum(j + k).alias("b2"),
        F.sum(j * j + k * k).alias("c2"),
    )
    return s.select(
        F.col("m").cast("bigint").alias("n_edges"),
        F.round(
            F.expr("CAST(4 * m * a - b2 * b2 AS DOUBLE)")
            / F.expr("CAST(2 * m * c2 - b2 * b2 AS DOUBLE)"),
            4,
        ).alias("assortativity"),
    )


@register(
    "llm_length_winsor",
    CAT_TEXT,
    """
    WITH docs AS (
      SELECT lang, n_chars FROM documents WHERE n_chars IS NOT NULL
    ),
    pct AS (
      SELECT lang,
             quantile_cont(n_chars, 0.05) AS p05,
             quantile_cont(n_chars, 0.95) AS p95
      FROM docs GROUP BY lang
    )
    SELECT d.lang,
           COUNT(*)::BIGINT AS n_docs,
           ROUND(p.p05, 4) AS p05,
           ROUND(p.p95, 4) AS p95,
           ROUND(AVG(d.n_chars), 4) AS raw_mean,
           ROUND(AVG(LEAST(GREATEST(d.n_chars, p.p05), p.p95)), 4)
             AS winsor_mean,
           ROUND(AVG(d.n_chars) FILTER (WHERE d.n_chars >= p.p05
                                          AND d.n_chars <= p.p95), 4)
             AS trim_mean
    FROM docs d JOIN pct p ON d.lang = p.lang
    GROUP BY d.lang, p.p05, p.p95
    """,
)
def llm_length_winsor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized and trimmed per-language document-length statistics:
    the robust location estimates a curation dashboard publishes when a
    handful of giant or empty documents dominates the raw mean (Tukey's
    robust-statistics playbook applied to corpus audit). p05/p95 are
    interpolated percentiles (the agg_percentile engine-parity), the
    winsorized mean clamps into [p05, p95], the trimmed mean drops
    outside it; divergence between the three columns IS the signal that
    the length distribution has tails worth investigating.

    Scale shape: percentile pass aggregates to |langs| rows which
    broadcast back onto the scan — two passes over a metadata column,
    the text itself is never read (ReadSchema carries lang/n_chars
    only)."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull()
    ).select("lang", "n_chars")
    pct = d.groupBy("lang").agg(
        F.percentile("n_chars", F.lit(0.05)).alias("p05"),
        F.percentile("n_chars", F.lit(0.95)).alias("p95"),
    )
    j = d.join(F.broadcast(pct), "lang")
    clamped = F.least(
        F.greatest(F.col("n_chars").cast("double"), F.col("p05")), F.col("p95")
    )
    inside = (F.col("n_chars") >= F.col("p05")) & (
        F.col("n_chars") <= F.col("p95")
    )
    return j.groupBy("lang", "p05", "p95").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("raw_mean"),
        F.round(F.avg(clamped), 4).alias("winsor_mean"),
        F.round(F.avg(F.when(inside, F.col("n_chars"))), 4).alias(
            "trim_mean"
        ),
    ).select(
        "lang",
        "n_docs",
        F.round("p05", 4).alias("p05"),
        F.round("p95", 4).alias("p95"),
        "raw_mean",
        "winsor_mean",
        "trim_mean",
    )
