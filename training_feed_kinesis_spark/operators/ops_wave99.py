"""Wave 99 (round 7, final wave): sequential testing, multiple-testing
control, overlap evaluation, and two admission-style censuses — seven
oracled keys (net-new total this round 19 of the allowed 20).

  * ``stat_fisher_exact``: weekly 2x2 Fisher exact test (urgent-priority
    x finished-status on orders) — the small-sample counterpart to
    stat_chi2_independence, computed EXACTLY via the hypergeometric
    ratio recurrence folded in pinned order on both engines.
  * ``stat_fdr_bh``: Benjamini–Hochberg step-up FDR control over the
    weekly Fisher p-values — the multiple-testing layer every metric
    sweep needs before acting on "significant" weeks.
  * ``events_sprt_boundary``: Wald's sequential probability ratio test
    on A/B conversion — the always-valid early-stopping companion to
    the fixed-horizon stat_* family; integer prefix counts make the
    log-likelihood path bit-deterministic.
  * ``ts_ljung_box``: portmanteau white-noise test (Q over lags 1..6 of
    the daily-revenue autocorrelations) — the residual-diagnostics step
    after ts_holt_linear / ts_stl_decompose fits.
  * ``llm_rouge1_overlap``: unigram-overlap precision/recall/F1 between
    adjacent-id document pairs (Lin 2004, ROUGE-1) — the eval-suite
    overlap metric next to llm_contamination's shingle containment.
  * ``llm_source_domain_cap``: per-source document cap census
    (CCNet/Gopher-style per-domain caps: keep the top-N docs per source
    by a quality proxy, report kept/dropped doc and char mass).
  * ``dq_text_printable_census``: text admission gate — per source,
    control-character / U+FFFD-replacement / non-ASCII contamination
    counts, in front of every tokenizing consumer.

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

CAT_STAT = "2.L statistics"
CAT_EVENTS = "2.M workloads"
CAT_TS = "2.L time-series analytics"
CAT_TEXT = "2.J llm-pipeline (text)"
CAT_DEDUP = "2.J llm-pipeline (dedup)"
CAT_DQ = "2.L data quality"

# ---------------------------------------------------------------------------
# stat_fisher_exact — weekly 2x2 exact test via the hypergeometric
# ratio recurrence, folded left-to-right on BOTH engines so every
# intermediate double is produced by the identical IEEE op sequence.
# ---------------------------------------------------------------------------

# One fold step: w(k+1) = w(k) * ((r1-k)(c1-k)) / ((k+1)(n-r1-c1+k+1)),
# carrying state [w, total, tail]. All counts are exactly representable
# doubles (weekly n <= ~500 at sf0.1), so the only inexact ops are the
# one multiply/divide/add chain — identical both engines.
_FISHER_GROUP_SQL = """
    SELECT date_trunc('week', o_orderdate) AS wk,
           COUNT(*) AS n,
           COUNT(*) FILTER (WHERE o_orderpriority IN ('1-URGENT','2-HIGH'))
             AS r1,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS c1,
           COUNT(*) FILTER (WHERE o_orderpriority IN ('1-URGENT','2-HIGH')
                            AND o_orderstatus = 'F') AS a
    FROM orders
    WHERE o_orderdate IS NOT NULL
    GROUP BY 1
"""

# DuckDB 1.0's list_reduce has no initial-value arg, so the state rides
# list_prepend; element type must match the state list, hence each k is
# wrapped as a 1-element list and read back as x[1].
_DUCK_STEP = (
    "acc[1] * ((r1 - x[1]) * (c1 - x[1]))"
    " / ((x[1] + 1) * (n - r1 - c1 + x[1] + 1))"
)
_FISHER_ORACLE = f"""
    WITH g AS ({_FISHER_GROUP_SQL}),
    b AS (
      SELECT strftime(wk, '%Y-%m-%d') AS week, n, r1, c1, a,
             GREATEST(0, r1 + c1 - n) AS kmin, LEAST(r1, c1) AS kmax
      FROM g
    ),
    f AS (
      SELECT week, n, r1, c1, a,
        CASE WHEN n <= 1000 THEN
          list_reduce(
            list_prepend(
              [CAST(1.0 AS DOUBLE), CAST(1.0 AS DOUBLE),
               CASE WHEN kmin >= a THEN CAST(1.0 AS DOUBLE)
                    ELSE CAST(0.0 AS DOUBLE) END],
              [[CAST(k AS DOUBLE)] FOR k IN range(kmin, kmax)]
            ),
            (acc, x) -> [
              {_DUCK_STEP},
              acc[2] + {_DUCK_STEP},
              acc[3] + CASE WHEN x[1] + 1 >= a THEN {_DUCK_STEP}
                            ELSE CAST(0.0 AS DOUBLE) END
            ]
          )
        END AS st
      FROM b
    )
    SELECT week, CAST(n AS BIGINT) AS n, CAST(r1 AS BIGINT) AS r1,
           CAST(c1 AS BIGINT) AS c1, CAST(a AS BIGINT) AS a,
           ROUND(st[3] / st[2], 4) AS p_greater
    FROM f ORDER BY week
"""

_SPARK_STEP = (
    "acc[0] * ((r1 - CAST(k AS DOUBLE)) * (c1 - CAST(k AS DOUBLE)))"
    " / ((CAST(k AS DOUBLE) + 1) * (n - r1 - c1 + CAST(k AS DOUBLE) + 1))"
)
_SPARK_FOLD = f"""
    aggregate(
      CASE WHEN kmax > kmin THEN sequence(kmin, kmax - 1)
           ELSE array() END,
      array(CAST(1.0 AS DOUBLE), CAST(1.0 AS DOUBLE),
            CASE WHEN kmin >= a THEN CAST(1.0 AS DOUBLE)
                 ELSE CAST(0.0 AS DOUBLE) END),
      (acc, k) -> array(
        CAST({_SPARK_STEP} AS DOUBLE),
        CAST(acc[1] + {_SPARK_STEP} AS DOUBLE),
        CAST(acc[2] + CASE WHEN k + 1 >= a THEN {_SPARK_STEP}
                           ELSE CAST(0.0 AS DOUBLE) END AS DOUBLE))
    )
"""


def _fisher_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly (week, n, r1, c1, a, p_greater_raw) frame shared by
    stat_fisher_exact and stat_fdr_bh; p is UNROUNDED here so BH ranks
    the same doubles the exact test produced."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull()
    )
    g = o.groupBy(F.date_trunc("week", "o_orderdate").alias("wk")).agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(
            "COUNT(*) FILTER (WHERE o_orderpriority IN"
            " ('1-URGENT','2-HIGH'))"
        ).alias("r1"),
        F.expr("COUNT(*) FILTER (WHERE o_orderstatus = 'F')").alias("c1"),
        F.expr(
            "COUNT(*) FILTER (WHERE o_orderpriority IN"
            " ('1-URGENT','2-HIGH') AND o_orderstatus = 'F')"
        ).alias("a"),
    )
    b = g.select(
        F.date_format("wk", "yyyy-MM-dd").alias("week"),
        "n",
        "r1",
        "c1",
        "a",
        F.expr("GREATEST(0L, r1 + c1 - n)").alias("kmin"),
        F.expr("LEAST(r1, c1)").alias("kmax"),
    )
    return b.select(
        "week",
        "n",
        "r1",
        "c1",
        "a",
        F.expr(
            f"CASE WHEN n <= 1000 THEN ({_SPARK_FOLD})[2] / ({_SPARK_FOLD})[1]"
            " END"
        ).alias("p_raw"),
    )


@register("stat_fisher_exact", CAT_STAT, _FISHER_ORACLE)
def stat_fisher_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fisher's exact test, one-sided (greater), on the weekly 2x2 of
    urgent-priority x finished-status orders — the small-sample
    counterpart to stat_chi2_independence (whose asymptotics the ~40-row
    weekly cells don't earn). p = P(X >= a) for X ~ Hypergeom(n, r1, c1),
    computed WITHOUT factorials via the ratio recurrence
    w(k+1)/w(k) = ((r1-k)(c1-k)) / ((k+1)(n-r1-c1+k+1)) folded
    left-to-right from k_min with state [w, total, tail]; both engines
    run the identical ordered IEEE op sequence (Spark `aggregate` HOF /
    DuckDB `list_reduce`), so the quotient matches bit-for-bit before
    the 4dp rounding. Weeks beyond n = 1000 report NULL — the exact
    test's honest domain; past it the chi2 key is the right tool (and
    the unnormalized weights would eventually overflow doubles).

    Scale shape: one map-side-combinable aggregate to week grain, then
    per-row array math bounded by the n <= 1000 gate (support <= 1000
    elements) — no second shuffle, no UDF. At 100 TB the week grain is
    unchanged; only the gate decides which cells stay exact."""
    wk = _fisher_weekly(spark, sf_dir)
    return wk.select(
        "week",
        F.col("n").cast("bigint").alias("n"),
        F.col("r1").cast("bigint").alias("r1"),
        F.col("c1").cast("bigint").alias("c1"),
        F.col("a").cast("bigint").alias("a"),
        F.round("p_raw", 4).alias("p_greater"),
    ).orderBy("week")


_BH_ORACLE = f"""
    WITH g AS ({_FISHER_GROUP_SQL}),
    b AS (
      SELECT strftime(wk, '%Y-%m-%d') AS week, n, r1, c1, a,
             GREATEST(0, r1 + c1 - n) AS kmin, LEAST(r1, c1) AS kmax
      FROM g
    ),
    f AS (
      SELECT week,
        CASE WHEN n <= 1000 THEN
          list_reduce(
            list_prepend(
              [CAST(1.0 AS DOUBLE), CAST(1.0 AS DOUBLE),
               CASE WHEN kmin >= a THEN CAST(1.0 AS DOUBLE)
                    ELSE CAST(0.0 AS DOUBLE) END],
              [[CAST(k AS DOUBLE)] FOR k IN range(kmin, kmax)]
            ),
            (acc, x) -> [
              {_DUCK_STEP},
              acc[2] + {_DUCK_STEP},
              acc[3] + CASE WHEN x[1] + 1 >= a THEN {_DUCK_STEP}
                            ELSE CAST(0.0 AS DOUBLE) END
            ]
          )
        END AS st
      FROM b
    ),
    p AS (
      SELECT week, st[3] / st[2] AS p_raw FROM f WHERE st IS NOT NULL
    ),
    ranked AS (
      SELECT week, p_raw,
             ROW_NUMBER() OVER (ORDER BY p_raw ASC, week ASC) AS rn,
             COUNT(*) OVER () AS m
      FROM p
    ),
    adj AS (
      SELECT week, p_raw, rn, m,
             LEAST(CAST(1.0 AS DOUBLE),
                   MIN(p_raw * m / rn)
                     OVER (ORDER BY rn DESC ROWS UNBOUNDED PRECEDING))
               AS p_adj_raw
      FROM ranked
    )
    SELECT week, ROUND(p_raw, 4) AS p_value, CAST(rn AS BIGINT) AS p_rank,
           ROUND(p_adj_raw, 4) AS p_adj,
           p_adj_raw <= 0.10 AS rejected
    FROM adj ORDER BY week
"""


@register("stat_fdr_bh", CAT_STAT, _BH_ORACLE)
def stat_fdr_bh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini–Hochberg step-up FDR control (Benjamini & Hochberg
    1995) over the weekly Fisher exact p-values: rank ascending,
    adjusted p_i = min_{j >= i} (p_j * m / j) clamped to 1 — spelled as
    a running MIN over the rank-descending order — reject at FDR 0.10.
    Ranks tie-break on week, so both engines rank the bit-identical
    p doubles the shared fold produced; the m/rank scaling is
    integer-by-double, deterministic.

    Scale shape: the p-value frame is week-grain (thousands of rows per
    decade), so the two global windows are a single tiny-partition sort
    — BH is inherently a total-order procedure; at real scale you run
    it per experiment family (PARTITION BY family) with the same
    spelling."""
    p = _fisher_weekly(spark, sf_dir).filter(
        F.col("p_raw").isNotNull()
    ).select("week", "p_raw")
    w_rank = Window.orderBy(F.col("p_raw").asc(), F.col("week").asc())
    ranked = p.select(
        "week",
        "p_raw",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(
            Window.partitionBy()
        ).alias("m"),
    )
    w_cummin = Window.orderBy(F.col("rn").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    adj = ranked.withColumn(
        "p_adj_raw",
        F.least(
            F.lit(1.0),
            F.min(F.col("p_raw") * F.col("m") / F.col("rn")).over(w_cummin),
        ),
    )
    return adj.select(
        "week",
        F.round("p_raw", 4).alias("p_value"),
        F.col("rn").cast("bigint").alias("p_rank"),
        F.round("p_adj_raw", 4).alias("p_adj"),
        (F.col("p_adj_raw") <= 0.10).alias("rejected"),
    ).orderBy("week")


# ---------------------------------------------------------------------------
# events_sprt_boundary — Wald's SPRT on A/B conversion.
# ---------------------------------------------------------------------------

# H0/H1 conversion rates, spelled ONCE for both engines — with explicit
# DOUBLE casts: bare 0.22 / 0.18 binds as DECIMAL division whose result
# scale differs per engine (the fuzz-documented bare-DECIMAL trap),
# which put the two llr paths ~1e-4 apart at sf0.01.
_SPRT_P0 = "CAST(0.18 AS DOUBLE)"
_SPRT_P1 = "CAST(0.22 AS DOUBLE)"
_SPRT_A = "LN(CAST(19.0 AS DOUBLE))"  # alpha = beta = 0.05: ln((1-b)/a)


@register(
    "events_sprt_boundary",
    CAT_EVENTS,
    f"""
    WITH trials AS (
      SELECT user_id % 2 AS variant, ts, event_id,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
      FROM events WHERE ts IS NOT NULL
    ),
    path AS (
      SELECT variant,
             ROW_NUMBER() OVER (PARTITION BY variant
                                ORDER BY ts, event_id) AS t,
             SUM(conv) OVER (PARTITION BY variant ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS k
      FROM trials
    ),
    llr AS (
      SELECT variant, t, k,
             k * LN({_SPRT_P1} / {_SPRT_P0})
               + (t - k) * LN((1 - {_SPRT_P1}) / (1 - {_SPRT_P0})) AS llr
      FROM path
    )
    SELECT variant,
           CAST(MAX(t) AS BIGINT) AS n_total,
           CAST(MAX(k) AS BIGINT) AS k_total,
           COALESCE(
             arg_min(CASE WHEN llr >= {_SPRT_A} THEN 'accept_h1'
                          ELSE 'accept_h0' END, t)
               FILTER (WHERE llr >= {_SPRT_A} OR llr <= -{_SPRT_A}),
             'continue') AS decision,
           CAST(MIN(t) FILTER (WHERE llr >= {_SPRT_A}
                               OR llr <= -{_SPRT_A}) AS BIGINT)
             AS n_at_decision,
           CAST(arg_min(k, t) FILTER (WHERE llr >= {_SPRT_A}
                                      OR llr <= -{_SPRT_A}) AS BIGINT)
             AS k_at_decision,
           ROUND(arg_min(llr, t) FILTER (WHERE llr >= {_SPRT_A}
                                         OR llr <= -{_SPRT_A}), 4)
             AS llr_at_decision
    FROM llr GROUP BY variant ORDER BY variant
    """,
)
def events_sprt_boundary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's sequential probability ratio test (Wald 1945) on A/B
    conversion (variant = user_id parity, conversion = purchase event):
    the cumulative Bernoulli log-likelihood ratio path
    llr_t = k_t ln(p1/p0) + (t-k_t) ln((1-p1)/(1-p0)) with H0 p=0.18 vs
    H1 p=0.22, stopped at the first crossing of ±ln(19) (alpha = beta =
    0.05) — the always-valid early-stopping companion to the
    fixed-horizon tests. The path is a function of INTEGER prefix
    counts (t, k), so llr is computed pointwise from exact integers —
    no float accumulation order anywhere; the first-crossing row is an
    arg-min over the unique (ts, event_id) total order.

    Scale shape: one hash shuffle on variant serves both window passes
    and the final aggregate; SPRT is sequential BY DESIGN, so the
    partition grain is the experiment arm — at 100 TB you partition by
    (experiment_id, variant) and each arm's path is one partition's
    window, exactly this spelling. The monotone fold also runs
    incrementally (the stream_stateful per-key discipline). NULL ts
    rows are dropped on both engines: a NULL-ts trial would sit at
    opposite ends of the path (Spark NULLS FIRST vs DuckDB NULLS LAST)
    and renumber every t — the ADVICE r7 ordering seam."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
    ).select(
        (F.col("user_id") % 2).alias("variant"),
        "ts",
        "event_id",
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("conv"),
    )
    w = Window.partitionBy("variant").orderBy("ts", F.col("event_id").asc_nulls_last())
    path = ev.select(
        "variant",
        F.row_number().over(w).alias("t"),
        F.sum("conv")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("k"),
    )
    llr = path.withColumn(
        "llr",
        F.expr(
            f"k * LN({_SPRT_P1} / {_SPRT_P0})"
            f" + (t - k) * LN((1 - {_SPRT_P1}) / (1 - {_SPRT_P0}))"
        ),
    )
    crossed = f"llr >= {_SPRT_A} OR llr <= -{_SPRT_A}"
    return (
        llr.groupBy("variant")
        .agg(
            F.max("t").cast("bigint").alias("n_total"),
            F.max("k").cast("bigint").alias("k_total"),
            F.coalesce(
                F.expr(
                    f"min_by(CASE WHEN llr >= {_SPRT_A} THEN 'accept_h1'"
                    f" ELSE 'accept_h0' END, t) FILTER (WHERE {crossed})"
                ),
                F.lit("continue"),
            ).alias("decision"),
            F.expr(f"MIN(t) FILTER (WHERE {crossed})")
            .cast("bigint")
            .alias("n_at_decision"),
            F.expr(f"min_by(k, t) FILTER (WHERE {crossed})")
            .cast("bigint")
            .alias("k_at_decision"),
            F.expr(
                f"ROUND(min_by(llr, t) FILTER (WHERE {crossed}), 4)"
            ).alias("llr_at_decision"),
        )
        .orderBy("variant")
    )


# ---------------------------------------------------------------------------
# ts_ljung_box — portmanteau white-noise diagnostic on daily revenue.
# ---------------------------------------------------------------------------

_LB_LAGS = 6


@register(
    "ts_ljung_box",
    CAT_TS,
    f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                  AS DOUBLE) / 100.0 AS rev
      FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
    ),
    centered AS (
      SELECT day, rev - AVG(rev) OVER () AS y FROM daily
    ),
    lagged AS (
      SELECT y,
             {', '.join(f"LAG(y, {k}) OVER (ORDER BY day) AS y{k}"
                        for k in range(1, _LB_LAGS + 1))}
      FROM centered
    ),
    moments AS (
      SELECT COUNT(*) AS n, SUM(y * y) AS s0,
             {', '.join(f"SUM(y * y{k}) AS s{k}"
                        for k in range(1, _LB_LAGS + 1))}
      FROM lagged
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           {', '.join(f"ROUND(s{k} / NULLIF(s0, 0.0), 4) AS r{k}"
                      for k in range(1, _LB_LAGS + 1))},
           ROUND(n * (n + 2) * (
             {' + '.join(f"(s{k} / NULLIF(s0, 0.0)) * (s{k} / NULLIF(s0, 0.0))"
                         f" / (n - {k})"
                         for k in range(1, _LB_LAGS + 1))}
           ), 4) AS q_lb,
           CAST({_LB_LAGS} AS BIGINT) AS df
    FROM moments
    """,
)
def ts_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung–Box portmanteau test statistic (Ljung & Box 1978)
    Q = n(n+2) * sum_k r_k^2 / (n-k) over lags 1..6 of the daily-revenue
    autocorrelations — the residual white-noise diagnostic run after
    every ts_* model fit (a large Q against chi2(6) says structure
    remains). Day-grain revenue uses the exact-cents substrate
    (BIGINT cent sum -> one double quotient), the series is mean-centered
    via a single full-frame window, and each r_k = sum(y_t y_{t-k}) /
    sum(y^2) comes from one conditional aggregate; the Q combination is
    an explicit left-to-right sum of six O(1) terms, identical both
    engines, rounded at 4dp.

    Scale shape: ONE shuffle to day grain (map-side combinable cent
    sums), then a single-partition window over ~2.4k day rows — the
    series grain, not the fact grain; for per-series diagnostics at
    100 TB the same spelling partitions by series id. NULL o_orderdate
    dropped on both engines (the _cusum_prefix NULL-ordering seam)."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull()
    )
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        (
            F.sum(
                F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
            ).cast("double")
            / 100.0
        ).alias("rev")
    )
    centered = daily.select(
        "day",
        (F.col("rev") - F.avg("rev").over(Window.partitionBy())).alias("y"),
    )
    w = Window.orderBy("day")
    lagged = centered.select(
        "y",
        *[
            F.lag("y", k).over(w).alias(f"y{k}")
            for k in range(1, _LB_LAGS + 1)
        ],
    )
    moments = lagged.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("y") * F.col("y")).alias("s0"),
        *[
            F.sum(F.col("y") * F.col(f"y{k}")).alias(f"s{k}")
            for k in range(1, _LB_LAGS + 1)
        ],
    )
    q_terms = " + ".join(
        f"(s{k} / NULLIF(s0, 0.0)) * (s{k} / NULLIF(s0, 0.0)) / (n - {k})"
        for k in range(1, _LB_LAGS + 1)
    )
    return moments.select(
        F.col("n").cast("bigint").alias("n_days"),
        *[
            F.round(
                F.col(f"s{k}") / F.expr("NULLIF(s0, CAST(0.0 AS DOUBLE))"), 4
            ).alias(f"r{k}")
            for k in range(1, _LB_LAGS + 1)
        ],
        F.expr(f"ROUND(n * (n + 2) * ({q_terms}), 4)").alias("q_lb"),
        F.lit(_LB_LAGS).cast("bigint").alias("df"),
    )


# ---------------------------------------------------------------------------
# llm_rouge1_overlap — unigram multiset P/R/F1 on adjacent-id doc pairs.
# ---------------------------------------------------------------------------


@register(
    "llm_rouge1_overlap",
    CAT_TEXT,
    """
    WITH toks AS (
      SELECT doc_id, t.tok, COUNT(*) AS cnt
      FROM documents, unnest(string_split(lower(text), ' ')) AS t(tok)
      GROUP BY doc_id, t.tok
    ),
    sizes AS (
      SELECT doc_id, len(string_split(lower(text), ' ')) AS n_tok
      FROM documents
    ),
    overlap AS (
      SELECT c.doc_id AS pair_id,
             SUM(LEAST(c.cnt, r.cnt)) AS n_overlap
      FROM toks c JOIN toks r
        ON r.doc_id = c.doc_id + 1 AND r.tok = c.tok
      GROUP BY c.doc_id
    )
    SELECT sc.doc_id AS pair_id,
           CAST(sc.n_tok AS BIGINT) AS n_cand_tokens,
           CAST(sr.n_tok AS BIGINT) AS n_ref_tokens,
           CAST(COALESCE(o.n_overlap, 0) AS BIGINT) AS n_overlap,
           ROUND(COALESCE(o.n_overlap, 0) * 1.0 / sc.n_tok, 4) AS rouge1_p,
           ROUND(COALESCE(o.n_overlap, 0) * 1.0 / sr.n_tok, 4) AS rouge1_r,
           ROUND(2.0 * COALESCE(o.n_overlap, 0)
                 / (sc.n_tok + sr.n_tok), 4) AS rouge1_f1
    FROM sizes sc
    JOIN sizes sr ON sr.doc_id = sc.doc_id + 1
    LEFT JOIN overlap o ON o.pair_id = sc.doc_id
    ORDER BY pair_id
    """,
)
def llm_rouge1_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-1 (Lin 2004): unigram-multiset overlap precision / recall /
    F1 between candidate and reference texts, here adjacent-id document
    pairs (doc d scored against doc d+1) — the eval-suite overlap
    metric that sits next to llm_contamination's shingle containment
    (clipped counts: overlap = sum_tok min(cnt_cand, cnt_ref), the
    ROUGE clipping rule). F1 uses the 2*ov/(|c|+|r|) identity — equal
    to the harmonic mean of P and R but with ONE division, so there is
    no 0/0 arm and fewer rounding sites. House tokenizer (llm_text
    _TOKENS: lower + single-space split) keeps token parity.

    Scale shape: per-doc token counts are one (doc_id, tok) hash
    aggregate off the exploded scan; the pair join keys on the derived
    doc_id+1 (equi-join, no inequality); everything stays at token/pair
    grain with no cartesian term. At 100 TB pair_id comes from the eval
    manifest instead of id adjacency — same plan."""
    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.select(
            "doc_id",
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("tok"),
        )
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    sizes = d.select(
        "doc_id",
        F.size(F.split(F.lower(F.col("text")), " ")).alias("n_tok"),
    )
    c = toks.alias("c")
    r = toks.alias("r")
    overlap = (
        c.join(
            r,
            (F.col("r.doc_id") == F.col("c.doc_id") + 1)
            & (F.col("r.tok") == F.col("c.tok")),
        )
        .groupBy(F.col("c.doc_id").alias("pair_id"))
        .agg(F.sum(F.least("c.cnt", "r.cnt")).alias("n_overlap"))
    )
    sc = sizes.alias("sc")
    sr = sizes.alias("sr")
    ov = F.coalesce(F.col("n_overlap"), F.lit(0))
    return (
        sc.join(sr, F.col("sr.doc_id") == F.col("sc.doc_id") + 1)
        .join(
            overlap,
            F.col("pair_id") == F.col("sc.doc_id"),
            "left",
        )
        .select(
            F.col("sc.doc_id").alias("pair_id"),
            F.col("sc.n_tok").cast("bigint").alias("n_cand_tokens"),
            F.col("sr.n_tok").cast("bigint").alias("n_ref_tokens"),
            ov.cast("bigint").alias("n_overlap"),
            F.round(ov * 1.0 / F.col("sc.n_tok"), 4).alias("rouge1_p"),
            F.round(ov * 1.0 / F.col("sr.n_tok"), 4).alias("rouge1_r"),
            F.round(
                2.0 * ov / (F.col("sc.n_tok") + F.col("sr.n_tok")), 4
            ).alias("rouge1_f1"),
        )
        .orderBy("pair_id")
    )


# ---------------------------------------------------------------------------
# llm_source_domain_cap — CCNet/Gopher-style per-source cap census.
# ---------------------------------------------------------------------------

_CAP_N = 15


@register(
    "llm_source_domain_cap",
    CAT_DEDUP,
    f"""
    WITH ranked AS (
      SELECT source, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id ASC) AS rn
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(COALESCE(SUM(CASE WHEN rn <= {_CAP_N} THEN 1 END), 0)
                AS BIGINT) AS n_kept,
           CAST(COALESCE(SUM(CASE WHEN rn > {_CAP_N} THEN 1 END), 0)
                AS BIGINT) AS n_dropped,
           CAST(COALESCE(SUM(CASE WHEN rn <= {_CAP_N} THEN n_chars END), 0)
                AS BIGINT) AS kept_chars,
           CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) AS total_chars,
           CAST(COALESCE(SUM(CASE WHEN rn > {_CAP_N} THEN 1 END), 0)
                * 10000 // COUNT(*) AS BIGINT) / 10000.0 AS drop_share
    FROM ranked GROUP BY source ORDER BY source
    """,
)
def llm_source_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap (the CCNet / Gopher per-domain cap rule:
    Wenzek et al. 2020; Rae et al. 2021 §A.1.2): keep at most N = 15
    docs per source, electing keepers by a quality proxy (n_chars DESC,
    doc_id ASC — a unique total order, the dedup-keeper discipline),
    and report the kept/dropped doc and char mass per source plus the
    exact basis-point drop share. This is the admission-side mixture
    control in front of corpus_mix: a whale domain cannot swamp the
    feed past its cap.

    Scale shape: ONE hash shuffle on source serves both the rank and
    the census rollup. A whale source makes a single-task window; the
    scale path is the topk_per_group two-phase (per-partition pre-top-N
    then global re-rank) — semantics-identical because keeper order is
    a total order; with 15 << partition size the pre-filter bounds the
    second pass to 15 rows per input partition."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    ranked = d.select(
        "source", "n_chars", F.row_number().over(w).alias("rn")
    )
    zero = F.lit(0)
    return (
        ranked.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(
                F.sum(F.when(F.col("rn") <= _CAP_N, 1)), zero
            )
            .cast("bigint")
            .alias("n_kept"),
            F.coalesce(F.sum(F.when(F.col("rn") > _CAP_N, 1)), zero)
            .cast("bigint")
            .alias("n_dropped"),
            F.coalesce(
                F.sum(F.when(F.col("rn") <= _CAP_N, F.col("n_chars"))),
                zero,
            )
            .cast("bigint")
            .alias("kept_chars"),
            F.coalesce(F.sum("n_chars"), zero)
            .cast("bigint")
            .alias("total_chars"),
        )
        .withColumn(
            "drop_share",
            F.expr("CAST(n_dropped * 10000 DIV n_docs AS BIGINT)")
            / 10000.0,
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# dq_text_printable_census — control/replacement/non-ASCII admission gate.
# ---------------------------------------------------------------------------

# RE2 ∩ Java classes (hex escapes only): C0 control chars minus
# \t \n \r, the U+FFFD replacement char, and the printable-ASCII
# complement (tab/newline excluded from "contamination").
_CTRL_CLS = r"[\x00-\x08\x0B\x0C\x0E-\x1F]"
_REPL_CLS = "[�]"
_NONASCII_CLS = r"[^\x00-\x7F]"


@register(
    "dq_text_printable_census",
    CAT_DQ,
    f"""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(COALESCE(SUM(CASE WHEN regexp_matches(text,
                '{_CTRL_CLS}') THEN 1 END), 0) AS BIGINT) AS n_ctrl_docs,
           CAST(COALESCE(SUM(CASE WHEN regexp_matches(text,
                '{_REPL_CLS}') THEN 1 END), 0) AS BIGINT) AS n_repl_docs,
           CAST(COALESCE(SUM(length(text) - length(regexp_replace(text,
                '{_CTRL_CLS}', '', 'g'))), 0) AS BIGINT) AS n_ctrl_chars,
           CAST(COALESCE(SUM(length(text) - length(regexp_replace(text,
                '{_NONASCII_CLS}', '', 'g'))), 0) AS BIGINT)
             AS n_nonascii_chars,
           CAST(COALESCE(SUM(length(text)), 0) AS BIGINT) AS n_text_chars,
           CAST(COALESCE(SUM(length(text) - length(regexp_replace(text,
                '{_NONASCII_CLS}', '', 'g'))), 0) * 10000
                // NULLIF(SUM(length(text)), 0) AS BIGINT) / 10000.0
             AS nonascii_share
    FROM documents GROUP BY source ORDER BY source
    """,
)
def dq_text_printable_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text admission gate: per source, documents containing C0 control
    characters (minus tab/newline/CR — the mojibake and binary-spill
    signature), documents containing U+FFFD (the decoder's own
    evidence of a charset misread), plus character-level control and
    non-ASCII counts and the exact basis-point non-ASCII share. Sits in
    front of every tokenizing consumer the way dq_value_finite_census
    sits in front of the numeric aggregates: contamination is gated at
    ingest, not handled per-consumer. Char counts use the
    length-minus-stripped-length identity — `regexp_replace` is global
    on both engines (flag 'g' on the oracle side) and the classes stay
    in the RE2 ∩ Java hex-escape subset; clean corpora report zeros,
    and the planted-corruption replay proves every flag fires.

    Scale shape: one map-side-combinable aggregate over a pruned
    (source, text) scan; regex work is per-row JVM codegen, no UDF, no
    second shuffle."""
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    zero = F.lit(0)

    def stripped_count(cls: str):
        return F.length(t) - F.length(F.regexp_replace(t, cls, ""))

    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(
                F.sum(F.when(t.rlike(_CTRL_CLS), 1)), zero
            )
            .cast("bigint")
            .alias("n_ctrl_docs"),
            F.coalesce(
                F.sum(F.when(t.rlike(_REPL_CLS), 1)), zero
            )
            .cast("bigint")
            .alias("n_repl_docs"),
            F.coalesce(F.sum(stripped_count(_CTRL_CLS)), zero)
            .cast("bigint")
            .alias("n_ctrl_chars"),
            F.coalesce(F.sum(stripped_count(_NONASCII_CLS)), zero)
            .cast("bigint")
            .alias("n_nonascii_chars"),
            F.coalesce(F.sum(F.length(t)), zero)
            .cast("bigint")
            .alias("n_text_chars"),
        )
        # the share is derived from the two already-aggregated BIGINTs —
        # NOT re-spelled as a regex inside F.expr, where Spark's SQL
        # string-literal parser would eat the \\x escapes in the class
        # (the first differential run caught exactly that)
        .withColumn(
            "nonascii_share",
            F.expr(
                "CAST(n_nonascii_chars * 10000"
                " DIV NULLIF(n_text_chars, 0) AS BIGINT)"
            )
            / 10000.0,
        )
        .orderBy("source")
    )
