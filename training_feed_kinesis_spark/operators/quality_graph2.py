"""Fifth analytics wave: corpus gating rules, time-interval window frames,
graph link prediction, and arrival burstiness.

  * ``llm_quality_gopher``: Gopher-style rule-by-rule quality gate census
    (Rae et al. 2021 §A1.1 heuristics adapted to the fixture corpus) as an
    unpivoted pass/fail report — the filter stage's monitoring table.
  * ``win_frame_time_range``: RANGE-frame window over event TIME (trailing
    90-day spend per customer) — the frame type ROWS frames cannot express
    when rows are irregularly spaced.
  * ``graph_link_predict``: neighbor-overlap (Jaccard) link prediction on
    the co-purchase graph — recommend the strongest absent edges.
  * ``ts_burstiness``: per-user inter-arrival burstiness B=(σ−μ)/(σ+μ)
    (Goh & Barabási) — separates Poisson-like users from bursty ones.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md §0.1);
capability surface reconstructed per SURVEY.md §2 and BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load_table, parallelize

CAT_LLM = "2.J llm-pipeline"
CAT_WIN = "2.E window functions"
CAT_GRAPH = "2.L graph analytics"
CAT_TS = "2.L time-series analytics"

TOP_LINKS = 20


@register(
    "llm_quality_gopher",
    CAT_LLM,
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(translate(trim(text, ' '), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ')) AS tok
      FROM documents
    ),
    per_tok AS (
      SELECT doc_id, tok, COUNT(*)::BIGINT AS c FROM toks GROUP BY 1, 2
    ),
    feat AS (
      SELECT doc_id,
             SUM(c)::BIGINT AS n_words,
             SUM(c * length(tok))::DOUBLE / SUM(c) AS mean_wlen,
             COUNT(*)::DOUBLE / SUM(c) AS ttr,
             MAX(c)::DOUBLE / SUM(c) AS top_word_share,
             COALESCE(SUM(c) FILTER (WHERE length(tok) <= 2), 0)::DOUBLE
               / SUM(c) AS short_word_share
      FROM per_tok GROUP BY doc_id
    ),
    gates AS (
      SELECT
        CASE WHEN n_words BETWEEN 50 AND 100000 THEN 1 ELSE 0 END AS g_wordcount,
        CASE WHEN mean_wlen BETWEEN 3 AND 10 THEN 1 ELSE 0 END AS g_meanlen,
        CASE WHEN ttr >= 0.2 THEN 1 ELSE 0 END AS g_ttr,
        CASE WHEN top_word_share <= 0.1 THEN 1 ELSE 0 END AS g_topword,
        CASE WHEN short_word_share <= 0.3 THEN 1 ELSE 0 END AS g_shortwords
      FROM feat
    )
    SELECT rule, n_pass, n_docs,
           ROUND(n_pass::DOUBLE / n_docs, 4) AS pass_rate
    FROM (
      SELECT 'wordcount_50_100k' AS rule, SUM(g_wordcount)::BIGINT AS n_pass,
             COUNT(*)::BIGINT AS n_docs FROM gates
      UNION ALL
      SELECT 'mean_word_len_3_10', SUM(g_meanlen)::BIGINT,
             COUNT(*)::BIGINT FROM gates
      UNION ALL
      SELECT 'type_token_ratio_ge_02', SUM(g_ttr)::BIGINT,
             COUNT(*)::BIGINT FROM gates
      UNION ALL
      SELECT 'top_word_share_le_01', SUM(g_topword)::BIGINT,
             COUNT(*)::BIGINT FROM gates
      UNION ALL
      SELECT 'short_word_share_le_03', SUM(g_shortwords)::BIGINT,
             COUNT(*)::BIGINT FROM gates
    )
    """,
)
def llm_quality_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality-rule census: five per-document gates (word
    count bounds, mean word length 3–10, type-token ratio, dominant-word
    share, short-word share) computed from ONE per-(doc, token) count
    table, then unpivoted into a rule → pass-rate monitoring report. Gate
    thresholds compare exact-integer-derived ratios, identical both
    engines (each doc's token counts are exact; the per-doc divisions are
    single IEEE ops).

    Scale: one explode + one combinable (doc, tok) count — the same
    substrate TF-IDF uses; gates and the census are per-doc scalars.
    """
    d = parallelize(load_table(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.expr("translate(trim(text), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz')"), " ")).alias("tok"),
    )
    per_tok = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    feat = per_tok.groupBy("doc_id").agg(
        F.sum("c").alias("n_words"),
        (
            F.sum(F.col("c") * F.length("tok")).cast("double") / F.sum("c")
        ).alias("mean_wlen"),
        (F.count(F.lit(1)).cast("double") / F.sum("c")).alias("ttr"),
        (F.max("c").cast("double") / F.sum("c")).alias("top_word_share"),
        (
            F.sum(F.when(F.length("tok") <= 2, F.col("c")).otherwise(0)).cast(
                "double"
            )
            / F.sum("c")
        ).alias("short_word_share"),
    )
    gates = feat.select(
        F.when(F.col("n_words").between(50, 100000), 1).otherwise(0).alias("g_wordcount"),
        F.when(F.col("mean_wlen").between(3, 10), 1).otherwise(0).alias("g_meanlen"),
        F.when(F.col("ttr") >= 0.2, 1).otherwise(0).alias("g_ttr"),
        F.when(F.col("top_word_share") <= 0.1, 1).otherwise(0).alias("g_topword"),
        F.when(F.col("short_word_share") <= 0.3, 1).otherwise(0).alias("g_shortwords"),
    )
    agg = gates.agg(
        F.sum("g_wordcount").alias("p1"),
        F.sum("g_meanlen").alias("p2"),
        F.sum("g_ttr").alias("p3"),
        F.sum("g_topword").alias("p4"),
        F.sum("g_shortwords").alias("p5"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    unpiv = agg.select(
        F.expr(
            "stack(5, 'wordcount_50_100k', p1, 'mean_word_len_3_10', p2, "
            "'type_token_ratio_ge_02', p3, 'top_word_share_le_01', p4, "
            "'short_word_share_le_03', p5) AS (rule, n_pass)"
        ),
        "n_docs",
    )
    return unpiv.select(
        "rule",
        F.col("n_pass").cast("bigint").alias("n_pass"),
        "n_docs",
        F.round(F.col("n_pass").cast("double") / F.col("n_docs"), 4).alias(
            "pass_rate"
        ),
    )


@register(
    "win_frame_time_range",
    CAT_WIN,
    """
    SELECT o_orderkey, o_custkey,
           COUNT(*) OVER w AS n_orders_90d,
           CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) OVER w
                AS DOUBLE) / 100.0 AS spend_90d
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
                 RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW)
    """,
)
def win_frame_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 90-day spend per customer via a RANGE frame over event
    TIME (epoch seconds; 90 d = 7,776,000 s). With irregular order
    spacing, no ROWS frame can express "everything in the last 90 days" —
    RANGE bounds are value offsets, not row offsets. Same-epoch peers
    enter each other's frames, so the result is frame-defined and
    order-insensitive (no tiebreak needed).

    Scale: one shuffle on o_custkey; each partition's frame is a sliding
    two-pointer over its sorted slice — O(rows), bounded state.
    """
    od = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-7776000, 0)
    )
    return od.select(
        "o_orderkey",
        "o_custkey",
        F.count(F.lit(1)).over(w).alias("n_orders_90d"),
        # exact integer cents (§5.3.6b): frame sums of integers are
        # identical no matter how the frame is accumulated
        (
            F.sum(F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"))
            .over(w)
            .cast("double")
            / 100.0
        ).alias("spend_90d"),
    )


@register(
    "graph_link_predict",
    CAT_GRAPH,
    f"""
    WITH pairs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    edges AS (
      SELECT pa, pb FROM pairs GROUP BY pa, pb HAVING COUNT(*) >= 2
    ),
    nbrs AS (
      SELECT pa AS node, pb AS nbr FROM edges
      UNION ALL
      SELECT pb AS node, pa AS nbr FROM edges
    ),
    deg AS (SELECT node, COUNT(*)::BIGINT AS d FROM nbrs GROUP BY node),
    wedge AS (
      SELECT x.node AS na, y.node AS nb, COUNT(*)::BIGINT AS common
      FROM nbrs x JOIN nbrs y ON x.nbr = y.nbr AND x.node < y.node
      GROUP BY x.node, y.node
    ),
    cand AS (
      SELECT w.na, w.nb, w.common, da.d AS deg_a, db.d AS deg_b
      FROM wedge w
      JOIN deg da ON w.na = da.node
      JOIN deg db ON w.nb = db.node
      WHERE NOT EXISTS (SELECT 1 FROM edges e
                        WHERE e.pa = w.na AND e.pb = w.nb)
    )
    SELECT na, nb, common, deg_a, deg_b,
           ROUND(common::DOUBLE / (deg_a + deg_b - common), 4) AS jaccard
    FROM cand
    ORDER BY common::DOUBLE / (deg_a + deg_b - common) DESC, na ASC, nb ASC
    LIMIT {TOP_LINKS}
    """,
)
def graph_link_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction by neighbor-set Jaccard: for every non-adjacent
    node pair sharing ≥1 common neighbor (found via the wedge join — the
    pair space never materializes), score |N(a)∩N(b)| / |N(a)∪N(b)| and
    return the top-20 absent edges. The score is a single IEEE division
    of exact integers (bit-identical cross-engine), ordered with a full
    (score, na, nb) total order so LIMIT is deterministic.

    Scale: same wedge-join bound as graph_triangles — support-thinned
    edges keep max degree small; hub nodes would be capped/sampled first.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
        .select("pa", "pb")
    )
    nbrs = edges.select(
        F.col("pa").alias("node"), F.col("pb").alias("nbr")
    ).unionByName(edges.select(F.col("pb").alias("node"), F.col("pa").alias("nbr")))
    deg = nbrs.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    x = nbrs.alias("x")
    y = nbrs.alias("y")
    wedge = (
        x.join(
            y,
            (F.col("x.nbr") == F.col("y.nbr"))
            & (F.col("x.node") < F.col("y.node")),
        )
        .select(F.col("x.node").alias("na"), F.col("y.node").alias("nb"))
        .groupBy("na", "nb")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    cand = (
        wedge.join(
            edges,
            (wedge["na"] == edges["pa"]) & (wedge["nb"] == edges["pb"]),
            "left_anti",
        )
        .join(deg.select(F.col("node").alias("na"), F.col("d").alias("deg_a")), "na")
        .join(deg.select(F.col("node").alias("nb"), F.col("d").alias("deg_b")), "nb")
    )
    score = F.col("common").cast("double") / (
        F.col("deg_a") + F.col("deg_b") - F.col("common")
    )
    return (
        cand.select(
            "na", "nb", "common", "deg_a", "deg_b",
            F.round(score, 4).alias("jaccard"),
        )
        .orderBy(score.desc(), F.col("na").asc(), F.col("nb").asc())
        .limit(TOP_LINKS)
    )


@register(
    "ts_burstiness",
    CAT_TS,
    """
    WITH gaps AS (
      SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts)) OVER
               (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
               AS gap_us
      FROM events
    ),
    s AS (
      SELECT user_id, COUNT(gap_us)::BIGINT AS n_gaps,
             AVG(gap_us) AS mu, stddev_samp(gap_us) AS sigma
      FROM gaps WHERE gap_us IS NOT NULL GROUP BY user_id
      HAVING COUNT(gap_us) >= 2
    )
    SELECT user_id, n_gaps,
           ROUND(mu / 1e6, 4) AS mean_gap_s,
           ROUND((sigma - mu) / (sigma + mu), 4) AS burstiness
    FROM s
    """,
)
def ts_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user arrival burstiness B = (σ−μ)/(σ+μ) over inter-event gaps
    (Goh & Barabási 2008): B→−1 periodic, ≈0 Poisson, →1 bursty. Gaps are
    exact BIGINT microseconds (epoch µs difference), ordered with
    event_id as tiebreak for same-timestamp events so every engine sees
    the same gap multiset; only the moment ratios are floats (rounded).

    Scale: one shuffle on user_id for the lag window, then combinable
    per-user moments — state is O(users), not O(events).
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts"), F.col("event_id")
    )
    gaps = ev.select(
        "user_id",
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias(
            "gap_us"
        ),
    ).filter(F.col("gap_us").isNotNull())
    s = (
        gaps.groupBy("user_id")
        .agg(
            F.count("gap_us").alias("n_gaps"),
            F.avg("gap_us").alias("mu"),
            F.stddev_samp("gap_us").alias("sigma"),
        )
        .filter(F.col("n_gaps") >= 2)
    )
    return s.select(
        "user_id",
        "n_gaps",
        F.round(F.col("mu") / 1e6, 4).alias("mean_gap_s"),
        F.round(
            (F.col("sigma") - F.col("mu")) / (F.col("sigma") + F.col("mu")), 4
        ).alias("burstiness"),
    )
