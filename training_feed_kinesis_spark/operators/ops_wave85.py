"""Wave 85: dedup-granularity economics, preference-strength fitting,
autocorrelation-adjusted sample size.

  * ``llm_chunk_dedup_size_sweep``: duplicate-chunk rate at 8/16/32
    token granularities from one tokenization — the knob curve behind
    llm_dedup_paragraph's fixed block size: finer chunks catch more
    reuse but multiply index size; this table prices that trade.
  * ``llm_bradley_terry_strength``: Bradley–Terry strengths for the
    five languages from pairwise document "matches" (adjacent doc_ids,
    longer document wins), two minorization-maximization iterations
    unrolled (Hunter 2004) — the model reward-model training uses to
    turn pairwise preferences into scalar scores, here at the
    aggregate level both engines can replay exactly.
  * ``ts_effective_sample_size``: lag-1 autocorrelation of the daily
    revenue series on exact integer moments, and the Kish-style
    effective sample size n(1−ρ)/(1+ρ) — how many INDEPENDENT days of
    evidence 30 correlated days actually carry (the correction every
    time-series A/B readout forgets).

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
CAT_TS = "2.L time-series analytics"

SIZES = (8, 16, 32)


def _chunk_sql(size: int) -> str:
    return f"""
      SELECT {size} AS chunk_tokens,
             md5(array_to_string(ws[(i - 1) * {size} + 1 : i * {size}], ' '))
               AS h
      FROM tok,
           UNNEST(generate_series(1,
             CAST(ceil(len(ws) / {size}.0) AS BIGINT))) AS t(i)
      WHERE len(ws) >= (i - 1) * {size} + 1
    """


@register(
    "llm_chunk_dedup_size_sweep",
    CAT_TEXT,
    f"""
    WITH tok AS (
      SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
    ),
    chunks AS (
      {" UNION ALL ".join(_chunk_sql(s) for s in SIZES)}
    ),
    census AS (
      SELECT chunk_tokens, h, COUNT(*)::BIGINT AS c
      FROM chunks GROUP BY 1, 2
    )
    SELECT chunk_tokens,
           CAST(SUM(c) AS BIGINT) AS n_chunks,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(SUM(c) - COUNT(*) AS BIGINT) AS n_dup,
           CAST((2 * (SUM(c) - COUNT(*)) * 10000 + SUM(c))
                // (2 * SUM(c)) AS BIGINT) AS dup_rate_x1e4
    FROM census GROUP BY chunk_tokens
    """,
)
def llm_chunk_dedup_size_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-chunk rate vs chunk granularity: the corpus is cut
    into 8-, 16-, and 32-token chunks (one tokenization, three
    row-local slicings) and each granularity's md5 census reports how
    much exact reuse exists at that scale. Finer chunks always find
    MORE duplication (any duplicated 32-chunk is four duplicated
    8-chunks, but not conversely) at the price of a 4× larger dedup
    index — this table is where the paragraph-dedup block size stops
    being folklore (the granularity axis, orthogonal to
    llm_dedup_threshold_sweep's similarity axis).

    Scale shape: explode → hash census per granularity, all
    map-combinable; the sweep shares one split() pass and shuffles
    digests, never text."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.split(F.lower("text"), " ").alias("ws"))
    chunks = None
    for s in SIZES:
        part = tok.select(
            F.lit(s).alias("chunk_tokens"),
            F.explode(
                F.expr(
                    f"transform(sequence(1, CAST(ceil(size(ws) / {s}.0) AS INT)),"
                    f" i -> md5(concat_ws(' ', slice(ws, (i - 1) * {s} + 1, {s}))))"
                )
            ).alias("h"),
        )
        chunks = part if chunks is None else chunks.unionByName(part)
    census = chunks.groupBy("chunk_tokens", "h").agg(
        F.count(F.lit(1)).alias("c")
    )
    return census.groupBy("chunk_tokens").agg(
        F.sum("c").cast("long").alias("n_chunks"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        (F.sum("c") - F.count(F.lit(1))).cast("long").alias("n_dup"),
        F.expr(
            "CAST((2 * (SUM(c) - COUNT(*)) * 10000 + SUM(c))"
            " DIV (2 * SUM(c)) AS BIGINT)"
        ).alias("dup_rate_x1e4"),
    )


@register(
    "llm_bradley_terry_strength",
    CAT_TEXT,
    """
    WITH seq AS (
      -- adjacency is id-order: a doc with no id has no neighbors, and
      -- engines disagree on where NULLs sort (NULL-PK r9)
      SELECT doc_id, lang, n_chars,
             LEAD(doc_id) OVER (ORDER BY doc_id) AS next_id,
             LEAD(lang) OVER (ORDER BY doc_id) AS next_lang,
             LEAD(n_chars) OVER (ORDER BY doc_id) AS next_chars
      FROM documents WHERE doc_id IS NOT NULL
    ),
    matches AS (
      SELECT lang AS la, next_lang AS lb,
             CASE WHEN n_chars > next_chars
                    OR (n_chars = next_chars) THEN lang
                  ELSE next_lang END AS winner
      FROM seq WHERE next_lang IS NOT NULL AND lang != next_lang
    ),
    wins AS (
      SELECT l, SUM(w)::BIGINT AS wins, SUM(n)::BIGINT AS n_matches FROM (
        SELECT la AS l, CASE WHEN winner = la THEN 1 ELSE 0 END AS w, 1 AS n
        FROM matches
        UNION ALL
        SELECT lb, CASE WHEN winner = lb THEN 1 ELSE 0 END, 1 FROM matches
      ) GROUP BY l
    ),
    pair_n AS (
      SELECT LEAST(la, lb) AS p, GREATEST(la, lb) AS q,
             COUNT(*)::BIGINT AS n_pq
      FROM matches GROUP BY 1, 2
    ),
    s1 AS (
      SELECT l, wins, n_matches,
             2.0 * wins / n_matches AS s FROM wins
    ),
    s2 AS (
      SELECT w.l, w.wins, w.n_matches,
             w.wins / SUM(p.n_pq / (sa.s + sb.s)) AS s
      FROM wins w
      JOIN pair_n p ON w.l IN (p.p, p.q)
      JOIN s1 sa ON sa.l = w.l
      JOIN s1 sb ON sb.l = CASE WHEN p.p = w.l THEN p.q ELSE p.p END
      GROUP BY w.l, w.wins, w.n_matches
    )
    SELECT l AS lang, wins, n_matches,
           ROUND(s, 4) AS bt_strength
    FROM s2
    """,
)
def llm_bradley_terry_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley–Terry strengths per language from pairwise matches
    (adjacent doc_ids with different languages; the longer document
    wins, id-order breaking exact ties): two MM iterations —
    s⁽¹⁾ = 2W/N from the uniform start, then
    s⁽²⁾ = W / Σ_opp n_opp/(s⁽¹⁾ + s⁽¹⁾_opp). This is the aggregate
    core of reward-model fitting from preference pairs
    (llm_preference_pairs mines them; this turns them into scalar
    strengths), replayed exactly: every s is a ratio of exact integers
    or of previously-identical doubles.

    Scale shape: one global LEAD window builds matches; all fitting
    state is |players| + |player pairs| — iterate-on-aggregates, the
    graph_pagerank discipline."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull()
    )
    w = Window.orderBy("doc_id")
    seq = d.select(
        "doc_id",
        "lang",
        "n_chars",
        F.lead("lang").over(w).alias("next_lang"),
        F.lead("n_chars").over(w).alias("next_chars"),
    )
    matches = seq.filter(
        F.col("next_lang").isNotNull() & (F.col("lang") != F.col("next_lang"))
    ).select(
        F.col("lang").alias("la"),
        F.col("next_lang").alias("lb"),
        F.when(
            (F.col("n_chars") > F.col("next_chars"))
            | (F.col("n_chars") == F.col("next_chars")),
            F.col("lang"),
        )
        .otherwise(F.col("next_lang"))
        .alias("winner"),
    )
    sides = matches.select(
        F.col("la").alias("l"),
        F.when(F.col("winner") == F.col("la"), 1).otherwise(0).alias("w"),
    ).unionByName(
        matches.select(
            F.col("lb").alias("l"),
            F.when(F.col("winner") == F.col("lb"), 1).otherwise(0).alias("w"),
        )
    )
    wins = sides.groupBy("l").agg(
        F.sum("w").alias("wins"), F.count(F.lit(1)).alias("n_matches")
    )
    pair_n = matches.groupBy(
        F.least("la", "lb").alias("p"), F.greatest("la", "lb").alias("q")
    ).agg(F.count(F.lit(1)).alias("n_pq"))
    s1 = wins.select(
        "l", (2.0 * F.col("wins") / F.col("n_matches")).alias("s")
    )
    sa = s1.select(F.col("l").alias("al"), F.col("s").alias("sa_s"))
    sb = s1.select(F.col("l").alias("bl"), F.col("s").alias("sb_s"))
    opp = F.when(F.col("p") == F.col("l"), F.col("q")).otherwise(F.col("p"))
    s2 = (
        wins.join(
            F.broadcast(pair_n),
            (F.col("p") == F.col("l")) | (F.col("q") == F.col("l")),
        )
        .join(F.broadcast(sa), F.col("al") == F.col("l"))
        .join(F.broadcast(sb), F.col("bl") == opp)
        .groupBy("l", "wins", "n_matches")
        .agg(
            (
                F.first("wins")
                / F.sum(F.col("n_pq") / (F.col("sa_s") + F.col("sb_s")))
            ).alias("s")
        )
    )
    return s2.select(
        F.col("l").alias("lang"),
        "wins",
        "n_matches",
        F.round("s", 4).alias("bt_strength"),
    )


@register(
    "ts_effective_sample_size",
    CAT_TS,
    """
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day,
             CAST(ROUND(CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) / 100.0, 0) AS BIGINT) AS rev
      FROM events WHERE ts IS NOT NULL GROUP BY 1
    ),
    idx AS (
      SELECT rev, LAG(rev) OVER (ORDER BY day) AS prev,
             COUNT(*) OVER () AS n, SUM(rev) OVER () AS s
      FROM daily
    ),
    moments AS (
      SELECT MAX(n)::BIGINT AS n,
             SUM(CASE WHEN prev IS NOT NULL
                      THEN (n * rev - s) * (n * prev - s) END)::BIGINT
               AS num,
             SUM((n * rev - s) * (n * rev - s))::BIGINT AS den
      FROM idx
    )
    SELECT n AS n_days,
           ROUND(CAST(num AS DOUBLE) / den, 4) AS rho1,
           ROUND(n * (1 - CAST(num AS DOUBLE) / den)
                 / (1 + CAST(num AS DOUBLE) / den), 4) AS ess
    FROM moments
    """,
)
def ts_effective_sample_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of daily revenue and the effective sample
    size n(1−ρ)/(1+ρ): positively correlated days carry less evidence
    than their count suggests, and every confidence interval computed
    over a time series without this correction is too narrow. The
    autocorrelation is formed over the common denominator n² —
    Σ(n·x_t−S)(n·x_{t−1}−S) / Σ(n·x_t−S)² — so both moments are exact
    BIGINTs and the only float is the final ratio (whole-dollar daily
    grain keeps the products inside 64 bits at every test sf).

    Scale shape: one day-grain aggregate and one lag window over the
    domain-sized series."""
    # NULL ts dropped on both engines (the r8 NULL-time seam)
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.round(F.sum(F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)")) / 100.0, 0).cast("long").alias("rev")
    )
    w = Window.orderBy("day")
    wall = Window.partitionBy()
    idx = daily.select(
        "rev",
        F.lag("rev").over(w).alias("prev"),
        F.count(F.lit(1)).over(wall).alias("n"),
        F.sum("rev").over(wall).alias("s"),
    )
    cx = F.col("n") * F.col("rev") - F.col("s")
    cp = F.col("n") * F.col("prev") - F.col("s")
    moments = idx.agg(
        F.max("n").cast("long").alias("n"),
        F.sum(F.when(F.col("prev").isNotNull(), cx * cp)).cast("long").alias(
            "num"
        ),
        F.sum(cx * cx).cast("long").alias("den"),
    )
    rho = F.col("num").cast("double") / F.col("den")
    return moments.select(
        F.col("n").alias("n_days"),
        F.round(rho, 4).alias("rho1"),
        F.round(F.col("n") * (1 - rho) / (1 + rho), 4).alias("ess"),
    )
