"""Wave 57: BPE merge application, one-way ANOVA, quantile treatment
effects, AMS second-moment sketch.

  * ``llm_bpe_apply``: apply a frozen, ranked merge table to the corpus
    (the inference half of BPE; ``llm_bpe_merge_step`` is the training
    half) with before/after token accounting per language.
  * ``stat_anova_oneway``: one-way ANOVA F across event types — the
    k-group mean test missing between Welch's t (2 groups) and the
    nonparametric ranks (Mann-Whitney).
  * ``events_qte``: quantile treatment effects — per-quantile A/B value
    differences; distributional shifts the mean-based uplift hides.
  * ``agg_ams_f2_sketch``: Alon-Matias-Szegedy F₂ (self-join size)
    estimate from 16 deterministic md5 sign hashes, reported against the
    exact second frequency moment — a fully ORACLED sketch, because the
    sign functions are engine-portable hashes, not RNG.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

CAT_TEXT = "2.J llm-pipeline (text)"
CAT_STAT = "2.L statistics"
CAT_EXP = "2.L experimentation"
CAT_AGG = "2.D aggregations"

# frozen merge table: (pair → merged symbol), applied in rank order —
# the engine-vocabulary analogue of a real tokenizer's merges.txt
_MERGES = [("in", "ĩ"), ("er", "ẽ"), ("ti", "ť")]


def _apply_merges_sql(col: str) -> str:
    out = col
    for a, b in _MERGES:
        out = f"replace({out}, '{a}', '{b}')"
    return out


@register(
    "llm_bpe_apply",
    CAT_TEXT,
    f"""
    WITH tok AS (
      SELECT lang, unnest(string_split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ')) AS t
      FROM documents
    ),
    applied AS (
      SELECT lang, t, {_apply_merges_sql('t')} AS merged FROM tok
    )
    SELECT lang,
           COUNT(*)::BIGINT AS n_words,
           CAST(SUM(length(t)) AS BIGINT) AS chars_before,
           CAST(SUM(length(merged)) AS BIGINT) AS units_after,
           CAST(SUM(length(t) - length(merged)) AS BIGINT) AS merges_applied
    FROM applied GROUP BY lang
    """,
)
def llm_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer INFERENCE: apply a frozen ranked merge table (the
    artifact ``llm_bpe_merge_step`` trains) to every word — each merge
    replaces a character pair with one unit, in rank order, exactly the
    greedy application order real BPE uses — and account the compression
    per language: character count before, unit count after, merges
    applied (= chars saved, since each merge saves one). Merge symbols
    are single substitute characters so unit counting stays `length()`.

    Scale shape: pure row-local chained `replace` inside codegen over
    the exploded words; the broadcast-sized merge table is baked into
    the expression (a real tokenizer ships ~50k merges — same plan, the
    chain becomes a pandas_udf over the frozen table). One (lang)-keyed
    aggregate."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("lang", F.explode(F.split(F.expr("translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz')"), " ")).alias("t"))
    merged = "t"
    for a, b in _MERGES:
        merged = f"replace({merged}, '{a}', '{b}')"
    applied = tok.select("lang", "t", F.expr(merged).alias("merged"))
    return applied.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        F.sum(F.length("t")).cast("bigint").alias("chars_before"),
        F.sum(F.length("merged")).cast("bigint").alias("units_after"),
        F.sum(F.length("t") - F.length("merged"))
        .cast("bigint")
        .alias("merges_applied"),
    )


@register(
    "stat_anova_oneway",
    CAT_STAT,
    """
    WITH g AS (
      SELECT event_type, COUNT(*)::DOUBLE AS n, AVG(value) AS m,
             SUM(value * value) - COUNT(*) * AVG(value) * AVG(value) AS ss_w
      FROM events GROUP BY event_type
    ),
    tot AS (
      SELECT SUM(n) AS n_tot, SUM(n * m) / SUM(n) AS grand,
             COUNT(*)::DOUBLE AS k
      FROM g
    )
    SELECT CAST(t.k AS BIGINT) AS n_groups,
           CAST(t.n_tot AS BIGINT) AS n_rows,
           ROUND(SUM(g.n * (g.m - t.grand) * (g.m - t.grand)) / (t.k - 1), 4)
             AS ms_between,
           ROUND(SUM(g.ss_w) / (t.n_tot - t.k), 4) AS ms_within,
           ROUND((SUM(g.n * (g.m - t.grand) * (g.m - t.grand)) / (t.k - 1))
                 / (SUM(g.ss_w) / (t.n_tot - t.k)), 4) AS f_stat
    FROM g, tot t
    GROUP BY t.k, t.n_tot, t.grand
    """,
)
def stat_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA across event types: between-group vs within-group
    mean square and the F statistic — the k-group "are these means the
    same population" test that completes the test family (Welch t for 2
    means, Mann-Whitney for 2 distributions, χ² for categories, KS for
    distributions, this for k means). Group moments come from one pass;
    within-SS uses the computational identity Σx² − n·x̄², so no second
    scan subtracts means row-wise.

    Scale shape: one map-side-combinable aggregate to k=5 group moment
    rows, then constant-size arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("value").alias("m"),
        (
            F.sum(F.col("value") * F.col("value"))
            - F.count(F.lit(1)) * F.avg("value") * F.avg("value")
        ).alias("ss_w"),
    )
    tot = g.agg(
        F.sum("n").alias("n_tot"),
        (F.sum(F.col("n") * F.col("m")) / F.sum("n")).alias("grand"),
        F.count(F.lit(1)).cast("double").alias("k"),
    )
    j = g.crossJoin(F.broadcast(tot))
    dev = (F.col("m") - F.col("grand")) * (F.col("m") - F.col("grand"))
    return j.groupBy("k", "n_tot", "grand").agg(
        F.sum(F.col("n") * dev).alias("_ssb"), F.sum("ss_w").alias("_ssw")
    ).select(
        F.col("k").cast("bigint").alias("n_groups"),
        F.col("n_tot").cast("bigint").alias("n_rows"),
        F.round(F.col("_ssb") / (F.col("k") - 1), 4).alias("ms_between"),
        F.round(F.col("_ssw") / (F.col("n_tot") - F.col("k")), 4).alias(
            "ms_within"
        ),
        F.round(
            (F.col("_ssb") / (F.col("k") - 1))
            / (F.col("_ssw") / (F.col("n_tot") - F.col("k"))),
            4,
        ).alias("f_stat"),
    )


@register(
    "events_qte",
    CAT_EXP,
    """
    WITH assigned AS (
      SELECT CASE WHEN strpos('02468ace',
                    substr(md5(user_id::VARCHAR), 1, 1)) > 0
                  THEN 'A' ELSE 'B' END AS variant,
             value
      FROM events WHERE event_type = 'purchase'
    ),
    per_arm AS (
      SELECT variant, q,
             ROUND(CASE q
               WHEN 25 THEN percentile_cont(0.25) WITHIN GROUP (ORDER BY value)
               WHEN 50 THEN percentile_cont(0.50) WITHIN GROUP (ORDER BY value)
               WHEN 75 THEN percentile_cont(0.75) WITHIN GROUP (ORDER BY value)
               ELSE percentile_cont(0.90) WITHIN GROUP (ORDER BY value)
             END, 4) AS v
      FROM assigned, (SELECT unnest([25, 50, 75, 90]) AS q)
      GROUP BY variant, q
    )
    SELECT q AS quantile,
           MAX(CASE WHEN variant = 'A' THEN v END) AS value_a,
           MAX(CASE WHEN variant = 'B' THEN v END) AS value_b,
           ROUND(MAX(CASE WHEN variant = 'B' THEN v END)
                 - MAX(CASE WHEN variant = 'A' THEN v END), 4) AS qte
    FROM per_arm GROUP BY q
    """,
)
def events_qte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile treatment effects on purchase value: exact P25/P50/P75/
    P90 per arm and their differences — the distributional readout a
    mean-uplift number hides (an intervention can raise the median while
    crushing the tail, netting to zero mean effect). Same hash
    assignment as the rest of the experiment family.

    Scale shape: exact percentiles need one sort-based aggregate per
    arm; at extreme scale swap in approx_percentile (rank error ≤ 1/acc)
    with the same output schema — the QTE table is 4 rows either way."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    assigned = ev.select(
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1).isin(
                *list("02468ace")
            ),
            "A",
        )
        .otherwise("B")
        .alias("variant"),
        "value",
    )
    per_arm = assigned.groupBy("variant").agg(
        *[
            F.round(F.expr(f"percentile(value, {q / 100.0})"), 4).alias(f"p{q}")
            for q in (25, 50, 75, 90)
        ]
    )
    long = per_arm.select(
        "variant",
        F.explode(
            F.map_from_arrays(
                F.array(*[F.lit(q) for q in (25, 50, 75, 90)]),
                F.array(*[F.col(f"p{q}") for q in (25, 50, 75, 90)]),
            )
        ).alias("quantile", "v"),
    )
    return long.groupBy("quantile").agg(
        F.max(F.when(F.col("variant") == "A", F.col("v"))).alias("value_a"),
        F.max(F.when(F.col("variant") == "B", F.col("v"))).alias("value_b"),
        F.round(
            F.max(F.when(F.col("variant") == "B", F.col("v")))
            - F.max(F.when(F.col("variant") == "A", F.col("v"))),
            4,
        ).alias("qte"),
    )


_AMS_SKETCHES = 16


@register(
    "agg_ams_f2_sketch",
    CAT_AGG,
    # sign_j(token) = parity of hex digit j of md5 — a deterministic
    # 4-wise-ish hash family both engines compute identically, so even
    # the SKETCH side is hash-oracled (unlike RNG-seeded AMS)
    f"""
    WITH tok AS (
      SELECT unnest(string_split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ')) AS t FROM documents
    ),
    cnt AS (SELECT t, COUNT(*)::BIGINT AS c FROM tok GROUP BY t),
    signs AS (
      SELECT c, j,
             CASE WHEN strpos('02468ace',
                    substr(md5(t), j + 1, 1)) > 0
                  THEN 1 ELSE -1 END AS s
      FROM cnt, (SELECT unnest(range(0, {_AMS_SKETCHES})) AS j)
    ),
    est AS (
      SELECT j, SUM(s * c) AS z FROM signs GROUP BY j
    )
    SELECT (SELECT CAST(SUM(c * c) AS BIGINT) FROM cnt) AS f2_exact,
           CAST(ROUND(AVG(CAST(z * z AS DOUBLE)), 0) AS BIGINT) AS f2_estimate,
           {_AMS_SKETCHES}::BIGINT AS n_sketches
    FROM est
    """,
)
def agg_ams_f2_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alon-Matias-Szegedy second frequency moment: F₂ = Σ count(t)² (the
    token-frequency "surprise number" / self-join size) estimated by 16
    sketches Z_j = Σ sign_j(t)·count(t), E[Z²] = F₂ — reported beside the
    exact value. The sign functions are md5 hex-digit parities, so the
    estimate is deterministic and the whole operator hash-oracles, unlike
    textbook RNG-seeded AMS; at stream scale each Z_j is one running sum
    per sketch (constant memory), and sketches of shards ADD — the
    mergeability that makes F₂ monitoring free on a 100 TB feed.

    Scale shape: token census (one shuffle), then a 16-way sign grid over
    the vocabulary-sized count table — sketch cost is O(vocab × 16),
    independent of corpus size beyond the census."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(F.explode(F.split(F.expr("translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz')"), " ")).alias("t"))
    cnt = tok.groupBy("t").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    js = spark.range(_AMS_SKETCHES).select(F.col("id").cast("int").alias("j"))
    signs = cnt.crossJoin(F.broadcast(js)).select(
        "c",
        "j",
        F.when(
            F.substring(F.md5("t"), F.col("j") + 1, 1).isin(*list("02468ace")),
            1,
        )
        .otherwise(-1)
        .alias("s"),
    )
    est = signs.groupBy("j").agg(F.sum(F.col("s") * F.col("c")).alias("z"))
    exact = cnt.agg(F.sum(F.col("c") * F.col("c")).cast("bigint").alias("f2"))
    return est.agg(
        F.round(F.avg((F.col("z") * F.col("z")).cast("double")), 0)
        .cast("bigint")
        .alias("f2_estimate")
    ).crossJoin(F.broadcast(exact)).select(
        F.col("f2").alias("f2_exact"),
        "f2_estimate",
        F.lit(_AMS_SKETCHES).cast("bigint").alias("n_sketches"),
    )
