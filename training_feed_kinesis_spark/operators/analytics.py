"""Corpus- and time-series-analytics operators.

Training-data curation ops beyond SURVEY §2.J's dedup/similarity core:
cross-split contamination detection (the check every eval pipeline needs
before trusting a test split), unigram negative-log-likelihood scoring (the
cheap perplexity proxy used for corpus quality filtering), top-k n-gram
census, and two event-stream time-series ops (gap-filled hourly resample,
z-score anomaly flagging) a feed monitor runs on its own telemetry.

All five are pure DataFrame compositions (no UDFs) and DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table, parallelize, sane_ts, sane_ts_sql

CAT_TEXT = "2.J llm-pipeline (text)"
CAT_TS = "2.M workloads"

# 8-token shingles for contamination: long enough that word-salad docs do
# not collide by chance (3-shingles match ~100% of this corpus; 8-shingles
# match ~8%, measured), mirroring the 8-13-gram windows used in public
# decontamination pipelines.
_W = "split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ')"
# concat_ws over eight element_at lookups, not array_join(slice(...)):
# slice allocates a fresh 8-element array per position inside the lambda,
# element_at reads in place — measured ~17% faster warm at sf0.1
_SHINGLES8 = (
    "CASE WHEN size(w) >= 8 THEN "
    "array_distinct(transform(sequence(1, size(w) - 7), "
    "i -> concat_ws(' ', element_at(w,i), element_at(w,i+1), "
    "element_at(w,i+2), element_at(w,i+3), element_at(w,i+4), "
    "element_at(w,i+5), element_at(w,i+6), element_at(w,i+7)))) "
    "ELSE array() END"
)
_W_SQL = "string_split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ')"
# eight explicit element accesses, NOT array_to_string(w[i:i+7]):
# DuckDB's list slice inside the lambda is O(len(w)) per position —
# quadratic per document, 366 s on a corpus with 100 KB docs vs 2 s for
# this spelling (r12 payload campaign; the Spark side made the same
# slice-vs-element_at choice for its own reason above)
_SHINGLES8_SQL = (
    "list_distinct(list_transform(range(1, len(w) - 6), "
    "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || "
    "w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7]))"
)


def _shingle8_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, is_test, s) exploded distinct 8-shingles with the hash-based
    train/test split tag. Split by md5 prefix (SURVEY §2.L `split_train_test`
    idiom): reproducible on any engine/cluster, no RNG state.

    parallelize() before the shingle stage (r12, guide §2.5 input skew /
    §1.2 distributed-algorithm first): the 8×element_at concat per token
    position is the expensive map work of both consumers, and a
    single-row-group parquet input scans as ONE split — without the
    repartition the whole shingle build runs on one core while the rest
    idle (measured: llm_contamination 1.74 s → 0.79 s at sf0.1 on
    local[32]). At real scale the input arrives in hundreds of splits and
    the repartition is a no-op; results are unchanged (round-robin
    placement feeds only exact, order-insensitive count/distinct/join
    aggregation downstream)."""
    d = parallelize(load_table(spark, sf_dir, "documents"))
    return (
        d.select(
            "doc_id",
            F.expr(_W).alias("w"),
            (
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) >= "d0"
            ).alias("is_test"),
        )
        .select("doc_id", "is_test", F.explode(F.expr(_SHINGLES8)).alias("s"))
    )


_SH8_SQL = f"""
  WITH t AS (SELECT doc_id, {_W_SQL} AS w,
                    substr(md5(doc_id::VARCHAR), 1, 2) >= 'd0' AS is_test
             FROM documents),
  sh AS (SELECT doc_id, is_test, unnest({_SHINGLES8_SQL}) AS s
         FROM t WHERE len(w) >= 8)
"""


@register(
    "llm_contamination",
    CAT_TEXT,
    _SH8_SQL
    + """
    SELECT a.doc_id, COUNT(*) AS n_shared
    FROM sh a JOIN (SELECT DISTINCT s FROM sh WHERE NOT is_test) b
      ON a.s = b.s
    WHERE a.is_test
    GROUP BY a.doc_id
    """,
)
def llm_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train→test contamination: test-split docs sharing ≥1 distinct
    8-token shingle with any train-split doc, with the shared-shingle count.

    The train side reduces to DISTINCT shingles before the join — the
    membership probe never carries doc ids, so the shuffle key is the
    shingle alone and hot shingles don't fan out train-side. The 100 TB
    spelling is executable behind ``TFK_HASH_SHINGLES=1``: the ~50-byte
    string shingle is xxhash64-ed to an 8-byte BIGINT before the
    distinct/semi-join, cutting shuffle volume ~6× with identical results
    unless two DISTINCT corpus shingles collide in 64 bits (≈n²/2⁶⁵ —
    negligible even at 10¹² shingles, and the standard production
    tradeoff). Equivalence is asserted by
    tests/test_consistency.py::test_contamination_hashed_shingles_equivalent;
    the flag stays off for driver runs only because xxhash64 has no DuckDB
    twin, which would forfeit the string-key oracle.
    """
    import os

    sh = _shingle8_rows(spark, sf_dir)
    if os.environ.get("TFK_HASH_SHINGLES") == "1":
        sh = sh.select("doc_id", "is_test", F.xxhash64("s").alias("s"))
    train = sh.filter(~F.col("is_test")).select("s").distinct()
    return (
        sh.filter(F.col("is_test"))
        .join(train, "s", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


@register(
    "llm_unigram_logprob",
    CAT_TEXT,
    """
    WITH tok AS (SELECT doc_id, unnest(string_split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ')) AS t
                 FROM documents),
    cnt AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY t),
    tot AS (SELECT SUM(c)::DOUBLE AS n FROM cnt)
    SELECT doc_id, COUNT(*) AS n_tokens,
           ROUND(AVG(-ln(c::DOUBLE / n)), 4) AS avg_nll
    FROM tok JOIN cnt USING (t), tot
    GROUP BY doc_id
    """,
)
def llm_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document average negative log-likelihood under the corpus's own
    unigram MLE — the standard cheap perplexity proxy for quality filtering
    (high avg_nll = rare-token-heavy documents).

    Two aggregates over one exploded token relation: corpus counts (small —
    vocabulary-sized — so the count table broadcasts back onto the token
    stream), and the per-doc average. The corpus total is a broadcast
    1-row scalar. At 100 TB the vocab table is the only state that must fit
    per-executor; for open vocabularies it would be frequency-truncated
    with an <unk> bucket.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.expr("translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz')"), " ")).alias("t")
    )
    cnt = tok.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.agg(F.sum("c").cast("double").alias("n"))
    return (
        tok.join(F.broadcast(cnt), "t")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(-F.log(F.col("c").cast("double") / F.col("n"))), 4).alias(
                "avg_nll"
            ),
        )
    )


@register(
    "llm_bigram_topk",
    CAT_TEXT,
    """
    WITH tok AS (SELECT {w} AS w FROM documents),
    bg AS (SELECT unnest(list_transform(range(1, len(w)),
                  i -> w[i] || ' ' || w[i+1])) AS bigram
           FROM tok WHERE len(w) >= 2)
    SELECT bigram, COUNT(*) AS n
    FROM bg GROUP BY bigram
    ORDER BY n DESC, bigram ASC
    LIMIT 20
    """.format(w=_W_SQL),
)
def llm_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 corpus bigrams — the n-gram census behind stop-phrase lists
    and boilerplate detection. Generate evaluates the bigram transform
    inline under the explode; the count is a two-phase hash aggregate and
    the top-20 is TakeOrderedAndProject (no global sort), deterministic via
    the bigram tiebreak.
    """
    d = load_table(spark, sf_dir, "documents")
    bigrams = (
        "CASE WHEN size(w) >= 2 THEN transform(sequence(1, size(w) - 1), "
        "i -> concat_ws(' ', element_at(w, i), element_at(w, i+1))) "
        "ELSE array() END"
    )
    return (
        d.select(F.expr(_W).alias("w"))
        .select(F.explode(F.expr(bigrams)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("bigram").asc())
        .limit(20)
    )


# hourly grid substrate: gated on the temporal admission contract
# (tables.sane_ts, r12 campaign) — its consumers materialize per-user
# [min, max] grids and z-score spans, where one year-0001/9999 sentinel
# event explodes the grid by 8 decamillennia of hours
_HOURLY_SQL = f"""
  WITH hourly AS (SELECT user_id, date_trunc('hour', ts) AS h, COUNT(*) AS n
                  FROM events WHERE {sane_ts_sql('ts')}
                  GROUP BY user_id, date_trunc('hour', ts))
"""


def _hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(sane_ts("ts"))
    return ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("n"))


@register(
    "ts_resample_gapfill",
    CAT_TS,
    _HOURLY_SQL
    + """,
    span AS (SELECT user_id, MIN(h) AS h0, MAX(h) AS h1
             FROM hourly GROUP BY user_id),
    grid AS (SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
             FROM span)
    SELECT g.user_id, g.h, COALESCE(n, 0) AS n_events
    FROM grid g LEFT JOIN hourly hr
      ON g.user_id IS NOT DISTINCT FROM hr.user_id AND g.h = hr.h
    """,
)
def ts_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample with zero-filled gaps over each user's active span —
    the dense regular series downstream forecasting/monitoring expects.

    JOINLESS spelling (round 5): each observed hour looks at the NEXT
    observed hour via ``lead`` and explodes its own gap interval
    [h, next−1h] — its count at position 0, zeros after. The union of the
    intervals is exactly the [min, max] per-user grid, so the result is
    identical to the generate-grid + left-join spelling (the oracle keeps
    that spelling), but nothing grid-sized ever shuffles: the only wide
    ops are the hourly aggregate and one user_id window over the
    ALREADY-AGGREGATED rows; the 10×-larger dense output is produced by a
    narrow explode after the window. The previous spelling shuffled the
    generated grid a second time for the gap-fill join — at 100 TB that
    join moves users × span-hours rows; this moves only observed hours.
    Rows out ≤ users × span-hours regardless of event count, as before.
    """
    from pyspark.sql.window import Window

    hourly = _hourly(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("h")
    gapped = hourly.withColumn("nxt", F.lead("h").over(w)).select(
        "user_id",
        "n",
        F.expr(
            "CASE WHEN nxt IS NULL THEN array(h)"
            " ELSE sequence(h, nxt - INTERVAL 1 HOUR, INTERVAL 1 HOUR) END"
        ).alias("hs"),
    )
    return gapped.select(
        "user_id", "n", F.posexplode("hs").alias("i", "h")
    ).select(
        "user_id",
        "h",
        F.when(F.col("i") == 0, F.col("n")).otherwise(F.lit(0)).alias(
            "n_events"
        ),
    )


@register(
    "ts_anomaly_zscore",
    CAT_TS,
    _HOURLY_SQL
    + """,
    stats AS (SELECT user_id, AVG(n::DOUBLE) AS mu,
                     STDDEV_SAMP(n::DOUBLE) AS sd
              FROM hourly GROUP BY user_id)
    SELECT h.user_id, h.h, h.n AS n_events
    FROM hourly h JOIN stats USING (user_id)
    WHERE sd IS NOT NULL AND sd > 0 AND h.n > mu + 2 * sd
    """,
)
def ts_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity anomalies: hours whose event count exceeds that
    user's mean + 2σ over its hourly series — self-join of the hourly
    aggregate with its own per-user statistics.

    Both sides derive from one shuffle on user_id (AQE reuses the
    exchange); the stats side is one row per user. Threshold comparison is
    strict-greater on a continuous value, so engine ulp differences cannot
    flip membership except on exact-boundary counts (not present in this
    corpus; a production pipeline would round the threshold).
    """
    hourly = _hourly(spark, sf_dir)
    stats = hourly.groupBy(F.col("user_id").alias("su")).agg(
        F.avg(F.col("n").cast("double")).alias("mu"),
        F.stddev_samp(F.col("n").cast("double")).alias("sd"),
    )
    return (
        hourly.join(stats, hourly.user_id == F.col("su"))
        .filter(
            F.col("sd").isNotNull()
            & (F.col("sd") > 0)
            & (F.col("n") > F.col("mu") + 2 * F.col("sd"))
        )
        .select("user_id", "h", F.col("n").alias("n_events"))
    )


@register(
    "llm_bigram_pmi",
    CAT_TEXT,
    """
    WITH tok AS (SELECT doc_id, {w} AS w FROM documents),
    uni AS (
      SELECT t, COUNT(*) AS c FROM (
        SELECT unnest(w) AS t FROM tok) GROUP BY t),
    n_uni AS (SELECT SUM(c)::DOUBLE AS n FROM uni),
    bg AS (
      SELECT t1, t2, COUNT(*) AS c12 FROM (
        SELECT w[i] AS t1, w[i+1] AS t2
        FROM tok, UNNEST(range(1, len(w))) AS r(i)
        WHERE len(w) >= 2) GROUP BY t1, t2),
    n_bg AS (SELECT SUM(c12)::DOUBLE AS nb,
                    CAST(SUM(c12) AS BIGINT) AS nb_i FROM bg),
    scored AS (
      SELECT t1 || ' ' || t2 AS bigram, c12,
             ROUND(ln((c12 / nb) / ((u1.c / n) * (u2.c / n))), 4) AS pmi
      FROM bg, n_bg, n_uni
      JOIN uni u1 ON t1 = u1.t
      JOIN uni u2 ON t2 = u2.t
      WHERE c12 >= GREATEST(5, nb_i // 10000))
    SELECT bigram, c12, pmi
    FROM scored
    ORDER BY pmi DESC, bigram ASC
    LIMIT 20
    """.format(w=_W_SQL),
)
def llm_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top-20 bigrams by pointwise mutual information
    (PMI = ln P(xy) / P(x)P(y)) with a count floor — the statistic that
    separates real phrases from frequency artifacts, used for tokenizer
    merge candidates and boilerplate phrase lists.

    The floor is SCALE-AWARE: ``GREATEST(5, nb_i DIV 10000)`` where
    ``nb_i`` is the total bigram count, so every scale factor exercises
    the PMI scoring (a fixed floor of 50 sat exactly at the sf0.01
    distribution knee and made the driver check vacuous — VERDICT r5).
    The floor divides an INTEGER total on both engines (DuckDB ``//`` and
    Spark ``DIV`` both truncate non-negatives); a DOUBLE->INT cast here
    would diverge because DuckDB rounds that cast while Spark truncates.

    Three aggregates over one tokenized relation (unigram counts, bigram
    counts, totals); the unigram table is vocabulary-sized and broadcasts
    onto the bigram stream; ranking is on the ROUNDED pmi with a bigram
    tiebreak (SURVEY §5.3.5) via TakeOrderedAndProject. The floor filter
    sits directly above the bigram aggregate (one 1-row broadcast below
    it), so the vocabulary^2-bounded bigram table is pruned before the
    unigram joins — the plan shape that survives a 100 TB corpus.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(F.expr(_W).alias("w"))
    uni = (
        tok.select(F.explode("w").alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n_uni = uni.agg(F.sum("c").cast("double").alias("n"))
    bigrams = (
        "CASE WHEN size(w) >= 2 THEN transform(sequence(1, size(w) - 1), "
        "i -> struct(element_at(w, i) AS t1, element_at(w, i+1) AS t2)) "
        "ELSE array() END"
    )
    n_bg = (
        tok.select(
            F.greatest(F.expr("size(w) - 1"), F.lit(0)).alias("k")
        ).agg(
            F.sum("k").cast("double").alias("nb"),
            F.sum("k").cast("bigint").alias("nb_i"),
        )
    )
    bg = (
        tok.select(F.explode(F.expr(bigrams)).alias("p"))
        .select("p.t1", "p.t2")
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .crossJoin(F.broadcast(n_bg))
        .filter(F.col("c12") >= F.expr("GREATEST(5, nb_i DIV 10000)"))
    )
    u1 = uni.select(F.col("t").alias("t1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("t").alias("t2"), F.col("c").alias("c2"))
    return (
        bg.join(F.broadcast(u1), "t1")
        .join(F.broadcast(u2), "t2")
        .crossJoin(F.broadcast(n_uni))
        .select(
            F.concat_ws(" ", "t1", "t2").alias("bigram"),
            "c12",
            F.round(
                F.log(
                    (F.col("c12") / F.col("nb"))
                    / ((F.col("c1") / F.col("n")) * (F.col("c2") / F.col("n")))
                ),
                4,
            ).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), F.col("bigram").asc())
        .limit(20)
    )


@register(
    "llm_curation_waterfall",
    CAT_TEXT,
    _SH8_SQL
    + """,
    contaminated AS (
      SELECT DISTINCT a.doc_id
      FROM sh a JOIN (SELECT DISTINCT s FROM sh WHERE is_test) b ON a.s = b.s
      WHERE NOT a.is_test),
    s0 AS (SELECT doc_id, lang, text,
                  string_split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ') AS w,
                  substr(md5(doc_id::VARCHAR), 1, 2) < 'd0' AS is_train
           FROM documents),
    s1 AS (SELECT * FROM s0
           WHERE len(w) >= 20
             AND len(list_distinct(w))::DOUBLE / len(w) >= 0.3),
    s2 AS (SELECT * FROM s1
           WHERE doc_id IN (SELECT MIN(doc_id) FROM s1
                            GROUP BY md5(translate(trim(text, ' '), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz')))),
    s3 AS (SELECT * FROM s2
           WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
    s4 AS (SELECT * FROM s3 WHERE is_train)
    SELECT 'raw' AS stage, (SELECT COUNT(*) FROM s0) AS n_docs
    UNION ALL SELECT 'quality_gate', (SELECT COUNT(*) FROM s1)
    UNION ALL SELECT 'exact_dedup', (SELECT COUNT(*) FROM s2)
    UNION ALL SELECT 'decontaminated', (SELECT COUNT(*) FROM s3)
    UNION ALL SELECT 'train_split', (SELECT COUNT(*) FROM s4)
    """,
)
def llm_curation_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The capstone composite: a full training-corpus curation run —
    quality gates (length + type-token ratio), exact dedup (first doc per
    normalized-text hash), decontamination (drop train docs sharing an
    8-shingle with the held-out split), train-split selection — reported
    as the per-stage survivor waterfall every data curator reads first.

    Each stage composes operators registered individually
    (llm_quality_score / llm_dedup_exact / llm_contamination /
    split_train_test patterns); the waterfall proves the COMPOSITION.
    Single-pass spelling: every stage becomes a boolean FLAG on one scan
    (quality gate row-local; dedup-keeper via min-doc_id window over the
    text hash — only (h, doc_id, q) shuffle, never the text payload;
    contamination via the shingle probe joined back on doc_id), and the
    five survivor counts fall out of ONE conditional aggregate + stack.
    At 100 TB that is one narrow shuffle + the probe instead of five
    replicated lineages.
    """
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        F.md5(F.expr("translate(trim(text), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz')")).alias("h"),
        F.expr(_W).alias("w"),
        (F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "d0").alias(
            "is_train"
        ),
    ).select(
        "doc_id",
        "h",
        "is_train",
        (
            (F.size("w") >= 20)
            & (
                F.size(F.array_distinct("w")).cast("double") / F.size("w")
                >= 0.3
            )
        ).alias("q"),
    )
    # dedup keeper among quality survivors: smallest doc_id per text hash
    keep = F.col("q") & (
        F.col("doc_id")
        == F.min(F.when(F.col("q"), F.col("doc_id"))).over(Window.partitionBy("h"))
    )
    sh = _shingle8_rows(spark, sf_dir)
    test_shingles = sh.filter(F.col("is_test")).select("s").distinct()
    contaminated = (
        sh.filter(~F.col("is_test"))
        .join(test_shingles, "s", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("contam", F.lit(True))
    )
    flags = (
        base.withColumn("keep", keep)
        .join(F.broadcast(contaminated), "doc_id", "left")
        .select(
            "q",
            "keep",
            "is_train",
            F.coalesce("contam", F.lit(False)).alias("contam"),
        )
    )
    counts = flags.agg(
        F.count(F.lit(1)).alias("n0"),
        F.count_if(F.col("q")).alias("n1"),
        F.count_if(F.col("keep")).alias("n2"),
        F.count_if(F.col("keep") & ~F.col("contam")).alias("n3"),
        F.count_if(F.col("keep") & ~F.col("contam") & F.col("is_train")).alias(
            "n4"
        ),
    )
    return counts.selectExpr(
        "stack(5, 'raw', n0, 'quality_gate', n1, 'exact_dedup', n2, "
        "'decontaminated', n3, 'train_split', n4) AS (stage, n_docs)"
    )
