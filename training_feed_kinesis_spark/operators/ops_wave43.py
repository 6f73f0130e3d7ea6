"""Wave 43: contamination n-gram-length sensitivity, dedup quality shift.

  * ``llm_contamination_ngram_decay``: contamination rate as a function
    of probe n-gram length (6/8/10/12 tokens) in one pass — the
    sensitivity study behind choosing llm_contamination's n: short
    probes over-flag (common phrases), long probes under-flag (miss
    paraphrase joins); the knee of this curve is the defensible n.
  * ``llm_dedup_quality_shift``: what exact dedup does to the quality
    distribution — per language, corpus-vs-survivor doc counts and mean
    TTR with the shift. Dedup that silently removes high-quality docs
    (templates are often HIGH-TTR) is a mixture bug this audit catches.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load_table, parallelize

CAT_TEXT = "2.J llm-pipeline (text)"
CAT_DEDUP = "2.J llm-pipeline (dedup)"

NGRAM_SIZES = (6, 8, 10, 12)
# train/test split: md5 hex-prefix threshold — ~81% train (same spelling
# as llm_feed_build_e2e's decontamination stage)
_TRAIN_SQL = "substring(md5(doc_id::VARCHAR), 1, 2) < 'd0'"


@register(
    "llm_contamination_ngram_decay",
    CAT_TEXT,
    f"""
    WITH base AS (
      SELECT doc_id, string_split(lower(text), ' ') AS w,
             {_TRAIN_SQL} AS is_train
      FROM documents
    ),
    sizes AS (SELECT unnest([{", ".join(str(n) for n in NGRAM_SIZES)}]) AS n),
    grams AS (
      SELECT doc_id, is_train, n,
             array_to_string(w[i:i+n-1], ' ') AS g
      FROM (SELECT b.doc_id, b.w, b.is_train, s.n,
                   unnest(range(1, len(w) - n + 2)) AS i
            FROM base b CROSS JOIN sizes s)
    ),
    test_g AS (SELECT DISTINCT n, g FROM grams WHERE NOT is_train),
    cont AS (
      SELECT DISTINCT tr.n, tr.doc_id
      FROM grams tr JOIN test_g tg ON tg.n = tr.n AND tg.g = tr.g
      WHERE tr.is_train
    ),
    train_total AS (
      SELECT COUNT(*)::DOUBLE AS t FROM base WHERE is_train
    )
    SELECT c.n AS ngram_len,
           COUNT(*)::BIGINT AS n_contaminated,
           CAST((SELECT t FROM train_total) AS BIGINT) AS n_train_docs,
           ROUND(COUNT(*) / (SELECT t FROM train_total), 4)
             AS contamination_rate
    FROM cont c GROUP BY c.n
    """,
)
def llm_contamination_ngram_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination-rate decay curve: flag a train doc as contaminated if
    it shares any word n-gram with the held-out split, for n in
    {6,8,10,12} simultaneously. The rate falls as n grows — where it
    stops falling steeply is where probes stop matching common phrasing
    and start matching true leakage; that knee justifies the production
    probe length.

    Scale shape: all four gram lengths explode off ONE tokenization (the
    text is split once); the probe join is shingle-keyed per n — the
    exact llm_contamination topology ×4, with the test side
    distinct-reduced before the join. At 100 TB the four probes would
    run as one pass too, since the explode is the same scan."""
    d = parallelize(load_table(spark, sf_dir, "documents"))
    base = d.select(
        "doc_id",
        F.split(F.lower("text"), " ").alias("w"),
        (
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "d0"
        ).alias("is_train"),
    )
    sizes = spark.createDataFrame([(n,) for n in NGRAM_SIZES], "n int")
    grams = (
        base.crossJoin(F.broadcast(sizes))
        .select(
            "doc_id",
            "is_train",
            "n",
            # guard: sequence(1, 0) would DESCEND ([1,0]) for docs shorter
            # than n — emit no grams instead, matching range(1, <=1) = []
            F.explode(
                F.expr(
                    "if(size(w) >= n, "
                    "transform(sequence(1, size(w) - n + 1), "
                    "i -> array_join(slice(w, i, n), ' ')), "
                    "array())"
                )
            ).alias("g"),
        )
    )
    test_g = grams.filter(~F.col("is_train")).select("n", "g").distinct()
    cont = (
        grams.filter(F.col("is_train"))
        .join(test_g, ["n", "g"], "left_semi")
        .select("n", "doc_id")
        .distinct()
    )
    train_total = base.filter(F.col("is_train")).agg(
        F.count(F.lit(1)).cast("double").alias("t")
    )
    return (
        cont.groupBy("n")
        .agg(F.count(F.lit(1)).cast("long").alias("n_contaminated"))
        .crossJoin(F.broadcast(train_total))
        .select(
            F.col("n").alias("ngram_len"),
            "n_contaminated",
            F.col("t").cast("long").alias("n_train_docs"),
            F.round(F.col("n_contaminated") / F.col("t"), 4).alias(
                "contamination_rate"
            ),
        )
    )


@register(
    "llm_dedup_quality_shift",
    CAT_DEDUP,
    """
    WITH scored AS (
      SELECT doc_id, lang,
             md5(lower(trim(text))) AS h,
             len(list_distinct(string_split(lower(text), ' ')))::DOUBLE
               / GREATEST(len(string_split(lower(text), ' ')), 1) AS ttr
      FROM documents
    ),
    keepers AS (
      SELECT doc_id, lang, ttr,
             doc_id = MIN(doc_id) OVER (PARTITION BY h) AS is_keeper
      FROM scored
    )
    SELECT lang,
           COUNT(*)::BIGINT AS n_before,
           CAST(SUM(CASE WHEN is_keeper THEN 1 ELSE 0 END) AS BIGINT)
             AS n_after,
           ROUND(AVG(ttr), 4) AS mean_ttr_before,
           ROUND(AVG(CASE WHEN is_keeper THEN ttr END), 4)
             AS mean_ttr_after,
           ROUND(AVG(CASE WHEN is_keeper THEN ttr END) - AVG(ttr), 4)
             AS ttr_shift
    FROM keepers GROUP BY lang
    """,
)
def llm_dedup_quality_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup quality-shift audit: exact dedup (min-id keeper per
    normalized content hash — the llm_dedup_exact rule) applied as a
    FLAG, then per-language before/after doc counts and mean TTR in one
    aggregate. A positive shift means duplicates were low-quality (good);
    a negative one means dedup is eating the high-quality tail (a
    boilerplate-heavy source where the template scores high) and the
    keeper election needs a quality term (llm_dedup_exact_best).

    Scale shape: one hash-keyed window for the keeper flag (the same
    single shuffle exact dedup pays anyway), then a low-cardinality
    aggregate — the audit costs nothing beyond the dedup itself."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), " ")
    scored = d.select(
        "doc_id",
        "lang",
        F.md5(F.lower(F.trim("text"))).alias("h"),
        (
            F.size(F.array_distinct(toks)).cast("double")
            / F.greatest(F.size(toks), F.lit(1))
        ).alias("ttr"),
    )
    wk = Window.partitionBy("h")
    keepers = scored.withColumn(
        "is_keeper", F.col("doc_id") == F.min("doc_id").over(wk)
    )
    keep_ttr = F.avg(F.when(F.col("is_keeper"), F.col("ttr")))
    return keepers.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_before"),
        F.sum(F.when(F.col("is_keeper"), 1).otherwise(0))
        .cast("long")
        .alias("n_after"),
        F.round(F.avg("ttr"), 4).alias("mean_ttr_before"),
        F.round(keep_ttr, 4).alias("mean_ttr_after"),
        F.round(keep_ttr - F.avg("ttr"), 4).alias("ttr_shift"),
    )
