"""Wave 21: quality-gate agreement, best-of-n selection.

  * ``llm_judge_kappa``: Cohen's κ between two independent quality
    gates — the judge-agreement statistic that says whether two cheap
    filters are measuring the same thing (κ≈1) or should both be kept
    (κ≈0 ⇒ complementary signal).
  * ``llm_best_of_n``: rejection-sampling / best-of-n selection — keep
    the highest-scoring candidate per group, with the kept-vs-rejected
    margin distribution (the statistic that says whether n was large
    enough).

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

CAT = "2.J llm-pipeline (text)"


@register(
    "llm_judge_kappa",
    CAT,
    """
    WITH gates AS (
      SELECT doc_id,
             CASE WHEN len(string_split(lower(text), ' ')) >= 20
                  THEN 1 ELSE 0 END AS g_len,
             CASE WHEN len(list_distinct(string_split(lower(text), ' ')))::DOUBLE
                       / len(string_split(lower(text), ' ')) >= 0.3
                  THEN 1 ELSE 0 END AS g_ttr
      FROM documents
    ),
    m AS (
      SELECT COUNT(*)::DOUBLE AS n,
             SUM(CASE WHEN g_len = 1 AND g_ttr = 1 THEN 1 ELSE 0 END)::DOUBLE
               AS both_pass,
             SUM(CASE WHEN g_len = 0 AND g_ttr = 0 THEN 1 ELSE 0 END)::DOUBLE
               AS both_fail,
             SUM(g_len)::DOUBLE AS len_pass,
             SUM(g_ttr)::DOUBLE AS ttr_pass
      FROM gates
    )
    SELECT n::BIGINT AS n_docs,
           ROUND((both_pass + both_fail) / n, 4) AS p_observed,
           ROUND((len_pass / n) * (ttr_pass / n)
                 + (1 - len_pass / n) * (1 - ttr_pass / n), 4) AS p_expected,
           ROUND(((both_pass + both_fail) / n
                  - ((len_pass / n) * (ttr_pass / n)
                     + (1 - len_pass / n) * (1 - ttr_pass / n)))
                 / NULLIF(1 - ((len_pass / n) * (ttr_pass / n)
                               + (1 - len_pass / n) * (1 - ttr_pass / n)), 0),
                 4) AS kappa
    FROM m
    """,
)
def llm_judge_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's κ between the length gate (≥20 tokens) and the TTR gate
    (≥0.3): observed agreement corrected for chance agreement. κ near 1
    ⇒ the gates are redundant (drop one); κ near 0 ⇒ they catch
    different failure modes (keep both). The same statistic scores
    LLM-judge vs heuristic agreement when labels replace gates.

    Scale shape: both gate bits are row-local; everything reduces to one
    wide combinable aggregate — a constant-size report at any corpus
    size."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), " ")
    gates = d.select(
        F.when(F.size(toks) >= 20, 1).otherwise(0).alias("g_len"),
        F.when(
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks) >= 0.3,
            1,
        )
        .otherwise(0)
        .alias("g_ttr"),
    )
    m = gates.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(
            F.when((F.col("g_len") == 1) & (F.col("g_ttr") == 1), 1).otherwise(0)
        )
        .cast("double")
        .alias("both_pass"),
        F.sum(
            F.when((F.col("g_len") == 0) & (F.col("g_ttr") == 0), 1).otherwise(0)
        )
        .cast("double")
        .alias("both_fail"),
        F.sum("g_len").cast("double").alias("len_pass"),
        F.sum("g_ttr").cast("double").alias("ttr_pass"),
    )
    po = (F.col("both_pass") + F.col("both_fail")) / F.col("n")
    pe = (F.col("len_pass") / F.col("n")) * (F.col("ttr_pass") / F.col("n")) + (
        1 - F.col("len_pass") / F.col("n")
    ) * (1 - F.col("ttr_pass") / F.col("n"))
    return m.select(
        F.col("n").cast("long").alias("n_docs"),
        F.round(po, 4).alias("p_observed"),
        F.round(pe, 4).alias("p_expected"),
        F.round((po - pe) / F.nullif(1 - pe, F.lit(0.0)), 4).alias("kappa"),
    )


@register(
    "llm_best_of_n",
    CAT,
    """
    WITH scored AS (
      SELECT doc_id, source,
             len(list_distinct(string_split(lower(text), ' ')))::DOUBLE
               / len(string_split(lower(text), ' '))
               * ln(1 + n_chars) AS score
      -- an id-less document cannot be elected kept_doc (r10 max-tie
      -- sweep: a NULL-id row tying its redelivered twin on score made
      -- the winner engine-dependent; the identity discipline of the
      -- r9 NULL-PK campaign applies to elections too)
      FROM documents WHERE doc_id IS NOT NULL
    ),
    ranked AS (
      SELECT source, doc_id, score,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY score DESC, doc_id ASC) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS n_cands,
             MAX(score) OVER (PARTITION BY source) AS best,
             AVG(score) OVER (PARTITION BY source) AS mean_score
      FROM scored
    )
    SELECT source,
           doc_id::BIGINT AS kept_doc,
           n_cands::BIGINT AS n_candidates,
           ROUND(score, 4) AS kept_score,
           ROUND(best - mean_score, 4) AS selection_gain
    FROM ranked WHERE rn = 1
    """,
)
def llm_best_of_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-of-n (rejection sampling) selection: per source group, keep
    the candidate maximizing a composite score (TTR × log-length), and
    report the selection gain (best − group mean). The gain is the
    statistic that prices n: once marginal gain flattens, more
    candidates buy nothing — the same accounting as best-of-n over model
    samples with a reward score.

    Scale shape: one window pass per group key (score is row-local); the
    kept rows plus gains come from the same sort — no second pass, no
    join. Id-less documents are excluded on both engines (r10 max-tie
    sweep): kept_doc is a doc_id citation."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull()
    )
    toks = F.split(F.lower("text"), " ")
    scored = d.select(
        "doc_id",
        "source",
        (
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
            * F.log(1 + F.col("n_chars"))
        ).alias("score"),
    )
    wp = Window.partitionBy("source")
    wr = wp.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    ranked = scored.select(
        "source",
        "doc_id",
        "score",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n_cands"),
        F.max("score").over(wp).alias("best"),
        F.avg("score").over(wp).alias("mean_score"),
    )
    return ranked.filter(F.col("rn") == 1).select(
        "source",
        F.col("doc_id").cast("long").alias("kept_doc"),
        F.col("n_cands").cast("long").alias("n_candidates"),
        F.round("score", 4).alias("kept_score"),
        F.round(F.col("best") - F.col("mean_score"), 4).alias("selection_gain"),
    )
