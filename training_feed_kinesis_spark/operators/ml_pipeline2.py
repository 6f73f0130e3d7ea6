"""Fourth ML/pipeline wave: tokenizer training, evaluation-protocol and
embedding-hygiene operators for the training-data pipeline.

  * ``llm_bpe_merge_step``: one BPE training iteration — the weighted
    adjacent-symbol-pair census whose argmax is the next merge rule.
  * ``ml_kfold_assign``: deterministic md5 k-fold split with per-fold class
    balance census (the eval protocol that reproduces on any engine).
  * ``ml_pr_curve``: full precision-recall curve over score groups in
    exact integer arithmetic (companion to ml_auc_rank's ROC).
  * ``vec_norm_outliers``: embedding-norm MAD outliers per label — the
    degenerate-vector screen (collapsed/exploded norms) before training.
  * ``vec_dim_stats``: per-dimension mean/std/min/max — the feature-stats
    table a whitening or scaling stage broadcasts.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md §0.1);
capability surface reconstructed per SURVEY.md §2 and BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load_table, parallelize
from .ml_eval import _LABEL_SQL, _SCORE_SQL, _ratio4, _ratio4_duck

CAT_LLM = "2.J llm-pipeline"
CAT_ML = "2.L ML-relational"
CAT_VEC = "2.J llm-pipeline (similarity)"

N_FOLDS = 5
TOP_PAIRS = 10


@register(
    "llm_bpe_merge_step",
    CAT_LLM,
    f"""
    WITH words AS (
      SELECT tok, COUNT(*)::BIGINT AS cnt
      FROM (SELECT unnest(string_split(lower(trim(text)), ' ')) AS tok
            FROM documents)
      WHERE len(tok) >= 2 GROUP BY tok
    ),
    pairs AS (
      SELECT substring(tok, i, 2) AS pair, cnt, tok
      FROM (SELECT tok, cnt, unnest(range(1, len(tok))) AS i FROM words)
    ),
    census AS (
      SELECT pair, SUM(cnt)::BIGINT AS total_count,
             COUNT(DISTINCT tok)::BIGINT AS n_word_types
      FROM pairs GROUP BY pair
    )
    SELECT pair, total_count, n_word_types,
           ROW_NUMBER() OVER (ORDER BY total_count DESC, pair ASC) AS rank_pos
    FROM census
    ORDER BY total_count DESC, pair ASC LIMIT {TOP_PAIRS}
    """,
)
def llm_bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One byte-pair-encoding training iteration: tokenize the corpus into
    a word-frequency table, explode each word type into its adjacent
    character pairs ONCE, and weight each pair by the word's corpus count.
    The top pair is the next merge rule; iterating this query IS BPE
    training. Ranked on exact integer counts with a string tiebreak.

    Scale: the pair census runs over word TYPES (vocabulary), not corpus
    tokens — the word-count aggregation compresses 100 TB of text to a
    vocab-sized table before any per-character work happens.
    """
    d = parallelize(load_table(spark, sf_dir, "documents"))
    words = (
        d.select(
            F.explode(F.split(F.lower(F.trim(F.col("text"))), " ")).alias("tok")
        )
        .filter(F.length("tok") >= 2)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    pairs = words.select(
        F.explode(
            F.expr(
                "transform(sequence(1, char_length(tok) - 1), "
                "i -> substring(tok, i, 2))"
            )
        ).alias("pair"),
        "cnt",
        "tok",
    )
    census = pairs.groupBy("pair").agg(
        F.sum("cnt").alias("total_count"),
        F.countDistinct("tok").alias("n_word_types"),
    )
    w = Window.orderBy(F.col("total_count").desc(), F.col("pair").asc())
    return (
        census.withColumn("rank_pos", F.row_number().over(w))
        .orderBy(F.col("total_count").desc(), F.col("pair").asc())
        .limit(TOP_PAIRS)
    )


@register(
    "ml_kfold_assign",
    CAT_ML,
    f"""
    WITH folded AS (
      SELECT label,
             (strpos('0123456789abcdef',
                     substr(md5(vec_id::VARCHAR), 1, 1)) - 1) % {N_FOLDS}
               AS fold
      FROM embeddings
    )
    SELECT fold, label, COUNT(*)::BIGINT AS n,
           ROUND(COUNT(*)::DOUBLE
                 / SUM(COUNT(*)) OVER (PARTITION BY fold), 4) AS fold_share
    FROM folded GROUP BY fold, label
    """,
)
def ml_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold cross-validation assignment: fold = md5(id)
    mod k — reproducible on any engine/cluster/run (the same property as
    split_train_test, here k-way), with the per-(fold, label) census that
    checks class balance across folds. Share denominator is an exact
    integer window sum per fold.

    Scale: pure map + one combinable aggregate; the hash never shuffles
    raw features.
    """
    em = load_table(spark, sf_dir, "embeddings")
    fold = (
        (
            F.expr(
                "locate(substring(md5(cast(vec_id as string)), 1, 1),"
                " '0123456789abcdef') - 1"
            )
        )
        % N_FOLDS
    ).alias("fold")
    c = em.select(fold, "label").groupBy("fold", "label").agg(
        F.count(F.lit(1)).alias("n")
    )
    return c.select(
        "fold",
        "label",
        "n",
        F.round(
            F.col("n").cast("double")
            / F.sum("n").over(Window.partitionBy("fold")),
            4,
        ).alias("fold_share"),
    )


@register(
    "ml_pr_curve",
    CAT_ML,
    f"""
    WITH b AS (
      SELECT {_SCORE_SQL} AS score, {_LABEL_SQL} AS lab FROM lineitem
    ),
    g AS (
      SELECT score, COUNT(*)::BIGINT AS n, SUM(lab)::BIGINT AS p
      FROM b GROUP BY score
    ),
    c AS (
      SELECT score,
             CAST(SUM(p) OVER (ORDER BY score DESC
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS BIGINT) AS cum_tp,
             CAST(SUM(n - p) OVER (ORDER BY score DESC
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS BIGINT) AS cum_fp,
             SUM(p) OVER () AS total_pos
      FROM g
    )
    SELECT score, cum_tp, cum_fp,
           {_ratio4_duck('cum_tp', '(cum_tp + cum_fp)')} AS precision_at,
           {_ratio4_duck('cum_tp', 'total_pos')} AS recall_at
    FROM c
    """,
)
def ml_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision-recall curve: one point per distinct score threshold
    (predict positive when score ≥ t), cumulative TP/FP via descending
    windows over the score-GROUP table, precision and recall in exact
    BIGINT HALF_UP 4dp (no float midpoints). Companion to ml_auc_rank —
    same portable score, the ranking metric for imbalanced labels.

    Scale: identical shape to the AUC — the window runs over ≤97 score
    groups however large lineitem is.
    """
    li = load_table(spark, sf_dir, "lineitem")
    b = li.select(
        F.expr(_SCORE_SQL).alias("score"), F.expr(_LABEL_SQL).alias("lab")
    )
    g = b.groupBy("score").agg(
        F.count(F.lit(1)).alias("n"), F.sum("lab").alias("p")
    )
    w_desc = Window.orderBy(F.col("score").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = g.select(
        "score",
        F.sum("p").over(w_desc).alias("cum_tp"),
        F.sum(F.col("n") - F.col("p")).over(w_desc).alias("cum_fp"),
        F.sum("p").over(Window.partitionBy()).alias("total_pos"),
    )
    return c.select(
        "score",
        "cum_tp",
        "cum_fp",
        F.expr(_ratio4("cum_tp", "(cum_tp + cum_fp)")).alias("precision_at"),
        F.expr(_ratio4("cum_tp", "total_pos")).alias("recall_at"),
    )


_NORM_SPARK = (
    "sqrt(aggregate(embedding, 0D, "
    "(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
)
_NORM_DUCK = (
    "sqrt(list_sum(list_transform(embedding, "
    "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
)


@register(
    "vec_norm_outliers",
    CAT_VEC,
    f"""
    WITH norms AS (
      SELECT label, ROUND({_NORM_DUCK}, 4) AS nrm FROM embeddings
    ),
    med AS (
      SELECT label,
             percentile_cont(0.5) WITHIN GROUP (ORDER BY nrm) AS med
      FROM norms GROUP BY label
    ),
    dev AS (
      SELECT n.label, n.nrm, m.med, ABS(n.nrm - m.med) AS ad
      FROM norms n JOIN med m ON n.label = m.label
    ),
    mad AS (
      SELECT label,
             percentile_cont(0.5) WITHIN GROUP (ORDER BY ad) AS mad
      FROM dev GROUP BY label
    )
    SELECT d.label, COUNT(*)::BIGINT AS n_vectors,
           COUNT(*) FILTER (WHERE d.ad > 3 * 1.4826 * a.mad)::BIGINT
             AS n_outliers,
           ROUND(MAX(d.med), 4) AS median_norm,
           ROUND(MAX(a.mad), 4) AS mad_norm
    FROM dev d JOIN mad a ON d.label = a.label
    GROUP BY d.label
    """,
)
def vec_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-hygiene screen: per-label median norm + MAD, flagging
    vectors whose norm deviates > 3·1.4826·MAD (robust ≈3σ) — catches
    collapsed (near-zero) and exploded embeddings that poison cosine
    retrieval. Norms round to 4dp BEFORE the medians, so every downstream
    double is bit-identical cross-engine and the outlier threshold cannot
    flip.

    Scale: norms are one map pass; the medians run per label over the
    norm column only (exact percentile here; at petabyte row counts swap
    in approx_percentile and the same plan shape holds).
    """
    em = parallelize(load_table(spark, sf_dir, "embeddings"))
    norms = em.select(
        "label", F.round(F.expr(_NORM_SPARK), 4).alias("nrm")
    )
    med = norms.groupBy("label").agg(
        F.expr("percentile(nrm, 0.5)").alias("med")
    )
    dev = norms.join(med, "label").select(
        "label", "nrm", "med", F.abs(F.col("nrm") - F.col("med")).alias("ad")
    )
    mad = dev.groupBy("label").agg(F.expr("percentile(ad, 0.5)").alias("mad"))
    return (
        dev.join(mad, "label")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.count(
                F.when(F.col("ad") > 3 * 1.4826 * F.col("mad"), 1)
            ).alias("n_outliers"),
            F.round(F.max("med"), 4).alias("median_norm"),
            F.round(F.max("mad"), 4).alias("mad_norm"),
        )
    )


@register(
    "vec_dim_stats",
    CAT_VEC,
    """
    SELECT pos,
           ROUND(AVG(CAST(embedding[pos] AS DOUBLE)), 4) AS dim_mean,
           ROUND(stddev_samp(CAST(embedding[pos] AS DOUBLE)), 4) AS dim_std,
           ROUND(MIN(CAST(embedding[pos] AS DOUBLE)), 4) AS dim_min,
           ROUND(MAX(CAST(embedding[pos] AS DOUBLE)), 4) AS dim_max
    FROM embeddings, (SELECT unnest(range(1, 65)) AS pos)
    GROUP BY pos
    """,
)
def vec_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension feature statistics (mean/std/min/max over the 64
    embedding dims) — the broadcast table behind whitening, min-max
    scaling, and dead-dimension detection (std≈0). Same posexplode shape
    as llm_embed_stats: the shuffle carries 64 aggregate states, never
    vectors.
    """
    em = parallelize(load_table(spark, sf_dir, "embeddings"))
    x = em.select(F.posexplode("embedding").alias("pos0", "x")).select(
        (F.col("pos0") + 1).cast("bigint").alias("pos"),
        F.col("x").cast("double").alias("x"),
    )
    return x.groupBy("pos").agg(
        F.round(F.avg("x"), 4).alias("dim_mean"),
        F.round(F.stddev_samp("x"), 4).alias("dim_std"),
        F.round(F.min("x"), 4).alias("dim_min"),
        F.round(F.max("x"), 4).alias("dim_max"),
    )
