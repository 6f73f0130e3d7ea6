"""Wave 44: embedding centroid drift, cross-language vocab overlap.

  * ``vec_embedding_drift``: per-label centroid shift between the two
    halves of the corpus (by vec_id) — the embedding-space drift monitor
    a retraining trigger watches. Complements ``dq_drift_psi`` (feature
    histograms) with the vector-space view: centroid displacement and
    norm change per label.
  * ``llm_vocab_overlap_matrix``: pairwise Jaccard overlap of per-language
    top-200 vocabularies — how much subword sharing a joint tokenizer can
    exploit across languages. Pairs with ``llm_tokenizer_coverage``
    (what one frozen vocab misses) by showing which languages can share.

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

CAT_SIM = "2.J llm-pipeline (similarity)"
CAT_TEXT = "2.J llm-pipeline (text)"

DIMS = 64
VOCAB_TOP = 200


@register(
    "vec_embedding_drift",
    CAT_SIM,
    f"""
    WITH halves AS (
      SELECT label, vec_id % 2 AS half, embedding FROM embeddings
    ),
    comps AS (
      SELECT label, half, i AS dim, CAST(embedding[i] AS DOUBLE) AS v
      FROM (SELECT h.*, unnest(range(1, {DIMS + 1})) AS i FROM halves h)
    ),
    cents AS (
      SELECT label, half, dim, AVG(v) AS c, COUNT(*) AS n
      FROM comps GROUP BY label, half, dim
    ),
    paired AS (
      SELECT a.label, a.dim, a.c AS c0, b.c AS c1
      FROM cents a JOIN cents b
        ON a.label = b.label AND a.dim = b.dim
      WHERE a.half = 0 AND b.half = 1
    )
    SELECT label,
           ROUND(sqrt(SUM((c1 - c0) * (c1 - c0))), 4) AS centroid_shift,
           ROUND(sqrt(SUM(c0 * c0)), 4) AS norm_half0,
           ROUND(sqrt(SUM(c1 * c1)), 4) AS norm_half1,
           ROUND(SUM(c0 * c1)
                 / (sqrt(SUM(c0 * c0)) * sqrt(SUM(c1 * c1))), 4)
             AS centroid_cosine
    FROM paired GROUP BY label
    """,
)
def vec_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding drift monitor: split vectors into two cohorts (vec_id
    parity — the stand-in for before/after snapshots), compute per-label
    centroids in each, and report the displacement ‖c1−c0‖, both norms,
    and the centroid cosine. A label whose cosine sags or whose shift
    jumps is the one whose upstream encoder (or data mix) moved — the
    trigger for re-indexing the ANN structures built over these vectors.

    Scale shape: posexplode → (label, half, dim) aggregate — the
    llm_embed_stats plan with one extra key; the shuffle is bounded by
    labels × halves × dims aggregate states, never vector count."""
    em = load_table(spark, sf_dir, "embeddings")
    comps = em.select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode("embedding").alias("dim0", "v"),
    ).select(
        "label",
        "half",
        (F.col("dim0") + 1).alias("dim"),
        F.col("v").cast("double").alias("v"),
    )
    cents = comps.groupBy("label", "half", "dim").agg(F.avg("v").alias("c"))
    a = cents.filter(F.col("half") == 0).select(
        "label", "dim", F.col("c").alias("c0")
    )
    b = cents.filter(F.col("half") == 1).select(
        "label", "dim", F.col("c").alias("c1")
    )
    paired = a.join(b, ["label", "dim"])
    return paired.groupBy("label").agg(
        F.round(
            F.sqrt(F.sum((F.col("c1") - F.col("c0")) * (F.col("c1") - F.col("c0")))),
            4,
        ).alias("centroid_shift"),
        F.round(F.sqrt(F.sum(F.col("c0") * F.col("c0"))), 4).alias("norm_half0"),
        F.round(F.sqrt(F.sum(F.col("c1") * F.col("c1"))), 4).alias("norm_half1"),
        F.round(
            F.sum(F.col("c0") * F.col("c1"))
            / (
                F.sqrt(F.sum(F.col("c0") * F.col("c0")))
                * F.sqrt(F.sum(F.col("c1") * F.col("c1")))
            ),
            4,
        ).alias("centroid_cosine"),
    )


@register(
    "llm_vocab_overlap_matrix",
    CAT_TEXT,
    f"""
    WITH tok AS (
      SELECT lang, unnest(string_split(lower(text), ' ')) AS t
      FROM documents
    ),
    counts AS (SELECT lang, t, COUNT(*) AS c FROM tok GROUP BY lang, t),
    vocab AS (
      SELECT lang, t FROM (
        SELECT lang, t,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY c DESC, t ASC) AS rn
        FROM counts
      ) WHERE rn <= {VOCAB_TOP}
    ),
    pairs AS (
      SELECT a.lang AS lang_a, b.lang AS lang_b, COUNT(*)::BIGINT AS inter
      FROM vocab a JOIN vocab b ON a.t = b.t AND a.lang < b.lang
      GROUP BY a.lang, b.lang
    )
    SELECT lang_a, lang_b, inter,
           ROUND(inter / (2.0 * {VOCAB_TOP} - inter), 4) AS jaccard
    FROM pairs
    """,
)
def llm_vocab_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-language vocabulary overlap: per-language top-200 token sets
    (count-ranked, token tiebreak), then pairwise intersection + Jaccard
    (both sets have exactly VOCAB_TOP entries, so |A∪B| = 2k − |A∩B|).
    High-overlap language pairs share a tokenizer budget efficiently; a
    zero-overlap pair needs its own vocab slice — the evidence for
    per-script vocab allocation.

    Scale shape: counts shuffle once on (lang, token); the vocab is
    k×languages rows, so the pair join is tiny and token-keyed. Language
    pairs are quadratic in LANGUAGE COUNT only — never in data."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("lang", F.explode(F.split(F.lower("text"), " ")).alias("t"))
    counts = tok.groupBy("lang", "t").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("lang").orderBy(F.col("c").desc(), F.col("t").asc())
    vocab = (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= VOCAB_TOP)
        .select("lang", "t")
    )
    a = vocab.select(F.col("lang").alias("lang_a"), "t")
    b = vocab.select(F.col("lang").alias("lang_b"), "t")
    pairs = (
        a.join(b, "t")
        .filter(F.col("lang_a") < F.col("lang_b"))
        .groupBy("lang_a", "lang_b")
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    return pairs.select(
        "lang_a",
        "lang_b",
        "inter",
        F.round(F.col("inter") / (2.0 * VOCAB_TOP - F.col("inter")), 4).alias(
            "jaccard"
        ),
    )
