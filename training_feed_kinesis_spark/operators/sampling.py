"""§2.L training-pipeline sampling: deterministic, reproducible data selection.

Hash-based sampling is THE scale pattern for training-data pipelines: a
`sample(fraction, seed)` draw is only reproducible within one engine/version/
partitioning, while `md5(key) < threshold` gives the SAME subset on any
engine, any cluster size, any day — which is what dataset cards and ablation
studies actually require. All ops here are pure built-in column expressions
(no shuffle beyond the final low-cardinality agg, no UDFs) and embarrassingly
parallel at 100 TB: the hash + compare runs inside whole-stage codegen over
the scan, and filters on the hash never block predicate pushdown of the
*other* predicates.

Portability note: md5 hex output is bit-identical in Spark and DuckDB, and
fixed-width lowercase hex compares lexicographically == numerically, so a
"keep if first-2-hex-chars < '1a'" filter (26/256 ≈ 10.16%) needs no
hex→int conversion on either engine.

Reference: empty checkout (SURVEY.md §0.1) — ops mandated by the
training-pipeline extension charter (BASELINE.json:6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

CAT = "2.L sampling"


def _bucket_col():
    """First two hex chars of md5(doc_id) — a uniform 256-way bucket."""
    return F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)


_BUCKET_SQL = "substr(md5(doc_id::VARCHAR), 1, 2)"


@register(
    "sample_hash",
    CAT,
    f"""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE {_BUCKET_SQL} < '1a'
    """,
)
def sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% corpus sample (md5 bucket < 0x1a → 26/256).

    At 100 TB this is a map-only scan: no shuffle, no state, and the subset
    is stable under repartitioning and re-runs — unlike df.sample(seed),
    whose draw depends on partition layout.
    """
    d = load_table(spark, sf_dir, "documents")
    return d.filter(_bucket_col() < "1a").select(
        "doc_id", "lang", "source", "n_chars"
    )


@register(
    "split_train_test",
    CAT,
    f"""
    SELECT CASE WHEN {_BUCKET_SQL} < 'cc' THEN 'train'
                WHEN {_BUCKET_SQL} < 'e6' THEN 'val'
                ELSE 'test' END                       AS split,
           lang,
           COUNT(*)                                   AS n_docs,
           ROUND(AVG(n_chars), 4)                     AS avg_chars
    FROM documents
    GROUP BY 1, 2
    """,
)
def split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (~80/10/10 by md5 bucket),
    profiled per language.

    The split column is a pure function of the row key, so the same document
    lands in the same split on every engine and every run — leakage-free by
    construction, with no split manifest to store or join at 100 TB.
    """
    d = load_table(spark, sf_dir, "documents")
    b = _bucket_col()
    split = (
        F.when(b < "cc", "train").when(b < "e6", "val").otherwise("test")
    ).alias("split")
    return (
        d.groupBy(split, "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
    )


@register(
    "corpus_mix",
    CAT,
    f"""
    SELECT lang,
           COUNT(*)                                        AS n_total,
           COUNT(*) FILTER (WHERE {_BUCKET_SQL} <
               CASE lang WHEN 'en' THEN 'g0'
                         WHEN 'zh' THEN '80'
                         WHEN 'fr' THEN '80'
                         ELSE '40' END)                    AS n_kept,
           ROUND(COUNT(*) FILTER (WHERE {_BUCKET_SQL} <
               CASE lang WHEN 'en' THEN 'g0'
                         WHEN 'zh' THEN '80'
                         WHEN 'fr' THEN '80'
                         ELSE '40' END) * 1.0 / COUNT(*), 4) AS kept_rate
    FROM documents
    GROUP BY lang
    """,
)
def corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified corpus reweighting: per-language deterministic sampling
    rates (en 100%, zh/fr 50%, others 25%), reported as kept/total per
    stratum.

    This is the "data mixture" stage of a training pipeline expressed as one
    map-side CASE over the hash bucket ('g0' sorts above every hex pair ⇒
    keep-all): no per-stratum passes, no sampleBy state, deterministic at any
    scale. Changing mixture weights = editing thresholds, not re-shuffling.
    """
    d = load_table(spark, sf_dir, "documents")
    b = _bucket_col()
    thr = (
        F.when(F.col("lang") == "en", "g0")
        .when(F.col("lang").isin("zh", "fr"), "80")
        .otherwise("40")
    )
    kept = F.sum(F.when(b < thr, 1).otherwise(0))
    return d.groupBy("lang").agg(
        F.count("*").alias("n_total"),
        kept.alias("n_kept"),
        F.round(kept * 1.0 / F.count("*"), 4).alias("kept_rate"),
    )


@register(
    "hist_doclen",
    CAT,
    """
    SELECT lang,
           CAST(FLOOR(n_chars / 200) * 200 AS BIGINT) AS len_bucket,
           COUNT(*)                                   AS n_docs,
           CAST(MIN(n_chars) AS BIGINT)               AS bucket_min,
           CAST(MAX(n_chars) AS BIGINT)               AS bucket_max
    FROM documents
    GROUP BY 1, 2
    """,
)
def hist_doclen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length histogram (fixed 200-char buckets) per language —
    the corpus-inspection primitive behind length-filter threshold tuning.

    Fixed-width bucketing is a map-side projection + low-cardinality hash
    agg: one shuffle of (lang, bucket) partials, no sort, no percentile
    state — unlike quantile-based histograms, this stays exact and cheap at
    100 TB.
    """
    d = load_table(spark, sf_dir, "documents")
    bucket = (F.floor(F.col("n_chars") / 200) * 200).cast("bigint")
    return d.groupBy("lang", bucket.alias("len_bucket")).agg(
        F.count("*").alias("n_docs"),
        F.min("n_chars").cast("bigint").alias("bucket_min"),
        F.max("n_chars").cast("bigint").alias("bucket_max"),
    )


@register(
    "sample_per_group",
    CAT,
    f"""
    SELECT doc_id, lang, sample_rank FROM (
      -- identity-hash sampling needs identity: md5(NULL) is NULL and
      -- the engines order the NULL hash group at opposite ends
      -- (NULL-PK r9)
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY lang
                 ORDER BY {_BUCKET_SQL.replace('1, 2', '1, 8')}, doc_id)
               AS sample_rank
      FROM documents WHERE doc_id IS NOT NULL
    ) WHERE sample_rank <= 20
    """,
)
def sample_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced fixed-N-per-stratum sample (20 docs per language), ordered
    by md5(doc_id) — a deterministic stand-in for per-group reservoir
    sampling: the hash order is uniform-random-like but reproducible on any
    engine and stable under repartitioning.

    Scale note: rank-over-hash needs a per-group sort, so at 100 TB with
    huge groups prefer a two-phase cut: threshold-filter on the hash first
    (cheap map-side over-sample to ~2N), then rank only the survivors —
    same result, sort input shrunk by orders of magnitude.
    """
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull()
    )
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8)
    w = Window.partitionBy("lang").orderBy(h, "doc_id")
    return (
        d.select("doc_id", "lang", F.row_number().over(w).alias("sample_rank"))
        .filter(F.col("sample_rank") <= 20)
    )
