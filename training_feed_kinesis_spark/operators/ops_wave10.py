"""Wave 10: shard packing for payload export, deterministic epoch
shuffling.

  * ``multimodal_shard_pack``: WebDataset-style shard assignment —
    payloads packed in doc order into byte-budgeted shards via offset
    sharding (exclusive running byte offset div budget), with per-shard
    size and modality-mix accounting.
  * ``llm_epoch_shuffle``: reproducible per-epoch corpus shuffling —
    order and shard assignment derived from md5(epoch:doc), so every
    worker on any cluster derives the identical epoch order with zero
    coordination.

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

CAT_MM = "2.J llm-pipeline (multimodal)"
CAT_TEXT = "2.J llm-pipeline (text)"

_SHARD_BYTES = 50_000
_EPOCHS = 2


@register(
    "multimodal_shard_pack",
    CAT_MM,
    f"""
    WITH sized AS (
      SELECT doc_id, n_chars,
             CASE doc_id % 3 WHEN 0 THEN 'text' WHEN 1 THEN 'image'
                             ELSE 'audio' END AS modality,
             SUM(n_chars) OVER (ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING) AS off
      FROM documents WHERE doc_id IS NOT NULL
    )
    SELECT CAST(COALESCE(off, 0) // {_SHARD_BYTES} AS BIGINT) AS shard_id,
           COUNT(*)::BIGINT AS n_items,
           SUM(n_chars)::BIGINT AS shard_bytes,
           SUM(CASE WHEN modality = 'image' THEN 1 ELSE 0 END)::BIGINT
             AS n_image,
           MIN(doc_id)::BIGINT AS first_doc,
           MAX(doc_id)::BIGINT AS last_doc
    FROM sized GROUP BY 1
    """,
)
def multimodal_shard_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset-style shard packing: payloads (size hint = n_chars) are
    assigned to shards in doc order by OFFSET SHARDING — shard_id =
    exclusive running byte offset div budget. Deterministic, one-pass,
    and contiguous (each shard is a doc_id range, so the loader streams
    shards sequentially); a shard can overshoot the 50 KB budget by at
    most one trailing item, the usual tar-shard contract. Per-shard
    manifest reports size and modality mix for loader balancing.

    Scale shape: identical to ``llm_pack_chunks`` — the single ordered
    cumsum is the one global dependency, replaced at 100 TB by per-shard
    offsets + a driver-side prefix over shard totals; payload BYTES never
    shuffle (the manifest carries sizes, the tar writer streams files).

    NULL-PK r9: a doc with no id has no place in the id-ordered pack —
    and engines disagree on where NULLs sort."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull()
    ).select(
        "doc_id",
        "n_chars",
        F.when(F.col("doc_id") % 3 == 0, "text")
        .when(F.col("doc_id") % 3 == 1, "image")
        .otherwise("audio")
        .alias("modality"),
    )
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    sized = d.withColumn(
        "off", F.coalesce(F.sum("n_chars").over(w), F.lit(0))
    )
    return (
        sized.groupBy(
            (F.col("off") / _SHARD_BYTES).cast("long").alias("shard_id")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum("n_chars").cast("long").alias("shard_bytes"),
            F.sum(F.when(F.col("modality") == "image", 1).otherwise(0))
            .cast("long")
            .alias("n_image"),
            F.min("doc_id").cast("long").alias("first_doc"),
            F.max("doc_id").cast("long").alias("last_doc"),
        )
    )


@register(
    "llm_epoch_shuffle",
    CAT_TEXT,
    f"""
    WITH keyed AS (
      SELECT e.epoch, d.doc_id,
             md5(e.epoch::VARCHAR || ':' || d.doc_id::VARCHAR) AS k
      FROM documents d
      CROSS JOIN (SELECT unnest(range(0, {_EPOCHS})) AS epoch) e
    )
    SELECT epoch, substr(k, 1, 1) AS shard,
           COUNT(*)::BIGINT AS n_docs,
           MIN(k) AS head_key,
           (ARG_MIN(doc_id, k))::BIGINT AS head_doc
    FROM keyed GROUP BY epoch, substr(k, 1, 1)
    """,
)
def llm_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coordination-free epoch shuffling: epoch e's order is ORDER BY
    md5(e:doc_id) and its 16 shards are the key's first nibble — every
    loader worker on any cluster derives the identical permutation from
    (epoch, doc_id) alone, no shuffle service, no seed file, and each
    epoch's order is uncorrelated with the last. The manifest reports per
    (epoch, shard): doc count plus the head-of-shard key/doc (the order's
    checksummable fingerprint, asserted identical across engines).

    Scale shape: the shard assignment is a row-local hash; the per-shard
    aggregate is map-combinable. Actually ORDERING a shard at load time
    is a per-shard local sort — the global sort never happens anywhere."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    epochs = spark.range(_EPOCHS).select(F.col("id").cast("int").alias("epoch"))
    keyed = d.crossJoin(F.broadcast(epochs)).select(
        "epoch",
        "doc_id",
        F.md5(
            F.concat(
                F.col("epoch").cast("string"),
                F.lit(":"),
                F.col("doc_id").cast("string"),
            )
        ).alias("k"),
    )
    return keyed.groupBy("epoch", F.substring("k", 1, 1).alias("shard")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("k").alias("head_key"),
        F.min_by("doc_id", "k").cast("long").alias("head_doc"),
    )
