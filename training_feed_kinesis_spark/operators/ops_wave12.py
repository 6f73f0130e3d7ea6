"""Wave 12: paragraph-block dedup, incremental corpus dedup.

  * ``llm_dedup_paragraph``: block-level (paragraph) exact dedup — the
    Dolma/RefinedWeb pass that removes repeated boilerplate blocks even
    when whole documents differ. Fixture text has no newlines, so a
    "paragraph" is a 20-token block (same plumbing, substitute splitter).
  * ``llm_dedup_incremental``: new-batch-vs-index dedup — the daily
    ingest shape: incoming docs are checked against the existing
    corpus's hash index (anti join) AND deduplicated within the batch,
    without ever rescanning the old corpus text.

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

CAT = "2.J llm-pipeline (dedup)"

_BLOCK = 20   # tokens per paragraph-block
# hash-split: ~3/4 of docs form the existing corpus index, ~1/4 arrive as
# the new batch — scale-factor independent (an id threshold would leave the
# batch empty at small sf)
_BATCH_NIBBLES = "cdef"


@register(
    "llm_dedup_paragraph",
    CAT,
    f"""
    WITH blocks AS (
      SELECT doc_id, bi,
             md5(array_to_string(w[(bi * {_BLOCK} + 1):((bi + 1) * {_BLOCK})],
                                 ' ')) AS bh
      FROM (
        SELECT doc_id, w, unnest(range(0, (len(w) - 1) // {_BLOCK} + 1)) AS bi
        FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
              FROM documents)
      )
    ),
    freq AS (
      SELECT bh, COUNT(*) AS n_occ,
             MIN(doc_id * 1000 + bi)::BIGINT AS keeper
      FROM blocks GROUP BY bh
    )
    SELECT b.doc_id,
           COUNT(*)::BIGINT AS n_blocks,
           SUM(CASE WHEN f.n_occ > 1
                     AND b.doc_id * 1000 + b.bi != f.keeper
                    THEN 1 ELSE 0 END)::BIGINT AS n_dropped,
           ROUND(SUM(CASE WHEN f.n_occ > 1
                           AND b.doc_id * 1000 + b.bi != f.keeper
                          THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 4)
             AS drop_ratio
    FROM blocks b JOIN freq f ON f.bh = b.bh
    GROUP BY b.doc_id
    """,
)
def llm_dedup_paragraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-block dedup accounting: documents split into 20-token
    blocks, block occurrences counted corpus-wide, and every repeat
    beyond the global keeper (first occurrence in (doc, block) order)
    marked dropped. Reports per document the block count, dropped-block
    count and drop ratio — the Dolma-style pass that strips repeated
    boilerplate blocks while keeping each document's unique remainder.

    Scale shape: blocks explode row-local (bounded by doc length / 20);
    the ONLY shuffle key is the 16-byte block hash (uniform), and the
    keeper election is part of the same hash aggregate — text never
    shuffles; the drop decision joins back on the hash."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower("text"), " ").alias("w")
    )
    blocks = d.select(
        "doc_id",
        F.explode(
            F.expr(f"sequence(0, cast((size(w) - 1) div {_BLOCK} AS int))")
        ).alias("bi"),
        "w",
    ).select(
        "doc_id",
        "bi",
        F.md5(
            F.expr(f"array_join(slice(w, bi * {_BLOCK} + 1, {_BLOCK}), ' ')")
        ).alias("bh"),
    )
    freq = blocks.groupBy("bh").agg(
        F.count(F.lit(1)).alias("n_occ"),
        F.min(F.col("doc_id") * 1000 + F.col("bi")).cast("long").alias("keeper"),
    )
    dropped = F.when(
        (F.col("n_occ") > 1)
        & (F.col("doc_id") * 1000 + F.col("bi") != F.col("keeper")),
        1,
    ).otherwise(0)
    return (
        blocks.join(freq, "bh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_blocks"),
            F.sum(dropped).cast("long").alias("n_dropped"),
            F.round(F.sum(dropped) * 1.0 / F.count(F.lit(1)), 4).alias(
                "drop_ratio"
            ),
        )
    )


@register(
    "llm_dedup_incremental",
    CAT,
    f"""
    WITH hashed AS (
      SELECT doc_id, md5(lower(trim(text))) AS h,
             strpos('{_BATCH_NIBBLES}',
                    substr(md5(doc_id::VARCHAR), 1, 1)) > 0 AS is_new
      FROM documents
    ),
    idx AS (SELECT DISTINCT h FROM hashed WHERE NOT is_new),
    batch AS (SELECT doc_id, h FROM hashed WHERE is_new),
    marked AS (
      SELECT b.doc_id, b.h,
             b.h IN (SELECT h FROM idx) AS dup_vs_index,
             ROW_NUMBER() OVER (PARTITION BY b.h ORDER BY b.doc_id) AS rn
      FROM batch b
    )
    SELECT
      CASE WHEN dup_vs_index THEN 'dup_of_index'
           WHEN rn > 1 THEN 'dup_in_batch'
           ELSE 'accepted' END AS verdict,
      COUNT(*)::BIGINT AS n_docs
    FROM marked GROUP BY 1
    """,
)
def llm_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (new-batch-vs-index) dedup: the daily-ingest shape.
    The existing corpus contributes only its HASH INDEX (16 bytes/doc —
    the old text is never rescanned); incoming docs are marked
    'dup_of_index' (semi join against the index), 'dup_in_batch'
    (non-first within the batch by hash), or 'accepted'. Reported as the
    verdict histogram every ingest run logs.

    Scale shape: the index is a pre-built hash set maintained across
    runs (here derived from a hash split of the corpus); the batch-side
    check is one shuffle on the hash for the in-batch window plus a hash
    join against the index — cost scales with the BATCH, not the
    corpus."""
    hashed = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(F.lower(F.trim("text"))).alias("h"),
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
        .isin(*_BATCH_NIBBLES)
        .alias("is_new"),
    )
    idx = hashed.filter(~F.col("is_new")).select("h").distinct()
    batch = hashed.filter(F.col("is_new")).select("doc_id", "h")
    marked = (
        batch.join(
            idx.withColumn("in_idx", F.lit(True)), "h", "left"
        )
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("h").orderBy("doc_id")),
        )
    )
    verdict = (
        F.when(F.col("in_idx"), "dup_of_index")
        .when(F.col("rn") > 1, "dup_in_batch")
        .otherwise("accepted")
    )
    return marked.groupBy(verdict.alias("verdict")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
