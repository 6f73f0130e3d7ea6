"""Wave 40: MinHash-LSH band tuning, shard integrity checksums.

  * ``llm_lsh_tuning_curve``: the (bands × rows) S-curve table for a
    64-permutation MinHash — collision probability 1-(1-j^r)^b at each
    candidate Jaccard level, plus each config's 50%-collision threshold.
    The tuning companion of ``llm_dedup_near``: pick (b, r) from this
    table, don't guess.
  * ``llm_shard_integrity``: per-shard content checksum manifest — an
    order-insensitive digest (md5 of the sorted per-doc hashes) plus doc
    count and byte totals per shard. What a training-feed consumer
    verifies before mounting a delivered shard; recomputed after any
    copy, it catches truncation/corruption/reordering.

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

CAT_DEDUP = "2.J llm-pipeline (dedup)"
CAT_MM = "2.J llm-pipeline (multimodal)"

N_PERM = 64                      # total MinHash permutations (b*r = 64)
LSH_CONFIGS = ((32, 2), (16, 4), (8, 8), (4, 16))   # (bands, rows)
JACCARD_GRID = (50, 60, 70, 80, 90)                 # percent, integer grid
SHARD_BYTES = 50_000


def _configs_sql() -> str:
    rows = ", ".join(f"({b}, {r})" for b, r in LSH_CONFIGS)
    return f"(VALUES {rows}) cfg(b, r)"


@register(
    "llm_lsh_tuning_curve",
    CAT_DEDUP,
    f"""
    WITH cfg AS (SELECT * FROM {_configs_sql()}),
    grid AS (SELECT unnest([{", ".join(str(j) for j in JACCARD_GRID)}]) AS jpct)
    SELECT cfg.b AS bands, cfg.r AS rows_per_band, grid.jpct,
           ROUND(1.0 - pow(1.0 - pow(grid.jpct / 100.0, cfg.r), cfg.b), 4)
             AS p_collide,
           ROUND(pow(1.0 - pow(0.5, 1.0 / cfg.b), 1.0 / cfg.r), 4)
             AS j_at_half
    FROM cfg CROSS JOIN grid
    """,
)
def llm_lsh_tuning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH S-curve: for each (bands, rows) split of the 64
    permutations, the probability that a pair with true Jaccard j shares
    at least one band bucket is 1-(1-j^r)^b; `j_at_half` inverts it for
    p=0.5 — the config's effective similarity threshold. Reading this
    table: (16,4) thresholds near 0.5, (8,8) near 0.7 — which is why
    llm_dedup_near ships (8,8) for its 0.7 target.

    Scale note: the table is configuration-sized (pure math, no data
    scan) — but it GOVERNS the data-sized cost: bands multiply the
    candidate-pair volume the bucket join emits, so choosing (b, r) from
    this curve is choosing the shuffle volume of the 100 TB dedup run."""
    cfg = spark.createDataFrame(list(LSH_CONFIGS), "b int, r int")
    grid = spark.createDataFrame([(j,) for j in JACCARD_GRID], "jpct int")
    j = F.col("jpct") / 100.0
    p_collide = 1.0 - F.pow(
        1.0 - F.pow(j, F.col("r")), F.col("b")
    )
    j_at_half = F.pow(
        1.0 - F.pow(F.lit(0.5), 1.0 / F.col("b")), 1.0 / F.col("r")
    )
    return cfg.crossJoin(F.broadcast(grid)).select(
        F.col("b").alias("bands"),
        F.col("r").alias("rows_per_band"),
        "jpct",
        F.round(p_collide, 4).alias("p_collide"),
        F.round(j_at_half, 4).alias("j_at_half"),
    )


@register(
    "llm_shard_integrity",
    CAT_MM,
    f"""
    WITH sized AS (
      -- a doc with no id has no position in the id-ordered pack
      -- (NULL-PK r9: Spark sorts NULLS FIRST, DuckDB LAST — every
      -- shard boundary would shift by the NULL sliver)
      SELECT doc_id, n_chars, md5(text) AS doc_hash,
             COALESCE(SUM(n_chars) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
      FROM documents WHERE doc_id IS NOT NULL
    ),
    sharded AS (
      SELECT CAST(off // {SHARD_BYTES} AS BIGINT) AS shard_id,
             doc_id, n_chars, doc_hash
      FROM sized
    )
    SELECT shard_id,
           COUNT(*)::BIGINT AS n_docs,
           SUM(n_chars)::BIGINT AS shard_bytes,
           md5(string_agg(doc_hash, '' ORDER BY doc_hash)) AS content_digest,
           MIN(doc_id)::BIGINT AS first_doc,
           MAX(doc_id)::BIGINT AS last_doc
    FROM sharded GROUP BY shard_id
    """,
)
def llm_shard_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard integrity manifest: per offset-packed shard, an
    order-insensitive content digest — md5 over the SORTED per-doc md5s —
    plus doc count, byte total, and id span. The consumer recomputes the
    digest after transfer: any truncated, corrupted, duplicated, or
    misrouted document changes it. Sorting the doc hashes before the
    outer digest makes the check independent of read order (parquet
    row-group order is not stable across rewrites).

    Scale shape: per-doc hashing is map-side; each shard aggregates a few
    hundred 32-char hashes (shard-bounded, not corpus-bounded), so the
    digest concat is small and the shuffle carries (shard_id, hash)
    pairs, never text."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull()
    )
    w_off = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    sized = d.select(
        "doc_id",
        "n_chars",
        F.md5("text").alias("doc_hash"),
        F.coalesce(F.sum("n_chars").over(w_off), F.lit(0)).alias("off"),
    )
    sharded = sized.select(
        F.floor(F.col("off") / SHARD_BYTES).alias("shard_id"),
        "doc_id",
        "n_chars",
        "doc_hash",
    )
    return sharded.groupBy("shard_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("shard_bytes"),
        F.md5(
            F.array_join(F.array_sort(F.collect_list("doc_hash")), "")
        ).alias("content_digest"),
        F.min("doc_id").cast("long").alias("first_doc"),
        F.max("doc_id").cast("long").alias("last_doc"),
    )
