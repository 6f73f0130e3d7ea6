"""Wave 39: image resize planning, dataloader worker assignment.

  * ``multimodal_resize_plan``: the deterministic planning half of the
    image-resize stage — fit each image into the 224-box on its longest
    side in PURE INTEGER arithmetic, with output-byte estimates. The
    binary resize kernel itself is the stubbed mapInPandas stage
    (``llm_multimodal_transform``); this op is what runs at full corpus
    scale to budget the decode fleet.
  * ``llm_dataloader_epoch_plan``: the last mile of the training feed —
    byte-budgeted shards assigned round-robin to 8 loader workers, with
    per-worker load and imbalance-vs-mean accounting. The table a
    distributed dataloader mounts to decide whether shard packing left
    any worker starving.

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

TARGET_PX = 224
SHARD_BYTES = 50_000
N_WORKERS = 8


@register(
    "multimodal_resize_plan",
    CAT_MM,
    f"""
    WITH imgs AS (
      SELECT doc_id, source,
             320 + (doc_id * 7) % 1600 AS w,
             240 + (doc_id * 13) % 900 AS h
      FROM documents WHERE doc_id % 3 = 1
    )
    SELECT doc_id, source, w, h,
           CAST(w * {TARGET_PX} // GREATEST(w, h) AS BIGINT) AS out_w,
           CAST(h * {TARGET_PX} // GREATEST(w, h) AS BIGINT) AS out_h,
           CAST((w * {TARGET_PX} // GREATEST(w, h))
                * (h * {TARGET_PX} // GREATEST(w, h)) * 3 AS BIGINT)
             AS out_bytes,
           ROUND(GREATEST(w, h) / {TARGET_PX}.0, 4) AS downscale
    FROM imgs
    """,
)
def multimodal_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plan: each image (synthetic 320-1919 × 240-1139 dimensions
    from doc_id metadata) fits into the 224-box on its longest side —
    out = dim·224 // max(w,h), integer end to end, so both engines agree
    bit-for-bit; `out_bytes` (RGB) budgets the decoded-tensor volume and
    `downscale` is the information-loss monitor.

    Scale shape: map-only over metadata — no payload bytes move during
    planning; the stubbed mapInPandas kernel (llm_multimodal_transform)
    then executes exactly this plan per partition. Planning apart from
    decoding is what lets the expensive stage be sized (and billed)
    before a single byte is decoded."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 1)
    imgs = d.select(
        "doc_id",
        "source",
        (320 + (F.col("doc_id") * 7) % 1600).alias("w"),
        (240 + (F.col("doc_id") * 13) % 900).alias("h"),
    )
    longest = F.greatest(F.col("w"), F.col("h"))
    out_w = F.floor(F.col("w") * TARGET_PX / longest)
    out_h = F.floor(F.col("h") * TARGET_PX / longest)
    return imgs.select(
        "doc_id",
        "source",
        "w",
        "h",
        out_w.alias("out_w"),
        out_h.alias("out_h"),
        (out_w * out_h * 3).cast("bigint").alias("out_bytes"),
        F.round(longest / float(TARGET_PX), 4).alias("downscale"),
    )


@register(
    "llm_dataloader_epoch_plan",
    CAT_MM,
    f"""
    WITH sized AS (
      -- id-ordered pack: a doc with no id has no position (NULL-PK r9)
      SELECT doc_id, n_chars,
             COALESCE(SUM(n_chars) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
      FROM documents WHERE doc_id IS NOT NULL
    ),
    shards AS (
      SELECT CAST(off // {SHARD_BYTES} AS BIGINT) AS shard_id,
             SUM(n_chars)::BIGINT AS shard_bytes
      FROM sized GROUP BY 1
    ),
    assigned AS (
      SELECT shard_id % {N_WORKERS} AS worker_id, shard_bytes FROM shards
    ),
    loads AS (
      SELECT worker_id, COUNT(*)::BIGINT AS n_shards,
             SUM(shard_bytes)::BIGINT AS worker_bytes
      FROM assigned GROUP BY worker_id
    ),
    mean_ AS (SELECT AVG(worker_bytes) AS mb FROM loads)
    SELECT worker_id, n_shards, worker_bytes,
           ROUND(worker_bytes / (SELECT mb FROM mean_) - 1.0, 4)
             AS imbalance
    FROM loads
    """,
)
def llm_dataloader_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataloader epoch plan: offset-shard the corpus into ~50 KB shards
    (the multimodal_shard_pack layout), deal shards round-robin onto 8
    loader workers, and report per-worker shard count, byte load, and
    imbalance vs the mean. Round-robin on a byte-budgeted shard stream is
    near-balanced BY CONSTRUCTION — the imbalance column proves it (or
    flags the pathological tail shard).

    Scale shape: the doc-order cumsum is the one global-order window
    (at 100 TB it runs per shard-group with offsets composed two-level,
    as multimodal_shard_pack documents); everything after operates on
    shard-count rows."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull()
    )
    w_off = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    sized = d.select(
        "doc_id",
        "n_chars",
        F.coalesce(F.sum("n_chars").over(w_off), F.lit(0)).alias("off"),
    )
    shards = (
        sized.select(
            F.floor(F.col("off") / SHARD_BYTES).alias("shard_id"), "n_chars"
        )
        .groupBy("shard_id")
        .agg(F.sum("n_chars").cast("long").alias("shard_bytes"))
    )
    loads = (
        shards.select(
            (F.col("shard_id") % N_WORKERS).alias("worker_id"), "shard_bytes"
        )
        .groupBy("worker_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shards"),
            F.sum("shard_bytes").cast("long").alias("worker_bytes"),
        )
    )
    mean_ = loads.agg(F.avg("worker_bytes").alias("mb"))
    return loads.crossJoin(F.broadcast(mean_)).select(
        "worker_id",
        "n_shards",
        "worker_bytes",
        F.round(F.col("worker_bytes") / F.col("mb") - 1.0, 4).alias("imbalance"),
    )
