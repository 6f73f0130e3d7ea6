"""Corpus-preparation quality wave 3: RAG chunking, degenerate-repetition
scoring, boilerplate prefix dedup.

  * ``llm_chunk_overlap``: sliding-window chunker (64-token chunks, stride
    48 → 16-token overlap) — the retrieval/embedding counterpart to the
    training-side concat packer (``llm_pack_chunks``).
  * ``llm_repetition_score``: distinct-trigram ratio per document — the
    standard degenerate-repetition filter (looping model output, scraped
    keyword stuffing) applied before training.
  * ``llm_prefix_dedup``: cluster docs by their first-4-token prefix —
    boilerplate headers (licence blocks, templates) dedup on prefix long
    before full-text MinHash is worth running; reports the cluster-size
    distribution.

All three are row-local (explode-free or per-row array ops) until a final
tiny aggregate — no joins, one shuffle max.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md §0.1);
capability surface reconstructed per SURVEY.md §2 and BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

CAT_TXT = "2.J llm-pipeline (text)"
CAT_DEDUP = "2.J llm-pipeline (dedup)"

_CHUNK = 64
_STRIDE = 48


@register(
    "llm_chunk_overlap",
    CAT_TXT,
    f"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' '))::BIGINT AS n
      FROM documents
    ),
    e AS (
      SELECT doc_id, toks, n,
             unnest(generate_series(0, (n - 1) // {_STRIDE})) AS chunk_idx
      FROM d
    )
    SELECT doc_id, chunk_idx,
           LEAST({_CHUNK}, n - chunk_idx * {_STRIDE})::BIGINT AS n_tok,
           toks[chunk_idx * {_STRIDE} + 1] AS first_tok
    FROM e
    """,
)
def llm_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunk manifest: chunk starts at 0, 48, 96, … while
    start < n_tokens; each chunk holds min(64, n−start) tokens, so adjacent
    chunks overlap by 16 — the context-bridging RAG chunker. Emits
    (doc, chunk_idx, token count, first token) per chunk; the downstream
    embed step maps over exactly these slices.

    Scale: fan-out is n_tokens/48 rows per doc, all computed row-local from
    the split array (no shuffle at all — chunking is embarrassingly
    parallel).
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.split("text", " ").alias("toks"),
        F.size(F.split("text", " ")).cast("bigint").alias("n"),
    )
    e = d.select(
        "doc_id",
        "toks",
        "n",
        F.explode(
            F.sequence(F.lit(0), F.expr(f"(n - 1) div {_STRIDE}"))
        ).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * _STRIDE
    return e.select(
        "doc_id",
        "chunk_idx",
        F.least(F.lit(_CHUNK), F.col("n") - start).alias("n_tok"),
        F.element_at("toks", (start + 1).cast("int")).alias("first_tok"),
    )


@register(
    "llm_repetition_score",
    CAT_TXT,
    """
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' '))::BIGINT AS n
      FROM documents
    ),
    t AS (
      SELECT doc_id, n,
             -- explicit element accesses, not list_slice in the lambda:
             -- the slice is O(len) per position — quadratic per doc
             -- (r12 payload campaign)
             list_transform(
               generate_series(1, n - 2),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
             ) AS tg
      FROM d WHERE n >= 3
    )
    SELECT doc_id,
           n AS n_tokens,
           len(tg)::BIGINT AS n_trigrams,
           len(list_distinct(tg))::BIGINT AS distinct_trigrams,
           ROUND(1.0 - len(list_distinct(tg))::DOUBLE / len(tg), 4)
             AS repetition
    FROM t
    """,
)
def llm_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degenerate-repetition score per document: 1 − distinct/total over
    word trigrams. Looping generations and keyword-stuffed scrapes score
    high; natural prose scores near 0. Entirely row-local — the trigram
    array is built, deduped, and counted inside the row (transform over an
    index sequence + array_distinct), so the operator needs NO shuffle and
    scales linearly with corpus bytes.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.split("text", " ").alias("toks"),
        F.size(F.split("text", " ")).cast("bigint").alias("n"),
    )
    t = d.filter(F.col("n") >= 3).select(
        "doc_id",
        "n",
        F.expr(
            "transform(sequence(1, cast(n as int) - 2), "
            "i -> concat_ws(' ', slice(toks, i, 3)))"
        ).alias("tg"),
    )
    dt = F.size(F.array_distinct("tg"))
    return t.select(
        "doc_id",
        F.col("n").alias("n_tokens"),
        F.size("tg").cast("bigint").alias("n_trigrams"),
        dt.cast("bigint").alias("distinct_trigrams"),
        F.round(F.lit(1.0) - dt.cast("double") / F.size("tg"), 4).alias(
            "repetition"
        ),
    )


@register(
    "llm_prefix_dedup",
    CAT_DEDUP,
    """
    WITH p AS (
      SELECT doc_id,
             array_to_string(list_slice(string_split(text, ' '), 1, 4), ' ')
               AS prefix
      FROM documents
    ),
    c AS (
      SELECT prefix, COUNT(*)::BIGINT AS cluster_size FROM p GROUP BY prefix
    )
    SELECT cluster_size,
           COUNT(*)::BIGINT AS n_clusters,
           (cluster_size * COUNT(*))::BIGINT AS n_docs
    FROM c GROUP BY cluster_size
    """,
)
def llm_prefix_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate prefix dedup: cluster documents on their first four
    tokens (licence headers, scaffold templates collide here long before
    full-text MinHash is worth its shuffles), then report the cluster-size
    distribution — size 1 = unique openings, sizes ≥2 = candidate
    boilerplate for the near-dup pass (llm_dedup_near).

    Scale: one map-side-combinable groupBy on a short string key; the
    distribution rollup is tiny. This is the cheap first filter of the
    dedup waterfall (llm_curation_waterfall).
    """
    d = load_table(spark, sf_dir, "documents")
    p = d.select(
        "doc_id",
        F.concat_ws(" ", F.slice(F.split("text", " "), 1, 4)).alias("prefix"),
    )
    c = p.groupBy("prefix").agg(F.count(F.lit(1)).alias("cluster_size"))
    return c.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        (F.col("cluster_size") * F.count(F.lit(1))).alias("n_docs"),
    )
