"""Wave 108 — duplicate-span EXTRACTION (round 12).

``llm_dup_span_extract``: the apply-stage companion to
``llm_dup_span_census`` (ops_wave96) — where the census reports per-doc
totals, this key emits the actual SPAN MANIFEST: one row per maximal
cross-doc duplicated span with its [pos, epos] character interval,
length, and the md5 fingerprint of the extracted span text. This is the
artifact the ExactSubstr dedup of Lee et al. (ACL 2022, "Deduplicating
Training Data Makes Language Models Better") actually consumes: the
cut list a rewrite pass applies to each document (and the dedup ledger
a corpus audit publishes — which byte ranges were duplicated, and what
text they held, without shipping the text itself).

Pipeline is the census's verbatim: 24-char gram hashes → grams shared
by ≥2 distinct docs → per-doc interval merge (gaps-and-islands over a
running MAX(end) window) → maximal spans; the new tail joins each span
back to its document ONCE to fingerprint substr(text, pos, len). The
suffix array of the original paper is replaced by the same
shuffle-friendly gram-hash join the census uses.

Scale shape: identical to the census (grams carry (doc_id, pos, hash),
never text; the island window shuffles only HIT positions) plus one
join of the span manifest (duplicated regions only — a small fraction
of docs) against the documents it fingerprints; span extraction is a
row-local substr.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load_table, parallelize
from .ops_wave96 import GRAMS_CTES, SPAN_K, _gram_rows

CAT = "2.J llm-pipeline (dedup)"

_LT = (
    "translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',"
    " 'abcdefghijklmnopqrstuvwxyz')"
)


@register(
    "llm_dup_span_extract",
    CAT,
    f"""
    WITH {GRAMS_CTES},
    shared AS (
      SELECT gh FROM grams GROUP BY gh HAVING MIN(doc_id) <> MAX(doc_id)
    ),
    hits AS (
      SELECT g.doc_id, g.pos, g.pos + {SPAN_K} - 1 AS epos
      FROM grams g SEMI JOIN shared s ON g.gh = s.gh
    ),
    flagged AS (
      SELECT doc_id, pos, epos,
             CASE WHEN MAX(epos) OVER (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  IS NULL
                  OR pos > MAX(epos) OVER (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
                  THEN 1 ELSE 0 END AS new_span
      FROM hits
    ),
    islands AS (
      SELECT doc_id, pos, epos,
             SUM(new_span) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS UNBOUNDED PRECEDING) AS span_id
      FROM flagged
    ),
    spans AS (
      SELECT doc_id, CAST(span_id AS BIGINT) AS span_id,
             CAST(MIN(pos) AS BIGINT) AS pos,
             CAST(MAX(epos) AS BIGINT) AS epos
      FROM islands GROUP BY doc_id, span_id
    )
    SELECT s.doc_id, s.span_id, s.pos, s.epos,
           s.epos - s.pos + 1 AS span_chars,
           md5(substr({_LT.replace('text', 'd.text')},
                      CAST(s.pos AS INT),
                      CAST(s.epos - s.pos + 1 AS INT))) AS span_md5
    FROM spans s JOIN documents d ON d.doc_id = s.doc_id
    """,
)
def llm_dup_span_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal cross-doc duplicated spans with extracted-content
    fingerprints (see module docstring). The manifest a rewrite pass
    cuts and an audit ledger publishes."""
    d = parallelize(load_table(spark, sf_dir, "documents"))
    # linear K-shifted-chunkings gram enumeration, shared with the
    # census (r12 payload campaign — see ops_wave96.GRAMS_CTES)
    grams = _gram_rows(spark, sf_dir).select("doc_id", "pos", "gh")
    shared = (
        grams.groupBy("gh")
        .agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
        .filter(F.col("lo") != F.col("hi"))
        .select("gh")
    )
    hits = grams.join(shared, "gh", "left_semi").select(
        "doc_id", "pos", (F.col("pos") + SPAN_K - 1).alias("epos")
    )
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev_end = F.max("epos").over(w_prev)
    islands = hits.withColumn(
        "new_span",
        F.when(prev_end.isNull() | (F.col("pos") > prev_end + 1), 1).otherwise(
            0
        ),
    ).withColumn("span_id", F.sum("new_span").over(w_run))
    spans = islands.groupBy(
        "doc_id", F.col("span_id").cast("bigint").alias("span_id")
    ).agg(
        F.min("pos").cast("bigint").alias("pos"),
        F.max("epos").cast("bigint").alias("epos"),
    )
    docs = d.select("doc_id", F.expr(_LT).alias("lt"))
    return (
        spans.join(docs, "doc_id")
        .select(
            "doc_id",
            "span_id",
            "pos",
            "epos",
            (F.col("epos") - F.col("pos") + 1).alias("span_chars"),
            F.md5(
                F.expr(
                    "substring(lt, CAST(pos AS INT),"
                    " CAST(epos - pos + 1 AS INT))"
                )
            ).alias("span_md5"),
        )
    )
