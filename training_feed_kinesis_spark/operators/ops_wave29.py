"""Wave 29: dataset version diff, token-budget planning.

  * ``llm_dataset_diff``: row-level diff between two corpus versions
    (added / removed / text-changed per source) — the dataset-versioning
    audit that accompanies every refresh PR.
  * ``llm_token_budget_planner``: docs, tokens, mixture share and the
    implied EPOCH COUNT per language slice under a fixed token budget —
    the data-constrained-scaling arithmetic (how many times will we
    repeat each slice?) that decides whether more data or more epochs is
    the binding constraint.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

CAT = "2.J llm-pipeline (text)"

_ALPHA = 0.7
_BUDGET_TOK = 1_000_000


@register(
    "llm_dataset_diff",
    CAT,
    """
    WITH v1 AS (  -- prior version: drop ~1/4 of docs, mutate ~1/16
      SELECT doc_id, source,
             CASE WHEN strpos('0123', substr(md5('mut:' || doc_id::VARCHAR),
                                             1, 1)) > 0
                  THEN md5(text) ELSE text END AS text
      FROM documents
      WHERE strpos('cdef', substr(md5('v1:' || doc_id::VARCHAR), 1, 1)) = 0
    ),
    v2 AS (SELECT doc_id, source, text FROM documents),
    j AS (
      SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
             COALESCE(a.source, b.source) AS source,
             CASE WHEN a.doc_id IS NULL THEN 'added'
                  WHEN b.doc_id IS NULL THEN 'removed'
                  WHEN a.text != b.text THEN 'changed'
                  ELSE 'unchanged' END AS verdict
      FROM v1 a FULL JOIN v2 b ON a.doc_id = b.doc_id
    )
    SELECT source, verdict, COUNT(*)::BIGINT AS n_docs
    FROM j GROUP BY source, verdict
    """,
)
def llm_dataset_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus version diff: v1 (a deterministic prior — ~3/4 of docs,
    some with mutated text) full-outer-joined to v2 (current) on doc_id,
    each doc classified added / removed / changed / unchanged, rolled up
    per source — the audit table a dataset refresh ships with (which
    sources churned, which silently rewrote content).

    Scale shape: one full outer join on the doc key with row-local
    verdicts; at real scale the text compare becomes a stored content
    hash (16 bytes) so the diff never moves document bodies — the
    mutated-text stand-in here models exactly that hash compare."""
    d = load_table(spark, sf_dir, "documents")
    v2 = d.select("doc_id", "source", "text")
    v1 = (
        d.filter(
            ~F.substring(
                F.md5(F.concat(F.lit("v1:"), F.col("doc_id").cast("string"))),
                1,
                1,
            ).isin(*"cdef")
        )
        .select(
            "doc_id",
            "source",
            F.when(
                F.substring(
                    F.md5(
                        F.concat(F.lit("mut:"), F.col("doc_id").cast("string"))
                    ),
                    1,
                    1,
                ).isin(*"0123"),
                F.md5("text"),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
    )
    a = v1.alias("a")
    b = v2.alias("b")
    j = a.join(b, F.col("a.doc_id") == F.col("b.doc_id"), "full").select(
        F.coalesce(F.col("a.source"), F.col("b.source")).alias("source"),
        F.when(F.col("a.doc_id").isNull(), "added")
        .when(F.col("b.doc_id").isNull(), "removed")
        .when(F.col("a.text") != F.col("b.text"), "changed")
        .otherwise("unchanged")
        .alias("verdict"),
    )
    return j.groupBy("source", "verdict").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )


@register(
    "llm_token_budget_planner",
    CAT,
    f"""
    WITH per_lang AS (
      SELECT lang, COUNT(*)::DOUBLE AS n_docs,
             SUM(len(string_split(lower(text), ' ')))::DOUBLE AS n_tokens
      FROM documents GROUP BY lang
    ),
    tot AS (SELECT SUM(n_tokens) AS t FROM per_lang),
    z AS (
      SELECT SUM(pow(n_tokens / (SELECT t FROM tot), {_ALPHA})) AS zz
      FROM per_lang
    )
    SELECT lang,
           n_docs::BIGINT AS n_docs,
           n_tokens::BIGINT AS n_tokens,
           ROUND(pow(n_tokens / (SELECT t FROM tot), {_ALPHA})
                 / (SELECT zz FROM z), 4) AS mix_share,
           CAST(ROUND({_BUDGET_TOK} * pow(n_tokens / (SELECT t FROM tot),
                      {_ALPHA}) / (SELECT zz FROM z)) AS BIGINT)
             AS budget_tokens,
           ROUND({_BUDGET_TOK} * pow(n_tokens / (SELECT t FROM tot), {_ALPHA})
                 / (SELECT zz FROM z) / n_tokens, 4) AS epochs
    FROM per_lang
    """,
)
def llm_token_budget_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget planner: under a 1M-token training budget split by
    the α=0.7 temperature mixture over TOKEN mass, each language slice
    gets budget_tokens — and ``epochs`` = budget/available is the
    repetition factor. Slices with epochs ≫ 1 are data-constrained
    (upsampling repeats them; past ~4 epochs returns decay per the
    data-constrained scaling results), epochs < 1 means subsampling.
    This one table is the go/no-go on a mixture before any GPU burns.

    Scale shape: one language-keyed aggregate (token counts map-side);
    the planner arithmetic runs on the languages-sized table with two
    broadcast scalars."""
    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.sum(F.size(F.split(F.lower("text"), " ")))
        .cast("double")
        .alias("n_tokens"),
    )
    tot = per.agg(F.sum("n_tokens").alias("t"))
    scaled = per.crossJoin(F.broadcast(tot)).withColumn(
        "w_", F.pow(F.col("n_tokens") / F.col("t"), _ALPHA)
    )
    z = scaled.agg(F.sum("w_").alias("zz"))
    share = F.col("w_") / F.col("zz")
    return scaled.crossJoin(F.broadcast(z)).select(
        "lang",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(share, 4).alias("mix_share"),
        F.round(_BUDGET_TOK * share).cast("long").alias("budget_tokens"),
        F.round(_BUDGET_TOK * share / F.col("n_tokens"), 4).alias("epochs"),
    )
