"""Wave 18: deterministic-noise DP release, corpus data card.

  * ``dp_noisy_counts``: ε-DP-shaped histogram release of event counts —
    Laplace(1/ε) noise derived from an md5 hex fraction, so the "draw"
    is reproducible on any engine (a keyed-PRF noise stream, which is
    exactly how production DP systems derandomize releases).
  * ``llm_data_card``: the corpus data card — one (metric, value) table
    covering size, language/source spread, length moments, dedup rate
    and quality pass rate in a single pass-shaped query.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

CAT_AGG = "2.D aggregations"
CAT_TEXT = "2.J llm-pipeline (text)"

_EPS = 1.0  # DP epsilon; Laplace scale b = sensitivity/eps = 1

# exact hex-fraction uniform in [0,1) from 13 md5 hex digits (the
# rollups.py idiom — dyadic rationals, bit-identical across engines)
_U_SPARK = (
    "aggregate(transform(sequence(1, 13), "
    "i -> (locate(substr(md5({key}), i, 1), '0123456789abcdef') - 1) "
    "* power(16.0D, -cast(i AS double))), 0.0D, (a, b) -> a + b)"
)
_U_SQL = (
    "list_sum(list_transform(range(1, 14), "
    "i -> (strpos('0123456789abcdef', substr(md5({key}), i, 1)) - 1) "
    "* power(16.0, -i)))"
)


@register(
    "dp_noisy_counts",
    CAT_AGG,
    f"""
    WITH counts AS (
      SELECT event_type, COUNT(*)::DOUBLE AS n FROM events GROUP BY event_type
    ),
    noised AS (
      SELECT event_type, n,
             {_U_SQL.format(key="'dp:' || event_type")} AS u
      FROM counts
    )
    SELECT event_type,
           n::BIGINT AS true_n,
           ROUND(n + (CASE WHEN u < 0.5 THEN 1 ELSE -1 END)
                     * (1.0 / {_EPS}) * ln(1 - 2 * abs(u - 0.5) + 1e-300),
                 4) AS noisy_n,
           ROUND((CASE WHEN u < 0.5 THEN 1 ELSE -1 END)
                 * (1.0 / {_EPS}) * ln(1 - 2 * abs(u - 0.5) + 1e-300), 4)
             AS noise
    FROM noised
    """,
)
def dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε=1 Laplace-mechanism histogram release: each per-type count gets
    additive noise b·sgn(u−½)·ln(1−2|u−½|) with u a keyed md5 hex
    fraction — the inverse-CDF Laplace draw DERANDOMIZED through a PRF
    keyed by the release key, which is how real DP pipelines make
    releases reproducible/auditable (same key ⇒ same noise; new release
    key ⇒ fresh draw). True counts shown alongside because this operator
    demonstrates the mechanism; a production release drops them.

    Scale shape: noise is a row-local expression over the already-tiny
    histogram — the DP step costs nothing at any corpus size."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    u = F.expr(_U_SPARK.format(key="concat('dp:', event_type)"))
    noised = counts.withColumn("u", u)
    sgn = F.when(F.col("u") < 0.5, 1.0).otherwise(-1.0)
    noise = sgn * (1.0 / _EPS) * F.log(1 - 2 * F.abs(F.col("u") - 0.5) + 1e-300)
    return noised.select(
        "event_type",
        F.col("n").cast("long").alias("true_n"),
        F.round(F.col("n") + noise, 4).alias("noisy_n"),
        F.round(noise, 4).alias("noise"),
    )


@register(
    "llm_data_card",
    CAT_TEXT,
    """
    WITH base AS (
      SELECT doc_id, lang, source, n_chars,
             md5(lower(trim(text))) AS h,
             len(string_split(lower(text), ' ')) AS n_tok
      FROM documents
    ),
    m AS (
      SELECT COUNT(*)::DOUBLE AS n_docs,
             COUNT(DISTINCT lang)::DOUBLE AS n_langs,
             COUNT(DISTINCT source)::DOUBLE AS n_sources,
             COUNT(DISTINCT h)::DOUBLE AS n_unique,
             AVG(n_chars) AS mean_chars,
             percentile_cont(0.5) WITHIN GROUP (ORDER BY n_chars)
               AS median_chars,
             SUM(n_tok)::DOUBLE AS total_tokens,
             AVG(CASE WHEN n_tok >= 20 THEN 1.0 ELSE 0.0 END) AS len_pass
      FROM base
    )
    -- grower metrics (counts, token totals — exact integral doubles)
    -- emit UNROUNDED; only the bounded ratios/moments pass through the
    -- 4dp round (r11 projected-magnitude lint, SURVEY 5.3.9a)
    SELECT metric, value FROM (
      SELECT 'n_docs' AS metric, n_docs AS value FROM m
      UNION ALL SELECT 'n_langs', n_langs FROM m
      UNION ALL SELECT 'n_sources', n_sources FROM m
      UNION ALL SELECT 'dup_rate', ROUND(1 - n_unique / NULLIF(n_docs, 0), 4)
        FROM m
      UNION ALL SELECT 'mean_chars', ROUND(mean_chars, 4) FROM m
      UNION ALL SELECT 'median_chars', ROUND(median_chars, 4) FROM m
      UNION ALL SELECT 'total_tokens', total_tokens FROM m
      UNION ALL SELECT 'len_gate_pass_rate', ROUND(len_pass, 4) FROM m
    )
    """,
)
def llm_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus data card: size, language/source spread, exact-dup
    rate, length moments, token total and length-gate pass rate as one
    (metric, value) table — the summary block of a dataset card
    (Datasheets for Datasets), produced by the engine instead of a
    notebook.

    Scale shape: ONE wide aggregate over one scan computes every metric
    (exact count-distincts here; at 100 TB they swap to
    approx_count_distinct with the same card schema), then a row-local
    unpivot to (metric, value)."""
    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        "lang",
        "source",
        "n_chars",
        F.md5(F.lower(F.trim("text"))).alias("h"),
        F.size(F.split(F.lower("text"), " ")).alias("n_tok"),
    )
    m = base.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.countDistinct("lang").cast("double").alias("n_langs"),
        F.countDistinct("source").cast("double").alias("n_sources"),
        F.countDistinct("h").cast("double").alias("n_unique"),
        F.avg("n_chars").alias("mean_chars"),
        F.expr("percentile(n_chars, 0.5)").alias("median_chars"),
        F.sum("n_tok").cast("double").alias("total_tokens"),
        F.avg(F.when(F.col("n_tok") >= 20, 1.0).otherwise(0.0)).alias(
            "len_pass"
        ),
    )
    # growers (counts / token totals) unrounded; bounded ratios 4dp
    # (r11 projected-magnitude lint, SURVEY 5.3.9a)
    return m.selectExpr(
        "stack(8, "
        "'n_docs', n_docs, "
        "'n_langs', n_langs, "
        "'n_sources', n_sources, "
        # NULLIF: 0/0 over an empty corpus is NULL on both engines, not
        # an ANSI divide-by-zero error (empty-corpus census r6)
        "'dup_rate', ROUND(1 - n_unique / NULLIF(n_docs, 0), 4), "
        "'mean_chars', ROUND(mean_chars, 4), "
        "'median_chars', ROUND(median_chars, 4), "
        "'total_tokens', total_tokens, "
        "'len_gate_pass_rate', ROUND(len_pass, 4)) AS (metric, value)"
    ).select("metric", "value")
