"""Wave 48: bigram entropy rate, tokenizer byte-fallback pressure.

  * ``llm_ngram_entropy_rate``: the conditional entropy H(next | current)
    of the word-bigram model per language — the information-theoretic
    "how predictable is this text" number that complements unigram NLL
    (llm_unigram_logprob) and Zipf slope (llm_zipf_slope): low entropy
    rate = templated/repetitive corpus, high = diverse (or noisy).
  * ``llm_byte_fallback_rate``: share of non-ASCII characters per
    language — the byte-fallback pressure a byte-level BPE pays on that
    slice. Completes the tokenizer-audit triplet: fertility (how many
    pieces), coverage (what the vocab misses), fallback (what drops to
    bytes).

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

CAT_TEXT = "2.J llm-pipeline (text)"


@register(
    "llm_ngram_entropy_rate",
    CAT_TEXT,
    """
    WITH tok AS (
      SELECT lang, doc_id, string_split(lower(text), ' ') AS w
      FROM documents
    ),
    bigrams AS (
      SELECT lang, w[i] AS cur, w[i + 1] AS nxt
      FROM (SELECT lang, w, unnest(range(1, len(w))) AS i FROM tok)
    ),
    pair_c AS (
      SELECT lang, cur, nxt, COUNT(*)::DOUBLE AS c
      FROM bigrams GROUP BY lang, cur, nxt
    ),
    cur_c AS (
      SELECT lang, cur, SUM(c) AS cc FROM pair_c GROUP BY lang, cur
    ),
    tot AS (SELECT lang, SUM(c) AS n FROM pair_c GROUP BY lang)
    SELECT p.lang,
           CAST((SELECT n FROM tot WHERE tot.lang = p.lang) AS BIGINT)
             AS n_bigrams,
           COUNT(*)::BIGINT AS n_distinct_pairs,
           ROUND(SUM(-(p.c / t.n) * ln(p.c / u.cc)) / ln(2), 4)
             AS entropy_rate_bits
    FROM pair_c p
    JOIN cur_c u ON u.lang = p.lang AND u.cur = p.cur
    JOIN tot t ON t.lang = p.lang
    GROUP BY p.lang
    """,
)
def llm_ngram_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram conditional entropy per language: H(next|cur) =
    −Σ p(cur,next)·log₂ p(next|cur), from the bigram and unigram-context
    count tables (p(next|cur) = c(cur,next)/c(cur)). The corpus-level
    predictability score — a language whose entropy rate collapses after
    a pipeline change just got flooded with templates.

    Scale shape: bigram counts shuffle once on (lang, cur, next); the
    context-count join is (lang, cur)-keyed against an aggregate that is
    vocabulary-sized, not corpus-sized; one low-cardinality final
    aggregate. Entropy sums are order-insensitive up to float
    associativity — ROUND(,4) per SURVEY §5.3.1."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("lang", F.split(F.lower("text"), " ").alias("w"))
    bigrams = tok.select(
        "lang",
        # if-guard: sequence(1, 0) would DESCEND for 1-token docs
        F.explode(
            F.expr(
                "if(size(w) >= 2, transform(sequence(1, size(w) - 1), "
                "i -> struct(w[i - 1] AS cur, w[i] AS nxt)), array())"
            )
        ).alias("b"),
    ).select("lang", "b.cur", "b.nxt")
    pair_c = bigrams.groupBy("lang", "cur", "nxt").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    cur_c = pair_c.groupBy("lang", "cur").agg(F.sum("c").alias("cc"))
    tot = pair_c.groupBy("lang").agg(F.sum("c").alias("n"))
    import math

    joined = pair_c.join(cur_c, ["lang", "cur"]).join(F.broadcast(tot), "lang")
    return joined.groupBy("lang").agg(
        F.first("n").cast("long").alias("n_bigrams"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_pairs"),
        F.round(
            F.sum(
                -(F.col("c") / F.col("n")) * F.log(F.col("c") / F.col("cc"))
            )
            / math.log(2),
            4,
        ).alias("entropy_rate_bits"),
    )


@register(
    "llm_byte_fallback_rate",
    CAT_TEXT,
    r"""
    WITH census AS (
      SELECT lang,
             length(text) AS n_chars_t,
             length(regexp_replace(text, '[ -~]', '', 'g')) AS n_non_ascii
      FROM documents
    )
    SELECT lang,
           COUNT(*)::BIGINT AS n_docs,
           CAST(SUM(n_chars_t) AS BIGINT) AS total_chars,
           CAST(SUM(n_non_ascii) AS BIGINT) AS non_ascii_chars,
           ROUND(SUM(n_non_ascii) / CAST(SUM(n_chars_t) AS DOUBLE), 4)
             AS fallback_rate,
           ROUND(AVG(CASE WHEN n_non_ascii > 0 THEN 1.0 ELSE 0.0 END), 4)
             AS affected_doc_share
    FROM census GROUP BY lang
    """,
)
def llm_byte_fallback_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-fallback pressure: characters outside printable ASCII
    (stripped via the `[ -~]` class — space through tilde, identical
    RE2/Java semantics) per language. A byte-level BPE spends multiple
    byte tokens per such character, so a language slice with high
    fallback_rate inflates its true token budget — feed this into
    llm_token_budget_planner before trusting whitespace token counts.

    Scale shape: two length() calls and one regexp census per row,
    map-side; low-cardinality aggregate. The regexp strip counts chars
    in ONE pass — no per-character explode."""
    d = load_table(spark, sf_dir, "documents")
    census = d.select(
        "lang",
        F.length("text").alias("n_chars_t"),
        F.length(F.regexp_replace("text", "[ -~]", "")).alias("n_non_ascii"),
    )
    return census.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars_t").cast("long").alias("total_chars"),
        F.sum("n_non_ascii").cast("long").alias("non_ascii_chars"),
        F.round(
            F.sum("n_non_ascii") / F.sum("n_chars_t").cast("double"), 4
        ).alias("fallback_rate"),
        F.round(
            F.avg(F.when(F.col("n_non_ascii") > 0, 1.0).otherwise(0.0)), 4
        ).alias("affected_doc_share"),
    )
