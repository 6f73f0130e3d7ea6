"""§2.J LLM-pipeline: text analysis over the `documents` table.

Tokenization, quality scoring, language-ID-style marker classification,
TF-IDF, corpus profiling, fingerprinting — all as pure DataFrame plans
(built-ins + higher-order functions), zero Python UDFs: at 100 TB these run
entirely inside whole-stage codegen and scale as embarrassingly-parallel
scans + low-cardinality aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table
from .textnorm import FOLD_TEXT

CAT = "2.J llm-pipeline (text)"

# canonical tokenizer used by every text operator (both engines agree):
# ASCII case fold + split on single space (fixture text is space-separated
# word salad). Fold, NOT lower(): engine case folding diverges on İ/ß/
# final-sigma/ligatures (r11 Unicode campaign, textnorm.py; byte-equal to
# lower() on the pure-ASCII clean fixtures).
def _tokens():
    # built lazily: Column construction needs an active SparkContext
    return F.expr(f"split({FOLD_TEXT}, ' ')")
_TOKENS_SQL = f"string_split({FOLD_TEXT}, ' ')"


@register(
    "llm_text_tokens",
    CAT,
    f"""
    SELECT doc_id,
           len({_TOKENS_SQL})                         AS n_tokens,
           len(list_distinct({_TOKENS_SQL}))          AS n_unique,
           length(text)                               AS n_chars_measured,
           ROUND(length(text) * 1.0 / len({_TOKENS_SQL}), 4) AS avg_token_span
    FROM documents
    """,
)
def llm_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token statistics (whitespace tokenizer)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(_tokens()).alias("n_tokens"),
        F.size(F.array_distinct(_tokens())).alias("n_unique"),
        F.length("text").alias("n_chars_measured"),
        F.round(F.length("text") * 1.0 / F.size(_tokens()), 4).alias("avg_token_span"),
    )


@register(
    "llm_quality_score",
    CAT,
    f"""
    SELECT doc_id,
           ROUND(len(list_distinct({_TOKENS_SQL})) * 1.0
                 / len({_TOKENS_SQL}), 4)                       AS type_token_ratio,
           ROUND(len(list_filter({_TOKENS_SQL},
                 x -> length(x) >= 5)) * 1.0 / len({_TOKENS_SQL}), 4) AS long_word_ratio,
           CASE WHEN length(text) BETWEEN 50 AND 5000
                AND len({_TOKENS_SQL}) >= 10 THEN 1 ELSE 0 END   AS passes_length_gate
    FROM documents
    """,
)
def llm_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document-quality features (length gate, type/token ratio,
    long-word ratio) — the filter-before-training stage of a data pipeline.
    The fixture corpus has no punctuation, so punctuation-ratio features are
    omitted rather than trivially zero."""
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(_tokens())
    return d.select(
        "doc_id",
        F.round(F.size(F.array_distinct(_tokens())) * 1.0 / n_tok, 4).alias(
            "type_token_ratio"
        ),
        F.round(
            F.size(F.expr(f"filter({_TOKENS_SQL.replace('string_split', 'split')}, x -> length(x) >= 5)"))
            * 1.0
            / n_tok,
            4,
        ).alias("long_word_ratio"),
        F.when(
            F.length("text").between(50, 5000) & (n_tok >= 10), 1
        )
        .otherwise(0)
        .alias("passes_length_gate"),
    )


_MARKERS = {
    "data": ("table", "row", "column"),
    "query": ("join", "filter", "scan"),
    "stream": ("stream", "window", "batch"),
}


def _marker_count_spark(words: tuple[str, ...]):
    lst = ", ".join(f"'{w}'" for w in words)
    return F.size(
        F.expr(f"filter(split({FOLD_TEXT}, ' '), x -> x IN ({lst}))")
    )


def _marker_count_sql(words: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter({_TOKENS_SQL}, x -> list_contains([{lst}], x)))"


@register(
    "llm_lang_id",
    CAT,
    f"""
    SELECT doc_id, lang,
           {_marker_count_sql(_MARKERS['data'])}   AS score_data,
           {_marker_count_sql(_MARKERS['query'])}  AS score_query,
           {_marker_count_sql(_MARKERS['stream'])} AS score_stream,
           CASE WHEN {_marker_count_sql(_MARKERS['data'])} >= {_marker_count_sql(_MARKERS['query'])}
                 AND {_marker_count_sql(_MARKERS['data'])} >= {_marker_count_sql(_MARKERS['stream'])}
                THEN 'data'
                WHEN {_marker_count_sql(_MARKERS['query'])} >= {_marker_count_sql(_MARKERS['stream'])}
                THEN 'query' ELSE 'stream' END AS topic_guess
    FROM documents
    """,
)
def llm_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token classification — the language-ID pattern (score each
    class by marker-token hits, argmax with a fixed tie order). The fixture
    corpus shares one vocabulary across its `lang` labels, so the classes
    here are topic markers; swapping the marker lists for per-language
    stopword lists is the production use. Pure HOF plan, no UDF."""
    d = load_table(spark, sf_dir, "documents")
    sd = _marker_count_spark(_MARKERS["data"])
    sq = _marker_count_spark(_MARKERS["query"])
    ss = _marker_count_spark(_MARKERS["stream"])
    return d.select(
        "doc_id",
        "lang",
        sd.alias("score_data"),
        sq.alias("score_query"),
        ss.alias("score_stream"),
        F.when((sd >= sq) & (sd >= ss), "data")
        .when(sq >= ss, "query")
        .otherwise("stream")
        .alias("topic_guess"),
    )


@register(
    "llm_lang_profile",
    CAT,
    f"""
    SELECT lang, source,
           COUNT(*)                                    AS n_docs,
           ROUND(AVG(n_chars), 4)                      AS avg_chars,
           CAST(SUM(len({_TOKENS_SQL})) AS BIGINT)     AS total_tokens,
           MIN(doc_id)                                 AS first_doc
    FROM documents GROUP BY lang, source
    """,
)
def llm_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profile per (lang, source) — the partition-level accounting a
    training-mix designer reads. Low-cardinality groupBy → tiny shuffle."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.sum(F.size(_tokens())).alias("total_tokens"),
        F.min("doc_id").alias("first_doc"),
    )


@register(
    "llm_tfidf",
    CAT,
    f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKENS_SQL}) AS term FROM documents
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
    ),
    df AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT tf.doc_id, tf.term, tf.tf,
           ROUND(tf.tf * LN(n.n_docs * 1.0 / df.df), 4) AS tfidf
    FROM tf JOIN df USING (term) CROSS JOIN n
    WHERE tf.tf >= 2
    """,
)
def llm_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF as a pure DataFrame pipeline: explode → two aggregations → join.
    Scale shape: tf shuffles on (doc,term); df is a tiny term-domain table
    that BROADCASTS back onto tf — no second big shuffle. N arrives via a
    broadcast 1-row cross join (never a driver-side collect)."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_tokens()).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # df derived from tf, not from a second explode of the corpus: tf has
    # exactly one row per distinct (doc, term), so COUNT per term ≡
    # COUNT(DISTINCT doc_id) over the token stream — one scan + explode
    # instead of two, and no distinct-aggregate expand (r12, guide §2.4;
    # Catalyst reuses tf's exchange for both consumers)
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .filter(F.col("tf") >= 2)
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") * 1.0 / F.col("df")), 4
            ).alias("tfidf"),
        )
    )


@register(
    "llm_token_regex",
    CAT,
    f"""
    SELECT doc_id,
           len({_TOKENS_SQL})                                        AS n_ws_tokens,
           len(regexp_extract_all({FOLD_TEXT}, '[a-z]{{1,4}}'))      AS n_subwords,
           ROUND(len(regexp_extract_all({FOLD_TEXT}, '[a-z]{{1,4}}')) * 1.0
                 / len({_TOKENS_SQL}), 4)                            AS subwords_per_token
    FROM documents
    """,
)
def llm_token_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting: greedy fixed-width subword chunks via
    regexp_extract_all — the cheap engine-side estimator for LLM token
    budgets (real BPE needs the merges table; greedy ≤4-char chunks are the
    standard length-proxy). Leftmost-greedy matching of this simple class
    is identical in Java regex and RE2, so it oracles cleanly. Pure map
    stage at any scale."""
    d = load_table(spark, sf_dir, "documents")
    # group index 0 = whole match on BOTH engines (Spark defaults to 1, DuckDB to 0)
    subwords = F.regexp_extract_all(F.expr(FOLD_TEXT), F.lit("[a-z]{1,4}"), 0)
    return d.select(
        "doc_id",
        F.size(_tokens()).alias("n_ws_tokens"),
        F.size(subwords).alias("n_subwords"),
        F.round(F.size(subwords) * 1.0 / F.size(_tokens()), 4).alias(
            "subwords_per_token"
        ),
    )


@register(
    "llm_fingerprint",
    CAT,
    f"""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct({_TOKENS_SQL})), ' ')) AS fingerprint,
           substr(md5(array_to_string(list_sort(list_distinct({_TOKENS_SQL})), ' ')), 1, 8) AS bucket
    FROM documents
    """,
)
def llm_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical document fingerprint: md5 over the sorted distinct token
    set. Word-order-insensitive (bag-of-words identity) — the cheap first
    pass before near-dup machinery; grouping on `fingerprint` IS exact
    bag-level dedup at any scale (hash-partitioned groupBy)."""
    d = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.array_join(F.sort_array(F.array_distinct(_tokens())), " "))
    return d.select(
        "doc_id", fp.alias("fingerprint"), F.substring(fp, 1, 8).alias("bucket")
    )


@register(
    "llm_text_clean",
    CAT,
    r"""
    WITH cleaned AS (
      SELECT doc_id, length(text) AS orig_len,
             CASE WHEN text IS NULL THEN NULL
                  ELSE array_to_string(list_filter(string_split(text, ' '),
                         x -> x NOT IN ('a','the','of','to','and','in')
                              AND x != ''), ' ')
             END AS clean
      FROM documents
    )
    SELECT doc_id,
           length(clean)            AS clean_chars,
           md5(clean)               AS clean_hash,
           orig_len - length(clean) AS removed_chars
    FROM cleaned
    """,
)
def llm_text_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    r"""Text-cleaning normalization stage: stopword removal (exact
    token-set filter) + whitespace collapse + trim, verified via md5 of
    the cleaned text so the oracle checks the exact output bytes, not
    just lengths.

    A map-only stage over the scan at any scale — the shape a real
    pipeline uses for boilerplate stripping and PII scrubbing.
    """
    d = load_table(spark, sf_dir, "documents")
    # token-level filter, NOT a \b regex (r11 Unicode campaign): Java's
    # \b is Unicode-aware (combining marks are word chars) while RE2's is
    # ASCII, so the same pattern removes different tokens around
    # non-ASCII — the word-set filter is byte-identical in both engines
    # and equivalent on space-separated text (collapse + trim included,
    # since empty tokens are dropped and the join is single-spaced).
    # NULL guard: concat-of-NULL-array is '' on Spark but NULL in DuckDB.
    clean = F.expr(
        "CASE WHEN text IS NULL THEN NULL"
        " ELSE concat_ws(' ', filter(split(text, ' '),"
        " x -> x NOT IN ('a','the','of','to','and','in')"
        " AND x != '')) END"
    )
    return d.select(
        "doc_id",
        F.length(clean).alias("clean_chars"),
        F.md5(clean).alias("clean_hash"),
        (F.length("text") - F.length(clean)).alias("removed_chars"),
    )
