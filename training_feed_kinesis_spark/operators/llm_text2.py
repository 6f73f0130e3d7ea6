"""Text analysis round 2: per-document keywords, sentence segmentation.

  * ``llm_keywords_topk``: the summarize-each-document primitive — rank each
    doc's terms by TF-IDF and keep the top 3. Reuses the exact token/TF-IDF
    definitions of ``llm_tfidf`` (split-on-space over lowered text, broadcast
    df/N), then a (doc-partitioned) ranking window over the scored terms.
    Ranking on the ROUNDED score with a term tiebreak keeps winners
    engine-stable.
  * ``fn_sentences``: Spark's ``sentences()`` (BreakIterator segmentation)
    over lightly punctuated text — the sentence-count / words-per-sentence
    profile every text-quality gate wants. The oracle reproduces the
    segmentation with split arithmetic over the same synthesized punctuation.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md §0.1);
capability surface reconstructed per SURVEY.md §2 and BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load_table

CAT = "2.J llm pipeline"

_TOKENS_SQL = "string_split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ')"


@register(
    "llm_keywords_topk",
    CAT,
    f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKENS_SQL}) AS term FROM documents
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*)::BIGINT AS tf FROM tok GROUP BY doc_id, term
    ),
    df AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             ROUND(tf.tf * LN(n.n_docs * 1.0 / df.df), 4) AS tfidf
      FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tfidf, rnk FROM (
      SELECT doc_id, term, tfidf,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, term) AS rnk
      FROM scored
    ) WHERE rnk <= 3
    """,
)
def llm_keywords_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF keywords per document. Same scale shape as
    ``llm_tfidf`` (tf shuffles on (doc, term); df and N broadcast back),
    plus one doc-partitioned ranking window — the per-entity top-k
    pattern, which never materializes a global sort.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.expr("translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz')"), " ")).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") * 1.0 / F.col("df")), 4
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.select("doc_id", "term", "tfidf", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 3)
    )


@register(
    "fn_sentences",
    CAT,
    """
    WITH punct AS (
      SELECT doc_id, replace(text, ' row ', '. Sent ') AS t FROM documents
    )
    -- printable-ASCII gate (r11 Unicode campaign): sentences() is a
    -- locale-aware BreakIterator whose boundaries on zero-width/BOM/
    -- NBSP text are JVM-locale-defined — not reproducible by split
    -- arithmetic — and an all-invisible doc segments to ZERO sentences
    -- (the element_at(s, 1) crash). Non-ASCII docs profile as NULL on
    -- both engines; the NULL-text arm keeps its r8 semantics.
    -- blank contract (r12 payload-extremes): empty text segments to []
    -- but whitespace-only to [[]] under BreakIterator — neither is a
    -- profile worth diverging over, so blank (trim-empty) text is ZERO
    -- sentences with NULL word fields on both engines
    SELECT doc_id,
           CASE WHEN t IS NULL OR regexp_matches(t, '[^ -~]') THEN NULL
                WHEN trim(t, ' ') = '' THEN 0
                ELSE len(string_split(t, '. '))::INT END AS n_sentences,
           -- words are NON-EMPTY tokens (r12 payload campaign): text
           -- with a trailing/leading/double space splits into empty
           -- tokens that BreakIterator word segmentation never emits
           CASE WHEN t IS NULL OR regexp_matches(t, '[^ -~]')
                  OR trim(t, ' ') = '' THEN NULL
                ELSE len(list_filter(string_split(split_part(t, '. ', 1), ' '),
                                     x -> x != ''))::INT
           END AS first_words,
           CASE WHEN t IS NULL OR regexp_matches(t, '[^ -~]')
                  OR trim(t, ' ') = '' THEN NULL
                ELSE list_filter(string_split(split_part(t, '. ', 1), ' '),
                                 x -> x != '')[1]
           END AS first_word
    FROM punct
    """,
)
def fn_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation with ``sentences()`` (locale-aware
    BreakIterator, JVM-side): documents get light punctuation synthesized
    in-plan, then segmented into sentence/word nests; the profile
    (sentence count, first-sentence width, first token) is the text-
    quality shape. The oracle reproduces the same boundaries by split
    arithmetic — so segmentation semantics are pinned cross-engine.
    """
    d = load_table(spark, sf_dir, "documents")
    punct = d.select(
        "doc_id", F.expr("replace(text, ' row ', '. Sent ')").alias("t")
    )
    # same printable-ASCII gate as the oracle; try_element_at keeps the
    # operator total when segmentation yields zero sentences. Blank text
    # is excluded from segmentation and pinned to n_sentences = 0 with
    # NULL word fields (sentences('') = [] but sentences(' ') = [[]] —
    # a BreakIterator quirk, not a semantics worth keeping).
    seg = punct.select(
        "doc_id",
        "t",
        F.expr(
            "CASE WHEN t IS NOT NULL AND t NOT RLIKE '[^ -~]'"
            " AND trim(t) != '' THEN sentences(t) END"
        ).alias("s"),
    )
    return seg.select(
        "doc_id",
        F.expr(
            "CASE WHEN t IS NOT NULL AND t NOT RLIKE '[^ -~]'"
            " AND trim(t) = '' THEN 0 ELSE size(s) END"
        ).alias("n_sentences"),
        F.size(F.expr("try_element_at(s, 1)")).alias("first_words"),
        F.expr("try_element_at(try_element_at(s, 1), 1)").alias("first_word"),
    )
