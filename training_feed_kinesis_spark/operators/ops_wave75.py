"""Wave 75: sparse lexical similarity + language-model text analysis.

  * ``llm_sparse_cosine_pairs``: exact TF-IDF cosine over candidate
    pairs generated from RARE bigrams only (df ≤ 2% of docs) — the
    inverted-index / prefix-filtering shape of all-pairs similarity
    search (Bayardo et al., WWW'07): the quadratic step runs on the
    rare-term postings, never on the corpus.
  * ``llm_kneser_ney_bigram``: per-document NLL under an absolute-
    discount (D=0.75) interpolated Kneser–Ney bigram LM — the classic
    smoothing (Kneser & Ney 1995) whose continuation probability
    N1+(·w) fixes the "Francisco problem" plain interpolation has.
  * ``llm_term_burstiness``: per-term variance-to-mean ratio of
    per-doc counts (zeros included WITHOUT materializing them) — the
    Church–Gale burstiness screen separating topical from function
    words; fully integer-exact.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

CAT_TEXT = "2.J llm text analysis"

_W = "split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ')"
_W_SQL = "string_split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ')"

# doc → bigram pairs, one row per occurrence: (doc_id, u, w)
_BIG_SQL = f"""
    tok AS (SELECT doc_id, {_W_SQL} AS ws FROM documents),
    big AS (
      SELECT doc_id, ws[i] AS u, ws[i + 1] AS w
      FROM tok, UNNEST(generate_series(1, len(ws) - 1)) AS t(i)
    )
"""

_BIG_SPARK = (
    "transform(sequence(1, size(ws) - 1),"
    " i -> struct(element_at(ws, i) AS u, element_at(ws, i + 1) AS w))"
)


def _bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.expr(_W).alias("ws"))
        .filter(F.size("ws") >= 2)
        .select("doc_id", F.explode(F.expr(_BIG_SPARK)).alias("p"))
        .select("doc_id", F.col("p.u").alias("u"), F.col("p.w").alias("w"))
    )


@register(
    "llm_sparse_cosine_pairs",
    CAT_TEXT,
    f"""
    WITH {_BIG_SQL},
    tf AS (
      SELECT doc_id, u || ' ' || w AS term, COUNT(*)::BIGINT AS tf
      FROM big GROUP BY 1, 2
    ),
    nn AS (SELECT COUNT(*)::BIGINT AS n FROM documents),
    df AS (SELECT term, COUNT(*)::BIGINT AS df FROM tf GROUP BY 1),
    wt AS (
      SELECT tf.doc_id, tf.term,
             tf.tf * ln(CAST((SELECT n FROM nn) AS DOUBLE) / df.df) AS wgt
      FROM tf JOIN df USING (term)
    ),
    norms AS (SELECT doc_id, sqrt(SUM(wgt * wgt)) AS nrm FROM wt GROUP BY 1),
    rare AS (SELECT term FROM df WHERE df * 50 <= (SELECT n FROM nn)),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM tf a JOIN rare USING (term) JOIN tf b USING (term)
      WHERE a.doc_id < b.doc_id
    ),
    dots AS (
      SELECT c.doc_a, c.doc_b, COUNT(*)::BIGINT AS shared_terms,
             SUM(wa.wgt * wb.wgt) AS dot
      FROM cand c
      JOIN wt wa ON wa.doc_id = c.doc_a
      JOIN wt wb ON wb.doc_id = c.doc_b AND wb.term = wa.term
      GROUP BY 1, 2
    )
    SELECT d.doc_a, d.doc_b, d.shared_terms,
           ROUND(d.dot / (na.nrm * nb.nrm), 4) AS cosine
    FROM dots d
    JOIN norms na ON na.doc_id = d.doc_a
    JOIN norms nb ON nb.doc_id = d.doc_b
    """,
)
def llm_sparse_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact sparse TF-IDF cosine between documents that share a RARE
    bigram (df ≤ 2% of the corpus): candidates come from the rare-term
    postings lists — the inverted-index blocking of all-pairs
    similarity search — and only those pairs pay for the full
    dot-product join. Common terms never generate candidates, which is
    what keeps the join linear in the postings volume instead of
    quadratic in the corpus (same blocked-verify discipline as
    llm_dedup_near, but on weighted lexical vectors rather than
    MinHash sketches).

    Scale shape: tf/df censuses are map-combinable; the candidate join
    fans out only on terms pre-filtered to bounded df (the 2% cap IS
    the fan-out bound); norms and weights join back by doc key. At
    100 TB the df cap doubles as the skew guard — no hot term reaches
    the join."""
    d = load_table(spark, sf_dir, "documents")
    big = _bigrams(spark, sf_dir)
    tf = big.groupBy(
        "doc_id", F.concat_ws(" ", "u", "w").alias("term")
    ).agg(F.count(F.lit(1)).alias("tf"))
    nn = d.agg(F.count(F.lit(1)).alias("n"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    wt = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(nn))
        .select(
            "doc_id",
            "term",
            (
                F.col("tf")
                * F.log(F.col("n").cast("double") / F.col("df"))
            ).alias("wgt"),
        )
    )
    norms = wt.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("wgt") * F.col("wgt"))).alias("nrm")
    )
    rare = (
        df.crossJoin(F.broadcast(nn))
        .filter(F.col("df") * 50 <= F.col("n"))
        .select("term")
    )
    cand = (
        tf.alias("a")
        .join(F.broadcast(rare), "term")
        .join(tf.alias("b"), "term")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    wa, wb = wt.alias("wa"), wt.alias("wb")
    dots = (
        cand.join(wa, F.col("wa.doc_id") == F.col("doc_a"))
        .join(
            wb,
            (F.col("wb.doc_id") == F.col("doc_b"))
            & (F.col("wb.term") == F.col("wa.term")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).alias("shared_terms"),
            F.sum(F.col("wa.wgt") * F.col("wb.wgt")).alias("dot"),
        )
    )
    na, nb = norms.alias("na"), norms.alias("nb")
    return (
        dots.join(na, F.col("na.doc_id") == F.col("doc_a"))
        .join(nb, F.col("nb.doc_id") == F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            "shared_terms",
            F.round(F.col("dot") / (F.col("na.nrm") * F.col("nb.nrm")), 4).alias(
                "cosine"
            ),
        )
    )


@register(
    "llm_kneser_ney_bigram",
    CAT_TEXT,
    f"""
    WITH {_BIG_SQL},
    occ AS (
      SELECT doc_id, u, w, COUNT(*)::BIGINT AS tf FROM big GROUP BY 1, 2, 3
    ),
    bg AS (SELECT u, w, SUM(tf)::BIGINT AS c_uw FROM occ GROUP BY 1, 2),
    ctx AS (
      SELECT u, SUM(c_uw)::BIGINT AS c_u, COUNT(*)::BIGINT AS n1_fwd
      FROM bg GROUP BY 1
    ),
    cont AS (SELECT w, COUNT(*)::BIGINT AS n1_bwd FROM bg GROUP BY 1),
    types AS (SELECT COUNT(*)::BIGINT AS t FROM bg),
    probs AS (
      SELECT o.doc_id, o.tf,
             (GREATEST(CAST(bg.c_uw AS DOUBLE) - 0.75, 0)
              + 0.75 * ctx.n1_fwd * cont.n1_bwd / (SELECT t FROM types))
             / ctx.c_u AS p
      FROM occ o
      JOIN bg ON bg.u = o.u AND bg.w = o.w
      JOIN ctx ON ctx.u = o.u
      JOIN cont ON cont.w = o.w
    )
    SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_bigrams,
           ROUND(SUM(-tf * ln(p)) / SUM(tf), 4) AS kn_nll
    FROM probs GROUP BY doc_id
    """,
)
def llm_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document NLL under an interpolated Kneser–Ney bigram model
    (absolute discount D = 0.75): P(w|u) = max(c(uw)−D, 0)/c(u) +
    D·N1+(u·)/c(u) · N1+(·w)/T. The backoff mass goes to the
    CONTINUATION probability — how many distinct contexts precede w —
    not raw frequency, so boilerplate-locked tokens (frequent but
    context-bound) are correctly down-weighted. The third LM-based
    quality grade beside the unigram NLL and Jelinek-Mercer bigram
    interpolation, and the strongest of the three on word-order abuse.

    Scale shape: four corpus censuses (bigram, context, continuation,
    type count — all map-combinable, vocabulary-sized) broadcast back
    onto the per-doc occurrence table; one shuffle by doc for the final
    fold."""
    big = _bigrams(spark, sf_dir)
    occ = big.groupBy("doc_id", "u", "w").agg(F.count(F.lit(1)).alias("tf"))
    bg = occ.groupBy("u", "w").agg(F.sum("tf").alias("c_uw"))
    ctx = bg.groupBy("u").agg(
        F.sum("c_uw").alias("c_u"), F.count(F.lit(1)).alias("n1_fwd")
    )
    cont = bg.groupBy("w").agg(F.count(F.lit(1)).alias("n1_bwd"))
    types = bg.agg(F.count(F.lit(1)).alias("t"))
    p = (
        F.greatest(F.col("c_uw").cast("double") - 0.75, F.lit(0.0))
        + 0.75 * F.col("n1_fwd") * F.col("n1_bwd") / F.col("t")
    ) / F.col("c_u")
    probs = (
        occ.join(F.broadcast(bg), ["u", "w"])
        .join(F.broadcast(ctx), "u")
        .join(F.broadcast(cont), "w")
        .crossJoin(F.broadcast(types))
        .select("doc_id", "tf", p.alias("p"))
    )
    return probs.groupBy("doc_id").agg(
        F.sum("tf").cast("long").alias("n_bigrams"),
        F.round(F.sum(-F.col("tf") * F.log("p")) / F.sum("tf"), 4).alias(
            "kn_nll"
        ),
    )


@register(
    "llm_term_burstiness",
    CAT_TEXT,
    f"""
    WITH tok AS (
      SELECT doc_id, unnest({_W_SQL}) AS term FROM documents
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*)::BIGINT AS tf
      FROM tok WHERE term <> '' GROUP BY 1, 2
    ),
    nn AS (SELECT COUNT(*)::BIGINT AS n FROM documents),
    m AS (
      SELECT term, COUNT(*)::BIGINT AS df, SUM(tf)::BIGINT AS s1,
             SUM(tf * tf)::BIGINT AS s2
      FROM tf GROUP BY 1
    )
    SELECT term, df, s1 AS total_tf,
           ROUND(CAST(s2 * t.n - s1 * s1 AS DOUBLE)
                 / (CAST(s1 AS DOUBLE) * t.n), 4) AS vmr
    FROM m CROSS JOIN nn t
    """,
)
def llm_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-term burstiness: the variance-to-mean ratio of the term's
    per-document count ACROSS ALL documents — zero-count docs included
    without ever materializing them (VMR = (S₂·N − S₁²)/(S₁·N) needs
    only the census moments and the corpus size). VMR ≈ 1 is Poisson
    (function-word-like scatter); VMR ≫ 1 marks bursty, topical terms —
    the Church–Gale screen for keyword extraction and stopword lists.
    Entirely exact: one final double division of BIGINT moments.

    Scale shape: one (doc, term) census, one vocabulary-grain moment
    rollup against a broadcast scalar — the zeros identity removes the
    |vocab|×|docs| dense frame the naive spelling would build."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.expr("translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz')"), " ")).alias("term")
    ).filter(F.col("term") != "")
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    nn = d.agg(F.count(F.lit(1)).alias("n"))
    m = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("s1"),
        F.sum(F.col("tf") * F.col("tf")).alias("s2"),
    )
    return m.crossJoin(F.broadcast(nn)).select(
        "term",
        "df",
        F.col("s1").alias("total_tf"),
        F.round(
            (F.col("s2") * F.col("n") - F.col("s1") * F.col("s1")).cast(
                "double"
            )
            / (F.col("s1").cast("double") * F.col("n")),
            4,
        ).alias("vmr"),
    )
