"""Wave 34: semantic dedup cells, readability scoring, MATTR diversity.

  * ``llm_semdedup_cell``: SemDeDup (Abbas et al. 2023) — assign embeddings
    to coarse cells by nearest seed centroid, drop within-cell semantic
    duplicates above a cosine threshold, report per-cell reduction. The
    embedding-space twin of MinHash dedup: catches paraphrases that share
    no shingles.
  * ``llm_readability_score``: Flesch reading-ease per source from three
    regex censuses (sentences, words, vowel-group syllables) — the classic
    fluency gate a curation waterfall applies after language-ID.
  * ``llm_mattr``: moving-average type-token ratio (window 50) — the
    length-robust lexical-diversity score (plain TTR collapses as docs get
    longer; MATTR doesn't), used alongside quality NLL.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load_table, parallelize, release_after
from .llm_similarity import (
    _DOT,
    _DOT_SQL,
    _NORM_SQL,
    VEC_ADMIT_SQL,
    load_embeddings_admitted,
)

CAT_SIM = "2.J llm-pipeline (similarity)"
CAT_TEXT = "2.J llm-pipeline (text)"

N_CELLS = 8           # seed centroids: vec_id < 8 (deterministic, engine-free)
SEM_DUP_COS = 0.35    # fixture embeddings are random; max pairwise ≈ 0.5-0.6
MATTR_W = 50          # MATTR window length in tokens


@register(
    "llm_semdedup_cell",
    CAT_SIM,
    f"""
    WITH {VEC_ADMIT_SQL},
    cent AS (
      SELECT vec_id AS cell_id, embedding AS c_emb FROM embeddings_adm
      WHERE vec_id < {N_CELLS}
    ),
    assign AS (
      SELECT vec_id, cell_id,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC,
                                cell_id ASC) AS rn
      FROM (
        SELECT e.vec_id, c.cell_id,
               ROUND({_DOT_SQL.format(a='e.embedding', b='c.c_emb')}
                     / ({_NORM_SQL.format(v='e.embedding')}
                        * {_NORM_SQL.format(v='c.c_emb')}), 4) AS cos
        FROM embeddings_adm e CROSS JOIN cent c
      )
    ),
    cells AS (
      SELECT a.vec_id, a.cell_id, e.embedding
      FROM assign a JOIN embeddings_adm e ON e.vec_id = a.vec_id
      WHERE a.rn = 1
    ),
    dropped AS (
      SELECT DISTINCT b.vec_id
      FROM cells a JOIN cells b
        ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
      WHERE ROUND({_DOT_SQL.format(a='a.embedding', b='b.embedding')}
                  / ({_NORM_SQL.format(v='a.embedding')}
                     * {_NORM_SQL.format(v='b.embedding')}), 4)
            >= {SEM_DUP_COS}
    )
    SELECT c.cell_id,
           COUNT(*)::BIGINT AS n_vectors,
           COUNT(d.vec_id)::BIGINT AS n_dropped,
           ROUND(1.0 - COUNT(d.vec_id)::DOUBLE / COUNT(*), 4) AS keep_rate,
           MIN(c.vec_id)::BIGINT AS first_vec
    FROM cells c LEFT JOIN dropped d ON d.vec_id = c.vec_id
    GROUP BY c.cell_id
    """,
)
def llm_semdedup_cell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: coarse-quantize embeddings into cells (nearest of 8 seed
    centroids, ranked on ROUND(cos,4) with cell-id tiebreak — never raw
    floats across engines), then inside each cell drop any vector whose
    rounded cosine to a LOWER-id cell-mate reaches the threshold (keeper =
    lowest id, transitivity-free — matching the paper's pairwise rule).

    Scale shape: assignment is map-side (8 centroids broadcast, 8 dots per
    row, no shuffle); the pair join shuffles on cell_id only, and the n²
    is per-CELL, not per-corpus — exactly the bound an IVF coarse
    quantizer buys. A hot cell (skewed quantizer) is re-split by raising
    N_CELLS for that region — the operator's cell census IS the monitor
    for that decision."""
    em = load_embeddings_admitted(spark, sf_dir)
    cent = em.filter(F.col("vec_id") < N_CELLS).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("c_emb")
    )
    scored = (
        parallelize(em)
        .crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            "embedding",
            "cell_id",
            F.round(
                F.expr(_DOT.format(a="embedding", b="c_emb"))
                / (
                    F.sqrt(F.expr(_DOT.format(a="embedding", b="embedding")))
                    * F.sqrt(F.expr(_DOT.format(a="c_emb", b="c_emb")))
                ),
                4,
            ).alias("cos"),
        )
    )
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.col("cos").desc(), F.col("cell_id").asc()
    )
    # Norm precomputed per SIDE (one HOF per vector) and the assigned-cells
    # relation cached: the naive spelling re-derived the assignment window
    # three times (a, b, census) and evaluated 3 dots per PAIR (dot + both
    # norms) — measured 12.5 s → ~3 s at sf0.1 from these two changes.
    cells = (
        scored.withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id",
            "cell_id",
            "embedding",
            F.sqrt(F.expr(_DOT.format(a="embedding", b="embedding"))).alias(
                "norm"
            ),
        )
        # cache + release_after: unpersisted when the returned frame dies
        # (r7 cache-residue class)
        .cache()
    )
    a = cells.select(
        F.col("cell_id"),
        F.col("vec_id").alias("a_id"),
        F.col("embedding").alias("a_emb"),
        F.col("norm").alias("a_norm"),
    )
    b = cells.select(
        F.col("cell_id"),
        F.col("vec_id").alias("b_id"),
        F.col("embedding").alias("b_emb"),
        F.col("norm").alias("b_norm"),
    )
    pair_cos = F.round(
        F.expr(_DOT.format(a="a_emb", b="b_emb"))
        / (F.col("a_norm") * F.col("b_norm")),
        4,
    )
    dropped = (
        a.join(b, "cell_id")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(pair_cos >= SEM_DUP_COS)
        .select(F.col("b_id").alias("vec_id"))
        .distinct()
        .withColumn("is_dropped", F.lit(1))
    )
    return release_after(
        cells.join(dropped, "vec_id", "left")
        .groupBy("cell_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vectors"),
            F.count("is_dropped").cast("long").alias("n_dropped"),
            F.round(
                1.0 - F.count("is_dropped").cast("double") / F.count(F.lit(1)),
                4,
            ).alias("keep_rate"),
            F.min("vec_id").cast("long").alias("first_vec"),
        ),
        cells,
    )


@register(
    "llm_readability_score",
    CAT_TEXT,
    """
    WITH census AS (
      SELECT source,
             GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS sents,
             GREATEST(len(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z]+')), 1)
               AS words,
             len(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[aeiouy]+')) AS sylls
      FROM documents
    ),
    scored AS (
      SELECT source,
             206.835 - 1.015 * (words::DOUBLE / sents)
                     - 84.6 * (sylls::DOUBLE / words) AS flesch
      FROM census
    )
    SELECT source,
           COUNT(*)::BIGINT AS n_docs,
           ROUND(AVG(flesch), 4) AS avg_flesch,
           ROUND(AVG(CASE WHEN flesch < 30 THEN 1.0 ELSE 0.0 END), 4)
             AS hard_share
    FROM scored GROUP BY source
    """,
)
def llm_readability_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading ease per source: 206.835 − 1.015·(words/sentences) −
    84.6·(syllables/words), with sentences = `[.!?]+` runs, words =
    letter runs, syllables ≈ vowel-group runs — the standard
    dictionary-free approximation, identical regexes in both engines
    (shared RE2/Java subset: character classes + `+` only).

    Scale shape: three regexp censuses per row, map-side; the shuffle
    carries one (source, 3 ints) tuple per doc into a low-cardinality
    aggregate. The `hard_share` column (score < 30) is the gate-rate a
    curation waterfall would act on."""
    d = load_table(spark, sf_dir, "documents")
    sents = F.greatest(
        F.size(F.expr("regexp_extract_all(text, '[.!?]+', 0)")), F.lit(1)
    )
    words = F.greatest(
        F.size(F.expr("regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z]+', 0)")),
        F.lit(1),
    )
    sylls = F.size(F.expr("regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[aeiouy]+', 0)"))
    flesch = (
        F.lit(206.835)
        - 1.015 * (words.cast("double") / sents)
        - 84.6 * (sylls.cast("double") / words)
    )
    return (
        d.select("source", flesch.alias("flesch"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(F.avg("flesch"), 4).alias("avg_flesch"),
            F.round(
                F.avg(F.when(F.col("flesch") < 30, 1.0).otherwise(0.0)), 4
            ).alias("hard_share"),
        )
    )


@register(
    "llm_mattr",
    CAT_TEXT,
    f"""
    WITH toks AS (
      SELECT doc_id, lang, string_split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ') AS tok
      FROM documents
    ),
    scored AS (
      SELECT doc_id, lang, len(tok)::BIGINT AS n_tokens,
             CASE WHEN len(tok) <= {MATTR_W}
                  THEN len(list_distinct(tok))::DOUBLE / len(tok)
                  ELSE list_sum([len(list_distinct(tok[i:i+{MATTR_W - 1}]))
                                 for i in range(1, len(tok) - {MATTR_W} + 2)]
                       )::DOUBLE
                       / ({MATTR_W}.0 * (len(tok) - {MATTR_W} + 1))
             END AS mattr
      FROM toks WHERE len(tok) >= 1
    )
    SELECT lang,
           COUNT(*)::BIGINT AS n_docs,
           ROUND(AVG(mattr), 4) AS avg_mattr,
           ROUND(MIN(mattr), 4) AS min_mattr,
           ROUND(AVG(CASE WHEN mattr < 0.5 THEN 1.0 ELSE 0.0 END), 4)
             AS repetitive_share
    FROM scored GROUP BY lang
    """,
)
def llm_mattr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving-average type-token ratio (Covington & McFall 2010), window
    50: slide a 50-token window over each doc, take distinct-count/50 per
    window, average. Docs shorter than one window fall back to plain TTR.
    Numerically robust across engines: the per-window distinct counts are
    INTEGER sums (exact in both engines regardless of fold order); one
    double division happens at the end.

    Scale shape: entirely row-local (token array + window distinct counts
    per row — per-row compute O(n·w), memory O(n), same bound class as
    llm_winnow's short branch); the only shuffle is the per-language
    aggregate. The `repetitive_share` (MATTR < 0.5) is the boilerplate
    gate rate."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang", F.split(F.expr("translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz')"), " ").alias("tok")
    ).filter(F.size("tok") >= 1)
    n = F.size("tok")
    plain_ttr = F.size(F.array_distinct("tok")).cast("double") / n
    win_sum = F.expr(
        f"aggregate(transform(sequence(1, size(tok) - {MATTR_W} + 1), "
        f"i -> size(array_distinct(slice(tok, i, {MATTR_W})))), "
        "0L, (acc, x) -> acc + x)"
    )
    mattr = F.when(n <= MATTR_W, plain_ttr).otherwise(
        win_sum.cast("double") / (float(MATTR_W) * (n - MATTR_W + 1))
    )
    scored = toks.select(
        "doc_id", "lang", n.cast("long").alias("n_tokens"), mattr.alias("mattr")
    )
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(F.avg("mattr"), 4).alias("avg_mattr"),
        F.round(F.min("mattr"), 4).alias("min_mattr"),
        F.round(
            F.avg(F.when(F.col("mattr") < 0.5, 1.0).otherwise(0.0)), 4
        ).alias("repetitive_share"),
    )
