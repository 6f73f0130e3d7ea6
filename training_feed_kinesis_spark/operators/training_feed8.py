"""Training-feed wave 8: contrastive hard negatives, span-corruption
planning.

  * ``llm_hard_negatives``: per-probe contrastive pairs — nearest
    same-label neighbor (positive) and the hardest different-label
    neighbors (high-cosine negatives), the mining step behind contrastive
    / embedding-model training batches.
  * ``llm_span_corruption``: T5-style span-corruption manifest — per
    document, deterministic hash-seeded mask spans with token coverage
    accounting (the corruption plan a denoising pretrain loader executes).

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

CAT_SIM = "2.J llm-pipeline (similarity)"
CAT_TEXT = "2.J llm-pipeline (text)"

# --- contrastive hard-negative mining --------------------------------------

_NQ = 50        # probe set (vec_id < 50), same convention as llm_sim_topk
_N_HARD = 3     # hard negatives per probe

_DOT_SQL = (
    "list_sum(list_transform(range(1, 65), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)
_NORM_SQL = "sqrt(list_sum(list_transform({v}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"

_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "0D, (acc, v) -> acc + v)"
)
_NORM = (
    "sqrt(aggregate(transform({v}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
    "0D, (acc, v) -> acc + v))"
)


@register(
    "llm_hard_negatives",
    CAT_SIM,
    f"""
    WITH pairs AS (
      SELECT a.vec_id AS query_id, a.label AS q_label,
             b.vec_id AS neighbor_id, b.label AS n_label,
             ROUND({_DOT_SQL.format(a='a.embedding', b='b.embedding')}
                   / ({_NORM_SQL.format(v='a.embedding')}
                      * {_NORM_SQL.format(v='b.embedding')}), 4) AS cosine
      FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
      WHERE a.vec_id < {_NQ}
    ),
    pos AS (
      SELECT query_id, neighbor_id, cosine,
             'positive' AS kind, 1::BIGINT AS rk
      FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY cosine DESC, neighbor_id ASC) AS rn
        FROM pairs WHERE n_label = q_label
      ) WHERE rn = 1
    ),
    neg AS (
      SELECT query_id, neighbor_id, cosine, 'hard_negative' AS kind,
             rn::BIGINT AS rk
      FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY cosine DESC, neighbor_id ASC) AS rn
        FROM pairs WHERE n_label != q_label
      ) WHERE rn <= {_N_HARD}
    )
    SELECT query_id, kind, rk, neighbor_id, cosine FROM pos
    UNION ALL
    SELECT query_id, kind, rk, neighbor_id, cosine FROM neg
    """,
)
def llm_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-batch mining: for each probe, the single nearest
    SAME-label neighbor (the positive) and the 3 highest-cosine
    DIFFERENT-label neighbors (hard negatives — the ones that actually
    move an embedding model). One probe×corpus scan scores everything;
    the two ranks are window filters over the same scored relation, so
    the corpus is read once.

    Scale shape: probes broadcast against the corpus scan (same shape as
    ``llm_sim_topk``); per-probe state is the top-(1+k) heap inside the
    window. At real scale the scored relation comes from the ANN index
    (llm_sim_lsh / llm_sim_ivf) instead of brute force — mining logic
    identical."""
    em = load_table(spark, sf_dir, "embeddings")
    probes = em.filter(F.col("vec_id") < _NQ).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("qe"),
    )
    corpus = em.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("n_label"),
        F.col("embedding").alias("ne"),
    )
    cos = F.round(
        F.expr(_DOT.format(a="qe", b="ne"))
        / (F.expr(_NORM.format(v="qe")) * F.expr(_NORM.format(v="ne"))),
        4,
    )
    pairs = (
        F.broadcast(probes)
        .crossJoin(corpus)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "q_label",
            "neighbor_id",
            "n_label",
            cos.alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    pos = (
        pairs.filter(F.col("n_label") == F.col("q_label"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "query_id",
            F.lit("positive").alias("kind"),
            F.lit(1).cast("long").alias("rk"),
            "neighbor_id",
            "cosine",
        )
    )
    neg = (
        pairs.filter(F.col("n_label") != F.col("q_label"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _N_HARD)
        .select(
            "query_id",
            F.lit("hard_negative").alias("kind"),
            F.col("rn").cast("long").alias("rk"),
            "neighbor_id",
            "cosine",
        )
    )
    return pos.unionByName(neg)


# --- T5-style span corruption ----------------------------------------------

_SPAN_LEN = 3


@register(
    "llm_span_corruption",
    CAT_TEXT,
    f"""
    WITH d AS (
      SELECT doc_id, len(string_split(lower(text), ' '))::BIGINT AS n
      FROM documents
    ),
    spans AS (
      SELECT doc_id, n,
             list_filter(range(1, n + 1),
               p -> substr(md5(doc_id::VARCHAR || ':' || p::VARCHAR), 1, 1)
                    = '0') AS starts
      FROM d
    )
    SELECT doc_id, n AS n_tokens,
           len(starts)::BIGINT AS n_spans,
           len(list_distinct(flatten(list_transform(starts,
               s -> list_filter([s, s + 1, s + 2], q -> q <= n)))))::BIGINT
             AS n_masked
    FROM spans
    """,
)
def llm_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span-corruption plan: every token position whose
    md5(doc:pos) first nibble is '0' (≈1/16 of positions) starts a
    3-token mask span; overlapping spans merge (distinct positions,
    clipped at the document end). Reports per document the span count and
    total masked-token coverage (expected ≈ 17%) — exactly the manifest a
    denoising pretrain loader needs, and deterministic across engines/
    re-runs, so the corruption is reproducible per epoch seed.

    Scale shape: entirely row-local array HOFs — zero shuffle, zero
    state; the heaviest term is O(n_tokens) per document."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.lower("text"), " ")).cast("long").alias("n"),
    )
    spans = d.select(
        "doc_id",
        "n",
        F.expr(
            "filter(sequence(1, n), "
            "p -> substring(md5(concat(cast(doc_id AS string), ':', "
            "cast(p AS string))), 1, 1) = '0')"
        ).alias("starts"),
    )
    return spans.select(
        "doc_id",
        F.col("n").alias("n_tokens"),
        F.size("starts").cast("long").alias("n_spans"),
        F.size(
            F.array_distinct(
                F.flatten(
                    F.expr(
                        f"transform(starts, s -> filter(array(s, s + 1, s + {_SPAN_LEN - 1}), "
                        "q -> q <= n))"
                    )
                )
            )
        )
        .cast("long")
        .alias("n_masked"),
    )
