"""Wave 107 — SemDeDup-style centroid prune (round 12).

``llm_semdedup_centroid_prune``: semantic deduplication by
cluster-centroid cosine (Abbas et al., "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication", 2023,
arXiv:2303.09540). Within each embedding cluster, members whose cosine
to the cluster centroid clears a threshold are treated as one semantic
group; the member with the LOWEST centroid cosine is kept as the
group's representative (the paper's low-similarity representative
choice, §3 — it preserves the most diversity) and the rest are pruned.
Members below the threshold pass through untouched.

This chains the existing pieces into the keeper pipeline the r11
verdict sketched: cluster assignment (the fixture's ``label`` column —
a production run feeds ml_kmeans_step assignments), centroid geometry
(llm_embed_stats' per-cluster moments), and the keeper-election shape
of llm_dedup_keeper_lsh, now over SEMANTIC rather than lexical groups.

Exactness discipline: embeddings quantize to the canonical 1e-4
integer grid (the wave-104 / llm_dedup_embed spelling), so centroid
coordinate sums, per-vector dots against the centroid, and squared
norms are all EXACT BIGINT aggregates — order-free in both engines.
The only floats are the final dot/(√v²·√s²) per vector (identical IEEE
ops on identical integers both engines; √ kept separate because
v²·s² overflows BIGINT). The election orders by that deterministic
scalar with a vec_id tiebreak (the r10 tie discipline).

Scale shape: quantize + posexplode are map-side; the centroid is a
(k·dim)-row aggregate — broadcast everywhere it is consumed; per-vector
dots partial-aggregate map-side so the shuffle carries (vec_id, label,
two BIGINTs); the election window partitions by cluster (bounded by
construction). Embedding payloads shuffle exactly once (the posexplode
repartition), as in every vec_* key.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load_table, parallelize

CAT = "2.J llm-pipeline (similarity)"

# Semantic-group admission: cos(vec, centroid) >= TAU. 0.25 sits at the
# fixture's upper quartile (median 0.15, max 0.47 at sf0.01) — groups
# are non-vacuous but not everything; production tunes per corpus
# (SemDeDup paper uses 1 - eps with eps in [0.005, 0.05] on k-means
# clusters of a trained encoder, far tighter than random fixtures allow).
SEMDEDUP_TAU = 0.25

_QUANT = "CAST(ROUND(CAST(x AS DOUBLE) * 10000, 0) AS BIGINT)"


@register(
    "llm_semdedup_centroid_prune",
    CAT,
    f"""
    WITH qv AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> {_QUANT}) AS q
      FROM embeddings
      WHERE vec_id IS NOT NULL AND embedding IS NOT NULL
            AND label IS NOT NULL
    ),
    ex AS (
      SELECT vec_id, label, pos, q[pos] AS qi
      FROM (SELECT vec_id, label, q,
                   unnest(range(1, len(q) + 1)) AS pos FROM qv)
    ),
    cent AS (SELECT label, pos, SUM(qi) AS s FROM ex GROUP BY label, pos),
    dots AS (
      SELECT e.vec_id, e.label,
             SUM(e.qi * c.s) AS dot, SUM(e.qi * e.qi) AS v2
      FROM ex e JOIN cent c ON c.label = e.label AND c.pos = e.pos
      GROUP BY e.vec_id, e.label
      HAVING SUM(e.qi * e.qi) > 0
    ),
    cn AS (SELECT label, SUM(s * s) AS s2 FROM cent GROUP BY label),
    scored AS (
      SELECT d.vec_id, d.label,
             d.dot / (sqrt(CAST(d.v2 AS DOUBLE))
                      * sqrt(CAST(c.s2 AS DOUBLE))) AS cosv
      FROM dots d JOIN cn c ON c.label = d.label
    ),
    ranked AS (
      SELECT vec_id, label, cosv,
             CASE WHEN cosv >= {SEMDEDUP_TAU} THEN
               ROW_NUMBER() OVER (
                 PARTITION BY label, (cosv >= {SEMDEDUP_TAU})
                 ORDER BY cosv ASC, vec_id ASC)
             END AS rn
      FROM scored
    )
    SELECT vec_id, label,
           ROUND(cosv, 4) AS cos_centroid,
           CASE WHEN cosv < {SEMDEDUP_TAU} THEN 'pass'
                WHEN rn = 1 THEN 'keep'
                ELSE 'drop' END AS action
    FROM ranked
    """,
)
def llm_semdedup_centroid_prune(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SemDeDup centroid prune (see module docstring): per cluster, the
    >=tau centroid-cosine group keeps its lowest-cosine member, prunes
    the rest; sub-threshold members pass. NULL-label / NULL-id /
    zero-quantized vectors are quarantined (no cluster membership or no
    direction — both engines drop them identically)."""
    em = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id").isNotNull()
        & F.col("embedding").isNotNull()
        & F.col("label").isNotNull()
    )
    ex = parallelize(em).select(
        "vec_id",
        "label",
        F.posexplode(
            F.expr(f"transform(embedding, x -> {_QUANT})")
        ).alias("pos0", "qi"),
    )
    cent = ex.groupBy("label", "pos0").agg(F.sum("qi").alias("s"))
    dots = (
        ex.join(F.broadcast(cent), ["label", "pos0"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum(F.col("qi") * F.col("s")).alias("dot"),
            F.sum(F.col("qi") * F.col("qi")).alias("v2"),
        )
        .filter(F.col("v2") > 0)
    )
    cn = cent.groupBy("label").agg(F.sum(F.col("s") * F.col("s")).alias("s2"))
    cosv = F.col("dot") / (
        F.sqrt(F.col("v2").cast("double")) * F.sqrt(F.col("s2").cast("double"))
    )
    scored = dots.join(F.broadcast(cn), "label").select(
        "vec_id", "label", cosv.alias("cosv")
    )
    above = F.col("cosv") >= SEMDEDUP_TAU
    w = Window.partitionBy("label", above).orderBy(
        F.col("cosv").asc(), F.col("vec_id").asc()
    )
    ranked = scored.withColumn(
        "rn", F.when(above, F.row_number().over(w))
    )
    return ranked.select(
        "vec_id",
        "label",
        F.round("cosv", 4).alias("cos_centroid"),
        F.when(~above, F.lit("pass"))
        .when(F.col("rn") == 1, F.lit("keep"))
        .otherwise(F.lit("drop"))
        .alias("action"),
    )
