"""ML primitives as relational plans: K-means step, model scoring, PCA.

The point: classic "ML infra" loops are, per iteration, just joins and
aggregations — spelled that way they inherit Spark's scale-out for free.

  * K-means (one Lloyd iteration): centroids are domain-sized → broadcast;
    assignment is a map-side nearest-centroid fold over the embedding array
    (sequential ``aggregate`` HOF — deterministic, JVM-side); the update is
    one hash-agg. Per-iteration cost: ONE pass over the vectors, no shuffle
    until the update agg.
  * Linear-model scoring: fixed weight vector folded over each embedding —
    the batch-inference shape (broadcast weights, one map-side pass, no
    shuffle at all until the report agg).
  * PCA power iteration: the covariance matrix is never materialized —
    each iteration is two matvecs (y = Xv, z = Xᵀy) over the EXPLODED
    (row, dim, value) relation: join on dim, agg on row, join on row, agg
    on dim. State between iterations is a 64-row vector. Three unrolled
    iterations; the oracle unrolls the same algebra in CTEs, so even this
    linear-algebra loop is hash-checked cross-engine.

All distances/scores are rounded at the report boundary (§5.3 discipline);
argmins carry explicit id tiebreaks so both engines elect identical winners.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md §0.1);
capability surface reconstructed per SURVEY.md §2 and BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .llm_similarity import VEC_ADMIT_SQL, load_embeddings_admitted
from ..tables import load_table

CAT = "2.L ML-relational"

_K = 4  # centroid seeds: vec_id 0..3 (deterministic)
_DIM = 64


@register(
    "ml_kmeans_step",
    CAT,
    f"""
    WITH {VEC_ADMIT_SQL},
    c AS (
      SELECT vec_id AS cid, embedding AS ce FROM embeddings_adm
      WHERE vec_id < {_K}
    ),
    d AS (
      SELECT e.vec_id, c.cid,
             SUM((e.embedding[i] - c.ce[i]) ^ 2) AS d2
      FROM embeddings_adm e
      CROSS JOIN c
      CROSS JOIN generate_series(1, {_DIM}) AS g(i)
      GROUP BY e.vec_id, c.cid
    ),
    assign AS (
      SELECT vec_id, cid, d2,
             row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
      FROM d
    )
    SELECT cid AS cluster,
           COUNT(*)::BIGINT AS n_members,
           ROUND(AVG(d2), 4) AS mean_d2,
           ROUND(MAX(d2), 4) AS max_d2
    FROM assign WHERE rn = 1
    GROUP BY cid
    """,
)
def ml_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd iteration of K-means (k=4, seeds = vec_id 0..3): assign
    every embedding to its nearest centroid (squared L2), report cluster
    occupancy and dispersion. Centroids ride a broadcast cross join;
    the distance is a JVM-side zip_with/aggregate fold per pair, and the
    argmin is a one-pass ``min_by`` with (d2, cid) tiebreak — no ranking
    join-back. At 100 TB the per-iteration cost stays one scan + one agg.
    """
    emb = load_embeddings_admitted(spark, sf_dir)
    cents = emb.filter(F.col("vec_id") < _K).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")
    )
    d2 = F.expr(
        "aggregate(zip_with(embedding, ce, (x, y) -> CAST((x - y) * (x - y) AS DOUBLE)),"
        " 0D, (acc, v) -> acc + v)"
    )
    pairs = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id", "cid", d2.alias("d2")
    )
    best = pairs.groupBy("vec_id").agg(
        F.expr("min_by(struct(cid, d2), struct(d2, cid))").alias("b")
    )
    return best.groupBy(F.col("b.cid").alias("cluster")).agg(
        F.count(F.lit(1)).alias("n_members"),
        F.round(F.avg("b.d2"), 4).alias("mean_d2"),
        F.round(F.max("b.d2"), 4).alias("max_d2"),
    )


@register(
    "ml_linear_score",
    CAT,
    f"""
    WITH {VEC_ADMIT_SQL},
    scored AS (
      SELECT e.vec_id, e.label,
             SUM(e.embedding[i] * (((i % 7) - 3) / 10.0)) AS score
      FROM embeddings_adm e
      CROSS JOIN generate_series(1, {_DIM}) AS g(i)
      GROUP BY e.vec_id, e.label
    )
    SELECT label,
           (score > 0)::INT AS predicted,
           COUNT(*)::BIGINT AS n,
           ROUND(AVG(score), 4) AS avg_score
    FROM scored
    GROUP BY label, (score > 0)::INT
    """,
)
def ml_linear_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch inference with a fixed linear model: weights w_i=((i%7)-3)/10
    (exact rationals, engine-portable) folded over each embedding — the
    broadcast-weights scoring pattern: zero shuffles until the per-label
    confusion report. The fold runs as a JVM-side zip_with + aggregate.
    """
    emb = load_embeddings_admitted(spark, sf_dir)
    score = F.expr(
        f"aggregate(zip_with(embedding, sequence(1, {_DIM}),"
        " (x, i) -> CAST(x AS DOUBLE) * (((i % 7) - 3) / 10.0)),"
        " 0D, (acc, v) -> acc + v)"
    )
    scored = emb.select("vec_id", "label", score.alias("score"))
    return scored.groupBy(
        "label", (F.col("score") > 0).cast("int").alias("predicted")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("score"), 4).alias("avg_score"),
    )


def _pca_oracle() -> str:
    """Three power-iteration steps as unrolled CTEs over the exploded
    (row, dim, value) relation: v_{k+1} = normalize(Xᵀ (X v_k))."""
    head = f"""
    WITH {VEC_ADMIT_SQL},
    x AS (
      SELECT vec_id AS r, i, embedding[i]::DOUBLE AS v
      FROM embeddings_adm CROSS JOIN generate_series(1, {_DIM}) AS g(i)
    ),
    v0 AS (SELECT i, 1.0 / sqrt({_DIM}) AS val
           FROM generate_series(1, {_DIM}) AS g(i))
    """
    steps = []
    for k in range(1, 4):
        steps.append(
            f""",
    y{k} AS (
      SELECT x.r, SUM(x.v * v{k - 1}.val) AS yv
      FROM x JOIN v{k - 1} ON x.i = v{k - 1}.i GROUP BY x.r
    ),
    z{k} AS (
      SELECT x.i, SUM(x.v * y{k}.yv) AS zv
      FROM x JOIN y{k} ON x.r = y{k}.r GROUP BY x.i
    ),
    v{k} AS (
      SELECT i, zv / (SELECT sqrt(SUM(zv * zv)) FROM z{k}) AS val FROM z{k}
    )"""
        )
    tail = """
    SELECT i AS dim, ROUND(val, 4) AS component
    FROM v3
    """
    return head + "".join(steps) + tail


@register("vec_pca_power", CAT, _pca_oracle())
def vec_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant principal direction of the embedding corpus by three power
    iterations over the 64×64 Gram matrix, computed in ONE distributed
    pass.

    At D=64 the Gram matrix is 32 KB — O(D²) state, independent of row
    count — so the 100 TB shape is a tree-aggregate: each Arrow batch
    contributes a numpy ``XᵀX`` partial (vectorized, no per-row Python),
    partials are summed, and the three power steps run on the driver
    against the tiny matrix (Xᵀ(Xv) = Gv, identical algebra to the
    oracle's unrolled CTEs). One job, zero joins, zero shuffles of
    data-scale relations — versus the round-1 spelling's two shuffles per
    step and compounding broadcast lineage. Per-batch partials collect as
    one 4096-double row per Arrow batch (≈ one per partition): at 1000
    executors that is a few MB of iteration state, not data movement.
    """
    import numpy as np
    import pandas as pd

    emb = load_embeddings_admitted(spark, sf_dir)

    def gram_partials(batches):
        for pdf in batches:
            x = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            if len(x):
                yield pd.DataFrame({"g": [(x.T @ x).ravel().tolist()]})

    parts = emb.select("embedding").mapInPandas(gram_partials, "g array<double>")
    partials = parts.collect()
    if not partials:
        # empty corpus (no Arrow batches at all): the oracle's CTE chain
        # (correctly) yields no rows; proceeding would fabricate 64 NaN
        # loadings from the 0/0 normalization. Guarding on PARTIALS, not
        # gram content: a non-empty corpus of all-zero vectors still has
        # input rows, and there the oracle emits 64 NULL-ish loadings —
        # which the NaN normalization path below matches (census r6,
        # refined by code review).
        return spark.createDataFrame([], "dim INT, component DOUBLE")
    gram = np.zeros(_DIM * _DIM, dtype=np.float64)
    for row in partials:
        gram += np.asarray(row["g"], dtype=np.float64)
    gram = gram.reshape(_DIM, _DIM)
    v = np.full(_DIM, 1.0 / _DIM**0.5)
    for _ in range(3):
        z = gram @ v
        v = z / float(np.sqrt((z * z).sum()))
    return spark.createDataFrame(
        [(i + 1, float(c)) for i, c in enumerate(v)], "dim INT, component DOUBLE"
    ).select("dim", F.round("component", 4).alias("component"))
