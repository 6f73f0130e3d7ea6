"""Seventh surface wave: behavioral embeddings, cached-plan reuse,
parameterized SQL, and product-quantization error.

  * ``events_user_similarity``: cosine similarity between users' behavioral
    profiles (event-type count vectors built FROM the relational log) —
    embeddings don't have to come from a model.
  * ``scan_cache_reuse``: explicit ``.cache()`` reuse of one expensive
    intermediate across two downstream rollups (the iterative-workload
    primitive; InMemoryRelation plan-asserted in tests).
  * ``sql_parameterized``: named-parameter ``spark.sql(..., args=...)``
    (Spark 3.4+) — injection-safe query templating.
  * ``vec_pq_error``: product-quantization reconstruction error per
    subspace (8×8 split of the 64-dim embeddings, label-coded codebooks) —
    the memory/recall trade behind every large ANN index.

transformWithStateInPandas (Spark 4 stateful API) was probed and is
UNAVAILABLE in this environment: the streaming python runner crashes on a
broken google.protobuf install (STREAMING_PYTHON_RUNNER_INITIALIZATION
_FAILURE); arbitrary stateful processing is covered by stream_stateful's
applyInPandasWithState instead.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md §0.1);
capability surface reconstructed per SURVEY.md §2 and BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load_table, parallelize
from .scans import scratch_dir

CAT_SIM = "2.J llm-pipeline (similarity)"
CAT_ENG = "2.L engine surface"
CAT_SQL = "2.L modern SQL"

N_USER_PROBES = 20
USER_TOPK = 5


@register(
    "events_user_similarity",
    CAT_SIM,
    f"""
    WITH prof AS (
      SELECT user_id, event_type, COUNT(*)::BIGINT AS c
      FROM events GROUP BY 1, 2
    ),
    norms AS (
      SELECT user_id, sqrt(SUM(c * c)) AS nrm FROM prof GROUP BY user_id
    ),
    dots AS (
      SELECT a.user_id AS ua, b.user_id AS ub, SUM(a.c * b.c)::BIGINT AS dot
      FROM prof a JOIN prof b ON a.event_type = b.event_type
      WHERE a.user_id < {N_USER_PROBES} AND a.user_id != b.user_id
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT ua, ub,
             ROUND(dot / (na.nrm * nb.nrm), 4) AS cosine
      FROM dots
      JOIN norms na ON na.user_id = ua
      JOIN norms nb ON nb.user_id = ub
    )
    SELECT ua, ub, cosine, rn AS rank_pos FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY ua
                ORDER BY cosine DESC, ub ASC) AS rn
      FROM scored) WHERE rn <= {USER_TOPK}
    """,
)
def events_user_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral nearest neighbors: each user's profile is their
    event-type count vector (built straight from the log — no model), and
    probe users (< 20) rank all others by cosine. Dot products come from
    an equi-join on the 5-type axis (never a user×user cross join);
    cosines are IEEE ops on exact integer counts, rounded before ranking.

    Scale: profiles are one combinable aggregate; the dot join fans out
    |probes|×|types| — the user×user pair space only exists post-grouping,
    already reduced to probe-side pairs with nonzero overlap.
    """
    ev = load_table(spark, sf_dir, "events")
    prof = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    norms = prof.groupBy("user_id").agg(
        F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("nrm")
    )
    a = prof.select(
        F.col("user_id").alias("ua"), "event_type", F.col("c").alias("ca")
    ).filter(F.col("ua") < N_USER_PROBES)
    b = prof.select(
        F.col("user_id").alias("ub"), "event_type", F.col("c").alias("cb")
    )
    dots = (
        a.join(b, "event_type")
        .filter(F.col("ua") != F.col("ub"))
        .groupBy("ua", "ub")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("dot"))
    )
    na = norms.select(F.col("user_id").alias("ua"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("user_id").alias("ub"), F.col("nrm").alias("nb"))
    scored = (
        dots.join(na, "ua")
        .join(nb, "ub")
        .select(
            "ua",
            "ub",
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), 4).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("ua").orderBy(F.col("cosine").desc(), F.col("ub").asc())
    return (
        scored.withColumn("rank_pos", F.row_number().over(w))
        .filter(F.col("rank_pos") <= USER_TOPK)
        .select("ua", "ub", "cosine", "rank_pos")
    )


def cached_rollups(spark: SparkSession, sf_dir: str):
    """Build the cached intermediate + two dependent rollups (shared with
    the plan test). Returns (cached_df, unioned_result)."""
    od = load_table(spark, sf_dir, "orders")
    base = (
        od.filter(F.year("o_orderdate") >= 1996)
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # exact integer cents (§5.3.6b): the cached intermediate and
            # both dependent rollups stay order-independent
            F.sum(F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"))
            .alias("total_c"),
        )
        .cache()
    )
    by_status = base.groupBy("o_orderstatus").agg(
        F.sum("n").cast("bigint").alias("n_orders"),
        (F.sum("total_c").cast("double") / 100.0).alias("revenue"),
    ).select(
        F.lit("by_status").alias("grain"),
        F.col("o_orderstatus").alias("key"),
        "n_orders",
        "revenue",
    )
    by_prio = base.groupBy("o_orderpriority").agg(
        F.sum("n").cast("bigint").alias("n_orders"),
        (F.sum("total_c").cast("double") / 100.0).alias("revenue"),
    ).select(
        F.lit("by_priority").alias("grain"),
        F.col("o_orderpriority").alias("key"),
        "n_orders",
        "revenue",
    )
    return base, by_status.unionByName(by_prio)


@register(
    "scan_cache_reuse",
    CAT_ENG,
    """
    WITH base AS (
      SELECT o_orderstatus, o_orderpriority, COUNT(*)::BIGINT AS n,
             SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS total_c
      FROM orders WHERE year(o_orderdate) >= 1996
      GROUP BY 1, 2
    )
    SELECT 'by_status' AS grain, o_orderstatus AS key,
           SUM(n)::BIGINT AS n_orders,
           CAST(SUM(total_c) AS DOUBLE) / 100.0 AS revenue
    FROM base GROUP BY o_orderstatus
    UNION ALL
    SELECT 'by_priority' AS grain, o_orderpriority AS key,
           SUM(n)::BIGINT AS n_orders,
           CAST(SUM(total_c) AS DOUBLE) / 100.0 AS revenue
    FROM base GROUP BY o_orderpriority
    """,
)
def scan_cache_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cached-intermediate reuse: one filtered aggregate is
    ``.cache()``d and two different rollups read it — the second consumer
    hits InMemoryRelation instead of rescanning parquet (plan-asserted).
    The result materializes while cached, then the cache is released —
    deterministic output, no leaked executor memory.

    Scale: THE pattern for iterative ML / multi-report jobs — at 100 TB
    you cache the 100 MB aggregate, never the raw scan, exactly as here.
    """
    base, unioned = cached_rollups(spark, sf_dir)
    out = scratch_dir("cache_reuse_")
    try:
        unioned.write.mode("overwrite").parquet(out)
    finally:
        base.unpersist()
    return spark.read.parquet(out)


@register(
    "sql_parameterized",
    CAT_SQL,
    """
    SELECT o_orderpriority, COUNT(*)::BIGINT AS n,
           CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS DOUBLE)
             / 100.0 AS revenue
    FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice > 1000.0
    GROUP BY o_orderpriority
    """,
)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter SQL (Spark 3.4+): the query text holds ``:status`` /
    ``:minprice`` placeholders and values bind through ``args`` — typed,
    injection-safe templating (the values never concatenate into the
    text). The bound plan is identical to the inlined spelling, which is
    exactly what the oracle asserts.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                    AS DOUBLE) / 100.0 AS revenue
        FROM orders_v
        WHERE o_orderstatus = :status AND o_totalprice > :minprice
        GROUP BY o_orderpriority
        """,
        args={"status": "F", "minprice": 1000.0},
    )


@register(
    "vec_pq_error",
    CAT_SIM,
    """
    WITH comp AS (
      SELECT label, pos, (pos - 1) // 8 AS subspace,
             CAST(embedding[pos] AS DOUBLE) AS x
      FROM embeddings, (SELECT unnest(range(1, 65)) AS pos)
    ),
    codebook AS (
      SELECT label, pos, AVG(x) AS cx FROM comp GROUP BY label, pos
    )
    SELECT c.subspace, COUNT(*)::BIGINT AS n_components,
           ROUND(sqrt(AVG((c.x - cb.cx) * (c.x - cb.cx))), 4) AS rmse
    FROM comp c JOIN codebook cb ON c.label = cb.label AND c.pos = cb.pos
    GROUP BY c.subspace
    """,
)
def vec_pq_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization reconstruction error: the 64-dim space splits
    into 8 subspaces of 8 dims; each subvector quantizes to its label's
    centroid (label-coded codebooks — same supervised shortcut as
    vec_quantize_int8, standing in for k-means-trained codewords), and the
    report is per-subspace RMSE — which subspaces lose the most signal
    under quantization. Complements the scalar int8 path: PQ is how a
    100 TB ANN index fits vectors in RAM (8 bytes/vector here vs 256).

    Scale: centroids are 640 aggregate states; the reconstruction join
    broadcasts them — one pass over components, no vector ever shuffles.
    """
    em = parallelize(load_table(spark, sf_dir, "embeddings"))
    comp = em.select(
        "label", F.posexplode("embedding").alias("pos0", "xf")
    ).select(
        "label",
        (F.col("pos0") + 1).alias("pos"),
        (F.col("pos0") / 8).cast("bigint").alias("subspace"),
        F.col("xf").cast("double").alias("x"),
    )
    codebook = comp.groupBy("label", "pos").agg(F.avg("x").alias("cx"))
    err = comp.join(F.broadcast(codebook), ["label", "pos"])
    return (
        err.groupBy("subspace")
        .agg(
            F.count(F.lit(1)).alias("n_components"),
            F.round(
                F.sqrt(F.avg((F.col("x") - F.col("cx")) * (F.col("x") - F.col("cx")))),
                4,
            ).alias("rmse"),
        )
    )
