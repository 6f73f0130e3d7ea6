"""Wave 22: approx_top_k and DataSketches theta set operations
(Spark 4 sketch surface).

  * ``agg_approx_topk``: heavy-hitter top-k via the approx_top_k sketch —
    run in its exact regime here (cardinality ≪ maxItemsTracked), so the
    DuckDB oracle can hash-match it; at scale the same call degrades
    gracefully to approximate counts under fixed memory.
  * ``agg_theta_setops``: distinct-user set algebra WITHOUT joins —
    theta sketches for purchasers and clickers combined by
    union/intersection/difference, with the exact answers alongside and
    relative errors surfaced (rows-only: sketch estimates).

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

_K = 5


@register(
    "agg_approx_topk",
    CAT_AGG,
    f"""
    SELECT event_type AS item, COUNT(*) AS n,
           ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, event_type ASC)::BIGINT
             AS rk
    FROM events GROUP BY event_type
    ORDER BY n DESC, item ASC LIMIT {_K}
    """,
)
def agg_approx_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via the approx_top_k sketch: top-5 event types with
    counts. The event-type cardinality (5) sits far under the sketch's
    maxItemsTracked (10⁴), so the sketch operates in its EXACT regime
    and the plain GROUP BY oracle hash-matches — while the call itself
    is the fixed-memory one you would run over a 10⁹-key URL or n-gram
    column at 100 TB, where exact GROUP BY top-k needs a full shuffle
    and this needs a mergeable 10⁴-entry summary per partition."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql.window import Window

    topk = ev.agg(
        F.expr(f"approx_top_k(event_type, {_K})").alias("tk")
    ).select(F.explode("tk").alias("e"))
    w = Window.orderBy(F.col("n").desc(), F.col("item").asc())
    return (
        topk.select(
            F.col("e.item").alias("item"), F.col("e.count").alias("n")
        )
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .orderBy(F.col("n").desc(), F.col("item").asc())
        .limit(_K)
    )


@register("agg_theta_setops", CAT_AGG, None)  # sketch estimates — rows-only
def agg_theta_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user set algebra from mergeable theta sketches (Apache
    DataSketches, Spark 4): |purchasers|, |clickers|, |union|,
    |intersection| (purchasers who clicked), |difference| (purchasers who
    never clicked) — all from two sketches combined post-hoc, NO join and
    no second scan. This is the 100 TB audience-overlap primitive: store
    one sketch per segment per day, answer arbitrary set questions later
    from kilobytes. Exact companions (computed here by a bitmask
    aggregate for the eval) ride along with relative errors; the local
    test bounds them.

    Rows-only: theta estimates are approximate above sketch capacity by
    design."""
    ev = load_table(spark, sf_dir, "events")
    sk = ev.agg(
        F.expr(
            "theta_sketch_agg(CASE WHEN event_type = 'purchase' "
            "THEN user_id END)"
        ).alias("sp"),
        F.expr(
            "theta_sketch_agg(CASE WHEN event_type = 'click' "
            "THEN user_id END)"
        ).alias("sc"),
    ).select(
        F.expr("theta_sketch_estimate(sp)").alias("est_purchasers"),
        F.expr("theta_sketch_estimate(sc)").alias("est_clickers"),
        F.expr("theta_sketch_estimate(theta_union(sp, sc))").alias("est_union"),
        F.expr("theta_sketch_estimate(theta_intersection(sp, sc))").alias(
            "est_intersection"
        ),
        F.expr("theta_sketch_estimate(theta_difference(sp, sc))").alias(
            "est_difference"
        ),
    )
    flags = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "p"
        ),
        F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias(
            "c"
        ),
    )
    exact = flags.agg(
        F.sum("p").cast("long").alias("n_purchasers"),
        F.sum("c").cast("long").alias("n_clickers"),
        F.count_if((F.col("p") == 1) | (F.col("c") == 1))
        .cast("long")
        .alias("n_union"),
        F.count_if((F.col("p") == 1) & (F.col("c") == 1))
        .cast("long")
        .alias("n_intersection"),
        F.count_if((F.col("p") == 1) & (F.col("c") == 0))
        .cast("long")
        .alias("n_difference"),
    )
    return sk.crossJoin(F.broadcast(exact)).select(
        "est_purchasers",
        "n_purchasers",
        "est_clickers",
        "n_clickers",
        "est_union",
        "n_union",
        "est_intersection",
        "n_intersection",
        "est_difference",
        "n_difference",
    )
