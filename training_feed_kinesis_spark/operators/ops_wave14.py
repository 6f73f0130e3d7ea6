"""Wave 14: Johnson-Lindenstrauss projection audit, A/B uplift z-test.

  * ``vec_jl_projection``: deterministic ±1 random projection 64→16 with
    a pairwise-distance distortion report — the JL guarantee made
    measurable (the cheap alternative to learned dimension reduction).
  * ``events_uplift_ab``: hash-assigned A/B split with conversion-rate
    uplift and the pooled two-proportion z statistic — the experiment
    readout computed inside the warehouse.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

CAT_SIM = "2.J llm-pipeline (similarity)"
CAT_WORK = "2.M workloads"

_K = 16      # target dimension
_D = 64      # source dimension
_NV = 50     # vectors in the distortion probe set

# deterministic ±1 entry: parity of md5(i:j)'s first nibble — both engines
# derive the identical projection matrix from nothing but (i, j)
_SIGN_SPARK = (
    "CASE WHEN substring(md5(concat(cast(i AS string), ':', cast(j AS string))), 1, 1) "
    "IN ('0','2','4','6','8','a','c','e') THEN 1.0D ELSE -1.0D END"
)
_SIGN_SQL = (
    "CASE WHEN strpos('02468ace', substr(md5(i::VARCHAR || ':' || j::VARCHAR), 1, 1)) > 0 "
    "THEN 1.0 ELSE -1.0 END"
)

_PROJ_SPARK = (
    f"transform(sequence(1, {_K}), j -> "
    f"aggregate(zip_with({{x}}, sequence(1, {_D}), (v, i) -> "
    f"CAST(v AS DOUBLE) * ({_SIGN_SPARK})), 0D, (a, b) -> a + b) "
    f"/ sqrt(CAST({_K} AS DOUBLE)))"
)
_PROJ_SQL = (
    f"list_transform(range(1, {_K} + 1), j -> "
    f"list_sum(list_transform(range(1, {_D} + 1), i -> "
    f"CAST({{x}}[i] AS DOUBLE) * ({_SIGN_SQL}))) / sqrt({_K}))"
)

_DIST_SQL = (
    "sqrt(list_sum(list_transform(range(1, {n} + 1), "
    "i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) "
    "* (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)))))"
)
_DIST_SPARK = (
    "sqrt(aggregate(zip_with({a}, {b}, (x, y) -> "
    "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
    "0D, (acc, v) -> acc + v))"
)


@register(
    "vec_jl_projection",
    CAT_SIM,
    f"""
    WITH proj AS (
      SELECT vec_id, embedding,
             {_PROJ_SQL.format(x='embedding')} AS y
      FROM embeddings WHERE vec_id < {_NV}
    ),
    pairs AS (
      SELECT a.vec_id AS a_id, b.vec_id AS b_id,
             {_DIST_SQL.format(a='a.y', b='b.y', n=_K)}
               / NULLIF({_DIST_SQL.format(a='a.embedding', b='b.embedding',
                                          n=_D)}, 0) AS ratio
      FROM proj a JOIN proj b ON a.vec_id < b.vec_id
    )
    SELECT LEAST(FLOOR(ratio * 10), 19)::BIGINT AS ratio_bin,
           COUNT(*)::BIGINT AS n_pairs,
           ROUND(AVG(ratio), 4) AS mean_ratio
    FROM pairs WHERE ratio IS NOT NULL
    GROUP BY 1
    """,
)
def vec_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss audit: project 64-dim embeddings to 16 dims
    with a deterministic ±1/√k matrix (sign = md5(i:j) nibble parity —
    derivable everywhere from indices alone, no matrix to ship), then
    histogram the pairwise-distance ratios ‖Rx−Ry‖/‖x−y‖ over the probe
    set. JL says the mass concentrates near 1; the histogram SHOWS the
    spread at k=16 — the audit that prices a 4× bandwidth cut.

    Scale shape: the projection is row-local (the matrix is a formula,
    not data); only the _NV-probe distortion census pairs up, and at
    scale you audit a fixed sample exactly like this while the
    projection itself maps over the full corpus embarrassingly
    parallel."""
    em = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < _NV)
    proj = em.select(
        "vec_id",
        "embedding",
        F.expr(_PROJ_SPARK.format(x="embedding")).alias("y"),
    )
    a = proj.select(
        F.col("vec_id").alias("a_id"),
        F.col("embedding").alias("xa"),
        F.col("y").alias("ya"),
    )
    b = proj.select(
        F.col("vec_id").alias("b_id"),
        F.col("embedding").alias("xb"),
        F.col("y").alias("yb"),
    )
    ratio = F.expr(_DIST_SPARK.format(a="ya", b="yb")) / F.nullif(
        F.expr(_DIST_SPARK.format(a="xa", b="xb")), F.lit(0.0)
    )
    pairs = (
        a.crossJoin(b)
        .filter(F.col("a_id") < F.col("b_id"))
        .select(ratio.alias("ratio"))
        .filter(F.col("ratio").isNotNull())
    )
    return pairs.groupBy(
        F.least(F.floor(F.col("ratio") * 10), F.lit(19))
        .cast("long")
        .alias("ratio_bin")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.round(F.avg("ratio"), 4).alias("mean_ratio"),
    )


@register(
    "events_uplift_ab",
    CAT_WORK,
    """
    WITH assigned AS (
      SELECT user_id,
             CASE WHEN strpos('02468ace',
                    substr(md5(user_id::VARCHAR), 1, 1)) > 0
                  THEN 'A' ELSE 'B' END AS variant,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM events GROUP BY user_id
    ),
    arms AS (
      SELECT variant, COUNT(*)::DOUBLE AS n, SUM(converted)::DOUBLE AS c
      FROM assigned GROUP BY variant
    ),
    wide AS (
      SELECT
        MAX(CASE WHEN variant = 'A' THEN n END) AS na,
        MAX(CASE WHEN variant = 'A' THEN c END) AS ca,
        MAX(CASE WHEN variant = 'B' THEN n END) AS nb,
        MAX(CASE WHEN variant = 'B' THEN c END) AS cb
      FROM arms
    )
    SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b,
           ROUND(ca / na, 4) AS rate_a,
           ROUND(cb / nb, 4) AS rate_b,
           ROUND(cb / nb - ca / na, 4) AS uplift,
           ROUND((cb / nb - ca / na)
                 / NULLIF(sqrt((ca + cb) / (na + nb)
                               * (1 - (ca + cb) / (na + nb))
                               * (1 / na + 1 / nb)), 0), 4) AS z
    FROM wide
    """,
)
def events_uplift_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users hash-assigned to arms (md5 nibble
    parity — the assignment IS the salt, reproducible at serve and
    analysis time), conversion = any purchase; uplift and the pooled
    two-proportion z. The warehouse-side experiment analysis, next to
    ``stat_ttest_welch`` (means) and ``stat_bootstrap_ci`` (CIs).

    Scale shape: one user-keyed aggregate, then a 2-row pivot — the arm
    moments combine map-side; nothing after the first aggregate scales
    with data."""
    ev = load_table(spark, sf_dir, "events")
    assigned = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    ).select(
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1).isin(
                *"02468ace"
            ),
            "A",
        )
        .otherwise("B")
        .alias("variant"),
        "converted",
    )
    arms = assigned.groupBy("variant").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("converted").cast("double").alias("c"),
    )
    wide = arms.agg(
        F.max(F.when(F.col("variant") == "A", F.col("n"))).alias("na"),
        F.max(F.when(F.col("variant") == "A", F.col("c"))).alias("ca"),
        F.max(F.when(F.col("variant") == "B", F.col("n"))).alias("nb"),
        F.max(F.when(F.col("variant") == "B", F.col("c"))).alias("cb"),
    )
    p_pool = (F.col("ca") + F.col("cb")) / (F.col("na") + F.col("nb"))
    # NULLIF guard: a degenerate arm (every user converted ⇒ p_pool = 1)
    # zeroes the pooled variance; both engines then report z = NULL
    z = (F.col("cb") / F.col("nb") - F.col("ca") / F.col("na")) / F.nullif(
        F.sqrt(p_pool * (1 - p_pool) * (1 / F.col("na") + 1 / F.col("nb"))),
        F.lit(0.0),
    )
    return wide.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.round(F.col("ca") / F.col("na"), 4).alias("rate_a"),
        F.round(F.col("cb") / F.col("nb"), 4).alias("rate_b"),
        F.round(F.col("cb") / F.col("nb") - F.col("ca") / F.col("na"), 4).alias(
            "uplift"
        ),
        F.round(z, 4).alias("z"),
    )
