"""Wave 41: CUPED variance reduction, measured LSH candidate volume.

  * ``events_cuped_adjust``: CUPED (Deng et al. 2013, "Improving the
    sensitivity of online controlled experiments") — use each user's
    pre-period activity as a control covariate: θ = cov(pre,post)/var(pre),
    adjusted = post − θ·(pre − mean_pre). Reports the raw vs adjusted
    treatment effect and the variance reduction the covariate bought —
    the standard upgrade over the plain A/B readout
    (``events_uplift_ab``).
  * ``llm_lsh_candidate_volume``: the MEASURED companion of
    ``llm_lsh_tuning_curve`` — for each (bands, rows) split of the 8
    MinHash signatures, hash actual band keys and count the candidate
    pairs Σ C(n,2) the bucket join would emit, plus bucket census. The
    S-curve predicts collision probability; this op prices the shuffle
    on the real corpus.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table
from .llm_dedup import _MINHASH_SQL, _minhash_sigs

CAT_WORK = "2.M workloads"
CAT_DEDUP = "2.J llm-pipeline (dedup)"

CUPED_SPLIT = "2024-01-15"   # pre-period before, post-period from this date
BAND_CONFIGS = ((8, 1), (4, 2), (2, 4))   # (bands, rows) with b*r = 8


@register(
    "events_cuped_adjust",
    CAT_WORK,
    f"""
    WITH users AS (
      SELECT user_id,
             CASE WHEN strpos('02468ace',
                    substr(md5(user_id::VARCHAR), 1, 1)) > 0
                  THEN 'A' ELSE 'B' END AS variant,
             COALESCE(SUM(CASE WHEN ts < TIMESTAMP '{CUPED_SPLIT}'
                               THEN value END), 0) AS pre,
             COALESCE(SUM(CASE WHEN ts >= TIMESTAMP '{CUPED_SPLIT}'
                               THEN value END), 0) AS post
      FROM events GROUP BY user_id
    ),
    m AS (
      SELECT AVG(pre) AS mpre,
             (AVG(pre * post) - AVG(pre) * AVG(post))
             / (AVG(pre * pre) - AVG(pre) * AVG(pre)) AS theta
      FROM users
    ),
    adj AS (
      SELECT u.variant, u.post,
             u.post - m.theta * (u.pre - m.mpre) AS cuped
      FROM users u CROSS JOIN m
    )
    SELECT COUNT(*)::BIGINT AS n_users,
           ROUND((SELECT theta FROM m), 4) AS theta,
           ROUND(AVG(CASE WHEN variant = 'A' THEN post END)
                 - AVG(CASE WHEN variant = 'B' THEN post END), 4)
             AS effect_raw,
           ROUND(AVG(CASE WHEN variant = 'A' THEN cuped END)
                 - AVG(CASE WHEN variant = 'B' THEN cuped END), 4)
             AS effect_cuped,
           ROUND(1.0 - (AVG(cuped * cuped) - AVG(cuped) * AVG(cuped))
                       / (AVG(post * post) - AVG(post) * AVG(post)), 4)
             AS var_reduction
    FROM adj
    """,
)
def events_cuped_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-adjusted experiment readout: per user, pre-period (before
    Jan 15) activity is the covariate for the post-period metric;
    θ = cov(pre,post)/var(pre) from one moment aggregate, the adjusted
    metric subtracts the predictable component, and `var_reduction`
    (= pre/post correlation², by construction) is how much experiment
    runtime the covariate saves. Same md5 nibble assignment as
    events_uplift_ab, so both readouts describe the same experiment.

    Scale shape: one user-grain aggregate over the fact table, one
    broadcast 1-row moment graft, one final combinable aggregate — the
    user table never shuffles twice."""
    ev = load_table(spark, sf_dir, "events")
    is_a = F.instr(
        F.lit("02468ace"), F.substring(F.md5(F.col("user_id").cast("string")), 1, 1)
    ) > 0
    pre = F.coalesce(
        F.sum(F.when(F.col("ts") < CUPED_SPLIT, F.col("value"))), F.lit(0.0)
    )
    post = F.coalesce(
        F.sum(F.when(F.col("ts") >= CUPED_SPLIT, F.col("value"))), F.lit(0.0)
    )
    users = ev.groupBy("user_id").agg(
        F.when(F.first(is_a), "A").otherwise("B").alias("variant"),
        pre.alias("pre"),
        post.alias("post"),
    )
    m = users.agg(
        F.avg("pre").alias("mpre"),
        (
            (F.avg(F.col("pre") * F.col("post")) - F.avg("pre") * F.avg("post"))
            / (F.avg(F.col("pre") * F.col("pre")) - F.avg("pre") * F.avg("pre"))
        ).alias("theta"),
    )
    adj = users.crossJoin(F.broadcast(m)).select(
        "variant",
        "post",
        "theta",
        (F.col("post") - F.col("theta") * (F.col("pre") - F.col("mpre"))).alias(
            "cuped"
        ),
    )
    mean_if = lambda v, c: F.avg(F.when(F.col("variant") == v, F.col(c)))  # noqa: E731
    var_of = lambda c: F.avg(F.col(c) * F.col(c)) - F.avg(c) * F.avg(c)  # noqa: E731
    return adj.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.round(F.first("theta"), 4).alias("theta"),
        F.round(mean_if("A", "post") - mean_if("B", "post"), 4).alias(
            "effect_raw"
        ),
        F.round(mean_if("A", "cuped") - mean_if("B", "cuped"), 4).alias(
            "effect_cuped"
        ),
        F.round(1.0 - var_of("cuped") / var_of("post"), 4).alias(
            "var_reduction"
        ),
    )


def _band_cfg_sql() -> str:
    rows = ", ".join(f"({b}, {r})" for b, r in BAND_CONFIGS)
    return f"(VALUES {rows}) c(b, r)"


@register(
    "llm_lsh_candidate_volume",
    CAT_DEDUP,
    f"""
    WITH sigs AS ({_MINHASH_SQL}),
    cfg AS (SELECT * FROM {_band_cfg_sql()}),
    keys AS (
      SELECT c.b, c.r, s.doc_id, s.seed // c.r AS band,
             md5(string_agg(s.minhash, '' ORDER BY s.seed)) AS bkey
      FROM sigs s CROSS JOIN cfg c
      GROUP BY c.b, c.r, s.doc_id, s.seed // c.r
    ),
    buckets AS (
      SELECT b, r, band, bkey, COUNT(*)::BIGINT AS n
      FROM keys GROUP BY b, r, band, bkey
    )
    SELECT b AS bands, r AS rows_per_band,
           COUNT(*)::BIGINT AS n_buckets,
           CAST(SUM(n * (n - 1) // 2) AS BIGINT) AS candidate_pairs,
           MAX(n)::BIGINT AS max_bucket,
           CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS singleton_buckets
    FROM buckets GROUP BY b, r
    """,
)
def llm_lsh_candidate_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured LSH candidate volume: band the 8 MinHash signatures three
    ways ((8,1)/(4,2)/(2,4)), key each (doc, band) by the md5 of its
    in-band signature concat (seed-ordered — deterministic in both
    engines), and count the pairs Σ C(n,2) each config's bucket join
    would actually emit. More bands/shorter rows → more candidates
    (higher recall, bigger shuffle); this table + llm_lsh_tuning_curve's
    probabilities are the two sides of the dedup cost/recall decision.

    Scale shape: signatures aggregate map-side (8 rows/doc); band keying
    is one hash-keyed aggregate; the census runs over buckets, never
    materializing a single candidate pair — pricing the join costs
    O(buckets), paying for it costs O(candidate_pairs)."""
    sigs = _minhash_sigs(spark, sf_dir)
    cfg = spark.createDataFrame(list(BAND_CONFIGS), "b int, r int")
    keys = (
        sigs.crossJoin(F.broadcast(cfg))
        .groupBy("b", "r", "doc_id", F.floor(F.col("seed") / F.col("r")).alias("band"))
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("seed", "minhash"))),
                        lambda s: s.minhash,
                    ),
                    "",
                )
            ).alias("bkey")
        )
    )
    buckets = keys.groupBy("b", "r", "band", "bkey").agg(
        F.count(F.lit(1)).alias("n")
    )
    return buckets.groupBy("b", "r").agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        # integer `div`, not `/`: float terms/sums lose exactness past 2^53
        F.sum(F.expr("(n * (n - 1)) div 2")).cast("long").alias(
            "candidate_pairs"
        ),
        F.max("n").cast("long").alias("max_bucket"),
        F.sum(F.when(F.col("n") == 1, 1).otherwise(0)).cast("long").alias(
            "singleton_buckets"
        ),
    ).select(
        F.col("b").alias("bands"),
        F.col("r").alias("rows_per_band"),
        "n_buckets",
        "candidate_pairs",
        "max_bucket",
        "singleton_buckets",
    )
