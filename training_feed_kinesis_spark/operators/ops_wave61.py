"""Wave 61: Haar wavelet energy, ViT patch planning, empirical-Bayes
shrinkage.

  * ``ts_haar_energy``: unnormalized Haar wavelet decomposition of the
    daily value series — per-level detail energy, ALL in integer
    arithmetic (sums/differences of cents), so the multiscale signal
    fingerprint is exact on both engines.
  * ``multimodal_patch_plan``: vision-transformer patch tiling manifest
    (fit-to-224 → 16×16 grid of 14-px patches) with the attention
    sequence length and padding accounting per image batch.
  * ``events_eb_shrinkage``: per-user conversion rates shrunk toward the
    global prior (Beta-Binomial, method-of-moments) — the
    small-sample-safe per-entity estimate, reported per activity band.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

CAT_TS = "2.L time-series analytics"
CAT_MM = "2.J llm-pipeline (multimodal)"
CAT_STAT = "2.L statistics"

_HAAR_LEVELS = 4


def _haar_oracle() -> str:
    # level k: pairs of level k-1 approximations → sum (approx) and
    # difference (detail); unnormalized ⇒ everything stays BIGINT-exact
    ctes = [
        """
    a0 AS (
      SELECT ROW_NUMBER() OVER (ORDER BY d) - 1 AS i,
             CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS v
      FROM (SELECT date_trunc('day', ts) AS d, value FROM events
            WHERE ts IS NOT NULL)
      GROUP BY d
    )"""
    ]
    details = []
    for k in range(1, _HAAR_LEVELS + 1):
        prev = f"a{k - 1}"
        ctes.append(f"""
    a{k} AS (
      SELECT i // 2 AS i,
             MAX(CASE WHEN i % 2 = 0 THEN v END)
               + COALESCE(MAX(CASE WHEN i % 2 = 1 THEN v END), 0) AS v,
             MAX(CASE WHEN i % 2 = 0 THEN v END)
               - COALESCE(MAX(CASE WHEN i % 2 = 1 THEN v END), 0) AS dtl
      FROM {prev} GROUP BY i // 2
    )""")
        details.append(
            # exact integer energy (r11 magnitude lint, 5.3.9a): the
            # double SUM was exact only below 2^53 (crossed at ~5x
            # fixture scale); HUGEINT/DECIMAL moments are exact at any
            # scale, cast once, emitted UNROUNDED
            f"SELECT {k} AS level, COUNT(*)::BIGINT AS n_coeffs,"
            f" CAST(SUM(dtl * dtl) AS DOUBLE) / 1e4 AS detail_energy"
            f" FROM a{k}"
        )
    return (
        "WITH " + ",".join(ctes) + " " + " UNION ALL ".join(details)
    )


@register("ts_haar_energy", CAT_TS, _haar_oracle())
def ts_haar_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unnormalized Haar wavelet decomposition of the daily value series:
    at each level, adjacent approximation coefficients combine into a sum
    (next approximation) and a difference (detail); the per-level detail
    ENERGY (Σ detail²) localizes variance by timescale — day-to-day noise
    loads level 1, weekly structure loads level 3 (2³ days), a trend
    survives into the deepest approximation. The unnormalized transform
    keeps every coefficient an exact BIGINT of cents (an odd tail pairs
    with an implicit zero), so both engines agree bit-for-bit before the
    final energy descale.

    Scale shape: the data-sized work is the daily aggregate; the
    transform runs over an O(#days) frame per level with i→i//2 grouping
    — iterate on aggregates, and levels are log₂(#days) deep."""
    # NULL ts dropped on both engines (the r8 NULL-time seam)
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.sum(F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)")).cast("bigint").alias("v")
    )
    approx = daily.select(
        (F.row_number().over(Window.orderBy("d")) - 1).alias("i"), "v"
    ).localCheckpoint()
    out = []
    for k in range(1, _HAAR_LEVELS + 1):
        nxt = (
            approx.groupBy((F.col("i") / 2).cast("bigint").alias("i"))
            .agg(
                (
                    F.max(F.when(F.col("i") % 2 == 0, F.col("v")))
                    + F.coalesce(
                        F.max(F.when(F.col("i") % 2 == 1, F.col("v"))), F.lit(0)
                    )
                ).alias("v"),
                (
                    F.max(F.when(F.col("i") % 2 == 0, F.col("v")))
                    - F.coalesce(
                        F.max(F.when(F.col("i") % 2 == 1, F.col("v"))), F.lit(0)
                    )
                ).alias("dtl"),
            )
            .localCheckpoint()
        )
        out.append(
            nxt.agg(
                F.lit(k).cast("int").alias("level"),
                F.count(F.lit(1)).cast("bigint").alias("n_coeffs"),
                # per-term DECIMAL(38,0) widening (the vec_mmd_moment
                # pattern): exact integer energy at any scale, unrounded
                (
                    F.sum(
                        F.col("dtl").cast("decimal(38,0)")
                        * F.col("dtl").cast("decimal(38,0)")
                    ).cast("double")
                    / 1e4
                ).alias("detail_energy"),
            )
        )
        approx = nxt.select("i", "v")
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res


_PATCH = 14
_TARGET = 224


@register(
    "multimodal_patch_plan",
    CAT_MM,
    f"""
    WITH imgs AS (
      SELECT doc_id,
             64 + (doc_id * 13) % 961 AS w,
             64 + (doc_id * 29) % 961 AS h
      FROM documents WHERE doc_id % 3 = 1
    ),
    fitted AS (
      SELECT doc_id, w, h,
             -- fit the short side to 224 with integer flooring, then snap
             -- each side DOWN to whole patches
             CASE WHEN w <= h THEN {_TARGET}
                  ELSE (w * {_TARGET}) // h END AS fw,
             CASE WHEN w <= h THEN (h * {_TARGET}) // w
                  ELSE {_TARGET} END AS fh
      FROM imgs
    )
    SELECT doc_id, w, h,
           (fw // {_PATCH}) * (fh // {_PATCH}) AS n_patches,
           (fw // {_PATCH}) * (fh // {_PATCH}) + 1 AS seq_len,
           fw - (fw // {_PATCH}) * {_PATCH} AS crop_x,
           fh - (fh // {_PATCH}) * {_PATCH} AS crop_y
    FROM fitted
    """,
)
def multimodal_patch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vision-transformer patch tiling manifest: per image (synthetic
    w×h from doc_id — the typed-metadata stand-in), fit the short side
    to 224 px (integer scaling), snap both sides down to whole 14-px
    patches, and emit the patch count, the attention sequence length
    (patches + CLS), and the cropped remainder pixels. Pure integer
    arithmetic end-to-end, so the plan is exact on both engines.

    Scale shape: map-only — the manifest is the relational stage the
    loader uses to budget attention FLOPs (Σ seq_len² per batch) and to
    group images into same-seq-len buckets BEFORE any pixel is decoded;
    the decode kernel then touches only planned patches (the
    sampling-before-decode lever, same as frame sampling)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 1)
    imgs = d.select(
        "doc_id",
        (64 + (F.col("doc_id") * 13) % 961).alias("w"),
        (64 + (F.col("doc_id") * 29) % 961).alias("h"),
    )
    fitted = imgs.select(
        "doc_id",
        "w",
        "h",
        F.when(F.col("w") <= F.col("h"), F.lit(_TARGET))
        .otherwise(F.expr(f"(w * {_TARGET}) div h"))
        .alias("fw"),
        F.when(F.col("w") <= F.col("h"), F.expr(f"(h * {_TARGET}) div w"))
        .otherwise(F.lit(_TARGET))
        .alias("fh"),
    )
    np_ = F.expr(f"(fw div {_PATCH}) * (fh div {_PATCH})")
    return fitted.select(
        "doc_id",
        "w",
        "h",
        np_.alias("n_patches"),
        (np_ + 1).alias("seq_len"),
        F.expr(f"fw - (fw div {_PATCH}) * {_PATCH}").alias("crop_x"),
        F.expr(f"fh - (fh div {_PATCH}) * {_PATCH}").alias("crop_y"),
    )


@register(
    "events_eb_shrinkage",
    CAT_STAT,
    """
    WITH per_user AS (
      SELECT user_id, COUNT(*)::BIGINT AS n,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT
               AS k
      FROM events GROUP BY user_id
    ),
    prior AS (
      -- method-of-moments Beta prior from the per-user rate distribution
      SELECT AVG(CAST(k AS DOUBLE) / n) AS mu,
             SUM((CAST(k AS DOUBLE) / n - (SELECT AVG(CAST(k AS DOUBLE) / n)
                                           FROM per_user))
                 * (CAST(k AS DOUBLE) / n - (SELECT AVG(CAST(k AS DOUBLE) / n)
                                             FROM per_user)))
               / (COUNT(*) - 1) AS var
      FROM per_user
    ),
    ab AS (
      SELECT mu, var,
             mu * (mu * (1 - mu) / var - 1) AS alpha,
             (1 - mu) * (mu * (1 - mu) / var - 1) AS beta
      FROM prior
    ),
    banded AS (
      SELECT u.n, u.k, a.alpha, a.beta,
             NTILE(5) OVER (ORDER BY u.n, u.user_id) AS band
      FROM per_user u, ab a
    )
    SELECT band,
           COUNT(*)::BIGINT AS n_users,
           ROUND(AVG(CAST(k AS DOUBLE) / n), 4) AS raw_rate,
           ROUND(AVG((k + alpha) / (n + alpha + beta)), 4) AS shrunk_rate,
           ROUND(AVG(ABS(CAST(k AS DOUBLE) / n
                         - (k + alpha) / (n + alpha + beta))), 4)
             AS mean_shift
    FROM banded GROUP BY band
    """,
)
def events_eb_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes shrinkage of per-user purchase rates: a Beta prior
    fitted by method of moments from the observed rate distribution, each
    user's rate re-estimated as (k+α)/(n+α+β) — low-activity users pull
    strongly toward the prior mean, heavy users barely move. Reported per
    activity quintile: raw vs shrunk means and the mean absolute shift —
    the standard fix for ranking entities by rate when sample sizes vary
    wildly (per-source quality, per-producer error rates, CTRs).

    Scale shape: one user-grain aggregate; the prior is a 1-row broadcast
    scalar; banding is one NTILE sort over users."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("k"),
    )
    rate = F.col("k").cast("double") / F.col("n")
    mu_df = per_user.agg(F.avg(rate).alias("mu"))
    prior = (
        per_user.crossJoin(F.broadcast(mu_df))
        .agg(
            F.first("mu").alias("mu"),
            (
                F.sum((rate - F.col("mu")) * (rate - F.col("mu")))
                / (F.count(F.lit(1)) - 1)
            ).alias("var"),
        )
    )
    ab = prior.select(
        "mu",
        "var",
        (F.col("mu") * (F.col("mu") * (1 - F.col("mu")) / F.col("var") - 1)).alias(
            "alpha"
        ),
        (
            (1 - F.col("mu"))
            * (F.col("mu") * (1 - F.col("mu")) / F.col("var") - 1)
        ).alias("beta"),
    )
    banded = per_user.crossJoin(F.broadcast(ab)).withColumn(
        "band", F.ntile(5).over(Window.orderBy("n", "user_id"))
    )
    shrunk = (F.col("k") + F.col("alpha")) / (
        F.col("n") + F.col("alpha") + F.col("beta")
    )
    return banded.groupBy("band").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.round(F.avg(rate), 4).alias("raw_rate"),
        F.round(F.avg(shrunk), 4).alias("shrunk_rate"),
        F.round(F.avg(F.abs(rate - shrunk)), 4).alias("mean_shift"),
    )
