"""Wave 68: conformal prediction intervals, URL canonicalization.

  * ``ml_conformal_interval``: split-conformal intervals around the
    closed-form ridge model — the distribution-free coverage guarantee
    (quantile of held-out absolute residuals) that turns any point
    predictor into a calibrated interval predictor.
  * ``fn_url_canonicalize``: URL normalization (case, default ports,
    sorted query parameters) — the canonical form URL-keyed dedup and
    crawling frontiers key on.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

CAT_ML = "2.L ML-relational"
CAT_FN = "2.H scalar functions"

RIDGE_LAMBDA = 10.0  # same regularization as ml_ridge_closed_form


@register(
    "ml_conformal_interval",
    CAT_ML,
    f"""
    WITH m AS (
      SELECT AVG(l_quantity) AS mx1, AVG(l_discount) AS mx2,
             AVG(l_extendedprice) AS my,
             AVG(l_quantity * l_quantity) - AVG(l_quantity) * AVG(l_quantity)
               AS c11,
             AVG(l_quantity * l_discount) - AVG(l_quantity) * AVG(l_discount)
               AS c12,
             AVG(l_discount * l_discount) - AVG(l_discount) * AVG(l_discount)
               AS c22,
             AVG(l_quantity * l_extendedprice)
               - AVG(l_quantity) * AVG(l_extendedprice) AS c1y,
             AVG(l_discount * l_extendedprice)
               - AVG(l_discount) * AVG(l_extendedprice) AS c2y
      FROM lineitem WHERE l_orderkey % 2 = 0
    ),
    coef AS (
      SELECT mx1, mx2, my,
             ((c22 + {RIDGE_LAMBDA}) * c1y - c12 * c2y)
               / ((c11 + {RIDGE_LAMBDA}) * (c22 + {RIDGE_LAMBDA}) - c12 * c12)
               AS b1,
             ((c11 + {RIDGE_LAMBDA}) * c2y - c12 * c1y)
               / ((c11 + {RIDGE_LAMBDA}) * (c22 + {RIDGE_LAMBDA}) - c12 * c12)
               AS b2
      FROM m
    ),
    resid AS (
      SELECT ABS(l.l_extendedprice
                 - (c.my + c.b1 * (l.l_quantity - c.mx1)
                         + c.b2 * (l.l_discount - c.mx2))) AS r
      FROM lineitem l, coef c
      WHERE l.l_orderkey % 2 = 1
    )
    SELECT q AS coverage_pct,
           (SELECT COUNT(*) FROM resid)::BIGINT AS n_calibration,
           ROUND(CASE q
             WHEN 80 THEN percentile_cont(0.80) WITHIN GROUP (ORDER BY r)
             WHEN 90 THEN percentile_cont(0.90) WITHIN GROUP (ORDER BY r)
             ELSE percentile_cont(0.95) WITHIN GROUP (ORDER BY r)
           END, 4) AS half_width
    FROM resid, (SELECT unnest([80, 90, 95]) AS q)
    GROUP BY q
    """,
)
def ml_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals: fit the ridge model on the
    even-orderkey half (closed-form from moments, ml_ridge_closed_form's
    solver), score absolute residuals on the DISJOINT odd half, and take
    their 80/90/95% quantiles — ŷ ± half_width then covers a fresh point
    with at least that probability, distribution-free (the conformal
    guarantee needs only exchangeability, not Gaussian errors). The
    hash-disjoint calibration split is the same leakage discipline as
    split_train_test.

    Scale shape: one moment aggregate on the fit half, one broadcast of
    5 coefficients, one exact-percentile aggregate on the calibration
    half — two passes total, both map-combinable."""
    li = load_table(spark, sf_dir, "lineitem")
    fit = li.filter(F.col("l_orderkey") % 2 == 0)
    x1, x2, y = F.col("l_quantity"), F.col("l_discount"), F.col("l_extendedprice")
    m = fit.agg(
        F.avg(x1).alias("mx1"),
        F.avg(x2).alias("mx2"),
        F.avg(y).alias("my"),
        (F.avg(x1 * x1) - F.avg(x1) * F.avg(x1)).alias("c11"),
        (F.avg(x1 * x2) - F.avg(x1) * F.avg(x2)).alias("c12"),
        (F.avg(x2 * x2) - F.avg(x2) * F.avg(x2)).alias("c22"),
        (F.avg(x1 * y) - F.avg(x1) * F.avg(y)).alias("c1y"),
        (F.avg(x2 * y) - F.avg(x2) * F.avg(y)).alias("c2y"),
    )
    lam = F.lit(RIDGE_LAMBDA)
    det = (F.col("c11") + lam) * (F.col("c22") + lam) - F.col("c12") * F.col("c12")
    coef = m.select(
        "mx1",
        "mx2",
        "my",
        (((F.col("c22") + lam) * F.col("c1y") - F.col("c12") * F.col("c2y")) / det).alias("b1"),
        (((F.col("c11") + lam) * F.col("c2y") - F.col("c12") * F.col("c1y")) / det).alias("b2"),
    )
    calib = li.filter(F.col("l_orderkey") % 2 == 1)
    resid = calib.crossJoin(F.broadcast(coef)).select(
        F.abs(
            y
            - (
                F.col("my")
                + F.col("b1") * (x1 - F.col("mx1"))
                + F.col("b2") * (x2 - F.col("mx2"))
            )
        ).alias("r")
    )
    return resid.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_calibration"),
        *[
            F.round(F.expr(f"percentile(r, {q / 100.0})"), 4).alias(f"hw{q}")
            for q in (80, 90, 95)
        ],
    ).select(
        F.explode(
            F.map_from_arrays(
                F.array(F.lit(80), F.lit(90), F.lit(95)),
                F.array(F.col("hw80"), F.col("hw90"), F.col("hw95")),
            )
        ).alias("coverage_pct", "half_width"),
        "n_calibration",
    ).filter(
        # no calibration rows -> no intervals: the global agg always
        # emits one row, but the oracle's GROUP BY (correctly) emits
        # none over an empty calibration half — align to it instead of
        # fabricating three NULL-width rows (empty-corpus census r6)
        F.col("n_calibration") > 0
    ).select("coverage_pct", "n_calibration", "half_width")


@register(
    "fn_url_canonicalize",
    CAT_FN,
    """
    WITH raw AS (
      SELECT event_id,
             'HTTP://Example-' || (event_id % 7) || '.COM:80/path'
               || (event_id % 3) || '?b=' || (event_id % 5)
               || '&a=' || (event_id % 2)
               || CASE WHEN event_id % 2 = 0 THEN '&utm_source=feed'
                       ELSE '' END AS url
      FROM events WHERE event_id < 3000
    ),
    split1 AS (
      SELECT event_id, url,
             lower(string_split(url, '?')[1]) AS base,
             string_split(url, '?')[2] AS query
      FROM raw
    ),
    canon AS (
      SELECT event_id,
             replace(base, ':80/', '/')
             || '?' ||
             array_to_string(
               list_sort(list_filter(string_split(query, '&'),
                                     p -> NOT starts_with(p, 'utm_'))),
               '&') AS curl
      FROM split1
    )
    SELECT COUNT(*)::BIGINT AS n_urls,
           COUNT(DISTINCT curl)::BIGINT AS n_canonical,
           MIN(curl) AS first_canonical
    FROM canon
    """,
)
def fn_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization — the normal form URL-keyed dedup and crawl
    frontiers key on: lowercase scheme/host, strip the default :80 port,
    drop utm_* tracking parameters, and SORT the remaining query
    parameters (?b=..&a=.. ≡ ?a=..&b=..). Synthetic URLs derived from
    event ids exercise every rule; the report shows raw vs canonical
    cardinality — the dedup win canonicalization buys before any content
    hashing happens.

    Scale: row-local string/array expressions inside codegen; the
    aggregate ships three values."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 3000)
    raw = ev.select(
        "event_id",
        F.concat(
            F.lit("HTTP://Example-"),
            (F.col("event_id") % 7).cast("string"),
            F.lit(".COM:80/path"),
            (F.col("event_id") % 3).cast("string"),
            F.lit("?b="),
            (F.col("event_id") % 5).cast("string"),
            F.lit("&a="),
            (F.col("event_id") % 2).cast("string"),
            F.when(F.col("event_id") % 2 == 0, "&utm_source=feed").otherwise(""),
        ).alias("url"),
    )
    split1 = raw.select(
        "event_id",
        F.lower(F.element_at(F.split("url", "\\?"), 1)).alias("base"),
        F.element_at(F.split("url", "\\?"), 2).alias("query"),
    )
    canon = split1.select(
        "event_id",
        F.concat(
            F.replace(F.col("base"), F.lit(":80/"), F.lit("/")),
            F.lit("?"),
            F.array_join(
                F.array_sort(
                    F.filter(
                        F.split("query", "&"),
                        lambda p: ~p.startswith("utm_"),
                    )
                ),
                "&",
            ),
        ).alias("curl"),
    )
    return canon.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_urls"),
        F.countDistinct("curl").cast("bigint").alias("n_canonical"),
        F.min("curl").alias("first_canonical"),
    )
