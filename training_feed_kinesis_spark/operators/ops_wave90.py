"""Wave 90: model diagnostics — permutation importance, learning curve —
plus the regexp_extract_all surface.

  * ``ml_permutation_importance``: AUC drop when each score feature is
    replaced by a DISTRIBUTION-PRESERVING md5 scramble (the features
    are uniform on their domains, so a keyed-hash uniform draw IS a
    permutation in distribution) — all four AUCs (base + three
    scrambles) from ONE scan via a variant dimension, each AUC exact
    via the integer rank identity.
  * ``ml_learning_curve``: Laplace-smoothed Naive Bayes trained on
    nested md5 subsets (4/8/12/15 of 15 train buckets) and scored on a
    held-out bucket — accuracy vs training-data volume, the curve that
    says whether more data or a better model is the next dollar.
  * ``fn_regexp_extract_all``: the multi-match regex family
    (regexp_extract_all + match counting) — census of ALL token
    matches per part name, not just the first.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table, release_after
from .ml_eval import _LABEL_SQL

CAT_ML = "2.L ML-relational"
CAT_FN = "2.H scalar functions"

# md5-keyed uniform draw on 0..n-1 from the row identity + a salt: the
# scramble that preserves a uniform feature's marginal distribution.
_H = (
    "(CAST(strpos('0123456789abcdef', substr(md5('{salt}' ||"
    " l_orderkey::VARCHAR || ':' || l_linenumber::VARCHAR), 1, 1)) - 1"
    " AS BIGINT) * 16"
    " + CAST(strpos('0123456789abcdef', substr(md5('{salt}' ||"
    " l_orderkey::VARCHAR || ':' || l_linenumber::VARCHAR), 2, 1)) - 1"
    " AS BIGINT))"
)
_H_SPARK = (
    "(CAST(locate(substring(md5(concat('{salt}', CAST(l_orderkey AS STRING),"
    " ':', CAST(l_linenumber AS STRING))), 1, 1), '0123456789abcdef') - 1"
    " AS BIGINT) * 16"
    " + CAST(locate(substring(md5(concat('{salt}', CAST(l_orderkey AS STRING),"
    " ':', CAST(l_linenumber AS STRING))), 2, 1), '0123456789abcdef') - 1"
    " AS BIGINT))"
)


def _score_terms(h: str) -> dict[str, str]:
    """The four score variants: base, and each feature replaced by an
    md5 draw uniform on its domain (quantity 1..50, discount 0..10,
    linenumber 1..7). {salt} differs per feature so draws are
    independent."""
    q = "cast(l_quantity as int)"
    d = "cast(round(l_discount * 100, 0) as int)"
    ln = "l_linenumber"
    o = "cast(l_orderkey % 10 as int)"
    hq = h.format(salt="q") + " % 50 + 1"
    hd = h.format(salt="d") + " % 11"
    hl = h.format(salt="l") + " % 7 + 1"
    return {
        "base": f"(({q} * 7 + {d} * 13 + {ln} * 3 + {o}) % 97)",
        "perm_quantity": f"((CAST({hq} AS INT) * 7 + {d} * 13 + {ln} * 3 + {o}) % 97)",
        "perm_discount": f"(({q} * 7 + CAST({hd} AS INT) * 13 + {ln} * 3 + {o}) % 97)",
        "perm_linenumber": f"(({q} * 7 + {d} * 13 + CAST({hl} AS INT) * 3 + {o}) % 97)",
    }


@register(
    "ml_permutation_importance",
    CAT_ML,
    f"""
    WITH b AS ({" UNION ALL ".join(
        f"SELECT '{name}' AS variant, {expr} AS score, {_LABEL_SQL} AS y"
        f" FROM lineitem WHERE l_orderkey IS NOT NULL"
        for name, expr in _score_terms(_H).items()
    )}),
    g AS (
      SELECT variant, score, COUNT(*)::BIGINT AS n, SUM(y)::BIGINT AS p
      FROM b GROUP BY 1, 2
    ),
    cum AS (
      SELECT variant, score, n, p, n - p AS neg,
             COALESCE(SUM(n - p) OVER (PARTITION BY variant ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cneg
      FROM g
    ),
    auc AS (
      SELECT variant,
             CAST((2 * (2 * SUM(p * cneg) + SUM(p * neg)) * 1000000
                   + 2 * SUM(p) * SUM(neg))
                  // (2 * 2 * SUM(p) * SUM(neg)) AS BIGINT) AS auc_x1e6
      FROM cum GROUP BY variant
    ),
    base AS (SELECT auc_x1e6 AS base_auc FROM auc WHERE variant = 'base')
    SELECT a.variant, a.auc_x1e6, b.base_auc,
           (b.base_auc - a.auc_x1e6)::BIGINT AS auc_drop_x1e6
    FROM auc a CROSS JOIN base b
    """,
)
def ml_permutation_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation importance of the portable score's three features:
    each variant replaces ONE feature with an md5-keyed uniform draw on
    that feature's own domain — since quantity, discount step, and
    linenumber are uniform, the draw preserves the marginal exactly,
    which is what permutation importance requires (break the
    feature↔label link, keep the distribution). The AUC of every
    variant is computed in the SAME scan via a variant dimension and
    the exact Mann–Whitney rank identity on integer score groups
    (ml_auc_rank's plan), emitted as integer half-up 1e-6 units; the
    drop vs base ranks the features.

    Scale shape: one scan exploded ×4 variants (row-local), a
    ≤97-group census per variant, windows over score groups — never
    over rows."""
    variants = _score_terms(_H_SPARK)
    # unscorable rows excluded: NULL l_orderkey NULLs both the base
    # score and every md5 scramble key (NULL-PK r9)
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey").isNotNull()
    )
    b = None
    for name, expr in variants.items():
        leg = li.select(
            F.lit(name).alias("variant"),
            F.expr(expr).alias("score"),
            F.expr(_LABEL_SQL).alias("y"),
        )
        b = leg if b is None else b.unionByName(leg)
    g = b.groupBy("variant", "score").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("p")
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("variant")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = g.select(
        "variant",
        "score",
        "n",
        "p",
        (F.col("n") - F.col("p")).alias("neg"),
        F.coalesce(
            F.sum(F.col("n") - F.col("p")).over(w), F.lit(0)
        ).alias("cneg"),
    )
    auc = cum.groupBy("variant").agg(
        F.expr(
            "CAST((2 * (2 * SUM(p * cneg) + SUM(p * neg)) * 1000000"
            " + 2 * SUM(p) * SUM(neg))"
            " DIV (2 * 2 * SUM(p) * SUM(neg)) AS BIGINT)"
        ).alias("auc_x1e6")
    )
    base = auc.filter(F.col("variant") == "base").select(
        F.col("auc_x1e6").alias("base_auc")
    )
    return auc.crossJoin(F.broadcast(base)).select(
        "variant",
        "auc_x1e6",
        "base_auc",
        (F.col("base_auc") - F.col("auc_x1e6")).cast("long").alias(
            "auc_drop_x1e6"
        ),
    )


# FLOOR-first before the INT cast (§5.3.6b): Spark's bare CAST truncates
# where DuckDB's rounds, so the band edges diverge the day l_quantity
# grows fractional values. FLOOR is identity on today's integral domain.
_QBAND = "CAST(FLOOR(l_quantity) AS INT) DIV 10"
_QBAND_DUCK = "CAST(FLOOR(l_quantity) AS INT) // 10"
_DBAND = "CAST(ROUND(l_discount * 100, 0) AS INT)"
_BUCKET = (
    "CAST(strpos('0123456789abcdef', substr(md5(l_orderkey::VARCHAR || '-'"
    " || l_linenumber::VARCHAR), 1, 1)) - 1 AS BIGINT)"
)
_BUCKET_SPARK = (
    "CAST(locate(substring(md5(concat(CAST(l_orderkey AS STRING), '-',"
    " CAST(l_linenumber AS STRING))), 1, 1), '0123456789abcdef') - 1"
    " AS BIGINT)"
)


@register(
    "ml_learning_curve",
    CAT_ML,
    f"""
    WITH rows_ AS (
      SELECT {_BUCKET} AS bkt, {_QBAND_DUCK} AS qb, {_DBAND} AS db,
             {_LABEL_SQL} AS y
      FROM lineitem
    ),
    sizes AS (SELECT unnest([4, 8, 12, 15]) AS train_buckets),
    -- per subset: class priors and per-(feature,value,class) counts
    prior AS (
      SELECT s.train_buckets, r.y, COUNT(*)::BIGINT AS n
      FROM rows_ r JOIN sizes s ON r.bkt < s.train_buckets
      GROUP BY 1, 2
    ),
    fq AS (
      SELECT s.train_buckets, r.y, r.qb AS v, COUNT(*)::BIGINT AS n
      FROM rows_ r JOIN sizes s ON r.bkt < s.train_buckets GROUP BY 1, 2, 3
    ),
    fd AS (
      SELECT s.train_buckets, r.y, r.db AS v, COUNT(*)::BIGINT AS n
      FROM rows_ r JOIN sizes s ON r.bkt < s.train_buckets GROUP BY 1, 2, 3
    ),
    -- distinct held-out cells with row multiplicity: scoring cost is
    -- |cells|, while w weights accuracy back to per-ROW grain
    evals AS (
      SELECT qb, db, y, COUNT(*)::BIGINT AS w
      FROM rows_ WHERE bkt = 15 GROUP BY 1, 2, 3
    ),
    scored AS (
      SELECT s.train_buckets, e.y AS truth, c.y AS cls,
             e.qb, e.db, e.w,
             ln((COALESCE(p.n, 0) + 1.0)
                / ((SELECT SUM(n) FROM prior pp
                    WHERE pp.train_buckets = s.train_buckets) + 2.0))
             + ln((COALESCE(q.n, 0) + 1.0) / (COALESCE(p.n, 0) + 6.0))
             + ln((COALESCE(d.n, 0) + 1.0) / (COALESCE(p.n, 0) + 11.0))
               AS loglik
      FROM evals e
      CROSS JOIN sizes s
      CROSS JOIN (SELECT unnest([0, 1]) AS y) c
      LEFT JOIN prior p ON p.train_buckets = s.train_buckets AND p.y = c.y
      LEFT JOIN fq q ON q.train_buckets = s.train_buckets AND q.y = c.y
        AND q.v = e.qb
      LEFT JOIN fd d ON d.train_buckets = s.train_buckets AND d.y = c.y
        AND d.v = e.db
    ),
    pred AS (
      SELECT train_buckets, truth, qb, db, MAX(w) AS w,
             MAX(CASE WHEN cls = 1 THEN loglik END)
               > MAX(CASE WHEN cls = 0 THEN loglik END) AS pred1
      FROM scored GROUP BY train_buckets, truth, qb, db
    )
    SELECT train_buckets,
           SUM(w)::BIGINT AS n_eval,
           CAST((2 * SUM(CASE WHEN (truth = 1) = pred1 THEN w ELSE 0 END)
                 * 10000 + SUM(w)) // (2 * SUM(w)) AS BIGINT)
             AS accuracy_x1e4
    FROM pred GROUP BY train_buckets
    """,
)
def ml_learning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learning curve: a Laplace-smoothed two-feature Naive Bayes
    (quantity band, discount step → returns label) is trained on NESTED
    md5 subsets — 4, 8, 12, then all 15 of the 16 hash buckets, bucket
    15 held out for evaluation — and held-out accuracy is reported per
    training volume. A rising curve says data is still the binding
    constraint; a flat one says the model class is. Nesting makes the
    points comparable (each training set contains the previous one —
    the heaps-law-curve subsetting applied to supervised learning).
    Scoring runs once per DISTINCT held-out (qb, db, y) cell and
    carries the cell's row multiplicity as a weight, so n_eval and
    accuracy_x1e4 are genuine per-ROW held-out metrics while the
    scoring join touches only |cells| rows.

    CAVEAT (grain): the split is by lineitem row hash, so rows of one
    order can span train and eval — fine for this within-table label;
    entity-level splits are events_time_split / split_train_test's job.

    Scale shape: training IS three censuses (prior, two feature
    tables), each map-combinable and shared across subset sizes via
    the bucket < K predicate — four models from one scan; scoring
    joins the tiny censuses back onto the held-out slice."""
    li = load_table(spark, sf_dir, "lineitem")
    rows_ = li.select(
        F.expr(_BUCKET_SPARK).alias("bkt"),
        F.expr(_QBAND).alias("qb"),
        F.expr(_DBAND).alias("db"),
        F.expr(_LABEL_SQL).alias("y"),
    )
    # cache + release_after: unpersisted when the returned frame dies
    # (r7 cache-residue class)
    rows_ = rows_.cache()
    sizes = spark.range(1).select(
        F.explode(
            F.array(F.lit(4), F.lit(8), F.lit(12), F.lit(15))
        ).alias("train_buckets")
    )
    train = rows_.crossJoin(F.broadcast(sizes)).filter(
        F.col("bkt") < F.col("train_buckets")
    )
    prior = train.groupBy("train_buckets", "y").agg(
        F.count(F.lit(1)).alias("n")
    )
    prior_tot = prior.groupBy("train_buckets").agg(
        F.sum("n").alias("tot")
    )
    fq = train.groupBy("train_buckets", "y", F.col("qb").alias("v")).agg(
        F.count(F.lit(1)).alias("n")
    )
    fd = train.groupBy("train_buckets", "y", F.col("db").alias("v")).agg(
        F.count(F.lit(1)).alias("n")
    )
    evals = (
        rows_.filter(F.col("bkt") == 15)
        .groupBy("qb", "db", "y")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    classes = spark.range(1).select(
        F.explode(F.array(F.lit(0), F.lit(1))).alias("cls")
    )
    p = prior.select(
        "train_buckets", F.col("y").alias("cls"), F.col("n").alias("pn")
    )
    q = fq.select(
        F.col("train_buckets").alias("q_tb"), F.col("y").alias("q_cls"),
        F.col("v").alias("qv"), F.col("n").alias("qn"),
    )
    dtab = fd.select(
        F.col("train_buckets").alias("d_tb"), F.col("y").alias("d_cls"),
        F.col("v").alias("dv"), F.col("n").alias("dn"),
    )
    # built stepwise to keep self-join keys unambiguous
    scored = (
        evals.crossJoin(F.broadcast(sizes))
        .crossJoin(F.broadcast(classes))
        .join(F.broadcast(p), ["train_buckets", "cls"], "left")
        .join(F.broadcast(prior_tot), "train_buckets")
    )
    scored = scored.join(
        F.broadcast(q),
        (F.col("train_buckets") == F.col("q_tb"))
        & (F.col("cls") == F.col("q_cls"))
        & (F.col("qb") == F.col("qv")),
        "left",
    ).join(
        F.broadcast(dtab),
        (F.col("train_buckets") == F.col("d_tb"))
        & (F.col("cls") == F.col("d_cls"))
        & (F.col("db") == F.col("dv")),
        "left",
    )
    loglik = (
        F.log(
            (F.coalesce(F.col("pn"), F.lit(0)) + 1.0)
            / (F.col("tot") + 2.0)
        )
        + F.log(
            (F.coalesce(F.col("qn"), F.lit(0)) + 1.0)
            / (F.coalesce(F.col("pn"), F.lit(0)) + 6.0)
        )
        + F.log(
            (F.coalesce(F.col("dn"), F.lit(0)) + 1.0)
            / (F.coalesce(F.col("pn"), F.lit(0)) + 11.0)
        )
    )
    pred = (
        scored.select(
            "train_buckets", "y", "qb", "db", "w", "cls",
            loglik.alias("loglik"),
        )
        .groupBy("train_buckets", F.col("y").alias("truth"), "qb", "db")
        .agg(
            F.max("w").alias("w"),
            (
                F.max(F.when(F.col("cls") == 1, F.col("loglik")))
                > F.max(F.when(F.col("cls") == 0, F.col("loglik")))
            ).alias("pred1"),
        )
    )
    out = pred.groupBy("train_buckets").agg(
        F.sum("w").cast("long").alias("n_eval"),
        F.expr(
            "CAST((2 * SUM(CASE WHEN (truth = 1) = pred1 THEN w ELSE 0 END)"
            " * 10000 + SUM(w)) DIV (2 * SUM(w)) AS BIGINT)"
        ).alias("accuracy_x1e4"),
    )
    return release_after(out, rows_)


@register(
    "fn_regexp_extract_all",
    CAT_FN,
    """
    WITH m AS (
      SELECT p_partkey,
             regexp_extract_all(p_name, '[a-z]{5,}') AS long_words,
             len(regexp_extract_all(p_name, '[a-z]{5,}'))::INT AS n_long
      FROM part
    )
    SELECT n_long, COUNT(*)::BIGINT AS n_parts,
           MIN(CASE WHEN n_long > 0
                    THEN array_to_string(long_words, ',') END) AS sample_min
    FROM m GROUP BY n_long
    """,
)
def fn_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-match regex extraction: regexp_extract_all pulls EVERY
    ≥5-letter word from part names (fn_regex covers first-match
    extraction; this is the all-occurrences surface), histogrammed by
    match count with a deterministic sample per bucket. The pattern
    sticks to POSIX-safe character classes per the §5.3 dialect rule.

    Scale shape: map-only extraction, domain-sized histogram."""
    part = load_table(spark, sf_dir, "part")
    m = part.select(
        "p_partkey",
        F.expr("regexp_extract_all(p_name, '[a-z]{5,}', 0)").alias(
            "long_words"
        ),
    ).select(
        "long_words", F.size("long_words").alias("n_long")
    )
    return m.groupBy("n_long").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.min(
            F.when(F.col("n_long") > 0, F.concat_ws(",", "long_words"))
        ).alias("sample_min"),
    )
