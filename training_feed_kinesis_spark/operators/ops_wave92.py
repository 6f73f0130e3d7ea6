"""Wave 92 (round 5): the four surface gaps a registry audit left open.

  * ``sample_reservoir_fixedk``: EXACTLY-k uniform sample (the sampling
    mode the family lacked — ``sample_hash`` is a rate, not a size;
    ``sample_per_group`` is per-key). Spelled as a deterministic global
    top-k over a hash order, which Spark executes as
    TakeOrderedAndProject: per-partition partial top-k then a k-row
    merge on the driver — the distributed-reservoir plan, never a full
    sort, never more than k rows leaving any partition.
  * ``win_percent_rank_cume``: percent_rank + cume_dist — the two
    normalized-rank window functions missing from §2.E.
  * ``ts_forecast_mase``: seasonal-naive forecast accuracy (MASE,
    Hyndman & Koehler 2006) on daily revenue — the scale-free metric
    that makes forecast errors comparable across series; every operand
    integer cents until the final ratio.
  * ``dq_pii_census``: multi-field regex PII audit (id-like digit
    runs, emails, phone shapes) with per-(field, pattern) hit rates —
    the pre-release redaction gate. Patterns live in the RE2∩Java
    common subset so both engines match identically; detection power
    on REAL pii strings is proven by a planted-fixture test (the
    synthetic corpus itself is clean — which the census also proves).

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

CAT_SAMPLE = "2.L sampling"
CAT_WIN = "2.E windows"
CAT_TS = "2.L timeseries"
CAT_DQ = "2.L data quality"

# k strictly below the 500-doc test corpus so the sample genuinely
# selects (a k ≥ |corpus| run would be a vacuous pass-through)
_RESERVOIR_K = 100


@register(
    "sample_reservoir_fixedk",
    CAT_SAMPLE,
    f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE doc_id IS NOT NULL  -- hash priority needs identity (NULL-PK r9)
    ORDER BY md5(doc_id::VARCHAR), doc_id
    LIMIT {_RESERVOIR_K}
    """,
)
def sample_reservoir_fixedk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k uniform sample via deterministic hash order: the k
    documents with the smallest md5(doc_id) — reproducible on any
    engine, partitioning, or run, and uniform because the hash is
    independent of every document attribute. LIMIT under a total order
    (doc_id tiebreak) keeps the driver hash-check exact.

    Scale shape: Spark plans ORDER BY + LIMIT k as
    TakeOrderedAndProject — each partition keeps only its local top-k
    and the driver merges p×k candidate rows, so a 100 TB corpus sends
    at most partitions×k tiny rows over the wire; this IS the
    distributed reservoir algorithm, with the hash as the priority key
    (Efraimidis-Spirakis A-Res with uniform weights). The plan shape is
    CI-asserted (tests/test_plans.py)."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull()
    )
    return (
        d.select("doc_id", "lang", "source")
        .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
        .limit(_RESERVOIR_K)
    )


@register(
    "win_percent_rank_cume",
    CAT_WIN,
    """
    SELECT event_id, event_type,
           ROUND(PERCENT_RANK() OVER w, 4) AS pr,
           ROUND(CUME_DIST() OVER w, 4) AS cd
    FROM events
    WHERE event_type IN ('click', 'purchase')
    -- NULLS LAST pinned explicitly: Spark windows default NULLS FIRST,
    -- DuckDB NULLS LAST — a NULL value row would shift every rank
    WINDOW w AS (PARTITION BY event_type
                 ORDER BY value ASC NULLS LAST, event_id ASC NULLS LAST)
    """,
)
def win_percent_rank_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank ((rank−1)/(n−1)) and cume_dist (rows ≤ current / n)
    per event within its type, ordered by value with event_id tiebreak —
    the normalized-rank pair that turns raw window ranks into
    cross-group-comparable quantile positions. Both are exact rational
    functions of integer ranks, so the 4-dp round is engine-stable.

    Scale shape: one shuffle on the partition key, in-partition sort —
    identical cost to any ranking window; nothing global."""
    ev = load_table(spark, sf_dir, "events")
    # asc_nulls_last pins the cross-engine NULL ordering divergence
    # (Spark defaults NULLS FIRST, DuckDB NULLS LAST) — on the
    # event_id TIEBREAK too, not just the value (NULL-PK r9)
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").asc_nulls_last(),
        F.col("event_id").asc_nulls_last(),
    )
    return (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .select(
            "event_id",
            "event_type",
            F.round(F.percent_rank().over(w), 4).alias("pr"),
            F.round(F.cume_dist().over(w), 4).alias("cd"),
        )
    )


@register(
    "ts_forecast_mase",
    CAT_TS,
    """
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day,
             CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS rev_cents
      FROM events WHERE ts IS NOT NULL GROUP BY 1
    ),
    lagged AS (
      SELECT day, rev_cents,
             LAG(rev_cents, 7) OVER (ORDER BY day) AS naive_fc,
             ROW_NUMBER() OVER (ORDER BY day) AS rn,
             COUNT(*) OVER () AS n
      FROM daily
    ),
    err AS (
      SELECT rn, n, ABS(rev_cents - naive_fc) AS ae,
             rn > n - 7 AS holdout
      FROM lagged WHERE naive_fc IS NOT NULL
    )
    SELECT
      CAST(MAX(n) AS BIGINT) AS n_days,
      CAST(SUM(CASE WHEN holdout THEN ae ELSE 0 END) AS BIGINT) AS holdout_ae_cents,
      CAST(SUM(CASE WHEN holdout THEN 1 ELSE 0 END) AS BIGINT) AS n_holdout,
      CAST(SUM(CASE WHEN NOT holdout THEN ae ELSE 0 END) AS BIGINT) AS train_ae_cents,
      CAST(SUM(CASE WHEN NOT holdout THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
      ROUND((SUM(CASE WHEN holdout THEN ae ELSE 0 END)::DOUBLE
             / SUM(CASE WHEN holdout THEN 1 ELSE 0 END))
            / (SUM(CASE WHEN NOT holdout THEN ae ELSE 0 END)::DOUBLE
               / SUM(CASE WHEN NOT holdout THEN 1 ELSE 0 END)), 4) AS mase
    FROM err
    """,
)
def ts_forecast_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MASE (mean absolute scaled error, Hyndman & Koehler 2006) of the
    seasonal-naive forecast ŷ_t = y_{t−7} on daily revenue: the last 7
    days' naive error scaled by the earlier days' naive error. MASE < 1
    means the holdout week was easier than the seasonal-naive training
    baseline; > 1 harder — the scale-free way to compare forecast
    difficulty across series. Absolute errors accumulate in exact
    integer cents on both engines; the only float is the final
    ratio-of-means, rounded 4 dp.

    Scale shape: one day-grain aggregate then a single-series lag —
    partitioned by series key when scoring a catalog of series, with
    the same two exact integer sums per (series, split) cell."""
    # NULL ts dropped on both engines (the r8 NULL-time seam)
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)")).cast("long").alias("rev_cents")
    )
    wd = Window.orderBy("day")
    lagged = daily.select(
        "rev_cents",
        F.lag("rev_cents", 7).over(wd).alias("naive_fc"),
        F.row_number().over(wd).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    ).filter(F.col("naive_fc").isNotNull())
    err = lagged.select(
        "n",
        F.abs(F.col("rev_cents") - F.col("naive_fc")).alias("ae"),
        (F.col("rn") > F.col("n") - 7).alias("holdout"),
    )
    h_ae = F.sum(F.when(F.col("holdout"), F.col("ae")).otherwise(0))
    h_n = F.sum(F.when(F.col("holdout"), 1).otherwise(0))
    t_ae = F.sum(F.when(~F.col("holdout"), F.col("ae")).otherwise(0))
    t_n = F.sum(F.when(~F.col("holdout"), 1).otherwise(0))
    return err.agg(
        F.max("n").cast("long").alias("n_days"),
        h_ae.cast("long").alias("holdout_ae_cents"),
        h_n.cast("long").alias("n_holdout"),
        t_ae.cast("long").alias("train_ae_cents"),
        t_n.cast("long").alias("n_train"),
        F.round(
            (h_ae.cast("double") / h_n) / (t_ae.cast("double") / t_n), 4
        ).alias("mase"),
    )


# RE2 ∩ Java-regex common subset: no lookarounds, no backreferences, \\d
# avoided in favor of explicit classes (identical semantics both engines).
PII_PATTERNS = {
    "id_digit_run6": "[0-9]{6,}",
    "email": "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "phone_intl": "\\+?[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{3,4}[- ][0-9]{4}",
}

# the audited surface, spelled ONCE — both the Spark body and the oracle
# derive from this, so the two sides cannot silently audit different columns
PII_FIELDS = (
    ("customer.c_name", "c_name", "customer"),
    ("documents.text", "text", "documents"),
    ("events.props", "props", "events"),
)


def _pii_rows_sql() -> str:
    # ONE aggregate per table (all patterns as columns) materialized once,
    # then unpivoted to (pattern, n_hits) rows — 3 scans total, matching
    # the Spark plan; the literal patterns work verbatim in both dialects
    ctes, parts = [], []
    for field, col, table in PII_FIELDS:
        tag = table
        hit_cols = ",\n        ".join(
            f"SUM(CASE WHEN regexp_matches({col}, '{pat}')"
            f" THEN 1 ELSE 0 END)::BIGINT AS h_{pname}"
            for pname, pat in PII_PATTERNS.items()
        )
        ctes.append(
            f"agg_{tag} AS MATERIALIZED (\n"
            f"  SELECT COUNT(*)::BIGINT AS n_rows,\n        {hit_cols}\n"
            f"  FROM {table})"
        )
        for pname in PII_PATTERNS:
            parts.append(
                f"SELECT '{field}' AS field, '{pname}' AS pattern,"
                f" n_rows, h_{pname} AS n_hits FROM agg_{tag}"
            )
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        "SELECT field, pattern, n_rows, n_hits,\n"
        "       CAST((2 * n_hits * 10000 + n_rows) // (2 * n_rows)"
        " AS BIGINT) AS hit_rate_x1e4\n"
        "FROM (" + "\nUNION ALL\n".join(parts) + ")"
    )


@register("dq_pii_census", CAT_DQ, _pii_rows_sql())
def dq_pii_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-pattern audit across the release surface: per (field, pattern)
    row counts, hit counts, and half-up-rounded hit rate ×1e4 for id-like
    digit runs, emails, and international phone shapes — the census a
    redaction gate reads before any dataset ships. Patterns are written in
    the RE2 ∩ Java common subset so Spark ``rlike`` and the oracle's
    regexp_matches agree byte-for-byte; detection on REAL pii strings is
    proven by the planted-fixture test (tests/test_operators.py), and the
    synthetic corpus's zero email/phone rows are themselves the assertion
    that the census is reading the right columns (c_name's 9-digit ids DO
    fire the digit-run rule on every row).

    Scale shape: ONE single-pass aggregate per table computing every
    pattern's conditional count as a column, then a row-local unpivot to
    (field, pattern) rows — 3 scans total (a per-(table, pattern) union
    of aggregates would scan each table once per pattern); at 100 TB the
    pattern set is a broadcast constant and the census stays one pass
    per table."""
    frames = []
    for field, col, table in PII_FIELDS:
        t = load_table(spark, sf_dir, table)
        agg = t.agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[
                F.sum(
                    F.when(F.col(col).rlike(pat), 1).otherwise(0)
                ).alias(f"h_{pname}")
                for pname, pat in PII_PATTERNS.items()
            ],
        )
        frames.append(
            agg.select(
                F.lit(field).alias("field"),
                "n_rows",
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(pname).alias("pattern"),
                                F.col(f"h_{pname}").alias("n_hits"),
                            )
                            for pname in PII_PATTERNS
                        ]
                    )
                ).alias("pp"),
            ).select(
                "field",
                F.col("pp.pattern").alias("pattern"),
                "n_rows",
                F.col("pp.n_hits").alias("n_hits"),
            )
        )
    out = frames[0]
    for f_ in frames[1:]:
        out = out.unionByName(f_)
    return out.select(
        "field",
        "pattern",
        "n_rows",
        "n_hits",
        F.expr(
            "CAST((2 * n_hits * 10000 + n_rows) DIV (2 * n_rows) AS BIGINT)"
        ).alias("hit_rate_x1e4"),
    )
