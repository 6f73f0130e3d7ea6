"""Surface round 3: rolling medians, geometric means, width_bucket binning,
rollup-with-rank reporting, and raw text-file ingestion.

  * A rolling median is the robust-smoothing workhorse (spike-immune, unlike
    rolling mean). Spark evaluates exact ``percentile`` over a bounded ROWS
    frame — per-key state is the frame (7 rows), so it scales linearly.
  * Geometric mean via exp(avg(ln x)) is the one-pass spelling — no product
    overflow, plain hash-agg, map-side combined.
  * ``width_bucket`` is the built-in fixed-width binning primitive (the
    profiling histogram without the manual CASE ladder).
  * Rollup+rank composes two §2 families: ranking WITHIN each rollup grain
    needs the GROUPING() flags as the window partition — a real BI report
    shape that exercises Expand and Window in one plan.
  * ``source_text`` closes the source-format matrix (parquet/ORC/JSON/CSV/
    binaryFile/+text): line-oriented ingestion with in-plan field splitting,
    the shape of every raw log or crawl dump.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md §0.1);
capability surface reconstructed per SURVEY.md §2 and BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from .exact import CENTS_SUM_SQL, cents_sum
from ..tables import load_table
from .scans import scratch_dir

CAT_WIN = "2.E window functions"
CAT_AGG = "2.D aggregations"
CAT_FN = "2.H scalar functions"
CAT_SRC = "2.A scans/sources/sinks"
CAT_WORK = "2.L workloads"


@register(
    "win_rolling_median",
    CAT_WIN,
    """
    SELECT user_id, event_id,
           ROUND(quantile_cont(value, 0.5)
                   OVER (PARTITION BY user_id
                         ORDER BY ts NULLS LAST, event_id NULLS LAST
                         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4)
             AS med7
    FROM events
    """,
)
def win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-event median of each user's value — the robust smoother.
    Exact ``percentile`` over a bounded ROWS frame (frame = the state, so
    memory is O(7) per row at any scale); DuckDB's interpolating
    quantile_cont matches Spark's percentile definition exactly.
    ts NULLS LAST both engines (r8 NULL-time seam); event_id tiebreak
    NULLS LAST too (r10 joint sweep: NULL-id row tying its redelivered
    twin on ts).
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc_nulls_last(), F.col("event_id").asc_nulls_last())
        .rowsBetween(-6, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.expr("percentile(value, 0.5)").over(w), 4).alias("med7"),
    )


@register(
    "agg_product",
    CAT_AGG,
    """
    SELECT l_returnflag,
           ROUND(exp(avg(ln(l_extendedprice))), 4) AS geo_mean_price,
           ROUND(avg(l_extendedprice), 4) AS arith_mean_price,
           COUNT(*)::BIGINT AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric vs arithmetic mean price per return flag. The product
    aggregate is spelled exp(avg(ln x)) — one numerically-safe hash-agg
    pass (no overflow, map-side partials) instead of a true running
    product. Prices are strictly positive so ln is total.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.exp(F.avg(F.log(F.col("l_extendedprice")))), 4).alias(
            "geo_mean_price"
        ),
        F.round(F.avg("l_extendedprice"), 4).alias("arith_mean_price"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "fn_width_bucket",
    CAT_FN,
    f"""
    SELECT CASE WHEN value < 0 THEN 0
                WHEN value >= 200 THEN 11
                ELSE floor(value / 20)::INT + 1 END AS bucket,
           COUNT(*)::BIGINT AS n,
           {CENTS_SUM_SQL.format(col='value')}
             AS total
    FROM events
    GROUP BY 1
    """,
)
def fn_width_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width binning with the built-in width_bucket (10 equal bins
    over [0,200), plus under/overflow bins 0 and 11) — the profiling
    histogram primitive. DuckDB 1.0 lacks width_bucket, so the oracle
    spells the same arithmetic manually; the histogram aggregates are
    map-side combined as usual.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            F.expr("width_bucket(value, 0D, 200D, 10)").cast("int").alias("bucket"),
            "value",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # exact-cents sum, unrounded (r11 magnitude lint, 5.3.9a)
            cents_sum("value").alias("total"),
        )
    )


@register(
    "rollup_rank_report",
    CAT_WORK,
    """
    WITH rev AS (
      SELECT r_name, n_name,
             SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                 * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT)))
               AS rev_s
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP (r_name, n_name)
      -- empty-input parity (r10 joint-corruption sweep: empty region
      -- dim): SQL emits the () grand row over zero rows, Spark none
      HAVING COUNT(*) > 0
    ),
    flagged AS (
      SELECT COALESCE(r_name, '(all)') AS region,
             COALESCE(n_name, '(all)') AS nation,
             (r_name IS NULL)::INT * 2 + (n_name IS NULL)::INT AS grain,
             CAST(rev_s AS DOUBLE) / 10000.0 AS revenue
      FROM rev
    )
    SELECT region, nation, grain, revenue,
           row_number() OVER (PARTITION BY grain
                              ORDER BY revenue DESC, region, nation) AS rnk
    FROM flagged
    """,
)
def rollup_rank_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BI report composite: supplier-nation revenue rolled up to nation /
    region / grand-total grains, then ranked WITHIN each grain. The grain
    id (from the rollup's NULL pattern) partitions the ranking window, so
    subtotals compete only with subtotals. One Expand pass feeds one
    Window — two shuffles total; ordering on the rounded measure plus
    name tiebreaks keeps ranks engine-stable.
    """
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region")
    rev = (
        li.join(su, li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        # exact scale-1e4 integer revenue (§5.3.6b), projected BEFORE the
        # rollup so the term is computed once per input row, not once per
        # Expand duplicate (3x here — measured +0.2 s at bench sf)
        .select(
            "r_name",
            "n_name",
            F.expr(
                "CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)"
                " * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))"
            ).alias("rev_s"),
        )
        .rollup("r_name", "n_name")
        .agg(F.sum("rev_s").alias("rev_s"))
    )
    flagged = rev.select(
        F.coalesce("r_name", F.lit("(all)")).alias("region"),
        F.coalesce("n_name", F.lit("(all)")).alias("nation"),
        (
            F.col("r_name").isNull().cast("int") * 2
            + F.col("n_name").isNull().cast("int")
        ).alias("grain"),
        (F.col("rev_s").cast("double") / 10000.0).alias("revenue"),
    )
    w = Window.partitionBy("grain").orderBy(
        F.col("revenue").desc(), "region", "nation"
    )
    return flagged.select(
        "region", "nation", "grain", "revenue", F.row_number().over(w).alias("rnk")
    )


@register(
    "source_text",
    CAT_SRC,
    # COALESCE on text length: a NULL text rides the tab wire as an
    # EMPTY last field, so it reads back as 0 chars — the documented
    # ''<->NULL conflation of the unquoted-wire convention (fn_csv),
    # spelled explicitly on the oracle side too (doc-corruption replay)
    """
    SELECT doc_id, lang,
           COALESCE(length(text), 0)::BIGINT AS n_chars_read
    FROM documents
    """,
)
def source_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw text-line ingestion: documents exported as tab-delimited lines
    via the text sink, re-read with spark.read.text, fields recovered
    in-plan (substring_index — no Python). Closes the source matrix
    (parquet/ORC/JSON/CSV/binaryFile/text). The oracle replays the
    original selection, so write→read→parse must be lossless on every
    row to hash-match.
    """
    out = scratch_dir("text_src_")
    docs = load_table(spark, sf_dir, "documents")
    # NULL-safe wire: concat_ws DROPS null fields (shifting every later
    # field left), so a NULL lang must ride as an EMPTY field and read
    # back as NULL — the same empty-field convention as fn_csv (caught
    # by the NULL-attribute corruption replay)
    # ... and a NULL doc_id too (NULL-PK r9): concat_ws silently DROPS
    # a null field, shifting lang into the id slot — the ANSI cast then
    # crashes on 'de'. Every field rides the empty-field convention.
    docs.select(
        F.concat_ws(
            "\t",
            F.coalesce(F.col("doc_id").cast("string"), F.lit("")),
            F.coalesce(F.col("lang"), F.lit("")),
            F.coalesce(F.col("text"), F.lit("")),
        ).alias("value")
    ).write.mode("overwrite").text(out)
    lines = spark.read.text(out)
    return lines.select(
        F.nullif(F.substring_index("value", "\t", 1), F.lit(""))
        .cast("bigint")
        .alias("doc_id"),
        F.nullif(
            F.substring_index(
                F.substring_index("value", "\t", 2), "\t", -1
            ),
            F.lit(""),
        ).alias("lang"),
        F.length(
            F.expr("substring(value, length(substring_index(value, '\t', 2)) + 2)")
        ).cast("bigint").alias("n_chars_read"),
    )
