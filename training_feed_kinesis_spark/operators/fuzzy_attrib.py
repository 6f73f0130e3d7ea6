"""Fuzzy matching + attribution analytics.

  * ``join_fuzzy``: approximate string join done the scalable way — equi-join
    on a cheap blocking key (first name token + size) so candidate pairs stay
    tiny and hash-partitionable, then exact Levenshtein verification on the
    candidates only. The naive all-pairs edit-distance join is O(n²·L²);
    blocking makes the quadratic term per-block, which is how record linkage
    survives 100 TB.
  * ``agg_corr_matrix``: all pairwise Pearson correlations of the lineitem
    measures in ONE aggregation pass (co-moment accumulators combine
    map-side), unpivoted to the matrix report. The data is scanned once no
    matter how many pairs.
  * ``attribution_last_touch``: marketing-style attribution — each purchase
    credits the user's most recent click within 24h. Spelled as a running
    window carry-forward (max of click-times over the preceding frame), NOT
    an as-of self-join: one shuffle by user, no join at all.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md §0.1);
capability surface reconstructed per SURVEY.md §2 and BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load_table

CAT_JOIN = "2.C joins"
CAT_AGG = "2.D aggregations"
CAT_WORK = "2.L workloads"


@register(
    "join_fuzzy",
    CAT_JOIN,
    """
    WITH p AS (
      SELECT p_partkey, p_name, p_size, split_part(p_name, ' ', 1) AS blk
      FROM part
    )
    SELECT a.p_partkey AS pa, b.p_partkey AS pb,
           levenshtein(a.p_name, b.p_name)::INT AS dist
    FROM p a JOIN p b
      ON a.blk = b.blk AND a.p_size = b.p_size
     AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 8
    """,
)
def join_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy join over part names: candidates share (first name
    token, size) — an equi-join that hash-partitions cleanly — and only
    candidates pay the Levenshtein verify (edit distance <= 8). Block
    sizes are bounded by the name-vocabulary × size domain, so the
    quadratic verify never sees the full table.
    """
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_name",
        "p_size",
        F.split(F.col("p_name"), " ").getItem(0).alias("blk"),
    )
    a = p.alias("a")
    b = p.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.p_size") == F.col("b.p_size"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .filter(dist <= 8)
        .select(
            F.col("a.p_partkey").alias("pa"),
            F.col("b.p_partkey").alias("pb"),
            dist.cast("int").alias("dist"),
        )
    )


@register(
    "agg_corr_matrix",
    CAT_AGG,
    """
    SELECT * FROM (
      SELECT 'quantity~extendedprice' AS pair,
             ROUND(corr(l_quantity, l_extendedprice), 4) AS r FROM lineitem
      UNION ALL SELECT 'quantity~discount',
             ROUND(corr(l_quantity, l_discount), 4) FROM lineitem
      UNION ALL SELECT 'quantity~tax',
             ROUND(corr(l_quantity, l_tax), 4) FROM lineitem
      UNION ALL SELECT 'extendedprice~discount',
             ROUND(corr(l_extendedprice, l_discount), 4) FROM lineitem
      UNION ALL SELECT 'extendedprice~tax',
             ROUND(corr(l_extendedprice, l_tax), 4) FROM lineitem
      UNION ALL SELECT 'discount~tax',
             ROUND(corr(l_discount, l_tax), 4) FROM lineitem
    )
    """,
)
def agg_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations of the four lineitem measures in ONE
    scan: six co-moment aggregates accumulate side by side (all map-side
    combined), then ``stack`` unpivots the single wide row into the
    matrix report. The oracle re-states each pair per-column; Spark still
    reads the data once.
    """
    li = load_table(spark, sf_dir, "lineitem")
    pairs = [
        ("quantity", "extendedprice"),
        ("quantity", "discount"),
        ("quantity", "tax"),
        ("extendedprice", "discount"),
        ("extendedprice", "tax"),
        ("discount", "tax"),
    ]
    wide = li.agg(
        *[
            F.round(F.corr(f"l_{x}", f"l_{y}"), 4).alias(f"{x}__{y}")
            for x, y in pairs
        ]
    )
    stack_args = ", ".join(f"'{x}~{y}', {x}__{y}" for x, y in pairs)
    return wide.selectExpr(f"stack({len(pairs)}, {stack_args}) AS (pair, r)")


@register(
    "attribution_last_touch",
    CAT_WORK,
    """
    WITH tagged AS (
      SELECT user_id, ts, event_id, event_type, value,
             MAX(CASE WHEN event_type = 'click' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_click
      FROM events
    )
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           COUNT(*)::BIGINT AS purchases,
           SUM(CASE WHEN last_click IS NOT NULL
                     AND ts - last_click <= INTERVAL 24 HOUR
                    THEN 1 ELSE 0 END)::BIGINT AS attributed,
           ROUND(SUM(CASE WHEN last_click IS NOT NULL
                           AND ts - last_click <= INTERVAL 24 HOUR
                          THEN value ELSE 0 END), 4) AS attributed_value
    FROM tagged
    WHERE event_type = 'purchase'
    GROUP BY date_trunc('day', ts)
    """,
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: a purchase is attributed when the same
    user clicked within the preceding 24h. The candidate click arrives
    via a running-window carry-forward (max click-ts over the strictly
    preceding frame) — one shuffle by user, no self-join, per-row state
    O(1). Daily attribution report on top.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", F.col("event_id").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tagged = ev.withColumn(
        "last_click",
        F.max(
            F.when(F.col("event_type") == "click", F.col("ts"))
        ).over(w),
    )
    is_attr = F.col("last_click").isNotNull() & (
        F.col("ts") <= F.col("last_click") + F.expr("INTERVAL 24 HOUR")
    )
    return (
        tagged.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", "ts").alias("d"))
        .agg(
            F.count(F.lit(1)).alias("purchases"),
            F.sum(is_attr.cast("int")).cast("long").alias("attributed"),
            F.round(
                F.sum(F.when(is_attr, F.col("value")).otherwise(0.0)), 4
            ).alias("attributed_value"),
        )
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "purchases",
            "attributed",
            "attributed_value",
        )
    )
