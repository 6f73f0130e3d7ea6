"""§2.M (cont.) TPC-H-shaped workload queries — subquery / anti-join shapes.

Adaptations of the remaining classic TPC-H query shapes to the driver's star
schema (which lacks partsupp, l_commitdate/l_receiptdate, l_shipmode,
c_phone — see FIXTURES.md). Each query keeps the *shape* that matters for
the optimizer: correlated scalar subqueries (Q11/Q15/Q17), EXISTS /
NOT-EXISTS self-joins (Q4/Q21), disjunctive pushdown (Q19), anti-join +
COUNT(DISTINCT) (Q16/Q22), and multi-dimension volume reports (Q7/Q8/Q9/
Q14). "Late" substitutes ``l_shipdate > o_orderdate + N days`` for the
missing commit/receipt dates.

Scale posture (100 TB): every scalar subquery is computed as a tiny
aggregate and broadcast (crossJoin of a 1-row frame ⇒ BroadcastNestedLoop
over one row — free); dimension tables (region/nation/supplier) broadcast
explicitly; fact-fact correlations (Q21's l2/l3) are expressed as semi/anti
joins on ``l_orderkey`` so they shuffle-partition by the same key as the
main join and AQE can pick SMJ with co-partitioning. No collect()-driven
driver loops anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table, sane_ts, sane_ts_sql

CAT = "2.M workloads"

def _volume():
    """Revenue expression (built lazily: F.col needs an active session)."""
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume")


# Exact scale-1e4 revenue term (§5.3.6b, the agg_basic/q9 discipline):
# l_extendedprice and l_discount are 2-decimal domains, so
# ext_cents * (100 - disc_pct) is an exact BIGINT and its SUM is
# reduction-order independent — the double SUM(volume) flips ROUND(,4)
# boundaries under cross-engine reduction order. The post-agg
# CAST(SUM AS DOUBLE)/1e4 runs on bit-identical integers on both
# engines, and ROUND(double) is half-away on both (probe-verified), so
# every consumer below is deterministic under ANY partitioning. The
# spelling is valid in BOTH dialects verbatim.
_REV_S = (
    "CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)"
    " * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))"
)


def _volume_s():
    return F.expr(_REV_S).alias("volume_s")


@register(
    "q4_order_priority",
    CAT,
    """
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders per priority having at least one late line.

    EXISTS becomes a left-semi join whose condition references both sides
    (orderkey equi + shipdate-vs-orderdate theta). The equi component keys
    the shuffle, so the theta part evaluates residually inside the join —
    no BNLJ. The quarter filter pushes into the orders scan.
    """
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    cond = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "q7_volume_shipping",
    CAT,
    f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(volume_s) AS DOUBLE) / 10000.0 AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS l_year,
             {_REV_S} AS volume_s
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1999-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by year.

    Both nation sides broadcast (25 rows). The nation-pair disjunction can
    only be applied after both joins, but each single-nation membership is
    pre-filtered into the broadcast side (supplier/customer keep only the
    two nations), shrinking the fact join inputs before the residual
    disjunction runs.
    """
    nations = ("NATION_1", "NATION_2")
    n1 = load_table(spark, sf_dir, "nation").filter(F.col("n_name").isin(*nations))
    n2 = load_table(spark, sf_dir, "nation").filter(F.col("n_name").isin(*nations))
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == n1.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    c = load_table(spark, sf_dir, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == n2.n_nationkey
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1999-01-01")
    )
    o = load_table(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .filter(
            ((F.col("supp_nation") == nations[0]) & (F.col("cust_nation") == nations[1]))
            | ((F.col("supp_nation") == nations[1]) & (F.col("cust_nation") == nations[0]))
        )
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            _volume_s(),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            (F.sum("volume_s").cast("double") / 10000.0).alias("revenue")
        )
    )


@register(
    "q8_market_share",
    CAT,
    f"""
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume_s
                               ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(volume_s) AS DOUBLE), 4) AS mkt_share
    FROM (
      -- the whole customer-region membership chain is a SEMI (nested
      -- IN), matching the Spark left_semi: plain join hops are
      -- equivalent only on duplicate-free tables — the r8 dim campaign
      -- caught a duplicated region row fanning out the oracle, and the
      -- customer re-ingest campaign caught the duplicated CUSTOMER rows
      -- doing the same through the c_custkey hop. Membership is a set
      -- test, not a fan-out, at every hop.
      SELECT year(o_orderdate) AS o_year,
             {_REV_S} AS volume_s,
             n2.n_name AS supp_nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE p_type = 'PROMO'
        AND o_custkey IN (
          SELECT c_custkey FROM customer
          WHERE c_nationkey IN (SELECT n_nationkey FROM nation
                                JOIN region ON n_regionkey = r_regionkey
                                WHERE r_name = 'ASIA'))
    ) all_nations
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's market share inside a region, per year.

    The share is a conditional-sum / total-sum ratio in a single aggregate
    pass (no self-join). part is filtered to one of six types before the
    fact join; customer-side region membership is resolved inside a
    broadcast dim chain (nation⋈region, 25×5 rows).
    """
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    n1 = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cust_dim = n1.join(F.broadcast(r), n1.n_regionkey == r.r_regionkey).select(
        "n_nationkey"
    )
    c = load_table(spark, sf_dir, "customer").join(
        F.broadcast(cust_dim), F.col("c_nationkey") == F.col("n_nationkey"), "left_semi"
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n2), F.col("s_nationkey") == F.col("sn_key")
    ).select("s_suppkey", "supp_nation")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey, "left_semi")
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .select(F.year("o_orderdate").alias("o_year"), _volume_s(), "supp_nation")
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(
                        F.col("supp_nation") == "NATION_5", F.col("volume_s")
                    ).otherwise(F.lit(0))
                ).cast("double")
                / F.sum("volume_s").cast("double"),
                4,
            ).alias("mkt_share")
        )
    )


# Exact-integer amount at scale 4e4 (the flagship's §5.3.6b discipline):
# amount = ext*(1-disc) - 0.01*retail*qty becomes
#   4*ext_cents*(100-disc_pct) - retail_cents*qty4
# with every factor made exactly integral first (money is a 2-decimal
# domain, quantity at most quarter-granular, so ROUND captures each
# exactly). The BIGINT sum is reduction-order independent — the double
# spelling flipped ROUND(...,4) boundaries on 8/70 groups under the
# fractional-measures fixture — and the final half-away rounding is
# integer arithmetic spelled identically on both engines (both DIV and
# // truncate toward zero, probe-verified), so profit is bit-identical
# under ANY partitioning. Per-group sums stay far below 2^63 through
# sf1000; beyond that, shard by o_year first (flagship scale note).
_Q9_AMOUNT = (
    "4 * CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)"
    " * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))"
    " - CAST(ROUND(p_retailprice * 100, 0) AS BIGINT)"
    " * CAST(ROUND(l_quantity * 4, 0) AS BIGINT)"
)


@register(
    "q9_product_profit",
    CAT,
    f"""
    SELECT n_name, o_year,
           CAST((s + CASE WHEN s >= 0 THEN 2 ELSE -2 END) // 4 AS DOUBLE)
             / 10000.0 AS profit
    FROM (
      SELECT n_name, o_year, SUM(amount_s) AS s
      FROM (
        SELECT n_name, year(o_orderdate) AS o_year,
               {_Q9_AMOUNT} AS amount_s
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%gear%'
      ) amounts
      GROUP BY n_name, o_year
    ) sums
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier-nation per year for one product
    family. partsupp is absent, so supply cost is proxied as
    ``0.01 * p_retailprice * l_quantity``. The LIKE filter prunes part
    before the fact join; supplier⋈nation broadcasts. Profit is summed
    in exact scaled integers (see _Q9_AMOUNT) so the result is
    deterministic under any partitioning/reduction order.
    """
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == n.n_nationkey
    ).select("s_suppkey", "n_name")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .select(
            "n_name",
            F.year("o_orderdate").alias("o_year"),
            F.expr(_Q9_AMOUNT).alias("amount_s"),
        )
        .groupBy("n_name", "o_year")
        .agg(F.sum("amount_s").alias("s"))
        .select(
            "n_name",
            "o_year",
            (
                F.expr(
                    "CAST((s + CASE WHEN s >= 0 THEN 2 ELSE -2 END) DIV 4"
                    " AS DOUBLE)"
                )
                / 10000.0
            ).alias("profit"),
        )
    )


@register(
    "q11_important_parts",
    CAT,
    """
    WITH partval AS (
      -- supplier-nation MEMBERSHIP, not a join chain: a plain JOIN
      -- fans each lineitem out per duplicated supplier row (r9
      -- supplier re-ingest campaign find — the q8 class one edge
      -- further); IN is a set test, matching Spark's left_semi
      SELECT l_partkey,
             SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                 * CAST(ROUND(l_quantity * 4, 0) AS BIGINT)) AS val_s
      FROM lineitem
      WHERE l_suppkey IN (
        SELECT s_suppkey FROM supplier
        WHERE s_nationkey IN (
          SELECT n_nationkey FROM nation
          WHERE n_name IN ('NATION_3', 'NATION_7')))
      GROUP BY l_partkey
    )
    SELECT l_partkey, ROUND(CAST(val_s AS DOUBLE) / 400.0, 4) AS val
    FROM partval
    WHERE 1000 * val_s > (SELECT SUM(val_s) FROM partval)
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose inventory value exceeds a fraction of
    the corpus total — a scalar subquery over the same aggregate.

    The per-part aggregate is computed once and reused for both the rows
    and the threshold: the 1-row total crossJoins back (broadcast nested
    loop over one row). At 100 TB the partval aggregate is the only
    shuffle; the threshold side is a scalar.
    """
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == n.n_nationkey, "left_semi"
    )
    li = load_table(spark, sf_dir, "lineitem")
    # val_s = ext_cents * qty_quarters (exact scale-400 integer,
    # §5.3.6b): both the per-part sums and the 0.001-of-total threshold
    # comparison (1000*val_s > total_s) run entirely in integers, so the
    # "important" part SET — not just the printed values — is identical
    # under any reduction order on both engines.
    val_s = F.expr(
        "CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)"
        " * CAST(ROUND(l_quantity * 4, 0) AS BIGINT)"
    )
    partval = (
        li.join(F.broadcast(s.select("s_suppkey")), li.l_suppkey == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(val_s).alias("val_s"))
    )
    threshold = partval.agg(F.sum("val_s").alias("total_s"))
    return (
        partval.crossJoin(F.broadcast(threshold))
        .filter(F.col("val_s") * 1000 > F.col("total_s"))
        .select(
            "l_partkey",
            F.round(F.col("val_s").cast("double") / 400.0, 4).alias("val"),
        )
    )


@register(
    "q14_promo_revenue",
    CAT,
    f"""
    SELECT ROUND(
      100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_S}
                            ELSE 0 END) AS DOUBLE)
            / CAST(SUM({_REV_S}) AS DOUBLE), 4) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate <  TIMESTAMP '1997-10-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue percentage in one month — conditional
    aggregate ratio, single pass, month filter pushed to the lineitem scan.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    )
    p = load_table(spark, sf_dir, "part")
    rev_s = F.expr(_REV_S)
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", rev_s).otherwise(F.lit(0))
                ).cast("double")
                / F.sum(rev_s).cast("double"),
                4,
            ).alias("promo_revenue")
        )
    )


@register(
    "q15_top_supplier",
    CAT,
    f"""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM({_REV_S}) AS DOUBLE) / 10000.0 AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) achieving the max quarterly revenue.

    The MAX scalar compares against the ROUNDED per-supplier revenue on
    both engines, so the equality is exact (4-dp fixed point), immune to
    summation-order ulps (SURVEY §5.3.1). Revenue aggregate computed once;
    max crossJoins back as a broadcast scalar.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        (F.sum(F.expr(_REV_S)).cast("double") / 10000.0).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        s.join(rev, s.s_suppkey == rev.supplier_no)
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q16_supplier_variety",
    CAT,
    """
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_name LIKE '%3'
                              AND s_suppkey IS NOT NULL)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier variety per part group, excluding
    a denylisted supplier set. NOT IN becomes a left-anti join against the
    (tiny, broadcast) denylist; COUNT(DISTINCT) runs as Spark's two-phase
    distinct aggregate. lineitem stands in for the absent partsupp.

    The denylist subquery guards s_suppkey IS NOT NULL (NULL-PK r9): a
    single NULL-keyed supplier row in the denylist NULL-poisons NOT IN
    for EVERY candidate (0 rows) where the anti-join is unaffected —
    the dq_dim_conformity seam, here on the hot TPC-H path.
    """
    deny = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_name").like("%3")
    ).select("s_suppkey")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(deny), li.l_suppkey == deny.s_suppkey, "left_anti")
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity",
    CAT,
    """
    SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
                AS DOUBLE) / 700.0 AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < (SELECT 0.2 * AVG(l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from small-quantity orders of one brand —
    a correlated scalar subquery (per-part average quantity).

    Decorrelated by hand: the per-part AVG is a separate aggregate joined
    back on partkey. At scale that aggregate shuffles once on l_partkey —
    the same key as the main join, so AQE can reuse the exchange.
    """
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_cut")
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(per_part, li.l_partkey == F.col("ap_key"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            # unrounded exact-cents quotient (r11 magnitude lint, 5.3.9a)
            (
                F.sum(
                    F.expr("CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)")
                ).cast("double")
                / 700.0
            ).alias("avg_yearly")
        )
    )


@register(
    "q19_disjunctive_revenue",
    CAT,
    f"""
    SELECT CAST(SUM({_REV_S}) AS DOUBLE) / 10000.0 AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#4'  AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under a disjunction of brand/size/quantity
    conjunctions. The brand ∈ {12,23,4} and quantity ∈ [1,30] envelopes are
    derivable from the disjunction; Spark pushes the join-independent parts
    of the OR into both scans (constraint propagation), the rest evaluates
    as a residual post-join filter.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(p, li.l_partkey == p.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#4")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(cond).agg(
        (F.sum(F.expr(_REV_S)).cast("double") / 10000.0).alias("revenue")
    )


@register(
    "q21_waiting_supplier",
    CAT,
    """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F' AND n_name = 'NATION_4'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    """,
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the *sole* late shipper on
    finished multi-supplier orders — EXISTS + NOT-EXISTS self-joins on the
    fact table.

    Both correlations become semi/anti joins keyed on ``l_orderkey`` — the
    same shuffle key three times, so at scale the exchanges line up
    (co-partitioned SMJ under AQE) instead of three unrelated shuffles.
    The supplier⋈nation filter broadcasts; ``o_orderstatus='F'`` pushes to
    the orders scan.
    """
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_4")
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == n.n_nationkey, "left_semi"
    )
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    late = F.expr("INTERVAL 60 DAYS")

    l1 = (
        li.join(F.broadcast(s.select("s_suppkey", "s_name")), li.l_suppkey == F.col("s_suppkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .filter(li.l_shipdate > o.o_orderdate + late)
        .select("l_orderkey", "l_suppkey", "s_name", "o_orderdate")
    )
    l2 = li.select(F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("sk2"))
    l3 = li.select(
        F.col("l_orderkey").alias("k3"),
        F.col("l_suppkey").alias("sk3"),
        F.col("l_shipdate").alias("sd3"),
    )
    return (
        l1.join(
            l2,
            (l1.l_orderkey == F.col("k2")) & (l1.l_suppkey != F.col("sk2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("k3"))
            & (F.col("l_suppkey") != F.col("sk3"))
            & (F.col("sd3") > F.col("o_orderdate") + late),
            "left_anti",
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@register(
    "q22_idle_customers",
    CAT,
    """
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS ab_cents
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_mktsegment, COUNT(*) AS numcust,
           CAST(SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) AS DOUBLE)
             / 100.0 AS totacctbal
    FROM customer, avg_bal
    WHERE CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) > ab_cents
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_mktsegment
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers gone idle — global-average
    scalar subquery + anti join. (Classic Q22 uses "no orders at all"; this
    corpus has orders for every customer, so "idle" = no orders since
    2000-01-01. c_phone is absent; groups by market segment instead of
    country code.) The average broadcasts as a 1-row scalar; the anti join
    probes only orders rows surviving the pushed date filter.
    """
    c = load_table(spark, sf_dir, "customer")
    # The average-balance threshold is computed from exact integer cents
    # (2-decimal money domain): the division runs on bit-identical
    # integers on both engines, so the boundary row set — customers whose
    # balance straddles the mean within an ulp — is identical too.
    bal_cents = F.expr("CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(bal_cents).cast("double") / F.count(F.lit(1)).cast("double"))
        .alias("ab_cents")
    )
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "2000-01-01"
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(bal_cents > F.col("ab_cents"))
        .join(recent, F.col("c_custkey") == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            (F.sum(bal_cents).cast("double") / 100.0).alias("totacctbal"),
        )
    )


@register(
    "q6_forecast_revenue",
    CAT,
    """
    SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                    * CAST(ROUND(l_discount * 100, 0) AS BIGINT))
                AS DOUBLE) / 10000.0 AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.03 AND 0.05
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate, no join — the query
    whose entire cost is how much the scan skips. All three predicates are
    sargable and reach the parquet reader as PushedFilters (row-group
    min/max skipping); the aggregate is a single partial+final sum.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & F.col("l_discount").between(0.03, 0.05)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (
                F.sum(
                    F.expr(
                        "CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)"
                        " * CAST(ROUND(l_discount * 100, 0) AS BIGINT)"
                    )
                ).cast("double")
                / 10000.0
            ).alias("revenue")
        )
    )


@register(
    "q13_order_distribution",
    CAT,
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer distribution by order count — LEFT JOIN
    with the filter in the JOIN CONDITION (not WHERE: customers whose only
    orders are urgent must survive with count 0), then a histogram of the
    grouped counts. Two aggregations, each over the key it just produced,
    so the second one is nearly free after the first's shuffle.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q20_stock_suppliers",
    CAT,
    """
    SELECT s_name, ROUND(s_acctbal, 4) AS s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'red%'
        AND l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY l_suppkey
      HAVING SUM(l_quantity) > 300)
      AND s_nationkey IN (SELECT n_nationkey FROM nation
                          WHERE n_name IN ('NATION_2', 'NATION_11'))
    """,
)
def q20_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers of one product family who moved serious
    volume in a year, in chosen nations — IN over an aggregated-HAVING
    subquery (semi join against a grouped relation) chained with a dim
    semi join. The volume threshold compares integer-valued double sums —
    exact in IEEE regardless of summation order, so the boundary is
    engine-stable.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    movers = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 300)
        .select("l_suppkey")
    )
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_2", "NATION_11")
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey, "left_semi")
        .join(F.broadcast(movers), s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_name", F.round("s_acctbal", 4).alias("s_acctbal"))
    )


@register(
    "q18_large_volume",
    CAT,
    """
    WITH big AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
    )
    SELECT c_name, c_custkey, o_orderkey, o_orderdate,
           ROUND(o_totalprice, 4) AS o_totalprice,
           ROUND(SUM(l_quantity), 4) AS total_qty
    FROM customer
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM big) AND {sane}
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """.format(sane=sane_ts_sql("o_orderdate")),
)
def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume customers — orders whose lineitems
    total more than 300 units, joined back to customer/orders detail.
    Closes the TPC-H sweep: every query except Q2 (partsupp absent from
    the testdata — data limitation, SURVEY §2) is now registered.

    Scale shape: the HAVING aggregate runs FIRST and semi-joins the big
    fact table down to the rare qualifying orders before the 3-way detail
    join — qty aggregates shuffle on l_orderkey once and the surviving
    key set is small enough to broadcast into both detail joins (AQE
    picks that up at runtime from the actual post-HAVING size).
    """
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 300)
        .select("l_orderkey")
    )
    o = load_table(spark, sf_dir, "orders").filter(
        sane_ts("o_orderdate")  # r12 contract: o_orderdate emitted raw
    )
    c = load_table(spark, sf_dir, "customer")
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                 F.round("o_totalprice", 4).alias("o_totalprice"))
        .agg(F.round(F.sum("l_quantity"), 4).alias("total_qty"))
    )
