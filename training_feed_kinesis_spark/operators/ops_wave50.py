"""Wave 50: supply-concentration HHI per nation.

  * ``supplier_concentration_hhi``: the Herfindahl–Hirschman index of
    revenue concentration across each nation's suppliers — the
    sourcing-risk number (HHI > 0.25 ≈ "concentrated" by DOJ convention)
    a procurement review reads next to ``customer_gini`` (demand-side
    concentration). Revenue collapses to integer cents before any share
    math (the stats3 discipline).

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

CAT_REP = "2.L reporting"


@register(
    "supplier_concentration_hhi",
    CAT_REP,
    """
    WITH per_supp AS (
      -- per-ROW cent quantization (the r8 float-sum convention):
      -- ROUND of a float SUM flips a cent with accumulation order on
      -- knife-edge suppliers (caught by the r9 sf0.1 permutation
      -- sweep); the per-row double product is the same IEEE op
      -- sequence on both engines, and cents (not 1e-4 units) keep
      -- whale rows inside BIGINT (wave-97 whale fixture)
      SELECT l_suppkey,
             SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)
                      AS BIGINT)) AS rev_s
      FROM lineitem GROUP BY l_suppkey
    ),
    located AS (
      SELECT n.n_name, p.rev_s
      FROM per_supp p
      JOIN supplier s ON s.s_suppkey = p.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
    ),
    tot AS (
      SELECT n_name, SUM(rev_s) AS tc, COUNT(*)::BIGINT AS n_suppliers
      FROM located GROUP BY n_name
    )
    SELECT l.n_name,
           t.n_suppliers,
           CAST(t.tc AS BIGINT) AS nation_rev_cents,
           ROUND(SUM((l.rev_s::DOUBLE / t.tc)
                     * (l.rev_s::DOUBLE / t.tc)), 4) AS hhi,
           ROUND(MAX(l.rev_s::DOUBLE / t.tc), 4) AS top_share
    FROM located l JOIN tot t ON t.n_name = l.n_name
    GROUP BY l.n_name, t.n_suppliers, t.tc
    """,
)
def supplier_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supply-side HHI: per nation, Σ(supplier revenue share)² over
    integer-cents revenue (shares are identical-integer divisions in both
    engines; the share² sum is ROUND(,4) per §5.3.1). `top_share` names
    the single-supplier dependency; HHI summarizes the whole tail — a
    nation can have a low top share and still be concentrated.

    Scale shape: revenue aggregates per supplier once on the fact table
    (map-side combinable); supplier and nation are broadcast dims; the
    share math runs on the supplier-grain aggregate, never the fact
    rows."""
    li = load_table(spark, sf_dir, "lineitem")
    per_supp = li.groupBy("l_suppkey").agg(
        F.sum(
            F.expr(
                "CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)"
                " AS BIGINT)"
            )
        ).alias("rev_s")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    located = (
        per_supp.join(
            F.broadcast(s), per_supp.l_suppkey == s.s_suppkey
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("n_name", "rev_s")
    )
    tot = located.groupBy("n_name").agg(
        F.sum("rev_s").alias("tc"),
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
    )
    share = F.col("rev_s").cast("double") / F.col("tc")
    return (
        located.join(tot, "n_name")
        .groupBy("n_name", "n_suppliers", "tc")
        .agg(
            F.round(F.sum(share * share), 4).alias("hhi"),
            F.round(F.max(share), 4).alias("top_share"),
        )
        .select(
            "n_name",
            "n_suppliers",
            F.col("tc").cast("bigint").alias("nation_rev_cents"),
            "hhi",
            "top_share",
        )
    )
