"""Wave 65: TPC-H Q2 shape on a synthesized relation, farthest-first
center initialization.

  * ``q2_shape_synthetic``: the one TPC-H shape the testdata could not
    support (no partsupp table) — run on a DETERMINISTICALLY SYNTHESIZED
    part↔supplier cost relation, so the correlated-min-subquery pattern
    (min-cost supplier per part within a region) is exercised and
    oracled even though the reference table is absent. Honest label:
    the data is synthetic; the SHAPE is the real Q2.
  * ``vec_farthest_first_init``: deterministic farthest-first traversal
    (Gonzalez) choosing k=4 centers on integer-exact distances — the
    reproducible alternative to random k-means++ seeding, feeding
    ml_kmeans_step / llm_semdedup_cell.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

CAT_WORK = "2.L workloads (TPC-H shapes)"
CAT_VEC = "2.J llm-pipeline (similarity)"

# synthetic partsupp: each part is offered by the 4 suppliers whose key
# is congruent to a hash of (part, slot); supplycost is deterministic
# integer cents — every engine derives the identical relation. The CTE
# carries the part attributes the query needs (p_type, p_size) so the
# consumer NEVER re-joins partsupp back to part on p_partkey: offers
# derive per part ROW (the r9 supplier/part re-ingest campaign caught
# the re-join spelling going quadratic under duplicated part rows —
# oracle ×4 fan-out vs Spark's linear ×2).
_PS_SQL = """
    SELECT p.p_partkey, p.p_type, p.p_size,
           1 + (p.p_partkey * 13 + slot * 101) % (SELECT COUNT(*) FROM supplier)
             AS ps_suppkey,
           100 + (p.p_partkey * 7 + slot * 31) % 90000 AS ps_supplycost_cents
    FROM part p, (SELECT unnest(range(0, 4)) AS slot)
"""


@register(
    "q2_shape_synthetic",
    CAT_WORK,
    f"""
    WITH partsupp AS ({_PS_SQL})
    SELECT s.s_acctbal, s.s_name, n.n_name, ps.p_partkey, ps.p_type,
           ps.ps_supplycost_cents
    FROM partsupp ps
    JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'EUROPE'
      AND ps.p_size = 15
      AND ps.ps_supplycost_cents = (
        SELECT MIN(ps2.ps_supplycost_cents)
        FROM partsupp ps2
        JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
        JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
        JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
        WHERE ps2.p_partkey = ps.p_partkey AND r2.r_name = 'EUROPE'
      )
    """,
)
def q2_shape_synthetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape — minimum-cost supplier per part within a region,
    the correlated-scalar-MIN-subquery pattern — on a SYNTHESIZED
    partsupp (testdata ships none: FIXTURES.md; this was the documented
    sweep gap). The relation is a pure deterministic function of
    (p_partkey, slot), identical on both engines, so the shape is fully
    oracled; costs are integer cents so the per-part MIN never ties on a
    float. Spelled as the decorrelated plan Catalyst itself produces:
    compute the per-part regional minimum once (aggregate), then
    equi-join it back — never a per-row subquery execution.

    Scale shape: partsupp derives map-side from part × a 4-slot grid
    (no stored table needed); the min-cost aggregate and the final join
    both shuffle on p_partkey; dimensions broadcast."""
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    n_supp = supplier.count()
    slots = spark.range(4).select(F.col("id").cast("int").alias("slot"))
    ps = part.crossJoin(F.broadcast(slots)).select(
        "p_partkey",
        "p_type",
        "p_size",
        (1 + (F.col("p_partkey") * 13 + F.col("slot") * 101) % n_supp).alias(
            "ps_suppkey"
        ),
        (100 + (F.col("p_partkey") * 7 + F.col("slot") * 31) % 90000).alias(
            "ps_supplycost_cents"
        ),
    )
    euro_supp = (
        supplier.join(
            F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    offered = ps.join(euro_supp, ps.ps_suppkey == euro_supp.s_suppkey)
    min_cost = offered.groupBy("p_partkey").agg(
        F.min("ps_supplycost_cents").alias("min_cost")
    )
    return (
        offered.join(min_cost, "p_partkey")
        .filter(
            (F.col("ps_supplycost_cents") == F.col("min_cost"))
            & (F.col("p_size") == 15)
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            "ps_supplycost_cents",
        )
    )


_K_CENTERS = 4


def _ff_oracle() -> str:
    # unrolled farthest-first rounds: center 0 = smallest vec_id; each
    # round picks the point maximizing its min integer-squared-distance
    # to the chosen set (ties → smallest vec_id)
    ctes = ["""
    q AS (
      SELECT vec_id,
             list_transform(embedding, x ->
               CAST(ROUND(CAST(x AS DOUBLE) * 10000, 0) AS BIGINT)) AS vq
      FROM embeddings
    ),
    c0 AS (SELECT MIN(vec_id) AS cid FROM q)"""]
    chosen = ["(SELECT cid FROM c0)"]
    for r in range(1, _K_CENTERS):
        in_list = ", ".join(chosen)
        ctes.append(f"""
    d{r} AS (
      SELECT a.vec_id,
             MIN(list_sum(list_transform(range(1, 65),
               i -> (a.vq[i] - c.vq[i]) * (a.vq[i] - c.vq[i])))) AS mind
      FROM q a JOIN q c ON c.vec_id IN ({in_list})
      WHERE a.vec_id NOT IN ({in_list})
      GROUP BY a.vec_id
    ),
    c{r} AS (
      SELECT vec_id AS cid FROM d{r}
      ORDER BY mind DESC, vec_id LIMIT 1
    )""")
        chosen.append(f"(SELECT cid FROM c{r})")
    # FROM-based selects (not scalar subqueries): on an EMPTY corpus
    # every c{r} is zero rows / NULL, and the result must be EMPTY on
    # both engines, not four NULL rows (r9 empty-table sweep)
    selects = " UNION ALL ".join(
        f"SELECT {r} AS round, cid::BIGINT AS center_id FROM c{r}"
        f" WHERE cid IS NOT NULL"
        for r in range(_K_CENTERS)
    )
    return "WITH " + ",".join(ctes) + " " + selects


@register("vec_farthest_first_init", CAT_VEC, _ff_oracle())
def vec_farthest_first_init(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-center seeding by farthest-first traversal
    (Gonzalez 1985): start from the smallest vec_id, then repeatedly
    pick the point with the largest minimum distance to the chosen set
    (k=4 rounds, ties → smallest id). Distances are integer-exact
    (quantized BIGINT squared L2), so the traversal is bit-reproducible
    — the property random k-means++ seeding lacks and the reason a
    shared pipeline (ml_kmeans_step, IVF/SemDeDup cells) can regenerate
    identical centers on any cluster, any day.

    Scale shape: each round is one broadcast of ≤k chosen vectors +
    a map-side min-distance pass + a 1-row argmax (driver receives one
    scalar per round, never data). The oracle unrolls the same rounds
    as chained CTEs."""
    em = load_table(spark, sf_dir, "embeddings")
    q = em.select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> cast(round(cast(x AS double) * 10000, 0)"
            " AS bigint))"
        ).alias("vq"),
    ).localCheckpoint()
    first = q.agg(F.min("vec_id")).first()[0]
    if first is None:
        # empty corpus: no points, no centers (r9 empty-table sweep —
        # int(None) was a driver-side TypeError)
        return spark.createDataFrame([], "round int, center_id long")
    chosen = [int(first)]
    rows = [(0, chosen[0])]
    d2 = F.expr(
        "aggregate(zip_with(vq, cvq, (a, b) -> (a - b) * (a - b)),"
        " 0L, (acc, x) -> acc + x)"
    )
    for r in range(1, _K_CENTERS):
        centers = q.filter(F.col("vec_id").isin(chosen)).select(
            F.col("vq").alias("cvq")
        )
        best = (
            q.filter(~F.col("vec_id").isin(chosen))
            .crossJoin(F.broadcast(centers))
            .select("vec_id", d2.alias("d2"))
            .groupBy("vec_id")
            .agg(F.min("d2").alias("mind"))
            .orderBy(F.col("mind").desc(), F.col("vec_id").asc())
            .limit(1)
            .first()
        )
        chosen.append(int(best["vec_id"]))
        rows.append((r, chosen[-1]))
    return spark.createDataFrame(rows, "round int, center_id long")
