"""Graph analytics over relational substrates: degree, triangles, PageRank.

A training-feed corpus is full of implicit graphs (co-occurrence, linkage,
session transition). These operators show the DataFrame-native spellings:

  * Edge building is a bounded self-join (baskets cap the blow-up), with a
    min-support filter so the edge set stays sparse at any scale — the same
    discipline as ``part_affinity``.
  * Triangle counting uses the oriented-edge trick under a (degree, id)
    total order: each triangle is produced exactly once, and orienting
    low-degree → high-degree bounds wedge fan-out by arboricity (hubs have
    near-zero OUT-degree), the skew-proof plan. All equi-joins on node keys
    ⇒ shuffle-partitioned by node, no cartesian anywhere.
  * PageRank runs as a driver-side loop of join+agg over an aggregated
    transition graph whose size is the *domain* (event types), not the data —
    the iterate-on-aggregates pattern: one pass over the fact table, then
    iterations touch only domain-sized state. Dangling mass is impossible by
    construction (every node observed as a transition source). The oracle
    unrolls the same five iterations as chained CTEs, so even this iterative
    algorithm is hash-checked against DuckDB.

At 100 TB: edge construction is the only fact-scale stage (one shuffle by
basket key, one by edge key); everything downstream operates on the sparse
edge list. Companion of ``llm_dedup_clusters`` (connected components), which
already runs pointer-doubling to convergence.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md §0.1);
capability surface reconstructed per SURVEY.md §2 and BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

CAT = "2.L graph analytics"

# Shared edge builder: undirected part co-occurrence edges with support >= 2.
_EDGES_SQL = """
    WITH pairs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    edges AS (
      SELECT pa, pb FROM pairs GROUP BY pa, pb HAVING COUNT(*) >= 2
    )
"""


# The basket self-join that derives the support-thinned pair list is the
# single most expensive subexpression of the graph/mining family
# (graph_triangles, graph_degree, graph_pagerank seeds, assoc_rules all
# start from it). Materialize it once per (session, sf) — the thinned list
# is small — so consumers share one computation: common-subexpression reuse,
# the same thing a warehouse's materialized view would do at 100 TB.
_edges_cache: dict[str, DataFrame] = {}


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    cached = _edges_cache.get(sf_dir)
    if cached is not None:
        return cached
    # A line item with a NULL order key belongs to NO basket: the
    # oracle's self-join ON l_orderkey drops such rows (NULL never
    # equals), but groupBy would collect them into one spurious
    # mega-basket whose O(n²) pairs poison the edge set — the r9
    # NULL-PK campaign caught all ten graph/mining consumers at once
    # through this seam.
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .filter(F.col("l_orderkey").isNotNull())
    )
    # Pair generation spelled as groupBy(order)+collect_list then a
    # row-local array-combinations explode, NOT a lineitem self-join: one
    # shuffle (keyed by order) instead of two sorted join legs, and the
    # fan-out is bounded by basket width (<= 7 lineitems/order in this
    # schema), so the explode is O(w^2) per row with tiny w — the same
    # multiset of (pa, pb) pairs the oracle's self-join produces,
    # duplicates included (collect_list, not collect_set, on purpose).
    baskets = li.groupBy("l_orderkey").agg(F.collect_list("l_partkey").alias("ps"))
    pairs = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(ps, x ->"
                " transform(filter(ps, y -> y > x),"
                " y -> struct(x AS pa, y AS pb))))"
            )
        ).alias("e")
    ).select("e.pa", "e.pb")
    edges = (
        pairs.groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
        # EAGER localCheckpoint: concurrent consumers must not race a cold
        # store, and blocks self-clean when the memo entry is dropped
        # (r7 cache-residue class — cache() lived until unpersist)
        .localCheckpoint()
    )
    _edges_cache[sf_dir] = edges
    return edges


@register(
    "graph_degree",
    CAT,
    _EDGES_SQL
    + """
    , deg AS (
      SELECT node, COUNT(*)::BIGINT AS degree FROM (
        SELECT pa AS node FROM edges UNION ALL SELECT pb FROM edges
      ) GROUP BY node
    )
    SELECT degree, COUNT(*)::BIGINT AS n_parts
    FROM deg GROUP BY degree
    """,
)
def graph_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the co-purchase graph (support >= 2): how
    connected each part is, histogrammed. Undirected degree = occurrences
    on either edge endpoint; the unionByName avoids materializing a
    symmetric edge list twice its size.
    """
    e = _edges(spark, sf_dir)
    nodes = e.select(F.col("pa").alias("node")).unionByName(
        e.select(F.col("pb").alias("node"))
    )
    deg = nodes.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_parts"))


def _degree_oriented(e: DataFrame) -> DataFrame:
    """Re-orient an undirected edge list (pa, pb) from the LOWER-degree
    endpoint to the higher (ties broken by node id) → columns (src, dst).

    Any total order on nodes counts each triangle exactly once via the
    wedge+closure join; choosing (degree, id) as that order is the
    standard skew-proof triangle plan: a node's OUT-degree under degree
    orientation is bounded by O(√m) (arboricity bound), so the wedge
    join's fan-out at a hub is in(h)·out(h) ≈ deg(h)·O(√m) instead of the
    id-orientation worst case deg(h)²/4 — the difference between a plan
    that survives a power-law degree distribution at 100× and one that
    melts on the first celebrity node. Degrees come from the edge list
    itself (node-count-sized, broadcastable after support thinning)."""
    deg = (
        e.select(F.col("pa").alias("node"))
        .unionByName(e.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    withdeg = (
        e.join(F.broadcast(deg.withColumnRenamed("node", "pa")
                           .withColumnRenamed("deg", "da")), "pa")
        .join(F.broadcast(deg.withColumnRenamed("node", "pb")
                          .withColumnRenamed("deg", "db")), "pb")
    )
    fwd = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("pa") < F.col("pb"))
    )
    return withdeg.select(
        F.when(fwd, F.col("pa")).otherwise(F.col("pb")).alias("src"),
        F.when(fwd, F.col("pb")).otherwise(F.col("pa")).alias("dst"),
    )


@register(
    "graph_triangles",
    CAT,
    _EDGES_SQL
    + """
    SELECT COUNT(*)::BIGINT AS n_triangles,
           (SELECT COUNT(*) FROM edges)::BIGINT AS n_edges
    FROM edges e1
    JOIN edges e2 ON e1.pb = e2.pa
    JOIN edges e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
    """,
)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census on the support-thinned co-purchase graph. Edges are
    oriented low-degree → high-degree (ties by id; :func:`_degree_oriented`),
    so the wedge join e1(a,b)⋈e2(b,c) plus closure probe e3(a,c) counts
    each triangle exactly once AND hub fan-out is arboricity-bounded —
    the skew guard VERDICT r3 asked to land before it's needed. Every
    join is an equi-join on node keys ⇒ shuffles partition by node. The
    triangle SET is orientation-invariant, so the DuckDB oracle keeps the
    simpler pa<pb spelling — same count by construction.
    """
    # _edges is cached+materialized, so the three join legs and the edge
    # count all read one copy of the basket self-join result
    e = _edges(spark, sf_dir).select("pa", "pb")
    n_edges = e.count()
    o = _degree_oriented(e)
    e1 = o.alias("e1")
    e2 = o.alias("e2")
    e3 = o.alias("e3")
    return (
        e1.join(e2, F.col("e1.dst") == F.col("e2.src"))
        .join(
            e3,
            (F.col("e3.src") == F.col("e1.src"))
            & (F.col("e3.dst") == F.col("e2.dst")),
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
        .withColumn("n_edges", F.lit(n_edges).cast("long"))
    )


_PR_DAMP = 0.85
_PR_ITERS = 5


def _pagerank_oracle() -> str:
    """Unroll five weighted-PageRank iterations as chained CTEs."""
    head = """
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events WHERE ts IS NOT NULL
    ),
    edges AS (
      SELECT prev_type AS src, event_type AS dst, COUNT(*)::DOUBLE AS w
      FROM seq WHERE prev_type IS NOT NULL GROUP BY prev_type, event_type
    ),
    outw AS (SELECT src, SUM(w) AS ow FROM edges GROUP BY src),
    norm AS (
      SELECT e.src, e.dst, e.w / o.ow AS p
      FROM edges e JOIN outw o ON e.src = o.src
    ),
    nodes AS (SELECT DISTINCT dst AS node FROM edges
              UNION SELECT DISTINCT src FROM edges),
    nn AS (SELECT COUNT(*)::DOUBLE AS n FROM nodes),
    pr0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS pr FROM nodes)
    """
    steps = []
    for i in range(1, _PR_ITERS + 1):
        steps.append(
            f""",
    pr{i} AS (
      SELECT n.node,
             (1 - {_PR_DAMP}) / (SELECT n FROM nn)
               + {_PR_DAMP} * COALESCE(SUM(p.pr * p.p), 0) AS pr
      FROM nodes n
      LEFT JOIN (SELECT nrm.dst, nrm.p, prv.pr
                 FROM norm nrm JOIN pr{i - 1} prv ON nrm.src = prv.node) p
        ON p.dst = n.node
      GROUP BY n.node
    )"""
        )
    tail = f"""
    SELECT node AS event_type, ROUND(pr, 4) AS pagerank
    FROM pr{_PR_ITERS}
    """
    return head + "".join(steps) + tail


@register("graph_pagerank", CAT, _pagerank_oracle())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the event-type transition graph (damping
    0.85, five iterations). The fact table is touched ONCE — the lag
    window + groupBy collapses it to a domain×domain edge list — and the
    iterations then join/agg only that tiny normalized graph, so iteration
    cost is independent of data scale (iterate-on-aggregates). Every node
    has out-edges by construction (it appears as a transition source), so
    no dangling-mass term is needed. The oracle unrolls the identical five
    iterations in SQL: a rare hash-checked iterative algorithm.
    """
    from pyspark.sql.window import Window

    # NULL ts dropped on both engines (the r8 NULL-time seam)
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", F.col("event_id").asc_nulls_last())
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    edges = seq.groupBy(
        F.col("prev_type").alias("src"), F.col("event_type").alias("dst")
    ).agg(F.count(F.lit(1)).cast("double").alias("w"))
    outw = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    norm = edges.join(outw, "src").select(
        "src", "dst", (F.col("w") / F.col("ow")).alias("p")
    )
    nodes = (
        edges.select(F.col("dst").alias("node"))
        .union(edges.select(F.col("src").alias("node")))
        .distinct()
    )
    # eager localCheckpoint, not cache(): both frames feed every power
    # iteration; blocks self-clean after the returned plan is consumed
    norm = norm.localCheckpoint()
    nodes = nodes.localCheckpoint()
    n = nodes.count()  # domain-sized (5); fixes the teleport term
    if n == 0:
        # EMPTY corpus: no transitions, no graph — the oracle's CTE
        # chain (correctly) yields zero rows; the 1/n teleport term
        # would otherwise raise ZeroDivisionError (census r6)
        return spark.createDataFrame(
            [], "event_type STRING, pagerank DOUBLE"
        )
    pr = nodes.select("node", F.lit(1.0 / n).alias("pr"))
    for _ in range(_PR_ITERS):
        contrib = norm.join(pr, norm.src == pr.node).select(
            F.col("dst"), (F.col("pr") * F.col("p")).alias("c")
        )
        pr = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .groupBy("node")
            .agg(
                (
                    F.lit((1 - _PR_DAMP) / n)
                    + F.lit(_PR_DAMP) * F.coalesce(F.sum("c"), F.lit(0.0))
                ).alias("pr")
            )
        )
    return pr.select(
        F.col("node").alias("event_type"), F.round("pr", 4).alias("pagerank")
    )
