"""Wave 31: k-core peeling, exact decimal accounting.

  * ``graph_kcore``: 3 unrolled rounds of k-core peeling on the
    co-purchase graph — the degeneracy-ordering primitive behind
    community cores and influencer pruning.
  * ``agg_decimal_exact``: money arithmetic on DECIMAL(18,4) — exact
    cents accounting with the double-precision drift measured alongside
    (the reason financial rollups never run on doubles).

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

CAT_GRAPH = "2.L graph analytics"
CAT_AGG = "2.D aggregations"

_K = 3        # core order
_ROUNDS = 3   # unrolled peel rounds


def _peel_sql(src: str, out: str) -> str:
    # MATERIALIZED: each round references its predecessor four times
    # (two degree legs + two keep joins); DuckDB inlines plain CTEs, so
    # without materialization the basket self-join re-evaluates ~4^rounds
    # times (measured: 100 s vs ~2 s at sf0.01)
    return f"""
    {out}_deg AS MATERIALIZED (
      SELECT node, COUNT(*)::BIGINT AS deg FROM (
        SELECT pa AS node FROM {src} UNION ALL SELECT pb FROM {src}
      ) GROUP BY node
    ),
    {out}_keep AS MATERIALIZED (SELECT node FROM {out}_deg WHERE deg >= {_K}),
    {out} AS MATERIALIZED (
      SELECT e.pa, e.pb FROM {src} e
      JOIN {out}_keep ka ON ka.node = e.pa
      JOIN {out}_keep kb ON kb.node = e.pb
    )"""


@register(
    "graph_kcore",
    CAT_GRAPH,
    f"""
    WITH pairs AS MATERIALIZED (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    e0 AS MATERIALIZED (
      SELECT pa, pb FROM pairs GROUP BY pa, pb HAVING COUNT(*) >= 2
    ),
    {_peel_sql('e0', 'e1')},
    {_peel_sql('e1', 'e2')},
    {_peel_sql('e2', 'e3')}
    SELECT 0::BIGINT AS round, (SELECT COUNT(*) FROM e0)::BIGINT AS n_edges,
           COUNT(*)::BIGINT AS n_nodes
    FROM (SELECT DISTINCT node FROM (SELECT pa AS node FROM e0
                                     UNION ALL SELECT pb FROM e0))
    UNION ALL
    SELECT 1, (SELECT COUNT(*) FROM e1), COUNT(*)
    FROM (SELECT DISTINCT node FROM (SELECT pa AS node FROM e1
                                     UNION ALL SELECT pb FROM e1))
    UNION ALL
    SELECT 2, (SELECT COUNT(*) FROM e2), COUNT(*)
    FROM (SELECT DISTINCT node FROM (SELECT pa AS node FROM e2
                                     UNION ALL SELECT pb FROM e2))
    UNION ALL
    SELECT 3, (SELECT COUNT(*) FROM e3), COUNT(*)
    FROM (SELECT DISTINCT node FROM (SELECT pa AS node FROM e3
                                     UNION ALL SELECT pb FROM e3))
    """,
)
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core peeling (k=3), three unrolled rounds: drop every node with
    degree < 3, keep edges whose BOTH endpoints survive, repeat —
    converging toward the 3-core (edge/endpoint counts per round show
    the contraction). The same unrolled-iteration discipline as
    ``graph_pagerank``: at 100 TB each round is one degree aggregate +
    one semi join, and a driver loop with localCheckpoint replaces the
    fixed unroll when iterating to convergence.

    Reuses the cached support-thinned edge list (``_edges``) as round 0."""
    from .graph import _edges

    e0 = _edges(spark, sf_dir).select("pa", "pb")

    def peel(e: DataFrame) -> DataFrame:
        deg = (
            e.select(F.col("pa").alias("node"))
            .unionByName(e.select(F.col("pb").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= _K).select("node")
        return (
            e.join(keep.withColumnRenamed("node", "pa"), "pa", "left_semi")
            .join(keep.withColumnRenamed("node", "pb"), "pb", "left_semi")
            .select("pa", "pb")
        )

    # EAGER localCheckpoint each round: round r feeds four consumers (two
    # degree legs, the stats row, and round r+1) — unmaterialized, the
    # compound lineage re-evaluates ~4^r times (measured 22.8 s -> ~2 s at
    # sf0.01). Checkpoint (not cache) also TRUNCATES the lineage and the
    # blocks self-clean when the frames go out of scope (r7 residue class).
    # The materialized frames are support-thinned edge lists (tiny).
    rounds = [e0]
    for _ in range(_ROUNDS):
        rounds.append(peel(rounds[-1]).localCheckpoint())

    def stats(e: DataFrame, i: int) -> DataFrame:
        nodes = (
            e.select(F.col("pa").alias("node"))
            .unionByName(e.select(F.col("pb").alias("node")))
            .distinct()
            .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        )
        edges = e.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
        return edges.crossJoin(nodes).select(
            F.lit(i).cast("long").alias("round"), "n_edges", "n_nodes"
        )

    out = stats(rounds[0], 0)
    for i in range(1, _ROUNDS + 1):
        out = out.unionByName(stats(rounds[i], i))
    return out


@register(
    "agg_decimal_exact",
    CAT_AGG,
    """
    SELECT l_returnflag,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
                     AS DECIMAL(28,4)) AS VARCHAR) AS exact_sum,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                         * CAST(l_discount AS DECIMAL(18,4)))
                     AS DECIMAL(28,8)) AS VARCHAR) AS exact_discount_total,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_decimal_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact money accounting: extended prices and discount totals summed
    as DECIMAL(18,4) — associative EXACT arithmetic, so the result is
    identical under any partitioning/aggregation order (doubles are not:
    their sum drifts with reduction order, which is why a financial
    rollup on doubles can differ run to run at scale). The decimal sums
    hash-match the oracle digit for digit with NO rounding discipline
    needed — that absence is the point. (Both sides serialize the exact
    decimal as its STRING form: the comparison harness coerces decimals
    to float64 otherwise, silently reintroducing the imprecision the
    operator exists to avoid.)

    Scale: decimal aggregation partial-aggregates map-side exactly like
    longs (128-bit accumulators); the cast is row-local."""
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,4)")
    disc = F.col("l_discount").cast("decimal(18,4)")
    return li.groupBy("l_returnflag").agg(
        F.sum(price)
        .cast("decimal(28,4)")
        .cast("string")
        .alias("exact_sum"),
        F.sum(price * disc)
        .cast("decimal(28,8)")
        .cast("string")
        .alias("exact_discount_total"),
        F.count(F.lit(1)).alias("n"),
    )
