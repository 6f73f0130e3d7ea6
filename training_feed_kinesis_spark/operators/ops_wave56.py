"""Wave 56: community detection, tolerant casting, multimodal pairing audit.

  * ``graph_label_propagation``: 3 synchronous label-propagation rounds
    over the co-purchase graph (deterministic tie-breaks), community
    census — the clustering step between triangles (local) and
    connected components (global).
  * ``fn_try_cast``: TRY_CAST tolerant parsing over a mixed-validity
    string column — the ingest-side "parse what you can, count what you
    can't" surface.
  * ``multimodal_pairing_audit``: caption↔payload pairing completeness
    via one full outer join — orphan captions and orphan payloads are
    the rows a paired-modality trainer must not see.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table
from .graph import _EDGES_SQL, _edges

CAT_GRAPH = "2.L graph analytics"
CAT_FN = "2.H scalar functions"
CAT_MM = "2.J llm-pipeline (multimodal)"

LPA_ROUNDS = 3


def _lpa_oracle() -> str:
    rounds = []
    prev = "l0"
    for i in range(1, LPA_ROUNDS + 1):
        rounds.append(f"""
    c{i} AS (
      SELECT e.u AS node, l.lbl, COUNT(*) AS c
      FROM und e JOIN {prev} l ON l.node = e.v
      GROUP BY e.u, l.lbl
    ),
    l{i} AS (
      SELECT node, lbl FROM (
        SELECT node, lbl,
               ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, lbl) AS rn
        FROM c{i}
      ) WHERE rn = 1
    )""")
        prev = f"l{i}"
    return (
        _EDGES_SQL
        + f"""
    , und AS (
      SELECT pa AS u, pb AS v FROM edges
      UNION ALL SELECT pb, pa FROM edges
    ),
    l0 AS (SELECT DISTINCT u AS node, u AS lbl FROM und),
    {",".join(rounds)}
    SELECT lbl AS community,
           COUNT(*)::BIGINT AS n_nodes,
           MIN(node)::BIGINT AS min_node,
           MAX(node)::BIGINT AS max_node
    FROM {prev} GROUP BY lbl
    """
    )


@register("graph_label_propagation", CAT_GRAPH, _lpa_oracle())
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label propagation (3 rounds) on the support-thinned
    co-purchase graph: every node starts as its own label; each round it
    adopts the most frequent label among its neighbors (ties → smallest
    label, making the normally-stochastic LPA fully deterministic).
    Communities after round 3, censused. Sits between triangles (local
    cohesion) and connected components (global reach) in the graph
    family.

    Iterative mechanics follow the graph.py discipline: per round ONE
    node-keyed equi-join over the sparse edge list + a per-node argmax
    window; localCheckpoint cuts lineage per round (the BFS lesson —
    nested round plans re-derive every earlier round). The oracle
    unrolls identical rounds as chained CTEs, so the iteration is
    hash-checked, not rows-only."""
    edges = _edges(spark, sf_dir)
    und = edges.select(
        F.col("pa").alias("u"), F.col("pb").alias("v")
    ).unionByName(edges.select(F.col("pb").alias("u"), F.col("pa").alias("v")))
    labels = und.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    ).localCheckpoint()
    w = Window.partitionBy("node").orderBy(F.col("c").desc(), F.col("lbl").asc())
    for _ in range(LPA_ROUNDS):
        labels = (
            und.join(
                labels.select(F.col("node").alias("v"), "lbl"), "v"
            )
            .groupBy(F.col("u").alias("node"), "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", "lbl")
            .localCheckpoint()
        )
    return labels.groupBy(F.col("lbl").alias("community")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.min("node").cast("bigint").alias("min_node"),
        F.max("node").cast("bigint").alias("max_node"),
    )


@register(
    "fn_try_cast",
    CAT_FN,
    """
    WITH raw AS (
      SELECT event_id,
             CASE event_id % 3
               WHEN 0 THEN CAST(ROUND(value, 2) AS VARCHAR)
               WHEN 1 THEN 'n/a'
               ELSE CAST(event_id AS VARCHAR) END AS payload
      FROM events
    )
    SELECT
      COUNT(*)::BIGINT AS n_rows,
      COUNT(TRY_CAST(payload AS DOUBLE))::BIGINT AS n_numeric,
      (COUNT(*) - COUNT(TRY_CAST(payload AS DOUBLE)))::BIGINT AS n_failed,
      -- dialect note: DuckDB TRY_CAST('12.6' AS BIGINT) ROUNDS to 13 while
      -- Spark returns NULL; the oracle restates Spark's stricter semantics
      -- (digit-only strings are integers) as an independent derivation
      COUNT(CASE WHEN regexp_matches(payload, '^[0-9]+$') THEN 1 END)::BIGINT
        AS n_integer,
      -- exact integer cents (r10 ROUND-magnitude audit, §5.3.9): every
      -- parseable payload is a 2-dp decimal or an integer by
      -- construction, so the cent sum is the exact total; the raw float
      -- SUM at ~1.7e9 was engine-order-dependent AND sat in DuckDB's
      -- lossy ROUND grid
      CAST(SUM(CAST(ROUND(COALESCE(TRY_CAST(payload AS DOUBLE), 0) * 100,
                          0) AS BIGINT)) AS DOUBLE) / 100.0 AS parsed_sum
    FROM raw
    """,
)
def fn_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerant parsing surface: a mixed-validity string column (clean
    decimals, garbage markers, bare integers — derived deterministically
    from events) pushed through TRY_CAST to DOUBLE and BIGINT, with
    success/failure accounting and the parsed total. NULL-on-failure
    casting is how an ingest keeps one malformed field from poisoning a
    batch (the row-level analogue of source_json_permissive's
    record-level tolerance).

    Scale: pure map-side expression work inside codegen; the aggregate
    ships five numbers."""
    ev = load_table(spark, sf_dir, "events")
    raw = ev.select(
        "event_id",
        F.when(F.col("event_id") % 3 == 0, F.round("value", 2).cast("string"))
        .when(F.col("event_id") % 3 == 1, F.lit("n/a"))
        .otherwise(F.col("event_id").cast("string"))
        .alias("payload"),
    )
    num = F.expr("try_cast(payload AS double)")
    return raw.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.count(num).cast("bigint").alias("n_numeric"),
        (F.count(F.lit(1)) - F.count(num)).cast("bigint").alias("n_failed"),
        F.count(F.expr("try_cast(payload AS bigint)")).cast("bigint").alias("n_integer"),
        # exact integer cents (r10 ROUND-magnitude audit, §5.3.9): the
        # parseable payloads are 2-dp decimals / integers by construction
        (
            F.sum(
                F.expr(
                    "CAST(ROUND(COALESCE(try_cast(payload AS double), 0)"
                    " * 100, 0) AS BIGINT)"
                )
            ).cast("double")
            / 100.0
        ).alias("parsed_sum"),
    )


@register(
    "multimodal_pairing_audit",
    CAT_MM,
    # captions exist for even doc_ids; payloads for doc_id % 3 != 0 —
    # the full outer join classifies every id into paired / orphan sides
    """
    WITH captions AS (
      SELECT doc_id, lang FROM documents WHERE doc_id % 2 = 0
    ),
    payloads AS (
      SELECT doc_id,
             CASE doc_id % 3 WHEN 1 THEN 'image' ELSE 'audio' END AS modality
      FROM documents WHERE doc_id % 3 != 0
    )
    SELECT
      CASE WHEN c.doc_id IS NOT NULL AND p.doc_id IS NOT NULL THEN 'paired'
           WHEN c.doc_id IS NOT NULL THEN 'orphan_caption'
           ELSE 'orphan_payload' END AS pairing,
      COUNT(*)::BIGINT AS n_items,
      MIN(COALESCE(c.doc_id, p.doc_id))::BIGINT AS min_doc,
      MAX(COALESCE(c.doc_id, p.doc_id))::BIGINT AS max_doc
    FROM captions c FULL OUTER JOIN payloads p ON p.doc_id = c.doc_id
    GROUP BY 1
    """,
)
def multimodal_pairing_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired-modality integrity: one full outer join between the
    caption table and the payload manifest classifies every item as
    paired, orphan caption (text with no media), or orphan payload
    (media with no text) — the census a contrastive text↔media trainer
    runs first, because orphans silently shrink the usable pair set and
    skew the modality mix. Membership here is deterministic doc_id
    arithmetic standing in for two real delivery feeds.

    Scale shape: the join is id-keyed (both sides shuffle-partition on
    doc_id; payload BYTES are never touched — only the manifest), and
    the report is 3 rows."""
    d = load_table(spark, sf_dir, "documents")
    captions = d.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("c_id"), "lang"
    )
    payloads = d.filter(F.col("doc_id") % 3 != 0).select(
        F.col("doc_id").alias("p_id"),
        F.when(F.col("doc_id") % 3 == 1, "image").otherwise("audio").alias(
            "modality"
        ),
    )
    joined = captions.join(
        payloads, captions.c_id == payloads.p_id, "full_outer"
    )
    pairing = (
        F.when(F.col("c_id").isNotNull() & F.col("p_id").isNotNull(), "paired")
        .when(F.col("c_id").isNotNull(), "orphan_caption")
        .otherwise("orphan_payload")
    )
    return joined.select(
        pairing.alias("pairing"), F.coalesce("c_id", "p_id").alias("doc_id")
    ).groupBy("pairing").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.min("doc_id").cast("bigint").alias("min_doc"),
        F.max("doc_id").cast("bigint").alias("max_doc"),
    )
