"""Wave 36: video frame sampling, audio chunking, BFS distance layers.

  * ``multimodal_frame_sample``: deterministic uniform frame-sampling
    manifest per video clip (duration/fps from typed metadata) — the
    exploded (clip, slot, frame_idx) table a multimodal loader fetches
    frames by. The decode itself stays a stubbed mapInPandas kernel
    (multimodal.py); THIS op is the pure-relational planning stage that
    runs at full corpus scale before any codec is touched.
  * ``multimodal_audio_windows``: overlapping audio window layout
    (window/hop) per clip with coverage + tail-gap accounting, aggregated
    per source — the chunking audit run before feature extraction.
  * ``graph_bfs_distance``: breadth-first distance layers (3 unrolled
    rounds) from the smallest node of the co-purchase graph — the
    reachability census that complements ``llm_dedup_clusters``'s full
    connected components.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table
from .graph import _EDGES_SQL, _edges

CAT_MM = "2.J llm-pipeline (multimodal)"
CAT_GRAPH = "2.L graph analytics"

MAX_FRAMES = 32       # frame-sample budget per clip
SAMPLE_EVERY_S = 2    # target one frame per 2 seconds
AUDIO_WIN_MS = 2000
AUDIO_HOP_MS = 1500
BFS_ROUNDS = 3


@register(
    "multimodal_frame_sample",
    CAT_MM,
    f"""
    WITH clips AS (
      SELECT doc_id,
             5 + doc_id % 116 AS duration_s,
             CASE doc_id % 3 WHEN 0 THEN 24 WHEN 1 THEN 25 ELSE 30 END AS fps
      FROM documents WHERE doc_id % 3 = 2
    ),
    planned AS (
      SELECT doc_id, duration_s, fps,
             LEAST({MAX_FRAMES},
                   CAST(ceil(duration_s / {SAMPLE_EVERY_S}.0) AS BIGINT))
               AS n_samples
      FROM clips
    )
    SELECT doc_id, duration_s, fps, n_samples,
           slot,
           CAST(floor(slot * duration_s * fps / n_samples) AS BIGINT)
             AS frame_idx
    FROM (
      SELECT p.*, unnest(range(0, n_samples)) AS slot FROM planned p
    )
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform frame-sampling manifest: per video clip (synthetic
    duration 5-120 s and 24/25/30 fps derived from doc_id — the stand-in
    for a real typed-metadata struct), plan min(32, ceil(dur/2)) sample
    slots and map slot k to frame index floor(k·dur·fps/n) — integer
    arithmetic end to end, so both engines agree exactly.

    Scale shape: the manifest is pure map-side (explode bounded by the
    32-frame budget, no shuffle at all); at 100 TB the loader semi-joins
    this manifest against the byte-range index of the video shards, and
    the decode (the expensive part) runs only on the ≤32 planned frames
    per clip — sampling-before-decode is THE cost lever for video feeds."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 2)
    clips = d.select(
        "doc_id",
        (5 + F.col("doc_id") % 116).alias("duration_s"),
        F.element_at(
            F.array(F.lit(24), F.lit(25), F.lit(30)),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).cast("bigint").alias("fps"),
    )
    planned = clips.withColumn(
        "n_samples",
        F.least(
            F.lit(MAX_FRAMES).cast("bigint"),
            F.ceil(F.col("duration_s") / float(SAMPLE_EVERY_S)),
        ),
    )
    return planned.select(
        "*",
        F.explode(
            F.sequence(F.lit(0).cast("bigint"), F.col("n_samples") - 1)
        ).alias("slot"),
    ).select(
        "doc_id",
        "duration_s",
        "fps",
        "n_samples",
        "slot",
        F.floor(
            F.col("slot") * F.col("duration_s") * F.col("fps") / F.col("n_samples")
        ).alias("frame_idx"),
    )


@register(
    "multimodal_audio_windows",
    CAT_MM,
    f"""
    WITH clips AS (
      SELECT doc_id, source, 1000 * (3 + doc_id % 60) AS dur_ms
      FROM documents WHERE doc_id % 3 = 0
    ),
    layout AS (
      SELECT doc_id, source, dur_ms,
             CASE WHEN dur_ms < {AUDIO_WIN_MS} THEN 1
                  ELSE 1 + (dur_ms - {AUDIO_WIN_MS}) // {AUDIO_HOP_MS}
             END AS n_windows
      FROM clips
    ),
    audited AS (
      SELECT doc_id, source, dur_ms, n_windows,
             LEAST(dur_ms,
                   {AUDIO_WIN_MS} + (n_windows - 1) * {AUDIO_HOP_MS})
               AS covered_ms
      FROM layout
    )
    SELECT source,
           COUNT(*)::BIGINT AS n_clips,
           CAST(SUM(n_windows) AS BIGINT) AS total_windows,
           CAST(SUM(dur_ms - covered_ms) AS BIGINT) AS total_tail_gap_ms,
           ROUND(AVG(covered_ms::DOUBLE / dur_ms), 4) AS avg_coverage,
           CAST(MAX(n_windows) AS BIGINT) AS max_windows
    FROM audited GROUP BY source
    """,
)
def multimodal_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping audio-window layout audit: per clip (synthetic 3-62 s
    duration from doc_id), the 2000 ms window / 1500 ms hop grid yields
    1 + floor((dur-win)/hop) windows; coverage = win + (n-1)·hop clipped
    at dur, and the tail gap is what a final ragged window would need to
    absorb. Aggregated per source — the audit a feature-extraction stage
    reads to size its budget. Integer ms arithmetic end to end.

    Scale shape: map-side layout + low-cardinality aggregate; no payload
    bytes move (the layout runs on metadata alone, then the extractor
    seeks byte ranges per planned window)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)
    clips = d.select(
        "doc_id", "source", (1000 * (3 + F.col("doc_id") % 60)).alias("dur_ms")
    )
    n_windows = F.when(F.col("dur_ms") < AUDIO_WIN_MS, F.lit(1)).otherwise(
        1 + F.floor((F.col("dur_ms") - AUDIO_WIN_MS) / AUDIO_HOP_MS)
    )
    layout = clips.withColumn("n_windows", n_windows.cast("bigint"))
    audited = layout.withColumn(
        "covered_ms",
        F.least(
            F.col("dur_ms"),
            F.lit(AUDIO_WIN_MS) + (F.col("n_windows") - 1) * AUDIO_HOP_MS,
        ),
    )
    return audited.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_clips"),
        F.sum("n_windows").cast("long").alias("total_windows"),
        F.sum(F.col("dur_ms") - F.col("covered_ms"))
        .cast("long")
        .alias("total_tail_gap_ms"),
        F.round(F.avg(F.col("covered_ms").cast("double") / F.col("dur_ms")), 4)
        .alias("avg_coverage"),
        F.max("n_windows").cast("long").alias("max_windows"),
    )


def _bfs_oracle() -> str:
    """Unrolled BFS as chained CTEs: fi = nodes first reached at depth i."""
    parts = [
        _EDGES_SQL,
        """,
    und AS (SELECT pa AS u, pb AS v FROM edges
            UNION ALL SELECT pb, pa FROM edges),
    f0 AS (SELECT MIN(u) AS node FROM und),
    seen0 AS (SELECT node FROM f0)""",
    ]
    for i in range(1, BFS_ROUNDS + 1):
        parts.append(f""",
    f{i} AS (
      SELECT DISTINCT und.v AS node
      FROM und JOIN f{i - 1} ON und.u = f{i - 1}.node
      WHERE und.v NOT IN (SELECT node FROM seen{i - 1})
    ),
    seen{i} AS (SELECT node FROM seen{i - 1} UNION SELECT node FROM f{i})""")
    selects = [
        f"SELECT {i}::BIGINT AS dist, COUNT(*)::BIGINT AS n_nodes, "
        f"MIN(node)::BIGINT AS min_node, MAX(node)::BIGINT AS max_node "
        f"FROM f{i}"
        for i in range(BFS_ROUNDS + 1)
    ]
    return "".join(parts) + "\n" + "\nUNION ALL\n".join(selects)


@register("graph_bfs_distance", CAT_GRAPH, _bfs_oracle())
def graph_bfs_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS distance layers from the smallest node of the support-thinned
    co-purchase graph: three frontier-expansion rounds (join frontier →
    neighbors, anti-join the seen set, dedupe), reporting per-depth node
    census. The hop-bounded reachability probe ('what's within k hops of
    this entity') that sits between degree (1 hop) and full connected
    components (∞ hops).

    Iterative mechanics match graph.py's discipline: each round is one
    node-keyed equi-join + one anti-join over the SPARSE edge list (the
    fact-scale work happened once in the shared edge builder); frontiers
    shrink geometrically. At 100 TB the rounds checkpoint the seen set
    (here lineage stays 3 deep — no checkpoint needed); the oracle unrolls
    the identical rounds as chained CTEs, so the iteration is hash-checked,
    not rows-only."""
    edges = _edges(spark, sf_dir)
    und = edges.select(
        F.col("pa").alias("u"), F.col("pb").alias("v")
    ).unionByName(edges.select(F.col("pb").alias("u"), F.col("pa").alias("v")))
    # Eager localCheckpoint per round: without it each layer's plan nests
    # every earlier round's joins (layer k re-derives frontiers 1..k-1 from
    # scratch inside ONE final union plan) — measured 18 s vs 1.5 s at
    # sf0.01. Cluster deployments use checkpoint(dir) for the same cut.
    frontier = und.agg(F.min("u").alias("node")).localCheckpoint()
    seen = frontier
    layers = [
        frontier.agg(
            F.lit(0).cast("long").alias("dist"),
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.min("node").cast("long").alias("min_node"),
            F.max("node").cast("long").alias("max_node"),
        )
    ]
    for i in range(1, BFS_ROUNDS + 1):
        frontier = (
            und.join(frontier.withColumnRenamed("node", "u"), "u")
            .select(F.col("v").alias("node"))
            .join(seen, "node", "left_anti")
            .distinct()
            .localCheckpoint()
        )
        seen = seen.unionByName(frontier).localCheckpoint()
        layers.append(
            frontier.agg(
                F.lit(i).cast("long").alias("dist"),
                F.count(F.lit(1)).cast("long").alias("n_nodes"),
                F.min("node").cast("long").alias("min_node"),
                F.max("node").cast("long").alias("max_node"),
            )
        )
    out = layers[0]
    for df in layers[1:]:
        out = out.unionByName(df)
    return out
