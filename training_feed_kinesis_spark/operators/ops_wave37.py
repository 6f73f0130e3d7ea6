"""Wave 37: IVF index-build manifest, IVF query router, code detection.

  * ``llm_ivf_build_manifest``: the index-BUILD side of IVF ANN search —
    coarse-quantize the corpus into centroid cells, size each posting
    list in bytes, and offset-shard cells into index files. What
    ``llm_sim_ivf`` routes against at query time, this op materializes at
    build time.
  * ``llm_ivf_query_router``: the query-side fanout planner — per probe,
    pick the nprobe=2 nearest cells (on rounded cosine) and account the
    candidate count / scan fraction that choice buys. The recall/cost
    dial of IVF, as a table.
  * ``llm_code_detect``: code-vs-prose detection from symbol-density
    censuses (braces/semicolons/operators per char) — the
    mixture-composition gate that decides whether a doc routes to the
    code pipeline or the text pipeline.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load_table, parallelize
from .llm_similarity import _DOT, _DOT_SQL, _NORM_SQL

CAT_SIM = "2.J llm-pipeline (similarity)"
CAT_TEXT = "2.J llm-pipeline (text)"

N_CELLS = 8
VEC_BYTES = 64 * 4 + 8       # float32[64] + int64 id per posting entry
INDEX_SHARD_BYTES = 20_000
N_PROBE_CELLS = 2
ROUTER_PROBES = 20

# Shared coarse-quantizer CTE: assign every vector to its nearest seed
# centroid (vec_id < N_CELLS), ranked on ROUND(cos,4) with cell-id
# tiebreak — identical discipline to llm_semdedup_cell (ops_wave34).
_ASSIGN_SQL = f"""
    cent AS (
      SELECT vec_id AS cell_id, embedding AS c_emb FROM embeddings
      WHERE vec_id < {N_CELLS}
    ),
    assign AS (
      SELECT vec_id, cell_id,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC,
                                cell_id ASC) AS rn
      FROM (
        SELECT e.vec_id, c.cell_id,
               ROUND({_DOT_SQL.format(a='e.embedding', b='c.c_emb')}
                     / ({_NORM_SQL.format(v='e.embedding')}
                        * {_NORM_SQL.format(v='c.c_emb')}), 4) AS cos
        FROM embeddings e CROSS JOIN cent c
      )
    ),
    cells AS (SELECT vec_id, cell_id FROM assign WHERE rn = 1)
"""


def _spark_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = load_table(spark, sf_dir, "embeddings")
    cent = em.filter(F.col("vec_id") < N_CELLS).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("c_emb")
    )
    scored = (
        parallelize(em)
        .crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            "cell_id",
            F.round(
                F.expr(_DOT.format(a="embedding", b="c_emb"))
                / (
                    F.sqrt(F.expr(_DOT.format(a="embedding", b="embedding")))
                    * F.sqrt(F.expr(_DOT.format(a="c_emb", b="c_emb")))
                ),
                4,
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos").desc(), F.col("cell_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cell_id")
    )


@register(
    "llm_ivf_build_manifest",
    CAT_SIM,
    f"""
    WITH {_ASSIGN_SQL},
    sized AS (
      SELECT cell_id, COUNT(*)::BIGINT AS n_vectors,
             (COUNT(*) * {VEC_BYTES})::BIGINT AS cell_bytes
      FROM cells GROUP BY cell_id
    ),
    packed AS (
      SELECT cell_id, n_vectors, cell_bytes,
             COALESCE(SUM(cell_bytes) OVER (ORDER BY cell_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS off
      FROM sized
    ),
    total AS (SELECT SUM(n_vectors)::DOUBLE AS n FROM sized)
    SELECT cell_id, n_vectors, cell_bytes,
           CAST(off // {INDEX_SHARD_BYTES} AS BIGINT) AS shard_id,
           ROUND(n_vectors / (SELECT n FROM total), 4) AS cell_share
    FROM packed
    """,
)
def llm_ivf_build_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index-build manifest: coarse-quantize the corpus (8 seed
    centroids, map-side broadcast assignment), size each cell's posting
    list at 264 B/entry (float32[64] + id), and offset-shard cells into
    ~20 KB index files in cell order. `cell_share` is the balance monitor:
    a cell holding ≫1/n_cells of the corpus means the quantizer is
    degenerate there and that posting list needs a re-split (exactly the
    signal llm_semdedup_cell acts on for dedup).

    Scale shape: assignment is the only data-scale stage (map-only);
    everything after runs on n_cells rows. The build at 100 TB
    repartitions BY cell_id so each posting list lands contiguous in its
    shard file — the shuffle is (id, cell) pairs, never the vectors
    themselves (they re-join the writer by id within each cell
    partition)."""
    cells = _spark_cells(spark, sf_dir)
    sized = cells.groupBy("cell_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        (F.count(F.lit(1)) * VEC_BYTES).cast("long").alias("cell_bytes"),
    )
    w_off = Window.orderBy("cell_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    packed = sized.withColumn(
        "off", F.coalesce(F.sum("cell_bytes").over(w_off), F.lit(0))
    )
    total = sized.agg(F.sum("n_vectors").cast("double").alias("n"))
    return packed.crossJoin(F.broadcast(total)).select(
        "cell_id",
        "n_vectors",
        "cell_bytes",
        F.floor(F.col("off") / INDEX_SHARD_BYTES).alias("shard_id"),
        F.round(F.col("n_vectors") / F.col("n"), 4).alias("cell_share"),
    )


@register(
    "llm_ivf_query_router",
    CAT_SIM,
    f"""
    WITH {_ASSIGN_SQL},
    sized AS (
      SELECT cell_id, COUNT(*)::BIGINT AS n_vectors FROM cells
      GROUP BY cell_id
    ),
    probe_cells AS (
      SELECT vec_id AS probe_id, cell_id, cos,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY cos DESC, cell_id ASC) AS rn
      FROM (
        SELECT e.vec_id, c.cell_id,
               ROUND({_DOT_SQL.format(a='e.embedding', b='c.c_emb')}
                     / ({_NORM_SQL.format(v='e.embedding')}
                        * {_NORM_SQL.format(v='c.c_emb')}), 4) AS cos
        FROM embeddings e CROSS JOIN cent c
        WHERE e.vec_id < {ROUTER_PROBES}
      )
    ),
    total AS (SELECT SUM(n_vectors)::DOUBLE AS n FROM sized)
    SELECT p.probe_id,
           string_agg(p.cell_id::VARCHAR, ',' ORDER BY p.rn) AS probed_cells,
           SUM(s.n_vectors)::BIGINT AS n_candidates,
           ROUND(SUM(s.n_vectors) / (SELECT n FROM total), 4) AS scan_fraction
    FROM probe_cells p JOIN sized s ON s.cell_id = p.cell_id
    WHERE p.rn <= {N_PROBE_CELLS}
    GROUP BY p.probe_id
    """,
)
def llm_ivf_query_router(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF query-side routing: per probe vector, choose the nprobe=2
    nearest centroid cells (rounded cosine, cell-id tiebreak) and account
    what that fanout costs — candidate count and the fraction of the
    corpus actually scanned. THE recall/latency dial of IVF search: the
    companion `llm_ann_recall` measures what recall a given nprobe buys,
    this table shows what it costs.

    Scale shape: probes × 8 centroids is broadcast map-work; the join to
    cell sizes is n_cells rows broadcast back — per-query cost is
    independent of corpus size, which is the entire point of the coarse
    quantizer."""
    em = load_table(spark, sf_dir, "embeddings")
    cent = em.filter(F.col("vec_id") < N_CELLS).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("c_emb")
    )
    probes = em.filter(F.col("vec_id") < ROUTER_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("p_emb")
    )
    scored = (
        F.broadcast(probes)
        .crossJoin(F.broadcast(cent))
        .select(
            "probe_id",
            "cell_id",
            F.round(
                F.expr(_DOT.format(a="p_emb", b="c_emb"))
                / (
                    F.sqrt(F.expr(_DOT.format(a="p_emb", b="p_emb")))
                    * F.sqrt(F.expr(_DOT.format(a="c_emb", b="c_emb")))
                ),
                4,
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cos").desc(), F.col("cell_id").asc()
    )
    picked = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= N_PROBE_CELLS)
    )
    sized = _spark_cells(spark, sf_dir).groupBy("cell_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors")
    )
    total = sized.agg(F.sum("n_vectors").cast("double").alias("n"))
    return (
        picked.join(F.broadcast(sized), "cell_id")
        .crossJoin(F.broadcast(total))
        .groupBy("probe_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rn", "cell_id"))),
                    lambda s: s.cell_id.cast("string"),
                ),
                ",",
            ).alias("probed_cells"),
            F.sum("n_vectors").cast("long").alias("n_candidates"),
            F.round(F.sum("n_vectors") / F.first("n"), 4).alias(
                "scan_fraction"
            ),
        )
    )


@register(
    "llm_code_detect",
    CAT_TEXT,
    """
    WITH census AS (
      SELECT doc_id, source,
             len(regexp_extract_all(text, '[{}();=<>\\[\\]]')) AS n_sym,
             GREATEST(length(text), 1) AS n_chars_g
      FROM documents
    ),
    scored AS (
      SELECT doc_id, source,
             ROUND(n_sym::DOUBLE / n_chars_g, 4) AS symbol_rate
      FROM census
    )
    SELECT source,
           COUNT(*)::BIGINT AS n_docs,
           ROUND(AVG(symbol_rate), 4) AS avg_symbol_rate,
           ROUND(AVG(CASE WHEN symbol_rate >= 0.02 THEN 1.0 ELSE 0.0 END), 4)
             AS code_share,
           CAST(SUM(CASE WHEN symbol_rate >= 0.02 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_code_docs
    FROM scored GROUP BY source
    """,
)
def llm_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose routing signal: the density of code-punctuation
    characters (braces, parens, semicolons, operators, brackets) per
    char. Docs at or above 2% symbol density (compared on the ROUNDED
    rate, never raw floats) route to the code pipeline — per-source
    shares are what a mixture designer reads. Pure regex census, no
    tokenizer dependency, identical pattern in both engines.

    Scale shape: one regexp census per row, map-side; the aggregate
    carries one (source, double) pair per doc."""
    d = load_table(spark, sf_dir, "documents")
    n_sym = F.size(
        F.expr(r"regexp_extract_all(text, '[{}();=<>\\[\\]]', 0)")
    )
    scored = d.select(
        "doc_id",
        "source",
        F.round(
            n_sym.cast("double") / F.greatest(F.length("text"), F.lit(1)), 4
        ).alias("symbol_rate"),
    )
    is_code = F.col("symbol_rate") >= 0.02
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(F.avg("symbol_rate"), 4).alias("avg_symbol_rate"),
        F.round(F.avg(F.when(is_code, 1.0).otherwise(0.0)), 4).alias(
            "code_share"
        ),
        F.sum(F.when(is_code, 1).otherwise(0)).cast("long").alias("n_code_docs"),
    )
