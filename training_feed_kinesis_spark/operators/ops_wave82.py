"""Wave 82: retrieval post-processing — MMR diversification and scalar
quantization accuracy.

  * ``vec_mmr_rerank``: maximal marginal relevance (Carbonell &
    Goldstein, SIGIR'98): greedily pick 5 of the probe's top-12
    candidates maximizing λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s) — the
    standard diversified rerank between ANN retrieval and the consumer.
    The greedy recursion is unrolled: five chained selections over a
    12-row candidate frame in Spark, five chained CTEs in the oracle,
    all scores ranked on 4-dp-rounded cosines (llm_sim_topk's
    determinism trick) with id tiebreaks.
  * ``vec_sq8_recall``: per-dimension min/max scalar quantization to
    8-bit codes, then recall@5 of integer-code L2 ranking vs the exact
    float ranking for a probe panel — the memory-for-recall dial
    (SQ8 = 4× smaller than float32) measured, beside PQ
    (vec_pq_codebook) and truncation (vec_trunc_recall).

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from .llm_similarity import VEC_ADMIT_SQL, load_embeddings_admitted
from ..tables import load_table

CAT = "2.J llm-pipeline (similarity)"

N_CAND = 12
N_PICK = 5
LAM = 0.7

_DOT_SQL = (
    "list_sum(list_transform(range(1, 65), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)
_NORM_SQL = (
    "sqrt(list_sum(list_transform({v}, x -> CAST(x AS DOUBLE)"
    " * CAST(x AS DOUBLE))))"
)
_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE)"
    " * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)"
)


def _mmr_oracle() -> str:
    """Unrolled greedy MMR as chained CTEs: sel_k picks the argmax of
    λ·rel − (1−λ)·max sim to sel_1..k−1 among remaining candidates."""
    cos = (
        f"CAST(ROUND(10000 * {_DOT_SQL.format(a='q.embedding', b='c.embedding')}"
        f" / ({_NORM_SQL.format(v='q.embedding')}"
        f" * {_NORM_SQL.format(v='c.embedding')}), 0) AS BIGINT)"
    )
    pair_cos = (
        f"CAST(ROUND(10000 * {_DOT_SQL.format(a='x.embedding', b='y.embedding')}"
        f" / ({_NORM_SQL.format(v='x.embedding')}"
        f" * {_NORM_SQL.format(v='y.embedding')}), 0) AS BIGINT)"
    )
    sql = f"""
    WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
    cand AS (
      SELECT c.vec_id, {cos} AS rel
      FROM embeddings c CROSS JOIN q
      WHERE c.vec_id != 0
      ORDER BY rel DESC, c.vec_id ASC LIMIT {N_CAND}
    ),
    cand_emb AS (
      -- pre-join candidates to their vectors so the pairwise step below is
      -- 12x12, never |embeddings|^2 (the planner won't reorder through the
      -- inequality join on its own)
      SELECT e.vec_id, e.embedding
      FROM embeddings e JOIN cand c ON c.vec_id = e.vec_id
    ),
    sims AS (
      SELECT x.vec_id AS a, y.vec_id AS b, {pair_cos} AS s
      FROM cand_emb x JOIN cand_emb y ON y.vec_id != x.vec_id
    ),
    sel1 AS (
      SELECT vec_id, rel, 7 * rel AS mmr
      FROM cand ORDER BY rel DESC, vec_id ASC LIMIT 1
    )"""
    prev_sels = ["sel1"]
    for k in range(2, N_PICK + 1):
        union = " UNION ALL ".join(
            f"SELECT vec_id FROM {s}" for s in prev_sels
        )
        sql += f""",
    sel{k} AS (
      SELECT c.vec_id, c.rel,
             7 * c.rel - 3 * MAX(s.s) AS mmr
      FROM cand c
      JOIN sims s ON s.a = c.vec_id AND s.b IN (SELECT vec_id FROM ({union}))
      WHERE c.vec_id NOT IN (SELECT vec_id FROM ({union}))
      GROUP BY c.vec_id, c.rel
      ORDER BY mmr DESC, c.vec_id ASC LIMIT 1
    )"""
        prev_sels.append(f"sel{k}")
    picks = " UNION ALL ".join(
        f"SELECT {i + 1} AS pick, vec_id, rel, mmr FROM {s}"
        for i, s in enumerate(prev_sels)
    )
    return sql + f"""
    SELECT CAST(pick AS BIGINT) AS pick, vec_id,
           CAST(rel AS BIGINT) AS rel_x1e4, CAST(mmr AS BIGINT) AS mmr_x1e5
    FROM ({picks})
    """


@register("vec_mmr_rerank", CAT, _mmr_oracle())
def vec_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal marginal relevance rerank: from the probe's top-12 cosine
    candidates, greedily select 5 maximizing λ·relevance −
    (1−λ)·(max similarity to anything already selected), λ = 0.7 — the
    diversification pass that stops a retrieval feed from returning
    five near-copies of the same document. Greedy selection is
    inherently sequential, so both engines unroll the SAME five steps
    (driver loop over a 12-row frame here, five chained CTEs in the
    oracle); cosines are quantized to integer 1e-4 units FIRST and the
    score is the exact integer 7·rel − 3·penalty (λ = 0.7 in 1e-5
    units) with vec_id tiebreaks, so every argmax is engine-exact —
    float λ-arithmetic on rounded doubles was measured to flip the
    4th decimal between engines.

    Scale shape: the corpus-sized work is the ONE broadcast-probe scan
    producing top-12; everything after operates on the candidate set
    (k² pairwise sims for k=12) — MMR cost is per-QUERY constant, the
    right shape for a rerank stage."""
    em = load_table(spark, sf_dir, "embeddings")
    q = em.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb")
    )
    dot_qc = F.expr(_DOT.format(a="q_emb", b="embedding"))
    norm = lambda c: F.sqrt(  # noqa: E731
        F.expr(
            f"aggregate({c}, 0D, (acc, x) -> acc + CAST(x AS DOUBLE)"
            " * CAST(x AS DOUBLE))"
        )
    )
    cand = (
        em.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "embedding",
            F.round(
                10000 * dot_qc / (norm("q_emb") * norm("embedding")), 0
            ).cast("long").alias("rel"),
        )
        .orderBy(F.col("rel").desc(), F.col("vec_id").asc())
        .limit(N_CAND)
    )
    cand = cand.cache()
    cx = cand.select(
        F.col("vec_id").alias("a"), F.col("embedding").alias("ea")
    )
    cy = cand.select(
        F.col("vec_id").alias("b"), F.col("embedding").alias("eb")
    )
    sims = (
        cx.crossJoin(cy)
        .filter(F.col("a") != F.col("b"))
        .select(
            "a",
            "b",
            F.round(
                10000 * F.expr(_DOT.format(a="ea", b="eb"))
                / (norm("ea") * norm("eb")),
                0,
            ).cast("long").alias("s"),
        )
        .cache()
    )
    rels = {
        r["vec_id"]: r["rel"] for r in cand.select("vec_id", "rel").collect()
    }
    sim_map = {(r["a"], r["b"]): r["s"] for r in sims.collect()}
    selected: list[int] = []
    rows = []
    for pick in range(1, N_PICK + 1):
        best = None
        for v in sorted(rels):
            if v in selected:
                continue
            pen = max((sim_map[(v, s)] for s in selected), default=None)
            # integer MMR in 1e-5 units: 7*rel - 3*penalty (lambda = 0.7)
            mmr = 7 * rels[v] if pen is None else 7 * rels[v] - 3 * pen
            if best is None or mmr > best[1] or (mmr == best[1] and v < best[0]):
                best = (v, mmr)
        if best is None:
            # candidate pool exhausted (empty corpus or < N_PICK
            # candidates) — stop, like the oracle's zero-row CTE chain
            # (r9 empty-table sweep: best[0] was a NoneType subscript)
            break
        selected.append(best[0])
        rows.append((pick, best[0], rels[best[0]], best[1]))
    cand.unpersist()
    sims.unpersist()
    return spark.createDataFrame(
        rows, "pick long, vec_id long, rel_x1e4 long, mmr_x1e5 long"
    )


@register(
    "vec_sq8_recall",
    CAT,
    f"""
    WITH {VEC_ADMIT_SQL},
    dims AS (
      SELECT i, MIN(CAST(embedding[i] AS DOUBLE)) AS lo,
             MAX(CAST(embedding[i] AS DOUBLE)) AS hi
      FROM embeddings_adm, UNNEST(range(1, 65)) AS t(i)
      GROUP BY i
    ),
    codes AS (
      SELECT e.vec_id,
             list(CAST(ROUND(255 * (CAST(e.embedding[d.i] AS DOUBLE) - d.lo)
                             / (d.hi - d.lo), 0) AS BIGINT)
                  ORDER BY d.i) AS code
      FROM embeddings_adm e CROSS JOIN dims d
      GROUP BY e.vec_id
    ),
    exact AS (
      SELECT a.vec_id AS probe, b.vec_id AS neighbor,
             ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY
               ROUND(list_sum(list_transform(range(1, 65),
                 i -> (CAST(a.embedding[i] AS DOUBLE)
                       - CAST(b.embedding[i] AS DOUBLE))
                      * (CAST(a.embedding[i] AS DOUBLE)
                         - CAST(b.embedding[i] AS DOUBLE)))), 4) ASC,
               b.vec_id ASC) AS rn
      FROM embeddings_adm a JOIN embeddings_adm b ON a.vec_id != b.vec_id
      WHERE a.vec_id < 10
    ),
    approx AS (
      SELECT ca.vec_id AS probe, cb.vec_id AS neighbor,
             ROW_NUMBER() OVER (PARTITION BY ca.vec_id ORDER BY
               list_sum(list_transform(range(1, 65),
                 i -> (ca.code[i] - cb.code[i]) * (ca.code[i] - cb.code[i])))
               ASC, cb.vec_id ASC) AS rn
      FROM codes ca JOIN codes cb ON ca.vec_id != cb.vec_id
      WHERE ca.vec_id < 10
    )
    SELECT e.probe,
           COUNT(*) FILTER (WHERE a.rn IS NOT NULL)::BIGINT AS hits,
           CAST((2 * COUNT(*) FILTER (WHERE a.rn IS NOT NULL) * 10000 + 5)
                // 10 AS BIGINT) AS recall_x1e4
    FROM exact e
    LEFT JOIN approx a ON a.probe = e.probe AND a.neighbor = e.neighbor
      AND a.rn <= 5
    WHERE e.rn <= 5
    GROUP BY e.probe
    """,
)
def vec_sq8_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar 8-bit quantization accuracy: per-dimension min/max ranges
    quantize every embedding to 64 integer codes (4× memory saving vs
    float32 — the cheapest ANN compression), and recall@5 of the
    integer-code L2 ranking vs the exact float ranking is measured on
    a 10-probe panel. Code distances are exact BIGINT sums, exact
    ranking runs on 4-dp-rounded distances with id tiebreaks — both
    rankings engine-deterministic. Completes the compression-accuracy
    family: truncation (vec_trunc_recall), PQ (vec_pq_codebook),
    sign-bit (vec_binary_sign_search), now SQ8.

    Scale shape: the dim ranges are a 64-row broadcast aggregate;
    coding is map-only; the brute-force panels are broadcast-probe
    linear scans (the llm_sim_topk shape)."""
    em = load_embeddings_admitted(spark, sf_dir)
    dims = (
        em.select(
            F.posexplode(F.col("embedding")).alias("i0", "x")
        )
        .groupBy((F.col("i0") + 1).alias("i"))
        .agg(
            F.min(F.col("x").cast("double")).alias("lo"),
            F.max(F.col("x").cast("double")).alias("hi"),
        )
    )
    ranges = dims.agg(
        F.array_sort(
            F.collect_list(F.struct("i", "lo", "hi"))
        ).alias("rs")
    )
    codes = em.crossJoin(F.broadcast(ranges)).select(
        "vec_id",
        "embedding",
        F.expr(
            "transform(rs, r -> CAST(ROUND(255 *"
            " (CAST(element_at(embedding, CAST(r.i AS INT)) AS DOUBLE)"
            " - r.lo) / (r.hi - r.lo), 0) AS BIGINT))"
        ).alias("code"),
    )
    probes_e = em.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("probe"), F.col("embedding").alias("pe")
    )
    d2 = F.expr(
        "aggregate(zip_with(pe, embedding, (x, y) ->"
        " (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))"
        " * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),"
        " 0D, (acc, v) -> acc + v)"
    )
    w_e = Window.partitionBy("probe").orderBy(
        F.col("d2r").asc(), F.col("neighbor").asc()
    )
    exact = (
        F.broadcast(probes_e)
        .crossJoin(em.select(F.col("vec_id").alias("neighbor"), "embedding"))
        .filter(F.col("probe") != F.col("neighbor"))
        .select(
            "probe", "neighbor", F.round(d2, 4).alias("d2r")
        )
        .withColumn("rn", F.row_number().over(w_e))
        .filter(F.col("rn") <= 5)
    )
    probes_c = codes.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("probe"), F.col("code").alias("pc")
    )
    dc = F.expr(
        "aggregate(zip_with(pc, code, (x, y) -> (x - y) * (x - y)),"
        " CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )
    w_a = Window.partitionBy("probe").orderBy(
        F.col("dci").asc(), F.col("neighbor").asc()
    )
    approx = (
        F.broadcast(probes_c)
        .crossJoin(codes.select(F.col("vec_id").alias("neighbor"), "code"))
        .filter(F.col("probe") != F.col("neighbor"))
        .select("probe", "neighbor", dc.alias("dci"))
        .withColumn("rn", F.row_number().over(w_a))
        .filter(F.col("rn") <= 5)
        .select("probe", "neighbor", F.col("rn").alias("arn"))
    )
    joined = exact.join(approx, ["probe", "neighbor"], "left")
    return joined.groupBy("probe").agg(
        F.sum(F.when(F.col("arn").isNotNull(), 1).otherwise(0)).alias("hits"),
        F.expr(
            "CAST((2 * SUM(CASE WHEN arn IS NOT NULL THEN 1 ELSE 0 END)"
            " * 10000 + 5) DIV 10 AS BIGINT)"
        ).alias("recall_x1e4"),
    )
