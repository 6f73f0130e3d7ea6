"""Wave 51: privacy audits, product quantization, corpus ordering.

  * ``dq_kanonymity``: k-anonymity audit over a quasi-identifier tuple —
    per policy threshold k, how many QI groups (and rows) would need
    suppression before an export. The privacy gate a training-data
    release runs before shipping user-adjacent tables.
  * ``dq_ldiversity``: the companion l-diversity audit — distinct
    sensitive values per QI group, histogrammed; k-anonymity without
    l-diversity still leaks when a small group is homogeneous.
  * ``vec_pq_codebook``: product-quantization assignment + reconstruction
    error — the memory half of the ANN story (IVF routes, PQ compresses:
    64 float32 dims → 8 one-byte codes). All distance math on quantized
    BIGINTs, so assignment is exactly reproducible cross-engine.
  * ``llm_source_winrate``: one-vs-rest Mann-Whitney win rate per source
    — P(random doc from the source outranks a random doc from the rest)
    — computed from ONE global midrank pass, not n² pairs.
  * ``llm_curriculum_order``: difficulty-staged curriculum schedule with
    exact cumulative character budget per stage.

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

CAT_DQ = "2.L data quality / privacy"
CAT_VEC = "2.J llm-pipeline (similarity)"
CAT_TEXT = "2.J llm-pipeline (text)"


@register(
    "dq_kanonymity",
    CAT_DQ,
    """
    WITH qi AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
             COUNT(*)::BIGINT AS grp_n
      FROM customer GROUP BY 1, 2, 3
    ),
    tot AS (SELECT SUM(grp_n) AS n_rows FROM qi)
    SELECT k,
           COUNT(*) FILTER (WHERE grp_n < k)::BIGINT AS violating_groups,
           COALESCE(SUM(grp_n) FILTER (WHERE grp_n < k), 0)::BIGINT
             AS rows_at_risk,
           CAST((2 * COALESCE(SUM(grp_n) FILTER (WHERE grp_n < k), 0) * 10000
                 + (SELECT n_rows FROM tot))
                // (2 * (SELECT n_rows FROM tot)) AS BIGINT) / 10000.0
             AS suppression_rate
    FROM qi, (SELECT unnest([2, 5, 10]) AS k)
    GROUP BY k
    """,
)
def dq_kanonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit: group customers by the quasi-identifier tuple
    (nation, market segment, account-balance band) and report, for each
    policy threshold k ∈ {2, 5, 10}, the groups smaller than k and the
    row count that would need suppression/generalization before release.
    The suppression rate uses the §5.3.1b integer half-up spelling
    (nonnegative numerator) so the share never lands on an engine-divergent
    ROUND half-point.

    Scale shape: one groupBy over the QI tuple (group count ≪ rows), then
    a 3-row threshold grid broadcast against the group-size table — audit
    cost is O(distinct QI tuples), never O(rows²)."""
    c = load_table(spark, sf_dir, "customer")
    qi = c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000.0).cast("bigint").alias("bal_band"),
    ).agg(F.count(F.lit(1)).alias("grp_n"))
    ks = spark.range(1).select(
        F.explode(F.array(F.lit(2), F.lit(5), F.lit(10))).alias("k")
    )
    per_k = qi.crossJoin(F.broadcast(ks)).groupBy("k").agg(
        F.sum(F.when(F.col("grp_n") < F.col("k"), 1).otherwise(0))
        .cast("bigint")
        .alias("violating_groups"),
        F.sum(F.when(F.col("grp_n") < F.col("k"), F.col("grp_n")).otherwise(0))
        .cast("bigint")
        .alias("rows_at_risk"),
        F.sum("grp_n").cast("bigint").alias("_n_rows"),
    )
    return per_k.select(
        "k",
        "violating_groups",
        "rows_at_risk",
        (
            F.expr("(2 * rows_at_risk * 10000 + _n_rows) div (2 * _n_rows)")
            .cast("bigint")
            / 10000.0
        ).alias("suppression_rate"),
    )


@register(
    "dq_ldiversity",
    CAT_DQ,
    """
    WITH grp AS (
      SELECT c_nationkey, c_mktsegment,
             COUNT(DISTINCT CAST(floor(c_acctbal / 2000.0) AS BIGINT))::BIGINT
               AS l_distinct,
             COUNT(*)::BIGINT AS grp_n
      FROM customer GROUP BY 1, 2
    )
    SELECT l_distinct,
           COUNT(*)::BIGINT AS n_groups,
           CAST(SUM(grp_n) AS BIGINT) AS n_rows,
           COUNT(*) FILTER (WHERE l_distinct < 3)::BIGINT AS below_policy
    FROM grp GROUP BY l_distinct
    """,
)
def dq_ldiversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit, the k-anonymity companion: per QI group
    (nation, segment), how many DISTINCT sensitive values (balance band)
    it contains — a group can satisfy k-anonymity yet still leak the
    sensitive attribute if every member shares one value. Output is the
    histogram of group diversity l with the l < 3 policy flag.

    Scale: one groupBy with a COUNT(DISTINCT) per QI group (partial-agg
    friendly: distinct on (QI, sensitive) first at scale), then a
    histogram over group count — O(groups)."""
    c = load_table(spark, sf_dir, "customer")
    grp = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.countDistinct(
            F.floor(F.col("c_acctbal") / 2000.0).cast("bigint")
        ).alias("l_distinct"),
        F.count(F.lit(1)).alias("grp_n"),
    )
    return grp.groupBy("l_distinct").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum("grp_n").cast("bigint").alias("n_rows"),
        F.sum(F.when(F.col("l_distinct") < 3, 1).otherwise(0))
        .cast("bigint")
        .alias("below_policy"),
    )


@register(
    "vec_pq_codebook",
    CAT_VEC,
    # integer-exact PQ: values and centroids quantize to BIGINT 1e-4
    # units BEFORE any distance math, so squared distances are exact
    # integers — assignment argmin is deterministic on both engines and
    # the only doubles are the final ROUND(,4) reports
    f"""
    WITH {VEC_ADMIT_SQL},
    vals AS (
      SELECT vec_id, label, pos - 1 AS p,
             CAST(ROUND(CAST(embedding[pos] AS DOUBLE) * 10000, 0) AS BIGINT)
               AS vq
      FROM embeddings_adm, (SELECT unnest(range(1, 65)) AS pos)
    ),
    cent AS (
      SELECT p, label AS code,
             CAST(ROUND(AVG(vq), 0) AS BIGINT) AS cq
      FROM vals GROUP BY p, label
    ),
    dist AS (
      SELECT a.vec_id, a.p // 8 AS subspace, c.code,
             SUM((a.vq - c.cq) * (a.vq - c.cq)) AS d2
      FROM vals a JOIN cent c ON c.p = a.p
      GROUP BY a.vec_id, a.p // 8, c.code
    ),
    assigned AS (
      SELECT subspace, code, d2,
             ROW_NUMBER() OVER (PARTITION BY vec_id, subspace
                                ORDER BY d2, code) AS rn
      FROM dist
    )
    SELECT subspace, code,
           COUNT(*)::BIGINT AS n_assigned,
           ROUND(AVG(d2 / 100000000.0), 4) AS avg_sq_err
    FROM assigned WHERE rn = 1
    GROUP BY subspace, code
    """,
)
def vec_pq_codebook(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization: split the 64-dim embedding into 8 subspaces
    of 8 dims; the codebook is the per-(subspace, label) centroid (10
    codewords per subspace — the same label-as-coarse-proxy used by
    llm_sim_ivf); each subvector is assigned to its nearest codeword and
    the report shows code occupancy + mean squared reconstruction error
    per (subspace, code). PQ is the memory half of billion-scale ANN:
    256 bytes of float32 become 8 one-byte codes (32×), and asymmetric
    distance at query time is 8 table lookups.

    Exactness: values and centroids are quantized to BIGINT 1e-4 units
    BEFORE distance math, so every squared distance is an exact integer —
    the argmin cannot flip on a last-ulp float divergence between
    engines (the failure mode a float spelling would have).

    Scale shape: the codebook is 80 rows (broadcast); assignment is a
    row-local zip_with fold per (vector, subspace, code) — map-only over
    vectors, one small shuffle for the occupancy report. Training the
    codebook at scale is ml_kmeans_step per subspace; this operator pins
    the assignment + error-accounting plan."""
    em = load_embeddings_admitted(spark, sf_dir)
    vq = em.select(
        "vec_id",
        "label",
        F.expr(
            "transform(embedding, x ->"
            " cast(round(cast(x AS double) * 10000, 0) AS bigint))"
        ).alias("vq"),
    )
    # codebook: per-(pos, label) mean of quantized values, re-quantized
    cent = (
        vq.select("label", F.posexplode("vq").alias("p", "v"))
        .groupBy("label", "p")
        .agg(F.round(F.avg("v"), 0).cast("bigint").alias("cq"))
        .groupBy(F.col("label").alias("code"), (F.col("p") / 8).cast("int").alias("subspace"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("p", "cq"))), lambda s: s.cq
            ).alias("cvec")
        )
    )
    subs = vq.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("subspace"),
                        F.slice("vq", s * 8 + 1, 8).alias("svec"),
                    )
                    for s in range(8)
                ]
            )
        ).alias("e"),
    ).select("vec_id", "e.subspace", "e.svec")
    d2 = F.expr(
        "aggregate(zip_with(svec, cvec, (a, b) -> (a - b) * (a - b)),"
        " 0L, (acc, x) -> acc + x)"
    )
    scored = subs.join(F.broadcast(cent), "subspace").select(
        "vec_id", "subspace", "code", d2.alias("d2")
    )
    w = Window.partitionBy("vec_id", "subspace").orderBy("d2", "code")
    assigned = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    return assigned.groupBy("subspace", "code").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_assigned"),
        F.round(F.avg(F.col("d2") / 100000000.0), 4).alias("avg_sq_err"),
    )


@register(
    "llm_source_winrate",
    CAT_TEXT,
    # one-vs-rest Mann-Whitney from global midranks; 2×midrank stays an
    # exact integer (RANK*2 + ties - 1), so rank sums are BIGINT-exact
    """
    WITH ranked AS (
      SELECT source,
             2 * RANK() OVER (ORDER BY n_chars)
               + COUNT(*) OVER (PARTITION BY n_chars) - 1 AS mr2
      FROM documents WHERE n_chars IS NOT NULL
    ),
    per_src AS (
      SELECT source, COUNT(*)::BIGINT AS n_docs,
             CAST(SUM(mr2) AS BIGINT) AS rank_sum2
      FROM ranked GROUP BY source
    ),
    tot AS (SELECT COUNT(*) AS n FROM documents
            WHERE n_chars IS NOT NULL)
    SELECT source, n_docs, rank_sum2,
           ROUND((rank_sum2 - CAST(n_docs AS DOUBLE) * (n_docs + 1))
                 / (2.0 * n_docs * ((SELECT n FROM tot) - n_docs)), 4)
             AS win_rate
    FROM per_src
    """,
)
def llm_source_winrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-vs-rest win rate per source: P(a random doc from the source
    outranks a random doc from everything else) on the length-quality
    axis — the pairwise-comparison matrix a curation review wants,
    WITHOUT materializing any doc pairs: one global midrank pass gives
    every source's Mann-Whitney U simultaneously (U = R − n(n+1)/2),
    ties counted half via midranks. 2×midrank = 2·RANK + ties − 1 is an
    exact integer, so rank sums never lose precision.

    Scale shape: one sort-shuffle for the global rank window, then an
    O(sources) aggregate — versus O(n²) doc pairs for the naive win-rate.
    The same pass extends to any scalar quality score."""
    # complete-case: a NULL length has no rank (Mann-Whitney is over
    # observed values; engines also place NULL ranks differently)
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull()
    )
    mr2 = (
        2 * F.rank().over(Window.orderBy("n_chars"))
        + F.count(F.lit(1)).over(Window.partitionBy("n_chars"))
        - 1
    )
    ranked = d.select("source", mr2.alias("mr2"))
    per_src = ranked.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("mr2").cast("bigint").alias("rank_sum2"),
    )
    n_total = d.count()
    return per_src.select(
        "source",
        "n_docs",
        "rank_sum2",
        F.round(
            (F.col("rank_sum2") - F.col("n_docs").cast("double") * (F.col("n_docs") + 1))
            / (2.0 * F.col("n_docs") * (F.lit(n_total) - F.col("n_docs"))),
            4,
        ).alias("win_rate"),
    )


@register(
    "llm_curriculum_order",
    CAT_TEXT,
    """
    WITH staged AS (
      SELECT n_chars,
             NTILE(10) OVER (ORDER BY n_chars, doc_id) AS stage
      FROM documents WHERE n_chars IS NOT NULL
    ),
    per_stage AS (
      SELECT stage, COUNT(*)::BIGINT AS n_docs,
             MIN(n_chars)::BIGINT AS min_chars,
             MAX(n_chars)::BIGINT AS max_chars,
             CAST(SUM(n_chars) AS BIGINT) AS stage_chars
      FROM staged GROUP BY stage
    )
    SELECT stage, n_docs, min_chars, max_chars, stage_chars,
           CAST(SUM(stage_chars) OVER (ORDER BY stage
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_chars
    FROM per_stage
    """,
)
def llm_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum schedule: documents staged easiest-first (length as the
    difficulty proxy, doc_id tiebreak for a total order) into 10 NTILE
    stages; the report gives each stage's difficulty band and the EXACT
    cumulative character budget — what the trainer has consumed by the
    end of stage k (integer accumulation, §5.3.1b: never a running sum
    of rounded floats).

    Scale shape: one sort-shuffle for the NTILE, a 10-group aggregate,
    and a 10-row cumulative window — schedule cost is independent of
    corpus size beyond the sort. Swapping difficulty = NLL or a quality
    ensemble reuses the identical plan."""
    # complete-case: unknown difficulty cannot be scheduled, and NTILE
    # places NULLs engine-specifically (doc-corruption replay)
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull()
    )
    staged = d.select(
        "n_chars",
        F.ntile(10).over(Window.orderBy("n_chars", "doc_id")).alias("stage"),
    )
    per_stage = staged.groupBy("stage").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.min("n_chars").cast("bigint").alias("min_chars"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
        F.sum("n_chars").cast("bigint").alias("stage_chars"),
    )
    w = Window.orderBy("stage").rowsBetween(Window.unboundedPreceding, 0)
    return per_stage.withColumn(
        "cum_chars", F.sum("stage_chars").over(w).cast("bigint")
    )
