"""§2.J LLM-pipeline: similarity search over `embeddings` (array<float>, dim 64).

Three tiers:
  * llm_sim_topk    — brute-force cosine top-k, exact, SQL-oracled. The
                      correctness baseline every ANN variant is judged against.
  * llm_sim_lsh     — BucketedRandomProjectionLSH (pyspark.ml) approx join:
                      the 100 TB path (seeded → deterministic, but the hash
                      family is Spark-internal → rows-only check).
  * llm_embed_stats — per-label centroids (the IVF coarse quantizer build
                      step: centroids are what an IVF index partitions by).

Vector math stays JVM-side via array higher-order functions — both engines
fold 64 doubles left-to-right, so dot/norm are bit-identical and ROUND(..,4)
before ranking removes any residual tie ambiguity (rank on the ROUNDED value
with vec_id tiebreak — never rank on raw floats across engines).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load_table, parallelize
from .exact import Q4_TOKEN, Q4_TOKEN_SQL

CAT = "2.J llm-pipeline (similarity)"

# --- admitted-embeddings gate (doc-reingest discipline for vectors) ---------
# NULL vectors (failed embed jobs) are quarantined, and a re-ingested
# duplicate vec_id elects ONE deterministic version — keeper order is the
# md5 of a canonical integer rendering (1e-4 grain): float→double widening
# is exact, *10000 and half-away-from-zero ROUND are identical on both
# engines, so the keeper never depends on engine float formatting.
# dq_embedding_validate / dq_duplicate_pk_census are the detection side
# of the same gate.
#
# Spelling (round 8, VERDICT r7 item 2): the r7 gate ran the election
# window UNCONDITIONALLY, a full-width exchange of the embeddings table
# (payload included) in front of ~13 operators — several previously
# map-only — and the driver bench showed it (llm_sim_topk +40%,
# llm_embed_stats +47%, vec_pca_power +18%). The fix is census-then-
# trust, decided ONCE PER (session, table): a narrow duplicate census
# (vec_id only shuffles — partial count collapses map-side) answers
# "does any vec_id appear twice?"; on the no-duplicates answer — the
# steady state, and the only state the 100 TB corpus is allowed to stay
# in — the gate is a map-only NOT-NULL filter and vector payloads NEVER
# shuffle. Only when the census finds re-ingest duplicates does the
# election window run, and then its result is lazily localCheckpoint-ed
# so the one payload exchange is paid once per corrupted table per
# session rather than once per consumer per action. The decision and
# the DataFrame are memoized per (applicationId, resolved sf_dir): all
# ~13 consumers share one gate, which is exactly the "materialize the
# admitted table once" shape a 100 TB deployment would use (gate at
# ingest, write the admitted table, let every query scan it).
# --- geometry admission contract (r12 payload-extremes campaign) -----------
#
# Cosine/LSH geometry is UNDEFINED for a corrupt vector: a dim-mismatched
# pair NULL-poisons Spark's zip_with fold while DuckDB's range-indexed
# list_sum silently sums the overlap; a zero vector divides by zero
# (ANSI error vs IEEE NaN); NaN/±Inf components poison folds with
# engine-specific comparison semantics; |x| ≥ 9e14 leaves the exact 1e-4
# BIGINT grid every signature/quantization path runs on. The contract —
# the embedding analogue of tables.sane_ts — is a map-side per-vector
# gate applied to every GEOMETRY consumer's input (pairs, topk, LSH,
# clustering): exactly EMB_DIM components, all non-NULL and finite and
# on-grid, at least one non-zero. Census keys (dq_embedding_validate,
# dq_corruption_composite_census) stay ungated BY DESIGN — they must see
# the dirt the gate removes. On a clean corpus the gate is an identity
# filter; at 100 TB it is a pushed-down scan predicate, never a shuffle.
EMB_DIM = 64  # corpus dim; tests/test_wave104 pins the fixture to it

GEO_GATE_T = (
    "({v} IS NOT NULL AND size({v}) = " + str(EMB_DIM)
    + " AND forall({v}, x -> x IS NOT NULL"
    " AND NOT isnan(CAST(x AS DOUBLE))"
    " AND abs(CAST(x AS DOUBLE)) < 9.0e14)"
    " AND exists({v}, x -> x != 0))"
)
GEO_GATE_SQL_T = (
    "({v} IS NOT NULL AND len({v}) = " + str(EMB_DIM)
    + " AND len(list_filter({v}, x -> x IS NULL"
    " OR isnan(CAST(x AS DOUBLE))"
    " OR abs(CAST(x AS DOUBLE)) >= 9.0e14)) = 0"
    " AND len(list_filter({v}, x -> x != 0)) > 0)"
)
GEO_GATE = GEO_GATE_T.format(v="embedding")
GEO_GATE_SQL = GEO_GATE_SQL_T.format(v="embedding")


def geo_gate(df: DataFrame) -> DataFrame:
    """Filter a frame carrying an ``embedding`` column to
    geometry-admissible vectors (see the contract block above)."""
    return df.filter(F.expr(GEO_GATE))


# the election hash canonicalizes through exact.Q4_TOKEN (r12
# payload-extremes campaign): the bare BIGINT quantization hard-errors
# on NaN/±Inf/over-grid components (ANSI CAST overflow, both engines)
# exactly when a corrupted table needs the election most
_VEC_CANON_SPARK = (
    f"md5(array_join(transform(embedding, x -> {Q4_TOKEN.format(x='x')}), ','))"
)
VEC_ADMIT_SQL = f"""embeddings_adm AS (
      SELECT vec_id, embedding, label FROM (
        SELECT vec_id, embedding, label,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY
                 md5(array_to_string(list_transform(embedding,
                   x -> {Q4_TOKEN_SQL.format(x='x')}), ','))) AS rn
        FROM embeddings
        WHERE embedding IS NOT NULL AND vec_id IS NOT NULL
      ) WHERE rn = 1
    )"""


# (applicationId, resolved sf_dir) -> admitted DataFrame. Bounded: one
# entry per distinct embeddings table touched in a session (bench: 1;
# test suite: a handful of tiny sf0.001 corruption fixtures).
#
# IMMUTABLE-TABLE-DIR ASSUMPTION (r8 ADVICE): the census verdict is
# decided ONCE per (applicationId, sf_dir). If the parquet under the
# SAME dir is rewritten mid-session — re-ingested WITH duplicates after
# a clean census — the memoized map-only gate would silently admit them
# (TOCTOU on the gate). Same contract as tables.substrate's cached
# relations. This matches the deployment shape (a table dir is a
# write-once snapshot; re-ingest lands a NEW dir/snapshot-id), and every
# corruption fixture in tests/ builds a FRESH dir for exactly this
# reason. If mutable dirs ever became real, the memo key would need a
# file-mtime/snapshot-id component.
_ADMIT_MEMO: dict[tuple[str, str], DataFrame] = {}


def load_embeddings_admitted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings through the admission gate: non-NULL vectors, one
    deterministic version per vec_id (see VEC_ADMIT_SQL).

    Census-then-trust: a narrow per-vec_id duplicate census (the 16-byte
    key shuffles, never the vector payload) picks between the map-only
    pass-through (clean corpus — the steady state) and the election
    window (re-ingest duplicates present), memoized per (session, table).
    Semantics are identical to VEC_ADMIT_SQL either way: on a
    duplicate-free table the oracle's ROW_NUMBER ... = 1 is a
    pass-through of the NOT-NULL filter.

    Two deliberate deviations from lazy-builder convention, both priced
    in: the census ``isEmpty()`` runs an EAGER narrow job at first
    plan-construction (key-only, once per session per table — the cost
    of deciding map-only vs election), and the verdict is memoized under
    the immutable-table-dir assumption documented at ``_ADMIT_MEMO``."""
    memo_key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir))
    hit = _ADMIT_MEMO.get(memo_key)
    if hit is not None:
        return hit
    # concurrent driver threads (test-suite plan pool, guide §2.6) must
    # not double-run the eager census / double-checkpoint the election
    from ..tables import MEMO_LOCK

    with MEMO_LOCK:
        hit = _ADMIT_MEMO.get(memo_key)
        if hit is not None:
            return hit
        return _load_embeddings_admitted_locked(spark, sf_dir, memo_key)


def _load_embeddings_admitted_locked(spark, sf_dir, memo_key):
    # NULL vec_id is rejected alongside NULL vectors (r9 NULL-PK
    # campaign): an identity-less vector cannot be versioned by the
    # election window — and a NULL partition key would otherwise lump
    # every such row into ONE window partition and keep exactly one.
    e = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull() & F.col("vec_id").isNotNull()
    )
    has_dupes = not (
        e.groupBy("vec_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .isEmpty()
    )
    if has_dupes:
        w = Window.partitionBy("vec_id").orderBy(F.expr(_VEC_CANON_SPARK))
        adm = (
            e.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            # one payload exchange per corrupted table per session, not
            # per consumer per action (lazy: materializes on first use)
            .localCheckpoint(eager=False)
        )
    else:
        adm = e  # map-only: scan + NOT-NULL filter, no exchange
    _ADMIT_MEMO[memo_key] = adm
    return adm


TOPK = 5
N_PROBES = 50  # probe set: vec_id < 50 query vectors

_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "0D, (acc, v) -> acc + v)"
)
_NORM_SQL = "sqrt(list_sum(list_transform({v}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
_DOT_SQL = (
    "list_sum(list_transform(range(1, 65), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)


@register(
    "llm_sim_topk",
    CAT,
    f"""
    WITH {VEC_ADMIT_SQL},
    pairs AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, b.label,
             ROUND({_DOT_SQL.format(a='a.embedding', b='b.embedding')}
                   / ({_NORM_SQL.format(v='a.embedding')}
                      * {_NORM_SQL.format(v='b.embedding')}), 4) AS cosine
      FROM embeddings_adm a JOIN embeddings_adm b ON a.vec_id != b.vec_id
      WHERE a.vec_id < {N_PROBES}
        AND {GEO_GATE_SQL_T.format(v='a.embedding')}
        AND {GEO_GATE_SQL_T.format(v='b.embedding')}
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, neighbor_id ASC) AS rn
      FROM pairs
    )
    SELECT query_id, neighbor_id, label, cosine, rn AS rank_pos
    FROM ranked WHERE rn <= {TOPK}
    """,
)
def llm_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: probe set × corpus, exact.

    Physical shape: the probe side (50 vectors) BROADCASTS; each executor
    scans its corpus slice once computing 50 dots/row — a map-only stage,
    zero shuffle until the tiny per-probe top-k. This exact pattern is how
    brute-force kNN stays viable surprisingly far: 100 TB corpus × small
    probe batch is a linear scan, embarrassingly parallel. It stops scaling
    when BOTH sides are large — that's llm_sim_lsh's job.

    Both sides pass the geometry gate (r12 payload campaign): cosine
    rank against a zero/non-finite/dim-mismatched neighbor is undefined,
    engine-dependently."""
    em = geo_gate(load_embeddings_admitted(spark, sf_dir))
    probes = em.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    corpus = parallelize(em).select(
        F.col("vec_id").alias("neighbor_id"), "label", F.col("embedding").alias("c_emb")
    )
    dot = F.expr(_DOT.format(a="q_emb", b="c_emb"))
    norm = lambda c: F.sqrt(  # noqa: E731
        F.expr(f"aggregate({c}, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")
    )
    # norms are precomputed per SIDE, not per pair: interpreted HOF work per
    # pair drops from dot+2 norms to dot alone (each corpus norm would
    # otherwise be re-evaluated once per probe)
    probes = probes.withColumn("q_norm", norm("q_emb"))
    corpus = corpus.withColumn("c_norm", norm("c_emb"))
    pairs = (
        F.broadcast(probes)
        .crossJoin(corpus)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            "label",
            F.round(dot / (F.col("q_norm") * F.col("c_norm")), 4).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rank_pos", F.row_number().over(w))
        .filter(F.col("rank_pos") <= TOPK)
    )


COS_DUP_THRESHOLD = 0.5  # fixture embeddings are random: max pairwise cosine ≈ 0.51/0.60 at sf0.01/0.1


@register(
    "llm_dedup_embed",
    "2.J llm-pipeline (dedup)",
    f"""
    SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           ROUND({_DOT_SQL.format(a='a.embedding', b='b.embedding')}
                 / ({_NORM_SQL.format(v='a.embedding')}
                    * {_NORM_SQL.format(v='b.embedding')}), 4) AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE {GEO_GATE_SQL_T.format(v='a.embedding')}
      AND {GEO_GATE_SQL_T.format(v='b.embedding')}
      AND {_DOT_SQL.format(a='a.embedding', b='b.embedding')}
          / ({_NORM_SQL.format(v='a.embedding')}
             * {_NORM_SQL.format(v='b.embedding')}) >= {COS_DUP_THRESHOLD}
    """,
)
def llm_dedup_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (semantic dedup): every pair
    with cosine ≥ threshold. Exact all-pairs here — the oracled correctness
    BASELINE, no longer the default path (round 11): llm_dedup_embed_lsh
    (ops_wave104.py) emits the same pair schema from sign-LSH candidates
    + this exact cosine verify — candidate-bound at scale (measured 6-8×
    cheaper at the 5× probe, candidates 3.6% of n²), the same
    verify-after-candidates shape as MinHash→Jaccard in llm_dedup_near.
    Tests pin the LSH path's pairs ⊆ these pairs with equal cosines.

    Geometry-admissible vectors only (GEO_GATE, r12 payload campaign):
    cosine is undefined for dim-mismatched / non-finite / zero vectors,
    and the two engines disagree about HOW it is undefined (zip_with
    NULL-pads where range-indexed list_sum sums the overlap)."""
    em = geo_gate(load_table(spark, sf_dir, "embeddings"))
    a = em.select(F.col("vec_id").alias("a_id"), F.col("embedding").alias("a_emb"))
    b = parallelize(em).select(
        F.col("vec_id").alias("b_id"), F.col("embedding").alias("b_emb")
    )
    dot = F.expr(_DOT.format(a="a_emb", b="b_emb"))
    norm = lambda c: F.sqrt(  # noqa: E731
        F.expr(f"aggregate({c}, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")
    )
    # per-side norm precompute + single cosine projection (computing the
    # expression in both filter and select doubles the interpreted HOF work)
    a = a.withColumn("a_norm", norm("a_emb"))
    b = b.withColumn("b_norm", norm("b_emb"))
    # zero-norm guard (r12 payload campaign): an all-zero vector makes
    # the divisor 0, which ANSI-errors on the Spark side where DuckDB's
    # IEEE division yields NaN — both spellings exclude the pair (NULL
    # and NaN each fail the >= threshold), so the emitted set agrees
    denom = F.col("a_norm") * F.col("b_norm")
    cos = F.when(denom != 0, dot / denom)
    return (
        F.broadcast(a)
        .join(b, F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", cos.alias("_cos"))
        .filter(F.col("_cos") >= COS_DUP_THRESHOLD)
        .select("a_id", "b_id", F.round("_cos", 4).alias("cosine"))
    )


@register("llm_sim_lsh", CAT)  # rows-only: LSH family is Spark-internal
def llm_sim_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via random-hyperplane bucketing (BucketedRandomProjectionLSH),
    seeded for determinism: approxSimilarityJoin prunes the pair space to
    same-bucket candidates before exact distance — the scale path when both
    sides are large. Output: candidate pairs within euclidean distance 1.0.
    No SQL oracle (hash family internal); the exact baseline llm_sim_topk is
    the oracled ground truth this approximation is validated against in
    tests (recall check)."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    # geometry gate (r12 payload campaign): array_to_vector NPEs on a
    # NULL embedding and MLlib fit rejects mixed dims. localCheckpoint
    # is an OPTIMIZER BARRIER, not a perf knob: approxSimilarityJoin's
    # internal self-join re-plans the input and evaluates the
    # array_to_vector UDF on pre-filter rows (NPE on the NULL-embedding
    # sliver) — the checkpoint pins the gate+projection order.
    em = (
        geo_gate(load_table(spark, sf_dir, "embeddings"))
        .select(
            "vec_id",
            array_to_vector(F.col("embedding").cast("array<double>")).alias("vec"),
        )
        .localCheckpoint(eager=False)
    )
    if em.isEmpty():
        # MLlib LSH.fit throws on a zero-row dataset (r9 empty-table
        # sweep); an empty corpus has no candidate pairs
        return spark.createDataFrame(
            [], "a_id long, b_id long, euclidean_dist double"
        )
    lsh = BucketedRandomProjectionLSH(
        inputCol="vec", outputCol="hashes", bucketLength=2.0, numHashTables=3, seed=42
    )
    model = lsh.fit(em)
    joined = model.approxSimilarityJoin(em, em, 1.0, distCol="dist")
    return (
        joined.filter(F.col("datasetA.vec_id") < F.col("datasetB.vec_id"))
        .select(
            F.col("datasetA.vec_id").alias("a_id"),
            F.col("datasetB.vec_id").alias("b_id"),
            F.round("dist", 4).alias("euclidean_dist"),
        )
    )


@register(
    "llm_embed_stats",
    CAT,
    f"""
    WITH {VEC_ADMIT_SQL}
    SELECT label, pos,
           ROUND(AVG(CAST(embedding[pos] AS DOUBLE)), 4) AS centroid_val,
           COUNT(*) AS n_vectors
    FROM embeddings_adm, (SELECT unnest(range(1, 65)) AS pos)
    GROUP BY label, pos
    """,
)
def llm_embed_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid, element-wise mean over FLOAT[64] via posexplode →
    groupBy(label, pos) → avg. Scale shape: the explode is map-side and the
    shuffle carries (label, pos, partial-sum) — 640 states total regardless
    of corpus size (partial agg collapses everything map-side). Reassembling
    arrays (collect_list over pos) is a final 640-row operation. These
    centroids are the IVF coarse quantizer for llm_sim_topk at scale."""
    em = load_embeddings_admitted(spark, sf_dir)
    exploded = em.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>")).alias("pos0", "val")
    )
    return (
        exploded.groupBy("label", (F.col("pos0") + 1).alias("pos"))
        .agg(
            F.round(F.avg("val"), 4).alias("centroid_val"),
            F.count(F.lit(1)).alias("n_vectors"),
        )
    )


@register("llm_sim_ivf", CAT)  # rows-only: reduction-order float sums ≠ across engines
def llm_sim_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: coarse-quantize the corpus into cells (label centroids
    = the coarse codebook), route each probe to its nprobe=2 nearest cells,
    then exact-search only those cells.

    Scale shape — the reason IVF wins at 100 TB: the corpus is written
    partitioned by cell (partitionBy(cell) parquet), so a probe batch scans
    nprobe/ncells of the data with partition pruning instead of everything.
    Here cells = labels (10 cells); production would k-means the centroids
    (the fixture labels are random w.r.t. the vectors, so cross-cell recall
    is a quantizer property, not tested — tests assert exactness WITHIN the
    routed cells against numpy ground truth instead). No SQL oracle:
    cross-engine float reduction order differs on the group-sum path.

    Geometry-gated input (r12 payload campaign): centroids and cosines
    are undefined over zero/non-finite/dim-mismatched vectors."""
    em = geo_gate(load_table(spark, sf_dir, "embeddings"))
    exploded = em.select(
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "val"),
    )
    centroids = (
        exploded.groupBy("label", "pos")
        .agg(F.avg("val").alias("cv"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cv"))), lambda s: s.cv
            ).alias("centroid")
        )
    )
    probes = em.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    # route: cosine(probe, centroid) → top-2 cells per probe
    pc_dot = F.expr(_DOT.format(a="q_emb", b="centroid"))
    pc_norm_q = F.sqrt(
        F.expr("aggregate(q_emb, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")
    )
    pc_norm_c = F.sqrt(
        F.expr("aggregate(centroid, 0D, (acc, x) -> acc + x * x)")
    )
    routed = (
        probes.crossJoin(F.broadcast(centroids))
        .select(
            "query_id", "q_emb", "label", (pc_dot / (pc_norm_q * pc_norm_c)).alias("cell_sim")
        )
        .withColumn(
            "cell_rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("cell_sim").desc(), F.col("label").asc()
                )
            ),
        )
        .filter(F.col("cell_rank") <= 2)
        .select("query_id", "q_emb", "label")
    )
    # exact search inside the routed cells only
    corpus = parallelize(em).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("c_label"),
        F.col("embedding").alias("c_emb"),
    )
    dot = F.expr(_DOT.format(a="q_emb", b="c_emb"))
    norm_c = F.sqrt(
        F.expr("aggregate(c_emb, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")
    )
    pairs = (
        routed.join(corpus, routed.label == corpus.c_label)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.col("c_label").alias("label"),
            F.round(dot / (pc_norm_q * norm_c), 4).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return pairs.withColumn("rank_pos", F.row_number().over(w)).filter(
        F.col("rank_pos") <= TOPK
    )


COS_EDGE_THRESHOLD = 0.4  # clustering threshold: 59 edges over 500 vecs at sf0.01

# edge legs through the geometry gate (r12 payload campaign): a corrupt
# vector can never MERGE (its cosine is engine-dependently undefined) but
# it stays IN the label manifest as its own singleton component — the
# seeds below are deliberately ungated
_EDGES_SQL = f"""
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE {GEO_GATE_SQL_T.format(v='a.embedding')}
    AND {GEO_GATE_SQL_T.format(v='b.embedding')}
    AND {_DOT_SQL.format(a='a.embedding', b='b.embedding')}
        / ({_NORM_SQL.format(v='a.embedding')}
           * {_NORM_SQL.format(v='b.embedding')}) >= {COS_EDGE_THRESHOLD}
"""


def cc_min_label(labels: DataFrame, edges: DataFrame) -> DataFrame:
    """Connected components by Pregel-style min-label propagation with
    pointer doubling — the shared iteration behind every duplicate-cluster
    operator (``llm_dedup_clusters`` over exact cosine edges,
    ``llm_dedup_clusters_lsh`` over banded MinHash-LSH candidate edges).

    ``labels``: seed frame (node, label), conventionally label = node.
    ``edges``: undirected edge frame (a, b). Returns the converged
    (node, label) frame — every node labeled with its component's minimum.

    Runs TO CONVERGENCE (a fixed iteration cap silently under-merges
    long-chain components — observed at sf0.1). Each round combines
    neighbor min-label propagation with pointer doubling (adopt your
    label's own label), so rounds needed is O(log diameter), not
    O(diameter); the cap below is a runaway backstop, not a tuning knob.
    localCheckpoint truncates the growing lineage each round (cluster
    deployments use checkpoint(dir) for fault tolerance); convergence is
    a count() of changed labels, never a data collect.

    Only EDGE-TOUCHING nodes enter the iteration (r12, keeper_lsh
    profile): a node in no edge can never receive a message, so its
    label is final at seed time — it is split off by an anti-join and
    unioned back after convergence. On a dedup corpus the touched set is
    duplicate-candidate sized (≪ corpus), so the per-round shuffles and
    checkpoints carry only candidate nodes; the corpus-sized seed frame
    is scanned exactly twice (semi + anti), never per round. Requires
    the label-is-a-node-id seed convention (label = node), which the
    pointer-doubling join already assumes.

    Seed frames MAY carry duplicate node rows (a redelivered ingest row
    keeps its id — the r10 joint-corruption contract), and before the
    isolated-split every seed passed through round 1's groupBy(node),
    which deduplicated as a side effect. That dedup is load-bearing
    output semantics (one label row per node), so the isolated branch
    aggregates min(label) per node instead of unioning raw rows — for
    identical (node, node) seed rows the map-side combiner collapses
    duplicates pre-shuffle, so the cost is a corpus-sized combine, the
    same price the pre-split spelling paid in its first round."""
    # edges are consumed every round × O(log d) rounds: pin them once so
    # a lazily-derived edge set (e.g. the LSH candidate verify join) isn't
    # recomputed every iteration. The pinned relation is stored ORIENTED
    # (both directions exploded, r12): one src-keyed join then replaces
    # the former two per-round joins + union — same message multiset,
    # half the per-round join stages, and at scale the one exchange
    # carries the same total bytes the two did.
    oriented = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col("a").alias("src"), F.col("b").alias("dst")),
                    F.struct(F.col("b").alias("src"), F.col("a").alias("dst")),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .localCheckpoint()
    )
    touched = oriented.select(F.col("src").alias("node")).distinct()
    isolated = (
        labels.join(touched, "node", "left_anti")
        .groupBy("node")
        .agg(F.min("label").alias("label"))
    )
    labels = labels.join(touched, "node", "left_semi").localCheckpoint()
    for _ in range(64):
        msgs = oriented.join(labels, oriented.src == labels.node).select(
            F.col("dst").alias("node"), "label"
        )
        propagated = (
            labels.unionByName(msgs)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        parent = propagated.select(
            F.col("node").alias("pn"), F.col("label").alias("pl")
        )
        # lazy checkpoint (r12): the `changed` count below is the ONE
        # action per round — it materializes the checkpoint blocks as a
        # side effect, where the former eager checkpoint ran a separate
        # job per round before the count
        new_labels = (
            propagated.join(parent, propagated.label == F.col("pn"))
            .select("node", F.col("pl").alias("label"))
            .localCheckpoint(eager=False)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") < F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:  # pragma: no cover - backstop only
        raise RuntimeError("connected components did not converge in 64 rounds")
    return labels.unionByName(isolated)


@register(
    "llm_dedup_clusters",
    "2.J llm-pipeline (dedup)",
    f"""
    WITH RECURSIVE edges AS ({_EDGES_SQL}),
    reach(node, label) AS (
      -- an identity-less vector cannot be cluster-labeled (NULL-PK r9)
      SELECT vec_id, vec_id FROM embeddings WHERE vec_id IS NOT NULL
      UNION
      SELECT CASE WHEN r.node = e.a THEN e.b ELSE e.a END, r.label
      FROM reach r JOIN edges e ON r.node = e.a OR r.node = e.b
    )
    SELECT node AS vec_id, MIN(label) AS component FROM reach GROUP BY node
    """,
)
def llm_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster formation: connected components over the
    similarity graph (cosine ≥ threshold), via Pregel-style min-label
    propagation — each iteration sends every node's current label across
    its edges and keeps the minimum; fixpoint = every node labeled with its
    component's smallest vec_id. The step after ANY pairwise dedup signal
    (MinHash, SimHash, embedding cosine): pairs must become clusters before
    a keeper can be chosen.

    Iterative-algorithm mechanics on Spark: a driver-side loop of
    join+groupBy rounds (``cc_min_label``), converging in O(log diameter)
    iterations. Oracle: DuckDB RECURSIVE CTE computing the same
    reachability minimum — an oracled iterative operator, not rows-only.

    Scale caveat (VERDICT r9): the EDGE SET here is exact all-pairs
    cosine — the oracled correctness baseline, quadratic in the corpus.
    The default 100 TB cluster path is ``llm_dedup_clusters_lsh``
    (ops_wave102), which feeds banded MinHash-LSH candidate edges into
    this same ``cc_min_label`` iteration."""
    labels = _labels_exact(spark, sf_dir)
    return labels.select(F.col("node").alias("vec_id"), F.col("label").alias("component"))


def _labels_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(node, label) converged CC frame over the exact all-pairs cosine
    edge set — a SESSION SUBSTRATE (r12, mirroring ops_wave102's
    ``_labels_lsh``): the converged manifest is built once per (session,
    table dir) and shared by ``llm_dedup_clusters`` and
    ``llm_dedup_apply``, which previously each re-ran the full O(n²)
    edge scan + O(log d) CC iteration. One cluster manifest per ingest
    snapshot is the production shape; tier-2 bench records the cold
    build separately."""
    from ..tables import substrate

    def build() -> DataFrame:
        # identity-less vectors (NULL vec_id) are excluded: they cannot be
        # labeled, and the a<b edge join drops them anyway (NULL-PK r9)
        em = load_table(spark, sf_dir, "embeddings").filter(
            F.col("vec_id").isNotNull()
        )
        # edge legs gate to geometry-admissible vectors (r12 payload
        # campaign; see _EDGES_SQL) — the seed frame stays ungated so a
        # corrupt vector keeps its singleton label instead of vanishing
        gated = geo_gate(em)
        # norms depend only on the vector, so they are computed ONCE per
        # side before the O(n²) join — the per-pair filter is then a
        # single dot aggregate plus a divide instead of dot + two 64-step
        # norm aggregates (3× the flops on every one of the n²/2 pairs).
        # The expression value is bit-identical to a per-pair norm (same
        # double arithmetic on the same vector), so oracle parity is
        # untouched.
        norm = lambda c: F.sqrt(  # noqa: E731
            F.expr(f"aggregate({c}, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")
        )
        a = gated.select(
            F.col("vec_id").alias("a"),
            F.col("embedding").alias("a_emb"),
            norm("embedding").alias("a_norm"),
        )
        b = parallelize(gated).select(
            F.col("vec_id").alias("b"),
            F.col("embedding").alias("b_emb"),
            norm("embedding").alias("b_norm"),
        )
        dot = F.expr(_DOT.format(a="a_emb", b="b_emb"))
        edges = (
            F.broadcast(a)
            .join(b, F.col("a") < F.col("b"))
            .filter(dot / (F.col("a_norm") * F.col("b_norm")) >= COS_EDGE_THRESHOLD)
            .select("a", "b")
        )
        labels = em.select(
            F.col("vec_id").alias("node"), F.col("vec_id").alias("label")
        )
        return cc_min_label(labels, edges)

    return substrate(spark, sf_dir, "exact_cc_labels", build)


@register(
    "llm_dedup_apply",
    "2.J llm-pipeline (dedup)",
    f"""
    WITH RECURSIVE edges AS ({_EDGES_SQL}),
    reach(node, label) AS (
      -- an identity-less vector cannot be cluster-labeled (NULL-PK r9)
      SELECT vec_id, vec_id FROM embeddings WHERE vec_id IS NOT NULL
      UNION
      SELECT CASE WHEN r.node = e.a THEN e.b ELSE e.a END, r.label
      FROM reach r JOIN edges e ON r.node = e.a OR r.node = e.b
    ),
    comp AS (SELECT node, MIN(label) AS component FROM reach GROUP BY node),
    sizes AS (SELECT component, COUNT(*) AS csize FROM comp GROUP BY component)
    SELECT csize, COUNT(*) AS n_clusters,
           SUM(csize - 1)::BIGINT AS n_dropped
    FROM sizes GROUP BY csize
    """,
)
def llm_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY step after cluster formation: elect the minimum-id member
    of each component as the keeper and measure the dedup yield — cluster
    size distribution plus rows dropped per size class (csize-1 per
    cluster). Composes directly on ``llm_dedup_clusters``' label frame; at
    scale this is two small aggregations over (node, component) — the
    payloads themselves are then filtered by a semi join against keepers,
    which never shuffles the corpus.
    """
    labels = llm_dedup_clusters(spark, sf_dir)
    sizes = labels.groupBy("component").agg(F.count(F.lit(1)).alias("csize"))
    return sizes.groupBy("csize").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum(F.col("csize") - 1).cast("bigint").alias("n_dropped"),
    )


@register("llm_ann_recall", CAT)  # rows-only: measures an approx operator
def llm_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN QUALITY measurement: recall@k of a cosine-LSH candidate set
    against the exact cosine top-k ground truth — the number every
    approximate index must report before it replaces the exact path
    (speed without recall is silent corpus damage).

    The standard reduction makes LSH and ground truth commensurable:
    L2-NORMALIZE first, so euclidean distance is monotone in cosine
    (d² = 2 − 2·cos) and a distance threshold of 1.35 covers the whole
    top-k cosine band of this corpus. recall@k = |exact top-k pairs found
    among candidates| / k, per query, averaged. Both sides run the
    registered machinery (llm_sim_topk exact; BucketedRandomProjectionLSH
    seeded like llm_sim_lsh), so the measurement reflects what ships. At
    100 TB the exact side runs on a sampled probe set — exactly how
    llm_sim_topk already bounds its probe side.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    exact = llm_sim_topk(spark, sf_dir).select("query_id", "neighbor_id")

    unit = F.expr(
        "transform(embedding, x -> CAST(x AS DOUBLE) / "
        "sqrt(aggregate(embedding, 0D, "
        "(acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))"
    )
    # geometry gate (r12 payload campaign): MLlib's LSH fit hard-crashes
    # on NULL components / mixed dims, and unit-normalizing a zero or
    # non-finite vector is undefined anyway — measure recall over the
    # admissible corpus, the same population the exact side ranks.
    # localCheckpoint = optimizer barrier (see llm_sim_lsh): the approx
    # join re-plans the input and runs the vector UDF on pre-filter rows.
    em = (
        geo_gate(load_table(spark, sf_dir, "embeddings"))
        .select("vec_id", array_to_vector(unit).alias("vec"))
        .localCheckpoint(eager=False)
    )
    if em.isEmpty():
        # MLlib LSH.fit throws on a zero-row dataset (r9 empty-table
        # sweep); no queries -> no recall rows
        return spark.createDataFrame(
            [], "n_queries long, avg_recall double"
        )
    lsh = BucketedRandomProjectionLSH(
        inputCol="vec", outputCol="hashes", bucketLength=1.0,
        numHashTables=6, seed=42,
    )
    model = lsh.fit(em)
    cand = (
        model.approxSimilarityJoin(em, em, 1.35, distCol="dist")
        .select(
            F.col("datasetA.vec_id").alias("query_id"),
            F.col("datasetB.vec_id").alias("neighbor_id"),
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    hit = exact.join(cand, ["query_id", "neighbor_id"], "left_semi")
    per_query = (
        exact.groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .join(
            hit.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_hit")),
            "query_id",
            "left",
        )
        .select(
            "query_id",
            (F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_exact")).alias(
                "recall"
            ),
        )
    )
    return per_query.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.round(F.avg("recall"), 4).alias("avg_recall"),
    )
