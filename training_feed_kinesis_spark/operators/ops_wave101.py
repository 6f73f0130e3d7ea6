"""Wave 101 — shuffle-planning, two-sample, containment, packing and
governance operators (round 9).

  * ``dq_key_skew_census``: heavy-hitter audit over every join key of
    the star — the "which key will blow up my shuffle" table a 100 TB
    deployment reads before picking salting/AQE strategies.
  * ``vec_mmd_moment``: two-sample distribution test between embedding
    label groups via the moment-matrix MMD (Gretton et al., JMLR 2012)
    — the pairwise kernel sums collapse to first/second moment
    matrices, so the O(n²) test runs as one O(n·d²) pass.
  * ``stat_permutation_shift``: deterministic hash-seeded permutation
    test for an A/B mean shift (Fisher randomization; the md5 grid
    replaces the RNG so both engines draw identical permutations).
  * ``llm_containment_pairs``: asymmetric shingle containment
    |A∩B|/|A| — finds quote/subset duplication that symmetric Jaccard
    under-scores (Broder 1997's containment coefficient).
  * ``llm_context_length_waste``: padding/truncation capacity curve
    over candidate context lengths — the packing-efficiency planning
    table behind llm_pack_bestfit.
  * ``multimodal_aspect_bucket``: SDXL-style aspect-ratio bucketing
    plan for image batches (integer cross-multiplied ratio matching).
  * ``dp_epsilon_composition_plan``: DP-SGD privacy budget table via
    zCDP composition (Bun & Steinke 2016; Abadi et al. 2016).
  * ``sql_order_by_all``: GROUP BY ALL + ORDER BY ALL engine surface.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load_table, substrate
from .scale_ops import _DF_CAP, stopshingle_kept

CAT_DQ = "2.L data quality"
CAT_STAT = "2.L statistics"
CAT_VEC = "2.J llm-pipeline (similarity)"
CAT_TEXT = "2.J llm-pipeline (text)"
CAT_MM = "2.J llm-pipeline (multimodal)"
CAT_SQL = "2.G sql surface"


# --- dq_key_skew_census ------------------------------------------------------

_SKEW_EDGES = [
    ("lineitem.l_orderkey", "lineitem", "l_orderkey"),
    ("lineitem.l_partkey", "lineitem", "l_partkey"),
    ("lineitem.l_suppkey", "lineitem", "l_suppkey"),
    ("orders.o_custkey", "orders", "o_custkey"),
    ("events.user_id", "events", "user_id"),
]


def _skew_edge_sql(edge: str, tbl: str, key: str) -> str:
    return f"""
    SELECT '{edge}' AS edge,
           CAST(SUM(c) AS BIGINT) AS n_rows,
           COUNT(*)::BIGINT AS n_keys,
           CAST(MAX(c) AS BIGINT) AS max_mult,
           CAST(MAX(c) * 1000000 // SUM(c) AS BIGINT) AS top1_share_ppm,
           CAST(COALESCE(SUM(CASE WHEN c * (SELECT COUNT(DISTINCT {key})
                                            FROM {tbl}
                                            WHERE {key} IS NOT NULL)
                                       > 10 * (SELECT COUNT(*) FROM {tbl}
                                               WHERE {key} IS NOT NULL)
                                  THEN 1 END), 0) AS BIGINT) AS n_hot_keys
    FROM (SELECT COUNT(*) AS c FROM {tbl} WHERE {key} IS NOT NULL
          GROUP BY {key})
    """


@register(
    "dq_key_skew_census",
    CAT_DQ,
    "\nUNION ALL".join(_skew_edge_sql(*e) for e in _SKEW_EDGES)
    + "\nORDER BY edge",
)
def dq_key_skew_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew census over every FK edge a production plan shuffles
    on: rows, distinct keys, the worst key's multiplicity, its corpus
    share in ppm, and the count of hot keys (> 10× the mean
    multiplicity). This is the table that decides salting factors,
    AQE skew-join thresholds and broadcast candidacy BEFORE a 100 TB
    join runs — the repo's skew guards (join_skew_salted, the LSH df
    cap) all assume someone measured this.

    Arithmetic is all-integer (``mult · n_keys > 10 · n_rows`` is the
    cross-multiplied mean comparison; the ppm share uses integer DIV),
    so the census is bit-identical under any partitioning.

    Scale shape: per edge one partial-agg groupBy on the key (counts
    collapse map-side) into a 1-row rollup — the same pass a shuffle
    would do anyway, minus the payload."""
    rows = []
    for edge, tbl, key in _SKEW_EDGES:
        t = load_table(spark, sf_dir, tbl).filter(F.col(key).isNotNull())
        per_key = t.groupBy(key).agg(F.count(F.lit(1)).alias("c"))
        totals = per_key.agg(
            F.sum("c").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.max("c").cast("bigint").alias("max_mult"),
        )
        # hot-key test against the totals: cross-multiplied mean
        # comparison (c · n_keys > 10 · n_rows) — all lazy, the totals
        # broadcast back onto the small per-key relation
        hot = (
            per_key.crossJoin(F.broadcast(totals))
            .agg(
                F.coalesce(
                    F.sum(
                        F.when(
                            F.col("c") * F.col("n_keys")
                            > F.lit(10) * F.col("n_rows"),
                            1,
                        )
                    ),
                    F.lit(0),
                )
                .cast("bigint")
                .alias("n_hot_keys")
            )
        )
        rows.append(
            totals.crossJoin(F.broadcast(hot)).select(
                F.lit(edge).alias("edge"),
                "n_rows",
                "n_keys",
                "max_mult",
                F.expr("max_mult * 1000000 DIV n_rows")
                .cast("bigint")
                .alias("top1_share_ppm"),
                "n_hot_keys",
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("edge")


# --- vec_mmd_moment ----------------------------------------------------------

# int-quantized vector element: q = round(x * 1e4) as BIGINT
_VQ_SPARK = (
    "transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 10000, 0)"
    " AS BIGINT))"
)
_VQ_SQL = (
    "list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 10000,"
    " 0) AS BIGINT))"
)


@register(
    "vec_mmd_moment",
    CAT_VEC,
    f"""
    WITH q AS (
      SELECT vec_id, CASE WHEN label <= 4 THEN 'a' ELSE 'b' END AS grp,
             {_VQ_SQL} AS vq
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    el AS (
      -- parallel unnests zip in DuckDB: (i, qi) pairs per vector ROW
      -- (never joined back on vec_id — a duplicated vec_id must not
      -- cross-multiply its versions)
      SELECT grp,
             unnest(range(1, len(vq) + 1)) AS i,
             unnest(vq) AS qi
      FROM q
    ),
    n AS (
      -- ROW counts, not distinct vec_ids: each row is one sample in
      -- the moment sums, so the denominators must count the same rows
      SELECT SUM(CASE WHEN grp = 'a' THEN 1 ELSE 0 END) AS na,
             SUM(CASE WHEN grp = 'b' THEN 1 ELSE 0 END) AS nb
      FROM q
    ),
    m1 AS (
      SELECT i,
             SUM(CASE WHEN grp = 'a' THEN qi ELSE 0 END) AS ua,
             SUM(CASE WHEN grp = 'b' THEN qi ELSE 0 END) AS ub
      FROM el GROUP BY i
    ),
    m2 AS (
      -- per-ROW outer product via zipped unnest of the flattened
      -- d² term list (matches the Spark map-side spelling exactly)
      SELECT (idx // d) + 1 AS i, (idx % d) + 1 AS j,
             SUM(CASE WHEN grp = 'a' THEN qij ELSE 0 END) AS sa,
             SUM(CASE WHEN grp = 'b' THEN qij ELSE 0 END) AS sb
      FROM (
        SELECT grp, len(vq) AS d,
               unnest(range(0, len(vq) * len(vq))) AS idx,
               unnest(flatten(list_transform(vq,
                 x -> list_transform(vq, y -> x * y)))) AS qij
        FROM q
      )
      GROUP BY 1, 2
    ),
    lin AS (
      SELECT SUM((ua * (SELECT nb FROM n) - ub * (SELECT na FROM n))::HUGEINT
                 * (ua * (SELECT nb FROM n) - ub * (SELECT na FROM n))::HUGEINT)
               AS s
      FROM m1
    ),
    p2 AS (
      SELECT SUM((sa * (SELECT nb FROM n) - sb * (SELECT na FROM n))::HUGEINT
                 * (sa * (SELECT nb FROM n) - sb * (SELECT na FROM n))::HUGEINT)
               AS s
      FROM m2
    )
    SELECT (SELECT na FROM n)::BIGINT AS n_a,
           (SELECT nb FROM n)::BIGINT AS n_b,
           ROUND(CAST((SELECT s FROM lin) AS DOUBLE)
                 / POW(CAST((SELECT na FROM n) AS DOUBLE)
                       * (SELECT nb FROM n) * 1e4, 2), 6) AS mmd2_lin,
           ROUND(CAST((SELECT s FROM p2) AS DOUBLE)
                 / POW(CAST((SELECT na FROM n) AS DOUBLE)
                       * (SELECT nb FROM n) * 1e8, 2), 6) AS mmd2_poly2
    """,
)
def vec_mmd_moment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample MMD² between embedding label groups (labels 0–4 vs
    5–9) under the linear kernel and the degree-2 polynomial kernel
    (Gretton et al., "A Kernel Two-Sample Test", JMLR 2012). The
    estimator's pairwise sums collapse algebraically to moments:
    MMD²_lin = ‖μ_A − μ_B‖², MMD²_poly2 = ‖E_A[xxᵀ] − E_B[xxᵀ]‖²_F —
    so the O(n²) kernel matrix is never built; one pass computes d
    first moments and d² second moments.

    Exactness: vectors quantize to integer 1e-4 units; the moment sums
    and the cross-multiplied difference (u_a·n_B − u_b·n_A, squared in
    HUGEINT/DECIMAL(38,0)) stay integer to the end, so the statistic is
    bit-identical under any partitioning; the two terminal divisions
    produce the same double on both engines.

    Scale shape: the d² second-moment table (64² = 4096 cells) is the
    ONLY shuffle — each vector emits its outer product map-side and the
    partial aggregate collapses to 4096 rows per partition regardless of
    corpus size. This is the distribution-drift gate between two
    embedding snapshots at 100 TB."""
    e = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    q = e.select(
        "vec_id",
        F.when(F.col("label") <= 4, "a").otherwise("b").alias("grp"),
        F.expr(_VQ_SPARK).alias("vq"),
    )
    n = q.agg(
        F.sum(F.when(F.col("grp") == "a", 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("grp") == "b", 1).otherwise(0)).alias("nb"),
    )
    el = q.select(
        "grp", F.posexplode("vq").alias("i0", "qi")
    ).select("grp", (F.col("i0") + 1).alias("i"), "qi")
    m1 = el.groupBy("i").agg(
        F.sum(F.when(F.col("grp") == "a", F.col("qi")).otherwise(0))
        .alias("ua"),
        F.sum(F.when(F.col("grp") == "b", F.col("qi")).otherwise(0))
        .alias("ub"),
    )
    # the outer product is generated MAP-SIDE per vector (flattened
    # nested transform, d² terms per row) and partial-aggregates to d²
    # cells per partition BEFORE the one shuffle — the join-on-vec_id
    # spelling would shuffle the whole n·d element relation instead
    # (caught in the r9 plan audit; the docstring's claim is now the
    # plan's actual shape)
    d2 = q.select(
        "grp",
        F.size("vq").alias("d"),
        F.posexplode(
            F.expr("flatten(transform(vq, x -> transform(vq, y -> x * y)))")
        ).alias("idx", "qij"),
    )
    m2 = (
        d2.select(
            "grp",
            F.expr("idx DIV d + 1").cast("int").alias("i"),
            F.expr("idx % d + 1").cast("int").alias("j"),
            "qij",
        )
        .groupBy("i", "j")
        .agg(
            F.sum(F.when(F.col("grp") == "a", F.col("qij")).otherwise(0))
            .alias("sa"),
            F.sum(F.when(F.col("grp") == "b", F.col("qij")).otherwise(0))
            .alias("sb"),
        )
    )
    # per-TERM widening to DECIMAL(38,0) BEFORE the products and the
    # subtraction (ADVICE r9, mirroring _assortativity_from_jk): the
    # moment sums are BIGINT, so sa*nb at ~3e5 rows/group overflows the
    # 64-bit product under ANSI while the oracle's HUGEINT SUM sails
    # through — the engines-must-fail-together class. Widened first, the
    # whole difference-and-square stays exact integer decimal.
    dec = "decimal(38,0)"
    _w = lambda c: F.col(c).cast(dec)  # noqa: E731
    lin_diff = _w("ua") * _w("nb") - _w("ub") * _w("na")
    lin = (
        m1.crossJoin(F.broadcast(n))
        .select((lin_diff * lin_diff).alias("d2"))
        .agg(F.sum("d2").alias("s_lin"))
    )
    p2_diff = _w("sa") * _w("nb") - _w("sb") * _w("na")
    p2 = (
        m2.crossJoin(F.broadcast(n))
        .select((p2_diff * p2_diff).alias("d2"))
        .agg(F.sum("d2").alias("s_p2"))
    )
    return (
        n.crossJoin(F.broadcast(lin))
        .crossJoin(F.broadcast(p2))
        .select(
            F.col("na").cast("bigint").alias("n_a"),
            F.col("nb").cast("bigint").alias("n_b"),
            F.round(
                F.col("s_lin").cast("double")
                / F.pow(
                    F.col("na").cast("double") * F.col("nb") * F.lit(1e4), 2
                ),
                6,
            ).alias("mmd2_lin"),
            F.round(
                F.col("s_p2").cast("double")
                / F.pow(
                    F.col("na").cast("double") * F.col("nb") * F.lit(1e8), 2
                ),
                6,
            ).alias("mmd2_poly2"),
        )
    )


# --- stat_permutation_shift --------------------------------------------------

_N_PERMS = 199


@register(
    "stat_permutation_shift",
    CAT_STAT,
    f"""
    WITH per_user AS (
      SELECT user_id,
             SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS cents,
             COUNT(*) AS n_ev
      FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
      GROUP BY user_id
    ),
    obs AS (
      SELECT SUM(CASE WHEN user_id % 2 = 0 THEN cents ELSE 0 END) AS sa,
             SUM(CASE WHEN user_id % 2 = 0 THEN n_ev ELSE 0 END) AS na,
             SUM(CASE WHEN user_id % 2 = 1 THEN cents ELSE 0 END) AS sb,
             SUM(CASE WHEN user_id % 2 = 1 THEN n_ev ELSE 0 END) AS nb
      FROM per_user
    ),
    perms AS (
      SELECT k,
             SUM(CASE WHEN flip THEN cents ELSE 0 END) AS sa,
             SUM(CASE WHEN flip THEN n_ev ELSE 0 END) AS na,
             SUM(CASE WHEN NOT flip THEN cents ELSE 0 END) AS sb,
             SUM(CASE WHEN NOT flip THEN n_ev ELSE 0 END) AS nb
      FROM (SELECT u.user_id, u.cents, u.n_ev, g.k,
                   substr(md5(CONCAT(u.user_id, ':', g.k)), 1, 1)
                     IN ('0','1','2','3','4','5','6','7') AS flip
            FROM per_user u,
                 (SELECT unnest(range(1, {_N_PERMS} + 1)) AS k) g)
      GROUP BY k
    ),
    tstats AS (
      SELECT k, CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb AS t
      FROM perms WHERE na > 0 AND nb > 0
    ),
    tobs AS (
      -- both arms must have exposure or the test is undefined — on an
      -- empty/one-sided corpus this yields ZERO rows on both engines
      -- (r9 empty-table sweep: the unguarded scalar spelling returned
      -- NULLs on Spark and a vacuous p on DuckDB)
      SELECT CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb AS t
      FROM obs WHERE na > 0 AND nb > 0
    )
    SELECT ROUND(tobs.t, 4) AS t_obs_cents,
           -- RETAINED permutations (ADVICE r9): the na>0/nb>0 guard can
           -- drop degenerate one-sided draws on tiny corpora, so the
           -- reported count and the p-value denominator are COUNT(tstats),
           -- not the nominal {_N_PERMS}
           (SELECT COUNT(*) FROM tstats)::BIGINT AS n_perms,
           (SELECT COUNT(*) FROM tstats
            WHERE ABS(t) >= ABS(tobs.t))::BIGINT AS n_ge,
           ROUND((1.0 + (SELECT COUNT(*) FROM tstats
                         WHERE ABS(t) >= ABS(tobs.t)))
                 / (1.0 + (SELECT COUNT(*) FROM tstats)), 4) AS p_value
    FROM tobs
    """,
)
def stat_permutation_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fisher randomization test for the A/B mean-per-event value shift
    (assignment = user parity, the repo's standing synthetic A/B split):
    the user-level exposure is re-randomized {_N_PERMS} times and the
    two-sided p-value is the rank of |T_obs| among |T_k| (Fisher 1935;
    the +1 smoothing is the standard exact-test correction).

    Determinism: the RNG is replaced by an md5 hash of (user_id, k) —
    both engines draw the IDENTICAL {_N_PERMS} pseudo-permutations, and
    every group sum is an exact integer (value quantized to cents), so
    T_k is the same double on both engines.

    Scale shape: the only pass over raw events is the per-user
    aggregate (one shuffle); the permutation grid multiplies the SMALL
    per-user relation ×{_N_PERMS} map-side and collapses immediately to
    {_N_PERMS} rows. At 100 TB the grid never touches the event log —
    this is why randomization inference is feasible at all."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)")).alias("cents"),
        F.count(F.lit(1)).alias("n_ev"),
    )
    obs = per_user.agg(
        F.sum(F.when(F.col("user_id") % 2 == 0, F.col("cents")).otherwise(0))
        .alias("sa"),
        F.sum(F.when(F.col("user_id") % 2 == 0, F.col("n_ev")).otherwise(0))
        .alias("na"),
        F.sum(F.when(F.col("user_id") % 2 == 1, F.col("cents")).otherwise(0))
        .alias("sb"),
        F.sum(F.when(F.col("user_id") % 2 == 1, F.col("n_ev")).otherwise(0))
        .alias("nb"),
    ).filter((F.col("na") > 0) & (F.col("nb") > 0)).select(
        (F.col("sa").cast("double") / F.col("na")
         - F.col("sb").cast("double") / F.col("nb")).alias("t_obs")
    )
    # the na/nb > 0 guard makes an empty/one-sided corpus yield ZERO
    # rows instead of NULL statistics (r9 empty-table sweep)
    grid = spark.range(1, _N_PERMS + 1).select(F.col("id").alias("k"))
    flip = F.substring(
        F.md5(F.concat_ws(":", F.col("user_id"), F.col("k"))), 1, 1
    ).isin(*"01234567")
    perms = (
        per_user.crossJoin(F.broadcast(grid))
        .select("k", "cents", "n_ev", flip.alias("flip"))
        .groupBy("k")
        .agg(
            F.sum(F.when(F.col("flip"), F.col("cents")).otherwise(0))
            .alias("sa"),
            F.sum(F.when(F.col("flip"), F.col("n_ev")).otherwise(0))
            .alias("na"),
            F.sum(F.when(~F.col("flip"), F.col("cents")).otherwise(0))
            .alias("sb"),
            F.sum(F.when(~F.col("flip"), F.col("n_ev")).otherwise(0))
            .alias("nb"),
        )
        .filter((F.col("na") > 0) & (F.col("nb") > 0))
        .select(
            (F.col("sa").cast("double") / F.col("na")
             - F.col("sb").cast("double") / F.col("nb")).alias("t")
        )
    )
    # n_kept = RETAINED permutations (ADVICE r9): the na/nb > 0 guard can
    # drop degenerate one-sided draws on tiny corpora, so the reported
    # count and the p-value denominator are the retained count, not the
    # nominal _N_PERMS
    counted = (
        perms.crossJoin(F.broadcast(obs))
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.abs(F.col("t")) >= F.abs(F.col("t_obs")), 1
                    ).otherwise(0)
                ),
                F.lit(0),
            ).alias("n_ge"),
            F.count(F.lit(1)).alias("n_kept"),
        )
    )
    return (
        obs.crossJoin(F.broadcast(counted))
        .select(
            F.round(F.col("t_obs"), 4).alias("t_obs_cents"),
            F.col("n_kept").cast("bigint").alias("n_perms"),
            F.col("n_ge").cast("bigint").alias("n_ge"),
            F.round(
                (1.0 + F.col("n_ge")) / (1.0 + F.col("n_kept")), 4
            ).alias("p_value"),
        )
    )


# --- llm_containment_pairs ---------------------------------------------------

_CONTAIN_T = 0.8  # containment threshold: A is (mostly) inside B


@register(
    "llm_containment_pairs",
    CAT_TEXT,
    f"""
    WITH sh AS (
      -- toks materialized ONCE per doc (r12 payload campaign): the
      -- split inlined in the lambda is O(tokens²) per document
      SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id, unnest(list_distinct(list_transform(
                 range(1, len(toks) - 1),
                 i -> toks[i] || ' ' || toks[i+1] || ' ' ||
                      toks[i+2]))) AS sh
        FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks
              FROM documents)
      )
    ),
    df AS (SELECT sh, COUNT(*) AS d FROM sh GROUP BY sh),
    kept AS (
      SELECT s.doc_id, s.sh FROM sh s JOIN df ON df.sh = s.sh
      WHERE df.d <= {_DF_CAP}
    ),
    counts AS (SELECT doc_id, COUNT(*) AS n FROM kept GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS i
      FROM kept a JOIN kept b ON a.sh = b.sh AND a.doc_id <> b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT a_id AS contained_id, b_id AS container_id,
           ca.n AS n_contained,
           ROUND(i * 1.0 / ca.n, 4) AS containment
    FROM inter
    JOIN counts ca ON ca.doc_id = a_id
    JOIN counts cb ON cb.doc_id = b_id
    WHERE i * 1.0 >= {_CONTAIN_T} * ca.n AND ca.n <= cb.n
    """,
)
def llm_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment pairs C(A,B) = |A∩B| / |A| over df-thinned
    shingle sets (Broder 1997, "On the resemblance and containment of
    documents"): detects a document quoted or embedded inside a larger
    one, which symmetric Jaccard under-scores by the size ratio. Pairs
    are ordered contained→container (|A| ≤ |B|) at C ≥ {_CONTAIN_T}.

    Shares the llm_stopshingle_jaccard substrate and its skew bound:
    the blocking join's fan-out is capped by the shingle df cap, so no
    reduce task sees more than df² candidates per shingle — same plan
    shape, different decision metric. The threshold comparison is
    cross-multiplied (i ≥ t·n in integers scaled by the constant) so
    the survivor SET is exact on both engines."""
    # shared kept-substrate helper (ADVICE r9): a hard-coded cap here
    # beside scale_ops._DF_CAP was a first-builder-wins memo collision
    # waiting for either constant to change alone
    kept = stopshingle_kept(spark, sf_dir)
    counts = kept.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = kept.select(F.col("doc_id").alias("a_id"), "sh")
    b = kept.select(F.col("doc_id").alias("b_id"), "sh")
    inter = (
        a.join(b, "sh")
        .filter(F.col("a_id") != F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    ca = counts.select(F.col("doc_id").alias("a_id"), F.col("n").alias("na"))
    cb = counts.select(F.col("doc_id").alias("b_id"), F.col("n").alias("nb"))
    return (
        inter.join(ca, "a_id")
        .join(cb, "b_id")
        .filter(
            (F.col("i") * 1.0 >= F.lit(_CONTAIN_T) * F.col("na"))
            & (F.col("na") <= F.col("nb"))
        )
        .select(
            F.col("a_id").alias("contained_id"),
            F.col("b_id").alias("container_id"),
            F.col("na").alias("n_contained"),
            F.round(F.col("i") * 1.0 / F.col("na"), 4).alias("containment"),
        )
    )


# --- llm_context_length_waste ------------------------------------------------

_CTX_GRID = [512, 1024, 2048, 4096]


@register(
    "llm_context_length_waste",
    CAT_TEXT,
    f"""
    WITH toks AS (
      SELECT doc_id, len(string_split(lower(text), ' ')) AS tok
      FROM documents
    ),
    grid AS (SELECT unnest(ARRAY{_CTX_GRID}) AS ctx_len)
    SELECT g.ctx_len::BIGINT AS ctx_len,
           COUNT(*)::BIGINT AS n_docs,
           CAST(SUM(t.tok) AS BIGINT) AS total_tokens,
           CAST(SUM((t.tok + g.ctx_len - 1) // g.ctx_len) AS BIGINT)
             AS n_slots,
           CAST(SUM((t.tok + g.ctx_len - 1) // g.ctx_len * g.ctx_len
                    - t.tok) AS BIGINT) AS pad_tokens,
           ROUND(100.0 * SUM(t.tok)
                 / SUM((t.tok + g.ctx_len - 1) // g.ctx_len * g.ctx_len),
                 4) AS utilization_pct
    FROM toks t, grid g
    GROUP BY g.ctx_len
    ORDER BY ctx_len
    """,
)
def llm_context_length_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing capacity curve: for each candidate context length, the
    document-sharded slot count (CEIL(tok/L) slots per doc — documents
    never cross slot boundaries, the no-cross-doc-attention packing
    rule) and the padding waste that choice of L implies. Reading this
    curve is how a feed picks its sequence length before llm_pack_bestfit
    spends the shuffle to actually pack.

    All-integer (ceil via (tok + L − 1) DIV L); the one division at the
    end renders a ratio of two exact BIGINTs. One pass over documents ×
    a 4-row broadcast grid; the aggregate collapses map-side to 4 rows."""
    d = load_table(spark, sf_dir, "documents").select(
        F.size(F.expr("split(lower(text), ' ')")).cast("long").alias("tok")
    )
    grid = spark.createDataFrame(
        [(int(c),) for c in _CTX_GRID], "ctx_len: long"
    )
    slots = F.expr("(tok + ctx_len - 1) DIV ctx_len")
    return (
        d.crossJoin(F.broadcast(grid))
        .select("ctx_len", "tok", slots.alias("slots"))
        .groupBy("ctx_len")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("tok").cast("bigint").alias("total_tokens"),
            F.sum("slots").cast("bigint").alias("n_slots"),
            F.sum(F.col("slots") * F.col("ctx_len") - F.col("tok"))
            .cast("bigint")
            .alias("pad_tokens"),
            F.round(
                100.0
                * F.sum("tok")
                / F.sum(F.col("slots") * F.col("ctx_len")),
                4,
            ).alias("utilization_pct"),
        )
        .orderBy("ctx_len")
    )


# --- multimodal_aspect_bucket ------------------------------------------------

# SDXL-style bucket menu (w, h); ratio matching is integer
# cross-multiplied, ties broken by bucket list position
_ASPECT_BUCKETS = [
    (512, 2048), (512, 1024), (768, 1024), (1024, 1024),
    (1024, 768), (1024, 512), (2048, 512),
]


def _aspect_sql() -> str:
    buckets = ", ".join(
        f"({i}, {w}, {h})" for i, (w, h) in enumerate(_ASPECT_BUCKETS)
    )
    return f"""
    WITH imgs AS (
      SELECT doc_id,
             256 + (doc_id * 37) % 1792 AS w,
             256 + (doc_id * 53) % 1792 AS h
      FROM documents WHERE doc_id % 3 = 1
    ),
    buckets(idx, bw, bh) AS (VALUES {buckets}),
    scored AS (
      SELECT i.doc_id, b.idx, b.bw, b.bh,
             ABS(i.w * b.bh - i.h * b.bw) AS err,
             ROW_NUMBER() OVER (PARTITION BY i.doc_id
                                ORDER BY ABS(i.w * b.bh - i.h * b.bw),
                                         b.idx) AS rn
      FROM imgs i CROSS JOIN buckets b
    )
    SELECT bw AS bucket_w, bh AS bucket_h,
           COUNT(*)::BIGINT AS n_images,
           CAST(MIN(err) AS BIGINT) AS best_err,
           CAST(MAX(err) AS BIGINT) AS worst_err
    FROM scored WHERE rn = 1
    GROUP BY bw, bh
    ORDER BY bucket_w, bucket_h
    """


@register("multimodal_aspect_bucket", CAT_MM, _aspect_sql())
def multimodal_aspect_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-ratio bucketing plan for image batches (the SDXL training
    recipe: group images into fixed-resolution buckets so batches are
    shape-homogeneous; NovelAI/SDXL report quality loss from naive
    square crops). Image dimensions derive deterministically from
    doc_id (the multimodal family's synthetic-metadata convention —
    multimodal_manifest's doc_id%3 modality split); each image goes to
    the bucket minimizing the CROSS-MULTIPLIED ratio error
    |w·bh − h·bw| — integer-exact, no float ratios — ties broken by
    menu position.

    Scale shape: the bucket menu is a 7-row broadcast; assignment is
    map-only per image (a row_number over a 7-row partition is a
    map-side top-1), and the census aggregate collapses to ≤ 7 rows.
    Payloads never move — this plans the batch layout, the shuffle to
    actually co-locate a bucket happens once at feed-build."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 3 == 1
    )
    imgs = d.select(
        "doc_id",
        (256 + (F.col("doc_id") * 37) % 1792).alias("w"),
        (256 + (F.col("doc_id") * 53) % 1792).alias("h"),
    )
    buckets = spark.createDataFrame(
        [(i, w, h) for i, (w, h) in enumerate(_ASPECT_BUCKETS)],
        "idx: long, bw: long, bh: long",
    )
    scored = imgs.crossJoin(F.broadcast(buckets)).select(
        "doc_id", "idx", "bw", "bh",
        F.abs(F.col("w") * F.col("bh") - F.col("h") * F.col("bw"))
        .alias("err"),
    )
    w_best = Window.partitionBy("doc_id").orderBy("err", "idx")
    return (
        scored.withColumn("rn", F.row_number().over(w_best))
        .filter(F.col("rn") == 1)
        .groupBy(
            F.col("bw").alias("bucket_w"), F.col("bh").alias("bucket_h")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_images"),
            F.min("err").cast("bigint").alias("best_err"),
            F.max("err").cast("bigint").alias("worst_err"),
        )
        .orderBy("bucket_w", "bucket_h")
    )


# --- dp_epsilon_composition_plan ---------------------------------------------

_DP_SIGMAS = [0.5, 1.0, 2.0]
_DP_EPOCHS = [1, 3]
_DP_BATCH = 4096
_DP_DELTA = 1e-5


@register(
    "dp_epsilon_composition_plan",
    CAT_DQ,
    f"""
    WITH n AS (
      -- nn > 0 guard: an EMPTY corpus has no training plan — without
      -- it q = B/0 is an ANSI DIVIDE_BY_ZERO on Spark and Inf on
      -- DuckDB (caught by the r9 empty-table sweep)
      SELECT COUNT(*) AS nn,
             LEAST({_DP_BATCH}, COUNT(*)) AS b_eff
      FROM documents
      HAVING COUNT(*) > 0
    ),
    grid AS (
      SELECT sigma, epochs FROM
        (SELECT unnest(ARRAY[0.5, 1.0, 2.0]) AS sigma),
        (SELECT unnest(ARRAY[1, 3]) AS epochs)
    ),
    plan AS (
      SELECT g.sigma, g.epochs,
             (n.nn * g.epochs + n.b_eff - 1) // n.b_eff AS n_steps,
             CAST(n.b_eff AS DOUBLE) / n.nn AS q
      FROM grid g, n
    ),
    rho AS (
      SELECT sigma, epochs, n_steps, q,
             n_steps * q * q / (2 * sigma * sigma) AS r
      FROM plan
    )
    SELECT sigma,
           epochs::BIGINT AS epochs,
           n_steps::BIGINT AS n_steps,
           ROUND(q, 6) AS sample_rate,
           ROUND(r, 6) AS rho_zcdp,
           ROUND(r + 2 * SQRT(r * LN(1.0 / {_DP_DELTA})), 4) AS epsilon
    FROM rho
    ORDER BY sigma, epochs
    """,
)
def dp_epsilon_composition_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DP-SGD privacy budget planning table: for a grid of noise
    multipliers σ and epoch counts, the zCDP of the subsampled Gaussian
    mechanism composed over T steps (small-q approximation
    ρ_step ≈ q²/2σ², Bun & Steinke 2016) converted to (ε, δ=1e-5) via
    ε = ρ + 2√(ρ·ln(1/δ)). This is the governance table a training run
    consults before touching user-derived documents — the DP analog of
    llm_token_budget_planner. Corpus size N (and hence sampling rate
    q = B_eff/N, with B_eff = LEAST(B, N) so q ≤ 1 even on a
    smaller-than-batch corpus) comes from the live documents table, so
    the plan tracks the corpus as it grows.

    Determinism: one COUNT feeds closed-form per-row scalar math on a
    6-row grid — no float accumulation anywhere, both engines compute
    the identical doubles.

    Scale shape: one count(*) scan (metadata-answerable for parquet)
    plus a 6-row broadcast grid. Trivially 100 TB-safe."""
    # empty-corpus guard: no rows -> no plan (r9 empty-table sweep:
    # q = B/0 is an ANSI DIVIDE_BY_ZERO crash vs DuckDB's Inf)
    n = (
        load_table(spark, sf_dir, "documents")
        .agg(
            F.count(F.lit(1)).alias("nn"),
            F.least(F.lit(_DP_BATCH), F.count(F.lit(1))).alias("b_eff"),
        )
        .filter(F.col("nn") > 0)
    )
    grid = spark.createDataFrame(
        [(s, e) for s in _DP_SIGMAS for e in _DP_EPOCHS],
        "sigma: double, epochs: long",
    )
    steps = F.expr("(nn * epochs + b_eff - 1) DIV b_eff")
    q = F.col("b_eff").cast("double") / F.col("nn")
    rho = (
        F.col("n_steps")
        * F.pow(F.col("sample_rate_raw"), 2)
        / (2 * F.col("sigma") * F.col("sigma"))
    )
    return (
        grid.crossJoin(F.broadcast(n))
        .select(
            "sigma",
            "epochs",
            steps.cast("bigint").alias("n_steps"),
            q.alias("sample_rate_raw"),
        )
        .select(
            "sigma",
            "epochs",
            "n_steps",
            F.round(F.col("sample_rate_raw"), 6).alias("sample_rate"),
            F.round(rho, 6).alias("rho_zcdp"),
            F.round(
                rho + 2 * F.sqrt(rho * F.lit(math.log(1.0 / _DP_DELTA))),
                4,
            ).alias("epsilon"),
        )
        .orderBy("sigma", "epochs")
    )


# --- sql_order_by_all --------------------------------------------------------

_OBA_SQL = """
    SELECT o_orderpriority AS priority,
           year(o_orderdate) = 1996 AS in_1996,
           COUNT(*) AS n_orders
    FROM orders
    WHERE o_orderdate IS NOT NULL
    GROUP BY ALL
    ORDER BY ALL
"""


@register("sql_order_by_all", CAT_SQL, _OBA_SQL)
def sql_order_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL + ORDER BY ALL — the modern-SQL ergonomic surface
    (both supported by Spark 4 and DuckDB with identical semantics:
    group on every non-aggregate select item, order on every select
    item left-to-right). The oracle text IS the Spark text."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_OBA_SQL)
