"""Wave 104 — scale-safe embedding-cosine near-dup pairs (round 11).

VERDICT r10's one standing scale item: ``llm_dedup_embed``
(llm_similarity.py) emits cosine near-dup pairs via exact all-pairs —
the oracled correctness baseline, but O(corpus²) with no same-semantics
LSH-fed sibling. This wave applies the wave-102 recipe to the embedding
side:

  * ``llm_dedup_embed_lsh``: sign-random-projection (SimHash-family)
    candidates — 64 deterministic ±1 hyperplanes banded 8×8 — feeding
    the EXISTING exact-cosine verify (llm_dedup_embed's _DOT spelling
    verbatim) and emitting the SAME (a_id, b_id, cosine) pair schema.
    Candidate generation is map-side per vector (one 8-row signature
    frame shuffles, never the vector payloads beyond the verify join);
    the bucket join is an equi-join on (band, sig) sized by collisions,
    never n².

Cross-engine exactness: hyperplane dots are computed over the canonical
1e-4 integer quantization of each vector (the _VEC_CANON grain), with
±1 integer weights — an exact BIGINT sum, order-free, so the sign bits
(and therefore the candidate set) are bit-identical on both engines
with no float knife edge at the hyperplane boundary. The hyperplane
matrix itself is derived from md5("j:i") nibbles at import time — no
RNG, reproducible anywhere.

Oracle: the same sign-bucket pipeline as DuckDB CTEs (planes inlined as
a VALUES list), then the exact-cosine verify restricted to the
candidate set — the candidate-restricted pair semantics VERDICT r10
prescribed, fully hash-checked.

Geometry note (why 8 bands × 8 bits): at the semantic-dedup regime this
operator targets (cosine ≥ 0.9, collision prob p = 1 − θ/π ≈ 0.86 per
plane) a vector pair collides in ≥1 band with P ≈ 0.93, while a random
pair (p ≈ 0.5) collides with P ≈ 3% — the pruning that makes the path
candidate-bound. The fixture's threshold sits at 0.5 (random vectors,
max pairwise cosine ≈ 0.5–0.6), the weakest possible angle for ANY
sign-LSH family, so boundary-cosine recall is modest BY GEOMETRY there;
the planted-duplicate test pins recall = 1 on actual near-duplicates,
which identical sign signatures guarantee.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table, parallelize
from .llm_similarity import (
    _DOT,
    _DOT_SQL,
    _NORM_SQL,
    COS_DUP_THRESHOLD,
    GEO_GATE,
    GEO_GATE_SQL,
    GEO_GATE_SQL_T,
    geo_gate,
)

CAT = "2.J llm-pipeline (dedup)"

_DIM = 64
_N_PLANES = 64
_BAND_BITS = 8  # 8 bands x 8 bits

# Deterministic ±1 hyperplane matrix: sign(j, i) from the top bit of the
# first md5("j:i") nibble. No RNG — identical in any process, and inlined
# verbatim into the DuckDB oracle below.
_W = [
    [
        1 if int(hashlib.md5(f"{j}:{i}".encode()).hexdigest()[0], 16) < 8 else -1
        for i in range(1, _DIM + 1)
    ]
    for j in range(_N_PLANES)
]

# python's list repr is a valid DuckDB list literal
_PLANES_VALUES_SQL = ",\n      ".join(f"({j}, {_W[j]})" for j in range(_N_PLANES))

# The sign-bucket candidate pipeline as reusable CTE text (the embedding
# analogue of llm_dedup.NEAR_PAIRS_CTES): canonical 1e-4 integer
# quantization → exact ±1 integer dots → sign bits packed per band →
# same-bucket candidate pairs.
SIGN_CANDS_CTES = f"""qv AS (
      -- DISTINCT (vec_id, q): signatures are per distinct CONTENT copy.
      -- A redelivered verbatim row collapses here; a CONFLICTING
      -- re-ingest copy (same id, different payload -- the r10 joint
      -- contract) signs separately, and the candidate set is the union
      -- over copies (joint+temporal campaign, r12). Components that
      -- cannot land on the exact 1e-4 BIGINT grid (NULL / NaN / ±Inf /
      -- |x| >= 9e14 -- the bare cast ANSI-errors on them, both
      -- engines) quantize to NULL and drop out of the signing dot
      -- (list_sum and Spark's SUM both skip NULLs); the exact-cosine
      -- verify still sees the raw values (r12 payload campaign).
      SELECT DISTINCT vec_id,
             list_transform(range(1, {_DIM + 1}),
               i -> CASE
                      WHEN embedding[i] IS NULL THEN NULL
                      WHEN isnan(CAST(embedding[i] AS DOUBLE)) THEN NULL
                      WHEN abs(CAST(embedding[i] AS DOUBLE)) >= 9.0e14
                        THEN NULL
                      ELSE CAST(ROUND(CAST(embedding[i] AS DOUBLE)
                                      * 10000, 0) AS BIGINT)
                    END) AS q
      FROM embeddings
      WHERE vec_id IS NOT NULL AND {GEO_GATE_SQL}
    ),
    planes(j, w) AS (VALUES
      {_PLANES_VALUES_SQL}
    ),
    bits AS (
      SELECT vec_id, q, j,
             CASE WHEN list_sum(list_transform(range(1, {_DIM + 1}),
                                               i -> q[i] * w[i])) >= 0
                  THEN (1 << CAST(j % {_BAND_BITS} AS INTEGER))
                  ELSE 0 END AS contrib
      FROM qv, planes
    ),
    sign_sigs AS (
      -- q in the GROUP BY keeps each copy's 8 plane-contribs separate
      SELECT vec_id, j // {_BAND_BITS} AS band, SUM(contrib) AS sig
      FROM bits GROUP BY vec_id, q, j // {_BAND_BITS}
    ),
    ecands AS (
      SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
      FROM sign_sigs a JOIN sign_sigs b
        ON a.band = b.band AND a.sig = b.sig AND a.vec_id < b.vec_id
    )"""


def _sign_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, band, sig) — one packed 8-bit sign signature per band per
    input row. Shape at scale (r12 optimization, guide §2.3/§2.4): the
    ±1 hyperplane matrix is a COMPILE-TIME constant, so every plane dot
    is a signed sum of the row's 64 quantized components — 64 codegen'd
    integer expressions evaluated map-side inside the scan stage. The
    former spelling posexploded each vector ×64 dims, broadcast-joined a
    4096-row plane table (a ×64 fan-out to n×4096 rows) and ran TWO
    shuffled aggregations; all of that is now a single per-row
    projection + an 8-struct explode. ZERO shuffle, zero interpreted
    HOF; identical sig values (same exact BIGINT dot, same >= 0 sign,
    same bit packing).

    Per-row signing keeps the r12 joint+temporal contract for free: a
    CONFLICTING re-ingest copy (same id, different payload — the r10
    joint contract) signs separately BY CONSTRUCTION, since nothing
    folds rows before the sign. A verbatim redelivered copy emits a
    duplicate (vec_id, band, sig) row (the former spelling collapsed it
    via its copy-key groupBy); the only consumer is the candidate
    self-join, which dropDuplicates the (a_id, b_id) pairs, so the
    candidate set — and every emitted result — is unchanged."""
    em = geo_gate(
        load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id").isNotNull())
    )
    # slice to the first _DIM dims EXPLICITLY (ADVICE r11): the DuckDB
    # spelling quantizes exactly range(1, _DIM+1); the inner join on the
    # plane table (i <= _DIM) would truncate longer arrays identically,
    # but that equivalence was load-bearing-by-accident — spell it. A
    # fixture-shape test (test_wave104) pins the data dim == _DIM so a
    # dim change fails loudly instead of silently signing a prefix.
    # non-quantizable components (NULL / NaN / ±Inf / over-grid) map to
    # NULL — the bare cast ANSI-errors on them in both engines (r12
    # payload campaign); the geometry gate above excludes them, so the
    # signing sums below never actually see a NULL (asserted by the
    # gate's contract, relied on by the plain + chains)
    q = (
        parallelize(em)
        .select(
            "vec_id",
            # sequence + try_element_at, NOT slice: mirrors the oracle's
            # range(1, 65) indexing exactly — a shorter (or even empty)
            # array yields NULL tail positions in BOTH engines instead
            # of fewer exploded rows in one of them
            F.expr(
                f"transform(sequence(1, {_DIM}),"
                " i -> CASE"
                " WHEN try_element_at(embedding, i) IS NULL THEN NULL"
                " WHEN isnan(CAST(try_element_at(embedding, i) AS DOUBLE))"
                "   THEN NULL"
                " WHEN abs(CAST(try_element_at(embedding, i) AS DOUBLE))"
                "   >= 9.0e14 THEN NULL"
                " ELSE CAST(ROUND(CAST(try_element_at(embedding, i) AS DOUBLE)"
                "   * 10000, 0) AS BIGINT)"
                " END)"
            ).alias("qarr"),
        )
    )

    # One higher-order-function expression computes all 8 band sigs:
    # `qarr` is referenced exactly ONCE, so projection collapse cannot
    # duplicate the quantization tree (a fully unrolled 4096-term
    # codegen spelling was tried first: CollapseProject inlined qarr's
    # 64-branch CASE into every one of its 4096 references — a
    # multi-million-node expression tree that OOMed the driver during
    # broadcast build). The plane matrix is a literal array-of-arrays —
    # all-foldable, so ConstantFolding reduces it to ONE array Literal
    # at plan time. dot_j is a sequential exact-BIGINT fold (integer
    # addition is exactly associative, so it equals the former
    # SUM-over-group bit for bit; the geometry gate guarantees no NULL
    # components reach the fold).
    w2 = (
        "array("
        + ",".join(
            "array(" + ",".join(str(v) + "L" for v in row) + ")" for row in _W
        )
        + ")"
    )
    n_bands = _N_PLANES // _BAND_BITS
    sig_structs = (
        f"transform(sequence(0, {n_bands - 1}), b ->"
        " named_struct('band', CAST(b AS BIGINT), 'sig',"
        f" aggregate(sequence(0, {_BAND_BITS - 1}), CAST(0 AS BIGINT),"
        " (acc, i) -> acc + CASE WHEN"
        f" aggregate(sequence(1, {_DIM}), CAST(0 AS BIGINT),"
        f" (a2, k) -> a2 + element_at(qarr, k)"
        f" * element_at(element_at({w2}, b * {_BAND_BITS} + i + 1), k))"
        " >= 0 THEN shiftleft(1, i) ELSE 0 END)))"
    )
    return q.select(
        "vec_id", F.expr(f"explode({sig_structs})").alias("bb")
    ).select("vec_id", F.col("bb.band").alias("band"), F.col("bb.sig").alias("sig"))


@register(
    "llm_dedup_embed_lsh",
    CAT,
    f"""
    WITH {SIGN_CANDS_CTES}
    SELECT c.a_id, c.b_id,
           ROUND({_DOT_SQL.format(a='a.embedding', b='b.embedding')}
                 / ({_NORM_SQL.format(v='a.embedding')}
                    * {_NORM_SQL.format(v='b.embedding')}), 4) AS cosine
    FROM ecands c
    JOIN embeddings a ON a.vec_id = c.a_id
    JOIN embeddings b ON b.vec_id = c.b_id
    WHERE {GEO_GATE_SQL_T.format(v='a.embedding')}
      AND {GEO_GATE_SQL_T.format(v='b.embedding')}
      AND {_DOT_SQL.format(a='a.embedding', b='b.embedding')}
          / ({_NORM_SQL.format(v='a.embedding')}
             * {_NORM_SQL.format(v='b.embedding')}) >= {COS_DUP_THRESHOLD}
    """,
)
def llm_dedup_embed_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs over sign-LSH candidates —
    the default 100 TB path for llm_dedup_embed's pair semantics (see
    module docstring). Candidates from an equi-join on (band, packed
    sign byte); verify is llm_dedup_embed's exact-cosine expression
    verbatim (same _DOT fold, same threshold constant, same ROUND), so
    emitted pairs are a candidate-restricted subset of the all-pairs
    baseline — the subset relation is pinned in tests. The all-pairs
    spelling stays registered as the oracled exact baseline."""
    # lazy localCheckpoint (r12): the self-join references the signature
    # relation on BOTH sides and Spark re-executes a DataFrame subtree
    # per reference, so unpinned, the quantization + sign-fold projection
    # ran twice per invocation (the llm_simhash_pairs discipline,
    # llm_dedup.py) — measured 2.32 s → 2.00 s at sf0.1
    sigs = _sign_sigs(spark, sf_dir).localCheckpoint(eager=False)
    # fully distinct column names on the two sides: a self-join spelled
    # over a shared parent attribute (a["band"] == b["band"]) resolves
    # both sides to the SAME attribute and Catalyst folds it to a
    # trivially-true predicate — silently joining on sig alone
    a = sigs.select(
        F.col("vec_id").alias("a_id"),
        F.col("band").alias("a_band"),
        F.col("sig").alias("a_sig"),
    )
    b = sigs.select(
        F.col("vec_id").alias("b_id"),
        F.col("band").alias("b_band"),
        F.col("sig").alias("b_sig"),
    )
    cands = (
        a.join(
            b,
            (F.col("a_band") == F.col("b_band"))
            & (F.col("a_sig") == F.col("b_sig"))
            & (F.col("a_id") < F.col("b_id")),
        )
        .select("a_id", "b_id")
        .dropDuplicates(["a_id", "b_id"])
    )
    # verify legs through the same geometry gate: a conflicting
    # non-admissible copy of an admitted id must not fan the verify out
    em = geo_gate(load_table(spark, sf_dir, "embeddings"))
    # norms depend only on the vector, so they are computed ONCE per side
    # before the candidate join (r12, the llm_dedup_clusters hoist): the
    # per-pair verify is then one dot fold + a divide instead of dot +
    # two 64-step norm folds (3× the interpreted-HOF steps on every
    # candidate pair — 73 k pairs at sf0.1, measured 2.00 s → 1.68 s).
    # The expression value is bit-identical to a per-pair norm (same
    # double arithmetic on the same vector), so oracle parity holds.
    norm = lambda c: F.sqrt(  # noqa: E731
        F.expr(
            f"aggregate({c}, 0D,"
            " (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
        )
    )
    ea = em.select(
        F.col("vec_id").alias("a_id"),
        F.col("embedding").alias("a_emb"),
        norm("embedding").alias("a_norm"),
    )
    eb = em.select(
        F.col("vec_id").alias("b_id"),
        F.col("embedding").alias("b_emb"),
        norm("embedding").alias("b_norm"),
    )
    dot = F.expr(_DOT.format(a="a_emb", b="b_emb"))
    # zero-norm guard mirrors llm_dedup_embed (r12 payload campaign):
    # NULL on the Spark side, NaN on the oracle side — both fail the
    # threshold, so the emitted pair set agrees
    denom = F.col("a_norm") * F.col("b_norm")
    cos = F.when(denom != 0, dot / denom)
    return (
        cands.join(ea, "a_id")
        .join(eb, "b_id")
        .select("a_id", "b_id", cos.alias("_cos"))
        .filter(F.col("_cos") >= COS_DUP_THRESHOLD)
        .select("a_id", "b_id", F.round("_cos", 4).alias("cosine"))
    )
