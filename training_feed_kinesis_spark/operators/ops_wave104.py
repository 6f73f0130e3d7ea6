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
    distinct (vec_id, content) copy. Shape at scale: quantize +
    posexplode map-side (64 rows per vector), broadcast the 4096-row
    plane matrix, partial-agg the exact integer dots map-side so the
    shuffle carries 64 (vec_id, copy-key, plane, partial-sum) rows per
    vector — never the float payload; a second tiny agg packs 8 bands.
    All codegen'd hash-aggregate, no interpreted HOF in the hot path
    (the minhash-substrate lesson, llm_dedup.py).

    Signatures are keyed by (vec_id, ck) where ck is an md5 of the
    quantized content (r12 joint+temporal campaign): a CONFLICTING
    re-ingest copy — same id, different payload, the r10 joint contract
    — must sign separately, or the dot sums of the two copies fold
    together BEFORE the sign and produce a signature belonging to
    neither copy (and a different one than the oracle's per-row signs).
    A verbatim redelivered copy shares its twin's ck; folding doubles
    every dot, and sign(2d) = sign(d), so its signature is unchanged —
    no distinct pass needed on the corpus. ck never leaves the engine:
    only (vec_id, band, sig) is emitted, and the downstream candidate
    join dedups pairs, so cross-engine parity needs identical GROUPS,
    not identical keys."""
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
    # NULL and drop out of the signing dot — the bare cast ANSI-errors
    # on them in both engines (r12 payload campaign); the ck token keeps
    # an explicit 'N' so a NULLed position still distinguishes copies
    # (concat_ws silently drops NULL elements)
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
        .select(
            "vec_id",
            F.md5(
                F.concat_ws(
                    ",",
                    F.expr("transform(qarr, x -> coalesce(CAST(x AS STRING), 'N'))"),
                )
            ).alias("ck"),
            F.posexplode("qarr").alias("pos0", "qi"),
        )
    )
    planes = spark.createDataFrame(
        [(j, i, _W[j][i - 1]) for j in range(_N_PLANES) for i in range(1, _DIM + 1)],
        "j INT, i INT, w BIGINT",
    )
    dots = (
        q.join(F.broadcast(planes), (F.col("pos0") + 1) == F.col("i"))
        .groupBy("vec_id", "ck", "j")
        .agg(F.sum(F.col("qi") * F.col("w")).alias("dot"))
    )
    contrib = dots.select(
        "vec_id",
        "ck",
        (F.col("j") / _BAND_BITS).cast("long").alias("band"),
        F.expr(
            f"CASE WHEN dot >= 0"
            f" THEN shiftleft(1, CAST(j % {_BAND_BITS} AS INT))"
            f" ELSE 0 END"
        ).alias("contrib"),
    )
    return (
        contrib.groupBy("vec_id", "ck", "band")
        .agg(F.sum("contrib").alias("sig"))
        .select("vec_id", "band", "sig")
    )


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
    sigs = _sign_sigs(spark, sf_dir)
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
    ea = em.select(F.col("vec_id").alias("a_id"), F.col("embedding").alias("a_emb"))
    eb = em.select(F.col("vec_id").alias("b_id"), F.col("embedding").alias("b_emb"))
    dot = F.expr(_DOT.format(a="a_emb", b="b_emb"))
    norm = lambda c: F.sqrt(  # noqa: E731
        F.expr(
            f"aggregate({c}, 0D,"
            " (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
        )
    )
    # zero-norm guard mirrors llm_dedup_embed (r12 payload campaign):
    # NULL on the Spark side, NaN on the oracle side — both fail the
    # threshold, so the emitted pair set agrees
    denom = norm("a_emb") * norm("b_emb")
    cos = F.when(denom != 0, dot / denom)
    return (
        cands.join(ea, "a_id")
        .join(eb, "b_id")
        .select("a_id", "b_id", cos.alias("_cos"))
        .filter(F.col("_cos") >= COS_DUP_THRESHOLD)
        .select("a_id", "b_id", F.round("_cos", 4).alias("cosine"))
    )
