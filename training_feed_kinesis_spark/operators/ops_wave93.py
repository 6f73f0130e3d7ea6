"""Wave 93 (round 5): embedding ingest validation.

  * ``dq_embedding_validate``: the admission gate an ANN/similarity
    pipeline needs before any vector math — a one-pass census of NULL
    vectors, wrong-dimension vectors, all-zero vectors, and non-finite
    components, per label. Every downstream vec_*/llm_sim_* operator
    assumes 64 finite dims; this is the operator that PROVES that
    assumption on each ingest batch instead of letting a malformed
    vector NaN-poison a centroid three jobs later. Detection power on
    actually-malformed vectors is proven by a planted-corruption test
    (the generated corpus is clean — which this census also certifies).

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

CAT_DQ = "2.L data quality"

EXPECTED_DIM = 64


@register(
    "dq_embedding_validate",
    CAT_DQ,
    f"""
    SELECT label,
           COUNT(*)::BIGINT AS n_vecs,
           SUM(CASE WHEN embedding IS NULL THEN 1 ELSE 0 END)::BIGINT
             AS n_null,
           SUM(CASE WHEN embedding IS NOT NULL
                     AND len(embedding) != {EXPECTED_DIM}
                    THEN 1 ELSE 0 END)::BIGINT AS n_wrong_dim,
           -- NULL components get their own class (x IS NULL is two-valued,
           -- so both engines agree); the zero/finite checks below EXCLUDE
           -- null-component vectors, keeping every remaining predicate
           -- two-valued — Spark's exists() is three-valued over NULL
           -- elements while DuckDB's list_has_any ignores them, so a
           -- NULL-polluted vector must never reach those predicates
           SUM(CASE WHEN embedding IS NOT NULL
                     AND list_has_any(
                           list_transform(embedding, x -> x IS NULL),
                           [true])
                    THEN 1 ELSE 0 END)::BIGINT AS n_null_comp,
           SUM(CASE WHEN embedding IS NOT NULL
                     AND len(embedding) = {EXPECTED_DIM}
                     AND NOT list_has_any(
                           list_transform(embedding, x -> x IS NULL),
                           [true])
                     AND NOT list_has_any(
                           list_transform(embedding, x -> x != 0.0),
                           [true])
                    THEN 1 ELSE 0 END)::BIGINT AS n_all_zero,
           SUM(CASE WHEN embedding IS NOT NULL
                     AND NOT list_has_any(
                           list_transform(embedding, x -> x IS NULL),
                           [true])
                     AND list_has_any(
                           list_transform(embedding,
                                          x -> isnan(x) OR isinf(x)),
                           [true])
                    THEN 1 ELSE 0 END)::BIGINT AS n_nonfinite
    FROM embeddings
    GROUP BY label
    """,
)
def dq_embedding_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding admission census per label: NULL vectors, wrong
    dimension (≠64), vectors with any NULL component, all-zero vectors
    (cosine-undefined), and vectors with any NaN/Inf component. All
    five flags are row-local array predicates (exists — JVM
    higher-order functions, no explode), so the census is one
    map-side-combinable aggregate over label; the clean corpus reports
    zeros everywhere except n_vecs, and the planted-corruption test
    proves each flag actually fires.

    Scale shape: single scan, conditional-count aggregate keyed by the
    tiny label domain — the cheapest possible certificate that 100 TB
    of vectors is safe to feed the ANN/centroid operators."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    not_null = e.isNotNull()
    right_dim = F.size(e) == EXPECTED_DIM
    # x IS NULL is two-valued, so this flag is engine-stable; the zero /
    # finite predicates below run ONLY on null-free vectors because
    # Spark's exists() is three-valued over NULL elements (returns NULL,
    # not false) while DuckDB's list_has_any ignores NULL elements —
    # mixing them on a NULL-polluted vector diverges
    has_null_comp = F.exists(e, lambda x: x.isNull())
    any_nonzero = F.exists(e, lambda x: x != 0.0)
    any_nonfinite = F.exists(e, lambda x: F.isnan(x) | (F.abs(x) == float("inf")))
    flag = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        flag(~not_null).alias("n_null"),
        flag(not_null & ~right_dim).alias("n_wrong_dim"),
        flag(not_null & has_null_comp).alias("n_null_comp"),
        flag(
            not_null & right_dim & ~has_null_comp & ~any_nonzero
        ).alias("n_all_zero"),
        flag(not_null & ~has_null_comp & any_nonfinite).alias("n_nonfinite"),
    )
