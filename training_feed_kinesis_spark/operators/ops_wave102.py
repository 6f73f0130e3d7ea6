"""Wave 102 — scale-safe duplicate-cluster formation (round 10).

VERDICT r9's one standing scale item: ``llm_dedup_clusters`` /
``llm_dedup_apply`` build their edge set as exact all-pairs cosine —
the oracled correctness baseline, but O(corpus²). These keys retire
that as the DEFAULT cluster path by composition, not invention:

  * ``llm_dedup_clusters_lsh``: feeds the EXISTING banded MinHash-LSH
    candidate pairs (llm_dedup.llm_dedup_near — map-side signatures,
    (band, band_sig) bucket join, exact-Jaccard verify on candidates
    only) into the EXISTING pointer-doubling min-label CC iteration
    (llm_similarity.cc_min_label). Every stage is the shape a 100 TB
    deployment runs: candidate generation sized by LSH construction
    (never n²), verification touching candidate docs only, and an
    O(log diameter) label-propagation loop whose per-round shuffles
    carry (node, label) pairs — never document payloads.
  * ``llm_dedup_apply_lsh``: the apply/yield step over those clusters —
    cluster-size distribution + rows dropped per size class (the same
    report ``llm_dedup_apply`` computes over the all-pairs baseline).

Oracle: DuckDB RECURSIVE-CTE reachability over the SAME banded edge set
(llm_dedup.NEAR_PAIRS_CTES verbatim), so the iterative Spark loop is
hash-checked end-to-end, not rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table, substrate
from .llm_dedup import (
    JACCARD_THRESHOLD,
    NEAR_PAIRS_CTES,
    NEAR_PAIRS_FROM_WHERE,
    llm_dedup_near,
)
from .llm_similarity import cc_min_label

CAT = "2.J llm-pipeline (dedup)"

# The verified banded-LSH edge set as a CTE over NEAR_PAIRS_CTES: the
# same pairs llm_dedup_near emits, id columns only. The FROM/WHERE is
# llm_dedup.NEAR_PAIRS_FROM_WHERE spliced verbatim (ADVICE r10) — one
# threshold/join spelling for both the pair oracle and the edge set.
_EDGES_LSH_CTE = f"""edges AS (
      SELECT v.a_id AS a, v.b_id AS b
      {NEAR_PAIRS_FROM_WHERE}
    )"""

_REACH_CTE = """reach(node, label) AS (
      -- an identity-less document cannot be cluster-labeled (NULL-PK r9)
      SELECT doc_id, doc_id FROM documents WHERE doc_id IS NOT NULL
      UNION
      SELECT CASE WHEN r.node = e.a THEN e.b ELSE e.a END, r.label
      FROM reach r JOIN edges e ON r.node = e.a OR r.node = e.b
    )"""


def _labels_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(node, label) converged CC frame over the banded-LSH verified
    near-dup edge set. Edge generation is llm_dedup_near verbatim (its
    band-signature and shingle-array session substrates are shared, so
    repeated invocation re-pays only the candidate join); the iteration
    is cc_min_label verbatim.

    The CONVERGED labels are themselves a session substrate (r12,
    keeper_lsh profile: clusters → apply → keeper each re-ran the full
    candidate join + O(log d) CC rounds — the iteration, not the edge
    set, dominated at ~3 s/round of fixed multi-stage cost). One cluster
    manifest per (session, dir) is exactly the production shape: CC runs
    once per ingest snapshot, every downstream consumer (size census,
    yield report, keeper election) scans the manifest."""
    def build() -> DataFrame:
        edges = llm_dedup_near(spark, sf_dir).select(
            F.col("a_id").alias("a"), F.col("b_id").alias("b")
        )
        seeds = (
            load_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id").isNotNull())
            .select(
                F.col("doc_id").alias("node"), F.col("doc_id").alias("label")
            )
        )
        return cc_min_label(seeds, edges)

    return substrate(spark, sf_dir, "lsh_cc_labels", build)


@register(
    "llm_dedup_clusters_lsh",
    CAT,
    f"""
    WITH RECURSIVE {NEAR_PAIRS_CTES},
    {_EDGES_LSH_CTE},
    {_REACH_CTE}
    SELECT node AS doc_id, MIN(label) AS component FROM reach GROUP BY node
    """,
)
def llm_dedup_clusters_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster formation over the banded MinHash-LSH edge set —
    the default 100 TB cluster path (see module docstring). Identical
    cluster semantics to ``llm_dedup_clusters``' iteration, but the edge
    set is candidate-generate-then-verify (LSH-sized) instead of exact
    all-pairs: at 5× data the cost tracks the candidate-pair count, not
    corpus²."""
    labels = _labels_lsh(spark, sf_dir)
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("component")
    )


@register(
    "llm_dedup_apply_lsh",
    CAT,
    f"""
    WITH RECURSIVE {NEAR_PAIRS_CTES},
    {_EDGES_LSH_CTE},
    {_REACH_CTE},
    comp AS (SELECT node, MIN(label) AS component FROM reach GROUP BY node),
    sizes AS (SELECT component, COUNT(*) AS csize FROM comp GROUP BY component)
    SELECT csize, COUNT(*) AS n_clusters,
           SUM(csize - 1)::BIGINT AS n_dropped
    FROM sizes GROUP BY csize
    """,
)
def llm_dedup_apply_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup yield over the LSH-edge clusters: cluster-size distribution
    plus rows dropped per size class (csize−1 per cluster, min-id keeper
    election). Two small aggregations over (node, component); applying
    the election to payloads is a keeper semi-join that never shuffles
    the corpus."""
    labels = llm_dedup_clusters_lsh(spark, sf_dir)
    sizes = labels.groupBy("component").agg(F.count(F.lit(1)).alias("csize"))
    return sizes.groupBy("csize").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum(F.col("csize") - 1).cast("bigint").alias("n_dropped"),
    )
