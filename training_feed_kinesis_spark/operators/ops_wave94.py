"""Wave 94 (round 5): the dedup tier ladder.

  * ``llm_dedup_tier_census``: one-pass census of how many duplicates
    each successively-looser canonicalization tier exposes — byte-exact
    md5, word-BAG (order-normalized multiset), word-SET (distinct
    vocabulary) — the ladder a curation pipeline walks between exact
    dedup (llm_dedup_exact) and MinHash near-dup (llm_dedup_near).
    Tier deltas tell you whether your duplication is literal re-posts
    (raw), shuffled boilerplate (bag), or template text over a shared
    vocabulary (set); on this corpus the set tier is the first one that
    fires (446 distinct of 500), which the non-vacuity test pins.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

CAT_LLM = "2.L llm dedup"


@register(
    "llm_dedup_tier_census",
    CAT_LLM,
    """
    WITH k AS (
      SELECT md5(text) AS raw_key,
             md5(array_to_string(list_sort(string_split(text, ' ')), ' '))
               AS bag_key,
             md5(array_to_string(
                   list_sort(list_distinct(string_split(text, ' '))), ' '))
               AS set_key
      FROM documents
    )
    SELECT COUNT(*)::BIGINT AS n_docs,
           COUNT(DISTINCT raw_key)::BIGINT AS distinct_raw,
           COUNT(DISTINCT bag_key)::BIGINT AS distinct_bag,
           COUNT(DISTINCT set_key)::BIGINT AS distinct_set,
           (COUNT(*) - COUNT(DISTINCT raw_key))::BIGINT AS dups_raw,
           (COUNT(DISTINCT raw_key) - COUNT(DISTINCT bag_key))::BIGINT
             AS extra_bag,
           (COUNT(DISTINCT bag_key) - COUNT(DISTINCT set_key))::BIGINT
             AS extra_set
    FROM k
    """,
)
def llm_dedup_tier_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate yield per canonicalization tier: byte-exact, word-bag
    (sorted tokens — catches reordered boilerplate), word-set (sorted
    DISTINCT tokens — catches templates over a shared vocabulary). Each
    tier's key is an md5 computed row-locally; the three distinct counts
    come from one aggregate. Sorting uses binary collation on both
    engines, so the canonical forms are byte-identical.

    Scale shape: keys are map-side projections; the multi-DISTINCT
    aggregate plans as an Expand (3× the key rows, each 16-byte hash) —
    fine to ~10¹⁰ docs; past that, run three separate partial-agg
    distinct counts and join the 1-row results, or switch the counts to
    HLL sketches (agg_approx_distinct's path)."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    k = d.select(
        F.md5("text").alias("raw_key"),
        F.md5(F.array_join(F.array_sort(words), " ")).alias("bag_key"),
        F.md5(
            F.array_join(F.array_sort(F.array_distinct(words)), " ")
        ).alias("set_key"),
    )
    return k.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("raw_key").alias("distinct_raw"),
        F.countDistinct("bag_key").alias("distinct_bag"),
        F.countDistinct("set_key").alias("distinct_set"),
        (F.count(F.lit(1)) - F.countDistinct("raw_key")).alias("dups_raw"),
        (F.countDistinct("raw_key") - F.countDistinct("bag_key")).alias(
            "extra_bag"
        ),
        (F.countDistinct("bag_key") - F.countDistinct("set_key")).alias(
            "extra_set"
        ),
    )
