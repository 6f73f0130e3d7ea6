"""Wave 42: leave-one-source-out ablation planning, experiment power.

  * ``llm_data_ablation_manifest``: for each source, the corpus stats the
    training mix would have WITHOUT it — docs, tokens, language spread,
    mean quality — computed as global-minus-group from ONE aggregation
    pass (no per-ablation rescan). The planning table behind
    leave-one-out data-mixture ablations.
  * ``events_power_analysis``: minimum detectable effect at 80% power /
    5% significance for the running A/B, from observed variance and
    group sizes — the "is this experiment even worth running longer"
    readout that pairs with ``events_uplift_ab`` and
    ``events_cuped_adjust``.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

CAT_TEXT = "2.J llm-pipeline (text)"
CAT_WORK = "2.M workloads"

Z_ALPHA = 1.95996398454   # two-sided 5%
Z_BETA = 0.841621233573   # 80% power


@register(
    "llm_data_ablation_manifest",
    CAT_TEXT,
    """
    WITH per_doc AS (
      SELECT source, lang, n_chars,
             len(list_distinct(string_split(lower(text), ' ')))::DOUBLE
               / GREATEST(len(string_split(lower(text), ' ')), 1) AS ttr
      FROM documents
    ),
    per_source AS (
      SELECT source, COUNT(*)::BIGINT AS n_docs,
             SUM(n_chars)::BIGINT AS n_bytes,
             COUNT(DISTINCT lang)::BIGINT AS n_langs,
             SUM(ttr) AS ttr_sum
      FROM per_doc GROUP BY source
    ),
    tot AS (
      SELECT SUM(n_docs)::BIGINT AS t_docs, SUM(n_bytes)::BIGINT AS t_bytes,
             SUM(ttr_sum) AS t_ttr
      FROM per_source
    )
    SELECT s.source AS ablated_source,
           (t.t_docs - s.n_docs)::BIGINT AS remaining_docs,
           (t.t_bytes - s.n_bytes)::BIGINT AS remaining_bytes,
           ROUND((t.t_ttr - s.ttr_sum) / (t.t_docs - s.n_docs), 4)
             AS remaining_mean_ttr,
           ROUND(s.n_bytes::DOUBLE / t.t_bytes, 4) AS removed_byte_share
    FROM per_source s CROSS JOIN tot t
    """,
)
def llm_data_ablation_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-source-out ablation manifest: per candidate source, what
    the remaining corpus looks like if it is dropped — via the
    global-minus-group identity (totals and the removed group's stats
    come from the SAME single aggregation; no ablation rescans the
    corpus). `removed_byte_share` ranks which ablation is even
    informative; `remaining_mean_ttr` shows the quality shift.

    Scale shape: one doc-grain pass → source-grain rows → a 1-row total
    broadcast — k ablations cost exactly one corpus scan, which is the
    entire reason to plan them relationally instead of materializing k
    corpus variants."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), " ")
    per_doc = d.select(
        "source",
        "lang",
        "n_chars",
        (
            F.size(F.array_distinct(toks)).cast("double")
            / F.greatest(F.size(toks), F.lit(1))
        ).alias("ttr"),
    )
    per_source = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("n_bytes"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.sum("ttr").alias("ttr_sum"),
    )
    tot = per_source.agg(
        F.sum("n_docs").cast("long").alias("t_docs"),
        F.sum("n_bytes").cast("long").alias("t_bytes"),
        F.sum("ttr_sum").alias("t_ttr"),
    )
    return per_source.crossJoin(F.broadcast(tot)).select(
        F.col("source").alias("ablated_source"),
        (F.col("t_docs") - F.col("n_docs")).cast("long").alias("remaining_docs"),
        (F.col("t_bytes") - F.col("n_bytes"))
        .cast("long")
        .alias("remaining_bytes"),
        F.round(
            (F.col("t_ttr") - F.col("ttr_sum"))
            / (F.col("t_docs") - F.col("n_docs")),
            4,
        ).alias("remaining_mean_ttr"),
        F.round(F.col("n_bytes").cast("double") / F.col("t_bytes"), 4).alias(
            "removed_byte_share"
        ),
    )


@register(
    "events_power_analysis",
    CAT_WORK,
    f"""
    WITH assigned AS (
      SELECT user_id,
             CASE WHEN strpos('02468ace',
                    substr(md5(user_id::VARCHAR), 1, 1)) > 0
                  THEN 'A' ELSE 'B' END AS variant,
             COALESCE(SUM(value), 0) AS metric
      FROM events GROUP BY user_id
    )
    SELECT COUNT(*)::BIGINT AS n_users,
           CAST(SUM(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_a,
           ROUND(AVG(metric), 4) AS metric_mean,
           ROUND(sqrt(AVG(metric * metric) - AVG(metric) * AVG(metric)), 4)
             AS metric_sd,
           ROUND(({Z_ALPHA} + {Z_BETA})
                 * sqrt((AVG(metric * metric) - AVG(metric) * AVG(metric))
                 * (1.0 / SUM(CASE WHEN variant = 'A' THEN 1 ELSE 0 END)
                    + 1.0 / SUM(CASE WHEN variant = 'B' THEN 1 ELSE 0 END))),
                 4) AS mde_abs,
           ROUND(({Z_ALPHA} + {Z_BETA})
                 * sqrt((AVG(metric * metric) - AVG(metric) * AVG(metric))
                 * (1.0 / SUM(CASE WHEN variant = 'A' THEN 1 ELSE 0 END)
                    + 1.0 / SUM(CASE WHEN variant = 'B' THEN 1 ELSE 0 END)))
                 / NULLIF(AVG(metric), 0), 4) AS mde_rel
    FROM assigned
    """,
)
def events_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B power analysis from observed data: with the md5-assigned split
    (same as events_uplift_ab/cuped), the minimum detectable effect at
    80% power and 5% two-sided significance is
    (z_α/2 + z_β)·sqrt(σ²·(1/n_A + 1/n_B)) — pooled variance, per-user
    metric grain. `mde_rel` (vs the mean) is the go/no-go: if the effect
    you hope for is below it, the experiment cannot conclude at this
    traffic and needs more runtime or CUPED (whose variance reduction
    shrinks exactly this number).

    Scale shape: one user-grain aggregate then one combinable global
    aggregate — same two-shuffle shape as every experiment readout
    here."""
    ev = load_table(spark, sf_dir, "events")
    is_a = F.instr(
        F.lit("02468ace"), F.substring(F.md5(F.col("user_id").cast("string")), 1, 1)
    ) > 0
    assigned = ev.groupBy("user_id").agg(
        F.when(F.first(is_a), "A").otherwise("B").alias("variant"),
        F.coalesce(F.sum("value"), F.lit(0.0)).alias("metric"),
    )
    n_a = F.sum(F.when(F.col("variant") == "A", 1).otherwise(0))
    n_b = F.sum(F.when(F.col("variant") == "B", 1).otherwise(0))
    var_ = F.avg(F.col("metric") * F.col("metric")) - F.avg("metric") * F.avg(
        "metric"
    )
    mde = (Z_ALPHA + Z_BETA) * F.sqrt(var_ * (1.0 / n_a + 1.0 / n_b))
    return assigned.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        n_a.cast("long").alias("n_a"),
        F.round(F.avg("metric"), 4).alias("metric_mean"),
        F.round(F.sqrt(var_), 4).alias("metric_sd"),
        F.round(mde, 4).alias("mde_abs"),
        F.round(mde / F.nullif(F.avg("metric"), F.lit(0)), 4).alias("mde_rel"),
    )
