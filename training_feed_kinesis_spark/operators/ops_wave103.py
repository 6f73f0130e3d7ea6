"""Wave 103 — completing the round-10 campaigns as first-class operators.

  * ``llm_dedup_keeper_lsh``: keeper election over the LSH-edge duplicate
    clusters (ops_wave102) — the step that turns cluster labels into the
    keep/drop manifest a 100 TB dedup actually ships. Quality-ranked
    (longest text wins, min doc_id tiebreak), deterministic under
    re-ingest (per-doc attributes reduced by MAX first).
  * ``llm_minhash_est_calibration``: measured sketch quality as data —
    estimated Jaccard (fraction of agreeing MinHash seeds) vs exact
    Jaccard on the SAME banded candidate pairs, bucketed by estimate.
    The calibration table that justifies trusting k=8 signatures before
    the verify stage is ever skipped. Fully md5-deterministic, so unlike
    most sketch-quality metrics it carries a real SQL oracle.
  * ``dq_corruption_composite_census``: the round-10 joint-corruption
    campaign operationalized — one census over the three content/fact
    tables reporting NULL-PK rows, duplicate keys, and CONFLICTING
    re-ingest versions (same id, different payload hash), the triage
    report that decides whether the admission gates must run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load_table
from .exact import Q4_TOKEN, Q4_TOKEN_SQL
from .llm_dedup import (
    JACCARD_THRESHOLD,
    N_SEEDS,
    NEAR_PAIRS_CTES,
    _band_sigs,
    _minhash_sigs,
    _shingle_arrays,
)
from .ops_wave102 import _EDGES_LSH_CTE, _REACH_CTE, _labels_lsh

CAT_DEDUP = "2.J llm-pipeline (dedup)"
CAT_DQ = "2.L data quality"


@register(
    "llm_dedup_keeper_lsh",
    CAT_DEDUP,
    f"""
    WITH RECURSIVE {NEAR_PAIRS_CTES},
    {_EDGES_LSH_CTE},
    {_REACH_CTE},
    comp AS (SELECT node, MIN(label) AS component FROM reach GROUP BY node),
    attrs AS (
      -- per-doc attribute reduced FIRST: a conflicting re-ingest version
      -- must not make the quality rank row-dependent (MAX is the
      -- deterministic union of versions)
      SELECT doc_id, MAX(n_chars) AS n_chars
      FROM documents WHERE doc_id IS NOT NULL GROUP BY doc_id
    ),
    ranked AS (
      SELECT c.node AS doc_id, c.component, a.n_chars,
             ROW_NUMBER() OVER (PARTITION BY c.component
               ORDER BY a.n_chars DESC NULLS LAST, c.node ASC) AS rn
      FROM comp c JOIN attrs a ON a.doc_id = c.node
    ),
    keepers AS (
      SELECT component, doc_id AS keeper_id FROM ranked WHERE rn = 1
    )
    SELECT r.doc_id, r.component, k.keeper_id,
           (r.doc_id = k.keeper_id)::INT AS is_keeper
    FROM ranked r JOIN keepers k ON k.component = r.component
    """,
)
def llm_dedup_keeper_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keeper election over the LSH-edge clusters: per component, the
    longest document wins (n_chars DESC NULLS LAST, doc_id ASC tiebreak
    — both pinned, the r10 tie discipline), everything else maps to its
    keeper. This is the manifest the payload filter consumes: applying
    it is a broadcast/semi join on doc_id — document bodies never
    shuffle.

    Scale shape: the election window shuffles (doc_id, component,
    n_chars) — never text; component groups are near-dup cluster sized
    (bounded by the LSH construction), so no window partition skews."""
    labels = _labels_lsh(spark, sf_dir)
    attrs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isNotNull())
        .groupBy("doc_id")
        .agg(F.max("n_chars").alias("n_chars"))
    )
    ranked = (
        labels.join(attrs, labels.node == attrs.doc_id)
        .select("doc_id", F.col("label").alias("component"), "n_chars")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("component").orderBy(
                    F.col("n_chars").desc_nulls_last(), F.col("doc_id").asc()
                )
            ),
        )
    )
    keepers = ranked.filter(F.col("rn") == 1).select(
        "component", F.col("doc_id").alias("keeper_id")
    )
    return (
        ranked.join(keepers, "component")
        .select(
            "doc_id",
            "component",
            "keeper_id",
            (F.col("doc_id") == F.col("keeper_id")).cast("int").alias("is_keeper"),
        )
    )


@register(
    "llm_minhash_est_calibration",
    CAT_DEDUP,
    f"""
    WITH {NEAR_PAIRS_CTES},
    est AS (
      SELECT c.a_id, c.b_id,
             SUM(CASE WHEN sa.minhash = sb.minhash THEN 1 ELSE 0 END)
               * 1.0 / {N_SEEDS} AS est_j
      FROM cands c
      JOIN sigs sa ON sa.doc_id = c.a_id
      JOIN sigs sb ON sb.doc_id = c.b_id AND sb.seed = sa.seed
      GROUP BY c.a_id, c.b_id
    ),
    exact AS (
      SELECT v.a_id, v.b_id,
             -- per-row 1e-4 quantization (§5.3.6b): group means become
             -- exact integer sums, order-free across engines
             CAST(ROUND(v.inter * 10000.0 / (ca.n + cb.n - v.inter), 0)
                  AS BIGINT) AS jac_q
      FROM verified v
      JOIN counts ca ON ca.doc_id = v.a_id
      JOIN counts cb ON cb.doc_id = v.b_id
    )
    SELECT e.est_j, COUNT(*) AS n_pairs,
           ROUND(CAST(SUM(x.jac_q) AS DOUBLE) / (10000.0 * COUNT(*)), 4)
             AS mean_exact_j
    FROM est e JOIN exact x ON x.a_id = e.a_id AND x.b_id = e.b_id
    GROUP BY e.est_j
    """,
)
def llm_minhash_est_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-calibration table: on every banded candidate pair, the
    MinHash ESTIMATE of Jaccard (agreeing seeds / k — Broder 1997's
    unbiased resemblance estimator) against the EXACT shingle Jaccard,
    bucketed by estimate. Reading this table is how a deployment decides
    whether k=8 signatures are trustworthy enough to skip the verify
    join — the measured-quality discipline of llm_ann_recall, but fully
    SQL-oracled because md5 minhashing is engine-portable.

    Scale shape: both legs reuse the session substrates (band signatures,
    shingle arrays); the estimate join carries 8 16-byte hashes per
    candidate pair; exact Jaccard is per-row quantized to integer 1e-4
    units so the bucket means are exact integer sums — order-free."""
    bands = _band_sigs(spark, sf_dir)
    a = bands.select(F.col("doc_id").alias("a_id"), "band", "band_sig")
    b = bands.select(F.col("doc_id").alias("b_id"), "band", "band_sig")
    cands = (
        a.join(b, ["band", "band_sig"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    sigs = _minhash_sigs(spark, sf_dir)
    sa = sigs.select(F.col("doc_id").alias("a_id"), "seed",
                     F.col("minhash").alias("mh_a"))
    sb = sigs.select(F.col("doc_id").alias("b_id"), "seed",
                     F.col("minhash").alias("mh_b"))
    est = (
        cands.join(sa, "a_id")
        .join(sb, ["b_id", "seed"])
        .groupBy("a_id", "b_id")
        .agg(
            (
                F.sum((F.col("mh_a") == F.col("mh_b")).cast("int"))
                * 1.0 / N_SEEDS
            ).alias("est_j")
        )
    )
    arrs = _shingle_arrays(spark, sf_dir)
    aa = arrs.select(F.col("doc_id").alias("a_id"), F.col("shs").alias("sha"))
    bb = arrs.select(F.col("doc_id").alias("b_id"), F.col("shs").alias("shb"))
    jac_q = F.expr(
        "CAST(ROUND(size(array_intersect(sha, shb)) * 10000.0 "
        "/ (size(sha) + size(shb) - size(array_intersect(sha, shb))), 0) "
        "AS BIGINT)"
    )
    exact = (
        cands.join(aa, "a_id")
        .join(bb, "b_id")
        .select("a_id", "b_id", jac_q.alias("jac_q"))
    )
    return (
        est.join(exact, ["a_id", "b_id"])
        .groupBy("est_j")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(
                F.sum("jac_q").cast("double") / (10000.0 * F.count(F.lit(1))), 4
            ).alias("mean_exact_j"),
        )
    )


# --- dq_corruption_composite_census ------------------------------------------

# canonical payload hashes (PK excluded): same spelling both engines so a
# CONFLICTING re-ingest version is any id with >1 distinct hash. Float
# payloads canonicalize through exact.Q4_TOKEN (r12 payload-extremes
# campaign): the census must be TOTAL on exactly the corrupt input it
# exists to triage, and the bare BIGINT quantization hard-errored on a
# NaN embedding component (ANSI CAST overflow, both engines). The token
# also keeps NULL components IN the hash ('N') — array_join/
# array_to_string silently drop NULL elements, so [1, NULL, 2] used to
# hash equal to [1, 2].
_PAYLOAD = {
    "documents": (
        "doc_id",
        "md5(concat_ws('|', coalesce(text, ''), coalesce(lang, ''),"
        " coalesce(source, ''), coalesce(CAST(n_chars AS STRING), '')))",
        "md5(concat_ws('|', coalesce(text, ''), coalesce(lang, ''),"
        " coalesce(source, ''), coalesce(n_chars::VARCHAR, '')))",
    ),
    "embeddings": (
        "vec_id",
        "md5(concat_ws('|', coalesce(array_join(transform(embedding,"
        f" x -> {Q4_TOKEN.format(x='x')}), ','), ''),"
        " coalesce(CAST(label AS STRING), '')))",
        "md5(concat_ws('|', coalesce(array_to_string(list_transform(embedding,"
        f" x -> {Q4_TOKEN_SQL.format(x='x')}), ','), ''),"
        " coalesce(label::VARCHAR, '')))",
    ),
    "events": (
        "event_id",
        "md5(concat_ws('|', coalesce(CAST(user_id AS STRING), ''),"
        " coalesce(event_type, ''),"
        f" coalesce({Q4_TOKEN.format(x='value')}, ''),"
        " coalesce(date_format(ts, 'yyyy-MM-dd HH:mm:ss.SSSSSS'), '')))",
        "md5(concat_ws('|', coalesce(user_id::VARCHAR, ''),"
        " coalesce(event_type, ''),"
        f" coalesce({Q4_TOKEN_SQL.format(x='value')}, ''),"
        " coalesce(strftime(ts, '%Y-%m-%d %H:%M:%S.%f'), '')))",
    ),
}


def _census_sql(tbl: str) -> str:
    pk, _, duck_h = _PAYLOAD[tbl]
    return f"""
    SELECT '{tbl}' AS tbl,
           COUNT(*)::BIGINT AS n_rows,
           SUM(CASE WHEN {pk} IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null_pk,
           (SELECT COUNT(*) FROM (
              SELECT {pk} FROM {tbl} WHERE {pk} IS NOT NULL
              GROUP BY {pk} HAVING COUNT(*) > 1))::BIGINT AS n_dup_keys,
           (SELECT COUNT(*) FROM (
              SELECT {pk} FROM (SELECT {pk}, {duck_h} AS h FROM {tbl}
                                WHERE {pk} IS NOT NULL)
              GROUP BY {pk} HAVING COUNT(DISTINCT h) > 1))::BIGINT
             AS n_conflicting
    FROM {tbl}
    """


@register(
    "dq_corruption_composite_census",
    CAT_DQ,
    " UNION ALL ".join(_census_sql(t) for t in _PAYLOAD),
)
def dq_corruption_composite_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r10 joint-corruption campaign as a first-class triage report:
    per content/fact table, NULL-PK rows, duplicate keys, and CONFLICTING
    re-ingest versions (same id, >1 distinct canonical payload hash).
    This census is what decides whether the admission-gate election
    windows must run at all (llm_similarity.load_embeddings_admitted's
    census-then-trust, table-by-table) — on the all-zeros steady state
    every gate stays map-only.

    Scale shape: payload hashes are computed MAP-SIDE inside the scan
    (16 bytes shuffle per row, never payloads); per-id reductions are
    partial-aggregated; the final census is 3 rows. Timestamp and float
    payloads render through the repo's canonical integer/UTC spellings
    so the hash — and therefore the conflict verdict — is engine-exact."""
    out = None
    for tbl, (pk, spark_h, _) in _PAYLOAD.items():
        t = load_table(spark, sf_dir, tbl)
        keyed = t.select(
            F.col(pk).alias("pk"), F.expr(spark_h).alias("h")
        )
        per_id = (
            keyed.filter(F.col("pk").isNotNull())
            .groupBy("pk")
            .agg(
                F.count(F.lit(1)).alias("c"),
                F.countDistinct("h").alias("nh"),
            )
        )
        census = (
            keyed.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("pk").isNull().cast("int")).alias("n_null_pk"),
            )
            .crossJoin(
                F.broadcast(
                    per_id.agg(
                        F.sum((F.col("c") > 1).cast("int")).alias("dups"),
                        F.sum((F.col("nh") > 1).cast("int")).alias("confl"),
                    )
                )
            )
            .select(
                F.lit(tbl).alias("tbl"),
                F.col("n_rows").cast("long"),
                F.col("n_null_pk").cast("long").alias("n_null_pk"),
                F.coalesce(F.col("dups"), F.lit(0)).cast("long")
                .alias("n_dup_keys"),
                F.coalesce(F.col("confl"), F.lit(0)).cast("long")
                .alias("n_conflicting"),
            )
        )
        out = census if out is None else out.unionByName(census)
    return out
