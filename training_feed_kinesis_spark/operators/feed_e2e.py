"""The end-to-end training-feed build: one operator composing the whole
curation pipeline into the final shard manifest.

quality gate → exact dedup (keeper) → decontamination (8-shingle vs the
held-out split) → temperature-sampled language mixture (α=0.7 rates,
md5-uniform draws) → offset-sharded packing of the survivors.

``llm_curation_waterfall`` proves the FILTER stages compose and reports
counts; this operator carries the surviving documents all the way into
the loader-facing artifact (the shard manifest), adding the mixture draw
and the packing — the full DAG a training-feed build actually ships.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load_table
from .analytics import _SHINGLES8, _W

CAT = "2.J llm-pipeline (text)"

_ALPHA = 0.7
_SHARD_TOK = 4096

# exact hex-fraction uniform (rollups.py idiom): bit-identical across engines
_U_SPARK = (
    "aggregate(transform(sequence(1, 13), "
    "i -> (locate(substr(md5(concat('mix:', cast(doc_id AS string))), i, 1), "
    "'0123456789abcdef') - 1) * power(16.0D, -cast(i AS double))), "
    "0.0D, (a, b) -> a + b)"
)
_U_SQL = (
    "list_sum(list_transform(range(1, 14), "
    "i -> (strpos('0123456789abcdef', "
    "substr(md5('mix:' || doc_id::VARCHAR), i, 1)) - 1) * power(16.0, -i)))"
)


@register(
    "llm_feed_build_e2e",
    CAT,
    f"""
    WITH s0 AS (
      SELECT doc_id, lang, text,
             string_split(lower(text), ' ') AS w,
             substr(md5(doc_id::VARCHAR), 1, 2) < 'd0' AS is_train
      FROM documents
    ),
    s1 AS (  -- quality gate
      SELECT * FROM s0
      WHERE len(w) >= 20
        AND len(list_distinct(w))::DOUBLE / len(w) >= 0.3
    ),
    s2 AS (  -- exact dedup: min-id keeper among quality survivors
      SELECT * FROM s1
      WHERE doc_id IN (SELECT MIN(doc_id) FROM s1
                       GROUP BY md5(lower(trim(text))))
    ),
    sh AS (
      SELECT doc_id, is_train,
             -- explicit element accesses, not array_to_string(w[i:i+7]):
             -- the list slice in the lambda is O(len(w)) per position —
             -- quadratic per doc (r12 payload campaign)
             unnest(list_distinct(list_transform(range(1, len(w) - 6),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
                    w[i+3] || ' ' || w[i+4] || ' ' || w[i+5] || ' ' ||
                    w[i+6] || ' ' || w[i+7]))) AS s
      FROM (SELECT doc_id,
                   substr(md5(doc_id::VARCHAR), 1, 2) < 'd0' AS is_train,
                   string_split(lower(text), ' ') AS w
            FROM documents)
    ),
    contaminated AS (
      SELECT DISTINCT a.doc_id
      FROM sh a JOIN (SELECT DISTINCT s FROM sh WHERE NOT is_train) b
        ON a.s = b.s
      WHERE a.is_train
    ),
    s3 AS (  -- decontaminated training split
      SELECT * FROM s2
      WHERE is_train AND doc_id NOT IN (SELECT doc_id FROM contaminated)
    ),
    rates AS (  -- alpha-temperature language mixture rates
      SELECT lang, pow(n / tot, {_ALPHA}) / z AS p_alpha,
             (pow(n / tot, {_ALPHA}) / z) / (n / tot) AS boost
      FROM (
        SELECT lang, COUNT(*)::DOUBLE AS n,
               SUM(COUNT(*)) OVER ()::DOUBLE AS tot
        FROM s3 GROUP BY lang
      ),
      (SELECT SUM(w_) AS z FROM (
         SELECT pow(COUNT(*)::DOUBLE / SUM(COUNT(*)) OVER (), {_ALPHA}) AS w_
         FROM s3 GROUP BY lang))
    ),
    s4 AS (  -- mixture draw: keep while u < min(boost, 1) (downsample only)
      SELECT s3.doc_id, s3.lang, len(s3.w)::BIGINT AS n_tok
      FROM s3 JOIN rates ON rates.lang = s3.lang
      WHERE {_U_SQL} < LEAST(rates.boost, 1.0)
    ),
    packed AS (
      SELECT doc_id, lang, n_tok,
             COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               // {_SHARD_TOK} AS shard_id
      FROM s4
    )
    SELECT CAST(shard_id AS BIGINT) AS shard_id, COUNT(*)::BIGINT AS n_docs,
           SUM(n_tok)::BIGINT AS shard_tokens,
           COUNT(DISTINCT lang)::BIGINT AS n_langs,
           MIN(doc_id)::BIGINT AS first_doc,
           MAX(doc_id)::BIGINT AS last_doc
    FROM packed GROUP BY shard_id
    """,
)
def llm_feed_build_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full feed build, documents → shard manifest, in one plan:

    1. quality gate (length ≥ 20, TTR ≥ 0.3) — row-local;
    2. exact dedup, min-id keeper — one 16-byte-hash shuffle;
    3. decontamination — drop train docs sharing an 8-shingle with the
       held-out split (shingle-keyed probe, text never shuffles);
    4. α=0.7 temperature mixture — per-language keep rates from the
       SURVIVING corpus, drawn via the exact md5 hex-fraction uniform
       (downsample-only: boost capped at 1);
    5. offset sharding into 4096-token shards in doc order.

    Output: the per-shard manifest (docs, tokens, language spread,
    doc-id span) — the artifact a pretraining loader mounts. Every stage
    is the registered standalone operator's exact logic; this proves the
    COMPOSITION end-to-end under one oracle.

    Scale shape: stage flags ride one scan (no stage re-reads text); the
    three shuffles (dedup hash, shingle probe, final shard cumsum) are
    the known-bounded ones from the component operators; the mixture
    join broadcasts a languages-sized rate table."""
    d = load_table(spark, sf_dir, "documents")
    s0 = d.select(
        "doc_id",
        "lang",
        "text",
        F.expr(_W).alias("w"),
        (F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "d0").alias(
            "is_train"
        ),
    )
    s1 = s0.filter(
        (F.size("w") >= 20)
        & (F.size(F.array_distinct("w")).cast("double") / F.size("w") >= 0.3)
    )
    # Keeper election in-window (min doc_id over the content hash) — the
    # same spelling llm_curation_waterfall uses. One hash-keyed shuffle and
    # NO corpus-sized broadcast (a keeper-set broadcast has one row per
    # distinct surviving text and OOMs the driver at corpus scale).
    wk = Window.partitionBy(F.md5(F.lower(F.trim("text"))))
    s2 = (
        s1.withColumn("keep_id", F.min("doc_id").over(wk))
        .filter(F.col("doc_id") == F.col("keep_id"))
        .drop("keep_id")
    )
    sh = s0.select(
        "doc_id", "is_train", F.explode(F.expr(_SHINGLES8)).alias("s")
    )
    test_sh = sh.filter(~F.col("is_train")).select("s").distinct()
    contaminated = (
        sh.filter(F.col("is_train"))
        .join(test_sh, "s", "left_semi")
        .select("doc_id")
        .distinct()
    )
    # Shuffle anti-join on doc_id — contaminated is corpus-bounded, so it
    # must NOT be broadcast; AQE will still pick broadcast when it is
    # actually small at runtime.
    s3 = (
        s2.filter(F.col("is_train"))
        .join(contaminated, "doc_id", "left_anti")
        .select("doc_id", "lang", F.size("w").cast("long").alias("n_tok"))
    )
    counts = s3.groupBy("lang").agg(F.count(F.lit(1)).cast("double").alias("n"))
    tot = counts.agg(F.sum("n").alias("tot"))
    scaled = counts.crossJoin(F.broadcast(tot)).select(
        "lang",
        (F.col("n") / F.col("tot")).alias("p_raw"),
        F.pow(F.col("n") / F.col("tot"), _ALPHA).alias("w_"),
    )
    z = scaled.agg(F.sum("w_").alias("z"))
    rates = scaled.crossJoin(F.broadcast(z)).select(
        "lang", ((F.col("w_") / F.col("z")) / F.col("p_raw")).alias("boost")
    )
    u = F.expr(_U_SPARK)
    s4 = s3.join(F.broadcast(rates), "lang").filter(
        u < F.least(F.col("boost"), F.lit(1.0))
    )
    w_off = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    packed = s4.select(
        "doc_id",
        "lang",
        "n_tok",
        (F.coalesce(F.sum("n_tok").over(w_off), F.lit(0)) / _SHARD_TOK)
        .cast("long")
        .alias("shard_id"),
    )
    return packed.groupBy("shard_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("shard_tokens"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.min("doc_id").cast("long").alias("first_doc"),
        F.max("doc_id").cast("long").alias("last_doc"),
    )
