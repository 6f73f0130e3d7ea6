"""Wave 53: dedup-method evaluation, chunk stitching, attribution models,
tokenizer sizing curve.

  * ``llm_dedup_method_matrix``: precision/recall of each approximate
    near-dup detector (SimHash Hamming ball, MinHash-LSH) against the
    exact shingle-Jaccard truth set — the evaluation that decides which
    sketch a 100 TB dedup pass can afford to trust.
  * ``llm_chunk_stitch``: suffix→prefix continuation candidates (one
    doc's last 3 tokens = another's first 3) — detects documents split
    mid-stream by a chunking ingester so they can be reassembled before
    training.
  * ``attribution_model_compare``: first/last/linear/U-shaped conversion
    credit per touch type from ONE purchase↔touch pass — the model
    sensitivity table next to ``attribution_last_touch``.
  * ``llm_vocab_coverage_curve``: token-occurrence coverage of the
    top-N global vocabulary for N ∈ {100, 500, 1000, 2000}, per
    language — the curve that sizes a tokenizer vocabulary.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import REGISTRY, register
from ..tables import load_table

# the truth/method pair generators must be registered before their oracle
# SQL can be composed below
from . import llm_dedup  # noqa: F401  (imports register llm_jaccard_pairs &c.)

CAT_TEXT = "2.J llm-pipeline (text)"
CAT_DEDUP = "2.J llm-pipeline (dedup)"
CAT_REP = "2.L reporting"


def _method_stats_sql(name: str, cte: str) -> str:
    # nonneg numerators → §5.3.1b integer half-up shares
    return f"""
    SELECT '{name}' AS method,
           (SELECT COUNT(*) FROM {cte})::BIGINT AS n_pred,
           (SELECT COUNT(*) FROM truth)::BIGINT AS n_truth,
           (SELECT COUNT(*) FROM {cte} m JOIN truth t
              ON t.a_id = m.a_id AND t.b_id = m.b_id)::BIGINT AS tp,
           CAST((2 * (SELECT COUNT(*) FROM {cte} m JOIN truth t
                        ON t.a_id = m.a_id AND t.b_id = m.b_id) * 10000
                 + (SELECT COUNT(*) FROM {cte}))
                // (2 * NULLIF((SELECT COUNT(*) FROM {cte}), 0))
                AS BIGINT) / 10000.0
             AS precision,
           CAST((2 * (SELECT COUNT(*) FROM {cte} m JOIN truth t
                        ON t.a_id = m.a_id AND t.b_id = m.b_id) * 10000
                 + (SELECT COUNT(*) FROM truth))
                // (2 * NULLIF((SELECT COUNT(*) FROM truth), 0))
                AS BIGINT) / 10000.0
             AS recall
    """


_METHOD_MATRIX_ORACLE = f"""
    WITH truth AS (
      SELECT a_id, b_id FROM ({REGISTRY['llm_jaccard_pairs'].oracle})
      WHERE a_id < b_id
    ),
    sim AS (SELECT a_id, b_id FROM ({REGISTRY['llm_simhash_pairs'].oracle})),
    mh AS (SELECT a_id, b_id FROM ({REGISTRY['llm_dedup_near'].oracle}))
    {_method_stats_sql('simhash_ball', 'sim')}
    UNION ALL
    {_method_stats_sql('minhash_lsh', 'mh')}
"""


@register("llm_dedup_method_matrix", CAT_DEDUP, _METHOD_MATRIX_ORACLE)
def llm_dedup_method_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detector evaluation matrix: each approximate near-dup method's
    candidate-pair set scored against the EXACT shingle-Jaccard truth
    (precision = how much verify work the sketch wastes; recall = what
    the dedup pass silently misses). On this corpus the SimHash
    16-bit Hamming ball is high-recall/low-precision (the ball is loose
    at 16 bits) while banded MinHash-LSH with exact verify is exact on
    both axes — precisely the trade a 100 TB dedup has to price, since
    verify cost scales with candidate volume (llm_lsh_candidate_volume).
    Oracles COMPOSE: the three pair generators' registered oracle SQL
    strings are reused as CTEs, so this key can never drift from the
    operators it evaluates.

    Scale shape: each method is its own bucketed pipeline (no all-pairs
    anywhere); the comparison joins are on 16-byte pair keys with the
    truth side orders of magnitude smaller than the corpus."""
    truth = (
        llm_dedup.llm_jaccard_pairs(spark, sf_dir)
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .cache()
    )
    n_truth = truth.count()

    _cached: list[DataFrame] = []

    def stats(name: str, df: DataFrame) -> DataFrame:
        pred = df.select("a_id", "b_id").cache()
        _cached.append(pred)
        n_pred = pred.count()
        tp = pred.join(truth, ["a_id", "b_id"]).count()
        return spark.createDataFrame(
            [(name, n_pred, n_truth, tp)],
            "method string, n_pred long, n_truth long, tp long",
        ).select(
            "method",
            "n_pred",
            "n_truth",
            "tp",
            # NULLIF the denominators: zero predicted/truth pairs (empty
            # corpus) means precision/recall are NULL on both engines
            # rather than an ANSI divide-by-zero error (census r6)
            (
                F.expr(
                    "(2 * tp * 10000 + n_pred) div (2 * NULLIF(n_pred, 0))"
                ).cast("bigint")
                / 10000.0
            ).alias("precision"),
            (
                F.expr(
                    "(2 * tp * 10000 + n_truth) div (2 * NULLIF(n_truth, 0))"
                ).cast("bigint")
                / 10000.0
            ).alias("recall"),
        )

    sim = stats("simhash_ball", llm_dedup.llm_simhash_pairs(spark, sf_dir))
    mh = stats("minhash_lsh", llm_dedup.llm_dedup_near(spark, sf_dir))
    out = sim.unionByName(mh).localCheckpoint()
    # the stat frames are tiny literals once counted — release the cached
    # pair sets immediately (a long-lived session running many operators
    # otherwise accumulates them until the heap dies; observed in the
    # full-registry sf0.1 sweep)
    truth.unpersist()
    for df in _cached:
        df.unpersist()
    return out


_STITCH_K = 3


@register(
    "llm_chunk_stitch",
    CAT_DEDUP,
    f"""
    WITH t AS (
      SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
    ),
    pre AS (
      SELECT doc_id, array_to_string(list_slice(toks, 1, {_STITCH_K}), ' ')
               AS boundary
      FROM t WHERE length(toks) >= {_STITCH_K}
    ),
    suf AS (
      SELECT doc_id, array_to_string(list_slice(toks, -{_STITCH_K}, -1), ' ')
               AS boundary
      FROM t WHERE length(toks) >= {_STITCH_K}
    )
    SELECT s.doc_id AS head_doc, p.doc_id AS tail_doc, s.boundary
    FROM suf s JOIN pre p ON p.boundary = s.boundary
    WHERE s.doc_id != p.doc_id
    """,
)
def llm_chunk_stitch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuation candidates: document pairs where one's last
    {k}-token boundary equals another's first — the signature of a
    single source document split mid-stream by a chunking ingester
    (fixed-size readers, message-size limits). Stitching them back
    before training restores long-range context the split destroyed.

    Scale shape: each doc contributes ONE suffix key and ONE prefix key
    (row-local slices), and the candidate join is a hash equi-join on
    the boundary string — O(matches) output, no similarity search, no
    n². Verified 8 candidate pairs on the synthetic corpus (non-vacuous
    per the llm_template_detect lesson)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split(F.lower("text"), " ").alias("toks")).filter(
        F.size("toks") >= _STITCH_K
    )
    pre = toks.select(
        F.col("doc_id").alias("tail_doc"),
        F.array_join(F.slice("toks", 1, _STITCH_K), " ").alias("boundary"),
    )
    suf = toks.select(
        F.col("doc_id").alias("head_doc"),
        F.array_join(F.slice("toks", -_STITCH_K, _STITCH_K), " ").alias("boundary"),
    )
    return (
        suf.join(pre, "boundary")
        .filter(F.col("head_doc") != F.col("tail_doc"))
        .select("head_doc", "tail_doc", "boundary")
    )


@register(
    "attribution_model_compare",
    CAT_REP,
    """
    WITH purchases AS (
      SELECT user_id, ts AS p_ts, event_id AS p_id FROM events
      WHERE event_type = 'purchase'
    ),
    touches AS (
      SELECT user_id, ts AS t_ts, event_type FROM events
      WHERE event_type != 'purchase'
    ),
    paired AS (
      SELECT p.p_id, t.event_type, t.t_ts,
             COUNT(*) OVER (PARTITION BY p.p_id) AS n,
             ROW_NUMBER() OVER (PARTITION BY p.p_id ORDER BY t.t_ts) AS pos
      FROM purchases p
      JOIN touches t
        ON t.user_id = p.user_id
       AND t.t_ts >= p.p_ts - INTERVAL '24 hours' AND t.t_ts < p.p_ts
    )
    SELECT event_type,
           ROUND(SUM(CASE WHEN pos = 1 THEN 1.0 ELSE 0 END), 4)
             AS first_touch,
           ROUND(SUM(CASE WHEN pos = n THEN 1.0 ELSE 0 END), 4)
             AS last_touch,
           ROUND(SUM(1.0 / n), 4) AS linear,
           ROUND(SUM(CASE
             WHEN n = 1 THEN 1.0
             WHEN n = 2 THEN 0.5
             WHEN pos = 1 OR pos = n THEN 0.4
             ELSE 0.2 / (n - 2) END), 4) AS u_shaped
    FROM paired GROUP BY event_type
    """,
)
def attribution_model_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution model sensitivity: total conversion credit per touch
    type under FOUR standard models (first-touch, last-touch, linear,
    U-shaped 40/20/40) computed from one purchase↔touch pairing — the
    table a marketing review reads to see whether channel ranking is a
    fact or a model artifact. Credits are row-local exact doubles
    (1/n, 0.4, 0.2/(n−2)); only the final sums round.

    Scale shape: the pairing is a per-user time-range join bounded by
    the 24 h window (bucketize to (user, day) equi keys at scale, the
    join_range_bucketized pattern); per-conversion position/count come
    from one window over the bounded pair set, and the output is
    O(touch types)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_id"),
    )
    touches = ev.filter(F.col("event_type") != "purchase").select(
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        "event_type",
    )
    paired = purchases.join(
        touches,
        (F.col("t_user") == F.col("p_user"))
        & (F.col("t_ts") >= F.col("p_ts") - F.expr("INTERVAL 24 HOURS"))
        & (F.col("t_ts") < F.col("p_ts")),
    )
    w = Window.partitionBy("p_id")
    pos = F.row_number().over(w.orderBy("t_ts"))
    paired = paired.select(
        "p_id",
        "event_type",
        pos.alias("pos"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    u_shaped = (
        F.when(F.col("n") == 1, 1.0)
        .when(F.col("n") == 2, 0.5)
        .when((F.col("pos") == 1) | (F.col("pos") == F.col("n")), 0.4)
        .otherwise(0.2 / (F.col("n") - 2))
    )
    return paired.groupBy("event_type").agg(
        F.round(F.sum(F.when(F.col("pos") == 1, 1.0).otherwise(0.0)), 4).alias(
            "first_touch"
        ),
        F.round(
            F.sum(F.when(F.col("pos") == F.col("n"), 1.0).otherwise(0.0)), 4
        ).alias("last_touch"),
        F.round(F.sum(F.lit(1.0) / F.col("n")), 4).alias("linear"),
        F.round(F.sum(u_shaped), 4).alias("u_shaped"),
    )


@register(
    "llm_vocab_coverage_curve",
    CAT_TEXT,
    """
    WITH tok AS (
      SELECT lang, unnest(string_split(lower(text), ' ')) AS t FROM documents
    ),
    vocab AS (
      SELECT t, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, t) AS vrank
      FROM tok GROUP BY t
    ),
    occ AS (
      SELECT tok.lang, v.vrank FROM tok JOIN vocab v ON v.t = tok.t
    )
    SELECT lang, n_vocab,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(SUM(CASE WHEN vrank <= n_vocab THEN 1 ELSE 0 END) AS BIGINT)
             AS covered,
           CAST((2 * SUM(CASE WHEN vrank <= n_vocab THEN 1 ELSE 0 END) * 10000
                 + COUNT(*)) // (2 * COUNT(*)) AS BIGINT) / 10000.0
             AS coverage
    FROM occ, (SELECT unnest([100, 500, 1000, 2000]) AS n_vocab)
    GROUP BY lang, n_vocab
    """,
)
def llm_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer sizing curve: the share of token OCCURRENCES covered by
    the global top-N vocabulary, per language, for N ∈ {100, 500, 1000,
    2000} — where the curve flattens is where additional vocab buys
    nothing (Zipf's law makes the knee sharp; llm_zipf_slope measures
    the exponent, this measures the budget consequence). Deterministic
    vocab ranking (count desc, token asc) and §5.3.1b integer half-up
    shares keep the output hash-exact.

    Scale shape: one token-census shuffle builds the ranked vocab
    (domain-sized, broadcastable), occurrences join it map-side, and
    the threshold grid multiplies groups (langs × 4), not rows."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("lang", F.explode(F.split(F.lower("text"), " ")).alias("t"))
    w = Window.orderBy(F.col("cnt").desc(), F.col("t").asc())
    vocab = (
        tok.groupBy("t")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("t", F.row_number().over(w).alias("vrank"))
    )
    ks = spark.range(1).select(
        F.explode(F.array(*[F.lit(k) for k in (100, 500, 1000, 2000)])).alias(
            "n_vocab"
        )
    )
    occ = tok.join(F.broadcast(vocab), "t").crossJoin(F.broadcast(ks))
    return occ.groupBy("lang", "n_vocab").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
        F.sum(F.when(F.col("vrank") <= F.col("n_vocab"), 1).otherwise(0))
        .cast("bigint")
        .alias("covered"),
        (
            F.expr(
                "(2 * sum(CASE WHEN vrank <= n_vocab THEN 1 ELSE 0 END) * 10000"
                " + count(1)) div (2 * count(1))"
            ).cast("bigint")
            / 10000.0
        ).alias("coverage"),
    )
