"""Wave 67: binary sign-hash vector search, Markov absorption.

  * ``vec_binary_sign_search``: embeddings binarized to 64 sign bits
    packed in two 32-bit words; nearest neighbors by Hamming distance
    (popcount of XOR) with per-probe agreement against the exact cosine
    top-k — the 1-bit quantization end of the compression spectrum
    (float32 → PQ bytes → sign bits).
  * ``events_markov_absorption``: probability of reaching 'purchase'
    within 3 steps from each starting event type, by unrolled powers of
    the empirical transition matrix.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from .llm_similarity import VEC_ADMIT_SQL, load_embeddings_admitted
from ..tables import load_table

CAT_VEC = "2.J llm-pipeline (similarity)"
CAT_CEP = "2.L event processing"

_N_PROBES = 10
_TOPK = 5


@register(
    "vec_binary_sign_search",
    CAT_VEC,
    f"""
    WITH {VEC_ADMIT_SQL},
    sig AS (
      SELECT vec_id,
             -- two 32-bit sign words (a 63-bit shift overflows BIGINT in
             -- one engine and wraps in the other; <=31 is safe in both)
             list_sum(list_transform(range(1, 33), i ->
               CASE WHEN CAST(embedding[i] AS DOUBLE) > 0
                    THEN 1::BIGINT << (i - 1) ELSE 0 END)) AS lo,
             list_sum(list_transform(range(33, 65), i ->
               CASE WHEN CAST(embedding[i] AS DOUBLE) > 0
                    THEN 1::BIGINT << (i - 33) ELSE 0 END)) AS hi,
             list_transform(embedding, x ->
               CAST(ROUND(CAST(x AS DOUBLE) * 10000, 0) AS BIGINT)) AS vq
      FROM embeddings_adm
    ),
    pairs AS (
      SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
             bit_count(xor(p.lo, c.lo)) + bit_count(xor(p.hi, c.hi))
               AS hamming,
             list_sum(list_transform(range(1, 65), i ->
               (p.vq[i] - c.vq[i]) * (p.vq[i] - c.vq[i]))) AS d2
      FROM sig p JOIN sig c ON p.vec_id != c.vec_id
      WHERE p.vec_id < {_N_PROBES}
    ),
    hb AS (
      SELECT probe_id, cand_id,
             ROW_NUMBER() OVER (PARTITION BY probe_id
                                ORDER BY hamming, cand_id) AS hr
      FROM pairs
    ),
    eb AS (
      SELECT probe_id, cand_id,
             ROW_NUMBER() OVER (PARTITION BY probe_id
                                ORDER BY d2, cand_id) AS er
      FROM pairs
    )
    SELECT h.probe_id,
           COUNT(*) FILTER (WHERE e.er IS NOT NULL)::BIGINT AS overlap_at_k,
           {_TOPK}::BIGINT AS k
    FROM (SELECT * FROM hb WHERE hr <= {_TOPK}) h
    LEFT JOIN (SELECT * FROM eb WHERE er <= {_TOPK}) e
      ON e.probe_id = h.probe_id AND e.cand_id = h.cand_id
    GROUP BY h.probe_id
    """,
)
def vec_binary_sign_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-bit vector search: each 64-dim embedding collapses to its SIGN
    BITS packed into two 32-bit words (64 bytes → 8 — the extreme end of
    the compression ladder after PQ), and neighbor candidates rank by
    Hamming distance = popcount(xor) — one CPU instruction per pair.
    Per probe, the report is the overlap between the Hamming top-5 and
    the exact (integer-quantized L2) top-5: the recall a sign-hash
    prefilter would deliver before exact re-ranking. Everything is
    integer (bit packing, popcounts, quantized d²), so both engines
    rank identically.

    Scale shape: the probe panel is fixed ({_N_PROBES}); candidates scan
    the corpus once per probe batch, map-side; at corpus scale the sign
    words ARE the index — group by a bit-prefix for sub-linear probing,
    or feed them to the LSH band machinery unchanged."""
    em = load_embeddings_admitted(spark, sf_dir)
    sig = em.select(
        "vec_id",
        F.expr(
            "aggregate(zip_with(slice(embedding, 1, 32), sequence(0, 31),"
            " (x, i) -> IF(cast(x AS double) > 0, shiftleft(1L, i), 0L)),"
            " 0L, (acc, v) -> acc + v)"
        ).alias("lo"),
        F.expr(
            "aggregate(zip_with(slice(embedding, 33, 32), sequence(0, 31),"
            " (x, i) -> IF(cast(x AS double) > 0, shiftleft(1L, i), 0L)),"
            " 0L, (acc, v) -> acc + v)"
        ).alias("hi"),
        F.expr(
            "transform(embedding, x -> cast(round(cast(x AS double) * 10000, 0)"
            " AS bigint))"
        ).alias("vq"),
    ).localCheckpoint()
    p = sig.filter(F.col("vec_id") < _N_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("lo").alias("p_lo"),
        F.col("hi").alias("p_hi"),
        F.col("vq").alias("p_vq"),
    )
    c = sig.select(
        F.col("vec_id").alias("cand_id"),
        F.col("lo").alias("c_lo"),
        F.col("hi").alias("c_hi"),
        F.col("vq").alias("c_vq"),
    )
    d2 = F.expr(
        "aggregate(zip_with(p_vq, c_vq, (a, b) -> (a - b) * (a - b)),"
        " 0L, (acc, x) -> acc + x)"
    )
    pairs = (
        F.broadcast(p)
        .join(c, F.col("probe_id") != F.col("cand_id"))
        .select(
            "probe_id",
            "cand_id",
            (
                F.bit_count(F.col("p_lo").bitwiseXOR(F.col("c_lo")))
                + F.bit_count(F.col("p_hi").bitwiseXOR(F.col("c_hi")))
            ).alias("hamming"),
            d2.alias("d2"),
        )
    )
    w_h = Window.partitionBy("probe_id").orderBy("hamming", "cand_id")
    w_e = Window.partitionBy("probe_id").orderBy("d2", "cand_id")
    ranked = pairs.select(
        "probe_id",
        "cand_id",
        F.row_number().over(w_h).alias("hr"),
        F.row_number().over(w_e).alias("er"),
    )
    hb = ranked.filter(F.col("hr") <= _TOPK).select("probe_id", "cand_id")
    eb = ranked.filter(F.col("er") <= _TOPK).select(
        F.col("probe_id").alias("e_pid"), F.col("cand_id").alias("e_cid")
    )
    joined = hb.join(
        eb,
        (F.col("probe_id") == F.col("e_pid")) & (F.col("cand_id") == F.col("e_cid")),
        "left",
    )
    return joined.groupBy("probe_id").agg(
        F.sum(F.when(F.col("e_pid").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("overlap_at_k"),
        F.lit(_TOPK).cast("bigint").alias("k"),
    )


@register(
    "events_markov_absorption",
    CAT_CEP,
    """
    WITH trans AS (
      SELECT cur, nxt, COUNT(*)::DOUBLE AS c FROM (
        SELECT user_id, event_type AS cur,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
        FROM events WHERE ts IS NOT NULL)
      WHERE nxt IS NOT NULL GROUP BY cur, nxt
    ),
    p AS (
      SELECT cur, nxt, c / SUM(c) OVER (PARTITION BY cur) AS pr FROM trans
    ),
    -- absorbing chain: q1 = P(next is purchase); q2/q3 add paths through
    -- non-purchase intermediates
    q1 AS (
      SELECT cur, SUM(CASE WHEN nxt = 'purchase' THEN pr ELSE 0 END) AS q
      FROM p GROUP BY cur
    ),
    q2 AS (
      SELECT a.cur,
             q1a.q + SUM(a.pr * q1b.q) AS q
      FROM p a
      JOIN q1 q1a ON q1a.cur = a.cur
      JOIN q1 q1b ON q1b.cur = a.nxt
      WHERE a.nxt != 'purchase'
      GROUP BY a.cur, q1a.q
    ),
    q3 AS (
      SELECT a.cur,
             q1a.q + SUM(a.pr * q2b.q) AS q
      FROM p a
      JOIN q1 q1a ON q1a.cur = a.cur
      JOIN q2 q2b ON q2b.cur = a.nxt
      WHERE a.nxt != 'purchase'
      GROUP BY a.cur, q1a.q
    )
    SELECT q1.cur AS start_type,
           ROUND(q1.q, 4) AS p_within_1,
           ROUND(q2.q, 4) AS p_within_2,
           ROUND(q3.q, 4) AS p_within_3
    FROM q1 JOIN q2 ON q2.cur = q1.cur JOIN q3 ON q3.cur = q1.cur
    """,
)
def events_markov_absorption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Absorption probability into 'purchase' within 1, 2, and 3 steps
    from each starting event type, under the empirical first-order chain
    (events_markov's matrix treated as an absorbing chain): q₁ = direct
    transition mass, qₖ = q₁ + Σ_{non-purchase j} P(j)·qₖ₋₁(j) — the
    unrolled power iteration that turns a transition matrix into the
    funnel question product asks ("how far from money is each state?").

    Scale shape: the chain is DOMAIN-sized (5×5) after one window pass
    over the fact table — every subsequent join touches ≤25 rows; the
    iterate-on-aggregates discipline again. NULL ts dropped on both
    engines (the r8 NULL-time seam)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", F.col("event_id").asc_nulls_last())
    steps = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    trans = steps.groupBy("cur", "nxt").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    p = trans.withColumn(
        "pr", F.col("c") / F.sum("c").over(Window.partitionBy("cur"))
    ).select("cur", "nxt", "pr").localCheckpoint()
    q1 = p.groupBy("cur").agg(
        F.sum(F.when(F.col("nxt") == "purchase", F.col("pr")).otherwise(0.0)).alias(
            "q"
        )
    ).localCheckpoint()

    def step(prev: DataFrame) -> DataFrame:
        pb = prev.select(F.col("cur").alias("nxt"), F.col("q").alias("q_next"))
        return (
            p.filter(F.col("nxt") != "purchase")
            .join(pb, "nxt")
            .groupBy("cur")
            .agg(F.sum(F.col("pr") * F.col("q_next")).alias("q_ind"))
            .join(q1.select("cur", F.col("q").alias("q_dir")), "cur")
            .select("cur", (F.col("q_dir") + F.col("q_ind")).alias("q"))
            .localCheckpoint()
        )

    q2 = step(q1)
    q3 = step(q2)
    return (
        q1.select("cur", F.col("q").alias("p1"))
        .join(q2.select("cur", F.col("q").alias("p2")), "cur")
        .join(q3.select("cur", F.col("q").alias("p3")), "cur")
        .select(
            F.col("cur").alias("start_type"),
            F.round("p1", 4).alias("p_within_1"),
            F.round("p2", 4).alias("p_within_2"),
            F.round("p3", 4).alias("p_within_3"),
        )
    )
