"""Sketch-based frequency estimation + curation-wave-4 operators.

  * ``agg_countmin``: Count-Min sketch (Cormode & Muthukrishnan 2005) over
    the event feed's user frequencies — bounded-memory heavy-hitter
    estimation with the one-sided (over-)estimate guarantee surfaced next
    to exact counts.
  * ``llm_dsir_weight``: hashed-unigram importance weights (the DSIR
    scheme, Xie et al. 2023 "Data Selection for Language Models via
    Importance Resampling"): per-document log-likelihood ratio between a
    target-domain feature distribution and the raw-corpus distribution.
  * ``llm_tokenizer_fertility``: subword-ish regex token count vs
    whitespace word count per language — the tokenizer-fertility audit
    that decides whether a tokenizer is usable for a language slice.
  * ``llm_minhash_est_error``: MinHash Jaccard ESTIMATE (matching
    signature components / k) vs exact shingle Jaccard on the LSH
    candidate pairs, bucketed by true similarity — the accuracy eval that
    keeps the sketch honest, same spirit as llm_ann_recall for ANN.
  * ``stream_topk_windowed``: hourly tumbling-window top-3 event types —
    windowed aggregation drained from a replayed stream, then ranked.

All hashing is md5-derived ⇒ deterministic and engine-portable, so every
batch operator here carries a full SQL oracle (SURVEY.md §5.3 discipline).

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load_table, release_after, sane_ts
from .llm_dedup import (
    _MINHASH_SQL,
    _SHINGLE_ROWS_SQL,
    _TOK,
    BAND_SIZE,
    N_SEEDS,
)

CAT_AGG = "2.D aggregations"
CAT_TEXT = "2.J llm-pipeline (text)"
CAT_DEDUP = "2.J llm-pipeline (dedup)"
CAT_STREAM = "2.I streaming"

# --- Count-Min sketch ------------------------------------------------------

_CM_DEPTH = 4    # independent hash rows
# width 256 = one hex byte of md5 ⇒ the cell id is simply the first two hex
# chars of md5(depth:key) — no hex→int conversion needed on either engine
_TOP = 20


@register(
    "agg_countmin",
    CAT_AGG,
    f"""
    WITH ev AS (SELECT user_id FROM events),
    dd AS (SELECT unnest(range(0, {_CM_DEPTH})) AS d),
    cells AS (
      SELECT dd.d,
             substr(md5(dd.d::VARCHAR || ':' || ev.user_id::VARCHAR), 1, 2)
               AS cell
      FROM ev CROSS JOIN dd
    ),
    sketch AS (
      SELECT d, cell, COUNT(*)::BIGINT AS cnt FROM cells GROUP BY d, cell
    ),
    exact AS (
      SELECT user_id, COUNT(*)::BIGINT AS n_exact FROM ev GROUP BY user_id
    ),
    probe AS (
      SELECT e.user_id, e.n_exact, dd.d,
             substr(md5(dd.d::VARCHAR || ':' || e.user_id::VARCHAR), 1, 2)
               AS cell
      FROM exact e CROSS JOIN dd
    ),
    est AS (
      SELECT p.user_id, p.n_exact, MIN(s.cnt)::BIGINT AS n_cm
      FROM probe p JOIN sketch s ON s.d = p.d AND s.cell = p.cell
      GROUP BY p.user_id, p.n_exact
    )
    SELECT user_id, n_exact, n_cm, (n_cm - n_exact)::BIGINT AS overest
    FROM est
    ORDER BY n_exact DESC, user_id ASC
    LIMIT {_TOP}
    """,
)
def agg_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch frequency estimation: 4 hash rows × 256 cells
    (cell id = first md5 hex byte of ``depth:key``), point estimate =
    min over rows, reported for the top-20 true-heaviest users with the
    sketch's signature one-sided error (``overest >= 0`` always).

    Scale shape: the sketch is FIXED SIZE (1024 cells) regardless of key
    cardinality — the groupBy collapses map-side into at most
    depth×width partial rows per task, and the finished sketch
    broadcasts back onto the probe side. This is the bounded-memory
    alternative to exact groupBy counting when the key space (URLs,
    n-grams) no longer fits a shuffle; the exact side here exists to
    measure the sketch, and is itself the baseline answer."""
    ev = load_table(spark, sf_dir, "events").select("user_id")
    dd = F.explode(F.sequence(F.lit(0), F.lit(_CM_DEPTH - 1))).alias("d")

    def cell(d_col, key_col):
        return F.substring(
            F.md5(F.concat(d_col.cast("string"), F.lit(":"), key_col.cast("string"))),
            1,
            2,
        )

    sketch = (
        ev.select("user_id", dd)
        .select("d", cell(F.col("d"), F.col("user_id")).alias("cell"))
        .groupBy("d", "cell")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    exact = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact")
    )
    probe = exact.select("user_id", "n_exact", dd).select(
        "user_id", "n_exact", "d", cell(F.col("d"), F.col("user_id")).alias("cell")
    )
    est = (
        probe.join(F.broadcast(sketch), ["d", "cell"])
        .groupBy("user_id", "n_exact")
        .agg(F.min("cnt").cast("long").alias("n_cm"))
    )
    return (
        est.select(
            "user_id",
            "n_exact",
            "n_cm",
            (F.col("n_cm") - F.col("n_exact")).cast("long").alias("overest"),
        )
        .orderBy(F.col("n_exact").desc(), F.col("user_id").asc())
        .limit(_TOP)
    )


# --- DSIR hashed-unigram importance weights --------------------------------

# 256 hashed feature buckets (first md5 hex byte of the token), add-one
# smoothing on both distributions. Target domain := English documents.
_DSIR_B = 256


@register(
    "llm_dsir_weight",
    CAT_TEXT,
    f"""
    WITH tok AS (
      SELECT doc_id, lang, substr(md5(t), 1, 2) AS b
      FROM (SELECT doc_id, lang,
                   unnest(string_split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ')) AS t
            FROM documents)
    ),
    tgt AS (SELECT b, COUNT(*)::DOUBLE AS c FROM tok WHERE lang = 'en'
            GROUP BY b),
    raw AS (SELECT b, COUNT(*)::DOUBLE AS c FROM tok GROUP BY b),
    nt AS (SELECT SUM(c) AS n FROM tgt),
    nr AS (SELECT SUM(c) AS n FROM raw),
    lr AS (
      SELECT r.b,
             CAST(ROUND((ln((COALESCE(t.c, 0) + 1)
                            / ((SELECT n FROM nt) + {_DSIR_B}))
                         - ln((r.c + 1)
                              / ((SELECT n FROM nr) + {_DSIR_B}))) * 1e6,
                        0) AS BIGINT) AS llr_u
      FROM raw r LEFT JOIN tgt t ON t.b = r.b
    ),
    agg AS (
      SELECT tok.doc_id,
             SUM(CAST(lr.llr_u AS BIGINT)) AS s,
             COUNT(*)::BIGINT AS c
      FROM tok JOIN lr ON lr.b = tok.b
      GROUP BY tok.doc_id
    )
    SELECT doc_id,
           ((CASE WHEN s < 0 THEN -1 ELSE 1 END)
            * ((2 * abs(s) + c * 100) // (2 * c * 100))) / 10000.0
             AS dsir_weight,
           c AS n_tokens
    FROM agg
    """,
)
def llm_dsir_weight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weight per document: average hashed-unigram
    log-likelihood ratio log p_target(b) − log p_raw(b), target = the
    English slice, features = 256 md5 buckets with add-one smoothing.
    High weight ⇒ the document looks like the target domain; resampling
    by these weights is the DSIR data-selection step.

    Order-free arithmetic: each bucket's llr is quantized ONCE to integer
    micro-units (256 fixed BIGINTs), so the per-doc aggregate is an exact
    integer SUM — immune to float accumulation order. The r8 driver run
    proved the AVG(double) spelling flips the 4th decimal on knife-edge
    docs depending on partition order (CORRECTNESS_r08: rows/schema match,
    hash mismatch; same query MATCHes locally — run-dependent, the
    float-sum-order class from the round-8 NULL-time campaign).

    Scale shape: both feature distributions are FIXED 256-row tables —
    they aggregate map-side and broadcast back onto the token stream; the
    only real shuffle is the per-doc average (partial-aggregated). This
    is the whole point of hashed features: the state is O(buckets), not
    O(vocabulary), at any corpus size."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", "lang", F.explode(F.expr(_TOK)).alias("t")
    ).select("doc_id", "lang", F.substring(F.md5("t"), 1, 2).alias("b"))
    tgt = (
        tok.filter(F.col("lang") == "en")
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("double").alias("ct"))
    )
    raw = tok.groupBy("b").agg(F.count(F.lit(1)).cast("double").alias("cr"))
    nt = tgt.agg(F.sum("ct").alias("nt"))
    nr = raw.agg(F.sum("cr").alias("nr"))
    lr = (
        raw.join(tgt, "b", "left")
        .crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(nr))
        .select(
            "b",
            F.round(
                (
                    F.log(
                        (F.coalesce(F.col("ct"), F.lit(0.0)) + 1)
                        / (F.col("nt") + F.lit(float(_DSIR_B)))
                    )
                    - F.log(
                        (F.col("cr") + 1) / (F.col("nr") + F.lit(float(_DSIR_B)))
                    )
                )
                * F.lit(1e6),
                0,
            )
            .cast("long")
            .alias("llr_u"),
        )
    )
    agg = (
        tok.join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("llr_u").alias("s"),
            F.count(F.lit(1)).cast("long").alias("c"),
        )
    )
    # Final representation stays integer-exact too (r13, VERDICT r12 item
    # 1): ROUND(s/c/1e6, 4) as a DOUBLE op flipped a signed zero between
    # engines (driver red cell on doc 422 at sf0.01 — Spark's
    # BigDecimal-HALF_UP gives +0.0 where DuckDB's C round gives -0.0).
    # Instead, the half-away-from-zero rounding to 4 dp is computed in
    # exact BIGINT arithmetic (q = sign(s)*((2|s| + c*100) div (2*c*100)),
    # identical on both engines), and the ONE float op left is q/10000.0 —
    # a correctly-rounded IEEE division of identical integers, so the
    # result is bit-identical across engines and can never be -0.0.
    q = F.when(F.col("s") < 0, F.lit(-1).cast("long")).otherwise(
        F.lit(1).cast("long")
    ) * F.expr("(2 * abs(s) + c * 100) div (2 * c * 100)")
    return agg.select(
        "doc_id",
        (q / F.lit(10000.0)).alias("dsir_weight"),
        F.col("c").alias("n_tokens"),
    )


# --- tokenizer fertility ---------------------------------------------------

# POSIX-simple subword-ish lexer: letter runs, digit runs, single symbols.
# Identical semantics in Java regex (Spark) and RE2-ish (DuckDB).
_LEX = "[a-z]+|[0-9]+|[^a-z0-9 ]"


@register(
    "llm_tokenizer_fertility",
    CAT_TEXT,
    f"""
    WITH per_doc AS (
      SELECT lang,
             len(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '{_LEX}'))::DOUBLE AS n_sub,
             len(string_split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' '))::DOUBLE AS n_words
      FROM documents
      WHERE len(string_split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ')) > 0
    )
    SELECT lang,
           COUNT(*)::BIGINT AS n_docs,
           ROUND(AVG(n_sub / n_words), 4) AS avg_fertility,
           ROUND(MAX(n_sub / n_words), 4) AS max_fertility
    FROM per_doc GROUP BY lang
    """,
)
def llm_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: subword-ish tokens (letter runs /
    digit runs / single symbols) divided by whitespace words, averaged per
    language slice. Fertility ≫ 1 flags languages the tokenizer
    fragments — the standard audit before committing a tokenizer to a
    multilingual corpus.

    Scale shape: the lexer is a row-local regexp_extract_all (no explode —
    only the COUNT of matches is needed, never the match rows), then a
    language-cardinality aggregate that partial-aggregates map-side."""
    d = load_table(spark, sf_dir, "documents")
    per = d.select(
        "lang",
        F.size(F.expr(f"regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '{_LEX}', 0)"))
        .cast("double")
        .alias("n_sub"),
        F.size(F.expr(_TOK)).cast("double").alias("n_words"),
    ).filter(F.col("n_words") > 0)
    f = F.col("n_sub") / F.col("n_words")
    return per.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(F.avg(f), 4).alias("avg_fertility"),
        F.round(F.max(f), 4).alias("max_fertility"),
    )


# --- MinHash estimate accuracy ---------------------------------------------


@register(
    "llm_minhash_est_error",
    CAT_DEDUP,
    f"""
    WITH sigs AS ({_MINHASH_SQL}),
    bands AS (
      SELECT doc_id, seed // {BAND_SIZE} AS band,
             md5((seed // {BAND_SIZE})::VARCHAR || ':' ||
                 MIN(minhash) || '|' || MAX(minhash)) AS band_sig
      FROM sigs GROUP BY doc_id, seed // {BAND_SIZE}
    ),
    cands AS (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
    ),
    est AS (
      SELECT c.a_id, c.b_id,
             SUM(CASE WHEN sa.minhash = sb.minhash THEN 1 ELSE 0 END)
               / {N_SEEDS}.0 AS est_j
      FROM cands c
      JOIN sigs sa ON sa.doc_id = c.a_id
      JOIN sigs sb ON sb.doc_id = c.b_id AND sb.seed = sa.seed
      GROUP BY c.a_id, c.b_id
    ),
    sh AS ({_SHINGLE_ROWS_SQL}),
    counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT c.a_id, c.b_id, COUNT(*)::DOUBLE AS i
      FROM cands c
      JOIN sh sa ON sa.doc_id = c.a_id
      JOIN sh sb ON sb.doc_id = c.b_id AND sb.sh = sa.sh
      GROUP BY c.a_id, c.b_id
    ),
    pairs AS (
      SELECT e.a_id, e.b_id, e.est_j,
             COALESCE(i.i, 0) / (ca.n + cb.n - COALESCE(i.i, 0)) AS true_j
      FROM est e
      LEFT JOIN inter i ON i.a_id = e.a_id AND i.b_id = e.b_id
      JOIN counts ca ON ca.doc_id = e.a_id
      JOIN counts cb ON cb.doc_id = e.b_id
    )
    SELECT LEAST(FLOOR(true_j * 10), 9)::BIGINT AS bin10,
           COUNT(*)::BIGINT AS n_pairs,
           ROUND(AVG(ABS(est_j - true_j)), 4) AS mae
    FROM pairs GROUP BY 1
    """,
)
def llm_minhash_est_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash accuracy eval on the LSH candidate pairs: the sketch's
    Jaccard estimate (matching components / k) against exact shingle
    Jaccard, mean-absolute-error per true-similarity decile. The companion
    eval to ``llm_ann_recall``: recall keeps the CANDIDATE GENERATOR
    honest, this keeps the ESTIMATOR honest (k=8 is deliberately small —
    the eval shows exactly how coarse it is).

    Scale shape: candidates are LSH-bounded (never n²); signatures join
    per-pair on (doc, seed) — 8 tiny rows per doc; exact Jaccard reuses
    the shared-shingle intersect count. The decile aggregate is 10 rows."""
    from .llm_dedup import _band_sigs, _minhash_sigs, _shingle_counts, _shingle_rows

    bands = _band_sigs(spark, sf_dir)
    a = bands.select(F.col("doc_id").alias("a_id"), "band", "band_sig")
    b = bands.select(F.col("doc_id").alias("b_id"), "band", "band_sig")
    cands = (
        a.join(b, ["band", "band_sig"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
        # cache + release_after: unpersisted when the returned frame dies
        # (r7 cache-residue class)
        .cache()
    )
    sigs = _minhash_sigs(spark, sf_dir)
    sa = sigs.select(F.col("doc_id").alias("a_id"), "seed", F.col("minhash").alias("ma"))
    sb = sigs.select(F.col("doc_id").alias("b_id"), "seed", F.col("minhash").alias("mb"))
    est = (
        cands.join(sa, "a_id")
        .join(sb, ["b_id", "seed"])
        .groupBy("a_id", "b_id")
        .agg(
            (
                F.sum(F.when(F.col("ma") == F.col("mb"), 1).otherwise(0))
                / float(N_SEEDS)
            ).alias("est_j")
        )
    )
    sh = _shingle_rows(spark, sf_dir)
    sha = sh.select(F.col("doc_id").alias("a_id"), "sh")
    shb = sh.select(F.col("doc_id").alias("b_id"), "sh")
    inter = (
        cands.join(sha, "a_id")
        .join(shb, ["b_id", "sh"])
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).cast("double").alias("i"))
    )
    counts = _shingle_counts(spark, sf_dir)
    ca = counts.select(F.col("doc_id").alias("a_id"), F.col("n").alias("na"))
    cb = counts.select(F.col("doc_id").alias("b_id"), F.col("n").alias("nb"))
    true_j = F.coalesce(F.col("i"), F.lit(0.0)) / (
        F.col("na") + F.col("nb") - F.coalesce(F.col("i"), F.lit(0.0))
    )
    pairs = (
        est.join(inter, ["a_id", "b_id"], "left")
        .join(ca, "a_id")
        .join(cb, "b_id")
        .select("est_j", true_j.alias("true_j"))
    )
    return release_after(
        pairs.groupBy(
            F.least(F.floor(F.col("true_j") * 10), F.lit(9))
            .cast("long")
            .alias("bin10")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.round(F.avg(F.abs(F.col("est_j") - F.col("true_j"))), 4).alias(
                "mae"
            ),
        ),
        cands,
    )


# --- windowed streaming top-k ----------------------------------------------


@register(
    "stream_topk_windowed",
    CAT_STREAM,
    """
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS hour_start, event_type,
             COUNT(*) AS n
      FROM events WHERE ts IS NOT NULL AND (ts IS NULL OR (ts >= TIMESTAMP '1970-01-01' AND ts < TIMESTAMP '2200-01-01')) GROUP BY 1, 2
    ),
    ranked AS (
      SELECT hour_start, event_type, n,
             row_number() OVER (PARTITION BY hour_start
                                ORDER BY n DESC, event_type ASC) AS rk
      FROM hourly
    )
    SELECT hour_start, event_type, n, rk FROM ranked WHERE rk <= 3
    """,
)
def stream_topk_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 event types per tumbling hour over a replayed stream: the
    windowed count is the streaming stateful operator (watermarked,
    complete-mode drain); the rank is a batch window over the drained
    result — the standard two-layer spelling, since rank-over-updating-
    aggregates isn't expressible inside a streaming query.

    At scale the drain becomes a foreachBatch sink into a serving store
    and the top-k runs there per refresh; state is bounded by
    (windows in watermark horizon) × (event-type cardinality)."""
    from ..streaming.replay import drain, replay_stream

    # NULL event-time rows dropped on both engines (r8 NULL-time seam)
    stream = replay_stream(spark, sf_dir, "ordered").filter(
        F.col("ts").isNotNull() & sane_ts("ts")  # temporal admission (r12)
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    res = drain(agg, "complete")
    w = Window.partitionBy("hour_start").orderBy(
        F.col("n").desc(), F.col("event_type").asc()
    )
    return (
        res.select(F.col("window.start").alias("hour_start"), "event_type", "n")
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
    )
