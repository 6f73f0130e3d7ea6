"""Wave 24: interpolated bigram LM scoring, contributor caps.

  * ``llm_bigram_interp_nll``: per-document NLL under a Jelinek-Mercer
    interpolated bigram LM (λ·P(w|prev) + (1−λ)·P(w)) — the next rung
    above the unigram proxy: sensitive to word ORDER, so shuffled-token
    spam that fools unigram scoring stands out.
  * ``sample_user_cap``: per-entity contribution cap — at most N events
    per user enter the training set (deterministic earliest-first keep),
    with the before/after concentration report. The anti-dominance guard
    every behavioral training set needs.

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

CAT_TEXT = "2.J llm-pipeline (text)"
CAT_SAMPLE = "2.L sampling"

_LAMBDA = 0.8
_CAP = 50


@register(
    "llm_bigram_interp_nll",
    CAT_TEXT,
    f"""
    WITH canon AS (
      -- one row per doc_id (MIN content-hash keeper): a re-ingested
      -- duplicate row would put TWO tokens at every position of the
      -- doc's LAG window, and the tie interleaving — hence the bigram
      -- multiset — is engine-arbitrary (doc-corruption replay)
      SELECT doc_id, text FROM (
        SELECT doc_id, text,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY md5(text) ASC NULLS LAST) AS rn
        FROM documents
      ) WHERE rn = 1
    ),
    tok AS (
      SELECT doc_id, t, LAG(t) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
      FROM (
        SELECT doc_id, unnest(w) AS t, unnest(range(1, len(w) + 1)) AS pos
        FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
              FROM canon)
      )
    ),
    uni AS (SELECT t, COUNT(*)::DOUBLE AS c FROM tok GROUP BY t),
    n_uni AS (SELECT SUM(c) AS n FROM uni),
    bi AS (SELECT prev, t, COUNT(*)::DOUBLE AS c2 FROM tok
           WHERE prev IS NOT NULL GROUP BY prev, t),
    ctx AS (SELECT prev, SUM(c2) AS cp FROM bi GROUP BY prev)
    SELECT tok.doc_id,
           COUNT(*)::BIGINT AS n_bigrams,
           ROUND(AVG(-ln({_LAMBDA} * bi.c2 / ctx.cp
                         + (1 - {_LAMBDA}) * uni.c / (SELECT n FROM n_uni))),
                 4) AS avg_nll
    FROM tok
    JOIN bi ON bi.prev = tok.prev AND bi.t = tok.t
    JOIN ctx ON ctx.prev = tok.prev
    JOIN uni ON uni.t = tok.t
    WHERE tok.prev IS NOT NULL
    GROUP BY tok.doc_id
    """,
)
def llm_bigram_interp_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document average NLL under the corpus's own Jelinek-Mercer
    bigram LM: P̂(w|prev) = λ·c(prev,w)/c(prev) + (1−λ)·c(w)/N, λ=0.8.
    Word-order sensitivity is the point — token-shuffled spam scores
    near the unigram baseline there but pays heavily here, which is why
    CCNet-style pipelines grade with an n-gram LM rather than unigram
    frequencies.

    Scale shape: the bigram table shuffles on (prev, t) — vocabulary²-
    bounded but sparse (observed bigrams only); context totals and the
    unigram table broadcast back onto the token stream; per-doc
    averaging partial-aggregates. At open-vocabulary scale the LM tables
    get frequency-truncated with an <unk> bucket, same shape."""
    # MIN-content-hash keeper per doc_id — see the oracle's canon CTE
    d = (
        load_table(spark, sf_dir, "documents")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(
                    F.md5("text").asc_nulls_last()
                )
            ),
        )
        .filter(F.col("rn") == 1)
    )
    tok = (
        d.select(
            "doc_id",
            F.posexplode(F.split(F.lower("text"), " ")).alias("pos", "t"),
        )
        .withColumn(
            "prev",
            F.lag("t").over(Window.partitionBy("doc_id").orderBy("pos")),
        )
    )
    uni = tok.groupBy("t").agg(F.count(F.lit(1)).cast("double").alias("c"))
    n_uni = uni.agg(F.sum("c").alias("n"))
    bi = (
        tok.filter(F.col("prev").isNotNull())
        .groupBy("prev", "t")
        .agg(F.count(F.lit(1)).cast("double").alias("c2"))
    )
    ctx = bi.groupBy("prev").agg(F.sum("c2").alias("cp"))
    p = _LAMBDA * F.col("c2") / F.col("cp") + (1 - _LAMBDA) * F.col("c") / F.col(
        "n"
    )
    return (
        tok.filter(F.col("prev").isNotNull())
        .join(F.broadcast(bi), ["prev", "t"])
        .join(F.broadcast(ctx), "prev")
        .join(F.broadcast(uni), "t")
        .crossJoin(F.broadcast(n_uni))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(F.avg(-F.log(p)), 4).alias("avg_nll"),
        )
    )


@register(
    "sample_user_cap",
    CAT_SAMPLE,
    f"""
    WITH ranked AS (
      SELECT user_id, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts ASC, event_id ASC) AS rn
      FROM events
    ),
    kept AS (SELECT user_id FROM ranked WHERE rn <= {_CAP}),
    b2 AS (
      SELECT SUM(cnt) AS n_events, MAX(cnt) AS max_user,
             COUNT(*)::DOUBLE AS n_users
      FROM (SELECT user_id, COUNT(*)::DOUBLE AS cnt
            FROM events GROUP BY user_id)
    ),
    a2 AS (
      SELECT SUM(cnt) AS n_events, MAX(cnt) AS max_user
      FROM (SELECT user_id, COUNT(*)::DOUBLE AS cnt
            FROM kept GROUP BY user_id)
    )
    SELECT 'before' AS stage, b2.n_events::BIGINT AS n_events,
           b2.max_user::BIGINT AS max_user_events,
           ROUND(b2.max_user / b2.n_events, 4) AS top_user_share
    FROM b2
    UNION ALL
    SELECT 'after', a2.n_events::BIGINT, a2.max_user::BIGINT,
           ROUND(a2.max_user / a2.n_events, 4)
    FROM a2
    """,
)
def sample_user_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contributor cap: each user contributes at most 50 events
    (earliest-first, deterministic (ts, event_id) order) — the
    anti-dominance guard that stops one hot entity from owning the
    training distribution. Reports events, max per-user contribution and
    top-user share before/after the cap.

    Scale shape: one rank window per user applies the cap; both report
    rows come from user-level aggregates (map-combinable). The same
    spelling caps documents per domain or images per album."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    kept = ev.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= _CAP
    )

    def stage(df: DataFrame, name: str) -> DataFrame:
        per = df.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("double").alias("cnt")
        )
        return per.agg(
            F.sum("cnt").cast("long").alias("n_events"),
            F.max("cnt").cast("long").alias("max_user_events"),
            F.round(F.max("cnt") / F.sum("cnt"), 4).alias("top_user_share"),
        ).select(F.lit(name).alias("stage"), "*")

    return stage(ev, "before").unionByName(stage(kept, "after"))
