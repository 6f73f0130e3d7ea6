"""Wave 64: regex-over-sequences CEP, positional quality profile.

  * ``events_sequence_regex``: session event sequences encoded as
    letter strings and matched with regular expressions — the
    MATCH_RECOGNIZE / nPath workaround for engines (like Spark) without
    a native row-pattern clause.
  * ``llm_positional_nll_profile``: unigram NLL by relative position
    WITHIN documents — the boilerplate detector (headers/footers score
    differently from body text).

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

CAT_CEP = "2.L event processing"
CAT_TEXT = "2.J llm-pipeline (text)"

# event types encode to one letter each; sessions become strings like
# "vvcp" and CEP patterns become ordinary regexes over them
_ENC_SQL = (
    "CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'"
    " WHEN 'purchase' THEN 'p' WHEN 'error' THEN 'e' ELSE 's' END"
)
# browse-to-buy: one or more views, then a click, then a purchase with
# at most two non-error events between click and purchase
_PATTERN = "v+c[vcs]{0,2}p"


@register(
    "events_sequence_regex",
    CAT_CEP,
    f"""
    WITH gaps AS (
      SELECT user_id, ts, {_ENC_SQL} AS sym,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_session
      FROM events WHERE ts IS NOT NULL
    ),
    sess AS (
      SELECT user_id, ts, sym,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM gaps
    ),
    strings AS (
      SELECT user_id, session_id,
             string_agg(sym, '' ORDER BY ts, sym) AS seq,
             COUNT(*)::BIGINT AS n_events
      FROM sess GROUP BY user_id, session_id
    )
    SELECT
      COUNT(*)::BIGINT AS n_sessions,
      COUNT(*) FILTER (WHERE regexp_matches(seq, '{_PATTERN}'))::BIGINT
        AS n_matched,
      CAST(SUM(CASE WHEN regexp_matches(seq, '{_PATTERN}')
               THEN n_events ELSE 0 END) AS BIGINT) AS matched_events,
      CAST(SUM(length(regexp_extract(seq, '{_PATTERN}'))) AS BIGINT)
        AS total_match_len
    FROM strings
    """,
)
def events_sequence_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-pattern matching without MATCH_RECOGNIZE: sessionize, encode
    each session's ordered event types as a one-letter-per-event string,
    and run the CEP pattern as an ordinary regex ('v+c[vcs]{{0,2}}p' =
    browse, click, purchase within two steps). Counts matched sessions,
    their event volume, and total matched-span length. Regexes over
    encoded sequences express kleene stars, bounded gaps and
    alternations that windowFunnel (events_seq_match) cannot — the
    standard nPath-style workaround for engines without a native
    row-pattern clause. The regex stays POSIX-simple (dialect-portable,
    SURVEY §5.3.6); ties at identical timestamps order by symbol so the
    encoded string is deterministic.

    Scale shape: one user-keyed session window + one string_agg per
    session (bounded by session length), then map-side regex — no joins
    at all. NULL ts dropped on both engines (the r8 NULL-time seam)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w_u = Window.partitionBy("user_id").orderBy("ts")
    gaps = ev.select(
        "user_id",
        "ts",
        F.expr(_ENC_SQL).alias("sym"),
        F.when(
            F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w_u)
            > 1800,
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    sess = gaps.withColumn(
        "session_id",
        F.sum("new_session").over(w_u.rowsBetween(Window.unboundedPreceding, 0)),
    )
    strings = sess.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "sym"))),
                lambda s: s.sym,
            ),
            "",
        ).alias("seq"),
        F.count(F.lit(1)).alias("n_events"),
    )
    matched = F.col("seq").rlike(_PATTERN)
    return strings.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        # COALESCE: the oracle's COUNT FILTER is 0 over an empty corpus
        # where SUM is NULL (empty-corpus census r6)
        F.coalesce(F.sum(matched.cast("int")), F.lit(0))
        .cast("bigint")
        .alias("n_matched"),
        F.sum(F.when(matched, F.col("n_events")).otherwise(0))
        .cast("bigint")
        .alias("matched_events"),
        F.sum(F.length(F.regexp_extract("seq", _PATTERN, 0)))
        .cast("bigint")
        .alias("total_match_len"),
    )


@register(
    "llm_positional_nll_profile",
    CAT_TEXT,
    """
    WITH tok AS (
      SELECT doc_id,
             unnest(string_split(lower(text), ' ')) AS t,
             generate_subscripts(string_split(lower(text), ' '), 1) AS pos,
             length(string_split(lower(text), ' ')) AS n_tok
      FROM documents
    ),
    cnt AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY t),
    tot AS (SELECT SUM(c)::DOUBLE AS n FROM cnt),
    scored AS (
      SELECT LEAST(((tok.pos - 1) * 5) // tok.n_tok, 4) AS pos_band,
             -ln(cnt.c / tot.n) AS nll
      FROM tok JOIN cnt ON cnt.t = tok.t, tot
    )
    SELECT pos_band,
           COUNT(*)::BIGINT AS n_tokens,
           ROUND(AVG(nll), 4) AS avg_nll
    FROM scored GROUP BY pos_band
    """,
)
def llm_positional_nll_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional quality profile: every token scored by unigram NLL
    (the llm_unigram_logprob model), then aggregated by WHERE the token
    sits in its document (five relative-position bands). A flat profile
    means quality is position-independent; elevated NLL at band 0/4
    exposes boilerplate headers/footers or navigation chrome — which a
    document-level mean hides completely, and which chunk-level
    filtering (llm_chunk_overlap) can then excise.

    Scale shape: one token census (vocab-sized, broadcast back), one
    posexplode pass with integer band arithmetic, and a 5-row rollup —
    same cost envelope as the unigram NLL op."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.posexplode(F.split(F.lower("text"), " ")).alias("pos0", "t"),
        F.size(F.split(F.lower("text"), " ")).alias("n_tok"),
    )
    cnt = tok.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.agg(F.sum("c").cast("double").alias("n"))
    scored = (
        tok.join(F.broadcast(cnt), "t")
        .crossJoin(F.broadcast(tot))
        .select(
            F.least(
                F.expr("(pos0 * 5) div n_tok"), F.lit(4)
            ).alias("pos_band"),
            (-F.log(F.col("c").cast("double") / F.col("n"))).alias("nll"),
        )
    )
    return scored.groupBy("pos_band").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.round(F.avg("nll"), 4).alias("avg_nll"),
    )
