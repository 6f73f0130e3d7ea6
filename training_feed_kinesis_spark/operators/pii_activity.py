"""PII masking, ordered string aggregation, binary payload dedup, DAU/WAU.

  * ``fn_mask``: the PII-redaction primitive (upper→X, lower→x, digit→n) —
    a training-data pipeline must ship masked exports; Spark's ``mask`` is
    codegen'd JVM-side. The oracle reproduces it with three character-class
    regexp passes.
  * ``agg_listagg``: ANSI LISTAGG ... WITHIN GROUP (Spark 4) — deterministic
    ordered string concatenation per group (the export/report shape); DuckDB
    spells it string_agg(... ORDER BY).
  * ``multimodal_dedup``: exact dedup over BINARY payloads by content digest
    — the multimodal sibling of ``llm_dedup_exact``: hash the bytes map-side
    (sha2 over BinaryType), aggregate digests, never shuffle payloads. UTF-8
    string bytes hash identically in DuckDB's sha256, so the whole binary
    path is hash-checked.
  * ``events_dau_wau``: DAU / trailing-7-day WAU stickiness. Daily distinct
    actives first (fact-scale agg), then a 7-wide day-range join over the
    tiny (day × daily-active) relation — the window-over-aggregate shape;
    the ratio is rounded via exact BIGINT arithmetic (§5.3 midpoint rule).

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md §0.1);
capability surface reconstructed per SURVEY.md §2 and BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table, release_after

CAT_FN = "2.H scalar functions"
CAT_AGG = "2.D aggregations"
CAT_MM = "2.J llm pipeline"
CAT_WORK = "2.L workloads"


@register(
    "fn_mask",
    CAT_FN,
    """
    SELECT c_custkey,
           regexp_replace(regexp_replace(regexp_replace(
             c_name, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
             AS masked_name,
           regexp_replace(regexp_replace(regexp_replace(
             c_mktsegment, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'),
             '[0-9]', 'n', 'g') AS masked_segment
    FROM customer
    """,
)
def fn_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII masking for data exports: ``mask()`` rewrites upper/lower/digit
    characters to X/x/n while preserving structure (lengths, punctuation)
    — enough to debug formats without seeing identities. JVM codegen'd;
    the oracle applies the equivalent three regexp passes.
    """
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.expr("mask(c_name)").alias("masked_name"),
        F.expr("mask(c_mktsegment)").alias("masked_segment"),
    )


@register(
    "agg_listagg",
    CAT_AGG,
    """
    SELECT n_name,
           string_agg(DISTINCT c_mktsegment, '|' ORDER BY c_mktsegment)
             AS segments,
           COUNT(*)::BIGINT AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI LISTAGG WITHIN GROUP: the distinct market segments present in
    each nation as one ordered, delimited string — the human-readable
    rollup every export wants. Deterministic because the order is part of
    the aggregate; distinct keeps the state bounded by the segment domain.
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.expr(
                "listagg(DISTINCT c_mktsegment, '|')"
                " WITHIN GROUP (ORDER BY c_mktsegment)"
            ).alias("segments"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


@register(
    "multimodal_dedup",
    CAT_MM,
    """
    WITH payloads AS (
      SELECT doc_id, lang,
             sha256(substring(text, 1, 64) || ':' || lang) AS digest
      FROM documents
    )
    SELECT lang,
           COUNT(*)::BIGINT AS n_docs,
           COUNT(DISTINCT digest)::BIGINT AS n_distinct,
           ((COUNT(*) - COUNT(DISTINCT digest)) * 20000 + COUNT(*))
             // (2 * COUNT(*)) / 10000.0 AS dup_ratio
    FROM payloads
    GROUP BY lang
    """,
)
def multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over BINARY payloads: synthesize each doc's opaque blob
    (first-64-chars + lang, cast to BinaryType — standing in for image
    bytes), digest it with sha2-256 MAP-SIDE, and census duplicates per
    language. Only 32-byte digests ever reach the shuffle — the payloads
    stay in the scan stage, which is the entire 100 TB design for binary
    dedup. UTF-8 bytes digest identically in both engines, so even the
    binary path is value-checked. Dup ratio rounds via exact BIGINT
    arithmetic (integer inputs, §5.3 midpoint rule).
    """
    d = load_table(spark, sf_dir, "documents")
    payloads = d.select(
        "doc_id",
        "lang",
        F.sha2(
            F.concat(F.substring("text", 1, 64), F.lit(":"), F.col("lang")).cast(
                "binary"
            ),
            256,
        ).alias("digest"),
    )
    return payloads.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("digest").alias("n_distinct"),
        (
            F.expr(
                "((count(1) - count(DISTINCT digest)) * 20000 + count(1))"
                " div (2 * count(1))"
            )
            / 10000.0
        ).alias("dup_ratio"),
    )


@register(
    "events_dau_wau",
    CAT_WORK,
    """
    WITH daily AS (
      SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
    ),
    days AS (SELECT DISTINCT day FROM daily),
    dau AS (SELECT day, COUNT(*)::BIGINT AS dau FROM daily GROUP BY day),
    wau AS (
      SELECT d.day, COUNT(DISTINCT u.user_id)::BIGINT AS wau
      FROM days d JOIN daily u
        ON u.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
      GROUP BY d.day
    )
    SELECT strftime(dau.day, '%Y-%m-%d') AS day, dau.dau, wau.wau,
           (dau.dau * 20000 + wau.wau) // (2 * wau.wau) / 10000.0
             AS stickiness
    FROM dau JOIN wau ON dau.day = wau.day
    """,
)
def events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU with the stickiness ratio (DAU/WAU). The
    fact table collapses to distinct (day, user) ONCE; the 7-day window
    is then a bounded range join over that tiny relation (day side
    broadcasts, fan-out <= 7) — never a distinct-over-window on raw
    events. Stickiness rounds via exact BIGINT arithmetic.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.select(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    ).distinct()
    # cache + release_after: unpersisted when the returned frame dies
    # (r7 cache-residue class)
    daily = daily.cache()
    days = daily.select("day").distinct()
    dau = daily.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    d = days.alias("d")
    u = daily.alias("u")
    wau = (
        d.join(
            u,
            (F.col("u.day") >= F.col("d.day") - F.expr("INTERVAL 6 DAY"))
            & (F.col("u.day") <= F.col("d.day")),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.count_distinct("u.user_id").alias("wau"))
    )
    return release_after(
        dau.join(wau, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau",
            (F.expr("(dau * 20000 + wau) div (2 * wau)") / 10000.0).alias(
                "stickiness"
            ),
        ),
        daily,
    )
