"""Training-feed assembly operators: sequence packing, event-path mining,
the adapted TPC-H Q12 shape, and two modern-SQL surface idioms.

  * ``llm_pack_chunks``: concat-then-chunk sequence packing — the GPT-style
    pretraining batcher. Documents are laid end-to-end in doc_id order via a
    running token offset, then every fixed 512-token block reports which
    docs cover it and how many tokens each contributes. Pure window-cumsum +
    ``sequence``/``explode`` — no UDF, no driver loop.
  * ``events_path_topk``: top-10 most common first-5-event paths per user —
    n-gram behavioural path mining with full tiebreak determinism.
  * ``q12_shipmode_priority``: TPC-H Q12 adapted to this schema (no
    l_shipmode/commitdate — linestatus stands in for mode, "late" =
    shipped >90 days after order date).
  * ``sql_group_by_all`` / ``sql_distinct_on``: GROUP BY ALL (Spark 3.4+/
    DuckDB) and DISTINCT ON-equivalent latest-row-per-key (row_number on
    Spark, native DISTINCT ON in the DuckDB oracle).

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md §0.1);
capability surface reconstructed per SURVEY.md §2 and BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load_table

CAT_LLM = "2.J llm pipeline"
CAT_WL = "2.M workloads"
CAT_ES = "2.L engine surface"

_BLOCK = 512  # tokens per packed training block


@register(
    "llm_pack_chunks",
    CAT_LLM,
    f"""
    WITH d AS (
      SELECT doc_id, len(string_split(text, ' '))::BIGINT AS tok,
             md5(text) AS h
      FROM documents
    ),
    c AS (
      -- explicit ROWS frame: the bare OVER (ORDER BY ...) default is
      -- RANGE, which folds ORDER-BY PEERS into the running sum — under
      -- a re-ingested duplicate doc_id both copies got the same offset
      -- on one engine only (doc-corruption replay); the content-hash
      -- tiebreak makes the pack order total even under conflicting
      -- re-ingest
      SELECT doc_id, tok,
             (SUM(tok) OVER (ORDER BY doc_id ASC NULLS LAST,
                             tok ASC NULLS LAST, h ASC NULLS LAST
                             ROWS UNBOUNDED PRECEDING))::BIGINT - tok
               AS start
      FROM d
    ),
    e AS (
      SELECT doc_id, tok, start,
             unnest(generate_series(start // {_BLOCK},
                                    (start + tok - 1) // {_BLOCK})) AS block_id
      FROM c
    )
    SELECT block_id,
           COUNT(*)::BIGINT AS n_docs,
           SUM(LEAST(start + tok, (block_id + 1) * {_BLOCK})
               - GREATEST(start, block_id * {_BLOCK}))::BIGINT AS n_tokens,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM e GROUP BY block_id
    """,
)
def llm_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk sequence packing: whitespace token counts, a
    running exclusive offset (window cumsum ordered by doc_id), then each
    doc explodes into the 512-token block ids it covers
    (``sequence(start div B, (start+tok-1) div B)``); per block we report
    doc count, covered tokens (512 everywhere except the tail), and the
    doc-id span. This is the exact manifest a pretraining loader needs.

    Scale: at 100 TB the single ordered window becomes the one bottleneck —
    the production variant computes per-shard offsets (sum per shard, then a
    driver-side prefix over ~1e3 shard totals broadcast back), identical
    downstream plan. Explode fan-out is bounded: a doc of T tokens emits
    T/512 + 1 rows.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("tok"),
        F.md5("text").alias("h"),
    )
    # rowsBetween is already a ROWS frame (the oracle needed it spelled
    # out); (tok, content-hash) tiebreaks keep the pack order total when
    # a doc_id was re-ingested with different bytes
    w = Window.orderBy(
        F.col("doc_id").asc_nulls_last(),
        F.col("tok").asc_nulls_last(),
        F.col("h").asc_nulls_last(),
    ).rowsBetween(Window.unboundedPreceding, 0)
    c = d.select(
        "doc_id", "tok", (F.sum("tok").over(w) - F.col("tok")).alias("start")
    )
    e = c.select(
        "doc_id",
        "tok",
        "start",
        F.explode(
            F.sequence(
                F.expr(f"start div {_BLOCK}"),
                F.expr(f"(start + tok - 1) div {_BLOCK}"),
            )
        ).alias("block_id"),
    )
    blk = F.col("block_id")
    return e.groupBy("block_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.least(F.col("start") + F.col("tok"), (blk + 1) * _BLOCK)
            - F.greatest(F.col("start"), blk * _BLOCK)
        ).alias("n_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


@register(
    "events_path_topk",
    CAT_WL,
    """
    WITH r AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events WHERE ts IS NOT NULL
    ),
    p AS (
      SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
      FROM r WHERE rn <= 5 GROUP BY user_id
    )
    SELECT path, COUNT(*)::BIGINT AS n_users
    FROM p GROUP BY path
    ORDER BY n_users DESC, path
    LIMIT 10
    """,
)
def events_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioural path mining: each user's first five events (ordered by
    ts with event_id tiebreak) joined into a '>' path string, then the ten
    most common paths. LIMIT rides a total order (count desc, path asc) so
    both engines cut identically.

    Scale: one shuffle on user_id for the window + per-user collect, one
    map-side-combinable count by path; path cardinality is bounded by
    |event_type|^5, so the final top-k is a tiny sort.
    """
    # NULL ts dropped on both engines (the r8 NULL-time seam)
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", F.col("event_id").asc_nulls_last())
    r = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= 5)
    p = r.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        p.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.desc("n_users"), "path")
        .limit(10)
    )


@register(
    "q12_shipmode_priority",
    CAT_WL,
    """
    SELECT l_linestatus,
           SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
           SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
    GROUP BY l_linestatus
    """,
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape adapted to this schema (lineitem has no
    l_shipmode/l_commitdate/l_receiptdate): per line status, how many
    late-shipped lines (>90 days after order date) belonged to high- vs
    low-priority orders — the priority-vs-latency audit.

    Scale: the late-shipment predicate is evaluated post-join (it spans
    both tables); the join shuffles on orderkey with map-side combine on
    the two conditional counts. TPC-H parity: classic Q12 per
    TPC-H spec §2.4.12, priorities partitioned exactly as specified.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "sql_group_by_all",
    CAT_ES,
    """
    SELECT l_returnflag, l_linestatus,
           COUNT(*)::BIGINT AS n,
           CAST(SUM(CAST(ROUND(l_quantity * 4, 0) AS BIGINT)) AS DOUBLE) / 4.0 AS sum_qty,
           ROUND(AVG(l_discount), 4) AS avg_disc
    FROM lineitem
    GROUP BY ALL
    """,
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL (Spark 3.4+ / DuckDB): every non-aggregate select item
    becomes a grouping key automatically — the analyst convenience both
    engines now share. Identical SQL text runs on both sides.
    """
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(l_quantity * 4, 0) AS BIGINT)) AS DOUBLE) / 4.0 AS sum_qty,
               ROUND(AVG(l_discount), 4) AS avg_disc
        FROM lineitem
        GROUP BY ALL
        """
    )


@register(
    "sql_distinct_on",
    CAT_ES,
    """
    SELECT DISTINCT ON (o_custkey)
           o_custkey,
           o_orderkey AS last_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS last_date,
           o_totalprice AS last_price
    FROM orders
    ORDER BY o_custkey, o_orderdate DESC, o_orderkey DESC
    """,
)
def sql_distinct_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest order per customer — the DISTINCT ON idiom. The DuckDB oracle
    uses native ``DISTINCT ON``; Spark (which lacks it) expresses the same
    semantics as a row_number-over-(orderdate desc, orderkey desc) filter —
    the standard dialect mapping. Dates emitted as strings (§5.3: never emit
    DATE across engines); prices are passthrough stored doubles (exact).

    Scale: one shuffle on o_custkey; AQE handles skewed customers. The
    window reads each partition once — no self-join.
    """
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("last_orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("last_date"),
            F.col("o_totalprice").alias("last_price"),
        )
    )
