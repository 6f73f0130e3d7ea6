"""Long-tail function families: multi-percentile bands, datetime
constructors, JSON arrays, array set algebra.

  * ``agg_percentile_multi``: P50/P90/P99 latency-style bands per group in
    ONE aggregate — Spark evaluates ``percentile(col, array(...))`` with a
    single sort-based accumulator per group instead of three.
  * ``fn_datetime_make``: make_timestamp/make_date field constructors — the
    inverse of extract, needed wherever dates arrive as split fields.
  * ``fn_json_array``: JSON array path access + length — training feeds
    batch multiple readings into one JSON array routinely.
  * ``fn_array_setops``: array_intersect/union/except with sorted canonical
    output — set algebra over token arrays without exploding (stays row-
    local, no shuffle); the oracle mirrors with DuckDB list lambdas.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md §0.1);
capability surface reconstructed per SURVEY.md §2 and BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table
from ._json_compat import duck_json_int, spark_json_int

CAT_AGG = "2.D aggregations"
CAT_FN = "2.H scalar functions"


@register(
    "agg_percentile_multi",
    CAT_AGG,
    """
    WITH q AS (
      SELECT event_type,
             quantile_cont(value, [0.5, 0.9, 0.99]) AS qs,
             COUNT(*)::BIGINT AS n
      FROM events GROUP BY event_type
    )
    SELECT event_type,
           ROUND(qs[1]::DOUBLE, 4) AS p50,
           ROUND(qs[2]::DOUBLE, 4) AS p90,
           ROUND(qs[3]::DOUBLE, 4) AS p99,
           n
    FROM q
    """,
)
def agg_percentile_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P50/P90/P99 value bands per event type — the SLO-report shape —
    computed as ONE array-percentile aggregate per group (one accumulator,
    not three) and unpacked positionally. Both engines interpolate
    identically (percentile ≡ quantile_cont).
    """
    ev = load_table(spark, sf_dir, "events")
    q = ev.groupBy("event_type").agg(
        F.expr("percentile(value, array(0.5D, 0.9D, 0.99D))").alias("qs"),
        F.count(F.lit(1)).alias("n"),
    )
    return q.select(
        "event_type",
        F.round(F.element_at("qs", 1), 4).alias("p50"),
        F.round(F.element_at("qs", 2), 4).alias("p90"),
        F.round(F.element_at("qs", 3), 4).alias("p99"),
        "n",
    )


@register(
    "fn_datetime_make",
    CAT_FN,
    """
    WITH g AS (
      SELECT EXTRACT(year FROM l_shipdate)::INT AS yr,
             EXTRACT(month FROM l_shipdate)::INT AS mo,
             COUNT(*)::BIGINT AS n
      FROM lineitem
      GROUP BY 1, 2
    )
    SELECT yr, mo,
           strftime(make_timestamp(yr::BIGINT, mo::BIGINT, 1, 12, 30, 0.0),
                    '%Y-%m-%d %H:%M:%S') AS month_anchor,
           n
    FROM g
    """,
)
def fn_datetime_make(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime construction from fields: rebuild a mid-day first-of-month
    anchor timestamp for every (year, month) with make_timestamp — the
    inverse of extract, the idiom for data that arrives as split date
    fields. Formatted to a string at the boundary (§5.3: never emit raw
    DATE across engines).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.year("l_shipdate").alias("yr"), F.month("l_shipdate").alias("mo")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "yr",
            "mo",
            F.date_format(
                F.expr("make_timestamp(yr, mo, 1, 12, 30, 0)"),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("month_anchor"),
            "n",
        )
    )


@register(
    "fn_json_array",
    CAT_FN,
    """
    WITH j AS (
      SELECT doc_id,
             '[' || n_chars || ',' || doc_id || ',' || length(text) || ']'
               AS arr
      FROM documents
    )
    SELECT doc_id,
           json_array_length(arr)::INT AS arr_len,
           {first} AS first_el,
           {third} AS third_el
    FROM j
    """.format(
        first=duck_json_int("arr", "$[0]", "BIGINT"),
        third=duck_json_int("arr", "$[2]", "BIGINT"),
    ),
)
def fn_json_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON array handling: length + positional path access over a
    synthesized per-doc JSON array — the batched-readings payload shape.
    All JVM-side expressions (json_array_length, get_json_object with
    ``$[i]`` paths); the oracle uses DuckDB's json extension spellings.
    """
    d = load_table(spark, sf_dir, "documents")
    j = d.select(
        "doc_id",
        F.concat(
            F.lit("["),
            F.col("n_chars"),
            F.lit(","),
            F.col("doc_id"),
            F.lit(","),
            F.length("text"),
            F.lit("]"),
        ).alias("arr"),
    )
    return j.select(
        "doc_id",
        F.json_array_length("arr").alias("arr_len"),
        # shared integer-gated spelling (_json_compat): arr is synthesized
        # here so garbage can't occur today, but the discipline is uniform
        spark_json_int("arr", "$[0]", "bigint").alias("first_el"),
        spark_json_int("arr", "$[2]", "bigint").alias("third_el"),
    )


@register(
    "fn_array_setops",
    CAT_FN,
    """
    WITH t AS (
      SELECT doc_id,
             list_distinct(list_slice(string_split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' '), 1, 8))
               AS a,
             list_distinct(list_slice(string_split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' '), 9, 16))
               AS b
      FROM documents
    )
    SELECT doc_id,
           COALESCE(array_to_string(list_sort(list_intersect(a, b)), ','), '') AS inter,
           len(list_distinct(a || b))::INT AS union_n,
           COALESCE(array_to_string(
             list_sort(list_filter(a, x -> NOT list_contains(b, x))), ','
           ), '') AS a_minus_b
    FROM t
    """,
)
def fn_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra without exploding: intersect / union-cardinality /
    difference of each doc's first-8 vs next-8 token windows, entirely
    row-local (no shuffle, no join — the arrays never leave the row).
    Outputs are sorted + joined to canonical strings because set-op
    element order is engine-specific.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.expr("translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz')"), " ")
    t = d.select(
        "doc_id",
        F.array_distinct(F.slice(toks, 1, 8)).alias("a"),
        F.array_distinct(F.slice(toks, 9, 8)).alias("b"),
    )
    # the string renders carry the oracle's COALESCE('') arm explicitly:
    # a NULL-text doc has NULL token arrays, and Spark's array_join(NULL)
    # stays NULL where the oracle renders '' (doc-corruption replay);
    # union_n stays NULL-transparent on both engines
    return t.select(
        "doc_id",
        F.coalesce(
            F.array_join(F.array_sort(F.array_intersect("a", "b")), ","),
            F.lit(""),
        ).alias("inter"),
        F.size(F.array_union("a", "b")).alias("union_n"),
        F.coalesce(
            F.array_join(F.array_sort(F.array_except("a", "b")), ","),
            F.lit(""),
        ).alias("a_minus_b"),
    )
