"""Modern SQL surface: recursive CTEs, VARIANT, lateral joins, Arrow UDFs.

Spark 4 additions that a reference-class engine's users increasingly
expect: WITH RECURSIVE (SPARK-24497, 4.0), the VARIANT semi-structured
type (parse_json/variant_get, 4.0), correlated LATERAL subqueries
(SPARK-35560, 3.2), and Arrow-optimized Python UDFs (useArrow, 3.5).
Each registered with a DuckDB oracle over the same tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ._json_compat import INT_RE, duck_json_int
from ..tables import load_table

CAT_SQL = "2.M workloads"
CAT_FN = "2.H scalar functions"
CAT_UDF = "2.K udf surface"


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


@register(
    "cte_recursive",
    CAT_SQL,
    """
    WITH RECURSIVE spine(mon) AS (
      SELECT TIMESTAMP '1995-01-01'
      UNION ALL
      SELECT mon + INTERVAL 1 MONTH FROM spine
      WHERE mon < TIMESTAMP '2001-08-01'
    )
    SELECT spine.mon, COUNT(o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)),
                         0) AS DOUBLE) / 100.0 AS total
    FROM spine LEFT JOIN orders ON date_trunc('month', o_orderdate) = spine.mon
    GROUP BY spine.mon
    """,
)
def cte_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive-CTE date spine (WITH RECURSIVE, Spark 4.0+): generate the
    month-grain calendar from the anchor row, then LEFT JOIN order activity so
    empty months survive with zero counts — the canonical reporting spine.

    The recursion happens driver-side over 80 rows (one UnionLoop); the
    spine then broadcasts into the join against the fact table, so scale
    cost is one pass over orders. Identical SQL runs on both engines.
    """
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        WITH RECURSIVE spine(mon) AS (
          SELECT TIMESTAMP '1995-01-01'
          UNION ALL
          SELECT mon + INTERVAL 1 MONTH FROM spine
          WHERE mon < TIMESTAMP '2001-08-01'
        )
        SELECT spine.mon, COUNT(o_orderkey) AS n_orders,
               CAST(COALESCE(SUM(CAST(ROUND(o_totalprice * 100, 0)
                                      AS BIGINT)), 0) AS DOUBLE)
                 / 100.0 AS total
        FROM spine LEFT JOIN orders ON date_trunc('MONTH', o_orderdate) = spine.mon
        GROUP BY spine.mon
        """
    )


@register(
    "fn_variant",
    CAT_FN,
    f"""
    SELECT event_type,
           COUNT(*) AS n,
           ROUND(AVG({duck_json_int("props", "$.k")}), 4) AS avg_k,
           MAX({duck_json_int("props", "$.k")}) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT semi-structured access (Spark 4): ``parse_json`` the props
    payload once into a VARIANT column, then typed ``variant_get`` paths —
    the open-schema alternative to from_json-with-declared-StructType.
    Oracled against DuckDB's JSON extraction on the same payloads.

    Scale note: VARIANT stores a parsed binary form, so repeated path
    access doesn't re-parse the JSON text per extraction (unlike
    get_json_object chains).
    """
    ev = load_table(spark, sf_dir, "events")
    # try_parse_json: malformed payloads must become NULL variants, not
    # ANSI errors; the extracted STRING goes through the shared integer
    # gate (DuckDB TRY_CAST rounds '3.9' to 4, Spark NULLs it — only
    # integer-regex text may reach the cast)
    ks = F.expr("try_variant_get(try_parse_json(props), '$.k', 'string')")
    v = ev.select(
        "event_type",
        F.when(ks.rlike(INT_RE), ks.try_cast("int")).alias("k"),
    )
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("k"), 4).alias("avg_k"),
        F.max("k").alias("max_k"),
    )


@register(
    "join_lateral",
    CAT_SQL,
    """
    SELECT c_custkey, c_mktsegment, t.o_orderkey, t.o_totalprice
    FROM customer,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders
             WHERE o_custkey = c_custkey
             ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 2) t
    WHERE c_mktsegment = 'BUILDING'
    """,
)
def join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: each customer's two most recent orders
    — the per-row-subquery spelling of ``topk_per_group``. Spark plans the
    correlation as a window (rank over o_custkey) under the hood, so it
    costs one shuffle of orders, not one probe per customer. Deterministic
    via the (o_orderdate, o_orderkey) total order.
    """
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment, t.o_orderkey, t.o_totalprice
        FROM customer,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders
                 WHERE o_custkey = c_custkey
                 ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 2) t
        WHERE c_mktsegment = 'BUILDING'
        """
    )


@register(
    "udf_arrow_scalar",
    CAT_UDF,
    """
    SELECT lang,
           COUNT(*) AS n,
           SUM(CASE WHEN n_chars > 400 THEN 1 ELSE 0 END)::BIGINT AS n_long
    FROM documents
    GROUP BY lang
    """,
)
def udf_arrow_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized Python UDF (``useArrow=True``, Spark 3.5+): the
    modern scalar-UDF default — Arrow batch transfer without the
    pandas_udf Series API. The UDF itself is deliberately trivial (length
    bucket) so the oracle can restate it in SQL; the point under test is
    the Arrow serialization path end-to-end.

    Scale note: still a Python-worker roundtrip per batch — used only when
    built-ins can't express the logic; here the SQL restatement in the
    oracle IS the built-in spelling a production plan would use.
    """
    from pyspark.sql.functions import udf

    bucket = udf(lambda n: 1 if n is not None and n > 400 else 0, "int", useArrow=True)
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("lang", bucket(F.col("n_chars")).alias("is_long"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("is_long").cast("bigint").alias("n_long"),
        )
    )


@register(
    "sql_pipe_syntax",
    CAT_SQL,
    """
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(l_quantity * 4, 0) AS BIGINT)) AS DOUBLE) / 4.0 AS sum_qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4.0, `|>`): the linear FROM-first spelling of
    scan → filter → aggregate. Parses to the identical logical plan as the
    nested SELECT (the oracle states the classic form), so Catalyst
    optimizations apply unchanged — syntax coverage, zero plan cost.
    """
    _views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |> AGGREGATE COUNT(*) AS n, CAST(SUM(CAST(ROUND(l_quantity * 4, 0) AS BIGINT)) AS DOUBLE) / 4.0 AS sum_qty
           GROUP BY l_returnflag, l_linestatus
        """
    )
