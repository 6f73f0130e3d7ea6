"""Surface-completion extras: grouping flags, IGNORE NULLS, try_* arithmetic.

Small but load-bearing corners of the declared families: GROUPING() flags
(the only way to tell a real NULL group from a rollup subtotal),
IGNORE NULLS window carry-forward (the standard gap-fill for sensor/event
values), and the ANSI try_* arithmetic family (NULL-on-error semantics
that stay portable across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ._json_compat import duck_json_int
from ..tables import load_table

_ASCII_FOLD = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"
)  # ASCII case fold: engine/locale case folding diverges (textnorm.py)

CAT_AGG = "2.D aggregations"
CAT_WIN = "2.E window functions"
CAT_FN = "2.H scalar functions"


@register(
    "agg_grouping_flags",
    CAT_AGG,
    """
    SELECT r_name, n_name,
           GROUPING(r_name)::INT AS g_r, GROUPING(n_name)::INT AS g_n,
           COUNT(*) AS n
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    -- empty-input parity (r10 joint-corruption sweep: an EMPTY region
    -- dim empties the join; standard SQL still emits the () grand row,
    -- Spark's rollup emits nothing; COUNT > 0 on any non-empty input)
    HAVING COUNT(*) > 0
    """,
)
def agg_grouping_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() flags on a rollup — disambiguates subtotal rows from
    genuine NULL group values, which any BI layer over the rollup needs.
    The flags are computed inside the same Expand pass; no extra shuffle.
    """
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.grouping("r_name").cast("int").alias("g_r"),
            F.grouping("n_name").cast("int").alias("g_n"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "win_ignore_nulls",
    CAT_WIN,
    """
    SELECT user_id, event_id,
           LAST_VALUE(CASE WHEN event_type = 'error' THEN NULL ELSE value END
                      IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts NULLS LAST, event_id
                   ROWS UNBOUNDED PRECEDING) AS last_good_value
    FROM events
    """,
)
def win_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS carry-forward: per user, the most recent non-error
    value at each event — the standard last-observation-carried-forward
    gap-fill. One window, full (ts, event_id) tiebreak so both engines
    agree on ties; raw (unaggregated) doubles pass through bit-identical.
    """
    ev = load_table(spark, sf_dir, "events")
    # ts NULLS LAST both engines (the r8 NULL-time seam)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc_nulls_last(), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    good = F.when(F.col("event_type") == "error", F.lit(None)).otherwise(
        F.col("value")
    )
    return ev.select(
        "user_id",
        "event_id",
        F.last(good, ignorenulls=True).over(w).alias("last_good_value"),
    )


@register(
    "fn_try_arith",
    CAT_FN,
    """
    SELECT event_type,
           COUNT(*) AS n,
           COUNT(*) - COUNT(value / nullif(dayofmonth(ts) - 15, 0))
             AS n_div_null,
           ROUND(SUM(value / nullif(dayofmonth(ts) - 15, 0)), 4) AS sum_ratio,
           SUM(CASE WHEN event_id % nullif(dayofmonth(ts) - 15, 0) IS NULL
                    THEN 0 ELSE event_id % (dayofmonth(ts) - 15) END)::BIGINT
             AS sum_mod
    FROM events
    GROUP BY event_type
    """,
)
def fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI try_* arithmetic family: ``try_divide`` and ``try_mod`` return
    NULL where strict evaluation would raise (division by zero) — the
    portable spelling of error-tolerant math in a pipeline that must never
    kill a 100 TB job on one bad row. The oracle restates the semantics
    with nullif guards (DuckDB's strict ops error on /0, exactly the
    failure mode try_* exists to absorb).
    """
    ev = load_table(spark, sf_dir, "events")
    d = F.dayofmonth("ts") - F.lit(15)
    ratio = F.expr("try_divide(value, dayofmonth(ts) - 15)")
    mod = F.expr("try_mod(event_id, dayofmonth(ts) - 15)")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        (F.count(F.lit(1)) - F.count(ratio)).alias("n_div_null"),
        F.round(F.sum(ratio), 4).alias("sum_ratio"),
        F.sum(F.coalesce(mod, F.lit(0))).cast("bigint").alias("sum_mod"),
    )


@register(
    "observe_metrics",
    "2.A scans/sources/sinks",
    """
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(ROUND(l_quantity * 4, 0) AS BIGINT)) AS DOUBLE) / 4.0 AS sum_qty,
           ROUND(MAX(l_extendedprice), 4) AS max_price
    FROM lineitem
    WHERE l_returnflag = 'R'
    """,
)
def observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-flight pipeline metrics via ``DataFrame.observe`` — the
    production pattern for row-count / checksum telemetry that rides the
    SAME job as the real work instead of a second scan. The observed
    accumulator values (collected driver-side after the action, O(metrics)
    bytes) are returned as a 1-row frame and oracled against a plain
    aggregate — proving observe() sees every row exactly once.
    """
    from pyspark.sql import Observation

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    obs = Observation("lineitem_metrics")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        # exact quarter-scaled quantity sum, unrounded (flagship sq4
        # idiom; r11 magnitude lint, 5.3.9a)
        F.expr(
            "CAST(SUM(CAST(ROUND(l_quantity * 4, 0) AS BIGINT))"
            " AS DOUBLE) / 4.0"
        ).alias("sum_qty"),
        F.round(F.max("l_extendedprice"), 4).alias("max_price"),
    )
    observed.write.format("noop").mode("overwrite").save()  # the real job
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["sum_qty"], m["max_price"])],
        "n_rows bigint, sum_qty double, max_price double",
    )


@register(
    "agg_regression",
    CAT_AGG,
    """
    SELECT event_type,
           COUNT(*) AS n,
           ROUND(regr_slope(value, hour(ts)), 4) AS slope,
           ROUND(regr_intercept(value, hour(ts)), 4) AS intercept,
           ROUND(regr_r2(value, hour(ts)), 4) AS r2
    FROM events
    GROUP BY event_type
    """,
)
def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregate family (regr_slope / regr_intercept /
    regr_r2): value-vs-hour-of-day trend per event type in one distributed
    pass — the moment-sketch shape (sums of x, y, xy, x²) that partial
    aggregation pushes map-side like any sum.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.expr("regr_slope(value, hour(ts))"), 4).alias("slope"),
        F.round(F.expr("regr_intercept(value, hour(ts))"), 4).alias("intercept"),
        F.round(F.expr("regr_r2(value, hour(ts))"), 4).alias("r2"),
    )


@register("agg_sketch_merge", CAT_AGG)  # rows-only: HLL sketches are approx
def agg_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reaggregatable distinct-count sketches (Apache DataSketches HLL,
    Spark 3.5+): per-day user sketches built once, then UNION-merged to a
    monthly estimate WITHOUT touching raw data again — the property that
    makes 100 TB rollup hierarchies cheap (store sketch bytes per grain,
    merge upward; never re-scan). The exact-count companion
    (`agg_count_distinct`) is the oracled ground truth; sketches are
    approximate by design, hence rows-only.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.dayofmonth("ts").alias("d")).agg(
        F.expr("hll_sketch_agg(user_id)").alias("sk"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return daily.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.expr("hll_sketch_estimate(hll_union_agg(sk))")
        .cast("bigint")
        .alias("approx_monthly_users"),
    )


@register(
    "fn_map_hof",
    CAT_FN,
    f"""
    WITH m AS (
      SELECT event_type,
             {duck_json_int('props', '$.k')} AS k_val,
             length(props) AS len_val
      FROM events)
    SELECT event_type,
           SUM(CASE WHEN (k_val * 2) % 4 = 0 THEN k_val * 2 ELSE 0 END
               + CASE WHEN (len_val * 2) % 4 = 0 THEN len_val * 2 ELSE 0 END
              )::BIGINT AS sum_kept
    FROM m GROUP BY event_type
    """,
)
def fn_map_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions — build a map from the parsed payload
    plus derived metadata, ``transform_values`` (double every value), then
    ``map_filter`` (keep multiples of 4) and aggregate what survives. The
    whole chain is JVM-side expression evaluation inside codegen; the
    oracle restates the arithmetic on the unrolled entries (DuckDB's map
    dialect differs, the semantics don't).
    """
    ev = load_table(spark, sf_dir, "events")
    m = ev.select(
        "event_type",
        F.expr(
            "map_filter("
            "  transform_values("
            "    map_from_arrays(array('k', 'len'),"
            "      array(CASE WHEN get_json_object(props, '$.k')"
            " RLIKE '^-?[0-9]+$' THEN"
            " TRY_CAST(get_json_object(props, '$.k') AS INT) END,"
            "            length(props))),"
            "    (k, v) -> v * 2),"
            "  (k, v) -> v % 4 = 0)"
        ).alias("kept"),
    )
    return m.groupBy("event_type").agg(
        F.sum(
            F.expr("aggregate(map_values(kept), 0, (a, b) -> a + b)")
        ).cast("bigint").alias("sum_kept")
    )


@register(
    "fn_string_extended",
    CAT_FN,
    """
    SELECT split_part(c_name, '#', 2) AS cust_no,
           translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_tr,
           reverse(c_mktsegment) AS seg_rev,
           repeat(left(c_mktsegment, 2), 2) AS seg_rep,
           ascii(c_mktsegment) AS seg_ascii,
           right(c_name, 3) AS name_tail,
           replace(c_name, 'Customer', 'C') AS name_short
    FROM customer
    WHERE c_custkey < 100
    """,
)
def fn_string_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended string family: split_part / translate / reverse / repeat /
    ascii / left / right / replace — the second tier of string surface
    beyond `fn_string`, all JVM builtins inside codegen, dialect-identical
    across engines on these inputs.
    """
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 100)
    return c.select(
        F.split_part("c_name", F.lit("#"), F.lit(2)).alias("cust_no"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("seg_tr"),
        F.reverse("c_mktsegment").alias("seg_rev"),
        F.repeat(F.left("c_mktsegment", F.lit(2)), 2).alias("seg_rep"),
        F.ascii("c_mktsegment").alias("seg_ascii"),
        F.right("c_name", F.lit(3)).alias("name_tail"),
        F.replace("c_name", F.lit("Customer"), F.lit("C")).alias("name_short"),
    )


@register(
    "orders_interarrival",
    "2.M workloads",
    """
    WITH seq AS (
      SELECT o_custkey, o_orderdate,
             LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey) AS prev_d
      FROM orders WHERE o_orderdate IS NOT NULL),
    gaps AS (
      SELECT c_mktsegment,
             date_diff('day', prev_d, o_orderdate) AS gap_days
      FROM seq JOIN customer ON o_custkey = c_custkey
      WHERE prev_d IS NOT NULL)
    SELECT c_mktsegment, COUNT(*) AS n_gaps,
           ROUND(AVG(gap_days), 4) AS avg_gap_days,
           MAX(gap_days) AS max_gap_days
    FROM gaps GROUP BY c_mktsegment
    """,
)
def orders_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase-cadence analytics: inter-arrival days between consecutive
    orders per customer (lag window, orderkey tiebreak), aggregated to
    cadence statistics per market segment — the repeat-behavior workload a
    feed processor derives for downstream models.

    The lag window shuffles on o_custkey; the segment join rides broadcast
    (customer is dimension-sized relative to orders); the aggregate is
    partial+final.
    """
    # NULL o_orderdate dropped on both engines (the r8 NULL-time seam):
    # an undated order has no position in a cadence sequence
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull()
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.withColumn("prev_d", F.lag("o_orderdate").over(w)).filter(
        F.col("prev_d").isNotNull()
    )
    gaps = seq.join(F.broadcast(c), seq.o_custkey == c.c_custkey).select(
        "c_mktsegment",
        F.datediff("o_orderdate", "prev_d").alias("gap_days"),
    )
    return gaps.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.round(F.avg("gap_days"), 4).alias("avg_gap_days"),
        F.max("gap_days").alias("max_gap_days"),
    )


@register(
    "win_ratio_to_report",
    CAT_WIN,
    """
    WITH g AS (
      SELECT l_returnflag, l_linestatus,
             SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS grp_c
      FROM lineitem GROUP BY l_returnflag, l_linestatus)
    SELECT l_returnflag, l_linestatus,
           CAST(grp_c AS DOUBLE) / 100.0 AS group_rev,
           ROUND(CAST(grp_c AS DOUBLE)
                 / CAST(SUM(grp_c) OVER (PARTITION BY l_returnflag)
                        AS DOUBLE), 4) AS share_in_flag,
           ROUND(CAST(grp_c AS DOUBLE) / CAST(SUM(grp_c) OVER () AS DOUBLE),
                 4) AS share_total
    FROM g
    """,
)
def win_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: a window over an AGGREGATE (share of each group
    within its returnflag and of the grand total) — the two-level
    percent-of-total every report needs, in one pass plus two
    constant-width windows over the 6-row aggregate (the windows run over
    GROUPS, not input rows — cost is output-sized at any data scale).
    """
    from pyspark.sql.window import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    # exact integer cents (§5.3.6b): sums and both ratio denominators
    # run on bit-identical integers on both engines
    g = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.expr("CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)"))
        .alias("grp_c")
    )
    # the window totals sum GROUP totals — corpus-scale magnitudes — so
    # the accumulators widen to DECIMAL(38,0) over the 6 aggregated rows
    # (§5.3.6c; DuckDB widens to HUGEINT on its own); the fact-grain
    # group sum keeps the BIGINT fast path with ~18x headroom at 100 TB
    grp_d = F.col("grp_c").cast("decimal(38,0)")
    return g.select(
        "l_returnflag",
        "l_linestatus",
        (F.col("grp_c").cast("double") / 100.0).alias("group_rev"),
        F.round(
            F.col("grp_c").cast("double")
            / F.sum(grp_d).over(W.partitionBy("l_returnflag")).cast("double"),
            4,
        ).alias("share_in_flag"),
        F.round(
            F.col("grp_c").cast("double")
            / F.sum(grp_d).over(W.partitionBy()).cast("double"),
            4,
        ).alias("share_total"),
    )


@register(
    "fn_encoding",
    CAT_FN,
    """
    SELECT c_custkey,
           to_base64(c_name::BLOB) AS b64,
           decode(from_base64(to_base64(c_name::BLOB))) AS b64_rt,
           hex(c_name) AS hx,
           decode(unhex(hex(c_name))) AS hx_rt
    FROM customer WHERE c_custkey < 50
    """,
)
def fn_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary encoding family: base64/unbase64 and hex/unhex with full
    round-trips — the payload-safe transport spelling for binary columns
    (multimodal payloads, checksums) through string-typed channels. Both
    engines emit uppercase hex and padded base64, so the round-trip is
    byte-exact and oracle-able.
    """
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 50)
    name_bin = F.col("c_name").cast("binary")
    return c.select(
        "c_custkey",
        F.base64(name_bin).alias("b64"),
        F.unbase64(F.base64(name_bin)).cast("string").alias("b64_rt"),
        F.hex("c_name").alias("hx"),
        F.unhex(F.hex("c_name")).cast("string").alias("hx_rt"),
    )


@register(
    "fn_interval_arith",
    CAT_FN,
    """
    SELECT o_orderkey,
           strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_3m,
           strftime(o_orderdate + INTERVAL 45 DAY, '%Y-%m-%d') AS plus_45d,
           date_diff('month', TIMESTAMP '1995-01-01', o_orderdate)::INT
             AS months_since,
           strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d') AS qtr_start
    FROM orders WHERE o_orderkey < 100
    """,
)
def fn_interval_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic family: add_months / date_add / month-boundary
    distance / quarter truncation, normalized to yyyy-MM-dd STRINGS on both engines
    (Spark date functions return DATE, DuckDB interval addition keeps
    TIMESTAMP, and pandas widens DATE to datetime64 — string formatting is
    the one representation that survives every hop identically;
    fractional months_between is deliberately avoided, its day-fraction
    semantics differ across engines).
    """
    # year-10000 seam (temporal campaign r12): Java's yyyy pattern prints
    # years beyond 4 digits with an explicit '+' sign ('+10000-03-31')
    # where DuckDB strftime prints bare digits — strip the sign so the
    # overflow-into-5-digits case (9999-12-31 + 3 months) matches. The
    # arithmetic itself agrees on both engines all the way from
    # 0001-01-01 to 9999-12-31 inputs (verified incl. the 1582
    # pre-Gregorian cutover — both proleptic Gregorian).
    fmt = lambda c: F.regexp_replace(  # noqa: E731
        F.date_format(c, "yyyy-MM-dd"), "^\\+", ""
    )
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 100)
    return o.select(
        "o_orderkey",
        fmt(F.add_months("o_orderdate", 3)).alias("plus_3m"),
        fmt(F.date_add("o_orderdate", 45)).alias("plus_45d"),
        (
            (F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate") - 1
        ).cast("int").alias("months_since"),
        fmt(F.date_trunc("quarter", "o_orderdate")).alias("qtr_start"),
    )


@register(
    "udtf_polymorphic",
    "2.K udf surface",
    """
    WITH t AS (SELECT doc_id, string_split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ') AS w
               FROM documents WHERE doc_id < 50)
    SELECT doc_id, w[1] AS tok0, w[2] AS tok1, w[3] AS tok2
    FROM t
    """,
)
def udtf_polymorphic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (static ``analyze``, Spark 3.5+): the output
    schema is computed at plan time from a literal argument (k → k token
    columns) — the table-function shape for wide feature extraction where
    arity is a parameter, not a hardcoded schema. Correlated via LATERAL
    per input row; the oracle restates the first-k extraction in SQL.
    """
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class FirstTokens:
        @staticmethod
        def analyze(text: AnalyzeArgument, k: AnalyzeArgument):
            st = StructType()
            for i in range(k.value):
                st = st.add(f"tok{i}", StringType())
            return AnalyzeResult(schema=st)

        def eval(self, text: str, k: int):
            # NULL text stays NULL end-to-end: the `or ""` shortcut
            # yielded tok0='' where the oracle's string_split(NULL)
            # gives NULL columns (doc-corruption replay)
            if text is None:
                yield tuple([None] * k)
                return
            toks = text.translate(_ASCII_FOLD).split(" ")[:k]
            yield tuple(toks + [None] * (k - len(toks)))

    spark.udtf.register("tfk_first_tokens", FirstTokens)
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    d.createOrReplaceTempView("udtf_poly_docs")
    return spark.sql(
        """
        SELECT doc_id, t.tok0, t.tok1, t.tok2
        FROM udtf_poly_docs, LATERAL tfk_first_tokens(text, 3) t
        """
    )


@register(
    "fn_crypto_roundtrip",
    CAT_FN,
    """
    SELECT c_custkey,
           sha256(c_name) AS name_sha,
           c_name AS decrypted
    FROM customer WHERE c_custkey < 50
    """,
)
def fn_crypto_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload crypto surface: AES-GCM encrypt→decrypt round-trip (the
    at-rest envelope for sensitive feed fields) plus SHA-256 content
    checksums. The ciphertext itself is nondeterministic (random GCM IV),
    so the ORACLE asserts the two deterministic facts: decryption inverts
    encryption exactly, and the checksum matches DuckDB's independent
    SHA-256.
    """
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 50)
    return c.select(
        "c_custkey",
        F.sha2(F.col("c_name"), 256).alias("name_sha"),
        F.expr(
            "CAST(aes_decrypt(aes_encrypt(c_name, '0123456789abcdef'), "
            "'0123456789abcdef') AS STRING)"
        ).alias("decrypted"),
    )
