"""Seasonality, index rebasing, generator functions, and grid-blocked
spatial nearest-neighbor.

  * ``fn_inline_structs``: the ``inline`` generator — array-of-structs →
    rows, the typed unnest surface (complement of explode/posexplode).
  * ``ts_seasonal_dow``: day-of-week seasonal index over the daily
    revenue series (classic multiplicative-seasonality decomposition
    step).
  * ``ts_index_rebase``: monthly revenue rebased to first-month = 100
    (index-number reporting).
  * ``geo_grid_knn``: nearest-neighbor per point via 3×3 grid-cell
    blocking — the standard spatial-join pattern (bucket by cell, probe
    neighbors, never n²). Coordinates are exact integers derived from
    md5, so distances are exact BIGINTs on any engine.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

CAT_FN = "2.H scalar functions"
CAT_TS = "2.L time-series analytics"
CAT_GEO = "2.L spatial"


@register(
    "fn_inline_structs",
    CAT_FN,
    """
    SELECT l_orderkey, l_linenumber, u.metric, u.val
    FROM (
      SELECT l_orderkey, l_linenumber,
             unnest([struct_pack(metric := 'qty',  val := l_quantity),
                     struct_pack(metric := 'disc', val := l_discount),
                     struct_pack(metric := 'tax',  val := l_tax)]) AS u
      FROM lineitem
    )
    """,
)
def fn_inline_structs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``inline(array<struct>)`` generator: unpivot three measures into
    typed (metric, val) rows — the struct-aware sibling of explode.
    Values are raw parquet doubles (bit-identical on every engine, no
    rounding needed). Row-local fan-out ×3, zero shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "inline(array("
            "named_struct('metric', 'qty',  'val', l_quantity),"
            "named_struct('metric', 'disc', 'val', l_discount),"
            "named_struct('metric', 'tax',  'val', l_tax)))"
        ),
    )


@register(
    "ts_seasonal_dow",
    CAT_TS,
    """
    WITH day AS (
      -- exact integer cents per day (r11 magnitude lint, 5.3.9a): daily
      -- revenue is a grower; the per-dow mean is one exact division and
      -- emits unrounded, the seasonal index is bounded and keeps 4dp
      SELECT ts::DATE AS d,
             SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS rev_c
      FROM events GROUP BY ts::DATE
    ),
    tot AS (SELECT CAST(SUM(rev_c) AS DOUBLE)
                     / (100.0 * NULLIF(COUNT(rev_c), 0)) AS overall FROM day)
    SELECT isodow(d)::INT AS dow,
           COUNT(*)::BIGINT AS n_days,
           CAST(SUM(rev_c) AS DOUBLE) / (100.0 * NULLIF(COUNT(rev_c), 0))
             AS avg_rev,
           ROUND(CAST(SUM(rev_c) AS DOUBLE)
                 / (100.0 * NULLIF(COUNT(rev_c), 0)) / overall, 4)
             AS seasonal_idx
    FROM day CROSS JOIN tot
    GROUP BY isodow(d)::INT, overall
    """,
)
def ts_seasonal_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal index: daily revenue → per-ISO-weekday mean /
    overall mean. The multiplicative-seasonality step of a classic
    decomposition (trend handled by ts_ewma / win_rolling_median). Daily
    sums are rounded BEFORE the second-level average so both engines
    aggregate identical inputs. Two tiny aggregates after the per-day
    rollup; at 100 TB the day table is |days| rows — dust.
    """
    ev = load_table(spark, sf_dir, "events")
    day = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum(F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)")).alias("rev_c")
    )
    mean_rev = F.sum("rev_c").cast("double") / (
        100.0 * F.nullif(F.count("rev_c"), F.lit(0))
    )
    tot = day.agg(mean_rev.alias("overall"))
    return (
        day.crossJoin(F.broadcast(tot))
        .groupBy(F.expr("weekday(d) + 1").cast("int").alias("dow"), "overall")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            mean_rev.alias("avg_rev"),
            F.round(mean_rev / F.first("overall"), 4).alias("seasonal_idx"),
        )
        .drop("overall")
    )


@register(
    "ts_index_rebase",
    CAT_TS,
    """
    WITH m AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS month,
             SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS rev_c
      FROM orders WHERE o_orderdate IS NOT NULL
      GROUP BY strftime(o_orderdate, '%Y-%m')
    )
    SELECT month, CAST(rev_c AS DOUBLE) / 100.0 AS rev,
           ROUND(CAST(rev_c AS DOUBLE)
                 / CAST(FIRST_VALUE(rev_c) OVER (ORDER BY month) AS DOUBLE)
                 * 100, 4) AS idx100
    FROM m
    """,
)
def ts_index_rebase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-number reporting: monthly revenue rebased so the first month
    = 100. One groupBy to |months| rows, then a first_value window over
    that dust-sized series (never over raw rows). Month is emitted as a
    yyyy-MM string — engines never exchange raw DATE values (SURVEY
    §5.3.6). NULL o_orderdate dropped on both engines (the r8 NULL-time
    seam: a NULL month would be the BASE month on Spark, the last row on
    DuckDB, shifting every index value).
    """
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull()
    )
    # exact integer cents (§5.3.6b): the rebased index divides
    # bit-identical integers on both engines
    m = o.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month")).agg(
        F.sum(F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"))
        .alias("rev_c")
    )
    w = Window.orderBy("month")
    return m.select(
        "month",
        (F.col("rev_c").cast("double") / 100.0).alias("rev"),
        F.round(
            F.col("rev_c").cast("double")
            / F.first("rev_c").over(w).cast("double")
            * 100,
            4,
        ).alias("idx100"),
    )


# Exact integer coordinate in [0, 1024) from hex chars i..i+2 of md5(key).
def _coord_spark(i: int) -> str:
    h = "md5(cast(c_custkey as string))"
    v = (
        lambda j: f"(locate(substr({h}, {j}, 1), '0123456789abcdef') - 1)"
    )
    return f"(({v(i)} * 256 + {v(i + 1)} * 16 + {v(i + 2)}) % 1024)"


def _coord_duck(i: int) -> str:
    h = "md5(c_custkey::VARCHAR)"
    v = (
        lambda j: f"(strpos('0123456789abcdef', substr({h}, {j}, 1)) - 1)"
    )
    return f"(({v(i)} * 256 + {v(i + 1)} * 16 + {v(i + 2)}) % 1024)"


@register(
    "geo_grid_knn",
    CAT_GEO,
    f"""
    WITH p AS (
      SELECT c_custkey AS k,
             {_coord_duck(1)}::BIGINT AS gx,
             {_coord_duck(4)}::BIGINT AS gy
      FROM customer
    ),
    pc AS (SELECT k, gx, gy, gx // 64 AS cx, gy // 64 AS cy FROM p),
    ox AS (SELECT unnest([-1, 0, 1]) AS dx),
    oy AS (SELECT unnest([-1, 0, 1]) AS dy),
    cand AS (
      SELECT a.k, a.gx, a.gy, b.k AS bk,
             (a.gx - b.gx) * (a.gx - b.gx)
           + (a.gy - b.gy) * (a.gy - b.gy) AS d2
      FROM pc a CROSS JOIN ox CROSS JOIN oy
      JOIN pc b ON b.cx = a.cx + dx AND b.cy = a.cy + dy AND b.k <> a.k
    ),
    r AS (
      SELECT k, gx, gy, bk, d2,
             ROW_NUMBER() OVER (PARTITION BY k ORDER BY d2, bk) AS rn,
             COUNT(*) OVER (PARTITION BY k)::BIGINT AS n_cand
      FROM cand
    )
    SELECT k AS c_custkey, gx, gy, n_cand, bk AS nn_key, d2 AS nn_d2
    FROM r WHERE rn = 1
    """,
)
def geo_grid_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest neighbor per point with 3×3 grid-cell blocking: bucket
    points into 64-wide cells on a 1024×1024 integer grid, probe only
    the 9 surrounding cells, take the (d2, id)-min candidate. This is
    the canonical scale-out spatial join — candidate pairs are
    |points|·density instead of |points|², the cell equi-key drives an
    ordinary shuffled hash join, and skew is bounded by cell size.
    Coordinates are exact md5-derived integers so d2 is an exact BIGINT:
    the argmin can never flip on float noise. (Approximation contract:
    a neighbor farther than one cell width can be missed — the standard
    blocking trade-off; oracle implements the identical contract.)
    """
    p = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.expr(_coord_spark(1)).cast("bigint").alias("gx"),
        F.expr(_coord_spark(4)).cast("bigint").alias("gy"),
    )
    pc = p.select(
        "k", "gx", "gy",
        F.expr("gx div 64").alias("cx"), F.expr("gy div 64").alias("cy"),
    )
    probe = (
        pc.select(
            "k", "gx", "gy",
            F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("dx"),
            "cx", "cy",
        )
        .select(
            "k", "gx", "gy", "cx", "cy", "dx",
            F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("dy"),
        )
    )
    b = pc.select(
        F.col("k").alias("bk"),
        F.col("gx").alias("bgx"),
        F.col("gy").alias("bgy"),
        F.col("cx").alias("bcx"),
        F.col("cy").alias("bcy"),
    )
    cand = probe.join(
        b,
        (F.col("bcx") == F.col("cx") + F.col("dx"))
        & (F.col("bcy") == F.col("cy") + F.col("dy"))
        & (F.col("bk") != F.col("k")),
    ).select(
        "k", "gx", "gy", "bk",
        (
            (F.col("gx") - F.col("bgx")) * (F.col("gx") - F.col("bgx"))
            + (F.col("gy") - F.col("bgy")) * (F.col("gy") - F.col("bgy"))
        ).alias("d2"),
    )
    r = cand.groupBy("k", "gx", "gy").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cand"),
        F.min(F.struct("d2", "bk")).alias("m"),
    )
    return r.select(
        F.col("k").alias("c_custkey"),
        "gx",
        "gy",
        "n_cand",
        F.col("m.bk").alias("nn_key"),
        F.col("m.d2").alias("nn_d2"),
    )


_Z_SPARK = (
    "aggregate(sequence(0, 9), 0L, (acc, i) -> acc"
    " + shiftleft(shiftright(gx, i) & 1, 2 * i)"
    " + shiftleft(shiftright(gy, i) & 1, 2 * i + 1))"
)
_Z_DUCK = (
    "list_sum(list_transform(range(0, 10), i ->"
    " (((gx >> i) & 1) << (2 * i)) + (((gy >> i) & 1) << (2 * i + 1))))"
)


@register(
    "fn_zorder_tile",
    CAT_GEO,
    f"""
    WITH p AS (
      SELECT c_custkey,
             {_coord_duck(1)}::BIGINT AS gx,
             {_coord_duck(4)}::BIGINT AS gy
      FROM customer
    ),
    z AS (SELECT c_custkey, gx, gy, {_Z_DUCK}::BIGINT AS zval FROM p)
    SELECT (zval // 16384)::BIGINT AS tile,
           COUNT(*)::BIGINT AS n,
           MIN(zval)::BIGINT AS min_z, MAX(zval)::BIGINT AS max_z,
           MIN(gx)::BIGINT AS min_gx, MAX(gx)::BIGINT AS max_gx
    FROM z GROUP BY zval // 16384
    """,
)
def fn_zorder_tile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) curve as a multidimensional clustering key: bit-
    interleave the two 10-bit grid coordinates into a 20-bit z-value, then
    census the 64 curve tiles (z div 16384). Sorting/partitioning data by
    zval is the standard way to make BOTH gx-range and gy-range predicates
    prune row groups in one layout (the 2-D generalization of
    sink_sorted_zonemap); each tile's min/max shows the locality the curve
    buys. Pure integer bit math — exact on every engine.
    """
    p = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.expr(_coord_spark(1)).cast("bigint").alias("gx"),
        F.expr(_coord_spark(4)).cast("bigint").alias("gy"),
    )
    z = p.select("c_custkey", "gx", "gy", F.expr(_Z_SPARK).cast("bigint").alias("zval"))
    return z.groupBy(F.expr("zval div 16384").cast("bigint").alias("tile")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("zval").cast("bigint").alias("min_z"),
        F.max("zval").cast("bigint").alias("max_z"),
        F.min("gx").cast("bigint").alias("min_gx"),
        F.max("gx").cast("bigint").alias("max_gx"),
    )
