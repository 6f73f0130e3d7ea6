"""§2.C Joins (batch; stream joins live in streaming/queries.py).

We implement NO join algorithms — Catalyst + AQE pick broadcast-hash /
sort-merge / shuffled-hash at runtime (SURVEY §4). Our obligations:
  * broadcast() hints on always-small dims (region/nation — bounded domains);
  * equi-keys exposed as plain column equalities so the planner can shuffle
    on them (never buried in expressions);
  * range/asof patterns spelled so the equi part carries the join and the
    range part is a post-filter — the 100 TB-safe shape.

Skew: AQE skew-join splitting handles hot keys at scale (enabled in
session.py); no manual salting needed for these key distributions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from .exact import CENTS_SUM_SQL, cents_sum
from ..tables import load_table, sane_ts, sane_ts_sql

CAT = "2.C joins"


@register(
    "join_inner",
    CAT,
    """
    SELECT o_orderkey, o_totalprice, c_custkey, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_orderstatus = 'F'
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", "o_totalprice", "c_custkey", "c_mktsegment"
    )


@register(
    "join_broadcast",
    CAT,
    """
    SELECT r_name, c_mktsegment, COUNT(*) AS n_customers,
           CAST(SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) AS DOUBLE)
             / 100.0 AS total_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, c_mktsegment
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast of bounded dims: the fact side never shuffles for
    the join — only the final 10-group agg shuffles. Same result as the
    oracle; the hint is purely physical."""
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            # exact integer cents (§5.3.6b): order-independent sum
            (
                F.sum(F.expr("CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)"))
                .cast("double")
                / 100.0
            ).alias("total_bal"),
        )
    )


@register(
    "join_left",
    CAT,
    """
    SELECT c_custkey, o_orderkey, o_totalprice
    FROM customer
    LEFT JOIN (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') o
      ON c_custkey = o_custkey
    """,
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "o_orderkey", "o_totalprice"
    )


@register(
    "join_right",
    CAT,
    """
    SELECT c_custkey, c_name, o_orderkey
    FROM (SELECT * FROM orders WHERE o_orderpriority = '5-LOW') o
    RIGHT JOIN customer ON o_custkey = c_custkey
    """,
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "5-LOW")
    return o.join(c, o.o_custkey == c.c_custkey, "right").select(
        "c_custkey", "c_name", "o_orderkey"
    )


@register(
    "join_full",
    CAT,
    """
    WITH hi_purch AS (
      SELECT user_id, COUNT(*) AS n_purchases FROM events
      WHERE event_type = 'purchase' AND value > 190 GROUP BY user_id
    ),
    hi_err AS (
      SELECT user_id, COUNT(*) AS n_errors FROM events
      WHERE event_type = 'error' AND value > 190 GROUP BY user_id
    )
    SELECT COALESCE(p.user_id, e.user_id) AS user_id,
           COALESCE(n_purchases, 0) AS n_purchases,
           COALESCE(n_errors, 0)    AS n_errors
    FROM hi_purch p FULL JOIN hi_err e ON p.user_id = e.user_id
    """,
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hi = ev.filter(F.col("value") > 190)
    # distinct aliases: both sides derive from the same plan (self-join)
    p = (
        hi.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("user_id").alias("p_user"))
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )
    e = (
        hi.filter(F.col("event_type") == "error")
        .groupBy(F.col("user_id").alias("e_user"))
        .agg(F.count(F.lit(1)).alias("n_errors"))
    )
    return p.join(e, p.p_user == e.e_user, "full").select(
        F.coalesce("p_user", "e_user").alias("user_id"),
        F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
        F.coalesce("n_errors", F.lit(0)).alias("n_errors"),
    )


@register(
    "join_semi",
    CAT,
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti",
    CAT,
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as left_anti. (Plain customers-without-orders is empty at
    sf≥0.01 — every customer has orders — so the build side is predicated.)"""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "join_cross",
    CAT,
    """
    SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product — bounded inputs only (5×25). At scale, a cross join
    is only ever legitimate against a broadcastable side."""
    r = load_table(spark, sf_dir, "region").select("r_name")
    n = load_table(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n)


@register(
    "join_theta_range",
    CAT,
    f"""
    SELECT bucket_id, COUNT(*) AS n_events,
           {CENTS_SUM_SQL.format(col='value')}
             AS total_value
    FROM events
    JOIN (VALUES (0, 0.0, 50.0), (1, 50.0, 100.0),
                 (2, 100.0, 150.0), (3, 150.0, 1e9)) AS b(bucket_id, lo, hi)
      ON value >= lo AND value < hi
    GROUP BY bucket_id
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded (non-equi) join. Catalyst plans BroadcastNestedLoopJoin — the
    correct physical choice because the band table is tiny; each event tests
    4 bands map-side with zero shuffle. The general 100 TB pattern for
    range joins is exactly this: make one side broadcastable (or bucketize
    the range into an equi-join key first)."""
    ev = load_table(spark, sf_dir, "events")
    bands = spark.createDataFrame(
        [(0, 0.0, 50.0), (1, 50.0, 100.0), (2, 100.0, 150.0), (3, 150.0, 1e9)],
        "bucket_id INT, lo DOUBLE, hi DOUBLE",
    )
    return (
        ev.join(
            F.broadcast(bands),
            (ev.value >= bands.lo) & (ev.value < bands.hi),
        )
        .groupBy("bucket_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # exact-cents sum, unrounded (r11 magnitude lint, 5.3.9a)
            cents_sum("value").alias("total_value"),
        )
    )


@register(
    "join_asof",
    CAT,
    """
    SELECT p.event_id, p.user_id, c.ts AS click_ts
    FROM (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase' AND ts IS NOT NULL AND {sane}) p
    ASOF LEFT JOIN
         (SELECT user_id, ts FROM events
          WHERE event_type = 'click' AND ts IS NOT NULL AND {sane}) c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """.format(sane=sane_ts_sql("ts")),
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the latest click at or before it.

    Spark has no native ASOF JOIN. The naive spelling (equi-join on user_id
    + `p.ts >= c.ts` range predicate, then window-dedup to the max match)
    materializes purchases×clicks per user BEFORE the dedup — quadratic per
    key in the worst case, and the first query to die on one hot key at
    100× scale (round-1 verdict). This spelling instead carries state
    through a single ordered window scan: union clicks+purchases on the
    shared (user_id, ts) order, and at each purchase row read the most
    recent click timestamp seen so far via `last(..., ignorenulls)` over an
    unbounded-preceding ROWS frame. One shuffle on user_id, zero joins,
    O(events-per-user) per key — a hot user costs one big sort partition
    (linear, spillable), never a quadratic intermediate. Same pattern as
    `join_asof_forward` (DESC mirror). Tie semantics: (user_id, ts) is
    duplicate-free at every sf (verified), and a click at exactly p.ts
    sorts before the purchase via the event_type tiebreak ('click' <
    'purchase'), preserving the inclusive `p.ts >= c.ts` bound; LEFT
    semantics fall out of ignorenulls (no prior click ⇒ NULL click_ts).
    NULL ts dropped on both engines (the r8 NULL-time seam — DuckDB's
    sort-based ASOF treats a NULL probe ts as +inf and matches the LAST
    click, Spark's NULLS FIRST order matches none; an untimestamped
    event has no as-of position).
    """
    # temporal admission contract (tables.sane_ts, r12): a year-9999
    # click would become every later purchase's "latest click", and the
    # carried raw timestamps must stay collectable
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
        & F.col("ts").isNotNull()
        & sane_ts("ts")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_type").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = ev.withColumn(
        "click_ts",
        F.last(
            F.when(F.col("event_type") == "click", F.col("ts")),
            ignorenulls=True,
        ).over(w),
    )
    # SQL join-equality semantics for NULL keys: a NULL-user purchase
    # matches NO click (the ASOF JOIN oracle's p.user_id = c.user_id is
    # never true on NULL), even though the window spelling groups the
    # NULL partition together — suppress the carried value there
    # (NULL-attribute corruption replay)
    return carried.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.when(F.col("user_id").isNotNull(), F.col("click_ts")).alias(
            "click_ts"
        ),
    )


@register(
    "join_multiway",
    CAT,
    """
    SELECT r_name, n_name,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT)))
                AS DOUBLE) / 10000.0 AS revenue,
           COUNT(*) AS n_lineitems
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY r_name, n_name
    """,
)
def join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join (TPC-H Q5 shape): fact→fact equi join shuffles on the
    orderkey/custkey chain; bounded dims broadcast so they add no shuffle.
    Join order: largest (lineitem⋈orders) first on the filtered orders side —
    the date filter lands before the join (Catalyst pushes it), shrinking
    the shuffled build side ~7×."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            # exact scale-1e4 integer revenue (§5.3.6b)
            (
                F.sum(
                    F.expr(
                        "CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)"
                        " * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))"
                    )
                ).cast("double")
                / 10000.0
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


_bucketed_ready: set[str] = set()


@register(
    "join_bucketed",
    CAT,
    """
    SELECT l_orderkey, o_orderdate, o_totalprice,
           ROUND(l_extendedprice * (1 - l_discount), 4) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT' AND {sane}
    """.format(sane=sane_ts_sql("o_orderdate")),
)
def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located fact-fact join via bucketing: both tables are written
    bucketBy(orderkey) + sortBy into the warehouse once; the subsequent join
    reads bucket-aligned files and sort-merge-joins WITHOUT any Exchange —
    the pattern that turns the biggest repeated shuffle in a 100 TB star
    schema into a one-time write cost (verified shuffle-free in
    tests/test_plans.py). Results are identical to the plain join, which is
    what the oracle asserts."""
    tag = sf_dir.strip("/").split("/")[-1].replace(".", "_")
    li_t, o_t = f"li_bkt_{tag}", f"o_bkt_{tag}"
    if tag not in _bucketed_ready:
        import shutil
        from urllib.parse import urlparse

        warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        for name, tbl, key, sort in (
            (li_t, "lineitem", "l_orderkey", "l_orderkey"),
            (o_t, "orders", "o_orderkey", "o_orderkey"),
        ):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            # a previous PROCESS may have left the managed location behind
            # (in-memory catalog forgets it; the directory survives)
            shutil.rmtree(f"{warehouse}/{name}", ignore_errors=True)
            (
                load_table(spark, sf_dir, tbl)
                .write.bucketBy(8, key)
                .sortBy(sort)
                .mode("overwrite")
                .saveAsTable(name)
            )
        _bucketed_ready.add(tag)
    li = spark.table(li_t)
    # sane-window gate on the emitted date (temporal admission, r12):
    # raw out-of-range timestamps are uncollectable driver-side
    o = spark.table(o_t).filter(
        (F.col("o_orderpriority") == "1-URGENT") & sane_ts("o_orderdate")
    )
    return li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "o_orderdate",
        "o_totalprice",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
            "revenue"
        ),
    )


N_SALTS = 8


@register(
    "join_skew_salted",
    CAT,
    """
    SELECT e.user_id, u.cohort, COUNT(*) AS n,
           ROUND(SUM(e.value), 4) AS total_value
    FROM events e
    JOIN (SELECT DISTINCT user_id, user_id % 5 AS cohort FROM events) u
      ON e.user_id = u.user_id
    GROUP BY e.user_id, u.cohort
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manual salting for skewed join keys: the fact side gets a
    deterministic salt = xxhash64(event_id) % N, the dim side is exploded
    ×N, and the join runs on (key, salt) — a hot key's rows spread across N
    reducers instead of one. Result ≡ the unsalted join (the oracle).
    At scale this is the fallback when AQE skew splitting can't help
    (e.g. skewed AGGREGATION keys or stream-static joins); for plain batch
    joins AQE usually makes it unnecessary (session.py enables it)."""
    ev = load_table(spark, sf_dir, "events")
    users = (
        ev.select("user_id").distinct().withColumn("cohort", F.col("user_id") % 5)
    )
    salts = spark.range(N_SALTS).select(F.col("id").cast("int").alias("salt"))
    dim_salted = users.crossJoin(F.broadcast(salts))
    fact_salted = ev.withColumn(
        "salt", F.pmod(F.xxhash64("event_id"), F.lit(N_SALTS)).cast("int")
    )
    joined = fact_salted.join(dim_salted, ["user_id", "salt"])
    return joined.groupBy("user_id", "cohort").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


@register(
    "join_range_bucketized",
    CAT,
    """
    SELECT p.event_id AS purchase_id, c.event_id AS click_id,
           p.user_id
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
      ON c.user_id = p.user_id
     AND c.ts >= p.ts - INTERVAL 2 HOUR AND c.ts < p.ts
    """,
)
def join_range_bucketized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketized time-range join — the 100 TB-safe spelling of a theta
    join when NEITHER side broadcasts (click-attribution: clicks in the
    2 hours before each same-user purchase). The raw range condition plans
    as a nested loop; instead each purchase EXPLODES to the 3 hour-buckets
    its window can touch, each click keys by its own hour-bucket, and the
    join becomes a hash-partitioned EQUI join on (user_id, hour) with the
    exact range as a post-filter. A click's single bucket meets each
    purchase window at most once, so no dedup is needed. Cost: window/slide
    copies of one side; payoff: linear shuffle scaling instead of O(n·m).
    Cites the same pattern SURVEY §4.2 mandates for join_asof at scale."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        F.explode(
            F.expr(
                "sequence(date_trunc('hour', ts - INTERVAL 2 HOUR), "
                "date_trunc('hour', ts), INTERVAL 1 HOUR)"
            )
        ).alias("hour"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.date_trunc("hour", "ts").alias("hour"),
    )
    return (
        p.join(c, (p.user_id == c.c_user) & (p.hour == c.hour))
        .filter(
            (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 2 HOUR"))
            & (F.col("c_ts") < F.col("p_ts"))
        )
        .select("purchase_id", "click_id", "user_id")
    )


@register(
    "join_null_safe",
    CAT,
    """
    WITH a AS (
      SELECT nullif(o_orderstatus, 'P') AS k, COUNT(*) AS n_orders
      FROM orders GROUP BY 1
    ),
    b AS (
      SELECT nullif(l_linestatus, 'F') AS k, COUNT(*) AS n_lines
      FROM lineitem GROUP BY 1
    )
    SELECT a.k AS status_key, a.n_orders, b.n_lines
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi join (`<=>` / IS NOT DISTINCT FROM): NULL keys match
    each other instead of vanishing — required when the join key legitimately
    carries NULL as a value (unknown-bucket rollups, outer-join products).
    Spark plans eqNullSafe as a hash join (the null bucket is just another
    key), NOT a nested loop — same scale behavior as plain equi joins.
    Fixture has no NULLs, so both sides derive them via nullif."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    a = o.groupBy(
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("k")
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    b = li.groupBy(
        F.nullif(F.col("l_linestatus"), F.lit("F")).alias("k")
    ).agg(F.count(F.lit(1)).alias("n_lines"))
    return a.join(b, a.k.eqNullSafe(b.k)).select(
        a.k.alias("status_key"), "n_orders", "n_lines"
    )


@register(
    "join_hint_shuffle_hash",
    CAT,
    """
    SELECT o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(l_quantity * 4, 0) AS BIGINT)) AS DOUBLE) / 4.0
             AS total_qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def join_hint_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planner-control surface: the SHUFFLE_HASH hint forces a shuffled hash
    join where the optimizer would default to broadcast/SMJ. Same result by
    construction — the hint is the knob an operator uses when it KNOWS the
    build side fits executor memory but exceeds the broadcast threshold
    (common for mid-size dims at 100 TB: too big to broadcast, wasteful to
    sort). MERGE/BROADCAST/SHUFFLE_REPLICATE_NL hints ride the same API."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").hint("shuffle_hash")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # exact quarter-scaled quantity sum, unrounded (the flagship
            # sq4 idiom; r11 magnitude lint, 5.3.9a)
            F.expr(
                "CAST(SUM(CAST(ROUND(l_quantity * 4, 0) AS BIGINT))"
                " AS DOUBLE) / 4.0"
            ).alias("total_qty"),
        )
    )


@register(
    "join_asof_forward",
    CAT,
    """
    WITH clicks AS (SELECT user_id, event_id, ts FROM events
                    WHERE event_type = 'click' AND ts IS NOT NULL AND {sane}),
    purchases AS (SELECT user_id, ts FROM events
                  WHERE event_type = 'purchase' AND ts IS NOT NULL AND {sane})
    SELECT c.user_id, c.event_id,
           p.ts AS next_purchase_ts,
           date_diff('second', c.ts, p.ts)::BIGINT AS secs_to_purchase
    FROM clicks c ASOF JOIN purchases p
      ON c.user_id = p.user_id AND p.ts >= c.ts
    """.format(sane=sane_ts_sql("ts")),
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: for every click, the nearest purchase AT OR
    AFTER it by the same user — time-to-conversion, the mirror of the
    backward as-of in `join_asof`. (Safe here because (user_id, ts) is
    duplicate-free at every sf — verified — so the inclusive bound is
    unambiguous.)

    Spark has no native ASOF, and a range join would be a BNLJ — instead
    one DESC-ordered window per user carries the most recent purchase
    timestamp seen while scanning from latest to earliest: at each click
    row that carried value IS the next purchase at-or-after it. One
    shuffle on user_id, zero joins; inner-asof semantics via dropping
    clicks with no later purchase.
    """
    from pyspark.sql.window import Window as W

    # NULL-user rows excluded up front: inner ASOF equality (c.user_id =
    # p.user_id) can never be true on a NULL key, but the window spelling
    # would happily match NULL-user clicks to NULL-user purchases within
    # the NULL partition (NULL-attribute corruption replay)
    # NULL ts dropped too (the r8 NULL-time seam / DuckDB ASOF NULL=+inf)
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
        & F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & sane_ts("ts")  # temporal admission contract (r12)
    )
    # tie discipline (r12 temporal campaign): at EQUAL timestamps the
    # purchase must sort before the click in the DESC scan so the click
    # sees it — mirroring ASOF's inclusive p.ts >= c.ts bound
    # ('purchase' > 'click', so event_type DESC). Clean fixtures are
    # (user_id, ts)-duplicate-free, but corrupted/sentinel data is not.
    w = (
        W.partitionBy("user_id")
        .orderBy(
            F.col("ts").desc(),
            F.col("event_type").desc(),
            F.col("event_id").desc(),
        )
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = ev.withColumn(
        "next_purchase_ts",
        F.last(
            F.when(F.col("event_type") == "purchase", F.col("ts")),
            ignorenulls=True,
        ).over(w),
    )
    return (
        carried.filter(
            (F.col("event_type") == "click")
            & F.col("next_purchase_ts").isNotNull()
        )
        .select(
            "user_id",
            "event_id",
            "next_purchase_ts",
            (
                F.unix_timestamp("next_purchase_ts") - F.unix_timestamp("ts")
            ).alias("secs_to_purchase"),
        )
    )
