"""Differential fuzzing: random filter/group-by queries over `lineitem` and
`events`, generated in a dialect subset valid in BOTH Spark SQL and DuckDB,
executed by both engines and compared with the driver-equivalent
order-insensitive check (SURVEY §5.4).

Deterministic: each case derives from a seeded Random, so failures
reproduce by seed. The generator sticks to the hash-match discipline
(SURVEY §5.3): aggregated doubles ROUND(...,4), no LIMIT without total
order, no float equality predicates.
"""

from __future__ import annotations

import random

import pytest

from .conftest import SF_DIR, assert_matches_oracle

N_CASES = 25

_LINEITEM_NUM = [
    ("l_quantity", 1.0, 50.0),
    ("l_extendedprice", 900.0, 105000.0),
    ("l_discount", 0.0, 0.1),
    ("l_tax", 0.0, 0.08),
]
_LINEITEM_STR = [
    ("l_returnflag", ["A", "N", "R"]),
    ("l_linestatus", ["F", "O"]),
]
_EVENTS_NUM = [("value", 0.0, 200.0), ("user_id", 0, 15)]
_EVENTS_STR = [("event_type", ["click", "purchase", "error", "signup", "view"])]


def _atom(rng: random.Random, num_cols, str_cols) -> str:
    kind = rng.choice(["cmp", "between", "in", "eq"])
    if kind in ("cmp", "between"):
        col, lo, hi = rng.choice(num_cols)
        a = round(rng.uniform(lo, hi), 2)
        b = round(rng.uniform(lo, hi), 2)
        if kind == "cmp":
            op = rng.choice(["<", "<=", ">", ">=", "!="])
            return f"{col} {op} {a}"
        return f"{col} BETWEEN {min(a, b)} AND {max(a, b)}"
    col, domain = rng.choice(str_cols)
    if kind == "in":
        vals = rng.sample(domain, k=rng.randint(1, min(3, len(domain))))
        lst = ", ".join(f"'{v}'" for v in vals)
        return f"{col} IN ({lst})"
    return f"{col} = '{rng.choice(domain)}'"


def _predicate(rng: random.Random, num_cols, str_cols) -> str:
    n = rng.randint(1, 3)
    atoms = [_atom(rng, num_cols, str_cols) for _ in range(n)]
    out = atoms[0]
    for a in atoms[1:]:
        conj = rng.choice(["AND", "OR"])
        neg = "NOT " if rng.random() < 0.2 else ""
        out = f"({out}) {conj} {neg}({a})"
    return out


def gen_query(seed: int) -> str:
    rng = random.Random(seed)
    table = rng.choice(["lineitem", "events"])
    if table == "lineitem":
        num_cols, str_cols = _LINEITEM_NUM, _LINEITEM_STR
        agg_col, key_pool = "l_quantity", ["l_returnflag", "l_linestatus"]
    else:
        num_cols, str_cols = _EVENTS_NUM, _EVENTS_STR
        agg_col, key_pool = "value", ["event_type", "user_id"]
    pred = _predicate(rng, num_cols, str_cols)
    if rng.random() < 0.7:
        keys = ", ".join(rng.sample(key_pool, k=rng.randint(1, len(key_pool))))
        aggs = rng.sample(
            [
                f"COUNT(*) AS n",
                f"ROUND(SUM({agg_col}), 4) AS s",
                f"ROUND(AVG({agg_col}), 4) AS a",
                f"ROUND(MIN({agg_col}), 4) AS mn",
                f"ROUND(MAX({agg_col}), 4) AS mx",
            ],
            k=rng.randint(1, 3),
        )
        return (
            f"SELECT {keys}, {', '.join(aggs)} FROM {table} "
            f"WHERE {pred} GROUP BY {keys}"
        )
    cols = ", ".join(key_pool + [agg_col])
    return f"SELECT {cols} FROM {table} WHERE {pred}"


@pytest.fixture(scope="module")
def spark_views(spark):
    from training_feed_kinesis_spark.tables import load_table

    for t in ("lineitem", "events"):
        load_table(spark, SF_DIR, t).createOrReplaceTempView(t)
    return spark


@pytest.mark.parametrize("seed", range(N_CASES))
def test_fuzz_query(seed, spark_views, duck):
    sql = gen_query(seed)
    # tolerance covers ROUND-boundary flips from cross-engine sum order;
    # real engine bugs produce errors orders of magnitude above 2e-4
    assert_matches_oracle(spark_views.sql(sql), duck, sql, float_tol=2e-4)


_ORDERS_NUM = [("o_totalprice", 1000.0, 450000.0)]
_ORDERS_STR = [
    ("o_orderstatus", ["F", "O", "P"]),
    ("o_orderpriority", ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]),
]

N_JOIN_CASES = 15


def gen_join_query(seed: int) -> str:
    rng = random.Random(10_000 + seed)
    pred_l = _predicate(rng, _LINEITEM_NUM, _LINEITEM_STR)
    pred_o = _predicate(rng, _ORDERS_NUM, _ORDERS_STR)
    if rng.random() < 0.6:
        keys = rng.sample(
            ["l_returnflag", "l_linestatus", "o_orderstatus"], k=rng.randint(1, 2)
        )
        return (
            f"SELECT {', '.join(keys)}, COUNT(*) AS n, "
            f"ROUND(SUM(l_quantity), 4) AS s "
            f"FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            f"WHERE ({pred_l}) AND ({pred_o}) GROUP BY {', '.join(keys)}"
        )
    return (
        f"SELECT l_orderkey, l_linenumber, o_totalprice, l_quantity "
        f"FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        f"WHERE ({pred_l}) AND ({pred_o})"
    )


@pytest.fixture(scope="module")
def spark_join_views(spark):
    from training_feed_kinesis_spark.tables import load_table

    for t in ("lineitem", "orders"):
        load_table(spark, SF_DIR, t).createOrReplaceTempView(t)
    return spark


@pytest.mark.parametrize("seed", range(N_JOIN_CASES))
def test_fuzz_join_query(seed, spark_join_views, duck):
    sql = gen_join_query(seed)
    assert_matches_oracle(spark_join_views.sql(sql), duck, sql, float_tol=2e-4)


N_WINDOW_CASES = 12


def gen_window_query(seed: int) -> str:
    """Random window-function query over events: random predicate, partition
    keys, and function — always totally ordered (event_id tiebreak) so both
    engines agree row-for-row."""
    rng = random.Random(20_000 + seed)
    pred = _predicate(rng, _EVENTS_NUM, _EVENTS_STR)
    part = rng.choice(["user_id", "event_type", "user_id, event_type"])
    direction = rng.choice(["ASC", "DESC"])
    order = rng.choice(["ts", "value"])
    over = f"OVER (PARTITION BY {part} ORDER BY {order} {direction}, event_id)"
    fn = rng.choice(
        [
            f"ROW_NUMBER() {over}",
            f"RANK() {over}",
            f"DENSE_RANK() {over}",
            f"LAG(event_type, 1) {over}",
            f"LEAD(event_type, 1) {over}",
            f"ROUND(SUM(value) {over.replace(')', ' ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)')}, 4)",
        ]
    )
    return (
        f"SELECT event_id, user_id, event_type, {fn} AS w "
        f"FROM events WHERE ({pred})"
    )


@pytest.mark.parametrize("seed", range(N_WINDOW_CASES))
def test_fuzz_window_query(seed, spark_views, duck):
    sql = gen_window_query(seed)
    assert_matches_oracle(spark_views.sql(sql), duck, sql, float_tol=2e-4)


# --- set-operation fuzzing -------------------------------------------------

def gen_setop_query(seed: int) -> str:
    """Random UNION [ALL] / INTERSECT / EXCEPT chain over two filtered
    projections of the same table — same dual-dialect subset, same
    discipline (no floats in the projected key set, so bag semantics hash
    exactly)."""
    rng = random.Random(seed)
    table = rng.choice(["lineitem", "events"])
    if table == "lineitem":
        num_cols, str_cols = _LINEITEM_NUM, _LINEITEM_STR
        # FLOOR before the cast (§5.3.6b): bare CAST(double AS INT)
        # truncates in Spark and rounds in DuckDB
        proj = "l_returnflag, l_linestatus, CAST(FLOOR(l_quantity) AS INT) AS q"
    else:
        num_cols, str_cols = _EVENTS_NUM, _EVENTS_STR
        proj = "event_type, user_id % 7 AS bucket"
    op = rng.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"])
    p1 = _predicate(rng, num_cols, str_cols)
    p2 = _predicate(rng, num_cols, str_cols)
    return (
        f"SELECT {proj} FROM {table} WHERE {p1} "
        f"{op} "
        f"SELECT {proj} FROM {table} WHERE {p2}"
    )


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_setop_query(seed, spark_views, duck):
    sql = gen_setop_query(seed + 9000)
    assert_matches_oracle(spark_views.sql(sql), duck, sql)


# --- HAVING-clause fuzzing -------------------------------------------------

def gen_having_query(seed: int) -> str:
    """Aggregate + HAVING over the shared dialect subset: the post-aggregate
    filter path (Catalyst plans it as Filter over Aggregate; DuckDB
    likewise), fuzzed with count/sum thresholds."""
    rng = random.Random(seed)
    table = rng.choice(["lineitem", "events"])
    if table == "lineitem":
        num_cols, str_cols = _LINEITEM_NUM, _LINEITEM_STR
        agg_col, key_pool = "l_quantity", ["l_returnflag", "l_linestatus"]
    else:
        num_cols, str_cols = _EVENTS_NUM, _EVENTS_STR
        agg_col, key_pool = "value", ["event_type", "user_id"]
    pred = _predicate(rng, num_cols, str_cols)
    keys = ", ".join(rng.sample(key_pool, k=rng.randint(1, len(key_pool))))
    hav = rng.choice(
        [
            f"COUNT(*) > {rng.randint(1, 40)}",
            f"COUNT(*) BETWEEN {rng.randint(1, 5)} AND {rng.randint(20, 200)}",
            # FLOOR before the cast: bare CAST(double AS INT) DIVERGES
            # (Spark truncates toward zero, DuckDB rounds to nearest —
            # r6 deep-fuzz seed 24 caught a group crossing the HAVING
            # threshold in one engine only); floored integer-valued
            # double sums are exact in IEEE and engine-identical
            f"SUM(CAST(FLOOR({agg_col}) AS BIGINT)) > {rng.randint(10, 2000)}",
        ]
    )
    return (
        f"SELECT {keys}, COUNT(*) AS n, ROUND(SUM({agg_col}), 4) AS s "
        f"FROM {table} WHERE {pred} GROUP BY {keys} HAVING {hav}"
    )


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_having_query(seed, spark_views, duck):
    sql = gen_having_query(seed + 17000)
    assert_matches_oracle(spark_views.sql(sql), duck, sql, float_tol=2e-4)


# --- composite predicates × aggregates × joins fuzzing (VERDICT r4 item 6) --

_CUSTOMER_NUM = [("c_acctbal", -900.0, 9900.0)]
_CUSTOMER_STR = [
    (
        "c_mktsegment",
        ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"],
    )
]

N_COMPOSITE_CASES = 100


def _aggs(rng: random.Random, col: str, distinct_col: str) -> list[str]:
    """Random aggregate list; null-sensitive variants (COUNT(col),
    COUNT(DISTINCT)) included deliberately — LEFT joins produce NULL
    right-side rows, the place engines disagree if anything is off."""
    pool = [
        "COUNT(*) AS n",
        f"COUNT({col}) AS n_nonnull",
        f"COUNT(DISTINCT {distinct_col}) AS n_dist",
        f"ROUND(SUM({col}), 4) AS s",
        f"ROUND(AVG({col}), 4) AS a",
        f"ROUND(MIN({col}), 4) AS mn",
        f"ROUND(MAX({col}), 4) AS mx",
    ]
    return rng.sample(pool, k=rng.randint(2, 4))


def gen_composite_query(seed: int) -> str:
    """One generator spanning the full predicate × aggregate × join grid
    over events + orders + lineitem (+customer): shapes are 2-way inner,
    2-way LEFT (right-side predicate in the ON clause, so LEFTness is
    preserved), 3-way inner star, and single-table events with the richer
    aggregate set. Group keys may come from the NULL-producing side."""
    rng = random.Random(30_000 + seed)
    shape = rng.choice(["lo_inner", "lo_left", "loc_star", "events"])
    if shape == "events":
        pred = _predicate(rng, _EVENTS_NUM, _EVENTS_STR)
        keys = rng.sample(["event_type", "user_id"], k=rng.randint(1, 2))
        aggs = _aggs(rng, "value", "user_id")
        return (
            f"SELECT {', '.join(keys)}, {', '.join(aggs)} FROM events "
            f"WHERE {pred} GROUP BY {', '.join(keys)}"
        )
    pred_l = _predicate(rng, _LINEITEM_NUM, _LINEITEM_STR)
    pred_o = _predicate(rng, _ORDERS_NUM, _ORDERS_STR)
    if shape == "lo_left":
        # orders LEFT JOIN lineitem: the lineitem predicate must live in
        # the ON clause or the WHERE filter silently re-inners the join
        keys = rng.sample(
            ["o_orderstatus", "o_orderpriority", "l_returnflag"],
            k=rng.randint(1, 2),
        )
        aggs = _aggs(rng, "l_quantity", "l_linestatus")
        return (
            f"SELECT {', '.join(keys)}, {', '.join(aggs)} "
            f"FROM orders LEFT JOIN lineitem "
            f"ON l_orderkey = o_orderkey AND ({pred_l}) "
            f"WHERE ({pred_o}) GROUP BY {', '.join(keys)}"
        )
    if shape == "loc_star":
        pred_c = _predicate(rng, _CUSTOMER_NUM, _CUSTOMER_STR)
        keys = rng.sample(
            ["c_mktsegment", "o_orderstatus", "l_returnflag"],
            k=rng.randint(1, 2),
        )
        aggs = _aggs(rng, "l_extendedprice", "o_orderpriority")
        return (
            f"SELECT {', '.join(keys)}, {', '.join(aggs)} "
            f"FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            f"JOIN customer ON o_custkey = c_custkey "
            f"WHERE ({pred_l}) AND ({pred_o}) AND ({pred_c}) "
            f"GROUP BY {', '.join(keys)}"
        )
    keys = rng.sample(
        ["l_returnflag", "l_linestatus", "o_orderstatus"], k=rng.randint(1, 2)
    )
    aggs = _aggs(rng, "l_quantity", "o_orderpriority")
    return (
        f"SELECT {', '.join(keys)}, {', '.join(aggs)} "
        f"FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        f"WHERE ({pred_l}) AND ({pred_o}) GROUP BY {', '.join(keys)}"
    )


@pytest.fixture(scope="module")
def spark_composite_views(spark):
    from training_feed_kinesis_spark.tables import load_table

    for t in ("lineitem", "orders", "customer", "events"):
        load_table(spark, SF_DIR, t).createOrReplaceTempView(t)
    return spark


@pytest.mark.parametrize("seed", range(N_COMPOSITE_CASES))
def test_fuzz_composite_query(seed, spark_composite_views, duck):
    sql = gen_composite_query(seed)
    assert_matches_oracle(
        spark_composite_views.sql(sql), duck, sql, float_tol=2e-4
    )


# --- IN / EXISTS subquery fuzzing (round 6) ---------------------------------
# The semi/anti-join decorrelation path: none of the other generators
# produce subqueries, yet IN / NOT IN / EXISTS / NOT EXISTS each plan as
# a different join (left-semi, left-anti, correlated semi, correlated
# anti) with their own null-handling traps. Kept to non-NULL key columns
# (l_orderkey / o_orderkey) so NOT IN's three-valued-NULL semantics —
# identical in both engines but vacuous-empty the moment a NULL enters
# the subquery — can't mask real divergence. Scalar subqueries compare
# against MAX/MIN only (exact, order-independent); AVG scalars would
# re-introduce the reduction-order boundary class the §5.3.6b campaign
# removed.

N_SUBQUERY_CASES = 12


def gen_subquery_query(seed: int) -> str:
    rng = random.Random(40_000 + seed)
    pred_l = _predicate(rng, _LINEITEM_NUM, _LINEITEM_STR)
    pred_o = _predicate(rng, _ORDERS_NUM, _ORDERS_STR)
    keys = ", ".join(
        rng.sample(["o_orderstatus", "o_orderpriority"], k=rng.randint(1, 2))
    )
    shape = rng.choice(["in", "not_in", "exists", "not_exists", "scalar"])
    if shape == "in":
        where = (
            f"o_orderkey IN (SELECT l_orderkey FROM lineitem "
            f"WHERE {pred_l})"
        )
    elif shape == "not_in":
        where = (
            f"o_orderkey NOT IN (SELECT l_orderkey FROM lineitem "
            f"WHERE {pred_l})"
        )
    elif shape == "exists":
        where = (
            f"EXISTS (SELECT 1 FROM lineitem "
            f"WHERE l_orderkey = o_orderkey AND ({pred_l}))"
        )
    elif shape == "not_exists":
        where = (
            f"NOT EXISTS (SELECT 1 FROM lineitem "
            f"WHERE l_orderkey = o_orderkey AND ({pred_l}))"
        )
    else:
        agg = rng.choice(["MAX", "MIN"])
        op = rng.choice(["<", ">="])
        where = (
            f"o_totalprice {op} 0.5 * (SELECT {agg}(o_totalprice) "
            f"FROM orders WHERE {pred_o})"
        )
        pred_o = _predicate(rng, _ORDERS_NUM, _ORDERS_STR)
    return (
        f"SELECT {keys}, COUNT(*) AS n, "
        # CAST ... AS DOUBLE before the division: a bare 100.0 literal is
        # DECIMAL to Spark, and BIGINT/DECIMAL stays Decimal-typed
        f"CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS DOUBLE)"
        f" / 100.0 AS s "
        f"FROM orders WHERE ({pred_o}) AND ({where}) GROUP BY {keys}"
    )


@pytest.mark.parametrize("seed", range(N_SUBQUERY_CASES))
def test_fuzz_subquery_query(seed, spark_join_views, duck):
    sql = gen_subquery_query(seed)
    assert_matches_oracle(spark_join_views.sql(sql), duck, sql, float_tol=2e-4)


# --- window FRAME fuzzing (round 6) -----------------------------------------
# The frame path (ROWS/RANGE BETWEEN) is the one window surface the base
# window fuzz pins to a single fixed cumulative frame. ROWS frames get a
# unique total order (event_id tiebreak); RANGE frames order by exact
# integer cents so peer groups and integer offsets mean the same thing
# to both engines, and frame SUMs aggregate BIGINTs — exact in any
# accumulation order the engines choose.

N_FRAME_CASES = 12

_CENTS = "CAST(ROUND(value * 100, 0) AS BIGINT)"


def gen_frame_query(seed: int) -> str:
    rng = random.Random(50_000 + seed)
    pred = _predicate(rng, _EVENTS_NUM, _EVENTS_STR)
    part = rng.choice(["user_id", "event_type", "user_id, event_type"])
    kind = rng.choice(["count", "sum", "min", "max"])
    if rng.random() < 0.5:
        a, b = rng.randint(0, 5), rng.randint(0, 5)
        frame = f"ROWS BETWEEN {a} PRECEDING AND {b} FOLLOWING"
        over = f"PARTITION BY {part} ORDER BY ts, event_id {frame}"
    else:
        off = rng.choice([100, 500, 1000, 5000])
        tail = rng.choice(["CURRENT ROW", f"{off} FOLLOWING"])
        frame = f"RANGE BETWEEN {off} PRECEDING AND {tail}"
        over = f"PARTITION BY {part} ORDER BY {_CENTS} {frame}"
    if kind == "count":
        w = f"COUNT(*) OVER ({over})"
    elif kind == "sum":
        # post-cast to DOUBLE: DuckDB widens windowed SUM(BIGINT) to
        # HUGEINT (pandas float) where Spark keeps int64 — the same
        # representation-class trap the registered keys cast away
        w = f"CAST(SUM({_CENTS}) OVER ({over}) AS DOUBLE) / 100.0"
    else:
        w = f"{kind.upper()}({_CENTS}) OVER ({over})"
    return (
        f"SELECT event_id, user_id, {w} AS w "
        f"FROM events WHERE ({pred})"
    )


@pytest.mark.parametrize("seed", range(N_FRAME_CASES))
def test_fuzz_frame_query(seed, spark_views, duck):
    sql = gen_frame_query(seed)
    assert_matches_oracle(spark_views.sql(sql), duck, sql, float_tol=2e-4)


N_MAGNITUDE_CASES = 12

# §5.3.6c magnitude fuzz: whale-cents pipelines over an inline VALUES
# table, exercising the DECIMAL(38,0)-widened money spellings (grouped
# totals, cumulative windows, threshold cross-multiplications, the
# TRY_CAST representability gate) at magnitudes where a bare int64
# accumulator would diverge non-comparably (Spark ARITHMETIC_OVERFLOW
# vs DuckDB HUGEINT). Same-text SQL, valid in both engines.

_MAG_TIERS = [
    (0, 10**6),            # ordinary cents
    (10**12, 10**15),      # large but far from the edge
    (10**18, 4 * 10**18),  # whales: two of them exceed int64 together
]


def _mag_rows(rng: random.Random):
    n = rng.randint(8, 20)
    rows = []
    for i in range(1, n + 1):
        lo, hi = rng.choice(_MAG_TIERS)
        c = rng.randint(lo, hi)
        if rng.random() < 0.25:
            c = -c
        if rng.random() < 0.1:
            c = 0
        g = rng.choice(["a", "b", "c"][: rng.randint(2, 3)])
        rows.append((i, g, c))
    # guarantee at least two same-sign whales so every corpus-total
    # accumulation really crosses 2^63
    rows[0] = (rows[0][0], rows[0][1], rng.randint(5 * 10**18, 6 * 10**18))
    rows[1] = (rows[1][0], rows[1][1], rng.randint(5 * 10**18, 6 * 10**18))
    return rows


def _mag_cte(rows) -> str:
    vals = ", ".join(f"({i}, '{g}', {c})" for i, g, c in rows)
    return f"WITH t(id, g, c) AS (VALUES {vals})"


def gen_magnitude_query(seed: int) -> str:
    rng = random.Random(60_000 + seed)
    cte = _mag_cte(_mag_rows(rng))
    dec = "CAST(c AS DECIMAL(38,0))"
    shape = rng.choice(["grouped", "cusum", "classify", "gate"])
    if shape == "grouped":
        return (
            f"{cte} SELECT g, COUNT(*) AS n, "
            f"CAST(SUM({dec}) AS DOUBLE) / 100.0 AS total, "
            f"MAX(c) AS mx, MIN(c) AS mn "
            f"FROM t GROUP BY g"
        )
    if shape == "cusum":
        return (
            f"{cte}, p AS ("
            f"  SELECT id, SUM({dec}) OVER ("
            f"    ORDER BY id ROWS UNBOUNDED PRECEDING) AS pfx FROM t) "
            f"SELECT id, CAST(pfx AS DOUBLE) AS pfx_d, "
            f"CAST(pfx - MIN(pfx) OVER ("
            f"  ORDER BY id ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS s_d "
            f"FROM p"
        )
    if shape == "classify":
        k1 = rng.randint(2, 10)
        k2 = rng.randint(1, k1 - 1)
        return (
            f"{cte}, s AS ("
            f"  SELECT id, c, SUM({dec}) OVER ("
            f"    ORDER BY c DESC, id ASC ROWS UNBOUNDED PRECEDING"
            f"  ) AS cum, SUM({dec}) OVER () AS tot FROM t) "
            f"SELECT CASE WHEN cum * {k1} <= tot * {k2} THEN 'head' "
            f"ELSE 'tail' END AS cls, COUNT(*) AS n, "
            f"CAST(SUM({dec}) AS DOUBLE) AS cls_total "
            f"FROM s GROUP BY 1"
        )
    # gate: the census spelling itself — doubles with NaN/Inf/overflow
    # planted, TRY_CAST as the shared representability detector
    doubles = []
    for i in range(1, rng.randint(8, 14)):
        kind = rng.random()
        if kind < 0.15:
            v = "CAST('NaN' AS DOUBLE)"
        elif kind < 0.3:
            v = rng.choice(["CAST('Infinity' AS DOUBLE)",
                            "CAST('-Infinity' AS DOUBLE)"])
        elif kind < 0.45:
            v = f"{rng.choice([1, -1]) * rng.uniform(1e17, 1e300):.6e}"
        elif kind < 0.55:
            v = "CAST(NULL AS DOUBLE)"
        else:
            v = f"{rng.uniform(-1e9, 1e9):.2f}"
        doubles.append(f"({i}, {v})")
    cap = 10 ** rng.randint(11, 14)
    cents = "TRY_CAST(ROUND(v * 100, 0) AS BIGINT)"
    return (
        f"WITH d(id, v) AS (VALUES {', '.join(doubles)}) "
        f"SELECT COUNT(*) AS n_rows, "
        f"CAST(COALESCE(SUM(CASE WHEN v IS NULL THEN 1 END), 0)"
        f"     AS BIGINT) AS n_null, "
        f"CAST(COALESCE(SUM(CASE WHEN v IS NOT NULL AND {cents} IS NULL"
        f"     THEN 1 END), 0) AS BIGINT) AS n_unrepresentable, "
        f"CAST(COALESCE(SUM(CASE WHEN ABS({cents}) > {cap} THEN 1 END),"
        f"     0) AS BIGINT) AS n_over_cap, "
        f"MAX(ABS({cents})) AS max_abs_cents "
        f"FROM d"
    )


@pytest.mark.parametrize("seed", range(N_MAGNITUDE_CASES))
def test_fuzz_magnitude_query(seed, spark_views, duck):
    sql = gen_magnitude_query(seed)
    assert_matches_oracle(spark_views.sql(sql), duck, sql, float_tol=2e-4)
