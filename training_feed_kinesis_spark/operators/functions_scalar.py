"""§2.H Scalar function families — one composite query per family.

Every function call here is a built-in `pyspark.sql.functions` expression:
JVM-side, inside whole-stage codegen, never a Python UDF. Oracles mind the
dialect traps catalogued in SURVEY §5.3.6 (regex kept POSIX-simple, no
weekofyear, transcendental outputs rounded to 4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table, sane_ts, sane_ts_sql
from ._json_compat import (INT_RE, duck_json_int, duck_json_string, spark_json_int, spark_json_string)

CAT = "2.H scalar functions"


@register(
    "fn_string",
    CAT,
    """
    SELECT p_partkey,
           upper(p_name)                          AS name_upper,
           lower(p_brand)                         AS brand_lower,
           trim('  ' || p_name || ' ')            AS name_trimmed,
           substring(p_name, 1, 5)                AS name_prefix,
           p_name || '/' || p_type                AS name_type,
           length(p_name)                         AS name_len,
           lpad(CAST(p_size AS VARCHAR), 4, '0')  AS size_padded,
           string_split(p_name, ' ')[1]           AS first_word
    FROM part
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias(
            "name_trimmed"
        ),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.concat_ws("/", "p_name", "p_type").alias("name_type"),
        F.length("p_name").alias("name_len"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.split("p_name", " ").getItem(0).alias("first_word"),
    )


@register(
    "fn_regex",
    CAT,
    """
    SELECT p_partkey, p_brand,
           CAST(regexp_extract(p_brand, 'Brand#([0-9]+)', 1) AS INT) AS brand_num,
           regexp_replace(p_name, '[aeiou]', '*', 'g')               AS name_masked
    FROM part
    WHERE regexp_matches(p_name, '(bolt|ring|widget)')
    """,
)
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.filter(F.col("p_name").rlike("(bolt|ring|widget)")).select(
        "p_partkey",
        "p_brand",
        F.regexp_extract("p_brand", r"Brand#([0-9]+)", 1).cast("int").alias(
            "brand_num"
        ),
        F.regexp_replace("p_name", "[aeiou]", "*").alias("name_masked"),
    )


@register(
    "fn_string_dist",
    CAT,
    """
    SELECT n_name, r_name, levenshtein(n_name, r_name) AS edit_dist
    FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
)
def fn_string_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    return n.join(r, n.n_regionkey == r.r_regionkey).select(
        "n_name", "r_name", F.levenshtein("n_name", "r_name").alias("edit_dist")
    )


@register(
    "fn_date",
    CAT,
    """
    SELECT event_id,
           year(ts)                                   AS y,
           month(ts)                                  AS mo,
           day(ts)                                    AS d,
           hour(ts)                                   AS h,
           date_trunc('day', ts)                      AS day_start,
           ts + INTERVAL 36 HOUR                      AS ts_plus_36h,
           date_diff('day', TIMESTAMP '2024-01-01', ts) AS days_since_start,
           CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS unix_sec
    FROM events WHERE event_type = 'signup' AND {sane}
    """.format(sane=sane_ts_sql("ts")),
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family. unix_timestamp truncates to seconds in Spark, so the
    oracle truncates before epoch(); avoid weekofyear (ISO rules differ).
    Gated on the temporal admission contract (tables.sane_ts, r12): the
    emitted interval arithmetic overflows year 9999 and the raw timestamp
    columns must stay collectable (pandas ns / Python datetime bounds)."""
    ev = load_table(spark, sf_dir, "events").filter(
        (F.col("event_type") == "signup") & sane_ts("ts")
    )
    return ev.select(
        "event_id",
        F.year("ts").alias("y"),
        F.month("ts").alias("mo"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.date_trunc("day", "ts").alias("day_start"),
        (F.col("ts") + F.expr("INTERVAL 36 HOURS")).alias("ts_plus_36h"),
        F.datediff(F.col("ts"), F.lit("2024-01-01")).alias("days_since_start"),
        F.unix_timestamp("ts").alias("unix_sec"),
    )


@register(
    "fn_math",
    CAT,
    """
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice, 1)                       AS price_r1,
           CAST(FLOOR(l_quantity) AS BIGINT)               AS qty_floor,
           CAST(CEIL(l_discount * 100) AS BIGINT)          AS disc_pct_ceil,
           ABS(l_discount - 0.05)                          AS disc_dev,
           ROUND(POW(l_quantity, 2), 4)                    AS qty_sq,
           ROUND(LN(l_extendedprice), 4)                   AS price_ln,
           ROUND(LOG10(l_extendedprice), 4)                AS price_log10,
           ROUND(SQRT(l_quantity), 4)                      AS qty_sqrt,
           CAST(SIGN(l_discount - 0.05) AS INT)            AS disc_sign,
           CAST(FLOOR(l_quantity) AS INT) % 7              AS qty_mod7
    FROM lineitem WHERE l_linenumber = 2
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family. pmod ≡ % for non-negative operands (quantities are >0);
    transcendentals (ln/log10/pow/sqrt) rounded to 4 — libm last-ulp may
    differ across engines. Division-by-zero guards live in fn_conditional."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 2)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.floor("l_quantity").alias("qty_floor"),
        F.ceil(F.col("l_discount") * 100).alias("disc_pct_ceil"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.round(F.pow("l_quantity", F.lit(2)), 4).alias("qty_sq"),
        F.round(F.log("l_extendedprice"), 4).alias("price_ln"),
        F.round(F.log10("l_extendedprice"), 4).alias("price_log10"),
        F.round(F.sqrt("l_quantity"), 4).alias("qty_sqrt"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("disc_sign"),
        F.pmod(F.floor("l_quantity").cast("int"), F.lit(7)).alias("qty_mod7"),
    )


@register(
    "fn_array",
    CAT,
    """
    SELECT vec_id,
           pos,
           ROUND(CAST(embedding[pos] AS DOUBLE), 4) AS val,
           len(embedding)                           AS n_dims,
           ROUND(CAST(list_max(embedding) AS DOUBLE), 4) AS max_elem
    -- NULL vectors emit zero rows: Spark's posexplode drops them, where
    -- a bare cross join against the pos grid would keep them on the
    -- oracle side only (vec-reingest corruption replay)
    FROM embeddings
    CROSS JOIN (SELECT unnest([1, 2, 3, 4]) AS pos) p
    WHERE embedding IS NOT NULL
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family: slice + posexplode (→ 4 rows/vector), size, array_max."""
    em = load_table(spark, sf_dir, "embeddings")
    return em.select(
        "vec_id",
        F.posexplode(F.slice("embedding", 1, 4)).alias("pos0", "raw_val"),
        F.size("embedding").alias("n_dims"),
        F.round(F.array_max("embedding").cast("double"), 4).alias("max_elem"),
    ).select(
        "vec_id",
        (F.col("pos0") + 1).alias("pos"),
        F.round(F.col("raw_val").cast("double"), 4).alias("val"),
        "n_dims",
        "max_elem",
    )


@register(
    "fn_array_hof",
    CAT,
    """
    SELECT vec_id,
           ROUND(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS norm_sq,
           len(list_filter(embedding, x -> x > 0))                AS n_positive,
           ROUND(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE))), 4)                     AS elem_sum
    FROM embeddings
    """,
)
def fn_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (the JVM-side alternative to a Python UDF
    for vector math): aggregate-fold for norm², filter+size, element sum.
    Both engines fold left-to-right over 64 doubles → bit-identical sums.

    NULL-component contract (r12 payload-extremes campaign): DuckDB's
    ``list_sum`` SKIPS NULL elements and returns NULL for an all-NULL or
    empty list, while a raw ``aggregate`` fold NULL-poisons on the first
    NULL element — so the fold runs over the NULL-filtered array, with a
    no-non-NULL-elements guard emitting NULL to match ``list_sum``."""
    em = load_table(spark, sf_dir, "embeddings")

    def fold_sum(term: str):
        # list_sum semantics: skip NULLs, NULL when nothing to sum
        return F.expr(
            "CASE WHEN size(filter(embedding, x -> x IS NOT NULL)) > 0"
            " THEN aggregate(filter(embedding, x -> x IS NOT NULL), 0D,"
            f" (acc, x) -> acc + {term}) END"
        )

    return em.select(
        "vec_id",
        F.round(fold_sum("CAST(x AS DOUBLE) * CAST(x AS DOUBLE)"), 4).alias("norm_sq"),
        F.size(F.expr("filter(embedding, x -> x > 0)")).alias("n_positive"),
        F.round(fold_sum("CAST(x AS DOUBLE)"), 4).alias("elem_sum"),
    )


@register(
    "fn_map",
    CAT,
    f"""
    SELECT event_id,
           {duck_json_int('props', '$.k')} AS k_value,
           -- keys SORTED (Spark side sorts; DuckDB json_keys is document
           -- order), json_valid-guarded (invalid JSON must be NULL, not an
           -- error), OBJECT-gated (valid scalar/array JSON like '42' or
           -- '[1,2]' gives json_keys = [] here but a NULL map on the Spark
           -- side — ADVICE r5), and COALESCEd to '' for the
           -- legitimately-empty {{}} payload (DuckDB array_to_string([])
           -- is NULL, Spark '')
           CASE WHEN props IS NULL OR NOT json_valid(props) THEN NULL
                WHEN json_type(props) <> 'OBJECT' THEN NULL
                ELSE COALESCE(
                       array_to_string(list_sort(json_keys(props)), ','), '')
           END AS prop_keys
    FROM events WHERE event_type = 'click'
    """,
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family over parsed JSON props: from_json → MapType,
    try_element_at, map_keys (sorted for cross-engine stability).
    Malformation-hardened (tests/test_null_injection.py): the map parses
    values as STRING — a map<string,int> parse of a non-numeric value
    nulls the ENTIRE map in PERMISSIVE mode, losing the keys the oracle
    still sees — then the k value try_casts (garbage → NULL identically
    on both engines) and try_element_at tolerates the missing key that
    ANSI element_at would throw on. VALID non-object JSON ('42',
    '[1,2]', '"s"', 'null', 'true') parses to a NULL map here while
    DuckDB's json_keys returns [] — the oracle gates on
    json_type = 'OBJECT' to match (ADVICE r5), and the null-injection
    fixture plants exactly those payloads."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    m = F.from_json("props", "map<string,string>")
    return ev.select(
        "event_id",
        F.when(
            F.try_element_at(m, F.lit("k")).rlike(INT_RE),
            F.try_element_at(m, F.lit("k")).try_cast("int"),
        ).alias("k_value"),
        # NULL props stays NULL (DuckDB json_keys(NULL) is NULL, but
        # Spark's chain collapses it to '') — '' is reserved for the
        # legitimately-empty {} payload
        F.when(
            F.col("props").isNotNull(),
            F.array_join(F.sort_array(F.map_keys(m)), ","),
        ).alias("prop_keys"),
    )


@register(
    "fn_json",
    CAT,
    f"""
    SELECT event_id,
           {duck_json_string('props', '$.k')} AS k_str,
           {duck_json_int('props', '$.k')} AS k_int,
           {duck_json_string('props', '$.missing')} AS missing_attr
    FROM events WHERE event_type = 'error'
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRY_CAST, not CAST, on the extracted value: a non-numeric payload
    must yield NULL identically on both engines (plain CAST errors under
    ANSI Spark AND DuckDB — but not identically; tests/test_null_injection
    replays exactly that corruption). k_str goes through the shared
    STRING spelling (_json_compat): the engines' raw extractions differ
    on non-string scalars (unquoted NaN → 'NaN' on DuckDB, NULL on
    Spark — the round-6 fixture arm that caught this), so only
    unambiguously stringy scalars pass as text."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "error")
    return ev.select(
        "event_id",
        spark_json_string("props", "$.k").alias("k_str"),
        spark_json_int("props", "$.k").alias("k_int"),
        spark_json_string("props", "$.missing").alias("missing_attr"),
    )


@register(
    "fn_conditional",
    CAT,
    """
    SELECT o_orderkey,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN')    AS status_label,
           GREATEST(o_totalprice, 100000.0)                AS price_floor,
           LEAST(o_totalprice, 500000.0)                   AS price_cap,
           ROUND(o_totalprice / NULLIF(0.0, 0.0), 4)       AS div_by_null,
           IFNULL(NULLIF(o_orderstatus, o_orderstatus), 'same') AS nvl_demo
    FROM orders WHERE o_orderstatus != 'F'
    """,
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional family. Division-by-zero guard: Spark (ANSI off) yields
    NULL, DuckDB errors — NULLIF(den, 0) makes both NULL (SURVEY §5.3.6)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "F")
    return o.select(
        "o_orderkey",
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")).alias(
            "status_label"
        ),
        F.greatest("o_totalprice", F.lit(100000.0)).alias("price_floor"),
        F.least("o_totalprice", F.lit(500000.0)).alias("price_cap"),
        F.round(F.col("o_totalprice") / F.nullif(F.lit(0.0), F.lit(0.0)), 4).alias(
            "div_by_null"
        ),
        F.ifnull(
            F.nullif("o_orderstatus", F.col("o_orderstatus")), F.lit("same")
        ).alias("nvl_demo"),
    )


@register(
    "fn_hash",
    CAT,
    """
    SELECT doc_id,
           md5(text)                                    AS h_md5,
           sha256(text)                                 AS h_sha256,
           substr(md5(lang || ':' || source), 1, 16)    AS h_composite
    FROM documents WHERE doc_id < 100
    """,
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic hash family (md5 / sha256 / composite-key hashing) —
    the substrate for content addressing, dedup keys, and deterministic
    salts. Engine-portable hex output (lowercase both engines). xxhash64
    is the faster JVM-side choice for non-portable internal keys (used in
    join_skew_salted); it has no DuckDB twin, so the oracled family here
    sticks to the portable pair."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    comp = F.md5(F.concat(F.col("lang"), F.lit(":"), F.col("source")))
    return d.select(
        "doc_id",
        F.md5("text").alias("h_md5"),
        F.sha2("text", 256).alias("h_sha256"),
        F.substring(comp, 1, 16).alias("h_composite"),
    )


@register(
    "fn_struct",
    CAT,
    """
    SELECT lang,
           COUNT(DISTINCT (lang, source))               AS n_src_structs,
           MIN(struct_pack(a := source, b := n_chars).a) AS first_source,
           CAST(MAX(struct_pack(a := source,
                                b := n_chars).b) AS BIGINT) AS max_inner_chars
    FROM documents
    GROUP BY lang
    """,
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-struct family: struct construction, field access (dot path),
    and struct-valued DISTINCT (whole-row equality semantics) — the column
    shape multimodal/metadata records use. Structs are flattened in
    Tungsten's columnar layout, so field access and struct equality stay
    inside whole-stage codegen at any scale."""
    d = load_table(spark, sf_dir, "documents")
    s = F.struct(F.col("source").alias("a"), F.col("n_chars").alias("b"))
    return d.groupBy("lang").agg(
        F.countDistinct(F.struct("lang", "source")).alias("n_src_structs"),
        F.min(s.getField("a")).alias("first_source"),
        F.max(s.getField("b")).cast("bigint").alias("max_inner_chars"),
    )


@register(
    "fn_bitwise",
    CAT,
    """
    SELECT event_id,
           user_id & 255                       AS masked,
           CAST(user_id << 2 AS BIGINT)        AS shifted,
           xor(user_id, event_id)              AS xored,
           CAST(bit_count(user_id) AS BIGINT)  AS popcount
    FROM events WHERE event_type = 'signup'
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family: AND-mask, shift, XOR, population count — the
    primitives under hash partitioning, bloom-style membership bits, and
    SimHash-style sketches. All codegen'd integer ops, scale-free."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "signup"
    )
    return ev.select(
        "event_id",
        F.expr("user_id & 255").alias("masked"),
        F.expr("shiftleft(user_id, 2)").cast("bigint").alias("shifted"),
        F.expr("user_id ^ event_id").alias("xored"),
        F.bit_count("user_id").cast("bigint").alias("popcount"),
    )


@register(
    "fn_trig",
    CAT,
    """
    SELECT event_id,
           ROUND(sin(value / 100), 4)            AS s,
           ROUND(cos(value / 100), 4)            AS c,
           ROUND(atan2(value, 100), 4)           AS a2,
           ROUND(degrees(value / 100), 4)        AS deg,
           ROUND(exp(-value / 100), 4)           AS decay
    FROM events WHERE event_type = 'click' AND user_id = 0
    """,
)
def fn_trig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigonometric / transcendental family (sin, cos, atan2, degrees,
    exp) — the math under positional encodings, geo features, and decay
    weighting. ROUND(.,4) absorbs last-ulp libm differences between
    engines; all codegen'd scalar ops."""
    ev = load_table(spark, sf_dir, "events").filter(
        (F.col("event_type") == "click") & (F.col("user_id") == 0)
    )
    v = F.col("value") / 100
    return ev.select(
        "event_id",
        F.round(F.sin(v), 4).alias("s"),
        F.round(F.cos(v), 4).alias("c"),
        F.round(F.atan2(F.col("value"), F.lit(100)), 4).alias("a2"),
        F.round(F.degrees(v), 4).alias("deg"),
        F.round(F.exp(-v), 4).alias("decay"),
    )
