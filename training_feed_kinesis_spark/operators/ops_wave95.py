"""Wave 95 (round 6): typed payloads, star integrity, and pipeline
estimation — nine oracled keys closing genuine surface gaps.

  * ``fn_json_typed`` / ``dq_payload_type_census``: the first consumers
    of the round-6 double/string ``_json_compat`` spellings — row-level
    typed extraction and the per-event-type payload-typing census an
    ingest gate runs before trusting a JSON field's type.
  * ``dq_orphan_census`` / ``dq_duplicate_pk_census``: referential and
    key-uniqueness audits over the relational star — the DQ gates the
    round-6 star-corruption fixtures (tests/test_null_injection.py)
    stress from the consumer side.
  * ``sample_poisson_bootstrap``: deterministic hash-Poisson(1) online
    bootstrap replicates (Chamandy et al., "Estimating Uncertainty for
    Massive Data Streams", Google 2012 — the Poissonized resample that
    needs no shuffle and no fixed-n).
  * ``vec_hnsw_level_plan``: HNSW layer-assignment manifest (Malkov &
    Yashunin 2016): geometric level draw P(level ≥ k) = (1/M)^k spelled
    as clean hex-prefix thresholds at M=16.
  * ``llm_pii_redact_apply``: the redaction counterpart of
    dq_pii_census — RE2∩Java email/phone patterns applied to document
    text, with planted-fixture proof the kernels fire identically.
  * ``ts_pinball_loss``: quantile-forecast backtest (pinball loss) for
    trailing-window empirical P10/P50/P90 — integer-cents exact until
    the final mean.
  * ``llm_truncation_loss``: token loss at context-window truncation
    per candidate length — the first number a packing strategy needs.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load_table
from ._json_compat import (
    duck_json_double,
    duck_json_int,
    duck_json_string,
    spark_json_double,
    spark_json_int,
    spark_json_string,
)

CAT_FN = "2.H scalar functions"
CAT_DQ = "2.L data quality"
CAT_SAMPLE = "2.L sampling"
CAT_VEC = "2.J llm-pipeline (similarity)"
CAT_TEXT = "2.J llm-pipeline (text)"
CAT_TS = "2.L time-series analytics"


@register(
    "fn_json_typed",
    CAT_FN,
    f"""
    SELECT event_id,
           {duck_json_int('props', '$.k')} AS k_int,
           {duck_json_double('props', '$.k')} AS k_dbl,
           {duck_json_string('props', '$.k')} AS k_str,
           ({duck_json_int('props', '$.k')} IS NOT NULL
            OR {duck_json_double('props', '$.k')} IS NOT NULL
            OR {duck_json_string('props', '$.k')} IS NOT NULL) AS k_typed
    FROM events WHERE event_type = 'purchase'
    """,
)
def fn_json_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON extraction triple through the shared gated spellings
    (_json_compat): int (strict-integer regex), double (strict finite
    decimal), string (unambiguously-stringy text). ``k_typed`` is
    derived from the gated columns only — a raw "path exists" probe
    cannot be spelled cross-engine (the engines' raw extractions differ
    on unquoted NaN and number re-rendering; see the round-6 probes).

    Scale shape: pure map-side projection, whole-stage codegen'd; the
    three gates share one get_json_object subtree after CSE."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    k_int = spark_json_int("props", "$.k")
    k_dbl = spark_json_double("props", "$.k")
    k_str = spark_json_string("props", "$.k")
    return ev.select(
        "event_id",
        k_int.alias("k_int"),
        k_dbl.alias("k_dbl"),
        k_str.alias("k_str"),
        (k_int.isNotNull() | k_dbl.isNotNull() | k_str.isNotNull()).alias(
            "k_typed"
        ),
    )


@register(
    "dq_payload_type_census",
    CAT_DQ,
    f"""
    SELECT event_type,
           COUNT(*)::BIGINT AS n,
           SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END)::BIGINT
             AS n_null_props,
           SUM(CASE WHEN {duck_json_int('props', '$.k')} IS NOT NULL
                    THEN 1 ELSE 0 END)::BIGINT AS n_int,
           SUM(CASE WHEN {duck_json_double('props', '$.k')} IS NOT NULL
                     AND {duck_json_int('props', '$.k')} IS NULL
                    THEN 1 ELSE 0 END)::BIGINT AS n_dbl_only,
           SUM(CASE WHEN {duck_json_string('props', '$.k')} IS NOT NULL
                    THEN 1 ELSE 0 END)::BIGINT AS n_str,
           SUM(CASE WHEN props IS NOT NULL
                     AND {duck_json_int('props', '$.k')} IS NULL
                     AND {duck_json_double('props', '$.k')} IS NULL
                     AND {duck_json_string('props', '$.k')} IS NULL
                    THEN 1 ELSE 0 END)::BIGINT AS n_untyped
    FROM events
    GROUP BY event_type
    """,
)
def dq_payload_type_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload-typing census: per event_type, how many props.$.k values
    are int-typed, double-but-not-int, stringy, untyped (present but
    passing no gate: missing key, object/array, non-finite, malformed),
    or NULL props — the admission report that decides whether a field
    can be promoted to a typed column. Counts use the same gated
    spellings as the row-level extractors, so census and extraction can
    never disagree.

    Scale shape: ONE aggregate, map-side combinable (the dq_pii_census
    discipline); event_type is low-cardinality so the shuffle carries a
    handful of counter rows per partition."""
    ev = load_table(spark, sf_dir, "events")
    k_int = spark_json_int("props", "$.k")
    k_dbl = spark_json_double("props", "$.k")
    k_str = spark_json_string("props", "$.k")

    def cnt(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")

    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        cnt(F.col("props").isNull()).alias("n_null_props"),
        cnt(k_int.isNotNull()).alias("n_int"),
        cnt(k_dbl.isNotNull() & k_int.isNull()).alias("n_dbl_only"),
        cnt(k_str.isNotNull()).alias("n_str"),
        cnt(
            F.col("props").isNotNull()
            & k_int.isNull()
            & k_dbl.isNull()
            & k_str.isNull()
        ).alias("n_untyped"),
    )


_ORPHAN_EDGES = [
    # (edge label, child table, child key, parent table, parent key)
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
]


def _orphan_edge_sql(edge, child, ck, parent, pk) -> str:
    return f"""
    SELECT '{edge}' AS edge,
           (SELECT COUNT(*) FROM {child}) AS n_child,
           (SELECT COUNT(*) FROM {child} WHERE {ck} IS NULL) AS n_null_key,
           (SELECT COUNT(*) FROM {child} c WHERE c.{ck} IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM {parent} p
                              WHERE p.{pk} = c.{ck})) AS n_orphan,
           (SELECT COUNT(*) FROM {parent} p WHERE NOT EXISTS
              (SELECT 1 FROM {child} c WHERE c.{ck} = p.{pk}))
             AS n_childless_parent
    """


@register(
    "dq_orphan_census",
    CAT_DQ,
    "\nUNION ALL".join(_orphan_edge_sql(*e) for e in _ORPHAN_EDGES)
    + "\nORDER BY edge",
)
def dq_orphan_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity census over every FK edge of the star:
    child rows, NULL keys, orphans (child key with no parent — the rows
    an inner join silently drops), and childless parents (dims no fact
    references — the rows a broadcast wastes memory on). NULL keys are
    counted separately from orphans: a NULL never matches but is a
    different data defect than a dangling reference.

    Scale shape: per edge, one left join child→distinct(parent keys)
    feeding one aggregate, plus one anti-join count for the childless
    side — parent key sets are dimension-sized (broadcastable) except
    lineitem→orders, which shuffles on the same key the production join
    would anyway. Orphan counts here are the precondition record for
    every §2.C consumer (the round-6 star-corruption fixtures stress
    the same edges from the consumer side)."""
    rows = []
    for edge, child_t, ck, parent_t, pk in _ORPHAN_EDGES:
        child = load_table(spark, sf_dir, child_t).select(
            F.col(ck).alias("k")
        )
        parent = load_table(spark, sf_dir, parent_t).select(
            F.col(pk).alias("pk")
        )
        pkeys = parent.distinct()
        joined = child.join(pkeys, child.k == pkeys.pk, "left")
        # COALESCE(.., 0): SUM over an EMPTY child is NULL where the
        # oracle's COUNT subqueries give 0 (empty-corpus census r6)
        stats = joined.agg(
            F.count(F.lit(1)).alias("n_child"),
            F.coalesce(
                F.sum(F.when(F.col("k").isNull(), 1).otherwise(0)), F.lit(0)
            )
            .cast("bigint")
            .alias("n_null_key"),
            F.coalesce(
                F.sum(
                    F.when(F.col("k").isNotNull() & F.col("pk").isNull(), 1)
                    .otherwise(0)
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_orphan"),
        )
        # childless counts parent ROWS, not distinct keys: under a
        # duplicated parent PK every copy of an unreferenced row is
        # wasted broadcast memory, and the dup-PK star fixture holds the
        # two spellings apart (caught as a 27-vs-28 divergence in CI)
        childless = (
            parent.join(
                child.filter(F.col("k").isNotNull()).distinct(),
                parent.pk == F.col("k"),
                "left_anti",
            )
            .agg(F.count(F.lit(1)).alias("n_childless_parent"))
        )
        rows.append(
            stats.crossJoin(F.broadcast(childless)).select(
                F.lit(edge).alias("edge"),
                "n_child",
                "n_null_key",
                "n_orphan",
                "n_childless_parent",
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("edge")


_PK_TABLES = [
    ("customer", ["c_custkey"]),
    ("documents", ["doc_id"]),
    ("embeddings", ["vec_id"]),
    ("events", ["event_id"]),
    ("lineitem", ["l_orderkey", "l_linenumber"]),
    ("nation", ["n_nationkey"]),
    ("orders", ["o_orderkey"]),
    ("part", ["p_partkey"]),
    ("region", ["r_regionkey"]),
    ("supplier", ["s_suppkey"]),
]


def _pk_census_sql(tbl: str, pks: list[str]) -> str:
    keys = ", ".join(pks)
    return f"""
    SELECT '{tbl}' AS tbl,
           CAST(SUM(c) AS BIGINT) AS n_rows,
           COUNT(*)::BIGINT AS n_keys,
           CAST(SUM(c - 1) AS BIGINT) AS dup_excess,
           CAST(MAX(c) AS BIGINT) AS max_multiplicity
    FROM (SELECT COUNT(*) AS c FROM {tbl} GROUP BY {keys})
    """


@register(
    "dq_duplicate_pk_census",
    CAT_DQ,
    "\nUNION ALL".join(_pk_census_sql(t, k) for t, k in _PK_TABLES)
    + "\nORDER BY tbl",
)
def dq_duplicate_pk_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness census per table: row count, distinct key
    count, duplicate excess (rows an exactly-once contract says should
    not exist), and the worst key's multiplicity (the join-amplification
    factor a duplicated PK inflicts downstream). Complements
    dq_candidate_keys (which DISCOVERS keys) by auditing the DECLARED
    ones — the check that catches at-least-once redelivery leaking into
    batch tables.

    Covers EVERY PK-bearing table of the star (r9: supplier/part and
    the region/nation dims joined the census when their re-ingest
    campaigns landed — a uniqueness audit that skips tables is exactly
    where redelivery hides).

    Scale shape: per table one partial-agg groupBy on the key (the
    count collapses map-side) feeding a 1-row rollup; the per-table
    1-row results union driver-free."""
    rows = []
    for tbl, pks in _PK_TABLES:
        t = load_table(spark, sf_dir, tbl)
        per_key = t.groupBy(*pks).agg(F.count(F.lit(1)).alias("c"))
        rows.append(
            per_key.agg(
                F.sum("c").cast("bigint").alias("n_rows"),
                F.count(F.lit(1)).alias("n_keys"),
                F.sum(F.col("c") - 1).cast("bigint").alias("dup_excess"),
                F.max("c").cast("bigint").alias("max_multiplicity"),
            ).select(
                F.lit(tbl).alias("tbl"),
                "n_rows",
                "n_keys",
                "dup_excess",
                "max_multiplicity",
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("tbl")


# Poisson(1) inverse-CDF thresholds on the first 6 md5 hex digits
# (u = hex6 / 16^6): cumulative e^-1 * sum 1/k!, k = 0..7, as hex —
# weight k iff hex6 lands in [t_{k-1}, t_k). The tail above t_7
# (probability ~1e-5) clamps to 8.
_POIS_HEX = [
    "5e2d58", "bc5ab1", "eb715e", "fb2397",
    "ff1025", "ffd90f", "fffa8b", "ffff54",
]


def _pois_case(h: str) -> str:
    whens = " ".join(
        f"WHEN {h} < '{t}' THEN {k}" for k, t in enumerate(_POIS_HEX)
    )
    return f"CASE {whens} ELSE 8 END"


@register(
    "sample_poisson_bootstrap",
    CAT_SAMPLE,
    f"""
    WITH w AS (
      SELECT b,
             {_pois_case("substr(md5(CAST(o_orderkey AS VARCHAR)"
                         " || ':' || CAST(b AS VARCHAR)), 1, 6)")} AS wt,
             CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
      FROM orders, (SELECT unnest(range(1, 9)) AS b)
    )
    SELECT b AS replicate,
           CAST(SUM(wt) AS BIGINT) AS n_effective,
           CAST(SUM(wt * cents) AS DOUBLE) / 100.0 AS est_revenue
    FROM w GROUP BY b ORDER BY b
    """,
)
def sample_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Online bootstrap via Poissonization (Chamandy et al. 2012): each
    of 8 replicates draws a per-row Poisson(1) weight from a
    DETERMINISTIC hash-uniform (md5 hex prefix vs inverse-CDF
    thresholds — the sample_hash idiom, so both engines and every rerun
    draw identically), and the replicate spread estimates the sampling
    uncertainty of total revenue. Unlike the classical bootstrap this
    needs no global n and no resample shuffle — the weights are row-
    local, which is why it is THE bootstrap for massive streams.

    Scale shape: explode ×8 map-side, one partial-agg groupBy(replicate)
    carrying 8 counter rows per partition; revenue accumulates in exact
    integer cents (weight ≤ 8 keeps the product in int64 headroom).
    At 100 TB the explode factor is the only cost knob — push the
    weight CASE into the agg's projection and the scan stays single."""
    o = load_table(spark, sf_dir, "orders")
    exploded = o.select(
        F.explode(F.expr("sequence(1, 8)")).alias("b"), "o_orderkey",
        "o_totalprice",
    )
    h = (
        "substr(md5(CAST(o_orderkey AS STRING)"
        " || ':' || CAST(b AS STRING)), 1, 6)"
    )
    return (
        exploded.select(
            "b",
            F.expr(_pois_case(h)).alias("wt"),
            F.expr(
                "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"
            ).alias("cents"),
        )
        .groupBy(F.col("b").alias("replicate"))
        .agg(
            F.sum("wt").cast("bigint").alias("n_effective"),
            # unrounded exact-cents quotient (r11 lint, SURVEY 5.3.9a)
            F.expr(
                "CAST(SUM(wt * cents) AS DOUBLE) / 100.0"
            ).alias("est_revenue"),
        )
        .orderBy("replicate")
    )


@register(
    "vec_hnsw_level_plan",
    CAT_VEC,
    """
    WITH lv AS (
      SELECT CASE WHEN substr(md5(CAST(vec_id AS VARCHAR)), 1, 6) < '001000'
                    THEN 3
                  WHEN substr(md5(CAST(vec_id AS VARCHAR)), 1, 6) < '010000'
                    THEN 2
                  WHEN substr(md5(CAST(vec_id AS VARCHAR)), 1, 6) < '100000'
                    THEN 1
                  ELSE 0 END AS level
      FROM embeddings
    )
    SELECT level,
           COUNT(*)::BIGINT AS n_nodes,
           CASE WHEN level = 0 THEN 32 ELSE 16 END AS degree_cap,
           (COUNT(*) * CASE WHEN level = 0 THEN 32 ELSE 16 END)::BIGINT
             AS edge_budget
    FROM lv GROUP BY level ORDER BY level
    """,
)
def vec_hnsw_level_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HNSW layer-assignment manifest (Malkov & Yashunin 2016): node
    level drawn geometrically with P(level ≥ k) = (1/M)^k at M=16 —
    which makes the thresholds EXACT hex prefixes of the md5-uniform
    (u < 16^-k ⇔ hex6 < '100000'/'010000'/'001000'), so the draw is
    deterministic and engine-identical with zero floating point. Emits
    per-level node counts, the degree cap (2M at the base layer, M
    above — the paper's defaults), and the edge-memory budget.

    Scale shape: assignment is a row-local hash (map-side, rerun-stable
    — a node keeps its level across incremental builds); the census is
    one 4-group aggregate. This manifest is the scaffolding for a
    distributed build: partition base-layer construction by shard, and
    the ~1/16 upper-layer nodes (all levels ≥ 1) fit a single driver-
    side graph at ~10⁹ vectors."""
    em = load_table(spark, sf_dir, "embeddings")
    h = "substr(md5(CAST(vec_id AS STRING)), 1, 6)"
    lv = em.select(
        F.expr(
            f"CASE WHEN {h} < '001000' THEN 3"
            f" WHEN {h} < '010000' THEN 2"
            f" WHEN {h} < '100000' THEN 1 ELSE 0 END"
        ).alias("level")
    )
    return (
        lv.groupBy("level")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .select(
            "level",
            "n_nodes",
            F.when(F.col("level") == 0, 32).otherwise(16).alias("degree_cap"),
            (
                F.col("n_nodes")
                * F.when(F.col("level") == 0, 32).otherwise(16)
            )
            .cast("bigint")
            .alias("edge_budget"),
        )
        .orderBy("level")
    )


_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PHONE_RE = "\\+?[0-9][0-9() -]{6,}[0-9]"


@register(
    "llm_pii_redact_apply",
    CAT_TEXT,
    f"""
    WITH r AS (
      SELECT doc_id,
             len(regexp_extract_all(text, '{_EMAIL_RE}'))::INT AS n_email,
             regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g') AS t1
      FROM documents
    )
    SELECT doc_id, n_email,
           len(regexp_extract_all(t1, '{_PHONE_RE}'))::INT AS n_phone,
           md5(regexp_replace(t1, '{_PHONE_RE}', '<PHONE>', 'g'))
             AS redacted_md5
    FROM r
    """,
)
def llm_pii_redact_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over document text — the APPLY step downstream of
    dq_pii_census: email then phone patterns (RE2∩Java subset, same
    discipline as the census) replaced globally, with per-doc hit
    counts and the md5 of the redacted text (the hash proves both
    engines rewrote every occurrence identically without hauling full
    text through the comparator). Phones are counted AFTER email
    removal so an address's digit run is never double-counted.

    The clean corpus contains no PII (counts 0, text hash = identity) —
    the planted-fixture replay in tests/test_null_injection.py proves
    both kernels fire and agree on seeded emails/phones.

    Scale shape: row-local regex, map-only, no shuffle; at 100 TB this
    pipelines with the scan and the cost is pure regex CPU (the RE2
    subset keeps it linear-time, no catastrophic backtracking)."""
    d = load_table(spark, sf_dir, "documents")
    r = d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(_EMAIL_RE), F.lit(0)))
        .cast("int")
        .alias("n_email"),
        F.regexp_replace("text", _EMAIL_RE, "<EMAIL>").alias("t1"),
    )
    return r.select(
        "doc_id",
        "n_email",
        F.size(F.regexp_extract_all("t1", F.lit(_PHONE_RE), F.lit(0)))
        .cast("int")
        .alias("n_phone"),
        F.md5(F.regexp_replace("t1", _PHONE_RE, "<PHONE>")).alias(
            "redacted_md5"
        ),
    )


@register(
    "ts_pinball_loss",
    CAT_TS,
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders WHERE o_orderdate IS NOT NULL GROUP BY day
    ),
    hist AS (
      SELECT day, cents,
             list_sort(list(cents) OVER (ORDER BY day
               ROWS BETWEEN 28 PRECEDING AND 1 PRECEDING)) AS arr
      FROM daily
    ),
    q AS (SELECT unnest([1, 5, 9]) AS qn),
    scored AS (
      SELECT qn,
             CASE WHEN cents >= arr[CAST(CEIL(qn * 28 / 10.0) AS INT)]
                  THEN qn * (cents - arr[CAST(CEIL(qn * 28 / 10.0) AS INT)])
                  ELSE (qn - 10)
                       * (cents - arr[CAST(CEIL(qn * 28 / 10.0) AS INT)])
             END AS loss10_cents
      FROM hist, q WHERE len(arr) = 28
    )
    SELECT CAST(qn AS DOUBLE) / 10.0 AS quantile,
           COUNT(*)::BIGINT AS n_days,
           ROUND(CAST(SUM(loss10_cents) AS DOUBLE)
                 / (10.0 * 100.0 * COUNT(*)), 4) AS mean_pinball
    FROM scored GROUP BY qn ORDER BY qn
    """,
)
def ts_pinball_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-forecast backtest: trailing-28-day EMPIRICAL quantile
    forecasts (P10/P50/P90 as the ceil(q·n)-th order statistic of the
    sorted window — an exact integer pick, no interpolation to diverge
    on) scored with pinball loss L_q(y,f) = max(q(y−f), (q−1)(y−f)) —
    the proper scoring rule for quantiles, and the metric that grades a
    demand-forecast band. Loss stays in integer (cents × q·10) until
    the final mean; only full windows score.

    Scale shape: one day-grain partial agg, one bounded 28-row window
    (partition by series key when backtesting many series), a 3-row
    quantile explode, one final 3-group agg. NULL o_orderdate dropped
    on both engines (the r8 NULL-time seam)."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull()
    )
    daily = (
        o.groupBy(
            F.to_date(F.date_trunc("day", "o_orderdate")).alias("day")
        )
        .agg(
            F.expr(
                "CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))"
                " AS BIGINT)"
            ).alias("cents")
        )
    )
    w = Window.orderBy("day").rowsBetween(-28, -1)
    hist = daily.select(
        "day",
        "cents",
        F.array_sort(F.collect_list("cents").over(w)).alias("arr"),
    ).filter(F.size("arr") == 28)
    scored = (
        hist.select(
            "cents", "arr", F.explode(F.expr("array(1, 5, 9)")).alias("qn")
        )
        .withColumn(
            "f",
            F.expr("element_at(arr, CAST(CEIL(qn * 28 / 10.0) AS INT))"),
        )
        .select(
            "qn",
            F.expr(
                "CASE WHEN cents >= f THEN qn * (cents - f)"
                " ELSE (qn - 10) * (cents - f) END"
            ).alias("loss10_cents"),
        )
    )
    return (
        scored.groupBy("qn")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.expr(
                "ROUND(CAST(SUM(loss10_cents) AS DOUBLE)"
                " / (10.0 * 100.0 * COUNT(*)), 4)"
            ).alias("mean_pinball"),
        )
        .select(
            F.expr("CAST(qn AS DOUBLE) / 10.0").alias("quantile"), "n_days", "mean_pinball"
        )
        .orderBy("quantile")
    )


@register(
    "llm_truncation_loss",
    CAT_TEXT,
    """
    WITH tok AS (
      SELECT len(string_split(text, ' '))::BIGINT AS n_tok FROM documents
    ),
    lens AS (SELECT unnest([128, 512, 2048]) AS ctx_len)
    SELECT ctx_len,
           COUNT(*)::BIGINT AS n_docs,
           SUM(CASE WHEN n_tok > ctx_len THEN 1 ELSE 0 END)::BIGINT
             AS n_truncated,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(SUM(LEAST(n_tok, ctx_len)) AS BIGINT) AS kept_tokens,
           ROUND(100.0 * (1.0 - CAST(SUM(LEAST(n_tok, ctx_len)) AS DOUBLE)
                                / CAST(SUM(n_tok) AS DOUBLE)), 4)
             AS lost_pct
    FROM tok, lens GROUP BY ctx_len ORDER BY ctx_len
    """,
)
def llm_truncation_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window truncation census: for candidate lengths 128 /
    512 / 2048 whitespace tokens, how many documents overflow and what
    fraction of the corpus' tokens a truncate-at-L policy discards —
    the first number that decides between truncation and packing
    (llm_pack_chunks / llm_pack_bestfit are the follow-ups). Token
    counts are exact integers; only the final percentage divides.

    Scale shape: one map-side token count per doc, a 3-row broadcast
    explode, one 3-group partial agg — the scan dominates at any
    scale."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        F.size(F.split("text", " ")).cast("bigint").alias("n_tok")
    )
    return (
        tok.crossJoin(
            F.broadcast(
                spark.range(1).select(
                    F.explode(F.expr("array(128, 512, 2048)")).alias(
                        "ctx_len"
                    )
                )
            )
        )
        .groupBy("ctx_len")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("n_tok") > F.col("ctx_len"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_truncated"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
            F.sum(F.least("n_tok", "ctx_len"))
            .cast("bigint")
            .alias("kept_tokens"),
            F.expr(
                "ROUND(100.0 * (1.0 - CAST(SUM(LEAST(n_tok, ctx_len))"
                " AS DOUBLE) / CAST(SUM(n_tok) AS DOUBLE)), 4)"
            ).alias("lost_pct"),
        )
        .orderBy("ctx_len")
    )


@register(
    "dq_value_finite_census",
    CAT_DQ,
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null,
           CAST(SUM(CASE WHEN isnan(value) THEN 1 ELSE 0 END) AS BIGINT)
             AS n_nan,
           CAST(SUM(CASE WHEN value = 'Infinity'::DOUBLE THEN 1 ELSE 0 END)
             AS BIGINT) AS n_posinf,
           CAST(SUM(CASE WHEN value = '-Infinity'::DOUBLE THEN 1 ELSE 0 END)
             AS BIGINT) AS n_neginf,
           CAST(SUM(CASE WHEN value IS NOT NULL AND NOT isnan(value)
                           AND NOT isinf(value)
                           THEN CAST(ROUND(value * 100, 0) AS BIGINT) END)
                      AS DOUBLE) / 100.0
             AS finite_sum,
           MIN(CASE WHEN value IS NOT NULL AND NOT isnan(value)
                     AND NOT isinf(value) THEN value END) AS finite_min,
           MAX(CASE WHEN value IS NOT NULL AND NOT isnan(value)
                     AND NOT isinf(value) THEN value END) AS finite_max
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def dq_value_finite_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Special-float admission census over the measure column: per
    event_type, counts of NULL / NaN / +Inf / -Inf values plus the
    finite-only SUM/MIN/MAX. This is the gate that must run before any
    statistical consumer of ``value``, because the engines fail
    NON-COMPARABLY on NaN input: DuckDB STDDEV/VAR/CORR hard-error
    ("Out of Range"), Spark returns NaN (probe 2026-08-14) — and a
    SUM silently NaN-poisons its whole group either way. The census
    spells every predicate two-valued (NaN = Inf comparisons are false,
    never NULL, in both engines; NULL short-circuits via IS NOT NULL),
    so its own arithmetic never touches a special value.

    Scale shape: ONE pruned scan of (event_type, value), one
    map-side-combinable aggregate — same census ladder as
    dq_payload_type_census. The special-float corruption fixture
    (tests/test_null_injection.py) proves every counter fires and that
    the planted corpus leaves the finite_* stats exactly equal to the
    clean-row subset."""
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value")
    nan = F.isnan(v)
    pinf = v == F.lit(float("inf"))
    ninf = v == F.lit(float("-inf"))
    fin = F.when(v.isNotNull() & ~nan & ~pinf & ~ninf, v)
    # finite_sum goes through integer cents (value is a 2-decimal money
    # domain, same as l_extendedprice): a BIGINT sum is reduction-order
    # independent, where ROUND(SUM(double), 4) would inherit the engines'
    # different partition/sequential reduction orders — the float-hash
    # divergence class the flagship rewrite eliminated (SURVEY §5.3.6b).
    fin_cents = F.when(
        v.isNotNull() & ~nan & ~pinf & ~ninf,
        F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)"),
    )
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(v.isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_null"),
            F.sum(F.when(nan, 1).otherwise(0)).cast("bigint").alias("n_nan"),
            F.sum(F.when(pinf, 1).otherwise(0))
            .cast("bigint")
            .alias("n_posinf"),
            F.sum(F.when(ninf, 1).otherwise(0))
            .cast("bigint")
            .alias("n_neginf"),
            # unrounded: the exact-cents quotient is the identical
            # double on both engines at any magnitude (r11 lint, 5.3.9a)
            (F.sum(fin_cents).cast("double") / 100.0).alias("finite_sum"),
            F.min(fin).alias("finite_min"),
            F.max(fin).alias("finite_max"),
        )
        .orderBy("event_type")
    )
