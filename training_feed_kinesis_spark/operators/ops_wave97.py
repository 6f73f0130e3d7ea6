"""Wave 97 (round 7): corpus attribution, change detection, and
cross-table reconciliation — eight oracled keys closing genuine
surface gaps (net-new throttled per VERDICT r5 item 2).

  * ``llm_wimbd_ngram_sources``: the WIMBD corpus census (Elazar et
    al. 2023, "What's In My Big Data?") — the most-frequent n-grams
    WITH per-source attribution, the first report a corpus audit
    publishes.
  * ``ts_cusum_changepoint``: Page's CUSUM (Biometrika 1954) spelled
    relationally — the prefix-sum-minus-running-min identity turns the
    recursive max(0, S+y) into two window functions over exact integer
    cents.
  * ``stat_brown_forsythe``: Brown–Forsythe variance-homogeneity test
    (JASA 1974) — the robust Levene variant on |x − group median|,
    completing the test family next to stat_anova_oneway (same F
    machinery, deviation-transformed input).
  * ``ts_stl_decompose``: additive trend/seasonal/residual
    decomposition (the STL shape, Cleveland et al. 1990, with a
    centered 7-day MA trend and day-of-week seasonal) — every division
    is a single op on exact integer numerators, so both engines do
    bit-identical float math.
  * ``dq_order_total_reconcile``: cross-table reconciliation census —
    does orders.o_totalprice equal the lineitem-derived total? The
    audit every warehouse runs between a header table and its lines.
  * ``llm_langid_confusion``: label-vs-classifier agreement census
    over llm_lang_id's marker-token classes — the confusion matrix a
    language-ID gate publishes before anyone trusts either column.
  * ``events_dwell_transition``: median/p90 dwell seconds per
    consecutive event-type transition — the timing layer missing
    between events_markov (where users go) and sessionization (when
    sessions break).
  * ``dq_money_magnitude_census``: per-money-column magnitude census
    (max cents, digits used, headroom to the BIGINT/DECIMAL capacity
    boundary) — the observability side of the §5.3.6c capacity ledger.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load_table, sane_ts, sane_ts_sql

CAT_TEXT = "2.J llm-pipeline (text)"
CAT_TS = "2.L time-series analytics"
CAT_STAT = "2.L statistics"
CAT_DQ = "2.L data quality"
CAT_EVENTS = "2.M workloads"

_NGRAM_N = 5
_NGRAM_TOPK = 25


@register(
    "llm_wimbd_ngram_sources",
    CAT_TEXT,
    f"""
    WITH toks AS (
      SELECT doc_id, source, string_split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ') AS t
      FROM documents
    ),
    pos AS (
      SELECT doc_id, source, t,
             unnest(range(1, len(t) - {_NGRAM_N - 2})) AS i
      FROM toks WHERE len(t) >= {_NGRAM_N}
    ),
    grams AS (
      SELECT doc_id, source,
             array_to_string(t[i:i+{_NGRAM_N - 1}], ' ') AS gram
      FROM pos
    ),
    counted AS (
      SELECT gram,
             COUNT(*) AS n_occurrences,
             COUNT(DISTINCT doc_id) AS n_docs,
             COUNT(DISTINCT source) AS n_sources
      FROM grams GROUP BY gram
    )
    SELECT gram, n_occurrences, n_docs, n_sources
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY n_occurrences DESC,
                                       gram ASC) AS rn
          FROM counted)
    WHERE rn <= {_NGRAM_TOPK}
    """,
)
def llm_wimbd_ngram_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WIMBD-style corpus census (Elazar et al. 2023): the top-25 most
    frequent word 5-grams with occurrence, document, and SOURCE
    attribution counts — "what text dominates my corpus and where does
    it come from", the memorization/duplication report published for
    C4/Pile/Dolma audits. Deterministic top-k: ordered on (count DESC,
    gram ASC) — a unique total order, so ties cannot flip rows between
    engines.

    Scale shape: gram generation is row-local (transform over the token
    array — no join against a position table; the oracle's range-join
    spelling is DuckDB-only convenience). One hash aggregation on the
    gram; the two COUNT(DISTINCT)s expand once map-side. The final
    top-25 is a TakeOrderedAndProject-style partial top-k, never a
    global sort. At 100 TB the gram VARCHAR shuffle key is replaced by
    the xxhash64 8-byte key exactly as llm_contamination spells it
    (TFK_HASH_SHINGLES): hash grams before the aggregate, re-attach one
    representative gram string per surviving hash from the top-k rows
    only."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "source",
        F.split(F.expr("translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz')"), " ").alias("t"),
    ).filter(F.size("t") >= _NGRAM_N)
    grams = toks.select(
        "doc_id",
        "source",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(t) - {_NGRAM_N - 1}),"
                f" i -> array_join(slice(t, i, {_NGRAM_N}), ' '))"
            )
        ).alias("gram"),
    )
    counted = grams.groupBy("gram").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
    )
    # orderBy+limit (NOT a global row_number window): plans as
    # TakeOrderedAndProject — per-partition partial top-25 merged on the
    # driver — instead of a single-partition full sort of the gram table;
    # deterministic under the unique (count DESC, gram) order
    return counted.orderBy(
        F.col("n_occurrences").desc(), F.col("gram").asc()
    ).limit(_NGRAM_TOPK)


_CUSUM_DIV = 4  # alarm when S_t exceeds 1/4 of the prefix-sum range


def _cusum_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared CUSUM substrate: per-day exact revenue cents and the
    centered prefix sum P_t = Σ(rev − μ̂). Used by ts_cusum_changepoint
    (S_t = P_t − min P) and ts_changepoint_segfit (split at argmax |P|).

    Exactness: rev sums are positive, so Spark's truncating DIV equals
    DuckDB's flooring // for μ̂; the corpus-total numerator and the
    prefix accumulator widen to DECIMAL(38,0) (§5.3.6c — DuckDB's SUM
    is already HUGEINT), over day-grain rows where decimal cost is
    output-sized.

    NULL o_orderdate rows are dropped on BOTH engines before the day
    grain: a NULL day group would otherwise sit at opposite ends of the
    prefix window (Spark ASC defaults NULLS FIRST, DuckDB NULLS LAST)
    and shift every running sum — the ADVICE r7 ordering seam, same
    class as _FISHER_GROUP_SQL."""
    # temporal admission (r12): a sentinel day at either extreme of the
    # prefix order shifts EVERY running sum (and its raw day stamp is
    # uncollectable)
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull() & sane_ts("o_orderdate")
    )
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(
            F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)")
        ).alias("rev_c")
    )
    glob = daily.agg(
        F.expr(
            "SUM(CAST(rev_c AS DECIMAL(38,0))) DIV COUNT(*)"
        ).alias("mu_c")
    )
    centered = daily.crossJoin(F.broadcast(glob)).select(
        "day", "rev_c", (F.col("rev_c") - F.col("mu_c")).alias("y")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return centered.select(
        "day",
        "rev_c",
        F.sum(F.col("y").cast("decimal(38,0)")).over(w).alias("p"),
    )


@register(
    "ts_cusum_changepoint",
    CAT_TS,
    f"""
    WITH daily AS (
      SELECT o_orderdate AS day,
             CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS rev_c
      FROM orders WHERE o_orderdate IS NOT NULL
        AND {sane_ts_sql('o_orderdate')} GROUP BY o_orderdate
    ),
    centered AS (
      SELECT day, rev_c,
             rev_c - (SELECT CAST(SUM(rev_c) // COUNT(*) AS BIGINT)
                      FROM daily) AS y
      FROM daily
    ),
    prefix AS (
      SELECT day, rev_c,
             SUM(y) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS p
      FROM centered
    ),
    cusum AS (
      SELECT day, rev_c, p,
             p - MIN(p) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS s
      FROM prefix
    )
    SELECT day,
           CAST(rev_c AS DOUBLE) / 100.0 AS revenue,
           CAST(s AS DOUBLE) / 100.0 AS cusum,
           s * {_CUSUM_DIV} > (SELECT MAX(p) - MIN(p) FROM prefix) AS alarm
    FROM cusum
    """,
)
def ts_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's CUSUM changepoint detector (Biometrika 1954) on daily
    order revenue. The recursive statistic S_t = max(0, S_{{t-1}} + y_t)
    has a closed window-function form: with P_t the prefix sum of the
    centered series, S_t = P_t − min_{{j≤t}} P_j — one running sum plus
    one running min, both over the same day order. Alarm fires when S_t
    exceeds a fixed fraction (1/{_CUSUM_DIV}) of the full prefix-sum
    range. Every quantity is exact integer cents until the final
    display division, so the running sums are order-proof by
    construction (§5.3.6b discipline) — no float prefix sum to diverge
    across engines or partitions.

    Scale shape: the per-day aggregate is map-side combinable; the two
    running windows are over the DAYS series (thousands of rows at any
    corpus size), a deliberate single-partition window — the same
    small-series shape as ts_ewma/ts_theil_sen. The 1-row global stats
    attach via broadcast."""
    prefix = _cusum_prefix(spark, sf_dir)
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    rng = prefix.agg(
        (F.max("p") - F.min("p")).alias("p_range")
    )
    cusum = prefix.withColumn("s", F.col("p") - F.min("p").over(w))
    return cusum.crossJoin(F.broadcast(rng)).select(
        "day",
        (F.col("rev_c").cast("double") / 100.0).alias("revenue"),
        (F.col("s").cast("double") / 100.0).alias("cusum"),
        (F.col("s") * _CUSUM_DIV > F.col("p_range")).alias("alarm"),
    )


@register(
    "stat_brown_forsythe",
    CAT_STAT,
    """
    WITH med AS (
      SELECT event_type,
             quantile_cont(value, 0.5) AS med
      FROM events WHERE value IS NOT NULL GROUP BY event_type
    ),
    z AS (
      SELECT e.event_type, ABS(e.value - m.med) AS z
      FROM events e JOIN med m ON e.event_type = m.event_type
      WHERE e.value IS NOT NULL
    ),
    g AS (
      SELECT event_type, COUNT(*)::DOUBLE AS n, AVG(z) AS m,
             SUM(z * z) - COUNT(*) * AVG(z) * AVG(z) AS ss_w
      FROM z GROUP BY event_type
    ),
    tot AS (
      SELECT SUM(n) AS n_tot, SUM(n * m) / SUM(n) AS grand,
             COUNT(*)::DOUBLE AS k
      FROM g
    )
    SELECT CAST(t.k AS BIGINT) AS n_groups,
           CAST(t.n_tot AS BIGINT) AS n_rows,
           ROUND(SUM(g.n * (g.m - t.grand) * (g.m - t.grand)) / (t.k - 1), 4)
             AS ms_between,
           ROUND(SUM(g.ss_w) / (t.n_tot - t.k), 4) AS ms_within,
           ROUND((SUM(g.n * (g.m - t.grand) * (g.m - t.grand)) / (t.k - 1))
                 / (SUM(g.ss_w) / (t.n_tot - t.k)), 4) AS f_stat
    FROM g, tot t
    GROUP BY t.k, t.n_tot, t.grand
    """,
)
def stat_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown–Forsythe variance-homogeneity test (JASA 1974): one-way
    ANOVA on z = |x − group median| — the robust Levene variant, the
    pre-test run before trusting pooled-variance methods (Welch t,
    ANOVA itself). Complete-case on NULL values like stat_spearman;
    medians are interpolated percentile_cont on both engines (the
    agg_percentile parity). The F machinery is textually the
    stat_anova_oneway spelling applied to the deviation-transformed
    rows — within-SS via the Σz²−n·z̄² identity, one pass over z.

    Scale shape: the median pass is one per-group percentile aggregate
    (5 groups); z rides a broadcast join of the 5-row median table back
    onto events — no second shuffle of the fact; the F reduction is
    map-side combinable to 5 moment rows, then constant-size
    arithmetic."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    z = ev.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("value") - F.col("med")).alias("z")
    )
    g = z.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("z").alias("m"),
        (
            F.sum(F.col("z") * F.col("z"))
            - F.count(F.lit(1)) * F.avg("z") * F.avg("z")
        ).alias("ss_w"),
    )
    tot = g.agg(
        F.sum("n").alias("n_tot"),
        (F.sum(F.col("n") * F.col("m")) / F.sum("n")).alias("grand"),
        F.count(F.lit(1)).cast("double").alias("k"),
    )
    j = g.crossJoin(F.broadcast(tot))
    dev = (F.col("m") - F.col("grand")) * (F.col("m") - F.col("grand"))
    return (
        j.groupBy("k", "n_tot", "grand")
        .agg(
            F.sum(F.col("n") * dev).alias("_ssb"),
            F.sum("ss_w").alias("_ssw"),
        )
        .select(
            F.col("k").cast("bigint").alias("n_groups"),
            F.col("n_tot").cast("bigint").alias("n_rows"),
            F.round(F.col("_ssb") / (F.col("k") - 1), 4).alias("ms_between"),
            F.round(
                F.col("_ssw") / (F.col("n_tot") - F.col("k")), 4
            ).alias("ms_within"),
            F.round(
                (F.col("_ssb") / (F.col("k") - 1))
                / (F.col("_ssw") / (F.col("n_tot") - F.col("k"))),
                4,
            ).alias("f_stat"),
        )
    )


@register(
    "ts_stl_decompose",
    CAT_TS,
    f"""
    WITH daily AS (
      SELECT o_orderdate AS day,
             CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS x_c
      FROM orders WHERE o_orderdate IS NOT NULL
        AND {sane_ts_sql('o_orderdate')} GROUP BY o_orderdate
    ),
    trended AS (
      SELECT day, x_c,
             CASE WHEN COUNT(*) OVER w7 = 7
                  THEN SUM(x_c) OVER w7 END AS sum7
      FROM daily
      WINDOW w7 AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    detr AS (
      SELECT day, x_c, sum7, 7 * x_c - sum7 AS d7,
             isodow(day)::INT AS dow
      FROM trended
    ),
    seas AS (
      SELECT dow, SUM(d7) AS sum_d7, COUNT(d7) AS n_dow
      FROM detr WHERE d7 IS NOT NULL GROUP BY dow
    )
    -- UNROUNDED emission (r11 magnitude lint, 5.3.9a): every component
    -- is a single division (resid: one division + one subtraction) of
    -- exact integers — identical doubles both engines at any magnitude,
    -- and trend is a grower that crosses the ROUND seam at scale
    SELECT t.day,
           CAST(t.x_c AS DOUBLE) / 100.0 AS revenue,
           CAST(t.sum7 AS DOUBLE) / 700.0 AS trend,
           CAST(s.sum_d7 AS DOUBLE) / (700.0 * s.n_dow) AS seasonal,
           CAST(t.d7 AS DOUBLE) / 700.0
             - CAST(s.sum_d7 AS DOUBLE) / (700.0 * s.n_dow) AS resid
    FROM detr t JOIN seas s ON t.dow = s.dow
    """,
)
def ts_stl_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive trend/seasonal/residual decomposition of daily revenue —
    the STL shape (Cleveland et al. 1990) with a centered 7-day moving
    average trend and a day-of-week seasonal component (seasonal_dow
    reports the seasonal means alone; this emits the full three-way
    split per day, residual included — the series an anomaly monitor
    actually watches). Edge days without a full 7-day window carry NULL
    trend and drop from the seasonal fit, the standard MA-edge
    convention.

    Exactness: x_c and the 7-day window sum are exact BIGINT cents, so
    the detrended term d7 = 7·x_c − sum7 and the per-dow seasonal
    numerator Σd7 are exact integers; every emitted float is a SINGLE
    division (or one division + one subtraction) of exact integers —
    bit-identical across engines and partitionings, no order-dependent
    float accumulation anywhere (§5.3.6b).

    Scale shape: per-day aggregate map-side combines; the 7-row frame
    window runs over the small day series (same single-partition-series
    shape as ts_ewma); the 7-row seasonal table broadcasts back. isodow
    spelled as Spark weekday()+1 = DuckDB isodow (1=Mon..7=Sun), the
    stats3.py parity. NULL o_orderdate dropped on both engines — the
    _cusum_prefix NULL-ordering seam (a NULL day sorts to opposite
    window ends across engines)."""
    # temporal admission (r12): a sentinel day at either extreme of the
    # prefix order shifts EVERY running sum (and its raw day stamp is
    # uncollectable)
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull() & sane_ts("o_orderdate")
    )
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(
            F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)")
        ).alias("x_c")
    )
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    trended = daily.select(
        "day",
        "x_c",
        F.when(
            F.count(F.lit(1)).over(w7) == 7, F.sum("x_c").over(w7)
        ).alias("sum7"),
    )
    detr = trended.select(
        "day",
        "x_c",
        "sum7",
        (F.lit(7) * F.col("x_c") - F.col("sum7")).alias("d7"),
        (F.weekday("day") + 1).cast("int").alias("dow"),
    )
    seas = (
        detr.filter(F.col("d7").isNotNull())
        .groupBy("dow")
        .agg(
            F.sum("d7").alias("sum_d7"), F.count("d7").alias("n_dow")
        )
    )
    seasonal = F.col("sum_d7").cast("double") / (
        F.lit(700.0) * F.col("n_dow")
    )
    return detr.join(F.broadcast(seas), "dow").select(
        "day",
        (F.col("x_c").cast("double") / 100.0).alias("revenue"),
        # unrounded exact-integer quotients (see oracle comment)
        (F.col("sum7").cast("double") / 700.0).alias("trend"),
        seasonal.alias("seasonal"),
        (F.col("d7").cast("double") / 700.0 - seasonal).alias("resid"),
    )


@register(
    "dq_order_total_reconcile",
    CAT_DQ,
    """
    WITH line_total AS (
      SELECT l_orderkey,
             CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                                 * (1 + l_tax) * 100, 0) AS BIGINT))
                  AS BIGINT) AS calc_c
      FROM lineitem GROUP BY l_orderkey
    ),
    joined AS (
      SELECT o.o_orderstatus,
             CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT) AS header_c,
             lt.calc_c
      FROM orders o LEFT JOIN line_total lt ON o.o_orderkey = lt.l_orderkey
    )
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(COALESCE(SUM(CASE WHEN calc_c IS NULL THEN 1 END), 0)
                AS BIGINT) AS n_no_lines,
           CAST(COALESCE(SUM(CASE WHEN ABS(header_c - calc_c) <= 1
                                  THEN 1 END), 0) AS BIGINT)
             AS n_reconciled,
           CAST(COALESCE(SUM(CASE WHEN ABS(header_c - calc_c) > 1
                                  THEN 1 END), 0) AS BIGINT)
             AS n_mismatch,
           CAST(MAX(ABS(header_c - calc_c)) AS BIGINT) AS max_abs_diff_c
    FROM joined GROUP BY o_orderstatus
    """,
)
def dq_order_total_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-vs-lines reconciliation census: does orders.o_totalprice
    equal the lineitem-derived Σ extendedprice·(1−disc)·(1+tax)? The
    audit every warehouse runs between a document header and its line
    table (TPC-H's own consistency invariant, TPC-H spec §3.3). Emits,
    per order status: headerless-line orders, within-one-cent
    reconciled, genuine mismatches, and the worst absolute gap — on
    the synthetic star the columns are generated independently, so the
    census HONESTLY reports near-total mismatch (the fixture proves the
    detector, not the data). Comparison is exact integer cents with a
    one-cent tolerance for the header's own rounding; SUM CASE mirrors
    COUNT FILTER with the COALESCE-0 guard from the empty-corpus
    campaign.

    Scale shape: the line rollup is map-side combinable on l_orderkey;
    the header join is key-to-key on the same key (co-partitioned
    shuffle, no broadcast needed at 100 TB — both sides are fact-sized);
    the final census is a 3-row aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    line_total = li.groupBy("l_orderkey").agg(
        F.sum(
            F.expr(
                "CAST(ROUND(l_extendedprice * (1 - l_discount)"
                " * (1 + l_tax) * 100, 0) AS BIGINT)"
            )
        ).alias("calc_c")
    )
    joined = o.join(
        line_total, o.o_orderkey == line_total.l_orderkey, "left"
    ).select(
        "o_orderstatus",
        F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)").alias(
            "header_c"
        ),
        "calc_c",
    )
    diff = F.abs(F.col("header_c") - F.col("calc_c"))
    zero = F.lit(0)
    return joined.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.coalesce(
            F.sum(F.when(F.col("calc_c").isNull(), 1)), zero
        ).alias("n_no_lines"),
        F.coalesce(F.sum(F.when(diff <= 1, 1)), zero).alias(
            "n_reconciled"
        ),
        F.coalesce(F.sum(F.when(diff > 1, 1)), zero).alias("n_mismatch"),
        F.max(diff).alias("max_abs_diff_c"),
    )


@register(
    "llm_langid_confusion",
    CAT_TEXT,
    """
    WITH pred AS (
      SELECT doc_id, lang,
             CASE WHEN len(list_filter(string_split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' '),
                      x -> list_contains(['table','row','column'], x)))
                   >= len(list_filter(string_split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' '),
                      x -> list_contains(['join','filter','scan'], x)))
                  AND len(list_filter(string_split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' '),
                      x -> list_contains(['table','row','column'], x)))
                   >= len(list_filter(string_split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' '),
                      x -> list_contains(['stream','window','batch'], x)))
                  THEN 'data'
                  WHEN len(list_filter(string_split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' '),
                      x -> list_contains(['join','filter','scan'], x)))
                   >= len(list_filter(string_split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' '),
                      x -> list_contains(['stream','window','batch'], x)))
                  THEN 'query' ELSE 'stream' END AS predicted
      FROM documents
    )
    SELECT lang, predicted, n_docs,
           CAST(n_docs * 10000
                // SUM(n_docs) OVER (PARTITION BY lang) AS BIGINT)
             / 10000.0 AS lang_share
    FROM (SELECT lang, predicted, COUNT(*) AS n_docs
          FROM pred GROUP BY lang, predicted)
    """,
)
def llm_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-vs-classifier confusion census: cross-tabulate the stored
    ``lang`` label against llm_lang_id's marker-token class — the
    agreement matrix a language-ID gate publishes before either column
    is trusted for filtering or mixture weights (fastText-vs-metadata
    disagreement is a standard CommonCrawl curation report). Reuses
    llm_lang_id AS THE CLASSIFIER (same argmax, same tie order);
    lang_share is exact integer basis points — COUNT·10000 is BIGINT
    and the window total divides it integrally, so no float ratio can
    diverge.

    Scale shape: classification is row-local HOF work on the document
    scan; the census is one (lang × class) aggregate (≤ labels×3 rows);
    the share window runs over that aggregated grid, not the corpus."""
    from .llm_text import llm_lang_id

    pred = llm_lang_id(spark, sf_dir).select(
        "lang", F.col("topic_guess").alias("predicted")
    )
    counted = pred.groupBy("lang", "predicted").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    w = Window.partitionBy("lang")
    # exact integer basis points: BIGINT DIV BIGINT both sides (a double
    # ratio truncated to BIGINT could land one ulp below the true floor)
    return (
        counted.withColumn("_lang_total", F.sum("n_docs").over(w))
        .withColumn(
            "lang_share",
            F.expr("CAST(n_docs * 10000 DIV _lang_total AS BIGINT)")
            / 10000.0,
        )
        .select("lang", "predicted", "n_docs", "lang_share")
    )


@register(
    "events_dwell_transition",
    CAT_EVENTS,
    """
    WITH seq AS (
      SELECT user_id, event_type, ts,
             LAG(event_type) OVER w AS prev_type,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS dwell_us
      FROM events
      WINDOW w AS (PARTITION BY user_id
                   ORDER BY ts ASC NULLS LAST, event_id)
    )
    SELECT prev_type, event_type AS next_type,
           COUNT(*) AS n_transitions,
           ROUND(quantile_cont(dwell_us, 0.5) / 1000000.0, 4) AS p50_dwell_s,
           ROUND(quantile_cont(dwell_us, 0.9) / 1000000.0, 4) AS p90_dwell_s
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    """,
)
def events_dwell_transition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dwell-time census per event-type transition: for each consecutive
    (prev → next) pair within a user's stream, the transition count and
    the median/p90 dwell seconds — the timing layer between
    events_markov (transition probabilities) and sessionization (gap
    cutoffs); the p90 column is how a session-gap threshold is actually
    chosen from data. Dwell is computed in exact integer MICROSECONDS
    (the batch_sessionize precision rationale — a seconds cast truncates
    sub-second gaps) and only the final display ratio divides; the lag
    order carries the unique event_id tiebreak so equal timestamps
    cannot flip pairings between engines.

    Scale shape: one shuffle on user_id serves the lag window; the
    census aggregates to the (type × type) grid — percentile state is
    per-grid-cell, map-side combinable."""
    ev = load_table(spark, sf_dir, "events")
    # ts pinned ASC NULLS LAST: Spark defaults NULLS FIRST, DuckDB
    # NULLS LAST — a NULL-ts sliver would otherwise flip lag pairings
    # between engines (the corruption-class-8 ordering seam)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc_nulls_last(), "event_id"
    )
    us = F.unix_micros(F.col("ts"))
    seq = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        (us - F.lag(us).over(w)).alias("dwell_us"),
    ).filter(F.col("prev_type").isNotNull())
    return seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(
        F.count(F.lit(1)).alias("n_transitions"),
        F.round(
            F.percentile("dwell_us", F.lit(0.5)) / 1_000_000.0, 4
        ).alias("p50_dwell_s"),
        F.round(
            F.percentile("dwell_us", F.lit(0.9)) / 1_000_000.0, 4
        ).alias("p90_dwell_s"),
    )


_MONEY_COLS = [
    ("orders", "o_totalprice"),
    ("lineitem", "l_extendedprice"),
    ("customer", "c_acctbal"),
]
_CENTS_CAP = 10**13  # $100B per row — outside any plausible row value
_I64_MAX = 9223372036854775807


def _money_census_sql(table: str, col: str) -> str:
    cents = f"TRY_CAST(ROUND({col} * 100, 0) AS BIGINT)"
    return f"""
      SELECT '{table}.{col}' AS money_col,
             COUNT(*) AS n_rows,
             CAST(COALESCE(SUM(CASE WHEN {col} IS NULL THEN 1 END), 0)
                  AS BIGINT) AS n_null,
             CAST(COALESCE(SUM(CASE WHEN {col} IS NOT NULL
                                     AND {cents} IS NULL THEN 1 END), 0)
                  AS BIGINT) AS n_unrepresentable,
             CAST(COALESCE(SUM(CASE WHEN ABS({cents}) > {_CENTS_CAP}
                                    THEN 1 END), 0) AS BIGINT)
               AS n_over_cap,
             MAX(ABS({cents})) AS max_abs_cents,
             {_I64_MAX} // NULLIF(MAX(ABS({cents})), 0) AS headroom_rows
      FROM {table}"""


@register(
    "dq_money_magnitude_census",
    CAT_DQ,
    " UNION ALL ".join(
        _money_census_sql(t, c) for t, c in _MONEY_COLS
    ),
)
def dq_money_magnitude_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Money-magnitude admission gate + int64 capacity ledger: per money
    column, how many values are NULL, CENTS-UNREPRESENTABLE (NaN / ±Inf
    / |x·100| ≥ 2⁶³ — where the engines fail NON-COMPARABLY: probe r7
    shows Spark SUM(BIGINT) hard-errors ARITHMETIC_OVERFLOW under ANSI
    while DuckDB silently widens to HUGEINT, so pollution must be gated
    at ingest exactly like dq_value_finite_census gates NaN), over the
    $100B/row plausibility cap, and — the ledger — ``headroom_rows``:
    how many worst-case rows a single int64 cents accumulator can absorb
    before 2⁶³, i.e. the per-group row budget every §5.3.6b BIGINT money
    SUM in the registry runs against. Unbounded-domain accumulations
    (cumulative windows, rank-weighted sums) are widened to
    DECIMAL(38,0) at the aggregated grain instead of budgeted — the
    §5.3.6c discipline this census polices.

    TRY_CAST is the shared unrepresentability detector (probe r7: both
    engines NULL on NaN, ±Inf, and out-of-range; both round-half-away on
    representable values). Scale shape: one map-side-combinable
    aggregate per table, 3-row output."""
    frames = []
    for table, col in _MONEY_COLS:
        t = load_table(spark, sf_dir, table)
        cents = F.expr(f"TRY_CAST(ROUND({col} * 100, 0) AS BIGINT)")
        zero = F.lit(0)
        frames.append(
            t.agg(
                F.lit(f"{table}.{col}").alias("money_col"),
                F.count(F.lit(1)).alias("n_rows"),
                F.coalesce(
                    F.sum(F.when(F.col(col).isNull(), 1)), zero
                ).alias("n_null"),
                F.coalesce(
                    F.sum(
                        F.when(
                            F.col(col).isNotNull() & cents.isNull(), 1
                        )
                    ),
                    zero,
                ).alias("n_unrepresentable"),
                F.coalesce(
                    F.sum(F.when(F.abs(cents) > _CENTS_CAP, 1)), zero
                ).alias("n_over_cap"),
                F.max(F.abs(cents)).alias("max_abs_cents"),
                F.expr(
                    f"{_I64_MAX}L DIV NULLIF(MAX(ABS(TRY_CAST("
                    f"ROUND({col} * 100, 0) AS BIGINT))), 0)"
                ).alias("headroom_rows"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out
