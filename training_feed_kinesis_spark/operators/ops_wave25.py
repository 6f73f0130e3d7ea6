"""Wave 25: gate-ensemble diagnostics, tolerance-bounded as-of.

  * ``llm_quality_ensemble``: 2-of-3 majority vote over three quality
    gates with each gate's MARGINAL effect (docs whose verdict it alone
    flips) — the diagnostic that says which filters earn their place.
  * ``join_asof_tolerance``: as-of join with a staleness bound — the
    latest click ≤ the purchase counts only if it is at most 1 day old,
    else NULL (pandas merge_asof's ``tolerance``, spelled joinless).

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load_table, sane_ts

CAT_TEXT = "2.J llm-pipeline (text)"
CAT_JOIN = "2.C joins"

_TOL = "INTERVAL 1 DAY"


@register(
    "llm_quality_ensemble",
    CAT_TEXT,
    """
    WITH gates AS (
      SELECT doc_id,
             CASE WHEN len(string_split(lower(text), ' ')) >= 20
                  THEN 1 ELSE 0 END AS g1,
             CASE WHEN len(list_distinct(string_split(lower(text), ' ')))::DOUBLE
                       / len(string_split(lower(text), ' ')) >= 0.3
                  THEN 1 ELSE 0 END AS g2,
             CASE WHEN n_chars BETWEEN 50 AND 5000 THEN 1 ELSE 0 END AS g3
      FROM documents
    ),
    voted AS (
      SELECT *,
             CASE WHEN g1 + g2 + g3 >= 2 THEN 1 ELSE 0 END AS pass_maj,
             CASE WHEN (g1 + g2 + g3 = 2 AND g1 = 1)
                    OR (g1 + g2 + g3 = 1 AND g1 = 0) THEN 1 ELSE 0 END AS piv1,
             CASE WHEN (g1 + g2 + g3 = 2 AND g2 = 1)
                    OR (g1 + g2 + g3 = 1 AND g2 = 0) THEN 1 ELSE 0 END AS piv2,
             CASE WHEN (g1 + g2 + g3 = 2 AND g3 = 1)
                    OR (g1 + g2 + g3 = 1 AND g3 = 0) THEN 1 ELSE 0 END AS piv3
      FROM gates
    )
    SELECT COUNT(*)::BIGINT AS n_docs,
           SUM(pass_maj)::BIGINT AS n_pass,
           SUM(g1)::BIGINT AS g1_pass, SUM(piv1)::BIGINT AS g1_pivotal,
           SUM(g2)::BIGINT AS g2_pass, SUM(piv2)::BIGINT AS g2_pivotal,
           SUM(g3)::BIGINT AS g3_pass, SUM(piv3)::BIGINT AS g3_pivotal
    FROM voted
    """,
)
def llm_quality_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-of-3 majority vote over the length, TTR and char-range gates,
    with each gate's PIVOTAL count — documents where flipping that one
    gate's vote would change the majority verdict (the Banzhaf-style
    influence measure). A gate that is never pivotal is dead weight at
    filter time no matter what its solo pass rate says.

    Scale shape: all gate bits and pivotality flags are row-local; one
    wide combinable aggregate produces the whole report."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), " ")
    g1 = F.when(F.size(toks) >= 20, 1).otherwise(0)
    g2 = F.when(
        F.size(F.array_distinct(toks)).cast("double") / F.size(toks) >= 0.3, 1
    ).otherwise(0)
    g3 = F.when(F.col("n_chars").between(50, 5000), 1).otherwise(0)
    gates = d.select(g1.alias("g1"), g2.alias("g2"), g3.alias("g3"))
    s = F.col("g1") + F.col("g2") + F.col("g3")

    def pivotal(g):
        return F.when(
            ((s == 2) & (F.col(g) == 1)) | ((s == 1) & (F.col(g) == 0)), 1
        ).otherwise(0)

    voted = gates.select(
        "g1",
        "g2",
        "g3",
        F.when(s >= 2, 1).otherwise(0).alias("pass_maj"),
        pivotal("g1").alias("piv1"),
        pivotal("g2").alias("piv2"),
        pivotal("g3").alias("piv3"),
    )
    return voted.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("pass_maj").cast("long").alias("n_pass"),
        F.sum("g1").cast("long").alias("g1_pass"),
        F.sum("piv1").cast("long").alias("g1_pivotal"),
        F.sum("g2").cast("long").alias("g2_pass"),
        F.sum("piv2").cast("long").alias("g2_pivotal"),
        F.sum("g3").cast("long").alias("g3_pass"),
        F.sum("piv3").cast("long").alias("g3_pivotal"),
    )


@register(
    "join_asof_tolerance",
    CAT_JOIN,
    f"""
    WITH seq AS (
      SELECT event_id, user_id, event_type, ts,
             MAX(CASE WHEN event_type = 'click' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_click
      FROM events WHERE ts IS NOT NULL AND (ts IS NULL OR (ts >= TIMESTAMP '1970-01-01' AND ts < TIMESTAMP '2200-01-01'))
    )
    SELECT event_id, user_id,
           CASE WHEN last_click >= ts - {_TOL} THEN last_click END
             AS click_ts_within_tol,
           (last_click IS NOT NULL AND last_click < ts - {_TOL})
             AS stale_dropped
    FROM seq WHERE event_type = 'purchase'
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with staleness tolerance: each purchase takes the
    latest preceding click by the same user ONLY if it is at most one
    day old — older matches return NULL plus a ``stale_dropped`` flag
    (pandas ``merge_asof(tolerance=...)`` semantics). Joinless spelling:
    the window carry from ``join_asof``'s linearization plus one
    row-local CASE; the tolerance costs nothing extra.

    Scale: one shuffle on user_id, O(n log n) per hot key — inherits the
    linearized as-of's skew safety. NULL ts dropped on both engines
    (the r8 NULL-time seam)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & sane_ts("ts")  # temporal admission (r12)
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", F.col("event_id").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_click = F.max(
        F.when(F.col("event_type") == "click", F.col("ts"))
    ).over(w)
    seq = ev.select(
        "event_id", "user_id", "event_type", "ts", last_click.alias("last_click")
    )
    tol_floor = F.col("ts") - F.expr(_TOL)
    return seq.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.when(F.col("last_click") >= tol_floor, F.col("last_click")).alias(
            "click_ts_within_tol"
        ),
        (
            F.col("last_click").isNotNull() & (F.col("last_click") < tol_floor)
        ).alias("stale_dropped"),
    )
