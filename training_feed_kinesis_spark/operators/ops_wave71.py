"""Wave 71: covariate balance, candidate-key discovery.

  * ``events_covariate_balance``: standardized mean differences of
    pre-treatment covariates between experiment arms — the balance
    table every causal readout prints before trusting its effect.
  * ``dq_candidate_keys``: uniqueness census over columns and column
    pairs — which fields (alone or combined) actually identify a row,
    the first question data modeling and dedup both ask.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table
from .ops_wave54 import _assign_spark

CAT_EXP = "2.L experimentation"
CAT_DQ = "2.L data quality / privacy"

_ASSIGN_SQL = (
    "CASE WHEN strpos('02468ace', substr(md5(user_id::VARCHAR), 1, 1)) > 0"
    " THEN 'A' ELSE 'B' END"
)


@register(
    "events_covariate_balance",
    CAT_EXP,
    f"""
    WITH per_user AS (
      SELECT user_id, {_ASSIGN_SQL} AS arm,
             COUNT(*)::DOUBLE AS activity,
             AVG(value) AS mean_value,
             SUM(CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0 END)
               / COUNT(*) AS purchase_share
      FROM events GROUP BY user_id
    ),
    longf AS (
      SELECT arm, 'activity' AS covariate, activity AS x FROM per_user
      UNION ALL
      SELECT arm, 'mean_value', mean_value FROM per_user
      UNION ALL
      SELECT arm, 'purchase_share', purchase_share FROM per_user
    ),
    moments AS (
      SELECT covariate, arm, COUNT(*)::DOUBLE AS n, AVG(x) AS m,
             SUM(x * x) / COUNT(*) - AVG(x) * AVG(x) AS v
      FROM longf GROUP BY covariate, arm
    )
    SELECT covariate,
           ROUND(MAX(CASE WHEN arm = 'A' THEN m END), 4) AS mean_a,
           ROUND(MAX(CASE WHEN arm = 'B' THEN m END), 4) AS mean_b,
           ROUND((MAX(CASE WHEN arm = 'A' THEN m END)
                  - MAX(CASE WHEN arm = 'B' THEN m END))
                 / NULLIF(sqrt((MAX(CASE WHEN arm = 'A' THEN v END)
                         + MAX(CASE WHEN arm = 'B' THEN v END)) / 2), 0), 4)
             AS smd,
           ABS((MAX(CASE WHEN arm = 'A' THEN m END)
                - MAX(CASE WHEN arm = 'B' THEN m END))
               / NULLIF(sqrt((MAX(CASE WHEN arm = 'A' THEN v END)
                       + MAX(CASE WHEN arm = 'B' THEN v END)) / 2), 0)) > 0.1
             AS imbalanced
    FROM moments GROUP BY covariate
    """,
)
def events_covariate_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covariate balance between experiment arms: the standardized mean
    difference SMD = (m_A − m_B)/√((v_A+v_B)/2) for each pre-treatment
    covariate (activity, mean value, purchase share) — |SMD| > 0.1
    is the conventional imbalance flag. The table every A/B readout
    prints FIRST: a significant "effect" on an imbalanced assignment is
    a selection artifact, not a treatment effect (the per-covariate
    companion of the count-level events_ab_srm_check).

    Scale shape: one user-grain aggregate, a 3-way unpivot of the
    covariates, and a (covariate × arm) moment rollup — all
    map-combinable."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.first(_assign_spark()).alias("arm"),
        F.count(F.lit(1)).cast("double").alias("activity"),
        F.avg("value").alias("mean_value"),
        (F.sum(F.when(F.col("event_type") == "purchase", 1.0).otherwise(0.0))
         / F.count(F.lit(1))).alias("purchase_share"),
    )
    longf = None
    for cov in ("activity", "mean_value", "purchase_share"):
        part = per_user.select(
            "arm", F.lit(cov).alias("covariate"), F.col(cov).alias("x")
        )
        longf = part if longf is None else longf.unionByName(part)
    moments = longf.groupBy("covariate", "arm").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("x").alias("m"),
        (F.sum(F.col("x") * F.col("x")) / F.count(F.lit(1)) - F.avg("x") * F.avg("x")).alias("v"),
    )
    ma = F.max(F.when(F.col("arm") == "A", F.col("m")))
    mb = F.max(F.when(F.col("arm") == "B", F.col("m")))
    va = F.max(F.when(F.col("arm") == "A", F.col("v")))
    vb = F.max(F.when(F.col("arm") == "B", F.col("v")))
    smd = (ma - mb) / F.nullif(F.sqrt((va + vb) / 2), F.lit(0.0))
    return moments.groupBy("covariate").agg(
        F.round(ma, 4).alias("mean_a"),
        F.round(mb, 4).alias("mean_b"),
        F.round(smd, 4).alias("smd"),
        (F.abs(smd) > 0.1).alias("imbalanced"),
    )


_KEY_CANDIDATES = [
    ("event_id",),
    ("user_id",),
    ("ts",),
    ("user_id", "ts"),
    ("event_type", "ts"),
    ("user_id", "event_type"),
]


def _uniq_sql(cols: tuple[str, ...]) -> str:
    expr = " || '|' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)
    name = "+".join(cols)
    return f"""
    SELECT '{name}' AS candidate,
           COUNT(*)::BIGINT AS n_rows,
           COUNT(DISTINCT {expr})::BIGINT AS n_distinct,
           COUNT(*) = COUNT(DISTINCT {expr}) AS is_key
    FROM events"""


@register(
    "dq_candidate_keys",
    CAT_DQ,
    " UNION ALL ".join(_uniq_sql(c) for c in _KEY_CANDIDATES),
)
def dq_candidate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-key discovery: for each column (and pair) in the probe
    set, does distinct-count equal row-count? The answer determines the
    dedup key, the state-store key, and the merge key downstream —
    event_id must be a key (the exactly-once contract), user_id must
    NOT be, and near-keys (distinct ≈ rows) expose almost-unique fields
    that silently break joins at 100× when the first collision arrives.

    Scale shape: one aggregate per candidate over the same scan
    (Catalyst shares it); at production scale the distinct counts swap
    to approx_count_distinct for a first pass, exact only on survivors."""
    ev = load_table(spark, sf_dir, "events")
    out = None
    for cols in _KEY_CANDIDATES:
        # the composite must be NULL when ANY component is NULL — a row
        # with a NULL key part can never witness uniqueness, and DuckDB's
        # || already NULL-propagates while concat_ws silently DROPS null
        # parts, collapsing distinct composites (caught by the
        # NULL-attribute corruption replay)
        import functools

        notnull = functools.reduce(
            lambda a, b: a & b, [F.col(c).isNotNull() for c in cols]
        )
        expr = F.when(
            notnull,
            F.concat_ws("|", *[F.col(c).cast("string") for c in cols]),
        )
        part = ev.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.countDistinct(expr).cast("bigint").alias("n_distinct"),
        ).select(
            F.lit("+".join(cols)).alias("candidate"),
            "n_rows",
            "n_distinct",
            (F.col("n_rows") == F.col("n_distinct")).alias("is_key"),
        )
        out = part if out is None else out.unionByName(part)
    return out
