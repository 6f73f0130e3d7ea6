"""§2.K UDF / UDAF / UDTF surface.

One of each flavor, with the cost hierarchy explicit:
  built-ins ≫ pandas_udf (Arrow-vectorized) ≫ row-at-a-time Python udf.
The row UDF exists to demonstrate the API; its docstring says why you
shouldn't use it on a hot path. Oracles reimplement each kernel in SQL.

Determinism for oracles: UDF kernels avoid order-sensitive float
reductions (numpy pairwise summation ≠ SQL sequential summation) — they
compute order-insensitive (min/max/count) or exact-rational (rank-based)
quantities, so hash-matching is sound (SURVEY §5.3).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import register
from ..tables import load_table

_ASCII_FOLD = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"
)  # ASCII case fold: engine/locale case folding diverges (textnorm.py)

CAT = "2.K udf surface"


@register(
    "udf_python",
    CAT,
    """
    SELECT event_id,
           CASE WHEN value >= 150 THEN 'high'
                WHEN value >= 50  THEN 'mid'
                ELSE 'low' END AS band_udf
    FROM events WHERE event_type = 'view'
    """,
)
def udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF — the DISCOURAGED path: every row round-trips
    JVM→pickle→Python→pickle→JVM and blocks whole-stage codegen. Kept small
    (one filtered event type) and mirrored by case_when (§2.B) which does the
    same thing ~100× cheaper JVM-side."""

    @F.udf(returnType=T.StringType())
    def band(v: float) -> str:
        if v >= 150:
            return "high"
        if v >= 50:
            return "mid"
        return "low"

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "view")
    return ev.select("event_id", band("value").alias("band_udf"))


@register(
    "udf_pandas_scalar",
    CAT,
    """
    SELECT event_id,
           ROUND(LN(1 + value), 4)          AS log1p_value,
           ROUND(value / (1 + value), 4)    AS saturation
    FROM events WHERE event_type = 'purchase'
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas_udf: Arrow batches in, numpy element-wise ops
    (no reductions → deterministic vs SQL). ~10-100× over the row UDF."""
    import numpy as np

    @F.pandas_udf(T.DoubleType())
    def log1p_v(v: pd.Series) -> pd.Series:
        return pd.Series(np.round(np.log1p(v.to_numpy()), 4))

    @F.pandas_udf(T.DoubleType())
    def saturation(v: pd.Series) -> pd.Series:
        a = v.to_numpy()
        return pd.Series(np.round(a / (1 + a), 4))

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return ev.select(
        "event_id",
        log1p_v("value").alias("log1p_value"),
        saturation("value").alias("saturation"),
    )


@register(
    "udf_pandas_agg",
    CAT,
    """
    SELECT user_id,
           ROUND(MAX(value) - MIN(value), 4) AS value_range,
           COUNT(*)                          AS n
    FROM events GROUP BY user_id
    """,
)
def udf_pandas_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas_udf (a UDAF): Series → scalar per group.
    Kernel computes max-min — order-insensitive and exact on doubles, so the
    SQL oracle is sound (a float SUM kernel would not hash-match: numpy sums
    pairwise, SQL engines sequentially)."""

    @F.pandas_udf(T.DoubleType())
    def value_range(v: pd.Series) -> float:
        return round(float(v.max() - v.min()), 4)

    @F.pandas_udf(T.LongType())
    def n_rows(v: pd.Series) -> int:
        return int(v.size)

    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        value_range("value").alias("value_range"),
        n_rows("value").alias("n"),
    )


@register(
    "udf_grouped_map",
    CAT,
    # ROW_NUMBER, not RANK: with event_id in the order key they agree on
    # clean data, but a redelivered VERBATIM duplicate row ties — RANK
    # gives both copies the same rank and skips one, where the pandas
    # side's sequential rank (and ROW_NUMBER) yields the same multiset
    # of percentiles whichever copy sorts first (events-redelivery
    # corruption replay)
    """
    SELECT event_id, user_id,
           ROUND((ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY value, event_id) - 1) * 1.0
                 / NULLIF(COUNT(*) OVER (PARTITION BY user_id) - 1, 0), 4)
             AS value_pctile
    FROM events
    """,
)
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped-map: per-user rank-normalization of value into
    [0,1]. Rank arithmetic is exact rational → bit-equal to the SQL window
    oracle regardless of group arrival order. Scale: one shuffle on the
    group key; each group must fit one Python worker's memory — for
    million-row keys switch to the window spelling (the oracle) which
    streams."""

    def pctile(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        n = len(pdf)
        order = pdf.sort_values(["value", "event_id"]).index
        rank = pd.Series(range(n), index=order, dtype="float64")
        out = pdf[["event_id", "user_id"]].copy()
        if n > 1:
            # half-UP rounding to match SQL ROUND (pandas .round is half-even:
            # 21/32 = 0.65625 → .6562 banker's vs .6563 SQL)
            out["value_pctile"] = np.floor(rank / (n - 1) * 1e4 + 0.5) / 1e4
        else:
            out["value_pctile"] = None
        return out

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    schema = "event_id long, user_id long, value_pctile double"
    return ev.groupBy("user_id").applyInPandas(pctile, schema=schema)


@register(
    "udtf_split",
    CAT,
    """
    SELECT doc_id, pos,
           string_split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ')[pos] AS token
    FROM documents, (SELECT unnest(range(1, 1000)) AS pos) p
    WHERE pos <= len(string_split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' '))
      AND doc_id < 100
    """,
)
def udtf_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function): text → (pos, token) rows, lateral-joined
    per input row. The declarative equivalent (posexplode) is preferred on
    hot paths; the UDTF exists for logic that genuinely needs imperative
    row-expansion."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: int, token: string")
    class SplitTokens:
        def eval(self, text: str):
            # a NULL doc expands to ZERO token rows — the oracle's
            # `pos <= len(string_split(NULL, ' '))` predicate is never
            # true (bare .lower() crashed the task instead;
            # doc-corruption replay)
            if text is None:
                return
            for i, tok in enumerate(text.translate(_ASCII_FOLD).split(" ")):
                yield i + 1, tok

    spark.udtf.register("split_tokens", SplitTokens)
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    d.createOrReplaceTempView("docs_for_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token
        FROM docs_for_udtf d, LATERAL split_tokens(d.text) t
        """
    )


@register("udf_mapinpandas", CAT)  # rows-only: demonstrates arbitrary batch logic
def udf_mapinpandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas over whole partitions: Arrow batch iterator in/out with a
    batch-local computation (per-batch row index + running batch sizes) that
    has no SQL equivalent — the escape hatch for imperative per-partition
    logic. Map-only, no shuffle."""

    def tag_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for i, pdf in enumerate(batches):
            out = pdf[["event_id", "user_id"]].copy()
            out["batch_no"] = i
            out["batch_rows"] = len(pdf)
            yield out

    # project to the two consumed columns BEFORE the kernel: column
    # pruning is the right Arrow-batch posture anyway, and it keeps
    # unconsumed wide/extreme columns (e.g. a sentinel timestamp beyond
    # pandas' ns bounds — r12 temporal campaign) out of the transfer
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    return ev.mapInPandas(
        tag_batches, schema="event_id long, user_id long, batch_no int, batch_rows int"
    )
