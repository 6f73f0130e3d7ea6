"""Wave 58: XML file source, Luhn validation, compression-codec integrity.

  * ``source_xml``: Spark 4's native XML file data source — write the
    selection as XML documents, read it back typed, verify content
    against the relational oracle (the ``source_orc`` fidelity pattern).
  * ``fn_luhn``: ``luhn_check`` checksum validation over synthetic
    account numbers; the oracle RE-IMPLEMENTS Luhn from digit lists, so
    Spark's built-in is differential-tested against an independent
    derivation, not trusted.
  * ``sink_parquet_codecs``: identical content written under three
    parquet compression codecs, read back, and digest-verified — codec
    choice must never change bytes-after-decode (content digests are
    oracled; sizes are an environment property, reported by tests).

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

CAT_SRC = "2.A scans/sources/sinks"
CAT_FN = "2.H scalar functions"


@register(
    "source_xml",
    CAT_SRC,
    """
    SELECT c_custkey, c_name, c_mktsegment,
           ROUND(c_acctbal, 4) AS acctbal
    FROM customer WHERE c_custkey < 200
    """,
)
def source_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingestion round-trip through Spark 4's native XML data source
    (StAX-based, built in since 4.0 — no external package): the customer
    selection is written as <row> documents and read back with an
    explicit schema; the oracle replays the selection relationally, so
    any fidelity loss in the XML writer/parser (type coercion,
    whitespace, escaping) hash-fails. The engine-facing contract is that
    a format hop is invisible.

    Scale: the XML source parallelizes by file and streams rows via
    StAX; like every loose-file format, production compacts to columnar
    early (sink_compacted) — XML is an INGEST format here, never the
    working set."""
    from .scans import scratch_dir

    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 200)
    sel = c.select(
        "c_custkey", "c_name", "c_mktsegment", F.round("c_acctbal", 4).alias("acctbal")
    )
    out = scratch_dir("xml_src_")
    sel.write.mode("overwrite").format("xml").option("rowTag", "row").save(out)
    return (
        spark.read.format("xml")
        .option("rowTag", "row")
        .schema("c_custkey long, c_name string, c_mktsegment string, acctbal double")
        .load(out)
    )


@register(
    "fn_luhn",
    CAT_FN,
    # the oracle re-derives Luhn from scratch: reverse the digits, double
    # every second, subtract 9 from two-digit doubles, sum mod 10
    """
    WITH nums AS (
      SELECT event_id,
             lpad(CAST((event_id * 37 + 11) % 100000000000 AS VARCHAR),
                  11, '0') AS acct
      FROM events WHERE event_id < 2000
    ),
    checked AS (
      SELECT event_id, acct,
             list_sum(list_transform(range(1, 12), i ->
               CASE WHEN i % 2 = 0
                 THEN CASE WHEN 2 * (ascii(substr(reverse(acct), i, 1)) - 48) > 9
                           THEN 2 * (ascii(substr(reverse(acct), i, 1)) - 48) - 9
                           ELSE 2 * (ascii(substr(reverse(acct), i, 1)) - 48) END
                 ELSE ascii(substr(reverse(acct), i, 1)) - 48
               END)) % 10 = 0 AS ok
      FROM nums
    )
    SELECT COUNT(*)::BIGINT AS n_checked,
           COUNT(*) FILTER (WHERE ok)::BIGINT AS n_valid,
           COUNT(*) FILTER (WHERE NOT ok)::BIGINT AS n_invalid,
           MIN(CASE WHEN ok THEN acct END) AS first_valid
    FROM checked
    """,
)
def fn_luhn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn checksum validation (``luhn_check``, Spark 3.5+) over
    synthetic 11-digit account numbers derived from event ids — the
    payment-data DQ gate (and the detector behind PII scanners hunting
    card-like strings). The oracle does NOT call a Luhn builtin: it
    re-implements the algorithm over digit lists, so Spark's builtin is
    differential-tested against an independent derivation — the same
    skepticism multimodal_byte_stats applies to the numpy kernel.

    Scale: pure codegen expression work; the aggregate ships 4 values."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    nums = ev.select(
        "event_id",
        F.lpad(
            ((F.col("event_id") * 37 + 11) % 100000000000).cast("string"),
            11,
            "0",
        ).alias("acct"),
    )
    checked = nums.select(
        "acct", F.expr("luhn_check(acct)").alias("ok")
    )
    # COALESCE(.., 0): SUM over an empty slice is NULL where the
    # oracle's COUNT FILTER gives 0 (empty-corpus census r6)
    return checked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_checked"),
        F.coalesce(F.sum(F.col("ok").cast("int")), F.lit(0))
        .cast("bigint")
        .alias("n_valid"),
        F.coalesce(F.sum((~F.col("ok")).cast("int")), F.lit(0))
        .cast("bigint")
        .alias("n_invalid"),
        F.min(F.when(F.col("ok"), F.col("acct"))).alias("first_valid"),
    )


_CODECS = ("snappy", "zstd", "gzip")


@register(
    "sink_parquet_codecs",
    CAT_SRC,
    # the digest is a pure function of the CONTENT, so the oracle derives
    # it straight from the source table — one row per codec, identical
    """
    WITH src AS (
      SELECT event_id, event_type, ROUND(value, 4) AS v
      FROM events WHERE event_id < 5000
    ),
    hashed AS (
      SELECT event_id,
             md5(event_id || '|' || COALESCE(event_type, '')
                 || '|' || CAST(v AS VARCHAR)) AS h
      FROM src
    ),
    digest AS (
      -- the row hash joins the concat order: a redelivered duplicate
      -- event_id would otherwise order its two copies arbitrarily here
      -- while Spark's struct sort (event_id, h) is total
      -- (events-redelivery corruption replay)
      SELECT md5(string_agg(h, '' ORDER BY event_id, h)) AS content_digest,
             COUNT(*)::BIGINT AS n_rows
      FROM hashed
    )
    SELECT codec, n_rows, content_digest
    FROM digest, (SELECT unnest(['gzip', 'snappy', 'zstd']) AS codec)
    """,
)
def sink_parquet_codecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-codec integrity: the same selection written under
    snappy, zstd, and gzip parquet compression, read back, and reduced
    to an order-insensitive content digest (md5 of id-ordered row md5s)
    — one row per codec, all three digests equal to the oracle's
    source-derived digest, proving codec choice never alters decoded
    content. Codec is THE storage/CPU dial at 100 TB (zstd ≈ gzip ratio
    at snappy-class speed); this op pins the invariant that makes the
    dial safe to turn, and tests/ report the measured size ratios.

    Scale: three bounded writes + digest aggregates; the digest spelling
    (sorted row hashes) is the same delivery-verification primitive as
    llm_shard_integrity."""
    from .scans import scratch_dir

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 5000)
    src = ev.select("event_id", "event_type", F.round("value", 4).alias("v"))
    rows = []
    for codec in _CODECS:
        out = scratch_dir(f"codec_{codec}_")
        src.write.mode("overwrite").option("compression", codec).parquet(out)
        back = spark.read.parquet(out)
        # COALESCE, not bare concat_ws: a NULL event_type must hash as an
        # EMPTY field ('id||v') on both engines — concat_ws would drop
        # the separator with the field while DuckDB's || drops the whole
        # row from its digest (NULL-attribute replay)
        digest = back.select(
            F.md5(
                F.concat_ws(
                    "|",
                    "event_id",
                    F.coalesce(F.col("event_type"), F.lit("")),
                    F.col("v").cast("string"),
                )
            ).alias("h"),
            "event_id",
        ).agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("event_id", "h"))),
                        lambda s: s.h,
                    ),
                    "",
                )
            ).alias("content_digest"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        )
        rows.append(digest.withColumn("codec", F.lit(codec)))
    out_df = rows[0]
    for r in rows[1:]:
        out_df = out_df.unionByName(r)
    # no rows -> no digest: DuckDB's string_agg over an empty set is
    # NULL (md5(NULL) = NULL) where array_join(empty) is '' and would
    # digest to d41d8... (empty-corpus census r6)
    return out_df.select(
        "codec",
        "n_rows",
        F.when(F.col("n_rows") > 0, F.col("content_digest")).alias(
            "content_digest"
        ),
    )
