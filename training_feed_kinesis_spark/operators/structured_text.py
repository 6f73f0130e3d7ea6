"""Structured-text scalar families: XML, CSV, key:value maps, URLs.

Real training-feed payloads arrive in more formats than JSON (§2.H covers
JSON/maps already): scraped pages carry XML/HTML fragments and URLs, log
exports carry CSV lines and k:v strings. Spark parses all of these JVM-side
(xpath_*, from_xml, from_csv, str_to_map, parse_url) inside whole-stage
codegen — no Python in the loop. Each operator here synthesizes the wire
format from table columns first, so the parse step is verifiable end-to-end
against a DuckDB regexp/split oracle on the same rows.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md §0.1);
capability surface reconstructed per SURVEY.md §2 and BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

CAT_FN = "2.H scalar functions"


@register(
    "fn_xml",
    CAT_FN,
    r"""
    WITH wired AS (
      SELECT doc_id,
             '<doc id="' || doc_id || '"><lang>' || lang || '</lang><src>'
               || source || '</src><len>' || n_chars || '</len></doc>' AS xml
      FROM documents
    )
    SELECT doc_id,
           regexp_extract(xml, '<lang>([^<]*)</lang>', 1) AS lang,
           regexp_extract(xml, '<src>([^<]*)</src>', 1) AS src,
           regexp_extract(xml, '<len>([0-9]+)</len>', 1)::BIGINT AS n_chars,
           regexp_extract(xml, 'id="([0-9]+)"', 1)::BIGINT AS attr_id
    FROM wired
    """,
)
def fn_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML fragment parsing: build the wire form, then recover every field
    with xpath_* (scalar path extraction) and from_xml (typed struct parse,
    Spark 4 built-in) — both JVM-side. The oracle re-extracts with POSIX
    regexps, so the whole synthesize→parse round-trip is hash-checked.
    """
    docs = load_table(spark, sf_dir, "documents")
    wired = docs.select(
        "doc_id",
        F.concat(
            F.lit('<doc id="'),
            F.col("doc_id"),
            F.lit('"><lang>'),
            F.col("lang"),
            F.lit("</lang><src>"),
            F.col("source"),
            F.lit("</src><len>"),
            F.col("n_chars"),
            F.lit("</len></doc>"),
        ).alias("xml"),
    )
    parsed = wired.select(
        "doc_id",
        F.expr("xpath_string(xml, '/doc/lang')").alias("lang"),
        F.expr("from_xml(xml, 'src STRING, len BIGINT')").alias("s"),
        F.expr("xpath_long(xml, '/doc/@id')").alias("attr_id"),
    )
    return parsed.select(
        "doc_id",
        "lang",
        F.col("s.src").alias("src"),
        F.col("s.len").alias("n_chars"),
        "attr_id",
    )


@register(
    "fn_csv",
    CAT_FN,
    # NULL-safe wire: a NULL field serializes as an EMPTY CSV field
    # (COALESCE before ||), and an empty field parses back to NULL
    # (NULLIF after split_part) — the standard CSV null convention,
    # matching Spark's from_csv/to_csv defaults. Without the coalesce,
    # DuckDB's || nulls the whole line while concat_ws silently DROPS
    # the field and shifts columns (NULL-attribute corruption replay).
    """
    WITH line AS (
      SELECT doc_id,
             COALESCE(lang, '') || ',' || COALESCE(source, '')
               || ',' || COALESCE(CAST(n_chars AS VARCHAR), '') AS csv
      FROM documents
    )
    SELECT doc_id,
           NULLIF(split_part(csv, ',', 1), '') AS lang,
           NULLIF(split_part(csv, ',', 2), '') AS source,
           NULLIF(split_part(csv, ',', 3), '')::BIGINT AS n_chars,
           csv AS roundtrip
    FROM line
    """,
)
def fn_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV line codec: from_csv parses a typed struct out of a delimited
    line; to_csv re-serializes the struct — the round-trip column proves
    codec inversion on every row. Both directions are Catalyst expressions
    (no file I/O, no Python); the oracle uses split_part on the same lines.
    NULL fields ride the wire as empty fields (coalesce on write — Spark's
    concat_ws would otherwise DROP the field and shift every column right)
    and parse back to NULL, which is from_csv's own empty-field behavior.
    Deliberate lossiness of the convention: a genuine empty-string field
    also rides as an empty field, so ''-valued lang/source read back as
    NULL — the round-trip is identity on the NULL-or-non-empty domain
    only (same on both engines; quote fields if exact '' identity is
    ever required). The same convention applies to fn_str_to_map and
    source_text.
    """
    docs = load_table(spark, sf_dir, "documents")
    line = docs.select(
        "doc_id",
        F.concat_ws(
            ",",
            F.coalesce(F.col("lang"), F.lit("")),
            F.coalesce(F.col("source"), F.lit("")),
            # every field needs its own coalesce: concat_ws DROPS a
            # NULL argument (shortening the line to two fields) where
            # the oracle's || would null the whole line — both break
            # the empty-field convention (doc-corruption replay)
            F.coalesce(F.col("n_chars").cast("string"), F.lit("")),
        ).alias("csv"),
    )
    parsed = line.select(
        "doc_id",
        F.from_csv("csv", "lang STRING, source STRING, n_chars BIGINT").alias("s"),
    )
    return parsed.select(
        "doc_id",
        F.col("s.lang").alias("lang"),
        F.col("s.source").alias("source"),
        F.col("s.n_chars").alias("n_chars"),
        F.to_csv("s").alias("roundtrip"),
    )


@register(
    "fn_str_to_map",
    CAT_FN,
    # NULL-safe wire: a NULL attribute serializes as an EMPTY k:v value
    # ('lang:,src:x,...') — COALESCE on both engines, because Spark's
    # concat and DuckDB's || both NULL the whole line otherwise and the
    # oracle's constant n_keys=3 then diverges from size(NULL map)
    # (NULL-attribute corruption replay). Empty values extract as ''
    # identically via str_to_map and the [^,]* regexp.
    """
    WITH kv AS (
      SELECT doc_id,
             'lang:' || COALESCE(lang, '') || ',src:'
               || COALESCE(source, '')
               || ',len:' || COALESCE(CAST(n_chars AS VARCHAR), '') AS s
      FROM documents
    )
    SELECT doc_id,
           regexp_extract(s, 'lang:([^,]*)', 1) AS lang,
           regexp_extract(s, 'src:([^,]*)', 1) AS src,
           NULLIF(regexp_extract(s, 'len:([0-9]*)', 1), '')::BIGINT AS len,
           3::INT AS n_keys
    FROM kv
    """,
)
def fn_str_to_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k:v string → MapType via str_to_map (the classic log-line attribute
    bag), then typed element_at access and map cardinality. The oracle
    recovers each key by regexp from the identical wire string. NULL
    attributes ride the wire as empty values (the log-line convention;
    coalesced identically on both engines) and read back as ''.
    """
    docs = load_table(spark, sf_dir, "documents")
    kv = docs.select(
        "doc_id",
        F.concat(
            F.lit("lang:"),
            F.coalesce(F.col("lang"), F.lit("")),
            F.lit(",src:"),
            F.coalesce(F.col("source"), F.lit("")),
            F.lit(",len:"),
            # every field needs its own coalesce: a NULL n_chars would
            # NULL the whole wire string on both engines, but the
            # oracle's CONSTANT n_keys=3 then diverges from Spark's
            # size(NULL map) (doc-corruption replay); the empty value
            # parses back to NULL via NULLIF — bare CAST('') would
            # hard-error under ANSI
            F.coalesce(F.col("n_chars").cast("string"), F.lit("")),
        ).alias("s"),
    )
    m = kv.select("doc_id", F.expr("str_to_map(s, ',', ':')").alias("m"))
    return m.select(
        "doc_id",
        F.element_at("m", "lang").alias("lang"),
        F.element_at("m", "src").alias("src"),
        F.expr("CAST(NULLIF(element_at(m, 'len'), '') AS BIGINT)").alias(
            "len"
        ),
        F.size("m").alias("n_keys"),
    )


@register(
    "fn_url",
    CAT_FN,
    """
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.com/docs/' || doc_id
               || '?lang=' || lang || '&n=' || n_chars AS url
      FROM documents
    )
    -- a URL carrying raw non-ASCII/control bytes is INVALID by contract
    -- (r11 Unicode campaign): java.net.URI (Spark parse_url) rejects it
    -- to NULL while a bare regex would happily extract — both engines
    -- now gate on printable-ASCII first (production percent-encodes or
    -- punycodes upstream of this operator)
    SELECT doc_id,
           CASE WHEN NOT regexp_matches(url, '[^!-~]')
                THEN regexp_extract(url, '^https://([^/]+)/', 1) END AS host,
           CASE WHEN NOT regexp_matches(url, '[^!-~]')
                THEN regexp_extract(url, '^https://[^/]+(/[^?]*)', 1)
           END AS path,
           CASE WHEN NOT regexp_matches(url, '[^!-~]')
                THEN regexp_extract(url, '[?&]lang=([^&]*)', 1) END AS qlang,
           CASE WHEN NOT regexp_matches(url, '[^!-~]')
                THEN regexp_extract(url, '^([a-z]+)://', 1) END AS protocol
    FROM u
    """,
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition with parse_url (HOST / PATH / keyed QUERY /
    PROTOCOL) — the provenance-extraction step of any web-scrape corpus
    (crawl dedup by host, routing by path). The oracle re-derives each
    component with anchored regexps over the same synthesized URLs.
    """
    docs = load_table(spark, sf_dir, "documents")
    u = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".example.com/docs/"),
            F.col("doc_id"),
            F.lit("?lang="),
            F.col("lang"),
            F.lit("&n="),
            F.col("n_chars"),
        ).alias("url"),
    )
    # printable-ASCII gate mirrored from the oracle (see oracle comment):
    # keeps the validity rule engine-owned instead of java.net.URI-owned
    ok = "url NOT RLIKE '[^!-~]'"
    return u.select(
        "doc_id",
        F.expr(f"CASE WHEN {ok} THEN parse_url(url, 'HOST') END").alias(
            "host"
        ),
        F.expr(f"CASE WHEN {ok} THEN parse_url(url, 'PATH') END").alias(
            "path"
        ),
        F.expr(
            f"CASE WHEN {ok} THEN parse_url(url, 'QUERY', 'lang') END"
        ).alias("qlang"),
        F.expr(
            f"CASE WHEN {ok} THEN parse_url(url, 'PROTOCOL') END"
        ).alias("protocol"),
    )
