"""Wave 96 (round 6, late session): two famous-method gaps in the
dedup and similarity families, each the canonical production spelling.

  * ``llm_dup_span_census``: substring-level duplication census — the
    character-gram → cross-doc-shared-gram → merged-span pipeline of
    exact substring deduplication (Lee et al., "Deduplicating Training
    Data Makes Language Models Better", ACL 2022, re-expressed
    relationally instead of via suffix arrays). Completes the dedup
    ladder: byte-exact doc (llm_dedup_exact) → paragraph → prefix →
    token-set (fingerprint/minhash) → fingerprint spans (llm_winnow)
    → contiguous duplicated SPANS with per-doc duplicated-char counts.
  * ``vec_twostage_rerank``: two-stage retrieval — cheap SQ8
    integer-code scan to a bounded shortlist, exact float rerank of
    the shortlist only — the pattern every production ANN system
    (IVF+refine, DiskANN, ScaNN) ships, measured as recall@5 against
    the exact ranking.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

import os as _os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from .llm_similarity import VEC_ADMIT_SQL, load_embeddings_admitted
from ..tables import load_table, parallelize

CAT_DEDUP = "2.J llm-pipeline (dedup)"
CAT_VEC = "2.J llm-pipeline (similarity)"

# Substring-dedup gram length. 24 chars ≈ 4-5 words on this corpus —
# long enough that sharing means real phrase reuse (at sf0.001 ~55% of
# docs carry at least one cross-doc 24-gram; 12-grams are shared by
# every doc, pure vocabulary overlap).
SPAN_K = 24
# 16 hex chars = 64-bit gram keys: collision-negligible at any corpus
# this container sees, and the right width to keep at 100 TB (a 32-bit
# key collides within ~100k grams; 64-bit holds to ~10^9.5).
_GH_HEX = 16

_LT_EXPR = (
    "translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',"
    " 'abcdefghijklmnopqrstuvwxyz')"
)

# LINEAR overlapping-gram enumeration (r12 payload campaign), shared by
# llm_dup_span_census and llm_dup_span_extract on BOTH engines. The
# naive per-position spelling — substr(lt, pos, K) for every pos — is
# O(chars²) per document, because char-indexed substr on a UTF-8 string
# must scan from the start (O(pos) per call, in Spark's UTF8String and
# DuckDB alike): a corpus with 100 KB documents took 251 s oracle-side
# and ~7 min Spark-side. Every overlapping K-gram is instead produced by
# K SHIFTED NON-OVERLAPPING chunkings, each a single O(n) regex pass:
# for offset r in [0, K), '(?s).{K}' over substring(lt, r+1) yields the
# grams at positions ≡ r+1 (mod K), and pos = r + 1 + chunk_index·K.
# Gram set and positions are IDENTICAL to the per-position spelling
# ((?s) keeps '.' matching newlines; both engines' '.' is one code
# point, the same grid their length()/substring() count). AS
# MATERIALIZED is load-bearing on the DuckDB side: plain CTEs inline,
# which would re-evaluate the fold (and the regex) inside per-row
# projections of the laterals.
GRAMS_CTES = f"""lt AS MATERIALIZED (
      SELECT doc_id, {_LT_EXPR} AS lt
      FROM documents WHERE length(text) >= {SPAN_K}
    ),
    chunks AS MATERIALIZED (
      SELECT doc_id, length(lt) AS doc_len, CAST(r AS INT) AS r,
             regexp_extract_all(substr(lt, CAST(r AS INT) + 1),
                                '(?s).{{{SPAN_K}}}') AS cs
      FROM lt, UNNEST(range(0, {SPAN_K})) AS t(r)
    ),
    grams AS (
      -- zipped multi-unnest (r13): the former lateral
      -- `chunks, UNNEST(range(1, len(cs)+1)) AS t(i)` + `cs[i]` carried
      -- the WHOLE cs list (4k+ grams on a 100 KB doc) into every one of
      -- its len(cs) output rows before the projection indexed it —
      -- 90.3 s for 3.1 M grams on the payload-extremes corpus. Parallel
      -- unnests in the SELECT clause zip element-for-element (equal
      -- lengths by construction), so each output row is born with just
      -- its own gram: 1.3 s, EXCEPT-verified identical both directions.
      SELECT doc_id, doc_len,
             CAST(r + 1 + (i - 1) * {SPAN_K} AS INT) AS pos,
             substr(md5(g), 1, {_GH_HEX}) AS gh
      FROM (SELECT doc_id, doc_len, r,
                   unnest(cs) AS g,
                   unnest(range(1, len(cs) + 1)) AS i
            FROM chunks)
    )"""


def _gram_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, doc_len, pos, gh) — one row per overlapping SPAN_K-char
    gram, via the linear K-shifted-chunkings spelling (see GRAMS_CTES).
    The Spark win is double: substring-per-position was O(pos) per call,
    and the exploded (pos, lt) rows carried the WHOLE document text into
    the explode — here the text fans out only K ways (one substring copy
    per shift), and the exploded rows carry 24-char grams."""
    import os as _os

    d = parallelize(load_table(spark, sf_dir, "documents"))
    offs = spark.range(SPAN_K).select(F.col("id").cast("int").alias("r"))
    chunks = (
        d.filter(F.length("text") >= SPAN_K)
        .select("doc_id", F.expr(_LT_EXPR).alias("lt"))
        .crossJoin(F.broadcast(offs))
        .select(
            "doc_id",
            F.length("lt").alias("doc_len"),
            "r",
            F.expr(
                f"regexp_extract_all(substring(lt, r + 1),"
                f" '(?s).{{{SPAN_K}}}', 0)"
            ).alias("cs"),
        )
    )
    g = chunks.select(
        "doc_id", "doc_len", "r", F.posexplode("cs").alias("ci", "gram")
    )
    # TFK_HASH_SHINGLES=1 (same flag as llm_contamination): 8-byte
    # xxhash64 keys instead of 16-hex-char strings — halves both
    # shuffles; off by default only because xxhash64 has no DuckDB twin.
    gh = (
        F.xxhash64("gram")
        if _os.environ.get("TFK_HASH_SHINGLES") == "1"
        else F.substring(F.md5("gram"), 1, _GH_HEX)
    )
    return g.select(
        "doc_id",
        "doc_len",
        (F.col("r") + 1 + F.col("ci") * SPAN_K).alias("pos"),
        gh.alias("gh"),
    )


@register(
    "llm_dup_span_census",
    CAT_DEDUP,
    f"""
    WITH {GRAMS_CTES},
    shared AS (
      SELECT gh FROM grams GROUP BY gh HAVING MIN(doc_id) <> MAX(doc_id)
    ),
    hits AS (
      SELECT g.doc_id, g.doc_len, g.pos, g.pos + {SPAN_K} - 1 AS epos
      FROM grams g SEMI JOIN shared s ON g.gh = s.gh
    ),
    flagged AS (
      SELECT doc_id, doc_len, pos, epos,
             CASE WHEN MAX(epos) OVER (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  IS NULL
                  OR pos > MAX(epos) OVER (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
                  THEN 1 ELSE 0 END AS new_span
      FROM hits
    ),
    islands AS (
      SELECT doc_id, doc_len, pos, epos,
             SUM(new_span) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS UNBOUNDED PRECEDING) AS span_id
      FROM flagged
    ),
    spans AS (
      SELECT doc_id, doc_len, span_id,
             MAX(epos) - MIN(pos) + 1 AS span_chars
      FROM islands GROUP BY doc_id, doc_len, span_id
    )
    SELECT doc_id,
           COUNT(*)::BIGINT AS n_spans,
           CAST(SUM(span_chars) AS BIGINT) AS dup_chars,
           CAST(doc_len AS BIGINT) AS doc_len,
           CAST((2 * SUM(span_chars) * 10000 + doc_len)
                // (2 * doc_len) AS BIGINT) AS dup_frac_x1e4
    FROM spans
    GROUP BY doc_id, doc_len
    """,
)
def llm_dup_span_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplication census (Lee et al. 2022's ExactSubstr
    semantics, relational spelling): every 24-char gram shared by ≥2
    DISTINCT documents marks its [pos, pos+23] interval; per document,
    overlapping-or-adjacent intervals merge into maximal duplicated
    spans (gaps-and-islands over a running MAX(end) window); the census
    reports spans, duplicated chars, and the duplicated fraction
    (exact half-away x1e4 integer — `(2·c·10⁴ + L) DIV (2·L)`).
    Only docs with ≥1 cross-doc span appear; grams repeated solely
    WITHIN one doc do not count (MIN(doc)<>MAX(doc) is the two-sided
    spelling of COUNT(DISTINCT doc)≥2 with O(1) combiner state).

    Scale shape: grams carry (doc_id, pos, 64-bit hash) — never text —
    so the big relation is ~corpus_chars rows of 24 bytes
    (``TFK_HASH_SHINGLES=1`` swaps the 16-hex-char string key for an
    8-byte xxhash64 BIGINT, the llm_contamination discipline). The shared
    set reduces map-side (MIN/MAX combiners), the probe is a semi-join
    on the hash, and the island window shuffles only hit positions
    (duplicated regions, a small fraction of the corpus). The suffix
    array of the original paper is what this pipeline replaces: the
    gram-hash join finds the same ≥K-char cross-doc repeats with
    shuffle-friendly primitives and no global sort."""
    # linear K-shifted-chunkings gram enumeration (r12 payload
    # campaign) — see _gram_rows / GRAMS_CTES; the TFK_HASH_SHINGLES=1
    # BIGINT-key variant lives there too, equivalence pinned by
    # test_dup_span_census_hashed_grams_equivalent
    grams = _gram_rows(spark, sf_dir)
    shared = (
        grams.groupBy("gh")
        .agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
        .filter(F.col("lo") != F.col("hi"))
        .select("gh")
    )
    hits = grams.join(shared, "gh", "left_semi").select(
        "doc_id",
        "doc_len",
        "pos",
        (F.col("pos") + SPAN_K - 1).alias("epos"),
    )
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev_end = F.max("epos").over(w_prev)
    islands = hits.withColumn(
        "new_span",
        F.when(
            prev_end.isNull() | (F.col("pos") > prev_end + 1), 1
        ).otherwise(0),
    ).withColumn("span_id", F.sum("new_span").over(w_run))
    spans = islands.groupBy("doc_id", "doc_len", "span_id").agg(
        (F.max("epos") - F.min("pos") + 1).alias("span_chars")
    )
    return spans.groupBy("doc_id", "doc_len").agg(
        F.count("*").cast("bigint").alias("n_spans"),
        F.sum("span_chars").cast("bigint").alias("dup_chars"),
    ).select(
        "doc_id",
        "n_spans",
        "dup_chars",
        F.col("doc_len").cast("bigint").alias("doc_len"),
        F.expr(
            "CAST((2 * dup_chars * 10000 + doc_len)"
            " DIV (2 * doc_len) AS BIGINT)"
        ).alias("dup_frac_x1e4"),
    )


# Two-stage retrieval: SQ8 integer scan → shortlist → exact rerank.
_SHORTLIST = 25
_TOPK = 5
_N_PROBES = 10


@register(
    "vec_twostage_rerank",
    CAT_VEC,
    f"""
    WITH {VEC_ADMIT_SQL},
    dims AS (
      SELECT i, MIN(CAST(embedding[i] AS DOUBLE)) AS lo,
             MAX(CAST(embedding[i] AS DOUBLE)) AS hi
      FROM embeddings_adm, UNNEST(range(1, 65)) AS t(i)
      GROUP BY i
    ),
    codes AS (
      SELECT e.vec_id,
             list(CAST(ROUND(255 * (CAST(e.embedding[d.i] AS DOUBLE) - d.lo)
                             / (d.hi - d.lo), 0) AS BIGINT)
                  ORDER BY d.i) AS code
      FROM embeddings_adm e CROSS JOIN dims d
      GROUP BY e.vec_id
    ),
    shortlist AS (
      SELECT ca.vec_id AS probe, cb.vec_id AS neighbor,
             ROW_NUMBER() OVER (PARTITION BY ca.vec_id ORDER BY
               list_sum(list_transform(range(1, 65),
                 i -> (ca.code[i] - cb.code[i]) * (ca.code[i] - cb.code[i])))
               ASC, cb.vec_id ASC) AS rn_c
      FROM codes ca JOIN codes cb ON ca.vec_id != cb.vec_id
      WHERE ca.vec_id < {_N_PROBES}
    ),
    rerank AS (
      SELECT s.probe, s.neighbor,
             ROW_NUMBER() OVER (PARTITION BY s.probe ORDER BY
               ROUND(list_sum(list_transform(range(1, 65),
                 i -> (CAST(a.embedding[i] AS DOUBLE)
                       - CAST(b.embedding[i] AS DOUBLE))
                      * (CAST(a.embedding[i] AS DOUBLE)
                         - CAST(b.embedding[i] AS DOUBLE)))), 4) ASC,
               s.neighbor ASC) AS rn
      FROM shortlist s
      JOIN embeddings_adm a ON a.vec_id = s.probe
      JOIN embeddings_adm b ON b.vec_id = s.neighbor
      WHERE s.rn_c <= {_SHORTLIST}
    ),
    exact AS (
      SELECT a.vec_id AS probe, b.vec_id AS neighbor,
             ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY
               ROUND(list_sum(list_transform(range(1, 65),
                 i -> (CAST(a.embedding[i] AS DOUBLE)
                       - CAST(b.embedding[i] AS DOUBLE))
                      * (CAST(a.embedding[i] AS DOUBLE)
                         - CAST(b.embedding[i] AS DOUBLE)))), 4) ASC,
               b.vec_id ASC) AS rn
      FROM embeddings_adm a JOIN embeddings_adm b ON a.vec_id != b.vec_id
      WHERE a.vec_id < {_N_PROBES}
    )
    SELECT e.probe,
           COUNT(*) FILTER (WHERE r.rn IS NOT NULL)::BIGINT AS hits,
           CAST(COUNT(*) FILTER (WHERE r.rn IS NOT NULL) * 2000
                AS BIGINT) AS recall_x1e4
    FROM exact e
    LEFT JOIN rerank r ON r.probe = e.probe AND r.neighbor = e.neighbor
      AND r.rn <= {_TOPK}
    WHERE e.rn <= {_TOPK}
    GROUP BY e.probe
    """,
)
def vec_twostage_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage ANN retrieval, measured: stage 1 scans SQ8 integer
    codes (4× smaller than float32, exact BIGINT distances) to a
    25-candidate shortlist per probe; stage 2 reranks ONLY the
    shortlist with exact float L2 (4-dp-rounded, id tiebreak — both
    rankings engine-deterministic); recall@5 vs the exact full-scan
    ranking. Because rerank uses the true metric, two-stage recall@5
    equals the shortlist's coverage of the exact top-5 — so this also
    bounds stage-1 loss, and per probe it can never be BELOW plain
    SQ8 recall@5 (shortlist 25 ⊇ code top-5; invariant-tested against
    vec_sq8_recall).

    Scale shape: stage 1 is the memory-bandwidth-bound scan every
    production system optimizes (integer SIMD over codes; per-probe
    top-S is a partial TakeOrdered, no full sort); stage 2 touches
    S·Q full vectors instead of N·Q — at 10⁹ vectors that is the
    difference between reading 256 GB of codes and 4 TB of floats per
    query batch. Probe panel broadcasts; code construction reuses the
    vec_sq8_recall spelling (ops_wave82.py) so the two keys' stage-1
    rankings are comparable by construction."""
    em = load_embeddings_admitted(spark, sf_dir)
    dims = (
        em.select(F.posexplode(F.col("embedding")).alias("i0", "x"))
        .groupBy((F.col("i0") + 1).alias("i"))
        .agg(
            F.min(F.col("x").cast("double")).alias("lo"),
            F.max(F.col("x").cast("double")).alias("hi"),
        )
    )
    ranges = dims.agg(
        F.array_sort(F.collect_list(F.struct("i", "lo", "hi"))).alias("rs")
    )
    codes = em.crossJoin(F.broadcast(ranges)).select(
        "vec_id",
        "embedding",
        F.expr(
            "transform(rs, r -> CAST(ROUND(255 *"
            " (CAST(element_at(embedding, CAST(r.i AS INT)) AS DOUBLE)"
            " - r.lo) / (r.hi - r.lo), 0) AS BIGINT))"
        ).alias("code"),
    )
    probes_c = codes.filter(F.col("vec_id") < _N_PROBES).select(
        F.col("vec_id").alias("probe"),
        F.col("code").alias("pc"),
        F.col("embedding").alias("pe"),
    )
    dc = F.expr(
        "aggregate(zip_with(pc, code, (x, y) -> (x - y) * (x - y)),"
        " CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )
    w_c = Window.partitionBy("probe").orderBy(
        F.col("dci").asc(), F.col("neighbor").asc()
    )
    shortlist = (
        F.broadcast(probes_c)
        .crossJoin(
            codes.select(
                F.col("vec_id").alias("neighbor"),
                F.col("code"),
                F.col("embedding").alias("ne"),
            )
        )
        .filter(F.col("probe") != F.col("neighbor"))
        .select("probe", "pe", "neighbor", "ne", dc.alias("dci"))
        .withColumn("rn_c", F.row_number().over(w_c))
        .filter(F.col("rn_c") <= _SHORTLIST)
    )
    d2 = F.expr(
        "aggregate(zip_with(pe, ne, (x, y) ->"
        " (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))"
        " * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),"
        " 0D, (acc, v) -> acc + v)"
    )
    w_r = Window.partitionBy("probe").orderBy(
        F.col("d2r").asc(), F.col("neighbor").asc()
    )
    rerank = (
        shortlist.select("probe", "neighbor", F.round(d2, 4).alias("d2r"))
        .withColumn("rn", F.row_number().over(w_r))
        .filter(F.col("rn") <= _TOPK)
        .select("probe", "neighbor")
    )
    probes_e = em.filter(F.col("vec_id") < _N_PROBES).select(
        F.col("vec_id").alias("probe"), F.col("embedding").alias("pe")
    )
    d2e = F.expr(
        "aggregate(zip_with(pe, embedding, (x, y) ->"
        " (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))"
        " * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),"
        " 0D, (acc, v) -> acc + v)"
    )
    w_e = Window.partitionBy("probe").orderBy(
        F.col("d2r").asc(), F.col("neighbor").asc()
    )
    exact = (
        F.broadcast(probes_e)
        .crossJoin(em.select(F.col("vec_id").alias("neighbor"), "embedding"))
        .filter(F.col("probe") != F.col("neighbor"))
        .select("probe", "neighbor", F.round(d2e, 4).alias("d2r"))
        .withColumn("rn", F.row_number().over(w_e))
        .filter(F.col("rn") <= _TOPK)
        .select("probe", "neighbor")
    )
    hit = rerank.withColumn("hit", F.lit(1))
    return (
        exact.join(hit, ["probe", "neighbor"], "left")
        .groupBy("probe")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("bigint").alias("hits"))
        .select(
            "probe",
            "hits",
            (F.col("hits") * 2000).cast("bigint").alias("recall_x1e4"),
        )
    )
