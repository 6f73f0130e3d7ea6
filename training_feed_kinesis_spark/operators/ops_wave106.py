"""Wave 106 — binary-container corruption admission census (round 12).

VERDICT r11 item 6: the multimodal binary substrate was the only family
no corruption campaign had stressed. This wave productizes that
campaign the same way wave 105 productized the Unicode one — as a
shippable admission census:

  * ``multimodal_bmp_admission_census``: every document's payload is
    encoded into the canonical 24-bit BMP (the wave-79 encoder,
    verbatim), then a deterministic corruption class is applied by
    doc_id — truncated mid-FILEHEADER, truncated mid-pixel-array,
    zero-length, magic flipped, trailing overlong bytes, unsupported
    bpp — and a TOTAL parser (no raise; every malformed shape maps to a
    status) re-reads the bytes. The census counts payloads and exact
    byte totals per admission status.

The parser is the real validation path a 100 TB multimodal ingest needs
in front of the strict decode kernel (wave 79 raises on malformed input
by contract — correct for the encode→decode loop it owns, fatal for
ingest): classify → quarantine → decode only the 'ok' partition. The
DuckDB oracle re-derives every status and byte count from first
principles (BMP geometry arithmetic over doc_id), so the WHOLE
corrupt→parse→classify loop is hash-checked, not rows-only.

Scale shape: one map-only mapInPandas stage (encode + corrupt + parse
fused per batch — payload bytes never shuffle), then a ≤7-row
aggregation. Non-UTF8 byte values need no special casing: payloads are
``binary`` end to end (md5 bytes span all 256 values already).

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .multimodal import _with_payload
from .ops_wave79 import _bmp_encode_batch

CAT = "2.J llm-pipeline (multimodal)"

# Canonical BMP sizes by doc_id % 3 (wave-79 geometry: w in {2,4,8},
# h = 16/w, stride = ((3w+3)//4)*4, file = 54 + stride*h):
#   w=2: 54 + 8*8  = 118;  w=4: 54 + 12*4 = 102;  w=8: 54 + 24*2 = 102
_INTACT_SQL = "CASE doc_id % 3 WHEN 0 THEN 118 ELSE 102 END"


def bmp_parse_status(b: bytes) -> str:
    """TOTAL BMP admission parser: classify a payload without raising.
    Mirrors the strict wave-79 decode checks, mapped to statuses; the
    classification order below is the oracle's CASE order — keep in
    sync. A payload is 'ok' only if the strict kernel would accept it
    AND every declared byte is present (no short pixel array, no
    trailing junk)."""
    import struct

    if len(b) == 0:
        return "empty"
    if len(b) < 2 or b[0:2] != b"BM":
        return "not_bmp"
    if len(b) < 54:
        return "truncated_header"
    (file_size,) = struct.unpack("<I", b[2:6])
    (offset,) = struct.unpack("<I", b[10:14])
    hsz, w, h, planes, bpp = struct.unpack("<IiiHH", b[14:30])
    if hsz != 40 or planes != 1 or bpp != 24:
        return "bad_variant"
    if w <= 0 or h <= 0 or offset < 54:
        return "bad_geometry"
    stride = ((3 * w + 3) // 4) * 4
    expected = offset + stride * h
    if len(b) < expected or file_size > len(b):
        return "truncated"
    if len(b) > file_size:
        return "overlong"
    return "ok"


def _corrupt(doc_id: int, b: bytes) -> bytes:
    """Deterministic corruption class by doc_id % 7 (0 = intact)."""
    m = doc_id % 7
    if m == 1:
        return b[:10]            # mid-FILEHEADER          -> truncated_header
    if m == 2:
        return b[:60]            # header ok, pixels short -> truncated
    if m == 3:
        return b""               #                          -> empty
    if m == 4:
        return b"XM" + b[2:]     # magic flipped            -> not_bmp
    if m == 5:
        return b + b"\xde\xad\xbe\xef" * 4  # 16 junk bytes -> overlong
    if m == 6:
        # patch bpp (offset 28, <H) to 32: unsupported variant
        return b[:28] + (32).to_bytes(2, "little") + b[30:]
    return b


def _corrupt_and_parse(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out_status, out_len = [], []
        for i, b in zip(pdf["doc_id"], pdf["bmp"]):
            cb = _corrupt(int(i), bytes(b))
            out_status.append(bmp_parse_status(cb))
            out_len.append(len(cb))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "status": out_status,
                "n_bytes": out_len,
            }
        )


@register(
    "multimodal_bmp_admission_census",
    CAT,
    f"""
    WITH g AS (
      SELECT doc_id,
             {_INTACT_SQL} AS intact,
             doc_id % 7 AS m
      FROM documents WHERE text IS NOT NULL AND doc_id IS NOT NULL
    ),
    cls AS (
      SELECT doc_id,
             CASE m
               WHEN 1 THEN 'truncated_header'
               WHEN 2 THEN 'truncated'
               WHEN 3 THEN 'empty'
               WHEN 4 THEN 'not_bmp'
               WHEN 5 THEN 'overlong'
               WHEN 6 THEN 'bad_variant'
               ELSE 'ok'
             END AS status,
             CASE m
               WHEN 1 THEN 10
               WHEN 2 THEN 60
               WHEN 3 THEN 0
               WHEN 5 THEN intact + 16
               ELSE intact
             END AS n_bytes
      FROM g
    )
    SELECT status,
           COUNT(*)::BIGINT AS n_payloads,
           SUM(n_bytes)::BIGINT AS total_bytes,
           MIN(n_bytes)::BIGINT AS min_bytes,
           MAX(n_bytes)::BIGINT AS max_bytes
    FROM cls GROUP BY status
    """,
)
def multimodal_bmp_admission_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Admission census over a corrupted binary-container column: counts
    and exact byte totals per parse status (see module docstring). The
    kernel actually PARSES every corrupted payload (struct.unpack with
    bounds checks); the oracle re-derives each status from the planted
    class arithmetic — a divergence means the parser misclassified a
    malformed container."""
    src = (
        _with_payload(spark, sf_dir)
        .select("doc_id", "payload")
        .filter(F.col("payload").isNotNull() & F.col("doc_id").isNotNull())
    )
    bmps = src.mapInPandas(_bmp_encode_batch, "doc_id long, bmp binary")
    parsed = bmps.mapInPandas(
        _corrupt_and_parse, "doc_id long, status string, n_bytes long"
    )
    return parsed.groupBy("status").agg(
        F.count(F.lit(1)).alias("n_payloads"),
        F.sum("n_bytes").alias("total_bytes"),
        F.min("n_bytes").alias("min_bytes"),
        F.max("n_bytes").alias("max_bytes"),
    )
