"""Wave 79: image-modality decode + binary-column health + mix balancing.

  * ``multimodal_image_decode_bmp``: a REAL image round trip — each
    payload is encoded into a canonical 24-bit BMP (BITMAPFILEHEADER +
    BITMAPINFOHEADER, bottom-up rows, 4-byte stride padding) and a
    decode kernel re-parses headers and pixel rows with struct.unpack.
    The image sibling of llm_multimodal_features' RIFF/WAV kernel:
    container geometry (width/height/stride/file size) and pixel stats
    are all DuckDB-oracled from first principles.
  * ``multimodal_byte_entropy``: Shannon entropy of the payload byte
    distribution per modality — near-uniform bytes (≈ln 256) mean
    compressed/encrypted blobs, low entropy means padding or stuck
    encoders; the binary-column corruption detector.
  * ``multimodal_balance_plan``: per-modality sampling plan to a
    balanced mix — the downsample floor and integer upsample factors a
    multimodal dataloader needs per epoch.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .multimodal import _with_payload

CAT = "2.J llm-pipeline (multimodal)"

_MOD_SQL = (
    "CASE doc_id % 3 WHEN 0 THEN 'text' WHEN 1 THEN 'image'"
    " ELSE 'audio' END"
)

_BYTES_SQL = """
      list_transform(range(1, 17), i ->
        (strpos('0123456789abcdef', substr(h, 2*i - 1, 1)) - 1) * 16
        + (strpos('0123456789abcdef', substr(h, 2*i, 1)) - 1))
"""


def _bmp_encode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL 24-bit BMP encoder: the doc's 16 payload bytes become a
    grayscale w×h pixel grid (w ∈ {2,4,8} by doc_id, h = 16/w), written
    in the published BMP layout — bottom-up rows, BGR triples, rows
    padded to 4-byte stride — with struct.pack, no imaging library."""
    import struct

    def enc(doc_id: int, b16: bytes) -> bytes:
        w = (2, 4, 8)[doc_id % 3]
        h = 16 // w
        stride = ((3 * w + 3) // 4) * 4
        rows = []
        for r in range(h - 1, -1, -1):
            row = b"".join(bytes((px, px, px)) for px in b16[r * w:(r + 1) * w])
            rows.append(row + b"\x00" * (stride - 3 * w))
        pix = b"".join(rows)
        hdr = b"BM" + struct.pack("<IHHI", 54 + len(pix), 0, 0, 54)
        info = struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0
        )
        return hdr + info + pix

    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "bmp": [
                    enc(int(i), bytes(b))
                    for i, b in zip(pdf["doc_id"], pdf["payload"])
                ],
            }
        )


def _bmp_decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL BMP decode kernel: validates the 'BM' magic and 24-bit
    uncompressed format, reads geometry from BITMAPINFOHEADER, walks the
    bottom-up padded pixel rows back into top-down scan order, and
    computes integer pixel statistics."""
    import struct

    def dec(b: bytes):
        if b[0:2] != b"BM":
            raise ValueError("not a BMP payload")
        (file_size,) = struct.unpack("<I", b[2:6])
        (offset,) = struct.unpack("<I", b[10:14])
        hsz, w, h, planes, bpp = struct.unpack("<IiiHH", b[14:30])
        if hsz != 40 or planes != 1 or bpp != 24:
            raise ValueError("unsupported BMP variant")
        stride = ((3 * w + 3) // 4) * 4
        gray = []
        for r in range(h):
            base = offset + (h - 1 - r) * stride
            for c in range(w):
                bgr = b[base + 3 * c : base + 3 * c + 3]
                if not (bgr[0] == bgr[1] == bgr[2]):
                    raise ValueError("non-grayscale pixel")
                gray.append(bgr[0])
        s = sum(gray)
        n = len(gray)
        return (
            w,
            h,
            n,
            len(b),
            int(file_size),
            (2 * s * 10000 + n) // (2 * n),
        )

    for pdf in batches:
        rows = [dec(bytes(b)) for b in pdf["bmp"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "width": [r[0] for r in rows],
                "height": [r[1] for r in rows],
                "n_pixels": [r[2] for r in rows],
                "bmp_bytes": [r[3] for r in rows],
                "header_size": [r[4] for r in rows],
                "mean_gray_x1e4": [r[5] for r in rows],
            }
        )


@register(
    "multimodal_image_decode_bmp",
    CAT,
    f"""
    WITH b AS (SELECT doc_id, md5(text) AS h FROM documents
               WHERE text IS NOT NULL AND doc_id IS NOT NULL),
    geo AS (
      SELECT doc_id,
             CASE doc_id % 3 WHEN 0 THEN 2 WHEN 1 THEN 4 ELSE 8 END AS w,
             {_BYTES_SQL} AS bytes
      FROM b
    )
    SELECT doc_id,
           w::INT AS width,
           (16 // w)::INT AS height,
           16::INT AS n_pixels,
           (54 + ((3 * w + 3) // 4) * 4 * (16 // w))::INT AS bmp_bytes,
           (54 + ((3 * w + 3) // 4) * 4 * (16 // w))::BIGINT AS header_size,
           CAST((2 * list_sum(bytes) * 10000 + 16) // 32 AS BIGINT)
             AS mean_gray_x1e4
    FROM geo
    """,
)
def multimodal_image_decode_bmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image decode through a REAL container format: payload bytes are
    packed into a canonical 24-bit BMP (variable width by doc, bottom-up
    padded rows) by one Arrow-batched kernel and re-parsed by a second —
    magic, header geometry, stride arithmetic, scan-order recovery, and
    grayscale invariants all validated in the decode path. Every output
    (geometry, file size including stride padding, integer mean pixel)
    is re-derived by the oracle from first principles, so the WHOLE
    encode→decode loop is hash-checked — the image twin of the WAV
    kernel (multimodal.py:83), leaving no stubbed modality.

    Scale shape: two map-only mapInPandas stages; payload bytes never
    shuffle. A PIL/libjpeg decode drops into the same kernel slot."""
    # quarantine payload-less (NULL text -> NULL payload) AND id-less
    # rows before the codec kernels — bytes(None)/int(None) crash the
    # task, and the BMP geometry is keyed on doc_id (doc-corruption +
    # NULL-PK replays); a real ingest routes both aside
    src = (
        _with_payload(spark, sf_dir)
        .select("doc_id", "payload")
        .filter(
            F.col("payload").isNotNull() & F.col("doc_id").isNotNull()
        )
    )
    bmps = src.mapInPandas(_bmp_encode_batch, "doc_id long, bmp binary")
    return bmps.mapInPandas(
        _bmp_decode_batch,
        "doc_id long, width int, height int, n_pixels int, bmp_bytes int, "
        "header_size long, mean_gray_x1e4 long",
    )


@register(
    "multimodal_byte_entropy",
    CAT,
    f"""
    WITH b AS (
      SELECT md5(text) AS h, {_MOD_SQL} AS modality FROM documents
      WHERE text IS NOT NULL
    ),
    e AS (
      SELECT modality, unnest({_BYTES_SQL}) AS byte FROM b
    ),
    hist AS (
      SELECT modality, byte, COUNT(*)::BIGINT AS c FROM e GROUP BY 1, 2
    ),
    tot AS (
      SELECT modality, SUM(c)::BIGINT AS n,
             COUNT(*)::BIGINT AS distinct_bytes
      FROM hist GROUP BY 1
    )
    SELECT h.modality, t.n AS n_bytes, t.distinct_bytes,
           ROUND(-SUM((CAST(h.c AS DOUBLE) / t.n)
                      * ln(CAST(h.c AS DOUBLE) / t.n)), 4) AS entropy_nats,
           ROUND(-SUM((CAST(h.c AS DOUBLE) / t.n)
                      * ln(CAST(h.c AS DOUBLE) / t.n)) / ln(256.0), 4)
             AS entropy_ratio
    FROM hist h JOIN tot t ON t.modality = h.modality
    GROUP BY h.modality, t.n, t.distinct_bytes
    """,
)
def multimodal_byte_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the payload byte distribution per modality —
    the binary-column health check: well-compressed or encrypted
    payloads sit near the ln 256 ceiling (ratio ≈ 1), while stuck
    encoders, zero padding, or truncated containers crater it. Computed
    from an exact integer byte histogram; the only doubles are the
    final p·ln p terms of ≤256 summands per modality.

    Scale shape: byte histogramming is map-combinable to a ≤256-row
    table per modality — payloads are read once where they live and
    never shuffled (only the tiny histograms move)."""
    src = (
        _with_payload(spark, sf_dir)
        .select("modality", "payload")
        .filter(F.col("payload").isNotNull())  # quarantine, see BMP twin
    )

    def bytes_hist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[tuple[str, int], int] = {}
            for m, b in zip(pdf["modality"], pdf["payload"]):
                for byte in bytes(b):
                    rows[(m, byte)] = rows.get((m, byte), 0) + 1
            yield pd.DataFrame(
                {
                    "modality": [k[0] for k in rows],
                    "byte": [k[1] for k in rows],
                    "c": list(rows.values()),
                }
            )

    hist = (
        src.mapInPandas(bytes_hist, "modality string, byte int, c long")
        .groupBy("modality", "byte")
        .agg(F.sum("c").alias("c"))
    )
    tot = hist.groupBy("modality").agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("distinct_bytes")
    )
    p = F.col("c").cast("double") / F.col("n")
    return (
        hist.join(F.broadcast(tot), "modality")
        .groupBy("modality", "n", "distinct_bytes")
        .agg(
            F.round(-F.sum(p * F.log(p)), 4).alias("entropy_nats"),
            F.round(-F.sum(p * F.log(p)) / F.log(F.lit(256.0)), 4).alias(
                "entropy_ratio"
            ),
        )
        .select(
            "modality",
            F.col("n").alias("n_bytes"),
            "distinct_bytes",
            "entropy_nats",
            "entropy_ratio",
        )
    )


@register(
    "multimodal_balance_plan",
    CAT,
    f"""
    WITH m AS (
      SELECT {_MOD_SQL} AS modality, COUNT(*)::BIGINT AS n
      FROM documents GROUP BY 1
    ),
    tot AS (
      SELECT SUM(n)::BIGINT AS total, MIN(n)::BIGINT AS min_n,
             MAX(n)::BIGINT AS max_n
      FROM m
    )
    SELECT m.modality, m.n,
           CAST((2 * m.n * 10000 + t.total) // (2 * t.total) AS BIGINT)
             AS share_x1e4,
           t.min_n AS keep_downsample,
           CAST((2 * t.max_n * 10000 + m.n) // (2 * m.n) AS BIGINT)
             AS upsample_x1e4
    FROM m CROSS JOIN tot t
    """,
)
def multimodal_balance_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modality mix balancing plan: current share per modality, the
    downsample floor (cap every modality at the smallest one — the
    loss-free balanced epoch), and the integer upsample factor to the
    largest (the repetition-based alternative when dropping data is
    unaffordable). The two dials a multimodal dataloader chooses
    between; all ratios in exact half-up 1e-4 units.

    Scale shape: one modality-grain census + a broadcast scalar row."""
    src = _with_payload(spark, sf_dir).select("modality")
    m = src.groupBy("modality").agg(F.count(F.lit(1)).alias("n"))
    tot = m.agg(
        F.sum("n").alias("total"),
        F.min("n").alias("min_n"),
        F.max("n").alias("max_n"),
    )
    return m.crossJoin(F.broadcast(tot)).select(
        "modality",
        "n",
        F.expr("CAST((2 * n * 10000 + total) DIV (2 * total) AS BIGINT)")
        .alias("share_x1e4"),
        F.col("min_n").alias("keep_downsample"),
        F.expr("CAST((2 * max_n * 10000 + n) DIV (2 * n) AS BIGINT)")
        .alias("upsample_x1e4"),
    )
