"""Multimodal-column operators: opaque binary payloads + typed metadata,
processed with Arrow-batched ``mapInPandas`` — the Spark-side plumbing for
image/audio/video pipelines.

The container has no image/audio codecs, so the *decode* step is a
deterministic fake over the payload bytes (clearly marked); everything
around it — binary schema, metadata struct, batch iteration, UDF
signatures, partition-parallel execution — is real and tested. Swapping
the fake for PIL/ffmpeg is a one-function change.

Scale notes: mapInPandas streams Arrow batches (no per-row Python), binary
payloads never shuffle (all derivations are per-partition projections),
and aggregations happen after feature extraction reduces width.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from cstore_fdw_spark.operators import register, table

if TYPE_CHECKING:
    import pandas as pd

FRAME_STRIDE = 16  # fake "video": one frame every 16 payload bytes


def media_table(spark, sf_dir) -> DataFrame:
    """documents re-typed as a media table: payload binary + metadata
    struct (media_type, byte_len, source). In a real deployment the binary
    column holds encoded image/audio/video; here it's the utf-8 text bytes."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("media_type"),
            F.octet_length(F.encode("text", "utf-8")).cast("long").alias("byte_len"),
            F.col("source").alias("source")).alias("meta"))


def decode_stub(payload: bytes) -> dict:
    """STUB decode — deterministic fake standing in for a real media
    decoder (PIL.Image.open / av.open). Returns payload-derived pseudo
    metadata so the pipeline is testable without codecs."""
    return {
        "byte_len": len(payload),
        "first_byte": payload[0] if payload else None,
        "checksum": sum(payload) % 997,
    }


def _decode_batches(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
    """mapInPandas worker: Arrow batch in → decoded-feature batch out."""
    import pandas as pd
    for pdf in batches:
        decoded = [decode_stub(p) for p in pdf["payload"]]
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "byte_len": [d["byte_len"] for d in decoded],
            "first_byte": [d["first_byte"] for d in decoded],
            "checksum": [d["checksum"] for d in decoded],
            "source": [m["source"] for m in pdf["meta"]],
        })


_DECODE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("byte_len", T.LongType()),
    T.StructField("first_byte", T.LongType()),
    T.StructField("checksum", T.LongType()),
    T.StructField("source", T.StringType()),
])


@register(
    "multimodal_decode_meta",
    category="multimodal",
    oracle="""
    SELECT doc_id,
           CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS byte_len,
           CAST(UNICODE(SUBSTRING(text, 1, 1)) AS BIGINT) AS first_byte,
           CAST(LIST_SUM(LIST_TRANSFORM(RANGE(1, OCTET_LENGTH(ENCODE(text)) + 1),
                i -> UNICODE(SUBSTRING(text, i, 1)))) % 997 AS BIGINT)
             AS checksum,
           source
    FROM documents
    """)
def multimodal_decode_meta(spark, sf_dir):
    """Binary decode via mapInPandas (Arrow batches). The decode itself is
    the stub; the oracle recomputes its byte-level semantics in SQL
    (payload is ASCII here so codepoint == byte), proving the Spark-side
    plumbing end-to-end."""
    return media_table(spark, sf_dir).mapInPandas(
        _decode_batches, schema=_DECODE_SCHEMA)


@register(
    "multimodal_frame_sample",
    category="multimodal",
    oracle=f"""
    SELECT doc_id,
           CAST(FLOOR((OCTET_LENGTH(ENCODE(text)) - 1) / {FRAME_STRIDE}) + 1
                AS BIGINT) AS n_frames,
           CAST(UNICODE(SUBSTRING(text, 1, 1)) AS BIGINT) AS first_frame_byte
    FROM documents WHERE OCTET_LENGTH(ENCODE(text)) > 0
    """)
def multimodal_frame_sample(spark, sf_dir):
    """Frame sampling over fake video payloads: every {stride}-th byte is a
    'frame'; counts + first frame byte per document via mapInPandas."""
    def frames(batches):
        import pandas as pd
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_frames": [(len(p) - 1) // FRAME_STRIDE + 1 for p in payloads],
                "first_frame_byte": [p[0] for p in payloads],
            })
    schema = "doc_id long, n_frames long, first_frame_byte long"
    return (media_table(spark, sf_dir)
            .filter(F.col("meta.byte_len") > 0)
            .mapInPandas(frames, schema=schema))


@register(
    "multimodal_feature_extract",
    category="multimodal",
    oracle="""
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(OCTET_LENGTH(ENCODE(text))) AS DOUBLE) / COUNT(*)
             AS mean_len,
           CAST(SUM(LIST_SUM(LIST_TRANSFORM(
                RANGE(1, OCTET_LENGTH(ENCODE(text)) + 1),
                i -> UNICODE(SUBSTRING(text, i, 1)))) % 251) AS BIGINT)
             AS feat_checksum
    FROM documents GROUP BY source ORDER BY source
    """)
def multimodal_feature_extract(spark, sf_dir):
    """Fake feature extractor via Arrow ``mapInPandas`` (numpy per batch):
    per-payload byte features + per-source pooling — the shape of a real
    embed-then-pool pipeline. Features are exact integers (byte length,
    byte-sum checksum) so pooling is oracle-checkable; the float moments a
    real extractor would add live in the same pipeline shape."""
    def feats(batches):
        import numpy as np
        import pandas as pd
        for pdf in batches:
            arrs = [np.frombuffer(p, dtype=np.uint8) for p in pdf["payload"]]
            yield pd.DataFrame({
                "source": [m["source"] for m in pdf["meta"]],
                "f_len": [int(a.size) for a in arrs],
                "f_checksum": [int(a.sum()) % 251 for a in arrs],
            })
    schema = "source string, f_len long, f_checksum long"
    feat = media_table(spark, sf_dir).mapInPandas(feats, schema=schema)
    return (feat.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 (F.sum("f_len").cast("double") / F.count(F.lit(1)))
                 .alias("mean_len"),
                 F.sum("f_checksum").alias("feat_checksum"))
            .orderBy("source"))


# ------------------------------------------------------------ real codec
#: a genuine 1×1 PNG (transparent pixel) — real image bytes for the
#: distributed dimension-parsing path; unbase64()/from_base64() render it
#: identically in Spark and DuckDB.
PNG_1x1_B64 = ("iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42m"
               "NkYPhfDwAChwGA60e6kgAAAABJRU5ErkJggg==")

#: JPEG start-of-frame markers that carry the image dimensions
#: (SOF0-SOF15 minus DHT/JPG/DAC per ITU T.81 §B.2.2)
_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
             0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def parse_image_dims(payload: bytes) -> tuple[str, int, int] | None:
    """REAL header parsing from magic bytes (stdlib ``struct`` only — no
    codec dependency): PNG IHDR (width/height big-endian at bytes 16-24),
    JPEG SOFn marker scan (ITU T.81), GIF logical screen descriptor
    (little-endian at bytes 6-10). Returns (format, width, height) or
    None for non-image payloads — the decode step the round-2 stub stood
    in for, now genuine for the header metadata every image pipeline
    needs (resize planning, aspect filtering) while pixel decode still
    needs a codec library."""
    import struct

    if (len(payload) >= 24 and payload[:8] == b"\x89PNG\r\n\x1a\n"
            and payload[12:16] == b"IHDR"):
        w, h = struct.unpack(">II", payload[16:24])
        return ("png", w, h)
    if payload[:2] == b"\xff\xd8":
        i, n = 2, len(payload)
        while i + 4 <= n:
            if payload[i] != 0xFF:
                i += 1
                continue
            marker = payload[i + 1]
            if marker in (0xFF, 0x01) or 0xD0 <= marker <= 0xD9:
                i += 2
                continue
            seglen = struct.unpack(">H", payload[i + 2:i + 4])[0]
            if marker in _JPEG_SOF:
                if i + 9 <= n:
                    h, w = struct.unpack(">HH", payload[i + 5:i + 9])
                    return ("jpeg", w, h)
                return None
            i += 2 + seglen
        return None
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        w, h = struct.unpack("<HH", payload[6:10])
        return ("gif", w, h)
    return None


@register(
    "multimodal_image_dims",
    category="multimodal",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN doc_id % 7 = 0 THEN 'png' ELSE 'raw' END AS fmt,
           CASE WHEN doc_id % 7 = 0 THEN CAST(1 AS BIGINT) END AS width,
           CASE WHEN doc_id % 7 = 0 THEN CAST(1 AS BIGINT) END AS height,
           CASE WHEN doc_id % 7 = 0
                THEN CAST(OCTET_LENGTH(from_base64('{PNG_1x1_B64}')) AS BIGINT)
                ELSE CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT)
           END AS byte_len
    FROM documents
    """)
def multimodal_image_dims(spark, sf_dir):
    """Image-dimension extraction over a mixed binary column: every 7th
    document's payload is a genuine PNG (real magic bytes, parsed by the
    real header parser in the Arrow ``mapInPandas`` worker); the rest are
    raw text bytes that correctly classify as non-images. The oracle
    knows which rows carry the PNG and checks format/width/height/length
    per row — so the REAL parser's output is value-checked at scale, and
    the behavioral test feeds it real JPEG/GIF bytes too."""
    d = table(spark, sf_dir, "documents")
    media = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0,
               F.unbase64(F.lit(PNG_1x1_B64)))
         .otherwise(F.encode("text", "utf-8")).alias("payload"))

    def dims(batches):
        import pandas as pd
        for pdf in batches:
            parsed = [parse_image_dims(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "fmt": [p[0] if p else "raw" for p in parsed],
                "width": [p[1] if p else None for p in parsed],
                "height": [p[2] if p else None for p in parsed],
                "byte_len": [len(b) for b in pdf["payload"]],
            })

    return media.mapInPandas(
        dims, "doc_id long, fmt string, width long, height long, "
              "byte_len long")
