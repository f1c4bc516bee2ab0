"""Multimodal columns: image/audio/video as opaque BINARY + typed
metadata (beyond-the-reference surface for training-data pipelines).

Design for 100 TB:
  - media payloads are opaque ``binary`` columns with a typed metadata
    struct alongside — Spark shuffles/stores them without interpreting
    bytes; all pruning happens on the metadata columns
  - byte-level features (size, digest, magic prefix) are pure JVM
    column expressions — oracle-checkable, codegen'd, no Python
  - decode / feature-extract / resize / frame-sample are Arrow-batched
    mapInPandas stages (operators/media_udf.py). Real codecs (PIL,
    ffmpeg, librosa) are NOT in this container, so decode is stubbed:
    a deterministic fake decoder exercises the full plumbing (schema,
    batching, partitioning), and the real-codec branch raises
    NotImplementedError until the library is installed.

The synthetic media corpus derives content bytes from document text
(utf-8), so both engines can build the identical table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import portable as P

MEDIA_TYPES = ["image", "audio", "video"]


def media_corpus(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, media_type, content BINARY, width, height, sample_rate).

    Deterministic synthetic media: payload = utf-8 bytes of the doc
    text; type round-robins by id; metadata derived from id. Width/
    height apply to images/video, sample_rate to audio (NULL elsewhere
    — typed-metadata nullability is part of the schema under test).
    """
    # pmod, not %: Spark % keeps the dividend's sign, so a negative
    # doc_id would yield element_at index 0 (a hard error) where the
    # DuckDB twin's [0] returns NULL — pmod keeps both engines on
    # index 1..3 for every BIGINT id (oracle twin: ((id % 3)+3) % 3)
    t = F.element_at(
        F.array(*[F.lit(m) for m in MEDIA_TYPES]),
        (F.pmod(F.col(id_col), F.lit(3)) + 1).cast("int"),
    )
    is_visual = t.isin("image", "video")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        t.alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.when(is_visual, (F.lit(64) + (F.col(id_col) % 4) * 32).cast("int")).alias("width"),
        F.when(is_visual, (F.lit(48) + (F.col(id_col) % 3) * 16).cast("int")).alias("height"),
        F.when(t == "audio", F.lit(16000).cast("int")).alias("sample_rate"),
    )


# media_type derived ONCE in the inner select (no fourth copy of the
# indexing expression to drift); ((doc_id % 3)+3) % 3 is the pmod twin
# of the Spark side for negative ids
MEDIA_CORPUS_CTE = """
media AS (
    SELECT doc_id,
           media_type,
           encode(text) AS content,
           CASE WHEN media_type IN ('image', 'video')
                THEN (64 + (doc_id % 4) * 32)::INTEGER END AS width,
           CASE WHEN media_type IN ('image', 'video')
                THEN (48 + (doc_id % 3) * 16)::INTEGER END AS height,
           CASE WHEN media_type = 'audio'
                THEN 16000::INTEGER END AS sample_rate
    FROM (
        SELECT doc_id, text,
               ['image', 'audio', 'video']
                   [(((doc_id % 3) + 3) % 3 + 1)::INTEGER] AS media_type
        FROM documents
    )
)
""".strip()


def byte_features(media: DataFrame) -> DataFrame:
    """JVM-side byte features over the opaque payload: size, digest,
    magic prefix — the pruning/dedup columns you compute once at ingest
    and never re-read the blob for."""
    return media.select(
        "doc_id",
        "media_type",
        F.length("content").cast("bigint").alias("n_bytes"),
        # digest of the hex ENCODING, not the raw blob: DuckDB's md5
        # only takes VARCHAR, and blob->varchar casts escape bytes —
        # hashing the hex string is byte-exact in both engines
        F.md5(F.lower(F.hex("content"))).alias("digest"),
        # first 4 payload bytes as hex (substring AFTER hex-encoding:
        # DuckDB cannot substring a blob)
        F.lower(F.substring(F.hex("content"), 1, 8)).alias("magic_hex"),
        "width",
        "height",
        F.when(
            F.col("width").isNotNull() & F.col("height").isNotNull(),
            F.col("width") * F.col("height"),
        ).alias("n_pixels"),
    )


BYTE_FEATURES_SQL = """
SELECT doc_id,
       media_type,
       octet_length(content)::BIGINT AS n_bytes,
       md5(lower(hex(content))) AS digest,
       lower(substring(hex(content), 1, 8)) AS magic_hex,
       width,
       height,
       CASE WHEN width IS NOT NULL AND height IS NOT NULL
            THEN width * height END AS n_pixels
FROM media
""".strip()
