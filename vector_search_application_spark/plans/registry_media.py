"""Registry entry for the multimodal byte-feature projection (the
JVM-side, oracle-checkable slice of the media pipeline; the
Python-stage slices are covered by tests/test_media.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions import multimodal as M
from . import corpus
from .registry_core import declare


@declare(
    "multimodal_byte_features",
    f"""
WITH {M.MEDIA_CORPUS_CTE}
{M.BYTE_FEATURES_SQL}
""",
    survey_ids="multimodal",
)
def q_multimodal_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = corpus.docs(spark, sf_dir)
    return M.byte_features(M.media_corpus(docs))


@declare(
    "multimodal_dedup_stats",
    f"""
WITH {M.MEDIA_CORPUS_CTE},
feat AS (
    -- projection over the ONE byte-feature fragment (the digest
    -- derivation has a subtle hex-encoding rationale; no third copy)
    SELECT media_type, digest, n_bytes FROM ({M.BYTE_FEATURES_SQL})
)
SELECT media_type,
       count(*)::BIGINT AS n_assets,
       count(DISTINCT digest)::BIGINT AS n_distinct,
       CAST(count(*) - count(DISTINCT digest) AS BIGINT) AS n_dup_assets,
       CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       CAST(max(n_bytes) AS BIGINT) AS max_bytes
FROM feat GROUP BY media_type
""",
    survey_ids="multimodal,dedup-exact",
)
def q_multimodal_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asset inventory + exact payload dedup per modality: digest and
    size are computed in the scan (the blob is read once, at ingest —
    the features are what get stored/queried), then one group-by over
    the metadata. n_dup_assets = assets sharing a byte-identical
    payload with an earlier one — the multimodal twin of exact text
    dedup."""
    from pyspark.sql import functions as F

    docs = corpus.docs(spark, sf_dir)
    feat = M.byte_features(M.media_corpus(docs))
    return feat.groupBy("media_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_assets"),
        F.countDistinct("digest").cast("bigint").alias("n_distinct"),
        (F.count(F.lit(1)) - F.countDistinct("digest"))
        .cast("bigint")
        .alias("n_dup_assets"),
        F.sum("n_bytes").cast("bigint").alias("total_bytes"),
        F.max("n_bytes").cast("bigint").alias("max_bytes"),
    )
