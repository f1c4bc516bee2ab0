"""Registry entry for the multimodal byte-feature projection (the
JVM-side, oracle-checkable slice of the media pipeline; the
Python-stage slices are covered by tests/test_media.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions import multimodal as M
from . import corpus
from .registry import declare


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
