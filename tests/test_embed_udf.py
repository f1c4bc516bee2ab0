"""The Arrow-batched mapInPandas embed stage must be bit-compatible
with the declarative (JVM/SQL) embedder: same (id, dim, comp) rows."""

import pytest

from tests.conftest import SF_SMOKE
from vector_search_application_spark.functions import embedder as E
from vector_search_application_spark.operators import embed_udf
from vector_search_application_spark.plans import corpus


def test_hash_backend_matches_declarative(spark):
    docs = corpus.docs(spark, SF_SMOKE).limit(50)
    declarative = {
        (r["id"], r["dim"]): r["comp"]
        for r in E.embed_postings(docs, "doc_id", "text").collect()
    }
    via_pandas = {
        (r["id"], r["dim"]): r["comp"]
        for r in embed_udf.embed_map_in_pandas(docs, "doc_id", "text").collect()
    }
    assert declarative == via_pandas
    assert len(declarative) > 0


def test_onnx_backend_gated(spark):
    docs = corpus.docs(spark, SF_SMOKE).limit(1)
    try:
        import fastembed  # noqa: F401

        pytest.skip("fastembed installed; gating not applicable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        embed_udf.embed_map_in_pandas(docs, "doc_id", "text", backend="onnx")


def test_unknown_backend_rejected(spark):
    docs = corpus.docs(spark, SF_SMOKE).limit(1)
    with pytest.raises(ValueError):
        embed_udf.embed_map_in_pandas(docs, "doc_id", "text", backend="bogus")
