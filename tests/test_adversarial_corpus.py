"""Registry queries replayed over a synthetic ADVERSARIAL documents
corpus — unicode, empty/whitespace-only text, exact duplicate texts,
single-token docs — with the DuckDB oracle reading the same parquet.

The driver's gate runs the registry over the well-behaved testdata
corpora; this pins cross-engine parity on the inputs a real 100 TB
crawl actually contains. Queries that only touch `documents` can be
pointed at any sf_dir, which is what makes this reuse the declared
plans verbatim.
"""

import os

import duckdb
import pytest

from tests.conftest import compare_spark_duckdb
from vector_search_application_spark.plans.registry import REGISTRY

ADVERSARIAL_DOCS = [
    # (doc_id, text, lang, source, n_chars)
    (0, "the quick brown fox jumps over the lazy dog", "en", "web", 44),
    (1, "", "en", "web", 0),
    (2, "   \t  ", "en", "web", 6),
    (3, "naïve café résumé — émigré über straße", "fr", "web", 38),
    (4, "日本語のテキスト 中文文本 한국어", "ja", "web", 17),
    (5, "emoji 😀😀 and symbols @#$%^&*() mixed 123", "en", "web", 40),
    (6, "single", "en", "web", 6),
    (7, "the quick brown fox jumps over the lazy dog", "en", "crawl", 44),  # dup of 0
    (8, "UPPER lower MiXeD case TOKENS tokens", "en", "web", 36),
    (9, "a b a b a b a b a b a b a b", "en", "web", 27),
    (10, "x" * 500, "en", "web", 500),
    (15, "tab\tseparated\nnewline\rcarriage", "en", "web", 30),
    (20, "numbers 12345 67890 0 00 000", "en", "web", 28),
    (25, "the the the the the the the the", "en", "web", 31),
]

DOC_QUERIES = [
    "text_quality",
    "token_stats",
    "text_langid",
    "doc_fingerprint",
    "dedup_exact",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "corpus_counts",
    # round-4 curation family (documents-only plans)
    "doc_chunk_windows",
    "boilerplate_ngrams",
    "temperature_mixture",
    "epoch_shuffle",
    "chunk_embed_pool",
    "source_data_card",
]


@pytest.fixture(scope="module")
def adversarial_dir(tmp_path_factory):
    from vector_search_application_spark.session import get_spark

    spark = get_spark("tests")
    d = str(tmp_path_factory.mktemp("adversarial_sf"))
    spark.createDataFrame(
        ADVERSARIAL_DOCS, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    return d


@pytest.mark.parametrize("name", DOC_QUERIES)
def test_adversarial_documents_parity(spark, adversarial_dir, name):
    decl = next((d for d in REGISTRY if d.name == name), None)
    if decl is None:
        pytest.skip(f"{name} not in registry")
    con = duckdb.connect()
    # Spark writes <name>.parquet as a directory of part files
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{adversarial_dir}/documents.parquet/*.parquet')"
    )
    sdf = decl.spark(spark, adversarial_dir)
    compare_spark_duckdb(sdf, con, decl.sql)


# --- embeddings: zero / identical / constant / antiparallel vectors ------

DIM = 64
VEC_QUERIES = ["dense_topk", "dense_topk_batch", "dense_topk_batch_salted",
               "quantized_topk", "embedding_neardup", "dense_threshold",
               # round-4: PQ family (the zero vector becomes a codeword —
               # distances to it and from it must agree cross-engine) and
               # SemDeDup (zero-norm centroid scores 0.0 everywhere)
               "pq_topk", "pq_topk_batch", "ivfpq_topk", "semantic_dedup"]


def _vec(seed: float) -> list[float]:
    return [float(((i * 31 + 7) % 13) - 6) * seed for i in range(DIM)]


ADVERSARIAL_VECS = [
    # vec_id 0 is the fixed query vector (QUERY_VEC_ID = 0)
    (0, _vec(1.0), "q"),
    (1, [0.0] * DIM, "zero"),          # zero norm -> score must be 0.0
    (2, _vec(1.0), "dup"),             # identical to the query (cos 1)
    (3, _vec(-1.0), "anti"),           # antiparallel (cos -1)
    (4, _vec(0.001), "tiny"),          # same direction, tiny magnitude
    (5, [1.0] * DIM, "const"),         # constant vector
    (6, [0.0] * (DIM - 1) + [1.0], "axis"),
    (10, _vec(2.5), "scaled"),         # vec_id%10==0 -> neardup synth doubles it
]


@pytest.fixture(scope="module")
def adversarial_vec_dir(tmp_path_factory):
    from vector_search_application_spark.session import get_spark

    spark = get_spark("tests")
    d = str(tmp_path_factory.mktemp("adversarial_vec_sf"))
    spark.createDataFrame(
        [(i, [float(x) for x in v], lbl) for i, v, lbl in ADVERSARIAL_VECS],
        "vec_id long, embedding array<float>, label string",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "embeddings.parquet"))
    return d


@pytest.mark.parametrize("name", VEC_QUERIES)
def test_adversarial_embeddings_parity(spark, adversarial_vec_dir, name):
    decl = next((d for d in REGISTRY if d.name == name), None)
    if decl is None:
        pytest.skip(f"{name} not in registry")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM read_parquet("
        f"'{adversarial_vec_dir}/embeddings.parquet/*.parquet')"
    )
    sdf = decl.spark(spark, adversarial_vec_dir)
    compare_spark_duckdb(sdf, con, decl.sql)
