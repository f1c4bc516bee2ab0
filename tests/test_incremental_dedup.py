"""Incremental (batch-vs-corpus) near-dup: the ingest-time dedup shape
a 100 TB pipeline actually runs — an arriving batch is checked against
the already-indexed corpus WITHOUT regenerating any corpus-corpus
candidate (that work happened when the corpus was deduped). The
declared dedup_incremental query carries the hash oracle; these tests
pin the operator's semantic contract on planted JVM-built corpora:
which pairs exist, which direction they point, and that a corpus-side
boilerplate flood collapses to its min-id representative instead of
fanning a batch doc out to every flood member.
"""

import math

from pyspark.sql import functions as F

from vector_search_application_spark.operators import ann, dedup
from vector_search_application_spark.plans.constants import (
    JACCARD_THRESHOLD,
    LSH_BUCKET_CAP,
    NEARDUP_COSINE_THRESHOLD,
)

_CORPUS = [
    "alpha beta gamma delta epsilon zeta eta theta iota kappa a long "
    "passage about distributed query planning and shuffle exchanges",
    "columnar storage formats parquet orc encodings dictionaries and "
    "run length compression for analytical scans over wide tables",
    "watermarks and session windows govern late arriving events in "
    "structured streaming state stores across micro batch executions",
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_incremental_finds_batch_vs_corpus_pairs_only(spark):
    corpus = _df(spark, [(i, t) for i, t in enumerate(_CORPUS)])
    batch = _df(
        spark,
        [
            # near copy of corpus doc 0: one appended token
            (100, _CORPUS[0] + " updated"),
            # exact copy of corpus doc 1
            (101, _CORPUS[1]),
            # novel doc: no corpus relative
            (
                102,
                "entirely different words covering vector quantization "
                "codebooks residuals and asymmetric distance computation",
            ),
        ],
    )
    rows = dedup.minhash_incremental_pairs(
        corpus, batch, "doc_id", "text", JACCARD_THRESHOLD
    ).collect()
    pairs = {(r.batch_id, r.corpus_id): r.jaccard for r in rows}
    assert (100, 0) in pairs and pairs[(100, 0)] >= JACCARD_THRESHOLD
    assert pairs[(101, 1)] == 1.0
    assert not any(b == 102 for b, _ in pairs)  # novel doc matches nothing
    # direction is strictly batch -> corpus: no corpus-corpus or
    # batch-batch pair can exist in the output id spaces
    assert all(b >= 100 and c < 100 for b, c in pairs)


def test_incremental_corpus_flood_collapses_to_representative(spark):
    """A >LSH_BUCKET_CAP clique of identical docs in the CORPUS index:
    a batch doc with the same text must match exactly the clique's
    min-id representative (one verified pair), not all members — the
    occupancy guard applied to the indexed side. Without the cap this
    test would emit flood-size pairs per band."""
    flood_n = LSH_BUCKET_CAP + 500
    boiler = (
        "the same boilerplate legal disclaimer text repeated verbatim "
        "across every copy of this document in the crawl snapshot"
    )
    flood = spark.range(flood_n).selectExpr(
        "id AS doc_id", f"'{boiler}' AS text"
    )
    distinct_doc = _df(spark, [(flood_n, _CORPUS[2])])
    corpus = flood.unionByName(distinct_doc)
    batch = _df(spark, [(10_000_000, boiler)])
    rows = dedup.minhash_incremental_pairs(
        corpus, batch, "doc_id", "text", JACCARD_THRESHOLD
    ).collect()
    assert [(r.batch_id, r.corpus_id, r.jaccard) for r in rows] == [
        (10_000_000, 0, 1.0)
    ]


def test_incremental_agrees_with_full_minhash_on_cross_pairs(spark):
    """On a small corpus+batch, the incremental pair set must equal the
    full minhash_dedup_pairs run over corpus UNION batch, restricted to
    cross (batch, corpus) pairs — incrementality changes WHAT is
    compared, never the verdict on a compared pair."""
    corpus = _df(spark, [(i, t) for i, t in enumerate(_CORPUS)])
    batch = _df(
        spark,
        [(200, _CORPUS[0] + " updated"), (201, _CORPUS[2]), (202, _CORPUS[2] + " addendum")],
    )
    inc = {
        (r.batch_id, r.corpus_id, r.jaccard)
        for r in dedup.minhash_incremental_pairs(
            corpus, batch, "doc_id", "text", JACCARD_THRESHOLD
        ).collect()
    }
    full = dedup.minhash_dedup_pairs(
        corpus.unionByName(batch), "doc_id", "text", JACCARD_THRESHOLD
    ).collect()
    cross = {
        (r.id_b, r.id_a, r.jaccard)  # full emits id_a < id_b; batch ids are larger
        for r in full
        if r.id_b >= 200 and r.id_a < 200
    }
    assert inc == cross


# --- embedding-space sibling (ann.lsh_incremental_pairs) ------------------

DIM = 64


def _unit(block: int) -> list[float]:
    """Unit vector supported on coordinate block ``block`` (16 coords
    per block, 4 blocks at DIM=64): distinct blocks are EXACTLY
    orthogonal, so 'novel' batch vectors provably match nothing."""
    lo = (block % 4) * 16
    v = [0.0] * DIM
    for d in range(lo, lo + 16):
        v[d] = 0.25  # 16 * 0.25^2 = 1
    return v


def _vdf(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_embedding_incremental_finds_batch_vs_corpus_pairs_only(spark):
    base = [_unit(s) for s in range(3)]
    corpus = _vdf(spark, [(i, v) for i, v in enumerate(base)])
    perturbed = [1.1 * base[0][0]] + base[0][1:]
    batch = _vdf(
        spark,
        [(100, perturbed), (101, base[1]), (102, _unit(99))],
    )
    rows = ann.lsh_incremental_pairs(
        corpus, batch, NEARDUP_COSINE_THRESHOLD
    ).collect()
    pairs = {(r.batch_id, r.corpus_id): r.cosine for r in rows}
    assert (100, 0) in pairs and pairs[(100, 0)] >= NEARDUP_COSINE_THRESHOLD
    assert pairs[(101, 1)] == 1.0
    assert not any(b == 102 for b, _ in pairs)
    assert all(b >= 100 and c < 100 for b, c in pairs)


def test_embedding_incremental_agrees_with_full_on_cross_pairs(spark):
    base = [_unit(s) for s in range(3)]
    corpus = _vdf(spark, [(i, v) for i, v in enumerate(base)])
    batch = _vdf(
        spark,
        [
            (200, [1.1 * base[0][0]] + base[0][1:]),
            (201, base[2]),
            (202, _unit(3)),
        ],
    )
    inc = {
        (r.batch_id, r.corpus_id, r.cosine)
        for r in ann.lsh_incremental_pairs(
            corpus, batch, NEARDUP_COSINE_THRESHOLD
        ).collect()
    }
    full = ann.lsh_neardup_pairs(
        corpus.unionByName(batch), NEARDUP_COSINE_THRESHOLD
    ).collect()
    cross = {
        (r.id_b, r.id_a, r.cosine)
        for r in full
        if r.id_b >= 200 and r.id_a < 200
    }
    assert inc == cross


# --- edge shapes (empty batch, NULL text, short docs) ----------------------

def test_incremental_empty_batch_and_null_text(spark):
    """An EMPTY arriving batch matches nothing (no error), and NULL /
    too-short texts on either side are never near-dup candidates (no
    shingle row -> no band row -> no pair), exactly like the full
    pipeline's shingle filter."""
    corpus = _df(
        spark,
        [(0, _CORPUS[0]), (1, None), (2, "too short")],
    )
    empty = _df(spark, []).limit(0)
    assert (
        dedup.minhash_incremental_pairs(
            corpus, empty, "doc_id", "text", JACCARD_THRESHOLD
        ).count()
        == 0
    )
    batch = _df(spark, [(100, None), (101, "tiny"), (102, _CORPUS[0])])
    pairs = {
        (r.batch_id, r.corpus_id)
        for r in dedup.minhash_incremental_pairs(
            corpus, batch, "doc_id", "text", JACCARD_THRESHOLD
        ).collect()
    }
    assert pairs == {(102, 0)}  # only the real copy; NULL/short silent


def test_substring_spans_ignore_null_and_short_docs(spark):
    """NULL-text and sub-window docs produce no windows and no spans;
    they also cannot poison other docs' duplicate counts."""
    from vector_search_application_spark.plans.constants import (
        EXACT_SUBSTR_WINDOW as W,
    )

    run = " ".join(f"s{i}" for i in range(1, W + 1))
    docs = _df(
        spark,
        [
            (0, run + " tail0"),
            (1, run + " tail1"),
            (2, None),
            (3, "short text"),
        ],
    )
    spans = {
        (r.id, r.span_start, r.span_end)
        for r in dedup.exact_substring_spans(docs, "doc_id", "text").collect()
    }
    assert spans == {(0, 1, W), (1, 1, W)}
