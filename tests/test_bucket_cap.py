"""Occupancy-guard tests (constants.LSH_BUCKET_CAP): an
identical-document mega-clique collides in EVERY band, so no band
count dilutes it — C(c,2) pairs inside one hot bucket is the quadratic
shape the controlled-duplicate scale probe deliberately excludes
(SCALING_DEDUP.md). The guard drops over-full buckets whole before the
self-join; identical-text cliques are exact_dedup's job, composed as
the declared dedup_exact_then_near pipeline.

Every corpus here is JVM-built (spark.range + selectExpr) so the tests
mirror the Python-worker-free discipline of the declared queries.
Without the cap, the clique below would generate ~8e8 candidate rows
(16 bands x C(10k,2)) — these tests finishing at all is the guard
working; the assertions pin WHICH pairs survive.
"""

from pyspark.sql import functions as F

from vector_search_application_spark.operators import ann, dedup
from vector_search_application_spark.plans.constants import (
    JACCARD_THRESHOLD,
    NEARDUP_COSINE_THRESHOLD,
)

CLIQUE_N = 10_000
BOILER = (
    "the same boilerplate legal disclaimer text repeated verbatim across "
    "every copy of this document in the crawl snapshot without variation"
)


def _clique_docs(spark):
    """CLIQUE_N identical docs (ids 0..N-1) + two distinct near-dup
    docs (ids N, N+1: same text modulo one trailing token) + one
    unrelated doc (id N+2)."""
    clique = spark.range(CLIQUE_N).selectExpr(
        "id AS doc_id", f"'{BOILER}' AS text"
    )
    pair_base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa unique "
        "passage about distributed query planning and shuffle exchanges"
    )
    extras = spark.range(3).selectExpr(
        f"id + {CLIQUE_N} AS doc_id",
        f"""CASE id
            WHEN 0 THEN '{pair_base}'
            WHEN 1 THEN '{pair_base} updated'
            ELSE 'entirely different words covering storage formats columnar parquet encodings'
        END AS text""",
    )
    return clique.unionByName(extras)


def test_minhash_cap_drops_clique_keeps_near_pairs(spark):
    pairs = dedup.minhash_dedup_pairs(
        _clique_docs(spark), "doc_id", "text", JACCARD_THRESHOLD
    ).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    # the injected near pair among DISTINCT docs survives ...
    assert (CLIQUE_N, CLIQUE_N + 1) in found
    # ... and no intra-clique pair is emitted: every clique bucket is
    # over the cap in every band, so the clique contributes nothing
    assert not [p for p in found if p[0] < CLIQUE_N and p[1] < CLIQUE_N]


def test_simhash_cap_drops_clique_keeps_twin_pair(spark):
    # add an identical TWIN pair outside the clique: same simhash
    # (hamming 0), a 2-member bucket per band — must survive the cap,
    # so this test cannot pass vacuously on an empty result
    twin_text = (
        "a completely separate technical note describing checkpoint "
        "recovery semantics for stateful stream processing operators"
    )
    twins = spark.range(2).selectExpr(
        f"id + {CLIQUE_N + 10} AS doc_id", f"'{twin_text}' AS text"
    )
    docs = _clique_docs(spark).unionByName(twins)
    sims = dedup.simhash(docs, "doc_id", "text")
    found = {
        (r.id_a, r.id_b)
        for r in dedup.simhash_pairs(sims, max_hamming=3).collect()
    }
    assert (CLIQUE_N + 10, CLIQUE_N + 11) in found
    # identical clique docs have IDENTICAL simhash but sit in >cap
    # buckets in every band, so they emit nothing
    assert not [p for p in found if p[0] < CLIQUE_N and p[1] < CLIQUE_N]
    assert all(i >= CLIQUE_N for p in found for i in p)


def test_embedding_lsh_cap_drops_clique_keeps_near_pair(spark):
    # CLIQUE_N identical vectors + a parallel (cosine 1.0) pair in a
    # different direction + one orthogonal-ish singleton
    clique = spark.range(CLIQUE_N).selectExpr(
        "id AS vec_id",
        "transform(sequence(1, 64), i -> CAST(sin(i) AS FLOAT)) AS embedding",
    )
    extras = spark.range(3).selectExpr(
        f"id + {CLIQUE_N} AS vec_id",
        """CASE id
           WHEN 0 THEN transform(sequence(1, 64), i -> CAST(cos(i) AS FLOAT))
           WHEN 1 THEN transform(sequence(1, 64), i -> CAST(cos(i) * 1.1 AS FLOAT))
           ELSE transform(sequence(1, 64), i -> CAST(sin(i * 7 + 3) AS FLOAT))
        END AS embedding""",
    )
    vecs = clique.unionByName(extras)
    found = {
        (r.id_a, r.id_b)
        for r in ann.lsh_neardup_pairs(
            vecs, NEARDUP_COSINE_THRESHOLD
        ).collect()
    }
    assert (CLIQUE_N, CLIQUE_N + 1) in found
    assert not [p for p in found if p[0] < CLIQUE_N and p[1] < CLIQUE_N]


def test_exact_then_near_pipeline_neutralizes_clique(spark):
    """The composed pipeline (declared as dedup_exact_then_near): exact
    dedup collapses the clique to ONE canonical, so the near-dup stage
    sees at most one clique member — the full candidate join stays
    bounded WITHOUT relying on the cap, and the distinct-doc near pair
    still comes out."""
    docs = _clique_docs(spark)
    verdicts = dedup.exact_dedup(docs, "doc_id", "text")
    canon = docs.join(
        verdicts.filter(~F.col("is_duplicate")).select(
            F.col("id").alias("doc_id")
        ),
        "doc_id",
    )
    assert canon.count() == 4  # 1 clique canonical + 3 extras
    found = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_dedup_pairs(
            canon, "doc_id", "text", JACCARD_THRESHOLD
        ).collect()
    }
    assert found == {(CLIQUE_N, CLIQUE_N + 1)}
