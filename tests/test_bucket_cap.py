"""Occupancy-guard tests (constants.LSH_BUCKET_CAP): an
identical-document mega-clique collides in EVERY band, so no band
count dilutes it — C(c,2) pairs inside one hot bucket is the quadratic
shape the controlled-duplicate scale probe deliberately excludes
(SCALING_DEDUP.md). The r10 guard emits a linear STAR to each over-cap
bucket's min-id representative (a-side capped, b-side full) instead of
dropping the bucket whole: identical-text cliques are still
exact_dedup's job (composed as the declared dedup_exact_then_near
pipeline), but NEAR-identical non-byte-identical mega-groups —
invisible to exact dedup — must still collapse via components, which
the dropped-whole behavior silently prevented (r9 VERDICT finding 2).

Every corpus here is JVM-built (spark.range + selectExpr) so the tests
mirror the Python-worker-free discipline of the declared queries.
Without the cap, the clique below would generate ~8e8 candidate rows
(16 bands x C(10k,2)) — these tests finishing at all is the guard
working; the assertions pin WHICH pairs survive: exactly the star.
"""

from pyspark.sql import functions as F

from vector_search_application_spark.operators import ann, dedup
from vector_search_application_spark.plans.constants import (
    JACCARD_THRESHOLD,
    LSH_BUCKET_CAP,
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


def _assert_star_only(found, n_members, rep=0):
    """Intra-clique pairs must be EXACTLY the star to the min-id rep:
    linear (n-1) pairs, every one anchored at the representative."""
    intra = {p for p in found if p[0] < n_members and p[1] < n_members}
    assert intra == {(rep, j) for j in range(1, n_members)}, (
        f"expected a {n_members - 1}-pair star at {rep}, got "
        f"{len(intra)} intra pairs (sample {sorted(intra)[:5]})"
    )


def test_minhash_cap_stars_clique_keeps_near_pairs(spark):
    pairs = dedup.minhash_dedup_pairs(
        _clique_docs(spark), "doc_id", "text", JACCARD_THRESHOLD
    ).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    # the injected near pair among DISTINCT docs survives ...
    assert (CLIQUE_N, CLIQUE_N + 1) in found
    # ... and the clique contributes exactly the linear star to doc 0
    # (every bucket is over the cap in every band, so only the min-id
    # rep enters the a side; jaccard(rep, member) = 1.0 >= threshold)
    _assert_star_only(found, CLIQUE_N)


def test_simhash_cap_stars_clique_keeps_twin_pair(spark):
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
    # identical clique docs have IDENTICAL simhash; their >cap buckets
    # emit the star to doc 0 (hamming 0 passes the radius check)
    _assert_star_only(found, CLIQUE_N)


def test_embedding_lsh_cap_stars_clique_keeps_near_pair(spark):
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
    _assert_star_only(found, CLIQUE_N)


# the r9 VERDICT's recall hole, now closed: a >cap bucket of
# NEAR-identical but byte-DISTINCT docs (templated boilerplate with a
# varying field) is invisible to exact_dedup, so dropping its buckets
# whole lost the whole group. Trailing whitespace varies per doc: the
# tokenizer strips it, so all NEARDUP_N docs share one token sequence
# (identical shingle sets -> identical minhash/simhash -> one >cap
# bucket per band) while every raw text is byte-unique.
NEARDUP_N = LSH_BUCKET_CAP + 200


def _neardup_megagroup_docs(spark):
    docs = spark.range(NEARDUP_N).selectExpr(
        "id AS doc_id", f"concat('{BOILER}', repeat(' ', CAST(id AS INT))) AS text"
    )
    lone = spark.range(1).selectExpr(
        f"id + {NEARDUP_N} AS doc_id",
        "'entirely different words covering storage formats columnar parquet encodings' AS text",
    )
    return docs.unionByName(lone)


def test_exact_dedup_blind_to_neardup_megagroup(spark):
    """Sanity precondition: exact dedup sees NEARDUP_N distinct texts —
    this group CANNOT be collapsed upstream, the star is its only path."""
    verdicts = dedup.exact_dedup(
        _neardup_megagroup_docs(spark), "doc_id", "text"
    )
    assert verdicts.filter(F.col("is_duplicate")).count() == 0


def test_minhash_star_collapses_neardup_megagroup(spark):
    """The whole >cap near-dup group must still collapse into ONE
    component through the star to its min-id representative."""
    docs = _neardup_megagroup_docs(spark)
    pairs = dedup.minhash_dedup_pairs(
        docs, "doc_id", "text", JACCARD_THRESHOLD
    ).select("id_a", "id_b")
    found = {(r.id_a, r.id_b) for r in pairs.collect()}
    _assert_star_only(found, NEARDUP_N)
    comps = dedup.connected_components(
        pairs, docs.select(F.col("doc_id").alias("id"))
    )
    labels = {r.id: r.canonical_id for r in comps.collect()}
    assert all(labels[i] == 0 for i in range(NEARDUP_N))  # one component
    assert labels[NEARDUP_N] == NEARDUP_N  # the lone doc stays itself


def test_capped_bucket_stats_counts_megagroup(spark):
    """The observability aggregate must surface the capped buckets the
    star-guard handled: simhash over the near-dup mega-group = one
    >cap bucket per band (4 bands), max occupancy = the group size."""
    docs = _neardup_megagroup_docs(spark)
    sims = dedup.simhash(docs, "doc_id", "text")
    banded = dedup.simhash_bands(sims.select("id", "simhash"))
    row = dedup.capped_bucket_stats(
        banded, ["band", "band_val"], LSH_BUCKET_CAP
    ).first()
    assert row.n_buckets_capped == 4
    assert row.max_bucket_size == NEARDUP_N
    assert row.n_rows_in_capped == 4 * NEARDUP_N


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
