"""Approximate nearest-neighbor scale paths (SURVEY.md §2.4 I1, §4 ANN
row; BASELINE.json "MLlib for batch index build").

Correctness is always defined by the exact brute-force operator
(topk.py); these are the plans that survive 100 TB:

  hyperplane LSH   deterministic md5-derived random hyperplanes ->
                   sign-bit bucket -> equi-join on bucket. Candidate
                   generation is a key join (no all-pairs), verification
                   is exact cosine on candidates only. Fully portable to
                   the DuckDB oracle (declared queries use this).
  IVF              centroid assignment + probe-nearest-centroids ->
                   partition-pruned exact search inside probed cells.
                   At scale the corpus is PARTITIONED BY cell_id, so a
                   query touches nprobe partitions instead of the full
                   table — the same two-stage plan stays a pair of
                   broadcast joins + one pruned scan.
  MLlib LSH        BucketedRandomProjectionLSH as the "index build"
                   (fit = index construction, transform = bucketed
                   table); seeded -> reproducible, recall measured in
                   tests against the exact oracle (never golden-matched).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import portable as P
from ..plans.constants import IVF_CENTROIDS, IVF_PROBES, K, LSH_PLANES


def plane_weights(spark, n_planes: int = LSH_PLANES, dim: int = 64) -> DataFrame:
    """(plane, d, w): deterministic pseudo-random hyperplane weights,
    w = hexval16(md5(plane||'_'||d)) - 32767.5, d is 1-based."""
    planes = spark.range(n_planes).select(F.col("id").alias("plane"))
    dims = spark.range(1, dim + 1).select(F.col("id").alias("d"))
    return planes.crossJoin(dims).select(
        "plane",
        "d",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("_", F.col("plane"), F.col("d"))), 1, 4
                ),
                16,
                10,
            ).cast("double")
            - F.lit(32767.5)
        ).alias("w"),
    )


def hyperplane_buckets(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = LSH_PLANES,
) -> DataFrame:
    """(id, bucket): sign-bit bucket of each vector.

    The unnest join with the weights table is broadcast (planes x dims
    is tiny); per-vector work is a map-side partial aggregation.
    """
    spark = vectors.sparkSession
    comps = vectors.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.col(vec_col)).alias("pos", "x"),
    ).select("id", (F.col("pos") + 1).alias("d"), F.col("x").cast("double"))
    w = plane_weights(spark, n_planes)
    dots = (
        comps.join(F.broadcast(w), "d")
        .groupBy("id", "plane")
        .agg(F.sum(F.col("x") * F.col("w")).alias("dot"))
    )
    return dots.groupBy("id").agg(
        F.sum(
            F.when(F.col("dot") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), CAST(plane AS INT))")).otherwise(
                F.lit(0)
            )
        )
        .cast("bigint")
        .alias("bucket")
    )


def lsh_neardup_pairs(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_a, id_b, cosine) for same-bucket pairs above the cosine
    threshold — embedding near-duplicate detection."""
    # persist the bucketed table: it is the LSH index, and both join
    # sides read it (without persistence the hyperplane-projection
    # aggregation pipeline runs twice)
    buckets = hyperplane_buckets(vectors, id_col, vec_col)
    with_b = (
        vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .join(buckets, "id")
        .persist()
    )
    a = with_b.select(F.col("id").alias("id_a"), F.col("v").alias("va"), "bucket")
    b = with_b.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), "bucket")
    pairs = a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b"))
    scored = pairs.select(
        "id_a", "id_b", P.rounded(P.cosine(F.col("va"), F.col("vb"))).alias("cosine")
    )
    return scored.filter(F.col("cosine") >= threshold)


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell): nearest-centroid assignment (max cosine, centroid id
    breaking ties). Centroids are broadcast; at scale this is the
    partitioning column of the stored table."""
    scored = vectors.crossJoin(F.broadcast(centroids)).select(
        F.col(id_col).alias("id"),
        F.col("centroid_id"),
        P.rounded(P.cosine(F.col(vec_col), F.col("cvec"))).alias("cscore"),
    )
    w = Window.partitionBy("id").orderBy(F.desc("cscore"), F.asc("centroid_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("id", F.col("centroid_id").alias("cell"))
    )


def ivf_topk(
    vectors: DataFrame,
    query: DataFrame,
    k: int = K,
    n_centroids: int = IVF_CENTROIDS,
    n_probe: int = IVF_PROBES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: probe the n_probe cells nearest the query, exact
    cosine top-k within them. Deterministic (centroids = the first
    n_centroids corpus vectors), hence oracle-checkable."""
    centroids = (
        vectors.filter(F.col(id_col) < n_centroids)
        .select(
            F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cvec")
        )
    )
    # the assignment IS the IVF index build — persist it (at scale this
    # is the stored table's partitioning column, written once)
    assigned = ivf_assign(vectors, centroids, id_col, vec_col).persist()
    qcells = (
        centroids.crossJoin(F.broadcast(query))
        .select(
            "centroid_id",
            P.rounded(P.cosine(F.col("cvec"), F.col("qvec"))).alias("cscore"),
        )
        .orderBy(F.desc("cscore"), F.asc("centroid_id"))
        .limit(n_probe)
        .select(F.col("centroid_id").alias("cell"))
    )
    probed = vectors.join(
        assigned.join(F.broadcast(qcells), "cell"),
        vectors[id_col] == F.col("id"),
    )
    scored = probed.crossJoin(F.broadcast(query)).select(
        F.col("id"),
        P.rounded(P.cosine(F.col(vec_col), F.col("qvec"))).alias("score"),
    )
    return scored.orderBy(F.desc("score"), F.asc("id")).limit(k)


def mllib_lsh_index(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
    seed: int = 42,
):
    """I1 analogue: fit a BucketedRandomProjectionLSH model (the batch
    'index build'). Returns (model, vectorized_df). Seeded for
    reproducibility; recall is measured against the exact operator in
    tests — approximations are never golden-matched (SURVEY.md §7)."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    vec = vectors.select(
        F.col(id_col).alias("id"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(vec)
    return model, vec
