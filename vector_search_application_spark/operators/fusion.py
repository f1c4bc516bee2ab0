"""Rank-fusion operators (SURVEY.md §2.7 F1-F5).

The reference does these with Python list manipulation over two ranked
lists (reference scripts/indexing.py:707-836,
app/services/search_service.py:301-342); here each is a single
DataFrame plan: window-rank per branch, union + groupBy(id) aggregation
(Catalyst turns the small grouped sets into map-side partial aggs), then
TakeOrderedAndProject for the final truncate.

Scale note: branch results are already top-(k*inflation) lists — tiny
relative to the corpus — so fusion cost is independent of corpus size.
The expensive part is branch production, which is where the broadcast /
posting-list strategies in topk.py and bm25.py apply.

Determinism: ranks and final ordering use (score DESC, id ASC); label
concatenation for F3 is priority-ordered (exact before vector),
matching the reference's stable-sort insertion order (SURVEY.md §7).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import portable as P
from ..plans.constants import K, LINEAR_ALPHA, RRF_RANK_K
from .topk import topk_per_group


def _ranked(branch: DataFrame, id_col: str) -> DataFrame:
    w = Window.orderBy(F.desc("score"), F.asc(id_col))
    return branch.withColumn("rank", F.row_number().over(w))


def _rrf_aggs(names, rank_k: int) -> list:
    """The RRF aggregate list — rrf score + per-branch score/rank
    diagnostics — shared by rrf_fuse and rrf_fuse_batch so the
    single-query/batch per-query-equality contract cannot drift
    (the bigint cast matters: row_number is int in Spark, bigint in
    DuckDB)."""
    aggs = [
        P.rounded(
            F.sum(F.lit(1.0) / (F.lit(float(rank_k)) + F.col("rank")))
        ).alias("score")
    ]
    for name in names:
        aggs.append(
            F.max(F.when(F.col("branch") == name, F.col("branch_score"))).alias(
                f"{name}_score"
            )
        )
        aggs.append(
            F.max(F.when(F.col("branch") == name, F.col("rank")))
            .cast("bigint")
            .alias(f"{name}_rank")
        )
    return aggs


def _dedup_flag_aggs() -> list:
    """max-score + branch-presence flags, shared by max_dedup_fuse and
    its batch twin."""
    return [
        F.max("score").alias("score"),
        F.max(F.when(F.col("search_type") == "exact", F.lit(1)))
        .isNotNull()
        .alias("_has_exact"),
        F.max(F.when(F.col("search_type") == "vector", F.lit(1)))
        .isNotNull()
        .alias("_has_vector"),
    ]


def _dedup_label() -> Column:
    """'exact+vector' label concat, exact first (the reference's
    first-occurrence insertion order) — one spelling for both twins."""
    return F.concat_ws(
        "+",
        F.when(F.col("_has_exact"), F.lit("exact")),
        F.when(F.col("_has_vector"), F.lit("vector")),
    ).alias("search_type")


def rrf_fuse(
    branches: dict[str, DataFrame],
    k: int = K,
    rank_k: int = RRF_RANK_K,
    id_col: str = "vec_id",
) -> DataFrame:
    """F1 Reciprocal Rank Fusion.

    ranks start at 1 per input list; rrf = sum over lists of
    1/(rank_k + rank); per-list rank+score kept as diagnostics
    (reference scripts/indexing.py:707-774). Output score := rrf.
    """
    if not branches:
        raise ValueError("rrf_fuse requires at least one branch")
    labeled = None
    for name, df in branches.items():
        b = _ranked(df.select(id_col, "score"), id_col).select(
            F.col(id_col),
            F.lit(name).alias("branch"),
            F.col("score").alias("branch_score"),
            F.col("rank"),
        )
        labeled = b if labeled is None else labeled.unionByName(b)
    return (
        labeled.groupBy(id_col)
        .agg(*_rrf_aggs(list(branches), rank_k))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def linear_fuse(
    dense: DataFrame,
    sparse: DataFrame,
    k: int = K,
    alpha: float = LINEAR_ALPHA,
    id_col: str = "vec_id",
) -> DataFrame:
    """F2 linear (alpha) fusion: alpha*dense + (1-alpha)*sparse, missing
    side contributes 0 (reference scripts/indexing.py:776-816)."""
    labeled = (
        dense.select(id_col, F.lit("dense").alias("branch"), "score")
        .unionByName(sparse.select(id_col, F.lit("sparse").alias("branch"), "score"))
    )
    grouped = labeled.groupBy(id_col).agg(
        F.max(F.when(F.col("branch") == "dense", F.col("score"))).alias("dense_score"),
        F.max(F.when(F.col("branch") == "sparse", F.col("score"))).alias(
            "sparse_score"
        ),
    )
    return (
        grouped.select(
            F.col(id_col),
            P.rounded(
                F.lit(alpha) * F.coalesce(F.col("dense_score"), F.lit(0.0))
                + F.lit(1.0 - alpha) * F.coalesce(F.col("sparse_score"), F.lit(0.0))
            ).alias("score"),
            "dense_score",
            "sparse_score",
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def max_dedup_fuse(
    exact: DataFrame,
    vector: DataFrame,
    k: int = K,
    id_col: str = "id",
) -> DataFrame:
    """F3 max-score dedup fusion of exact + vector branches.

    On duplicate id keep the higher score; concatenate search_type
    labels with '+', exact label first (the reference's first-occurrence
    insertion order, app/services/search_service.py:301-342).
    Branch inputs carry (id, score, search_type).
    """
    unioned = exact.select(id_col, "score", "search_type").unionByName(
        vector.select(id_col, "score", "search_type")
    )
    grouped = unioned.groupBy(id_col).agg(*_dedup_flag_aggs())
    return (
        grouped.select(F.col(id_col), F.col("score"), _dedup_label())
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def normalize_scores(
    df: DataFrame, method: str = "min_max", id_col: str = "vec_id"
) -> DataFrame:
    """F4 score normalization over a (small) result list.

    min_max: (s-min)/(max-min), all-equal -> 1.0
    z_score: (s-mean)/stddev + 0.5, stddev=0 -> 0.5
    (reference scripts/indexing.py:818-836)

    Window over the whole list — correct for fused top-k lists (tens of
    rows); never applied corpus-wide.
    """
    w = Window.partitionBy()
    s = F.col("score")
    if method == "min_max":
        lo, hi = F.min(s).over(w), F.max(s).over(w)
        normed = F.when(hi == lo, F.lit(1.0)).otherwise((s - lo) / (hi - lo))
    elif method == "z_score":
        mu, sd = F.avg(s).over(w), F.stddev_pop(s).over(w)
        normed = F.when(sd == F.lit(0.0), F.lit(0.5)).otherwise((s - mu) / sd + 0.5)
    else:
        raise ValueError(f"unknown normalization method: {method}")
    return df.withColumn("norm_score", P.rounded(normed))


def rrf_fuse_batch(
    branches: dict[str, DataFrame],
    k: int = K,
    rank_k: int = RRF_RANK_K,
    id_col: str = "id",
    group_col: str = "query_id",
) -> DataFrame:
    """F1 RRF over a BATCH of queries: every rank window and the final
    top-k partition by the query id, so fusing N queries is the same
    one-shuffle plan as fusing one. Branch inputs are per-query ranked
    lists (already truncated to branch_k rows per query by the caller);
    output mirrors rrf_fuse per query: score = rrf, per-branch
    score/rank diagnostics.

    Exchange economy: branch inputs arrive hash-partitioned on the
    query id (their own top-k window put them there), so the per-branch
    re-rank windows insert no exchange; the union (which forgets
    partitioning) is re-established with ONE explicit repartition on
    group_col, which then serves both the fused groupBy(group_col, id)
    — a subset-key hash partitioning satisfies its clustering — and the
    final per-query top-k window. Net: one shuffle of tiny per-query
    candidate lists for the whole fusion stage."""
    if not branches:
        raise ValueError("rrf_fuse_batch requires at least one branch")
    labeled = None
    for name, df in branches.items():
        w = Window.partitionBy(group_col).orderBy(F.desc("score"), F.asc(id_col))
        b = (
            df.select(group_col, id_col, "score")
            .withColumn("rank", F.row_number().over(w))
            .select(
                F.col(group_col),
                F.col(id_col),
                F.lit(name).alias("branch"),
                F.col("score").alias("branch_score"),
                F.col("rank"),
            )
        )
        labeled = b if labeled is None else labeled.unionByName(b)
    fused = (
        labeled.repartition(group_col)
        .groupBy(group_col, id_col)
        .agg(*_rrf_aggs(list(branches), rank_k))
    )
    return topk_per_group(fused, group_col, k, id_col=id_col)


def max_dedup_fuse_batch(
    exact: DataFrame,
    vector: DataFrame,
    k: int = K,
    id_col: str = "id",
    group_col: str = "query_id",
) -> DataFrame:
    """F3 max-score dedup fusion over a BATCH of queries.

    Per query the semantics match max_dedup_fuse (reference
    app/services/search_service.py:301-342): on duplicate id keep the
    higher score, concatenate search_type labels exact-first. Branch
    inputs carry (query_id, id, score, search_type) and are already
    per-query bounded lists (cascade limit / top-k), so the groupBy and
    the final rank window key on (query_id, id) / query_id over tens of
    rows per query — fusing N queries is the same one-shuffle plan as
    fusing one, with N-way partition parallelism instead of 1.
    """
    cols = [group_col, id_col, "score", "search_type"]
    unioned = exact.select(*cols).unionByName(vector.select(*cols))
    # one explicit exchange on the query id serves the dedup groupBy
    # (subset-key hash satisfies its clustering) AND the final per-query
    # window — same economy as rrf_fuse_batch
    grouped = (
        unioned.repartition(group_col)
        .groupBy(group_col, id_col)
        .agg(*_dedup_flag_aggs())
    )
    labeled = grouped.select(
        F.col(group_col), F.col(id_col), F.col("score"), _dedup_label()
    )
    return topk_per_group(labeled, group_col, k, id_col=id_col)
