"""Dense vector top-k operators (SURVEY.md §2.6 V1, §2.5 Q2/Q3, §2.8 K1-K4).

Reference behavior re-expressed Spark-first:
  - V1 dense ANN top-k (reference app/services/search_service.py:138-205,
    Qdrant HNSW): here an exact brute-force cosine ranked by
    ``TakeOrderedAndProject`` — a single narrow scan stage, no shuffle.
    The approximate scale path (LSH / IVF) lives in ``operators/ann.py``;
    correctness is always defined against this exact operator.
  - batch-of-queries: broadcast the query set against the corpus and
    rank per query with one window — the 100 TB shape: corpus stays
    partitioned, queries (small side) broadcast, no corpus shuffle.
  - Q3 score threshold (>= 0.4) and Q2 equality post-filter with k
    inflation (fetch k*3, filter, re-truncate) preserve the reference's
    result-count semantics.

Determinism: every score is rounded before ranking and ties break by id
ascending (SURVEY.md §7 tie-breaking risk note).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import portable as P
from ..plans.constants import K, POSTFILTER_INFLATION, ROUND_DIGITS


def score_against_query(
    vectors: DataFrame,
    query: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vec_col: str = "qvec",
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Cross-score a corpus against a single-row query DataFrame.

    The one-row query side is broadcast (BroadcastNestedLoopJoin over a
    single row — effectively a map-side constant), so the corpus never
    shuffles: the plan is scan -> project -> TakeOrderedAndProject.
    """
    cols = [F.col(id_col)] + [F.col(c) for c in (extra_cols or [])]
    return vectors.crossJoin(F.broadcast(query)).select(
        *cols,
        P.rounded(P.cosine(F.col(vec_col), F.col(query_vec_col))).alias("score"),
    )


def topk(scored: DataFrame, k: int = K, id_col: str = "vec_id") -> DataFrame:
    """Global top-k: ORDER BY score DESC, id ASC LIMIT k.

    Catalyst compiles this to TakeOrderedAndProject — per-partition
    heap + driver merge, no full sort, no shuffle. That plan survives a
    100x scale-up: each of N partitions returns k rows.
    """
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def topk_per_group(
    scored: DataFrame,
    group_col: str,
    k: int = K,
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-group top-k via one window (rank_col dropped from output)."""
    w = Window.partitionBy(group_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def threshold(scored: DataFrame, min_score: float) -> DataFrame:
    """Q3: drop hits below the dense score threshold."""
    return scored.filter(F.col("score") >= F.lit(min_score))


def postfilter_topk(
    scored: DataFrame,
    predicate: Column,
    k: int = K,
    id_col: str = "vec_id",
    inflation: int = POSTFILTER_INFLATION,
) -> DataFrame:
    """Q2: fetch k*inflation best, then equality-filter, then re-truncate.

    Mirrors the reference's fetch-3x-then-filter shape (can return fewer
    than k rows after filtering — that row-count semantic is load-bearing,
    reference app/services/search_service.py:443-465).
    """
    inflated = topk(scored, k * inflation, id_col=id_col)
    return inflated.filter(predicate).orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def paginate(df: DataFrame, order_col: str, limit: int, offset: int = 0) -> DataFrame:
    """Q4 scroll pagination: ORDER BY id LIMIT/OFFSET via row_number.

    At 100 TB, deep OFFSET pagination is an anti-pattern; this exists for
    reference parity (get_documents(limit, offset)) — the scale path is
    keyset pagination (WHERE id > last_seen LIMIT n), also expressible
    here by filtering on order_col first.
    """
    w = Window.orderBy(F.asc(order_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") > offset) & (F.col("__rn") <= offset + limit))
        .drop("__rn")
    )


def rounded_score(col: Column, digits: int = ROUND_DIGITS) -> Column:
    return P.rounded(col, digits)
