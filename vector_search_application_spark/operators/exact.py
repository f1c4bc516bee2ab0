"""Exact payload-match cascade (SURVEY.md §2.5 Q1, §2.7 F5, §2.10 C2).

Reference semantics (app/services/search_service.py:207-256): uppercase
the query, filter on partNumber (score 1.0, limit 10); only if that
yields nothing, filter on manufacturerPartNumber (score 0.9, limit 10).

Spark-first expression: both branches are simple filters (partition /
data-skipping prunable at scale — the reference's "payload keyword
index" is physical layout here, SURVEY.md §2.4 I4). The early-exit
cascade is one declarative plan: the secondary branch is gated by a
broadcast 1-row count of the primary branch, so no driver-side if and
no second job. Branch limits are made deterministic by ordering on the
id column (the reference's scroll order is storage order —
nondeterministic; documented deviation per SURVEY.md §7).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import WS_CHARS, WS_CLASS, ws_strip_upper
from ..plans.constants import EXACT_PRIMARY_SCORE, EXACT_SECONDARY_SCORE


def clean_query(q: str) -> Column:
    """C2: strip().upper() (reference search_service.py:214). The
    strip happens in PYTHON before the literal is built — F.trim
    strips only ASCII spaces, so a pasted query with a trailing
    tab/newline would silently miss the exact match the reference's
    str.strip() finds. Strips exactly WS_CHARS (not bare .strip()):
    bare str.strip() removes Unicode whitespace (NBSP, \\x1c-\\x1f)
    that the batch/SQL twins' spelled-out WS_CLASS does not — an
    NBSP-edged query must clean identically in every path."""
    return F.lit(q.strip(WS_CHARS).upper())


def exact_match_branch(
    df: DataFrame,
    field: str,
    query: str,
    score: float,
    limit: int = 10,
    id_col: str = "id",
) -> DataFrame:
    return (
        df.filter(F.col(field) == clean_query(query))
        .orderBy(F.asc(id_col))
        .limit(limit)
        .select(
            F.col(id_col),
            F.lit(score).alias("score"),
            F.lit(field).alias("matched_field"),
        )
    )


def exact_cascade(
    df: DataFrame,
    query: str,
    primary_field: str,
    secondary_field: str,
    limit: int = 10,
    id_col: str = "id",
) -> DataFrame:
    """Q1/F5: primary-field matches, else secondary-field matches.

    The gate is a window over the UNION of the two (already
    limit-pruned, <= 2*limit rows) branches: secondary rows survive
    only when no primary row exists. The previous broadcast-count gate
    embedded the primary subtree a second time — Spark does not dedup
    common subplans, so every serving call scanned the corpus three
    times instead of twice."""
    primary = exact_match_branch(
        df, primary_field, query, EXACT_PRIMARY_SCORE, limit, id_col
    ).withColumn("__p", F.lit(1))
    secondary = exact_match_branch(
        df, secondary_field, query, EXACT_SECONDARY_SCORE, limit, id_col
    ).withColumn("__p", F.lit(0))
    w = Window.partitionBy(F.lit(1))
    return (
        primary.unionByName(secondary)
        .withColumn("__has_primary", F.max("__p").over(w))
        .filter((F.col("__p") == 1) | (F.col("__has_primary") == 0))
        .drop("__p", "__has_primary")
    )


def exact_match_batch(
    df: DataFrame,
    queries: DataFrame,
    field: str,
    score: float,
    limit: int = 10,
    id_col: str = "id",
    qid_col: str = "query_id",
    q_col: str = "q",
) -> DataFrame:
    """One exact-equality branch over a BATCH of query strings: clean
    each query, broadcast-probe ``field``, per-query limit in id order.
    The cascade composes two of these with a primary-hit gate; callers
    needing only one field (e.g. the fusion exact branch) use this
    directly instead of building the second branch just to filter it
    away."""
    qs = queries.select(
        F.col(qid_col).alias("query_id"),
        # the shared pinned-class strip (text.ws_strip_upper):
        # str.strip() fidelity for queries carrying tabs/newlines,
        # oracle twin duck_ws_strip_sql — one module owns both halves
        ws_strip_upper(F.col(q_col)).alias("__q"),
    )
    matched = df.join(
        F.broadcast(qs), F.col(field) == F.col("__q"), "inner"
    ).select(
        "query_id",
        F.col(id_col),
        F.lit(score).alias("score"),
        F.lit(field).alias("matched_field"),
    )
    w = Window.partitionBy("query_id").orderBy(F.asc(id_col))
    return (
        matched.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= limit)
        .drop("__rn")
    )


def exact_cascade_batch(
    df: DataFrame,
    queries: DataFrame,
    primary_field: str,
    secondary_field: str,
    limit: int = 10,
    id_col: str = "id",
    qid_col: str = "query_id",
    q_col: str = "q",
) -> DataFrame:
    """Q1/F5 cascade over a BATCH of query strings in one plan.

    Per query the semantics match exact_cascade (reference
    app/services/search_service.py:207-256, one query per request):
    primary-field equality at score 1.0, else secondary-field equality
    at 0.9, limit per query, deterministic id order.

    Scale shape: the query table (small — user requests) broadcasts
    into BOTH branch joins, so the corpus is probed by hash equi-join
    and never shuffles; at 100 TB with a partition/Z-order layout on
    the payload fields these joins prune to the touched files. The
    per-query limit is one window keyed on the query id (its input is
    only the matched rows, not the corpus), and the primary-hit gate is
    a broadcast left-anti join on the query id — the batch twin of the
    single query's broadcast 1-row count gate.
    """
    primary = exact_match_batch(
        df, queries, primary_field, EXACT_PRIMARY_SCORE,
        limit, id_col, qid_col, q_col,
    )
    secondary = exact_match_batch(
        df, queries, secondary_field, EXACT_SECONDARY_SCORE,
        limit, id_col, qid_col, q_col,
    )
    primary_hit_qids = primary.select("query_id").distinct()
    gated_secondary = secondary.join(
        F.broadcast(primary_hit_qids), "query_id", "left_anti"
    )
    return primary.unionByName(gated_secondary)
