"""Proof for the 100 TB claim the TPC-H docstrings make: "at scale both
sides bucket by orderkey and the exchange disappears".

Spark's native bucketing (bucketBy + saveAsTable) records the hash
partitioning in the catalog, so a join of two tables bucketed on their
join keys with the same bucket count plans as a SortMergeJoin with NO
Exchange on either side — the shuffle happened once at write time and
is amortized over every subsequent join. This is the layout the
revenue_by_nation / top_customer_revenue family assumes for the
lineitem-orders exchange at 100 TB (plans/registry_extras.py).

sources/layout.py implements the same idea as explicit __bucket=N
directories for the keyword-lookup index (I4) where single-bucket
PRUNING is the goal; native bucketBy is the flavor that feeds joins.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_search_application_spark.plans import corpus

from tests.conftest import SF_SMOKE as SF


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    li = corpus._read(spark, SF, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = corpus._read(spark, SF, "orders").select("o_orderkey", "o_custkey")
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(tmp_path / "li"))
        .mode("overwrite")
        .saveAsTable("li_bucketed")
    )
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(tmp_path / "ord"))
        .mode("overwrite")
        .saveAsTable("ord_bucketed")
    )
    yield "li_bucketed", "ord_bucketed"
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")


def _revenue_join(li, orders):
    rev = (
        F.round(li["l_extendedprice"] * 100).cast("bigint")
        * (100 - F.round(li["l_discount"] * 100).cast("bigint"))
    ).alias("rev_e4_row")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(orders["o_custkey"], rev)
        .groupBy("o_custkey")
        .agg(F.sum("rev_e4_row").cast("bigint").alias("rev_e4"))
    )


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    li_t, ord_t = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = _revenue_join(spark.table(li_t), spark.table(ord_t))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join itself: co-located SortMergeJoin, zero shuffles on
        # either input — only the post-join aggregation may exchange
        assert "SortMergeJoin" in plan
        join_part = plan[plan.index("SortMergeJoin"):]
        assert "Exchange hashpartitioning" not in join_part, join_part[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_unbucketed(spark, bucketed_tables):
    li_t, ord_t = bucketed_tables
    bucketed = {
        (r["o_custkey"], r["rev_e4"])
        for r in _revenue_join(spark.table(li_t), spark.table(ord_t)).collect()
    }
    li = corpus._read(spark, SF, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = corpus._read(spark, SF, "orders").select("o_orderkey", "o_custkey")
    plain = {
        (r["o_custkey"], r["rev_e4"]) for r in _revenue_join(li, orders).collect()
    }
    assert bucketed == plain and len(plain) > 0
