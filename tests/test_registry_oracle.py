"""Every declared registry query must match its DuckDB oracle —
the same gate the driver runs (CORRECTNESS_r{N}.json)."""

import pytest

from tests.conftest import SF_SMOKE, compare_spark_duckdb, register_views
from vector_search_application_spark.plans.registry import REGISTRY


@pytest.mark.parametrize("decl", REGISTRY, ids=[d.name for d in REGISTRY])
def test_registry_matches_oracle(spark, duck, decl):
    if decl.sql is None:
        sdf = decl.spark(spark, SF_SMOKE)
        assert sdf.count() >= 0  # rows-only check, like the driver
        return
    register_views(duck, SF_SMOKE)
    sdf = decl.spark(spark, SF_SMOKE)
    compare_spark_duckdb(sdf, duck, decl.sql)
