"""Guard-path tests for round-8 hardening: deferred driver-window
curation, content-hash type guards, and the shared whitespace-strip
pair (functions/text.py owns both halves)."""

import subprocess
import sys

import pytest
from pyspark.sql import functions as F


def _run_py(code: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=120,
    )


def test_sibling_first_import_curates_window():
    """Importing a sibling registry module FIRST used to crash the
    whole package (module-end assert saw the sibling's entries
    missing); curation now defers until every windowed name declares.
    Fresh interpreter per direction — the package caches in-process."""
    for sibling in ("registry_extras", "registry_scalars"):
        r = _run_py(
            "from vector_search_application_spark.plans import "
            f"{sibling}\n"
            "from vector_search_application_spark.plans.registry_core "
            "import REGISTRY, ensure_curated\n"
            "ensure_curated()\n"
            "names = [d.name for d in REGISTRY[:50]]\n"
            "from vector_search_application_spark.plans.registry "
            "import DRIVER_WINDOW\n"
            "assert names == DRIVER_WINDOW, names[:3]\n"
            "print('OK')\n"
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert "OK" in r.stdout


def test_ensure_curated_raises_on_missing_window_name():
    """A typo'd DRIVER_WINDOW name must fail LOUDLY at the driver
    entry (queries()/oracle_sql()), not silently sort to the end —
    and as a raise, not an -O-stripped assert."""
    r = _run_py(
        "from vector_search_application_spark.plans import registry_core as rc\n"
        "rc.set_driver_window(['no_such_query_%d' % i for i in range(50)])\n"
        "try:\n"
        "    rc.ensure_curated()\n"
        "except RuntimeError as e:\n"
        "    assert 'no_such_query_0' in str(e)\n"
        "    print('OK')\n"
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "OK" in r.stdout


def test_set_driver_window_rejects_bad_shapes():
    from vector_search_application_spark.plans import registry_core as rc

    with pytest.raises(RuntimeError, match="50 slots"):
        rc.set_driver_window(["a", "b"])
    with pytest.raises(RuntimeError, match="duplicate"):
        rc.set_driver_window(["dup"] * 50)


def test_check_hash_cols_rejects_divergent_types(spark):
    """The oracle-paired whitelist: doubles render '1.0E9' in Spark vs
    '1000000000.0' in DuckDB, so an oracle-paired content_hash over
    one must be a hard error."""
    from vector_search_application_spark.operators import mutations

    df = spark.sql("SELECT 'a' AS s, CAST(1.5 AS DOUBLE) AS price")
    with pytest.raises(TypeError, match="price"):
        mutations.check_hash_cols(df, ["s", "price"])
    mutations.check_hash_cols(df, ["s"])  # strings pass


def test_delta_classify_accepts_spark_only_double_columns(spark):
    """Regression: the whitelist must NOT apply to delta_classify —
    both hashes are Spark-rendered there, so a float field from JSON
    inference is self-consistent and previously-working imports keep
    working."""
    from vector_search_application_spark.operators import mutations

    old = spark.sql(
        "SELECT id AS k, CAST(id AS DOUBLE) * 1.5 AS price FROM range(5)"
    )
    new = spark.sql(
        "SELECT id AS k, CAST(id AS DOUBLE) * 1.5 AS price FROM range(3, 7)"
    ).withColumn(
        "price", F.when(F.col("k") == 3, F.lit(99.0)).otherwise(F.col("price"))
    )
    got = {
        r["k"]: r["change_type"]
        for r in mutations.delta_classify(old, new, "k", ["price"]).collect()
    }
    assert got == {0: "delete", 1: "delete", 2: "delete",
                   3: "update", 5: "insert", 6: "insert"}


def test_delta_classify_rejects_mismatched_hash_dtypes(spark):
    """bigint-5 renders '5', double-5.0 renders '5.0': every row would
    silently classify as 'update'. Mismatched old/new hash-column
    types must be a hard error."""
    from vector_search_application_spark.operators import mutations

    old = spark.sql("SELECT id AS k, id AS v FROM range(3)")
    new = spark.sql("SELECT id AS k, CAST(id AS DOUBLE) AS v FROM range(3)")
    with pytest.raises(TypeError, match="typed differently"):
        mutations.delta_classify(old, new, "k", ["v"])


def test_ws_strip_pair_agrees_on_edge_whitespace(spark, duck):
    """The shared cleaner pair: ws_strip_upper (Spark) and
    duck_ws_strip_sql (DuckDB) must clean identically — including the
    \\x0B vertical tab where Java \\s and RE2 \\s disagree, and the
    NBSP neither strips (it is NOT in the pinned class)."""
    from vector_search_application_spark.functions.text import (
        duck_ws_strip_sql,
        ws_strip_upper,
    )

    cases = ["\tab-12 \n", "\x0bvt-edge\x0b", "\xa0nbsp stays\xa0", "ok"]
    sdf = spark.createDataFrame([(c,) for c in cases], "q string").select(
        ws_strip_upper(F.col("q")).alias("c")
    )
    got_spark = [r["c"] for r in sdf.collect()]
    got_duck = [
        duck.execute(
            f"SELECT upper({duck_ws_strip_sql('?')})", [c]
        ).fetchone()[0]
        for c in cases
    ]
    assert got_spark == got_duck
    assert got_spark[1] == "VT-EDGE"          # VT stripped in BOTH
    assert got_spark[2] == "\xa0NBSP STAYS\xa0"  # NBSP kept in BOTH
