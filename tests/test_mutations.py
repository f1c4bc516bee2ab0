"""Versioned two-table layout (M4/M5): main + history partition the
event log, history ids follow the reference's '{id}_v{n}' scheme."""

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from vector_search_application_spark.operators import mutations
from vector_search_application_spark.plans import corpus


def test_versioned_tables_partition_the_log(spark):
    events = corpus._read(spark, SF_SMOKE, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    main, history = mutations.versioned_tables(
        events, "user_id", ["ts", "event_id"]
    )

    n_events = events.count()
    n_keys = events.select("user_id").distinct().count()

    # main: exactly one current row per key, at the key's max version
    assert main.count() == n_keys
    assert main.groupBy("user_id").count().filter(F.col("count") > 1).count() == 0

    # archive-on-update: every non-current version is in history, so the
    # pair partitions the log
    assert history.count() == n_events - n_keys

    # history ids: '{key}_v{version}' with the original_id back-pointer
    # (reference app/services/version_service.py:112-127)
    bad = history.filter(
        F.col("history_id")
        != F.concat(
            F.col("original_id").cast("string"),
            F.lit("_v"),
            F.col("version").cast("string"),
        )
    ).count()
    assert bad == 0

    # no key ever has its current version duplicated into history
    overlap = history.join(
        main,
        (history.original_id == main.user_id) & (history.version == main.version),
        "inner",
    ).count()
    assert overlap == 0


def test_content_hash_unambiguous_encoding(spark):
    """Regression: the '|'-joined concat_ws hash collided on NULL
    shifts (concat_ws skips NULLs) and on delimiter-bearing values,
    so a real update classified as unchanged. The fixed-width
    per-field digest must separate both cases."""
    null_shift = spark.createDataFrame(
        [("a", None, "b"), ("a", "b", None)], "c1 string, c2 string, c3 string"
    )
    hashes = [
        r["h"]
        for r in null_shift.select(
            mutations.content_hash(["c1", "c2", "c3"]).alias("h")
        ).collect()
    ]
    assert hashes[0] != hashes[1]

    delim_shift = spark.createDataFrame(
        [("a|b", "c"), ("a", "b|c")], "c1 string, c2 string"
    )
    hashes = [
        r["h"]
        for r in delim_shift.select(
            mutations.content_hash(["c1", "c2"]).alias("h")
        ).collect()
    ]
    assert hashes[0] != hashes[1]

    # the length-prefixed encoding itself can't be gamed by values
    # that LOOK like encodings ("1:1" etc.)
    enc_shift = spark.createDataFrame(
        [("11", ":x"), ("1", "1:x")], "c1 string, c2 string"
    )
    hashes = [
        r["h"]
        for r in enc_shift.select(
            mutations.content_hash(["c1", "c2"]).alias("h")
        ).collect()
    ]
    assert hashes[0] != hashes[1]

    # equal rows still hash equal
    same = spark.createDataFrame([("x", "y"), ("x", "y")], "c1 string, c2 string")
    hashes = [
        r["h"]
        for r in same.select(
            mutations.content_hash(["c1", "c2"]).alias("h")
        ).collect()
    ]
    assert hashes[0] == hashes[1]
