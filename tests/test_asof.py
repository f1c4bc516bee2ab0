"""As-of join semantics (operators/asof.py): inclusive at-or-before
matching, tie-break among equal-timestamp right rows, unmatched lefts
kept with NULL payload, and per-key isolation."""

from vector_search_application_spark.operators.asof import asof_join


def _run(spark, left_rows, right_rows):
    left = spark.createDataFrame(
        left_rows, "user_id bigint, event_id bigint, ts_us bigint"
    )
    right = spark.createDataFrame(
        right_rows, "user_id bigint, event_id bigint, ts_us bigint"
    )
    out = asof_join(
        left,
        right,
        on="user_id",
        ts_col="ts_us",
        payload_cols=["event_id", "ts_us"],
        tiebreak_col="event_id",
        payload_prefix="m_",
    )
    rows = out.collect()
    # exactly one output row per left event: the classic equal-ts
    # regression emits one row per tied right candidate, which a dict
    # collapse would hide (pass/fail then depends on collect order)
    assert len(rows) == len({r["event_id"] for r in rows})
    assert out.count() == len(rows)
    return {r["event_id"]: (r["m_event_id"], r["m_ts_us"]) for r in rows}


def test_backward_match_and_null(spark):
    got = _run(
        spark,
        # purchases: before any view / between views / after all views
        [(1, 10, 50), (1, 11, 250), (1, 12, 900)],
        [(1, 100, 100), (1, 101, 300)],
    )
    assert got[10] == (None, None)       # nothing at-or-before 50
    assert got[11] == (100, 100)         # latest <= 250 is the first view
    assert got[12] == (101, 300)         # latest overall


def test_equal_timestamp_is_inclusive_and_ties_pick_highest_id(spark):
    got = _run(
        spark,
        [(1, 10, 100)],
        # two right rows at exactly the left timestamp
        [(1, 100, 100), (1, 101, 100)],
    )
    # at-or-before includes t == ts; among ties the highest id is last
    # in (ts, tag, id) frame order
    assert got[10] == (101, 100)


def test_keys_do_not_leak(spark):
    got = _run(
        spark,
        [(1, 10, 500), (2, 20, 500)],
        [(1, 100, 400)],  # only user 1 has a preceding right row
    )
    assert got[10] == (100, 400)
    assert got[20] == (None, None)
