"""Event-family registry queries replayed over a synthetic ADVERSARIAL
event log — the boundary shapes the generated testdata never contains:

- out-of-order arrival: the parquet is written in scrambled row order,
  so every consumer (including the real streaming queries' single
  AvailableNow micro-batch) sees event time out of order;
- gap boundaries: consecutive events separated by EXACTLY the 30-min
  session gap (must merge — only strictly-greater silence breaks) and
  by gap+1us (must break);
- zero-length sessions: a singleton event, and a burst of three events
  at the SAME instant (session start == end, tiebreak on event_id);
- funnel steps in the same instant: a purchase at exactly the first
  click's timestamp (excluded — strictly-after), at exactly
  first_click + window (included — at-or-before), and one microsecond
  past the window (excluded); purchases preceding the first click;
  purchase-only users;
- as-of ties: a purchase at the same instant as a view (the view IS
  attributable — view rows sort before purchases at equal ts), two
  candidate views at one instant (event_id tiebreak), and a purchase
  with no preceding view at all (NULL attribution);
- window boundary: an event at exactly an hour boundary (belongs to
  the window it opens in both engines);
- payload edges: NULL props, valid JSON without the extracted key;
- NULL event time: excluded by every event-time operator in BOTH
  engines (sessionize, as-of fill, sliding frame, tumbling window) —
  Spark's NULLS FIRST vs DuckDB's NULLS LAST would otherwise order
  the same row differently.

Same parity harness as test_adversarial_corpus.py: the declared Spark
plan and the declared DuckDB oracle both read the same parquet.
"""

import os

import duckdb
import pytest

from tests.conftest import compare_spark_duckdb
from vector_search_application_spark.plans.registry import REGISTRY

T0 = 1_704_067_200_000_000  # 2024-01-01T00:00:00 UTC, epoch micros
GAP = 30 * 60 * 1_000_000  # the 30-min session gap
HOUR = 3_600 * 1_000_000  # the funnel window / event-time window

# (event_id, ts_us, user_id, event_type, value, props)
ADVERSARIAL_EVENTS = [
    # user 1 — gap boundaries: e102 exactly GAP after e101 merges;
    # e103 lands GAP+1us after e102 and opens a new session
    (101, T0, 1, "click", 1.25, '{"k": 7}'),
    (102, T0 + GAP, 1, "view", 2.25, '{"k": 2}'),
    (103, T0 + 2 * GAP + 1, 1, "view", 0.5, None),
    # user 2 — zero-length sessions: a singleton, then three events at
    # ONE instant (start == end, 3 events; sliding-avg/median tiebreak
    # on event_id)
    (201, T0, 2, "view", 0.25, '{"x": 1}'),
    (202, T0 + 2 * HOUR, 2, "view", 1.0, '{"k": -3}'),
    (203, T0 + 2 * HOUR, 2, "click", 1.0, None),
    (204, T0 + 2 * HOUR, 2, "purchase", 0.75, '{"k": 0}'),
    # user 3 — funnel same-instant: purchase AT the first click is not
    # strictly after it; purchase at exactly first+HOUR converts
    (301, T0, 3, "click", 2.0, '{"k": 11}'),
    (302, T0, 3, "purchase", 3.5, None),
    (303, T0 + HOUR, 3, "purchase", 1.5, '{"k": 4}'),
    # user 4 — only purchase precedes the first click: no conversion
    (401, T0, 4, "purchase", 0.25, None),
    (402, T0 + HOUR, 4, "click", 0.5, '{"k": 1}'),
    # user 5 — purchase one microsecond past the window: no conversion
    (501, T0, 5, "click", 1.75, None),
    (502, T0 + HOUR + 1, 5, "purchase", 2.5, '{"k": 9}'),
    # user 6 — purchases only: absent from the funnel's A side
    (601, T0, 6, "purchase", 4.0, None),
    # user 7 — as-of ties: purchase at the view's own instant (gap 0);
    # then two views at one instant and a later purchase that must
    # attribute to the event_id-larger view
    (701, T0, 7, "view", 0.5, '{"k": 5}'),
    (702, T0, 7, "purchase", 1.0, None),
    (703, T0 + 10, 7, "view", 0.25, None),
    (704, T0 + 10, 7, "view", 0.75, '{"k": 6}'),
    (705, T0 + 20, 7, "purchase", 1.25, None),
    # user 8 — purchase with no view anywhere: NULL attribution
    (801, T0, 8, "purchase", 0.25, '{"k": 8}'),
    # user 9 — NULL event time (r9): un-orderable rows are EXCLUDED by
    # every event-TIME operator in both engines (Spark sorts NULLS
    # FIRST on ASC, DuckDB NULLS LAST — without the exclusion the same
    # row lands in different sessions / windows / fills per engine);
    # the user still has real events so it stays in every result
    (901, None, 9, "view", 1.5, '{"k": 3}'),
    (902, T0, 9, "view", 0.5, None),
    (903, T0 + 10, 9, "purchase", 1.0, None),
    (904, None, 9, "purchase", 2.0, '{"k": 12}'),
]

EVENT_QUERIES = [
    "event_sessionize",
    "stream_sessionize",
    "stream_events_window",
    "event_asof_join",
    "event_funnel",
    "event_sliding_avg",
    "event_value_median",
    "event_props_agg",
]


@pytest.fixture(scope="module")
def adversarial_events_dir(tmp_path_factory):
    from pyspark.sql import functions as F

    from vector_search_application_spark.session import get_spark

    spark = get_spark("tests")
    d = str(tmp_path_factory.mktemp("adversarial_events"))
    rows = spark.createDataFrame(
        ADVERSARIAL_EVENTS,
        "event_id long, ts_us long, user_id long, event_type string, "
        "value double, props string",
    )
    # scrambled single-file write: every reader (and the streaming
    # queries' one micro-batch) sees event time out of order
    (
        rows.select(
            "event_id",
            F.timestamp_micros(F.col("ts_us")).alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
        .orderBy(F.xxhash64("event_id"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(d, "events.parquet"))
    )
    return d


@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_adversarial_events_parity(spark, adversarial_events_dir, name):
    decl = next((d for d in REGISTRY if d.name == name), None)
    if decl is None:
        pytest.skip(f"{name} not in registry")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet("
        f"'{adversarial_events_dir}/events.parquet/*.parquet')"
    )
    sdf = decl.spark(spark, adversarial_events_dir)
    compare_spark_duckdb(sdf, con, decl.sql)


def test_adversarial_funnel_conversions(spark, adversarial_events_dir):
    """Pin the intended semantics, not just cross-engine agreement:
    same-instant purchase does NOT convert, exactly-at-window does,
    one microsecond past does not, purchase-before-click does not."""
    decl = next(d for d in REGISTRY if d.name == "event_funnel")
    out = {
        r["user_id"]: r["converted"]
        for r in decl.spark(spark, adversarial_events_dir).collect()
    }
    assert out == {1: False, 2: False, 3: True, 4: False, 5: False}


def test_adversarial_sessionize_boundaries(spark, adversarial_events_dir):
    """Exactly-gap merges, gap+1us breaks, same-instant burst is one
    zero-length session."""
    decl = next(d for d in REGISTRY if d.name == "event_sessionize")
    rows = decl.spark(spark, adversarial_events_dir).collect()
    u1 = sorted(
        [(r["n_events"], r["start_us"], r["end_us"]) for r in rows if r["user_id"] == 1]
    )
    assert u1 == [(1, T0 + 2 * GAP + 1, T0 + 2 * GAP + 1), (2, T0, T0 + GAP)]
    u2 = sorted(
        [(r["n_events"], r["start_us"], r["end_us"]) for r in rows if r["user_id"] == 2]
    )
    assert u2 == [(1, T0, T0), (3, T0 + 2 * HOUR, T0 + 2 * HOUR)]


def test_adversarial_asof_attribution(spark, adversarial_events_dir):
    """Same-instant view attributes with gap 0; event_id breaks the
    two-views-one-instant tie; no-view purchases keep NULLs."""
    decl = next(d for d in REGISTRY if d.name == "event_asof_join")
    rows = {
        r["event_id"]: (r["view_event_id"], r["gap_us"])
        for r in decl.spark(spark, adversarial_events_dir).collect()
    }
    assert rows[702] == (701, 0)
    assert rows[705] == (704, 10)
    assert rows[801] == (None, None)
