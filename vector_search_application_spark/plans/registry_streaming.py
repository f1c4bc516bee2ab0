"""Registry entries for the Structured Streaming extensions.

Both run REAL streaming queries (file source, Trigger.AvailableNow) and
return the settled result, so the driver's correctness gate checks the
streaming machinery itself — AvailableNow admits no late data, making
the watermark semantics oracle-equivalent to the batch aggregation
(streaming/ingest.py module docstring).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..streaming import ingest
from .constants import EVENT_WINDOW_NS
from .registry_core import declare

# window width interpolated from the SAME constant whose derived
# duration string drives the engine's F.window (constants.
# EVENT_WINDOW_STR, the streaming/ingest.py default) — previously the
# oracle hardcoded the nanos while the engine hardcoded "1 hour"
_EVENTS_WINDOW_SQL = f"""
SELECT (epoch_ns(ts) // {EVENT_WINDOW_NS}) * {EVENT_WINDOW_NS // 1_000_000}
           AS window_start_ms,
       event_type,
       count(*)::BIGINT AS n_events,
       round(sum(value), 6) AS sum_value
FROM events
WHERE ts IS NOT NULL
GROUP BY 1, 2
"""


@declare("stream_events_window", _EVENTS_WINDOW_SQL, survey_ids="streaming-window")
def q_stream_events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling-window rollup via readStream + watermark +
    memory sink; equals the batch GROUP BY under AvailableNow."""
    # ~3.6k (window, event_type) groups at sf0.1: a handful of state
    # stores suffices; at production key cardinality this scales up
    return ingest.stream_events_window(
        spark, os.path.join(sf_dir, "events.parquet"), state_partitions=8
    )


@declare("stream_ingest_upsert", "SELECT * FROM documents", survey_ids="S5,S7,M1,streaming-ingest")
def q_stream_ingest_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpointed readStream -> foreachBatch keyed merge into a fresh
    parquet table; the settled table equals the keyed source."""
    return ingest.stream_ingest_documents(spark, sf_dir)


# --- gap-based sessionization over the event log --------------------------

# gap lives in plans/constants (SESSION_GAP_US + its derived duration-
# string twin SESSION_GAP_STR, consumed by the native session_window
# paths in streaming/ingest.py) — re-exported here for existing callers
from .constants import SESSION_GAP_STR, SESSION_GAP_US  # noqa: E402,F401

# one CTE stack for BOTH sessionize oracles (the stream variant differs
# only in its final SELECT) — duplicated SQL drifts, single-sourced SQL
# cannot (same rule as registry_extras._PQ_CODE_CTES). NULL event
# times are EXCLUDED in both engines: an event without a time cannot be
# ordered into a session, and Spark (NULLS FIRST on ASC) and DuckDB
# (NULLS LAST) would otherwise place such rows in different sessions.
_SESSIONIZE_CTES = f"""ordered AS (
    SELECT user_id, event_id, epoch_us(ts) AS ts_us,
           lag(epoch_us(ts)) OVER (
               PARTITION BY user_id
               ORDER BY epoch_us(ts) ASC, event_id ASC) AS prev_us
    FROM events WHERE ts IS NOT NULL
),
marked AS (
    SELECT user_id, event_id, ts_us,
           CASE WHEN prev_us IS NULL
                     OR ts_us - prev_us > {SESSION_GAP_US} THEN 1 ELSE 0 END
               AS is_new
    FROM ordered
),
sessioned AS (
    SELECT user_id, ts_us,
           sum(is_new) OVER (
               PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_no
    FROM marked
)"""

_SESSIONIZE_SQL = f"""
WITH {_SESSIONIZE_CTES}
SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
       count(*)::BIGINT AS n_events,
       min(ts_us) AS start_us, max(ts_us) AS end_us
FROM sessioned
GROUP BY user_id, session_no
""".strip()


@declare("event_sessionize", _SESSIONIZE_SQL, survey_ids="streaming-window,§2.12")
def q_event_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization — the event-pipeline operator between
    raw logs and behavioral features: a session breaks after 30 min of
    inactivity per user. One window pass (lag -> new-session flag ->
    running sum) + one aggregation, everything partitioned by user_id:
    at 100 TB the log shuffles ONCE on the session key and both windows
    plus the rollup ride that partitioning."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from . import corpus

    raw = corpus._read(spark, sf_dir, "events")
    # NULL event times excluded, same as the oracle CTE: un-orderable
    # rows would land NULLS FIRST here and NULLS LAST in DuckDB
    events = raw.filter(F.col("ts").isNotNull()).select(
        "user_id",
        "event_id",
        corpus.ts_us(raw).alias("ts_us"),
    )
    w = Window.partitionBy("user_id").orderBy(F.asc("ts_us"), F.asc("event_id"))
    marked = events.withColumn(
        "is_new",
        F.when(
            F.lag("ts_us").over(w).isNull()
            | (F.col("ts_us") - F.lag("ts_us").over(w) > SESSION_GAP_US),
            1,
        ).otherwise(0),
    )
    run = Window.partitionBy("user_id").orderBy(
        F.asc("ts_us"), F.asc("event_id")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessioned = marked.withColumn(
        "session_no", F.sum("is_new").over(run).cast("bigint")
    )
    return sessioned.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.min("ts_us").alias("start_us"),
        F.max("ts_us").alias("end_us"),
    )


from ..functions import embedder as _E

_EMBED_DOCS_SQL = f"""
WITH {_E.embed_postings_cte('documents', 'doc_id', 'text')}
SELECT id AS doc_id, dim, comp FROM emb
"""


@declare(
    "stream_embed_ingest",
    _EMBED_DOCS_SQL,
    survey_ids="E1,S5,streaming-ingest",
)
def q_stream_embed_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming embed ingest: each micro-batch embeds ONLY its own
    docs (the expensive stage runs incrementally); the settled postings
    table equals the batch corpus embed."""
    return ingest.stream_embed_documents(spark, sf_dir)


# --- native session_window sessionization (streaming) ---------------------

# session_window's merge boundary equals the lag-formulation's: an
# exactly-gap silence still merges, only strictly-greater breaks
# (tests/test_streaming.py::test_session_rollup_gap_boundary) — so the
# oracle is the batch sessionize CTE stack without the session_no
# column in the final SELECT (shared _SESSIONIZE_CTES, single source)
_STREAM_SESSIONIZE_SQL = f"""
WITH {_SESSIONIZE_CTES}
SELECT user_id,
       count(*)::BIGINT AS n_events,
       min(ts_us) AS start_us, max(ts_us) AS end_us
FROM sessioned
GROUP BY user_id, session_no
""".strip()


@declare(
    "stream_sessionize", _STREAM_SESSIONIZE_SQL, survey_ids="streaming-window"
)
def q_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap sessionization through Spark's NATIVE session_window in a
    REAL streaming query (readStream -> watermark -> merging session
    state -> memory sink under AvailableNow). The streaming engine
    merges per-user session state across micro-batches — the stateful
    path the batch window-function formulation never exercises. ~150
    users at sf0.01 -> a handful of state partitions."""
    return ingest.stream_sessionize(
        spark, os.path.join(sf_dir, "events.parquet"), state_partitions=8
    )


# --- as-of join: purchases to their latest preceding view -----------------

_ASOF_SQL = """
WITH tagged AS (
    -- NULL event times excluded in both engines: the fill window
    -- orders on ts, and Spark (NULLS FIRST on ASC) vs DuckDB (NULLS
    -- LAST) would place un-orderable rows differently
    SELECT user_id, event_id, epoch_us(ts) AS ts_us, 1 AS tag,
           NULL::BIGINT AS r_event_id, NULL::BIGINT AS r_ts_us
    FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
    UNION ALL
    SELECT user_id, event_id, epoch_us(ts), 0, event_id, epoch_us(ts)
    FROM events WHERE event_type = 'view' AND ts IS NOT NULL
),
filled AS (
    SELECT user_id, event_id, ts_us, tag,
           last_value(r_event_id IGNORE NULLS) OVER w AS view_event_id,
           last_value(r_ts_us IGNORE NULLS) OVER w AS view_ts_us
    FROM tagged
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_us ASC, tag ASC, event_id ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT user_id, event_id, ts_us, view_event_id, view_ts_us,
       ts_us - view_ts_us AS gap_us
FROM filled WHERE tag = 1
""".strip()


@declare("event_asof_join", _ASOF_SQL, survey_ids="asof-join,§2.12")
def q_event_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join over the event log: each purchase gets the
    user's latest view at-or-before it (attribution's base operator).
    Spark has no ASOF JOIN; operators/asof.py expresses it as union +
    one per-key window — one shuffle on user_id, no pair materialization
    — instead of the theta-join-per-key cross product. NULL view columns
    mean no view preceded the purchase (kept, as a left join would)."""
    from pyspark.sql import functions as F

    from ..operators.asof import asof_join
    from . import corpus

    raw = corpus._read(spark, sf_dir, "events")
    # NULL event times excluded, matching the oracle's tagged CTE
    events = raw.filter(F.col("ts").isNotNull()).select(
        "user_id", "event_id", "event_type", corpus.ts_us(raw).alias("ts_us")
    )
    purchases = events.filter(F.col("event_type") == "purchase").drop("event_type")
    views = events.filter(F.col("event_type") == "view").drop("event_type")
    joined = asof_join(
        purchases,
        views,
        on="user_id",
        ts_col="ts_us",
        payload_cols=["event_id", "ts_us"],
        tiebreak_col="event_id",
        payload_prefix="view_",
    )
    return joined.select(
        "user_id",
        "event_id",
        "ts_us",
        "view_event_id",
        "view_ts_us",
        (F.col("ts_us") - F.col("view_ts_us")).alias("gap_us"),
    )


# --- conversion funnel: a range join over the event log -------------------

FUNNEL_WINDOW_US = 60 * 60 * 1_000_000  # B must follow A within 1 hour

_FUNNEL_SQL = f"""
WITH a AS (
    SELECT user_id, min(epoch_us(ts)) AS first_a_us
    FROM events WHERE event_type = 'click' GROUP BY user_id
),
b AS (
    SELECT user_id, epoch_us(ts) AS tb
    FROM events WHERE event_type = 'purchase'
),
conv AS (
    SELECT DISTINCT a.user_id
    FROM a JOIN b USING (user_id)
    WHERE b.tb > a.first_a_us AND b.tb <= a.first_a_us + {FUNNEL_WINDOW_US}
)
SELECT a.user_id, a.first_a_us,
       (conv.user_id IS NOT NULL) AS converted
FROM a LEFT JOIN conv ON conv.user_id = a.user_id
""".strip()


@declare("event_funnel", _FUNNEL_SQL, survey_ids="streaming-window,§2.12")
def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel conversion — the RANGE-JOIN shape (did a purchase follow
    the user's first click within an hour): the B side joins on the
    user key with a time-band predicate, so the shuffle is keyed on
    user_id and the band condition evaluates inside the joined
    partition — never a time-cross-product. At 100 TB both sides
    partition once on user_id and the band check is map-side within
    the co-partitioned join."""
    from pyspark.sql import functions as F

    from . import corpus

    raw = corpus._read(spark, sf_dir, "events")
    events = raw.select(
        "user_id",
        "event_type",
        corpus.ts_us(raw).alias("ts_us"),
    )
    a = (
        events.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("first_a_us"))
    )
    b = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts_us").alias("tb")
    )
    conv = (
        a.join(b, "user_id")
        .filter(
            (F.col("tb") > F.col("first_a_us"))
            & (F.col("tb") <= F.col("first_a_us") + FUNNEL_WINDOW_US)
        )
        .select("user_id")
        .distinct()
        .withColumn("__conv", F.lit(True))
    )
    return a.join(conv, "user_id", "left").select(
        "user_id",
        "first_a_us",
        F.coalesce(F.col("__conv"), F.lit(False)).alias("converted"),
    )


# --- streaming dedup-at-ingest --------------------------------------------

# first occurrence per content hash in doc_id order == the batch
# exact-dedup canonical set: shards stream in ascending doc_id ranges,
# so "first batch that saw the hash, min doc_id within it" is the
# global min doc_id per hash. Every 10th doc is seeded as an identical
# boilerplate block before ingest (the corpus has no exact dups at the
# gate SFs), so the clique spans every shard and the oracle proves rows
# were actually dropped within AND across batches.
_STREAM_DEDUP_SQL = """
WITH seeded AS (
    SELECT doc_id,
           CASE WHEN doc_id % 10 = 0 THEN 'duplicate seed block'
                ELSE text END AS text,
           lang, source, n_chars
    FROM documents
)
SELECT doc_id, text, lang, source, n_chars FROM (
    SELECT *, min(doc_id) OVER (PARTITION BY sha256(text)) AS __cid
    FROM seeded
) WHERE doc_id = __cid
""".strip()


@declare(
    "stream_dedup_ingest",
    _STREAM_DEDUP_SQL,
    survey_ids="dedup-exact,S5,streaming-ingest",
)
def q_stream_dedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup AT INGEST as a real streaming query: doc_id-range
    shards arrive one micro-batch each; every batch dedups within
    itself and anti-joins its content hashes against the accumulated
    sink table (the table IS the seen-hash state — checkpointed restart
    resumes with exactly the hashes already written). Duplicates never
    reach the corpus table; the settled table equals the batch
    exact-dedup canonical set."""
    return ingest.stream_dedup_ingest(spark, sf_dir)


# --- streaming NEAR-dup ingest (the incremental family's capstone) --------
# oracle: the global statement of the at-ingest rule — a doc survives
# iff NO banded-minhash pair (id_a < id_b, jaccard >= threshold) names
# it as id_b. The pair list is registry_dedup's _MINHASH_FROM_DDOCS
# fragment verbatim (same bands, same cap twin, same rounding), with
# the final projection narrowed to the dropped side; band collision is
# a per-doc property, so WHICH micro-batch each side arrived in cannot
# change the pair set.
from .constants import STREAM_NEARDUP_BOILER, STREAM_NEARDUP_MOD  # noqa: E402
from .registry_dedup import _MINHASH_FROM_DDOCS  # noqa: E402

_STREAM_NEARDUP_SQL = f"""
WITH seeded AS (
    SELECT doc_id,
           CASE WHEN doc_id % {STREAM_NEARDUP_MOD} = 0
                THEN '{STREAM_NEARDUP_BOILER} v' || CAST(doc_id AS VARCHAR)
                ELSE text END AS text
    FROM documents
)
SELECT doc_id, text FROM seeded
WHERE doc_id NOT IN (
    WITH ddocs AS (SELECT doc_id, text FROM seeded),
    {_MINHASH_FROM_DDOCS.replace(
        "SELECT id_a, id_b, jaccard FROM verified",
        "SELECT id_b FROM verified",
    )}
)
""".strip()


@declare(
    "stream_neardup_ingest",
    _STREAM_NEARDUP_SQL,
    survey_ids="dedup-minhash,dedup-incremental,S5,streaming-ingest",
)
def q_stream_neardup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-dup rejection AT INGEST as a real streaming query — the
    streaming capstone of the incremental dedup family: each
    micro-batch MinHash-verifies itself (any smaller-id partner drops
    a doc) and broadcast-probes the ACCUMULATED LSH index of every
    previously seen doc; the index state appends per batch (dropped
    docs included), the sink keeps survivors. The seeded boilerplate
    clique is near-identical but never byte-identical — exact-dedup
    ingest cannot catch it; this one must."""
    return ingest.stream_neardup_ingest(spark, sf_dir)
