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
from .registry import declare

_EVENTS_WINDOW_SQL = """
SELECT (epoch_ns(ts) // 3600000000000) * 3600000 AS window_start_ms,
       event_type,
       count(*)::BIGINT AS n_events,
       round(sum(value), 6) AS sum_value
FROM events
GROUP BY 1, 2
"""


@declare("stream_events_window", _EVENTS_WINDOW_SQL, survey_ids="streaming-window")
def q_stream_events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling-window rollup via readStream + watermark +
    memory sink; equals the batch GROUP BY under AvailableNow."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # ~3.6k (window, event_type) groups at sf0.1: a handful of state
    # stores suffices; at production key cardinality this scales up
    return ingest.stream_events_window(
        spark, os.path.join(sf_dir, "events.parquet"), state_partitions=8
    )


@declare("stream_ingest_upsert", "SELECT * FROM documents", survey_ids="S5,S7,M1,streaming-ingest")
def q_stream_ingest_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpointed readStream -> foreachBatch keyed merge into a fresh
    parquet table; the settled table equals the keyed source."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return ingest.stream_ingest_documents(spark, sf_dir)
