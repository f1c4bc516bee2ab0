"""Centralized lifecycle for persisted intermediates.

Several operators persist() a DataFrame that is reused within one query
plan (shingle arrays, LSH bands, BM25 postings, hyperplane buckets).
The cached blocks are what makes those plans one-pass — but in a
long-lived session running many queries (the driver's correctness gate,
the Engine façade, bench loops) orphaned blocks would accumulate
without bound.

Every internal persist goes through ``tracked_persist``; callers that
own a session lifecycle call ``release_all()`` at a boundary (Engine
.reset(), a bench loop's teardown, test fixtures). The registry is a
WeakSet: DataFrames the caller dropped are collected by Python GC and
their blocks by Spark's ContextCleaner either way — release_all just
makes the boundary deterministic.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame

_LIVE: weakref.WeakSet = weakref.WeakSet()


def tracked_persist(df: DataFrame, storage_level=None) -> DataFrame:
    """persist() + register for deterministic release at a boundary."""
    out = df.persist(storage_level) if storage_level is not None else df.persist()
    _LIVE.add(out)
    return out


def release_all() -> int:
    """Unpersist every tracked DataFrame still alive; returns count."""
    n = 0
    for df in list(_LIVE):
        try:
            df.unpersist()
            n += 1
        except Exception:  # session already stopped — nothing to free
            pass
    return n
