"""Centralized lifecycle for persisted intermediates.

Several operators persist() a DataFrame that is reused within one query
plan (shingle arrays, LSH bands, BM25 postings, hyperplane buckets).
The cached blocks are what makes those plans one-pass — but in a
long-lived session running many queries (the driver's correctness gate,
the Engine façade, bench loops) orphaned blocks would accumulate
without bound.

Every internal persist goes through ``tracked_persist``; callers that
own a session lifecycle call ``release_all()`` at a boundary (Engine
.reset(), a bench loop's teardown, test fixtures). The registry holds
STRONG references on purpose: the persisted DataFrames are
operator-local, so their Python refs die when the operator returns —
but Spark's CacheManager keeps the JVM-side blocks regardless (Python
GC never unpersists SQL cache). A weak registry would drop exactly the
orphaned entries this module exists to free; the strong list keeps
them reachable until release_all() unpersists and clears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []
_RELEASE_HOOKS: list = []


def tracked_persist(df: DataFrame, storage_level=None) -> DataFrame:
    """persist() + register for deterministic release at a boundary."""
    out = df.persist(storage_level) if storage_level is not None else df.persist()
    _LIVE.append(out)
    return out


def release(df: DataFrame) -> None:
    """Unpersist ONE tracked DataFrame and drop its registry entry.

    For long-lived owners (Engine._absorb_locked) that supersede a
    tracked intermediate mid-session: unpersist() alone frees the
    cached blocks, but the strong _LIVE ref keeps the superseded
    plan — and everything its lineage pins, e.g. the previous
    corpus's localCheckpoint RDD — reachable until some future
    release_all(). Measured: one orphaned corpus checkpoint per
    import cycle (tests/test_http_shim.py multi-cycle test)."""
    try:
        df.unpersist()
    except Exception:  # session already stopped — nothing to free
        pass
    for i, d in enumerate(_LIVE):
        if d is df:
            del _LIVE[i]
            break


def on_release(hook) -> None:
    """Register a callback run by release_all() — for operator-local
    memo tables that hand out references to tracked DataFrames (the
    memo must forget them once the blocks are gone, or it would keep
    returning silently-uncached plans)."""
    _RELEASE_HOOKS.append(hook)


_PLAN_MEMO: list = []


def plan_memo(dfs, key: tuple, build):
    """Memoize an index-shaped DataFrame per (input plans, params):
    return the recorded value when every input plan sameSemantics-
    matches, else build(), record, return. Builders tracked_persist
    their result, so release_all() both frees the blocks and (below)
    forgets the memo — a stale entry can never hand back a
    silently-uncached plan. ``dfs`` is one DataFrame or a tuple."""
    if isinstance(dfs, DataFrame):
        dfs = (dfs,)
    for edfs, ekey, val in _PLAN_MEMO:
        if (
            ekey == key
            and len(edfs) == len(dfs)
            and all(a.sameSemantics(b) for a, b in zip(dfs, edfs))
        ):
            return val
    val = build()
    _PLAN_MEMO.append((tuple(dfs), key, val))
    return val


def release_all() -> int:
    """Unpersist every tracked DataFrame; returns count released."""
    n = 0
    for df in _LIVE:
        try:
            df.unpersist()
            n += 1
        except Exception:  # session already stopped — nothing to free
            pass
    _LIVE.clear()
    _PLAN_MEMO.clear()
    for hook in _RELEASE_HOOKS:
        try:
            hook()
        except Exception:
            pass
    return n
