"""Machine-speed calibration probe for benchmarks.

This box exhibits multi-minute windows where identical plan+data runs
5-6x slower (verified with byte-identical plans in both directions;
not caches, heap, CPU-credit throttling, or steal time). Cross-round
bench comparisons are therefore noise-limited unless every run carries
a same-run measure of how fast the machine actually was. This module
provides that measure: a fixed, pure-compute, plan-stable query whose
cost depends only on CPU/JVM health — no input data, no shuffle, no
Python workers — so its wall time is a pure machine-speed signal.

Usage contract (bench.py, tools/scale_probe.py):
- run ``calibration_secs`` at the start and end of a timed section;
- persist the raw rep times;
- report family throughput both raw and normalized by
  ``median_cal / CALIBRATION_REF_SEC`` — the normalized number is the
  one to compare across rounds, and a start-vs-end spread > ~1.5x
  means a slow window opened mid-run (rerun before concluding
  anything).

CALIBRATION_REF_SEC is the pinned nominal value for this query on a
healthy window of this box (local[32]); re-pin it only if the
calibration query itself changes.
"""

from __future__ import annotations

import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

# 100M rows x 4 chained xxhash64 rounds over 32 partitions: ~0.5-0.6 s
# on a healthy window — long enough that per-task scheduling overhead
# (32 tasks x ~1 ms) is noise and a slow window is sampled reliably.
CALIBRATION_ROWS = 100_000_000
CALIBRATION_PARTITIONS = 32
CALIBRATION_HASH_ROUNDS = 4
CALIBRATION_REF_SEC = 0.45  # nominal healthy-window value, pinned r7
# (three 5-rep series on a healthy window: medians 0.498/0.437/0.428)

# Each rep must use a DISTINCT range start: re-collecting a plan whose
# Range arguments are identical lets AQE reuse the materialized
# partial-aggregate shuffle stage, and the "rep" measures shuffle-read
# of one row per partition (~65 ms for 1B rows — measured, which is how
# this footnote got written) instead of the hash chain.
_rep_counter = 0


def calibration_df(spark: SparkSession, start: int = 0):
    h = ((F.col("id") % F.lit(CALIBRATION_ROWS)) * F.lit(2654435761)) % F.lit(
        1000003
    )
    for _ in range(CALIBRATION_HASH_ROUNDS):
        h = F.xxhash64(h)
    return spark.range(
        start, start + CALIBRATION_ROWS, 1, CALIBRATION_PARTITIONS
    ).select(F.bit_xor(h).alias("h"))


# keyed by applicationId, not id(spark): a stopped session's id() can
# be recycled by the allocator for a NEW SparkSession, which would
# silently skip its untimed warmup rep and re-inflate rep 1 (the exact
# problem the warmup exists to fix); app ids are unique per context
_warmed_sessions: set[str] = set()


def calibration_secs(spark: SparkSession, reps: int = 3) -> list[float]:
    """Raw wall seconds per rep, each rep a fresh plan (distinct range
    start — see _rep_counter note). Callers persist these and derive
    median/IQR. The first call per session runs an UNTIMED throwaway
    rep internally (codegen/JIT warmup) — previously a docstring
    convention every caller had to remember, which a forgotten
    throwaway silently violated by inflating rep 1."""
    global _rep_counter
    sid = spark.sparkContext.applicationId
    if sid not in _warmed_sessions:
        calibration_df(spark).collect()
        _warmed_sessions.add(sid)
    out = []
    for _ in range(reps):
        _rep_counter += 1
        df = calibration_df(spark, start=_rep_counter)
        t0 = time.perf_counter()
        df.collect()
        out.append(round(time.perf_counter() - t0, 4))
    return out


def median(xs: list[float]) -> float:
    import statistics

    return float(statistics.median(xs))


def iqr(xs: list[float]) -> float:
    """Interquartile range; refuses n < 4 rather than silently
    returning the full range under the name 'iqr' (a range is ~2x more
    outlier-sensitive — comparing it against prior rounds' quartile
    spreads would misdiagnose exactly the machine-speed noise this
    module exists to control for)."""
    s = sorted(xs)
    n = len(s)
    if n < 4:
        raise ValueError(f"iqr needs >= 4 samples, got {n}")
    return round(s[(3 * n) // 4] - s[n // 4], 4)
