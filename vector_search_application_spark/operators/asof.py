"""As-of (backward temporal) join — an operator the reference never
needed (SURVEY.md §2.7: "no sort-merge/range/as-of/interval joins
anywhere") but any event-log training pipeline does: attach to each
left row the LATEST right row at-or-before it within the same key.

Spark has no ASOF JOIN operator, and the naive formulations both die at
scale: a theta-join on ``r.ts <= l.ts`` is a per-key cross product, and
"join then max" shuffles the pair blow-up. The scalable formulation is
UNION + ONE WINDOW:

    tag right rows 0 and left rows 1, union them with the right payload
    nulled on left rows, then per key in (ts, tag, id) order take
    last(payload, ignorenulls) over the preceding frame; keep left rows.

One shuffle, keyed on the join key; the window is a linear per-partition
pass. At 100 TB both inputs shuffle once on the key (or not at all if
the log is already bucketed by it) and nothing ever materializes a pair
set — the same single-shuffle discipline as event_sessionize
(plans/registry_streaming.py).

Tie semantics: at equal timestamps the right row sorts BEFORE the left
row (tag 0 < 1), so a right event at exactly t is visible to a left
event at t ("at-or-before", matching DuckDB/pandas merge_asof
``direction='backward'`` inclusive). Among right rows sharing a
timestamp the highest tiebreak id wins (last in frame order).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str,
    payload_cols: Sequence[str],
    tiebreak_col: str,
    payload_prefix: str = "r_",
) -> DataFrame:
    """Backward as-of join of ``left`` against ``right``.

    Both inputs must carry ``on``, ``ts_col`` and ``tiebreak_col``;
    ``payload_cols`` (which may include ``ts_col``/``tiebreak_col``)
    are taken from the matched right row and surfaced on each left row
    as ``{payload_prefix}{col}`` (NULL when no right row precedes).
    Left columns pass through unchanged.
    """
    carried = [f"{payload_prefix}{c}" for c in payload_cols]
    left_cols = left.columns
    l_tagged = left.select(
        *left_cols,
        F.lit(1).alias("__tag"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(a)
          for c, a in zip(payload_cols, carried)],
    )
    r_tagged = right.select(
        *[
            F.col(c) if c in (on, ts_col, tiebreak_col) else F.lit(None).alias(c)
            for c in left_cols
        ],
        F.lit(0).alias("__tag"),
        *[F.col(c).alias(a) for c, a in zip(payload_cols, carried)],
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(on)
        .orderBy(F.asc(ts_col), F.asc("__tag"), F.asc(tiebreak_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *left_cols,
        "__tag",
        *[F.last(a, ignorenulls=True).over(w).alias(a) for a in carried],
    )
    return filled.filter(F.col("__tag") == 1).drop("__tag")
