"""Exact-substring span dedup (suffix-array semantics via stride-1
rolling windows, Lee et al. 2022): contract tests on planted corpora.
The declared dedup_substring_spans query carries the hash oracle;
these pin WHAT a span is — the maximal token range covered by a
>= W-token substring repeated anywhere in the corpus — including the
cases the fixture corpus cannot exercise: a shared run embedded
mid-document at different offsets, repeats shorter than W, and two
nearby repeats merging through overlapping window covers.

Corpora are JVM-built (spark.range + selectExpr), mirroring the
Python-worker-free discipline of the declared queries.
"""

from pyspark.sql import functions as F

from vector_search_application_spark.operators import dedup
from vector_search_application_spark.plans.constants import EXACT_SUBSTR_WINDOW

W = EXACT_SUBSTR_WINDOW

# a 20-token run shared between docs (>= W=12): tokens s1..s20
SHARED = " ".join(f"s{i}" for i in range(1, 21))


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def _spans(spark, texts):
    out = dedup.exact_substring_spans(_docs(spark, texts), "doc_id", "text")
    return {(r.id, r.span_start, r.span_end) for r in out.collect()}


def test_shared_run_at_different_offsets(spark):
    """The shared 20-token run sits at token 4 in doc 0 and token 7 in
    doc 1 (1-based); the span must cover exactly the run in each."""
    pre_a = "a1 a2 a3"          # 3 tokens -> run at 4..23
    post_a = "a4 a5 a6"
    pre_b = "b1 b2 b3 b4 b5 b6"  # 6 tokens -> run at 7..26
    post_b = "b7"
    spans = _spans(spark, [f"{pre_a} {SHARED} {post_a}", f"{pre_b} {SHARED} {post_b}"])
    assert spans == {(0, 4, 23), (1, 7, 26)}


def test_repeat_shorter_than_window_is_ignored(spark):
    """An 11-token shared run (< W=12) must produce NO span."""
    short = " ".join(f"s{i}" for i in range(1, W))  # W-1 tokens
    filler_a = " ".join(f"a{i}" for i in range(1, W + 2))
    filler_b = " ".join(f"b{i}" for i in range(1, W + 2))
    spans = _spans(spark, [f"{short} {filler_a}", f"{short} {filler_b}"])
    assert spans == set()


def test_gap_between_repeats_keeps_spans_separate(spark):
    """Two distinct shared W-token runs with a 3-token unique gap in
    doc 0: window covers [1, W] and [W+4, 2W+3] do not overlap, so the
    doc keeps two EXACT spans — the gap tokens are never marked. Docs
    1-2 host the runs' second occurrences and span exactly the run.
    (Merging of overlapping covers is exercised by the 20-token run in
    test_shared_run_at_different_offsets: its 9 consecutive window
    starts collapse to one maximal span.)"""
    run1 = " ".join(f"x{i}" for i in range(1, W + 1))
    run2 = " ".join(f"y{i}" for i in range(1, W + 1))
    gap = "g1 g2 g3"  # 3 < W
    tail1 = " ".join(f"t{i}" for i in range(1, W + 2))
    tail2 = " ".join(f"u{i}" for i in range(1, W + 2))
    spans = _spans(
        spark,
        [
            f"{run1} {gap} {run2}",  # doc 0: spans 1..W and W+4..2W+3
            f"{run1} {tail1}",       # doc 1: span 1..W
            f"{run2} {tail2}",       # doc 2: span 1..W
        ],
    )
    assert {(s, e) for (i, s, e) in spans if i == 0} == {
        (1, W),
        (W + 4, 2 * W + 3),
    }
    assert {(s, e) for (i, s, e) in spans if i == 1} == {(1, W)}
    assert {(s, e) for (i, s, e) in spans if i == 2} == {(1, W)}


def test_within_doc_repeat_counts(spark):
    """A W-token run repeated twice INSIDE one doc is a corpus repeat
    (total occurrences >= 2), exactly like the suffix-array pass."""
    run = " ".join(f"r{i}" for i in range(1, W + 1))
    gap = " ".join(f"g{i}" for i in range(1, W + 1))  # W unique tokens
    spans = _spans(spark, [f"{run} {gap} {run}"])
    assert spans == {(0, 1, W), (0, 2 * W + 1, 3 * W)}
