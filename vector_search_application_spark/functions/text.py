"""Text-analysis functions for training-data pipelines: language-ID
heuristic, quality scoring, token statistics, document fingerprinting.

Beyond-the-reference surface (the reference has no text analytics);
first-class declared queries in registry_text. All pure JVM column
expressions — at 100 TB these run map-side inside whole-stage codegen
with zero shuffles (fingerprint needs one explode + re-agg keyed by
doc id, which AQE coalesces).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..plans.constants import STOPWORDS
from . import portable as P

FP_MOD = 1_000_000_007  # fingerprint modulus (keeps sums in int64)

# Portable whitespace class: Java \s includes \x0B (vertical tab),
# RE2's does not — any twin pattern using \s diverges on VT-bearing
# text. Every whitespace reference in a paired pattern spells the
# class out instead.
WS_CLASS = r"\t\n\x0B\f\r "

# The same set as literal characters, for Python-side str.strip() on
# query literals (str.strip() with no args strips full Unicode
# whitespace — broader than either engine's regex \s, so a NBSP-edged
# query would clean differently in the Python path vs the batch/SQL
# twins unless the set is pinned here too).
WS_CHARS = "\t\n\x0b\f\r "


def duck_ws_strip_sql(expr: str) -> str:
    """The DuckDB-SQL twin of ``value.strip(WS_CHARS)``: strip the
    pinned whitespace class from both ends. Every oracle that pairs
    with a Python/Spark strip interpolates THIS fragment instead of
    hand-spelling the class, so a change to the pinned set can never
    drift the engine and oracle halves apart ('g' is DuckDB's
    replace-all flag — this fragment is for oracle SQL, not
    Spark SQL)."""
    return (
        f"regexp_replace({expr}, '^[{WS_CLASS}]+|[{WS_CLASS}]+$', '', 'g')"
    )


def ws_strip_upper(col: Column) -> Column:
    """The Spark twin of ``upper(duck_ws_strip_sql(...))``: strip the
    pinned whitespace class from both ends, then uppercase. Every
    Spark-side query cleaner paired with that oracle fragment calls
    THIS (classifier._cleaned, exact.exact_match_batch) so the two
    halves can only change together. regexp strip, not F.trim or \\s:
    Java \\s includes \\x0B, RE2's does not, and trim strips only
    ASCII space."""
    return F.upper(
        F.regexp_replace(col, rf"^[{WS_CLASS}]+|[{WS_CLASS}]+$", "")
    )

# regex-token pattern: word / number / single symbol (BPE-ish
# pre-tokenizer). Whitespace is excluded from the symbol branch —
# counting every tab/newline as a token skewed n_re_tokens by ~2 per
# line on multi-line text (both engines agreed, so the gate never saw
# it; the STATISTIC was wrong).
RE_TOKEN_PAT = f"[a-z]+|[0-9]+|[^a-z0-9{WS_CLASS}]"


def stopword_ratio(text: Column) -> Column:
    toks = P.tokens(text)
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) > 0, n_sw.cast("double") / F.size(toks)).otherwise(
        F.lit(0.0)
    )


def stopword_ratio_sql(expr: str) -> str:
    toks = P.tokens_sql(expr)
    sw = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"
    return (
        f"CASE WHEN len({toks}) > 0 THEN "
        f"len(list_filter({toks}, t -> list_contains({sw}, t)))::DOUBLE"
        f" / len({toks}) ELSE 0.0 END"
    )


# character set the punct strip keeps, shared by both engines. translate()
# (a per-char map, no regex) deletes these from lower(text); what remains
# is the punctuation. Value-identical to the previous
# regexp_replace(lower(text), '[^a-z0-9 ]', '') formulation — the kept
# count is length(lower) - length(translate) in both — but ~18x faster on
# the Spark side (java.util.regex rewrote the whole string per row; this
# is the hot scalar of the per-document featurization family:
# quality_filter_funnel / source_data_card / training_manifest_full).
PUNCT_KEEP = "abcdefghijklmnopqrstuvwxyz0123456789 "


def punct_ratio(text: Column) -> Column:
    low = F.lower(text)
    kept = F.length(low) - F.length(F.translate(low, PUNCT_KEEP, ""))
    return F.when(
        F.length(text) > 0,
        (F.length(text) - kept).cast("double") / F.length(text),
    ).otherwise(F.lit(0.0))


def punct_ratio_sql(expr: str) -> str:
    kept = (
        f"(length(lower({expr}))"
        f" - length(translate(lower({expr}), '{PUNCT_KEEP}', '')))"
    )
    return (
        f"CASE WHEN length({expr}) > 0 THEN "
        f"(length({expr}) - {kept})::DOUBLE / length({expr})"
        f" ELSE 0.0 END"
    )


def uniq_token_ratio(text: Column) -> Column:
    toks = P.tokens(text)
    return F.when(
        F.size(toks) > 0,
        F.size(F.array_distinct(toks)).cast("double") / F.size(toks),
    ).otherwise(F.lit(0.0))


def uniq_token_ratio_sql(expr: str) -> str:
    toks = P.tokens_sql(expr)
    return (
        f"CASE WHEN len({toks}) > 0 THEN "
        f"len(list_distinct({toks}))::DOUBLE / len({toks}) ELSE 0.0 END"
    )


def quality_score(text: Column) -> Column:
    """[0,1] quality heuristic: length band + low punctuation +
    stopword presence (fluency proxy) + lexical diversity.

    Delegates to quality_features so the tokenizer runs once behind the
    bind-once HOF barrier — the inline formulation re-tokenized 4x per
    row with no CSE (measured ~5x slower on the data-card projection)."""
    return quality_features(text)[0]["quality"]


def _quality_score_inline(text: Column) -> Column:
    """The direct formulation quality_features mirrors — kept for the
    parity test that pins the two expressions equal."""
    n = F.size(P.tokens(text))
    len_ok = F.when((n >= 5) & (n <= 1000), F.lit(1.0)).otherwise(F.lit(0.0))
    low_punct = F.greatest(
        F.lit(0.0), F.lit(1.0) - punct_ratio(text) * F.lit(5.0)
    )
    sw_ok = F.least(F.lit(1.0), stopword_ratio(text) * F.lit(10.0))
    return P.rounded(
        F.lit(0.25) * len_ok
        + F.lit(0.25) * low_punct
        + F.lit(0.25) * sw_ok
        + F.lit(0.25) * uniq_token_ratio(text)
    )


def quality_score_sql(expr: str) -> str:
    n = f"len({P.tokens_sql(expr)})"
    len_ok = f"CASE WHEN {n} >= 5 AND {n} <= 1000 THEN 1.0 ELSE 0.0 END"
    low_punct = f"greatest(0.0, 1.0 - {punct_ratio_sql(expr)} * 5.0)"
    sw_ok = f"least(1.0, {stopword_ratio_sql(expr)} * 10.0)"
    return P.rounded_sql(
        f"0.25 * ({len_ok}) + 0.25 * ({low_punct})"
        f" + 0.25 * ({sw_ok}) + 0.25 * ({uniq_token_ratio_sql(expr)})"
    )


def quality_score_expr(text_sql: str) -> Column:
    """``quality_score`` over a SQL column reference — the expr-string
    fast path (see quality_features_expr)."""
    return quality_features_expr(text_sql)[0]["quality"]


def quality_features(text: Column) -> Column:
    """1-element ``array<struct<punct_ratio, uniq_ratio, quality,
    n_tokens, stopword_ratio>>`` with the token array bound ONCE as a
    lambda variable — callers ``explode()`` it so the tokenizer (the
    expensive regex) runs once per row instead of 5x. A plain
    shared-Project split gets re-inlined by CollapseProject (see
    operators/dedup.py simhash); a Generate node is a real barrier.
    Math is identical to punct_ratio / uniq_token_ratio /
    quality_score / token_count / stopword_ratio."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS])

    def build(bound: Column) -> Column:
        # punct_ratio binds alongside the token array: HOF lambdas get
        # no CSE, so an unbound pr referenced twice (low_punct + the
        # rounded struct field) paid two lower+translate passes per row
        toks, pr = bound["toks"], bound["pr"]
        n = F.size(toks)
        n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        swr = F.when(n > 0, n_sw.cast("double") / n).otherwise(F.lit(0.0))
        ur = F.when(
            n > 0, F.size(F.array_distinct(toks)).cast("double") / n
        ).otherwise(F.lit(0.0))
        len_ok = F.when((n >= 5) & (n <= 1000), F.lit(1.0)).otherwise(F.lit(0.0))
        low_punct = F.greatest(F.lit(0.0), F.lit(1.0) - pr * F.lit(5.0))
        sw_ok = F.least(F.lit(1.0), swr * F.lit(10.0))
        quality = P.rounded(
            F.lit(0.25) * len_ok
            + F.lit(0.25) * low_punct
            + F.lit(0.25) * sw_ok
            + F.lit(0.25) * ur
        )
        return F.struct(
            P.rounded(pr).alias("punct_ratio"),
            P.rounded(ur).alias("uniq_ratio"),
            quality.alias("quality"),
            n.cast("int").alias("n_tokens"),
            swr.alias("stopword_ratio"),
        )

    return F.transform(
        F.array(
            F.struct(
                P.tokens(text).alias("toks"),
                punct_ratio(text).alias("pr"),
            )
        ),
        build,
    )


def quality_features_expr(text_sql: str) -> Column:
    """``quality_features`` over a SQL column reference, built as ONE
    parsed expression string (r13): the Column-builder form costs ~150
    py4j round-trips per plan build (lambda HOFs are the worst — each
    _create_lambda is several gateway calls), which at ~1.5 ms per
    round-trip put ~0.15 s of pure driver latency on every plan that
    featurizes text. Same structure, same rounding, same zero-token
    branches — pinned value-equal to the Column form on the real
    corpus by tests/test_curation_ops.py::test_quality_features_expr_parity.
    Callers with a plain column pass its name here; arbitrary Column
    inputs keep the builder form above."""
    sw = "array(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"
    toks = f"array_remove(split(lower({text_sql}), '{P.TOKEN_SPLIT_RE}'), '')"
    kept = (
        f"(length(lower({text_sql}))"
        f" - length(translate(lower({text_sql}), '{PUNCT_KEEP}', '')))"
    )
    pr = (
        f"CASE WHEN length({text_sql}) > 0 THEN"
        f" CAST((length({text_sql}) - {kept}) AS DOUBLE) / length({text_sql})"
        f" ELSE 0.0D END"
    )
    n = "size(b.toks)"
    n_sw = f"size(filter(b.toks, t -> array_contains({sw}, t)))"
    swr = f"CASE WHEN {n} > 0 THEN CAST({n_sw} AS DOUBLE) / {n} ELSE 0.0D END"
    ur = (
        f"CASE WHEN {n} > 0 THEN"
        f" CAST(size(array_distinct(b.toks)) AS DOUBLE) / {n}"
        f" ELSE 0.0D END"
    )
    len_ok = f"CASE WHEN {n} >= 5 AND {n} <= 1000 THEN 1.0D ELSE 0.0D END"
    low_punct = "greatest(0.0D, 1.0D - b.pr * 5.0D)"
    sw_ok = f"least(1.0D, ({swr}) * 10.0D)"
    quality = (
        f"round(CAST(0.25D * ({len_ok}) + 0.25D * ({low_punct})"
        f" + 0.25D * ({sw_ok}) + 0.25D * ({ur}) AS DOUBLE), 6)"
    )
    return F.expr(
        f"transform(array(named_struct('toks', {toks}, 'pr', {pr})),"
        f" b -> named_struct("
        f"'punct_ratio', round(CAST(b.pr AS DOUBLE), 6),"
        f" 'uniq_ratio', round(CAST({ur} AS DOUBLE), 6),"
        f" 'quality', {quality},"
        f" 'n_tokens', CAST({n} AS INT),"
        f" 'stopword_ratio', {swr}))"
    )


def ws_token_count(text: Column) -> Column:
    return F.size(
        F.filter(
            F.split(F.trim(text), f"[{WS_CLASS}]+"), lambda t: t != F.lit("")
        )
    )


def ws_token_count_sql(expr: str) -> str:
    return (
        f"len(list_filter(string_split_regex(trim({expr}), '[{WS_CLASS}]+'),"
        " t -> t <> ''))"
    )


def re_token_count(text: Column) -> Column:
    """BPE-ish pre-tokenizer count: words / digit runs / single symbols."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(RE_TOKEN_PAT), 0))


def re_token_count_sql(expr: str) -> str:
    return f"len(regexp_extract_all(lower({expr}), '{RE_TOKEN_PAT}'))"


# --- repetition signals (Gopher-style quality rules) ----------------------
# Per-row array expressions: gram frequencies computed as
# distinct-grams x scan — O(u*n) per document, fine for per-row corpus
# docs; a pipeline facing book-length texts would explode grams and
# count via groupBy(doc_id, gram) instead (one shuffle keyed on the
# doc), trading per-row cost for a keyed aggregation. Ratios are exact
# int/int divisions, identical across engines; rounded anyway to stay
# inside the portable-parity contract (functions/portable.py).


def _gram_expr(t: Column, n: int) -> Column:
    """Gram array from an ALREADY-BOUND token array ``t`` (a lambda
    variable — callers must not pass the raw tokenizer expression, see
    ngrams). The short-doc case must be an explicit branch:
    sequence(1, 0) DESCENDS in Spark ([1, 0]), it does not return
    empty."""
    idx = F.sequence(F.lit(1), F.size(t) - (n - 1))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws("_", *[F.element_at(t, i + j) for j in range(n)]),
    )
    return F.when(F.size(t) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def ngrams(toks: Column, n: int) -> Column:
    """Adjacent word n-grams joined by '_' (empty below n tokens).

    The token array binds as a lambda variable before element_at
    indexes it — toks is usually the regex tokenizer expression, and
    HOF lambdas re-evaluate free subexpressions per element (measured:
    the inline form re-tokenized ~2*len times per row, 7.4 s -> 0.5 s
    at sf0.1 for the gram stage alone)."""
    return F.transform(F.array(toks), lambda t: _gram_expr(t, n))[0]


def ngrams_sql(toks: str, n: int) -> str:
    parts = " || '_' || ".join(f"{toks}[i + {j}]" for j in range(n))
    return (
        f"list_transform(range(1, greatest(len({toks}) - {n - 2}, 1)),"
        f" i -> {parts})"
    )


def _run_fold(g: Column) -> Column:
    """struct<mx, dup> over a gram array: longest equal-run length and
    total length of runs >= 2, computed on the SORTED array in ONE
    linear fold.

    Why this shape: higher-order functions evaluate interpreted (no
    whole-stage codegen), so per-element lambda cost dominates. The
    natural distinct x filter frequency count is O(u*n) lambda evals
    (~2,800 per 55-token doc) and measured ~2 ms/row; sort + one fold
    is O(n) evals (~55) for the same integers."""
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("mx"),
        F.lit(0).alias("dup"),
    )

    def step(acc, e):
        same = acc["prev"].isNotNull() & (e == acc["prev"])
        closed_mx = F.greatest(acc["mx"], acc["run"])
        closed_dup = acc["dup"] + F.when(acc["run"] > 1, acc["run"]).otherwise(
            F.lit(0)
        )
        return F.struct(
            e.alias("prev"),
            F.when(same, acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.when(same, acc["mx"]).otherwise(closed_mx).alias("mx"),
            F.when(same, acc["dup"]).otherwise(closed_dup).alias("dup"),
        )

    def finish(acc):
        return F.struct(
            F.greatest(acc["mx"], acc["run"]).alias("mx"),
            (
                acc["dup"]
                + F.when(acc["run"] > 1, acc["run"]).otherwise(F.lit(0))
            ).alias("dup"),
        )

    return F.aggregate(F.array_sort(g), acc0, step, finish)


def top_ngram_ratio(text: Column, n: int = 2) -> Column:
    """Fraction of the document's n-gram instances taken by its single
    most frequent n-gram (Gopher: high -> boilerplate/repetition).

    The gram array binds ONCE as a lambda variable (HOF lambdas get no
    CSE — inlining it re-tokenizes per element); frequency comes from
    the linear run fold, not a distinct x filter scan (_run_fold).
    The ratio is an exact int/int division, so the DuckDB oracle may
    count frequencies any way it likes and still match."""

    def ratio(g: Column) -> Column:
        return F.when(
            F.size(g) > 0,
            P.rounded(_run_fold(g)["mx"].cast("double") / F.size(g)),
        ).otherwise(F.lit(0.0))

    return F.transform(F.array(ngrams(P.tokens(text), n)), ratio)[0]


def top_ngram_ratio_sql(expr: str, n: int = 2) -> str:
    toks = P.tokens_sql(expr)
    g = ngrams_sql(toks, n)
    freqs = "list_transform(list_distinct(g), x -> len(list_filter(g, y -> y = x)))"
    ratio = (
        f"CASE WHEN len(g) > 0 THEN "
        f"{P.rounded_sql(f'list_max({freqs})::DOUBLE / len(g)')}"
        f" ELSE 0.0 END"
    )
    return f"list_transform([{g}], g -> {ratio})[1]"


# Single-pass joined-token string: tokens are strictly [a-z0-9]+ (the
# shared tokenizer alphabet), so the \x1f unit separator cannot occur
# inside one and gram boundaries are unambiguous.
TOKEN_SEP = "\x1f"
_PAIR_RE = f"[^{TOKEN_SEP}]+{TOKEN_SEP}[^{TOKEN_SEP}]+"
_TRIPLE_RE = (
    f"[^{TOKEN_SEP}]+{TOKEN_SEP}[^{TOKEN_SEP}]+{TOKEN_SEP}[^{TOKEN_SEP}]+"
)


def joined_tokens(text: Column) -> Column:
    """The P.tokens token list as ONE \\x1f-joined string, built by a
    single linear regexp_replace — identical content to
    ``array_join(P.tokens(text), TOKEN_SEP)`` (separator runs collapse
    to one \\x1f; btrim clears the leading/trailing separator that
    split turns into empty tokens) without materializing the array."""
    return F.btrim(
        F.regexp_replace(F.lower(text), P.TOKEN_SPLIT_RE, TOKEN_SEP),
        F.lit(TOKEN_SEP),
    )


def _strip_first_token(s: Column) -> Column:
    return F.regexp_replace(s, f"^[^{TOKEN_SEP}]+{TOKEN_SEP}", "")


def joined_tokens_sql(text_sql: str) -> str:
    """Spark-SQL string twin of ``joined_tokens`` (keep in lockstep)."""
    return (
        f"btrim(regexp_replace(lower({text_sql}),"
        f" '{P.TOKEN_SPLIT_RE}', '{TOKEN_SEP}'), '{TOKEN_SEP}')"
    )


def _strip_first_token_sql(s: str) -> str:
    return f"regexp_replace({s}, '^[^{TOKEN_SEP}]+{TOKEN_SEP}', '')"


def _eq_flags(g: Column) -> Column:
    """``array<int>`` of length n-1 over the SORTED gram-hash array:
    flags[i] = 1 iff sorted[i+1] == sorted[i]. The sort binds ONCE
    behind a transform(array(...)) barrier — HOF lambdas get no CSE,
    and an unbound sort inside a per-element lambda re-sorts per
    element (measured 68 s vs 3 s at the x100 probe)."""
    n = F.size(g)
    return F.transform(
        F.array(F.array_sort(g)),
        lambda s: F.zip_with(
            F.slice(s, 1, n - 1),
            F.slice(s, 2, n - 1),
            lambda a, b: (a == b).cast("int"),
        ),
    )[0]


def _mx_from_flags(fl: Column) -> Column:
    """Max gram frequency = 1 + the longest run of 1s in the
    neighbor-equality flags. Arithmetic-only fold over a 2-int
    accumulator: run' = (run+1)*f zeroes the run on every 0-flag, so
    there is no When/null-prev branching per element."""
    acc0 = F.struct(F.lit(0).alias("run"), F.lit(0).alias("mx"))

    def step(acc, f):
        run = (acc["run"] + 1) * f
        return F.struct(
            run.alias("run"), F.greatest(acc["mx"], run).alias("mx")
        )

    return 1 + F.aggregate(
        fl, acc0, step, lambda acc: F.greatest(acc["mx"], acc["run"])
    )


def _dup_from_flags(fl: Column) -> Column:
    """Duplicate-gram mass from the neighbor-equality flags: a maximal
    run of k 1-flags is a run of k+1 equal grams, contributing k+1
    instances. On each 0-flag the closing run pays run + min(run, 1)
    (the +1 counts the run's first gram, only when a run existed)."""
    acc0 = F.struct(F.lit(0).alias("run"), F.lit(0).alias("dup"))

    def step(acc, f):
        closed = acc["dup"] + (1 - f) * (
            acc["run"] + F.least(acc["run"], F.lit(1))
        )
        return F.struct(
            ((acc["run"] + 1) * f).alias("run"), closed.alias("dup")
        )

    return F.aggregate(
        fl,
        acc0,
        step,
        lambda acc: acc["dup"] + acc["run"] + F.least(acc["run"], F.lit(1)),
    )


def repetition_features(text: Column) -> Column:
    """1-element ``array<struct<top_2gram_ratio, dup_3gram_ratio>>``
    computing BOTH Gopher repetition signals — callers ``explode()``
    it. Values are bit-identical to top_ngram_ratio(2) /
    dup_ngram_ratio(3) (pinned by tests/test_pipeline_ops.py::test_repetition_features_matches_single_signal_fns).

    Shape, chosen by measurement (all value-identical variants, A/B'd
    interleaved in one session on the x100 probe corpus):
    - tokens live as ONE joined string (joined_tokens: one linear
      regexp_replace, no token-array alloc);
    - n-grams come from CONSUMING regex passes at shifted token
      offsets (2 passes for 2-grams, 3 for 3-grams, each linear and
      non-overlapping; order doesn't matter because the stats sort) —
      ~2.4x cheaper than the per-element element_at+concat_ws HOF
      build, which was the dominant cost;
    - each gram immediately becomes its xxhash64 LONG: the stats
      depend only on gram equality classes, which hashing preserves
      (a within-document 64-bit collision — ~1e4 grams/doc, p ~ 5e-12
      per doc — is the only way values could differ from the string
      form; the DuckDB oracle twin keeps counting true string grams,
      so the driver hash gate continuously re-proves this);
    - frequencies come from neighbor-equality FLAGS over the
      once-sorted long array (_eq_flags) and arithmetic-only 2-int
      folds (_mx_from_flags / _dup_from_flags) — 4.4x faster than the
      previous string sort + (prev, run, acc) struct fold at x100
      (12.7 s -> 2.9 s, 500k docs), because the interpreted
      per-element step drops from 8 null-checking string-comparing
      expressions to 2-3 int ops, and long sorts beat string sorts.
    Rejected on measurement: per-char zero-width lookahead gram
      extraction (~1.4x whole-query cost), run-finding via
      backreference regex on an RS-joined sorted gram string
      (array_join dominated), neighbor-flag folds over STRING arrays
      (object-array slice/zip_with allocs dominated — flags only win
      after the grams are hashed to longs), struct grams (struct sort
      slower than string sort), pyspark.ml NGram (marginal),
      explode+groupBy (2-4x slower, see ngrams note).
    Each stage binds once as a lambda variable (HOF lambdas get no
    CSE; a bare multi-use projection would re-run the tokenizer, and
    an unbound array_sort inside a lambda re-sorts PER ELEMENT —
    measured 68 s vs 3 s at x100)."""

    def grams(s: Column) -> Column:
        s1 = _strip_first_token(s)
        g2 = F.concat(
            F.regexp_extract_all(s, F.lit(_PAIR_RE), 0),
            F.regexp_extract_all(s1, F.lit(_PAIR_RE), 0),
        )
        g3 = F.concat(
            F.regexp_extract_all(s, F.lit(_TRIPLE_RE), 0),
            F.regexp_extract_all(s1, F.lit(_TRIPLE_RE), 0),
            F.regexp_extract_all(
                _strip_first_token(_strip_first_token(s)), F.lit(_TRIPLE_RE), 0
            ),
        )
        return F.struct(
            F.transform(g2, lambda x: F.xxhash64(x)).alias("gt"),
            F.transform(g3, lambda x: F.xxhash64(x)).alias("gd"),
        )

    def ratios(gs: Column) -> Column:
        gt, gd = gs["gt"], gs["gd"]
        top = F.when(
            F.size(gt) > 0,
            P.rounded(
                _mx_from_flags(_eq_flags(gt)).cast("double") / F.size(gt)
            ),
        ).otherwise(F.lit(0.0))
        dup = F.when(
            F.size(gd) > 0,
            P.rounded(
                _dup_from_flags(_eq_flags(gd)).cast("double") / F.size(gd)
            ),
        ).otherwise(F.lit(0.0))
        return F.struct(
            top.alias("top_2gram_ratio"), dup.alias("dup_3gram_ratio")
        )

    return F.transform(
        F.transform(F.array(joined_tokens(text)), grams), ratios
    )


def hashed_ngram_ids(text: Column, n: int) -> Column:
    """``array<bigint>``: xxhash64 of every token n-gram of ``text``
    (with multiplicity, arbitrary order). The gram strings are built
    by n shifted CONSUMING regex passes over the joined-token string
    (the repetition_features shape) and hashed immediately — callers
    that only need gram EQUALITY (dedup blocking, decontamination
    overlap counts, distinct-set sizes) get long-array semantics
    for the whole downstream pipeline: long sorts/joins/group-bys
    instead of multi-byte string ones, and no concat_ws allocation
    per gram. Measured on the x100 probe corpus: the 5-gram shingle
    explode+groupBy stage went 10.6 s -> 2.8 s vs the
    concat_ws(slice) build.

    NOT value-interchangeable with string grams where the gram text
    surfaces (boilerplate reports) or feeds a pinned hash family
    (MinHash/SimHash md5 signatures) — those keep string shingles.
    Within-corpus 64-bit collisions are the only way counts could
    differ from the string form (~2.6e-5 for 25M distinct shingles);
    the DuckDB oracle twins keep counting true string grams, so the
    driver hash gate continuously re-proves the equivalence."""
    pat = TOKEN_SEP.join([f"[^{TOKEN_SEP}]+"] * n)

    def grams(s: Column) -> Column:
        parts = [s]
        cur = s
        for _ in range(n - 1):
            cur = _strip_first_token(cur)
            parts.append(cur)
        return F.concat(*[
            F.transform(
                F.regexp_extract_all(p, F.lit(pat), 0),
                lambda x: F.xxhash64(x),
            )
            for p in parts
        ])

    return F.transform(F.array(joined_tokens(text)), grams)[0]


def hashed_ngram_ids_expr(text_sql: str, n: int) -> Column:
    """``hashed_ngram_ids`` over a SQL column reference, built as ONE
    parsed expression string (r14 expr-string pattern — the Column form
    costs ~60 ms of py4j lambda-HOF construction per plan build, paid
    by every shingle consumer per execution). Same trees: n shifted
    consuming regex passes over the joined-token string, each gram
    hashed to xxhash64 immediately. Pinned sameSemantics-identical to
    the Column form by tests/test_expr_parity.py."""
    pat = TOKEN_SEP.join([f"[^{TOKEN_SEP}]+"] * n)
    parts = ["s"]
    for _ in range(n - 1):
        parts.append(_strip_first_token_sql(parts[-1]))
    grams = ", ".join(
        f"transform(regexp_extract_all({p}, '{pat}', 0), x -> xxhash64(x))"
        for p in parts
    )
    return F.expr(
        f"transform(array({joined_tokens_sql(text_sql)}),"
        f" s -> concat({grams}))[0]"
    )


def repetition_features_expr(text_sql: str) -> Column:
    """``repetition_features`` over a SQL column reference, as ONE
    parsed expression string (r14): the Column form builds ~20 nested
    lambda HOFs (~150 ms of py4j per plan build). Identical structure —
    consuming-regex gram passes, xxhash64 gram ids, neighbor-equality
    flags over the once-sorted array, arithmetic-only folds — pinned
    sameSemantics-identical to the Column form by
    tests/test_expr_parity.py::test_repetition_features_expr_parity."""
    s1 = _strip_first_token_sql("s")
    s2 = _strip_first_token_sql(s1)
    g2 = (
        f"concat(regexp_extract_all(s, '{_PAIR_RE}', 0),"
        f" regexp_extract_all({s1}, '{_PAIR_RE}', 0))"
    )
    g3 = (
        f"concat(regexp_extract_all(s, '{_TRIPLE_RE}', 0),"
        f" regexp_extract_all({s1}, '{_TRIPLE_RE}', 0),"
        f" regexp_extract_all({s2}, '{_TRIPLE_RE}', 0))"
    )
    grams = (
        f"named_struct("
        f"'gt', transform({g2}, x -> xxhash64(x)),"
        f" 'gd', transform({g3}, x -> xxhash64(x)))"
    )

    def eq_flags(g: str) -> str:
        return (
            f"transform(array(array_sort({g})),"
            f" s -> zip_with(slice(s, 1, size({g}) - 1),"
            f" slice(s, 2, size({g}) - 1),"
            f" (a, b) -> CAST((a = b) AS INT)))[0]"
        )

    def mx_from_flags(fl: str) -> str:
        return (
            f"1 + aggregate({fl},"
            f" named_struct('run', 0, 'mx', 0),"
            f" (acc, f) -> named_struct('run', (acc.run + 1) * f,"
            f" 'mx', greatest(acc.mx, (acc.run + 1) * f)),"
            f" acc -> greatest(acc.mx, acc.run))"
        )

    def dup_from_flags(fl: str) -> str:
        return (
            f"aggregate({fl},"
            f" named_struct('run', 0, 'dup', 0),"
            f" (acc, f) -> named_struct('run', (acc.run + 1) * f,"
            f" 'dup', acc.dup + (1 - f) * (acc.run + least(acc.run, 1))),"
            f" acc -> acc.dup + acc.run + least(acc.run, 1))"
        )

    top = (
        f"CASE WHEN size(gs.gt) > 0 THEN"
        f" round(CAST(CAST(({mx_from_flags(eq_flags('gs.gt'))}) AS DOUBLE)"
        f" / size(gs.gt) AS DOUBLE), 6)"
        f" ELSE 0.0D END"
    )
    dup = (
        f"CASE WHEN size(gs.gd) > 0 THEN"
        f" round(CAST(CAST(({dup_from_flags(eq_flags('gs.gd'))}) AS DOUBLE)"
        f" / size(gs.gd) AS DOUBLE), 6)"
        f" ELSE 0.0D END"
    )
    ratios = (
        f"named_struct('top_2gram_ratio', {top}, 'dup_3gram_ratio', {dup})"
    )
    return F.expr(
        f"transform(transform(array({joined_tokens_sql(text_sql)}),"
        f" s -> {grams}), gs -> {ratios})"
    )


def dup_ngram_ratio(text: Column, n: int = 3) -> Column:
    """Fraction of n-gram instances whose n-gram occurs more than once
    in the document (Gopher's duplicate-n-gram-fraction). Same
    bind-once + linear-fold discipline as top_ngram_ratio."""

    def ratio(g: Column) -> Column:
        return F.when(
            F.size(g) > 0,
            P.rounded(_run_fold(g)["dup"].cast("double") / F.size(g)),
        ).otherwise(F.lit(0.0))

    return F.transform(F.array(ngrams(P.tokens(text), n)), ratio)[0]


def dup_ngram_ratio_sql(expr: str, n: int = 3) -> str:
    toks = P.tokens_sql(expr)
    g = ngrams_sql(toks, n)
    dup = (
        "list_sum(list_transform(list_distinct(g),"
        " x -> CASE WHEN len(list_filter(g, y -> y = x)) > 1"
        " THEN len(list_filter(g, y -> y = x)) ELSE 0 END))"
    )
    ratio = (
        f"CASE WHEN len(g) > 0 THEN "
        f"{P.rounded_sql(f'({dup})::DOUBLE / len(g)')}"
        f" ELSE 0.0 END"
    )
    return f"list_transform([{g}], g -> {ratio})[1]"


# --- BPE-style pretokenizer (portable: no lookahead, ASCII classes) -------

# GPT-2's pretokenizer splits contractions / letter runs / digit runs /
# punctuation runs; its real pattern needs lookahead + unicode
# categories, which RE2 (DuckDB) lacks — this is the lookahead-free
# ASCII projection, identical under Java regex and RE2.
BPE_SPLIT_RE = (
    r"'(?:s|t|re|ve|m|ll|d)|[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9" + WS_CLASS + "]+"
)


def bpe_tokens(text):
    from pyspark.sql import functions as F

    return F.regexp_extract_all(text, F.lit(BPE_SPLIT_RE), 0)


def bpe_tokens_sql(expr: str) -> str:
    return f"regexp_extract_all({expr}, $bpe${BPE_SPLIT_RE}$bpe$)"
