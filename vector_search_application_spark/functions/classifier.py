"""Part-number query classifier (SURVEY.md §2.10 C1) as a single
portable SQL expression.

The reference classifies a search query as "probably a part number"
with ~15 regex features scored by integers and a threshold of 4
(reference scripts/partno_classifier.py:34-144). This is an original
re-design with the same decision power on the golden cases
(FIXTURES.md §6): additive integer features over regex/length/word
shape, threshold >= 4. Deterministic -> golden-testable, and identical
in Spark (Java regex) and DuckDB (RE2) because the patterns stick to
the common syntax subset (anchors, classes, alternation, \\b, \\d).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .text import WS_CLASS, duck_ws_strip_sql, ws_strip_upper

KNOWN_PREFIXES = (
    "RAD|PIP|MIL|LIN|NOR|MSA|ESA|HYP|KOI|WBU|CBR|HOU|BOS|VIC|AMS|E57|NI"
)
SEARCH_WORDS = (
    "gas|torch|welding|safety|equipment|helmet|regulator|valve|gloves|"
    "how|best|find|page|for|with|the"
)

THRESHOLD = 4

# (points, patterns-ANDed applied to upper(trim(q)))
# feature semantics mirror the reference's scoring groups; no lookaheads
# (RE2 on the DuckDB side doesn't support them) — conjunctions instead
_FEATURES: list[tuple[int, tuple[str, ...]]] = [
    (3, (r"^[A-Z0-9/#. -]+$", "[A-Z]", "[0-9]")),       # letter+digit mix
    # [^\n] not '.': Java '.' excludes \r, RE2 '.' matches it — the
    # explicit class behaves identically in both engines
    (2, (r"^[^\n]{5,16}$",)),                          # plausible length
    (2, (r"[-/#.]",)),                                  # separator chars
    (3, (rf"^({KNOWN_PREFIXES})[0-9]",)),               # known mfr prefix
    (1, (r"[0-9]{3,}$",)),                              # trailing digit run
    (1, (r"^P/?N:? ?.+",)),                             # explicit p/n marker
]
_PENALTIES: list[tuple[int, tuple[str, ...]]] = [
    (-4, (rf"\b({SEARCH_WORDS.upper()})\b",)),          # natural-language words
    (-2, (r"^[^0-9]*$",)),                              # no digits at all
    (-3, (r"^[A-Z]{4,} [0-9]{1,3}$",)),                 # word + small number
]
_MANY_WORDS_PENALTY = -4                              # >= 4 words
_SHORT_PENALTY = -1                                   # < 5 chars


def _cleaned(q: Column) -> Column:
    # the shared pinned-class strip (text.ws_strip_upper): trim removes
    # only spaces, and a trailing newline is where Java and RE2 regex
    # semantics part ways (Java '$' matches before a final line
    # terminator, RE2 does not) — stripping ALL edge whitespace keeps
    # the two engines decision-identical.
    return ws_strip_upper(q)


def partno_score(q: Column) -> Column:
    """Integer classifier score of a raw query string."""
    c = _cleaned(q)
    score = F.lit(0)
    for pts, pats in _FEATURES + _PENALTIES:
        cond = c.rlike(pats[0])
        for pat in pats[1:]:
            cond = cond & c.rlike(pat)
        score = score + F.when(cond, F.lit(pts)).otherwise(F.lit(0))
    n_words = F.size(F.split(F.trim(q), rf"[{WS_CLASS}]+"))
    score = score + F.when(n_words >= 4, F.lit(_MANY_WORDS_PENALTY)).otherwise(
        F.lit(0)
    )
    score = score + F.when(F.length(c) < 5, F.lit(_SHORT_PENALTY)).otherwise(F.lit(0))
    return score.cast("int")


def is_part_number(q: Column) -> Column:
    return (partno_score(q) >= THRESHOLD).alias("is_part_number")


def _sql_cleaned(expr: str) -> str:
    # twin of _cleaned — both halves come from functions/text.py
    return f"upper({duck_ws_strip_sql(expr)})"


def partno_score_sql(expr: str) -> str:
    c = _sql_cleaned(expr)
    terms = []
    for pts, pats in _FEATURES + _PENALTIES:
        conds = " AND ".join(
            f"regexp_matches({c}, '{pat.replace(chr(39), chr(39) * 2)}')"
            for pat in pats
        )
        terms.append(f"CASE WHEN {conds} THEN {pts} ELSE 0 END")
    terms.append(
        f"CASE WHEN len(string_split_regex(trim({expr}), '[{WS_CLASS}]+')) >= 4"
        f" THEN {_MANY_WORDS_PENALTY} ELSE 0 END"
    )
    terms.append(
        f"CASE WHEN length({c}) < 5 THEN {_SHORT_PENALTY} ELSE 0 END"
    )
    return "CAST(" + " + ".join(terms) + " AS INTEGER)"


def is_part_number_sql(expr: str) -> str:
    return f"({partno_score_sql(expr)} >= {THRESHOLD})"


# --- explain variant (reference scripts/partno_classifier.py:146-282) ----
# one named integer contribution per feature group; their sum IS the score

FEATURE_NAMES = [
    "f_alnum_mix",
    "f_length",
    "f_separators",
    "f_known_prefix",
    "f_digit_tail",
    "f_pn_marker",
    "p_search_words",
    "p_no_digits",
    "p_word_number",
    "p_many_words",
    "p_short",
]


# p_many_words / p_short are appended manually below — the zip must
# cover exactly the regex features or a future addition silently
# mislabels every column after it. Explicit raise, not assert: the
# guard must survive python -O (same rationale as the explicit raises
# in registry_extras.py).
if len(FEATURE_NAMES) != len(_FEATURES) + len(_PENALTIES) + 2:
    raise RuntimeError(
        "FEATURE_NAMES out of sync with _FEATURES/_PENALTIES"
        f" ({len(FEATURE_NAMES)} names vs"
        f" {len(_FEATURES) + len(_PENALTIES)} regex features + 2 manual)"
    )


def partno_explain_cols(q: Column) -> list[Column]:
    """One aliased integer column per feature, same order/semantics as
    partno_score (which is their sum)."""
    c = _cleaned(q)
    cols = []
    for name, (pts, pats) in zip(
        FEATURE_NAMES[:-2], _FEATURES + _PENALTIES, strict=True
    ):
        cond = c.rlike(pats[0])
        for pat in pats[1:]:
            cond = cond & c.rlike(pat)
        cols.append(
            F.when(cond, F.lit(pts)).otherwise(F.lit(0)).cast("int").alias(name)
        )
    n_words = F.size(F.split(F.trim(q), rf"[{WS_CLASS}]+"))
    cols.append(
        F.when(n_words >= 4, F.lit(_MANY_WORDS_PENALTY))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("p_many_words")
    )
    cols.append(
        F.when(F.length(c) < 5, F.lit(_SHORT_PENALTY))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("p_short")
    )
    return cols


def partno_explain_sql(expr: str) -> list[str]:
    """Aliased SQL fragments mirroring partno_explain_cols."""
    c = _sql_cleaned(expr)
    frags = []
    for name, (pts, pats) in zip(FEATURE_NAMES, _FEATURES + _PENALTIES):
        conds = " AND ".join(
            f"regexp_matches({c}, '{pat.replace(chr(39), chr(39) * 2)}')"
            for pat in pats
        )
        frags.append(
            f"CAST(CASE WHEN {conds} THEN {pts} ELSE 0 END AS INTEGER) AS {name}"
        )
    frags.append(
        f"CAST(CASE WHEN len(string_split_regex(trim({expr}), '[{WS_CLASS}]+'))"
        f" >= 4 THEN {_MANY_WORDS_PENALTY} ELSE 0 END AS INTEGER)"
        " AS p_many_words"
    )
    frags.append(
        f"CAST(CASE WHEN length({c}) < 5 THEN {_SHORT_PENALTY} ELSE 0 END"
        " AS INTEGER) AS p_short"
    )
    return frags
