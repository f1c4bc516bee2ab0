"""Portable deterministic primitives: paired Spark-Column and DuckDB-SQL
builders.

The driver's correctness gate runs every declared query in BOTH engines
and hash-compares values, so each deterministic function here has two
implementations generated from the same constants:

  ``foo(col)``      -> pyspark Column expression (JVM-side, codegen'd)
  ``foo_sql(expr)`` -> DuckDB SQL fragment computing the identical value

Conventions that make the hashes match:
  - every float that reaches an output is ``round(x, ROUND_DIGITS)``
  - all accumulation happens in DOUBLE on both sides
  - the shared hash is md5-based (both engines produce identical
    lowercase hex), folded to a non-negative 60-bit BIGINT
  - tokenization is lowercase + split on ``[^a-z0-9]+`` with empty
    tokens dropped (reference analyzer declared in SURVEY.md §7 step 5)

The full contract, including the CLOSED list of accepted float-fold
exceptions (PQ ADC s-ordered fold, hyperplane-LSH sign-on-rounded-dot,
MMR round-before-max), lives in PARITY.md at the repo root.
"""

from __future__ import annotations

import decimal

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..plans.constants import ROUND_DIGITS

TOKEN_SPLIT_RE = "[^a-z0-9]+"


# ---------------------------------------------------------------------------
# hashing
# ---------------------------------------------------------------------------

def md5_long(col: Column, seed: str = "") -> Column:
    """Deterministic non-negative 60-bit hash of a string column.

    Replaces the reference's salted ``abs(hash(x)) % 2**63`` point-id
    synthesis (reference app/main.py:137, scripts/indexing.py:557) with
    a run-reproducible hash — documented fidelity improvement
    (SURVEY.md §1.4).
    """
    payload = F.concat(F.lit(f"{seed}|"), col) if seed else col
    return F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast("bigint")


def md5_long_sql(expr: str, seed: str = "") -> str:
    payload = f"'{seed}|' || ({expr})" if seed else f"({expr})"
    return f"('0x' || substr(md5({payload}), 1, 15))::BIGINT"


def sha256_hex(col: Column) -> Column:
    return F.sha2(col, 256)


def sha256_hex_sql(expr: str) -> str:
    return f"sha256({expr})"


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

def tokens(col: Column) -> Column:
    """array<string> of non-empty lowercase tokens.

    Implemented as a DIRECT regex split + array_remove — the same
    shape as the DuckDB twin (string_split_regex + list_filter).
    Two rejected alternatives, both measured on the x100 probe corpus:
    a higher-order-function filter (interpreted per element, ~3x
    slower) and the earlier regexp_replace-collapse + trim + split
    (value-identical, but the replace pass REWRITES every multi-KB
    string before splitting — ~10% slower warm and ~5x slower on the
    cold JIT path). Splitting on [^a-z0-9]+ yields empty strings only
    at a leading/trailing separator run, which array_remove clears,
    so the token list is identical across all three forms (edge cases
    pinned in the tokenizer A/B: empty, all-separator, unicode,
    newline/tab).
    """
    return F.array_remove(F.split(F.lower(col), TOKEN_SPLIT_RE), "")


def tokens_sql(expr: str) -> str:
    return (
        f"list_filter(string_split_regex(lower({expr}), '{TOKEN_SPLIT_RE}'),"
        " t -> t <> '')"
    )


def tokens_spark_sql(expr: str) -> str:
    """Spark-SQL string form of ``tokens`` — the identical
    array_remove(split(lower(..))) expression as ONE parsed string, for
    builders that assemble plans as SQL text (the r13 expr-string
    pattern: each Column call is a py4j round-trip; one parsed string
    is one). Keep in lockstep with ``tokens``."""
    return f"array_remove(split(lower({expr}), '{TOKEN_SPLIT_RE}'), '')"


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def token_count_sql(expr: str) -> str:
    return f"len({tokens_sql(expr)})"


# ---------------------------------------------------------------------------
# vector math (arrays accumulated in DOUBLE on both sides)
# ---------------------------------------------------------------------------

def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def dot_sql(a: str, b: str) -> str:
    return f"list_dot_product(({a})::DOUBLE[], ({b})::DOUBLE[])"


def dot_spark_sql(a: str, b: str) -> str:
    """Spark-SQL string form of ``dot`` — same zip_with double products
    and left-assoc accumulation, for builders that assemble plans as
    parsed SQL (operators/ann.py literal-vector paths). Keep in lockstep
    with ``dot``; parity breaks silently otherwise."""
    return (
        f"aggregate(zip_with({a}, {b},"
        " (x, y) -> cast(x as double) * cast(y as double)),"
        " 0.0D, (acc, x) -> acc + x)"
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def norm_sql(a: str) -> str:
    return f"sqrt({dot_sql(a, a)})"


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; zero-norm inputs score 0.0 (the reference's
    zero-vector embedding-failure fallback, app/services/search_service.py:136).
    """
    denom = norm(a) * norm(b)
    return F.when(denom > F.lit(0.0), dot(a, b) / denom).otherwise(F.lit(0.0))


def cosine_sql(a: str, b: str) -> str:
    return (
        f"coalesce({dot_sql(a, b)} / nullif({norm_sql(a)} * {norm_sql(b)}, 0.0), 0.0)"
    )


def cosine_spark_sql(a: str, b: str) -> str:
    """Spark-SQL string form of ``cosine`` — the same dot/norm
    expression trees (dot_spark_sql) under the same zero-denominator
    CASE, as one parsed string (the Column form costs ~80 ms of py4j
    lambda construction per call). Keep in lockstep with ``cosine``;
    parity breaks silently otherwise."""
    denom = f"sqrt({dot_spark_sql(a, a)}) * sqrt({dot_spark_sql(b, b)})"
    return (
        f"CASE WHEN {denom} > 0.0D THEN ({dot_spark_sql(a, b)}) / ({denom})"
        f" ELSE 0.0D END"
    )


_QUANTA: dict[int, "decimal.Decimal"] = {}


def round_half_up(x: float, digits: int = ROUND_DIGITS) -> float:
    """Python twin of Spark ROUND on DOUBLE: HALF_UP over the SHORTEST
    decimal repr of the double (BigDecimal.valueOf = Double.toString,
    which Python's repr() also produces) — NOT over the exact binary
    expansion, and NOT Python round()'s banker's rounding. Any
    driver-side value that must compare equal to an engine-rounded
    value goes through this. Called from per-candidate scoring loops
    (rerank, ann), so the quantum is cached per digit count."""
    q = _QUANTA.get(digits)
    if q is None:
        q = _QUANTA.setdefault(digits, decimal.Decimal(1).scaleb(-digits))
    return float(
        decimal.Decimal(repr(x)).quantize(q, rounding=decimal.ROUND_HALF_UP)
    )


def rounded(col: Column, digits: int = ROUND_DIGITS) -> Column:
    return F.round(col.cast("double"), digits)


def rounded_sql(expr: str, digits: int = ROUND_DIGITS) -> str:
    return f"round(({expr})::DOUBLE, {digits})"
