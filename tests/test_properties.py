"""Property tests for the portable primitives (hypothesis + DuckDB).

Cross-engine Spark<->DuckDB parity is covered per-query by the registry
oracle gate; these pin the DECLARED semantics themselves against an
independent Python model, over adversarial inputs, at DuckDB speed
(no Spark session needed).
"""

import re

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from vector_search_application_spark.functions import portable as P
from vector_search_application_spark.plans.constants import (
    MINHASH_A,
    MINHASH_B,
    MINHASH_PERMS,
    MINHASH_PRIME,
)


def py_tokens(text: str) -> list[str]:
    """Independent model of the declared tokenizer: lowercase, split on
    runs of [^a-z0-9], drop empties."""
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=200))
def test_tokens_sql_matches_python_model(text):
    con = duckdb.connect()
    got = con.execute(
        f"SELECT {P.tokens_sql('?')}", [text]
    ).fetchone()[0]
    assert list(got) == py_tokens(text)


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=120), st.text(max_size=120))
def test_md5_long_sql_deterministic_and_60bit(a, b):
    con = duckdb.connect()
    va, vb = con.execute(
        f"SELECT {P.md5_long_sql('?')}, {P.md5_long_sql('?')}", [a, b]
    ).fetchone()
    assert 0 <= va < 1 << 60
    if a == b:
        assert va == vb


def test_minhash_family_never_overflows_signed64():
    """a_i*h + b_i must fit signed 64-bit for every 32-bit h in BOTH
    engines (DuckDB errors on overflow; Spark silently wraps)."""
    h_max = (1 << 32) - 1
    for a, b in zip(MINHASH_A, MINHASH_B):
        assert 0 < a < 1 << 31 and a % 2 == 1
        assert 0 <= b < 1 << 31
        assert a * h_max + b < (1 << 63) - 1
    assert len(set(zip(MINHASH_A, MINHASH_B))) == MINHASH_PERMS
    assert MINHASH_PRIME == (1 << 61) - 1


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.floats(-1e6, 1e6, allow_nan=False, width=32), min_size=1, max_size=64)
)
def test_cosine_sql_bounded_and_self_similar(xs):
    con = duckdb.connect()
    lit = "[" + ",".join(repr(float(x)) for x in xs) + "]::FLOAT[]"
    cos_self, cos_neg = con.execute(
        f"SELECT {P.rounded_sql(P.cosine_sql(lit, lit))},"
        f" {P.rounded_sql(P.cosine_sql(lit, f'list_transform({lit}, x -> -x)'))}"
    ).fetchone()
    if any(x != 0.0 for x in xs):
        assert abs(cos_self - 1.0) < 1e-6
        assert abs(cos_neg + 1.0) < 1e-6
    else:
        assert cos_self == 0.0  # declared zero-norm fallback
