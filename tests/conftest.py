import os

import pytest

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from vector_search_application_spark.session import get_spark

    s = get_spark(shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    yield con
    con.close()


def register_views(con, sf_dir: str) -> None:
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )


def compare_spark_duckdb(sdf, con, sql: str):
    """Mirror the driver's correctness gate: row count, schema (sorted
    column names), and order-insensitive value comparison."""
    spark_rows = sdf.collect()
    spark_cols = sdf.columns
    duck_res = con.execute(sql)
    duck_cols = [d[0] for d in duck_res.description]
    duck_rows = duck_res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"schema mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )

    order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    dorder = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])

    def norm_s(row):
        return tuple(_norm(row[spark_cols[i]]) for i in order)

    def norm_d(row):
        return tuple(_norm(row[i]) for i in dorder)

    s_sorted = sorted(map(norm_s, spark_rows), key=_key)
    d_sorted = sorted(map(norm_d, duck_rows), key=_key)
    for i, (a, b) in enumerate(zip(s_sorted, d_sorted)):
        assert _eq(a, b), f"row {i} mismatch:\n spark={a}\n duck ={b}"


def _norm(v):
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _canon(x):
    """Sort-key canonicalization: values that compare equal must sort
    identically, or the zip pairing misaligns rows that actually match.
    -0.0 stringifies differently from 0.0 (while -0.0 == 0.0), and NaN
    never equals itself — both would scramble the str()-based sort."""
    if isinstance(x, tuple):
        return tuple(_canon(v) for v in x)
    if isinstance(x, float):
        if x != x:
            return "__nan__"
        return x + 0.0  # folds -0.0 onto 0.0
    return x


def _key(row):
    return tuple((x is None, str(x)) for x in _canon(row))


def _eq(a, b):
    """== plus NaN == NaN (identical NaNs from both engines must not
    fail the gate; a one-sided NaN still does)."""
    if type(a) is tuple and type(b) is tuple:
        return len(a) == len(b) and all(_eq(x, y) for x, y in zip(a, b))
    if isinstance(a, float) and isinstance(b, float) and a != a and b != b:
        return True
    return a == b
