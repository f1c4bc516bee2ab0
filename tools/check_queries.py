"""Run declared registry queries against their DuckDB oracle under a
VANILLA SparkSession — mimicking the driver's correctness gate, not the
pytest fixture (which tunes shuffle partitions via session.get_spark).

Usage:
    python tools/check_queries.py [query ...]      # default: all
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/check_queries.py
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main(names: list[str]) -> int:
    import duckdb
    from pyspark.sql import SparkSession

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if not names:
        names = list(queries)
    unknown = [n for n in names if n not in queries]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("check_queries")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    results: dict[str, dict] = {}
    rc = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = queries[name](spark, SF_DIR)
            spark_rows = sdf.collect()
            spark_cols = sdf.columns
            if name not in oracles:
                results[name] = {
                    "err": "no_oracle", "spark_rows": len(spark_rows),
                    "sec": round(time.time() - t0, 3),
                }
                continue
            res = con.execute(oracles[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
            schema_match = sorted(spark_cols) == sorted(duck_cols)
            rows_match = len(spark_rows) == len(duck_rows)
            hash_match = False
            if schema_match and rows_match:
                order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
                dorder = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])

                def norm(v):
                    return tuple(norm(x) for x in v) if isinstance(v, list) else v

                def key(row):
                    return tuple((x is None, str(x)) for x in row)

                s = sorted(
                    (tuple(norm(r[spark_cols[i]]) for i in order) for r in spark_rows),
                    key=key,
                )
                d = sorted(
                    (tuple(norm(r[i]) for i in dorder) for r in duck_rows), key=key
                )
                hash_match = s == d
            results[name] = {
                "rows_match": rows_match, "schema_match": schema_match,
                "hash_match": hash_match, "spark_rows": len(spark_rows),
                "oracle_rows": len(duck_rows), "err": None,
                "sec": round(time.time() - t0, 3),
            }
            if not (rows_match and schema_match and hash_match):
                rc = 1
        except Exception as e:  # noqa: BLE001 — report, keep checking
            results[name] = {"err": f"{type(e).__name__}: {e}"[:300],
                             "sec": round(time.time() - t0, 3)}
            rc = 1
    print(json.dumps(results, indent=1))
    spark.stop()
    return rc


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
