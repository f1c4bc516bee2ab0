"""Ingest sources: tar.gz extraction (S2), directory imports (S4/S5),
validation/quarantine (T5)."""

import json
import os
import tarfile

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from vector_search_application_spark.sources import json_source


@pytest.fixture()
def product_docs():
    return [
        {"_id": "RAD0000001", "partNumber_airgas_text": "RAD0000001",
         "manufacturerPartNumber_text": "0000001",
         "shortDescription_airgas_text": "gas torch kit",
         "onlinePrice_string": "19.5", "img_270Wx270H_string": None},
        {"_id": "MIL0000002", "partNumber_airgas_text": "MIL0000002",
         "manufacturerPartNumber_text": None,
         "shortDescription_airgas_text": "welding helmet",
         "onlinePrice_string": "99.0",
         "img_270Wx270H_string": "/images/MIL0000002.jpg"},
    ]


def test_targz_scan(spark, tmp_path, product_docs):
    inner = tmp_path / "products.json"
    inner.write_text(json.dumps(product_docs))
    noise = tmp_path / "README.txt"
    noise.write_text("not json")
    archive = tmp_path / "products.tar.gz"
    with tarfile.open(archive, "w:gz") as tar:
        tar.add(inner, arcname="data/products.json")
        tar.add(noise, arcname="README.txt")

    rows = json_source.read_targz_json(spark, str(archive)).collect()
    assert len(rows) == 1  # only the .json member
    assert rows[0]["member"] == "data/products.json"
    parsed = json.loads(rows[0]["json_text"])
    assert parsed == product_docs


def test_import_full_then_delta(spark, tmp_path, product_docs):
    imp = tmp_path / "import"
    os.makedirs(imp)
    (imp / "batch.json").write_text(json.dumps(product_docs))
    table = str(tmp_path / "table")

    assert json_source.import_full(spark, str(imp), table) == 2

    # delta: one changed, one unchanged, one new
    changed = dict(product_docs[0], onlinePrice_string="25.0")
    new = dict(product_docs[1], _id="HYP0000003",
               partNumber_airgas_text="HYP0000003")
    (imp / "batch.json").write_text(json.dumps([changed, product_docs[1], new]))
    counts = json_source.import_delta(spark, str(imp), table)
    assert counts.get("update") == 1
    assert counts.get("insert") == 1
    assert "delete" not in counts  # absent rows are kept (no cleanup here)
    assert sum(counts.values()) == 2  # unchanged rows never flow downstream

    final = spark.read.parquet(table)
    assert final.count() == 3
    assert (
        final.filter(F.col("_id") == "RAD0000001").first()["onlinePrice_string"]
        == "25.0"
    )


def test_validate_documents_quarantine(spark, product_docs):
    docs = product_docs + [
        {"_id": None, "partNumber_airgas_text": None,
         "manufacturerPartNumber_text": None,
         "shortDescription_airgas_text": "orphan doc",
         "onlinePrice_string": None, "img_270Wx270H_string": None},
        {"_id": "NOTEXT01", "partNumber_airgas_text": "NOTEXT01",
         "manufacturerPartNumber_text": None,
         "shortDescription_airgas_text": "  ",
         "onlinePrice_string": None, "img_270Wx270H_string": None},
    ]
    df = spark.read.json(
        spark.sparkContext.parallelize([json.dumps(d) for d in docs])
    )
    valid, quarantine = json_source.validate_documents(df)
    assert valid.count() == 2
    assert quarantine.count() == 2
    assert set(r["_id"] for r in quarantine.collect()) == {None, "NOTEXT01"}


def test_bucketed_layout_prunes_partitions(spark, tmp_path):
    """I4/I5: the bucketed layout must (a) answer lookups identically to
    a plain filter and (b) carry a constant partition predicate so every
    other bucket directory is pruned before file I/O."""
    import re

    from vector_search_application_spark.plans import corpus
    from vector_search_application_spark.sources import layout

    prods = corpus.products(spark, SF_SMOKE)
    path = str(tmp_path / "bucketed")
    layout.write_bucketed(prods, path, "partNumber_airgas_text")

    q = prods.orderBy("id").first()["partNumber_airgas_text"]
    hit = layout.indexed_lookup(spark, path, "partNumber_airgas_text", q)
    expect = prods.filter(F.col("partNumber_airgas_text") == q)
    assert sorted(map(tuple, hit.select(*expect.columns).collect())) == sorted(
        map(tuple, expect.collect())
    )

    plan = hit._jdf.queryExecution().executedPlan().toString()
    # constraint propagation may add an inferred isnotnull(__bucket)
    # alongside the constant equality — only the equality matters
    m = re.search(r"PartitionFilters: \[[^\]]*\(__bucket#\d+ = \d+\)", plan)
    assert m, f"no constant partition filter in plan: {plan[:500]}"


def test_bucketed_upsert_rewrites_only_touched_buckets(spark, tmp_path):
    """M1 against the bucketed layout: the merge must (a) equal a full
    anti-join+union upsert and (b) leave untouched bucket directories'
    files byte-for-byte alone (dynamic partition overwrite)."""
    from vector_search_application_spark.plans import corpus
    from vector_search_application_spark.sources import layout

    prods = corpus.products(spark, SF_SMOKE)
    path = str(tmp_path / "bucketed")
    layout.write_bucketed(prods, path, "_id")

    def bucket_files():
        out = {}
        for d in os.listdir(path):
            if d.startswith("__bucket="):
                full = os.path.join(path, d)
                out[d] = sorted(
                    (f, os.path.getmtime(os.path.join(full, f)))
                    for f in os.listdir(full)
                    if f.endswith(".parquet")
                )
        return out

    before = bucket_files()

    # update two existing rows + insert one new key
    two = prods.orderBy("id").limit(2).withColumn(
        "onlinePrice_string", F.lit("999.99")
    )
    new = prods.orderBy("id").limit(1).withColumn(
        "_id", F.lit("BRANDNEW0000001")
    ).withColumn("partNumber_airgas_text", F.lit("BRANDNEW0000001"))
    updates = two.unionByName(new)

    final = layout.bucketed_upsert(spark, path, updates, "_id")

    # (a) semantics: equal to the full-table upsert
    from vector_search_application_spark.operators import mutations

    expect = mutations.upsert(prods, updates.drop("__bucket"), "_id")
    a = sorted(map(tuple, final.drop("__bucket").select(*expect.columns).collect()))
    b = sorted(map(tuple, expect.collect()))
    assert a == b

    # (b) physics: only the updates' buckets were rewritten
    touched = {
        f"__bucket={r['__bucket']}"
        for r in updates.withColumn(
            "__bucket", F.pmod(F.xxhash64(F.col("_id")), F.lit(layout.N_BUCKETS))
        ).select("__bucket").distinct().collect()
    }
    after = bucket_files()
    assert set(after) == set(before) | touched
    for d in set(before) - touched:
        assert after[d] == before[d], f"untouched bucket {d} was rewritten"
    for d in touched & set(before):
        assert after[d] != before[d]


def test_export_sharded_manifest(spark, tmp_path):
    """S6 scale path: distributed export writes a manifest whose row
    count, shard list, and key order describe the actual files; Spark
    ignores the _-prefixed manifest on read-back."""
    from vector_search_application_spark.plans import corpus

    prods = corpus.products(spark, SF_SMOKE)
    out = str(tmp_path / "export")
    path, n = json_source.export_documents_sharded(prods, out)
    assert n == prods.count()

    manifest = json.loads(open(os.path.join(out, "_MANIFEST.json")).read())
    assert manifest["rows"] == n
    on_disk = sorted(
        f for f in os.listdir(out) if f.startswith("part-") and f.endswith(".json")
    )
    assert manifest["shards"] == on_disk
    assert manifest["key_order"] == [
        c for c in json_source.PRODUCT_FIELDS if c in prods.columns
    ]
    # key order inside each shard follows the declared column order
    # (the JSON writer drops null fields, so present keys must be an
    # in-order subsequence of key_order)
    with open(os.path.join(out, on_disk[0])) as f:
        first = json.loads(f.readline())
    pos = {k: i for i, k in enumerate(manifest["key_order"])}
    idx = [pos[k] for k in first]
    assert idx == sorted(idx) and len(idx) > 0

    back = spark.read.json(out)  # manifest not parsed as data
    assert back.count() == n


def test_targz_scan_multiple_archives(spark, tmp_path, product_docs):
    """S2 over a directory glob: one task per archive, all inner .json
    members surfaced with their archive of origin."""
    for i in range(3):
        inner = tmp_path / f"products_{i}.json"
        inner.write_text(json.dumps([dict(product_docs[0], _id=f"DOC{i}")]))
        with tarfile.open(tmp_path / f"batch_{i}.tar.gz", "w:gz") as tar:
            tar.add(inner, arcname=f"data/products_{i}.json")

    rows = json_source.read_targz_json(spark, str(tmp_path / "*.tar.gz")).collect()
    assert len(rows) == 3
    assert {json.loads(r["json_text"])[0]["_id"] for r in rows} == {
        "DOC0", "DOC1", "DOC2"
    }
    assert len({r["archive"] for r in rows}) == 3


def test_indexed_lookup_numeric_key(spark, tmp_path):
    """Regression: the bucket predicate hashed the STRING query
    literal, so a lookup against a bigint-keyed layout pruned to a
    bucket that could not contain the row and silently returned
    empty. The literal must be cast to the stored key type first."""
    from vector_search_application_spark.sources import layout

    table = spark.range(50).select(
        F.col("id").alias("doc_id"), (F.col("id") * 2).alias("v")
    )
    path = str(tmp_path / "bucketed_numeric")
    layout.write_bucketed(table, path, "doc_id", n_buckets=8)
    hit = layout.indexed_lookup(spark, path, "doc_id", "5").collect()
    assert len(hit) == 1 and hit[0]["v"] == 10


def test_indexed_lookup_uses_stored_bucket_count(spark, tmp_path):
    """The bucket count is LAYOUT metadata: a table written with 8
    buckets must answer default-parameter lookups for EVERY key (the
    old free-parameter default of 16 pruned ~half the keys to a bucket
    that could not contain the row — silent empty results)."""
    from vector_search_application_spark.sources import layout

    table = spark.range(50).select(
        F.col("id").alias("doc_id"), (F.col("id") * 3).alias("v")
    )
    path = str(tmp_path / "bucketed_meta")
    layout.write_bucketed(table, path, "doc_id", n_buckets=8)
    assert layout.stored_n_buckets(spark, path) == 8
    for k in range(50):
        hit = layout.indexed_lookup(spark, path, "doc_id", str(k)).collect()
        assert len(hit) == 1 and hit[0]["v"] == 3 * k, k


def test_indexed_lookup_rejects_conflicting_bucket_count(spark, tmp_path):
    from vector_search_application_spark.sources import layout

    table = spark.range(10).select(F.col("id").alias("doc_id"))
    path = str(tmp_path / "bucketed_conflict")
    layout.write_bucketed(table, path, "doc_id", n_buckets=8)
    with pytest.raises(ValueError, match="n_buckets=8"):
        layout.indexed_lookup(spark, path, "doc_id", "1", n_buckets=16)


def test_extract_targz_same_named_members_and_stale_dir(spark, tmp_path):
    """Two members named data.json in different archive directories
    must BOTH survive extraction (basename flattening silently dropped
    one), and a second extraction into the same work dir must not glob
    the previous archive's members into the new import."""
    import tarfile

    from vector_search_application_spark.sources import json_source

    def make_archive(path, members):
        with tarfile.open(path, "w:gz") as tar:
            for name, docs in members.items():
                data = json.dumps(docs).encode()
                src = tmp_path / "stage.json"
                src.write_bytes(data)
                tar.add(str(src), arcname=name)

    a = tmp_path / "a.tar.gz"
    make_archive(a, {
        "x/data.json": [{"_id": "A1"}],
        "y/data.json": [{"_id": "B1"}, {"_id": "B2"}],
    })
    work = str(tmp_path / "work")
    got = json_source.import_targz(spark, str(a), work)
    assert got.count() == 3  # both data.json members survived

    b = tmp_path / "b.tar.gz"
    make_archive(b, {"z/only.json": [{"_id": "C1"}]})
    got2 = json_source.import_targz(spark, str(b), work)
    assert got2.count() == 1  # no phantom docs from archive A


def test_validate_documents_missing_column_quarantines(spark):
    """T5 must quarantine a batch whose text column is entirely absent
    from the inferred schema, not die resolving the missing column."""
    from vector_search_application_spark.sources import json_source

    df = spark.sql("SELECT * FROM VALUES ('D1'), ('D2') AS t(_id)")
    valid, quarantine = json_source.validate_documents(df)
    assert valid.count() == 0
    assert quarantine.count() == 2


def test_import_delta_reports_delete_candidates(spark, tmp_path):
    """Rows absent from the delta are classified but never deleted
    (reference parity): the report key must say so."""
    from vector_search_application_spark.sources import json_source

    table = str(tmp_path / "delta_table")
    spark.sql(
        "SELECT * FROM VALUES ('K1', 'one'), ('K2', 'two')"
        " AS t(_id, payload)"
    ).write.parquet(table)
    imp = tmp_path / "delta_in"
    imp.mkdir()
    (imp / "d.json").write_text(json.dumps([{"_id": "K1", "payload": "ONE"}]))
    counts = json_source.import_delta(spark, str(imp), table)
    assert counts.get("delete_candidates") == 1
    assert "delete" not in counts
    remaining = {r["_id"] for r in spark.read.parquet(table).collect()}
    assert remaining == {"K1", "K2"}  # K2 classified, NOT deleted


def test_indexed_lookup_rejects_wrong_key_col(spark, tmp_path):
    """key_col is LAYOUT metadata too: probing a doc_id-bucketed table
    on another column derives the bucket from the wrong hash and would
    silently return empty — must be a hard error instead."""
    from vector_search_application_spark.sources import layout

    table = spark.range(20).select(
        F.col("id").alias("doc_id"), (F.col("id") * 3).alias("v")
    )
    path = str(tmp_path / "bucketed_wrong_key")
    layout.write_bucketed(table, path, "doc_id")
    with pytest.raises(ValueError, match="bucketed on 'doc_id'"):
        layout.indexed_lookup(spark, path, "v", "9")
    with pytest.raises(ValueError, match="bucketed on 'doc_id'"):
        layout.bucketed_upsert(
            spark, path, table.limit(1), key_col="v"
        )
