"""Boundary behavior of the round-2 operators: session gap edges,
rank-pick median on even/odd groups, tar.gz path parity, IVF recall."""

import json
import os
import tarfile

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from vector_search_application_spark.plans import corpus


def test_sessionize_gap_boundary(spark, tmp_path):
    """An exactly-30-minute gap does NOT break a session (the break is
    strictly greater-than); one microsecond more does."""
    from vector_search_application_spark.plans.registry_streaming import (
        SESSION_GAP_US,
        q_event_sessionize,
    )

    # build a tiny events parquet with controlled gaps (ts stores
    # nanos; the inline * 1000 below converts from epoch-us)
    rows = [
        # user 1: gap exactly SESSION_GAP_US -> same session
        (1, 1, "a", 0),
        (2, 1, "a", SESSION_GAP_US * 1000),
        # user 2: gap SESSION_GAP_US + 1us -> two sessions
        (3, 2, "a", 0),
        (4, 2, "a", (SESSION_GAP_US + 1) * 1000),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, event_type string, ts bigint"
    )
    d = str(tmp_path / "sess_edge")
    os.makedirs(d)
    df.write.parquet(os.path.join(d, "events.parquet"))
    out = q_event_sessionize(spark, d)
    sessions = {
        r["user_id"]: r["n"]
        for r in out.groupBy("user_id").agg(
            F.countDistinct("session_no").alias("n")
        ).collect()
    }
    assert sessions == {1: 1, 2: 2}


def test_median_even_and_odd_groups(spark, tmp_path):
    """Lower median at rn = (n+1) div 2: odd group -> true middle,
    even group -> lower of the two middles."""
    from vector_search_application_spark.plans.registry_scalars import (
        q_event_value_median,
    )
    
    rows = [
        # odd group: values 1,2,3 -> median 2
        (1, "odd", 1.0), (2, "odd", 2.0), (3, "odd", 3.0),
        # even group: values 1,2,3,4 -> lower median 2
        (4, "even", 1.0), (5, "even", 2.0), (6, "even", 3.0), (7, "even", 4.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, event_type string, value double"
    )
    d = str(tmp_path / "median_edge")
    os.makedirs(d)
    df.write.parquet(os.path.join(d, "events.parquet"))
    got = {
        r["event_type"]: (r["n"], r["median_value"])
        for r in q_event_value_median(spark, d).collect()
    }
    assert got == {"odd": (3, 2.0), "even": (4, 2.0)}


def test_targz_paths_agree(spark, tmp_path):
    """The driver-side pre-extract (declared path) and the mapInPandas
    extractor (cluster path) must surface the same documents."""
    from vector_search_application_spark.sources import json_source

    docs = [{"doc_id": i, "text": f"doc {i}"} for i in range(6)]
    inner_a = tmp_path / "a.json"
    inner_a.write_text(json.dumps(docs[:3]))
    inner_b = tmp_path / "b.json"
    inner_b.write_text(json.dumps(docs[3:]))
    archive = tmp_path / "batch.tar.gz"
    with tarfile.open(archive, "w:gz") as tar:
        tar.add(inner_a, arcname="data/a.json")
        tar.add(inner_b, arcname="data/b.json")

    via_extract = json_source.import_targz(
        spark, str(archive), str(tmp_path / "work"),
        schema="doc_id bigint, text string",
    )
    got_a = sorted(map(tuple, via_extract.select("doc_id", "text").collect()))

    rows = json_source.read_targz_json(spark, str(archive)).collect()
    got_b = sorted(
        (d["doc_id"], d["text"])
        for r in rows
        for d in json.loads(r["json_text"])
    )
    assert got_a == got_b == sorted((d["doc_id"], d["text"]) for d in docs)


def test_ivf_recall_vs_exact(spark):
    """IVF with the default probe count must recover most of the exact
    top-10 on the fixture corpus (deterministic data -> stable bound)."""
    from vector_search_application_spark.operators import ann, topk
    from vector_search_application_spark.plans.constants import QUERY_VEC_ID

    vecs = corpus.vectors(spark, SF_SMOKE)
    q = corpus.query_vector(spark, SF_SMOKE, QUERY_VEC_ID)
    exact = {r["vec_id"] for r in topk.topk(
        topk.score_against_query(vecs, q), 10
    ).collect()}
    ivf = {r["id"] for r in ann.ivf_topk(vecs, q, k=10).collect()}
    recall = len(exact & ivf) / len(exact)
    assert recall >= 0.5, f"IVF recall@10 collapsed: {recall}"


def test_flat_with_norm_is_memoized_per_plan(spark):
    """Three registry plans flatten the same corpus: the projection
    must persist ONCE per (plan, params), and the memo must forget its
    entries at the release_all() boundary so it can never hand back a
    silently-uncached DataFrame."""
    from vector_search_application_spark.functions.cache import release_all
    from vector_search_application_spark.operators import topk

    release_all()
    df = spark.sql(
        "SELECT id AS vec_id, array(cast(id AS float), 1.0F) AS embedding"
        " FROM range(10)"
    )
    a = topk.flat_with_norm(df, "embedding", "a_", ["vec_id"], dim=2)
    b = topk.flat_with_norm(df, "embedding", "a_", ["vec_id"], dim=2)
    assert a is b  # second call reuses the persisted projection
    c = topk.flat_with_norm(df, "embedding", "b_", ["vec_id"], dim=2)
    assert c is not a  # different params -> different projection
    release_all()
    d = topk.flat_with_norm(df, "embedding", "a_", ["vec_id"], dim=2)
    assert d is not a  # memo cleared with the cache boundary
    release_all()
