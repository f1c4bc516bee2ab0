"""HTTP façade (§2.16): the reference's routes answered over real HTTP
by the stdlib shim, backed by the same Engine the library API exposes."""

import json
import urllib.parse
import urllib.request

from pyspark.sql import functions as F

import pytest

from tests.conftest import SF_SMOKE
from vector_search_application_spark.api import Engine
from vector_search_application_spark.http_shim import serve_background


@pytest.fixture(scope="module")
def served(spark):
    engine = Engine(spark, SF_SMOKE)
    server, base = serve_background(engine)
    yield engine, base
    server.shutdown()


def _get(url: str):
    with urllib.request.urlopen(url, timeout=60) as r:
        return r.status, json.loads(r.read())


def test_health_and_collections(served):
    engine, base = served
    status, body = _get(f"{base}/health")
    assert status == 200 and body["status"] == "healthy"
    assert body["document_count"] == engine.products.count()
    _, cols = _get(f"{base}/api/collections")
    assert cols["collections"][0]["points_count"] == body["document_count"]


def test_query_routes_match_engine(served):
    engine, base = served
    status, body = _get(f"{base}/api/query?q=large+widget&mode=dense&count=5")
    assert status == 200
    want = [r.asDict() for r in engine.query("large widget", "dense", 5).collect()]
    assert body["results"] == want
    assert body["count"] == len(want) and body["query"] == "large widget"

    status, _ = _get(f"{base}/api/search/fusion?q=large+widget")
    assert status == 200

    _, compare = _get(f"{base}/api/search/compare?q=blue+rod")
    assert set(compare["engines"]) == {"ultra_fast", "fusion", "lean"}

    _, stats = _get(f"{base}/api/search/performance-stats")
    assert stats["query_dense"]["count"] >= 1


def test_search_route_with_filter(served):
    engine, base = served
    # NON-NULL mfr (the hash-ordered first row is NULL for ~5% of
    # keys; a None would have ridden the URL as the literal 'None'
    # and matched nothing, passing the empty loop vacuously)
    row = (
        engine.products.filter(
            F.col("manufacturerPartNumber_text").isNotNull()
            & F.col("shortDescription_airgas_text").isNotNull()
        )
        .orderBy("id")
        .first()
    )
    mfr = row["manufacturerPartNumber_text"]
    # query with the row's own description so the (unique-mfr) row is
    # guaranteed into the inflated top-k the post-filter prunes
    status, body = _get(
        f"{base}/api/search?count=3"
        "&q=" + urllib.parse.quote(row["shortDescription_airgas_text"])
        + "&filter_field=manufacturerPartNumber_text&filter_value="
        + urllib.parse.quote(mfr)
    )
    assert status == 200
    assert body["results"], "filter route must match the seeded row"
    for r in body["results"]:
        assert r["Mfr Code"] == mfr


def test_errors(served):
    _, base = served
    status, body = _get_status(f"{base}/api/query?q=x&mode=bogus")
    assert status == 400 and "unknown mode" in body["error"]
    status, _ = _get_status(f"{base}/api/nope")
    assert status == 404

    req = urllib.request.Request(
        f"{base}/api/search/cache", method="DELETE"
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        assert r.status == 200
        assert "cleared" in json.loads(r.read())


def _get_status(url: str):
    try:
        return _get(url)
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_admin_routes(served, tmp_path):
    """S4 import + S6 export through the HTTP surface (the reference's
    admin.py routes) — and missing params answer 400, not 500."""
    engine, base = served

    out = tmp_path / "export.json"
    status, body = _get(f"{base}/api/export?path={out}")
    assert status == 200 and body["status"] == "completed"
    assert body["documents"] == engine.products.count()
    assert len(json.loads(out.read_text())) == body["documents"]

    imp = tmp_path / "import"
    imp.mkdir()
    (imp / "batch.json").write_text(json.dumps([
        {"_id": "HTTP0001", "partNumber_airgas_text": "HTTP0001",
         "shortDescription_airgas_text": "http imported doc"},
    ]))
    table = tmp_path / "table"
    status, body = _get(f"{base}/api/import?dir={imp}&table={table}")
    assert status == 200 and body["documents"] == 1

    status, body = _get_status(f"{base}/api/import?dir={imp}")
    assert status == 400 and "missing parameter" in body["error"]


def test_mode_twin_routes_match_engine(served):
    """/api/dense|sparse|hybrid are the reference's enhanced-search
    twins (search.py:436-533): same results as Engine.query in the
    corresponding mode, reference param spellings (query=, limit=)."""
    engine, base = served
    for mode in ("dense", "sparse", "hybrid"):
        status, body = _get(f"{base}/api/{mode}?query=large+widget&limit=4")
        assert status == 200
        want = [r.asDict() for r in engine.query("large widget", mode, 4).collect()]
        assert body["results"] == want
        assert body["method"] == mode and body["query"] == "large widget"
        assert "fields_searched" in body


def test_introspection_routes(served):
    _, base = served
    status, info = _get(f"{base}/api/methods-info")
    assert status == 200
    assert set(info["available_methods"]) == {"query", "dense", "sparse", "hybrid"}
    assert info["service_status"] == "available"
    status, t = _get(f"{base}/api/test")
    assert status == 200 and t["status"] == "success"
    assert t["details"]["search_methods"] == ["dense", "sparse", "hybrid"]


def test_load_data_route(served, tmp_path):
    """POST /api/load-data (reference app/main.py:106-160): JSON array
    body -> upload-file source -> T1/T2/T3 transform -> written table."""
    _, base = served
    docs = [
        {"partNumber_airgas_text": "LOAD0001",
         "shortDescription_airgas_text": "posted doc one"},
        {"partNumber_airgas_text": "LOAD0002",
         "shortDescription_airgas_text": "posted doc two"},
    ]
    table = tmp_path / "loaded"
    req = urllib.request.Request(
        f"{base}/api/load-data?table={table}",
        data=json.dumps(docs).encode(),
        method="POST",
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.status == 200
        body = json.loads(r.read())
    assert body["success"] is True and body["documents_loaded"] == 2

    bad = urllib.request.Request(
        f"{base}/api/load-data", data=b"not json{", method="POST"
    )
    try:
        urllib.request.urlopen(bad, timeout=60)
        raise AssertionError("expected 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "Invalid JSON" in json.loads(e.read())["error"]


def test_really_fast_optimize_and_stats_routes(served):
    """The three remaining §2.16 routes: really-fast (alias of
    ultra-fast — same rows), POST optimize (per-service warmup report),
    and per-collection stats (real counts where the reference hardcodes
    zeros)."""
    engine, base = served
    status, body = _get(f"{base}/api/search/really-fast?q=large+widget&count=5")
    assert status == 200
    want = [r.asDict() for r in engine.search_ultra_fast("large widget", 5).collect()]
    assert body["results"] == want

    req = urllib.request.Request(f"{base}/api/search/optimize", method="POST")
    with urllib.request.urlopen(req, timeout=60) as r:
        opt = json.loads(r.read())
    assert opt["status"] == "completed"
    assert set(opt["optimization_results"]) == {
        "search_service", "ultra_search_service",
        "lean_search_service", "really_fast_service",
    }
    for svc in opt["optimization_results"].values():
        assert svc["status"] == "optimized" and svc["rows_resident"] > 0

    _, stats = _get(f"{base}/api/collections/products/stats")
    assert stats["points_count"] == engine.products.count()
    assert stats["segments_count"] >= 1
    _, other = _get(f"{base}/api/collections/nope/stats")
    assert other["points_count"] == 0

    # really-fast gets its own perf-stats bucket, like the reference's
    # per-service tracking
    _, perf = _get(f"{base}/api/search/performance-stats")
    assert "really_fast" in perf


def test_load_data_absorbs_into_serving(served, tmp_path):
    """The reference's load-data upserts into the LIVE collection
    (app/main.py:106-160): a load that reports success must make the
    documents searchable through every subsequent search route, and
    visible in /health's document_count."""
    engine, base = served
    before = engine.products.count()
    docs = [
        {"partNumber_airgas_text": "ABSORB001",
         "shortDescription_airgas_text": "zyzzyva quokka flange bracket"},
    ]
    table = tmp_path / "absorbed"
    req = urllib.request.Request(
        f"{base}/api/load-data?table={table}",
        data=json.dumps(docs).encode(),
        method="POST",
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.status == 200

    status, health = _get(f"{base}/health")
    assert status == 200 and health["document_count"] == before + 1

    absorbed = engine.products.filter(
        engine.products["partNumber_airgas_text"] == "ABSORB001"
    ).collect()
    assert len(absorbed) == 1
    status, body = _get(
        f"{base}/api/search/ultra-fast?q=zyzzyva+quokka+flange&count=5"
    )
    assert status == 200
    assert absorbed[0]["id"] in [r["id"] for r in body["results"]]


def test_post_search_and_param_edges(served):
    """POST /api/search (the reference serves search over GET and POST,
    app/main.py:63-104), explicit-blank filter_value reaching the
    engine as '' instead of vanishing, and malformed count only
    failing routes that read it."""
    engine, base = served
    req = urllib.request.Request(
        f"{base}/api/search",
        data=json.dumps({"q": "large widget", "count": 3}).encode(),
        method="POST",
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.status == 200
        body = json.loads(r.read())
    assert body["query"] == "large widget" and body["count"] <= 3

    # explicit empty filter_value: a legitimate filter for "", not a 400
    status, body = _get(
        f"{base}/api/search?q=widget&count=3"
        f"&filter_field=manufacturerPartNumber_text&filter_value="
    )
    assert status == 200 and body["count"] == 0

    # malformed count must not break routes that never read it
    status, _ = _get(f"{base}/health?count=abc")
    assert status == 200
    try:
        _get(f"{base}/api/query?q=x&count=abc")
        raise AssertionError("expected 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_search_has_own_ema_bucket(served):
    """/api/search is the reference's search_service with its own EMA
    (search_service.py:253-254): it must fill a 'search' bucket, not
    inflate ultra_fast/fusion via its internal plumbing."""
    engine, base = served
    before = engine.performance_stats()
    ultra_before = before.get("ultra_fast", {}).get("count", 0)
    _get(f"{base}/api/search?q=widget&count=2")
    after = engine.performance_stats()
    assert after["search"]["count"] >= 1
    assert after.get("ultra_fast", {}).get("count", 0) == ultra_before


def test_concurrent_queries_during_absorb(served, tmp_path):
    """The served engine's swap contract under REAL threaded HTTP
    traffic: hybrid and dense queries hammer the server while a
    load-data absorbs a new table; no request may error (stale dense
    hits joined against a replaced corpus would surface as missing-id
    join rows or FileNotFound on the overwritten table), and the
    absorbed rows must be searchable immediately after."""
    import threading

    _, base = served
    errs: list[Exception] = []
    # the POST below completes only after the absorb returns, so looping
    # the hammer until `done` is set guarantees query traffic actually
    # overlaps the read-merge-swap (a fixed request count could drain
    # before the absorb even starts, making the assertion vacuous)
    done = threading.Event()

    def hammer():
        try:
            while not done.is_set():
                _get(f"{base}/api/search/ultra-fast?q=widget&count=3")
                _get(f"{base}/api/query?q=hammer%20probe&mode=hybrid&count=5")
        except Exception as e:  # pragma: no cover - failure evidence
            errs.append(e)

    threads = [threading.Thread(target=hammer) for _ in range(3)]
    for t in threads:
        t.start()
    docs = [
        {"partNumber_airgas_text": f"HAM000000{i}",
         "shortDescription_airgas_text": f"hammer probe widget {i}"}
        for i in range(3)
    ]
    table = tmp_path / "hammer_table"
    req = urllib.request.Request(
        f"{base}/api/load-data?table={table}",
        data=json.dumps(docs).encode(),
        method="POST",
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=300) as r:
            assert json.loads(r.read())["documents_loaded"] == 3
    finally:
        done.set()
        for t in threads:
            t.join()
    assert not errs, errs
    status, hits = _get(
        f"{base}/api/query?q=hammer%20probe%20widget&mode=sparse&count=5"
    )
    assert status == 200
    rows = hits if isinstance(hits, list) else hits.get("results", [])
    assert len(rows) > 0


def test_repeated_import_cycles_stay_serving(served, tmp_path):
    """The regression shape behind r7's _absorb_locked fix (r7
    ADVICE/VERDICT, carried as r8 task 5): import -> importdelta ->
    same-table RE-import -> search, three full cycles against ONE
    table_dir. The pre-fix code (a) pinned the first import's file
    listing for table_dir, so the re-import's overwrite made every
    later read throw FileNotFoundException, and (b) leaked one
    persisted postings table per absorb. Asserts every route keeps
    answering, each cycle's docs are searchable, and the Spark-side
    persisted-RDD count settles (steady state after cycle 1, no
    per-cycle growth)."""
    engine, base = served
    imp = tmp_path / "imp"
    imp.mkdir()
    table = tmp_path / "table"
    cache_counts = []
    for cycle in range(3):
        # the searchable token set is the SAME every cycle: the search
        # below reuses one query string, so the query-embed LRU adds
        # exactly one entry on cycle 0 and the cache count can settle
        (imp / "batch.json").write_text(json.dumps([
            {"_id": f"CYC{cycle}A", "partNumber_airgas_text": f"CYC{cycle}A",
             "shortDescription_airgas_text": f"xylophone widget cycle{cycle}"},
            {"_id": f"CYC{cycle}B", "partNumber_airgas_text": f"CYC{cycle}B",
             "shortDescription_airgas_text": f"zeppelin bracket cycle{cycle}"},
        ]))
        status, body = _get(f"{base}/api/import?dir={imp}&table={table}")
        assert status == 200 and body["documents"] == 2, (cycle, body)
        status, body = _get(f"{base}/api/importdelta?dir={imp}&table={table}")
        assert status == 200, (cycle, body)
        status, body = _get(f"{base}/api/import?dir={imp}&table={table}")
        assert status == 200 and body["documents"] == 2, (cycle, body)

        absorbed = engine.products.filter(
            engine.products["partNumber_airgas_text"] == f"CYC{cycle}A"
        ).collect()
        assert len(absorbed) == 1, f"cycle {cycle} doc not absorbed"
        status, body = _get(
            f"{base}/api/search/ultra-fast?q=xylophone+widget&count=8"
        )
        assert status == 200, (cycle, body)
        assert absorbed[0]["id"] in [r["id"] for r in body["results"]], cycle
        cache_counts.append(_settled_rdd_count(engine.spark))
    # steady state: the 2nd and 3rd cycles must not grow the cache —
    # a per-cycle growth here is exactly the postings leak the fix
    # closed (pre-fix: +1 persisted postings table per absorb, never
    # freed)
    assert cache_counts[1] == cache_counts[2], cache_counts


def _settled_rdd_count(spark) -> int:
    """Persisted-RDD count after letting the ContextCleaner drain:
    superseded localCheckpoint RDDs are freed asynchronously (Python
    GC drops the py4j ref -> JVM weak-ref queue -> cleaner thread), so
    poll until the count stops falling. Without the settle this
    metric double-counts every superseded checkpoint still awaiting a
    JVM GC cycle."""
    import gc as _gc
    import time as _time

    jsc = spark.sparkContext._jsc
    _gc.collect()
    # several unconditional GC rounds: one System.gc() + 0.5s is often
    # not enough for the weak-ref -> cleaner-queue -> unpersist chain
    # to drain (measured: an early-exit poll read pre-cleanup counts)
    for _ in range(6):
        spark.sparkContext._jvm.System.gc()
        _time.sleep(0.5)
    prev = jsc.getPersistentRDDs().size()
    for _ in range(14):
        spark.sparkContext._jvm.System.gc()
        _time.sleep(0.5)
        cur = jsc.getPersistentRDDs().size()
        if cur >= prev:
            return cur
        prev = cur
    return prev
