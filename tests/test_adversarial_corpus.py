"""Registry queries replayed over a synthetic ADVERSARIAL documents
corpus — unicode, empty/whitespace-only text, exact duplicate texts,
single-token docs — with the DuckDB oracle reading the same parquet.

The driver's gate runs the registry over the well-behaved testdata
corpora; this pins cross-engine parity on the inputs a real 100 TB
crawl actually contains. Queries that only touch `documents` can be
pointed at any sf_dir, which is what makes this reuse the declared
plans verbatim.
"""

import os

import duckdb
import pytest

from tests.conftest import compare_spark_duckdb
from vector_search_application_spark.plans.registry import REGISTRY

ADVERSARIAL_DOCS = [
    # (doc_id, text, lang, source, n_chars)
    (0, "the quick brown fox jumps over the lazy dog", "en", "web", 43),
    (1, "", "en", "web", 0),
    (2, "   \t  ", "en", "web", 6),
    (3, "naïve café résumé — émigré über straße", "fr", "web", 38),
    (4, "日本語のテキスト 中文文本 한국어", "ja", "web", 17),
    (5, "emoji 😀😀 and symbols @#$%^&*() mixed 123", "en", "web", 40),
    (6, "single", "en", "web", 6),
    (7, "the quick brown fox jumps over the lazy dog", "en", "crawl", 43),  # dup of 0
    (8, "UPPER lower MiXeD case TOKENS tokens", "en", "web", 36),
    (9, "a b a b a b a b a b a b a b", "en", "web", 27),
    (10, "x" * 500, "en", "web", 500),
    (15, "tab\tseparated\nnewline\rcarriage", "en", "web", 30),
    (20, "numbers 12345 67890 0 00 000", "en", "web", 28),
    (25, "the the the the the the the the", "en", "web", 31),
]

DOC_QUERIES = [
    "text_quality",
    "token_stats",
    "text_langid",
    "doc_fingerprint",
    "dedup_exact",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "corpus_counts",
    # round-4 curation family (documents-only plans)
    "doc_chunk_windows",
    "boilerplate_ngrams",
    "temperature_mixture",
    "epoch_shuffle",
    "chunk_embed_pool",
    "source_data_card",
    "mixture_sample",
    "retrieval_manifest",
    "training_manifest_full",
    "bpe_train_merges",
    "bpe_encode_stats",
    # round-5 sweep: every remaining documents-only plan, including the
    # streaming dedup-at-ingest (the corpus's real dup pair exercises
    # the anti-join alongside the seeded clique)
    "text_repetition",
    "text_pii_scrub",
    "dataset_split",
    "dataset_split_balance",
    "deterministic_sample",
    "vocab_topn",
    "sequence_pack",
    "quality_filter_funnel",
    "source_length_quantiles",
    "token_accounting_rollup",
    "domain_mix_weights",
    "benchmark_decontaminate",
    "training_manifest",
    "stream_dedup_ingest",
]


@pytest.fixture(scope="module")
def adversarial_dir(tmp_path_factory):
    from vector_search_application_spark.session import get_spark

    spark = get_spark("tests")
    d = str(tmp_path_factory.mktemp("adversarial_sf"))
    spark.createDataFrame(
        ADVERSARIAL_DOCS, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    return d


@pytest.mark.parametrize("name", DOC_QUERIES)
def test_adversarial_documents_parity(spark, adversarial_dir, name):
    decl = next((d for d in REGISTRY if d.name == name), None)
    if decl is None:
        pytest.skip(f"{name} not in registry")
    con = duckdb.connect()
    # Spark writes <name>.parquet as a directory of part files
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{adversarial_dir}/documents.parquet/*.parquet')"
    )
    sdf = decl.spark(spark, adversarial_dir)
    compare_spark_duckdb(sdf, con, decl.sql)


# --- embeddings: zero / identical / constant / antiparallel vectors ------

DIM = 64
VEC_QUERIES = ["dense_topk", "dense_topk_batch", "dense_topk_batch_salted",
               "quantized_topk", "embedding_neardup", "dense_threshold",
               # round-4: PQ family (the zero vector becomes a codeword —
               # distances to it and from it must agree cross-engine) and
               # SemDeDup (zero-norm centroid scores 0.0 everywhere)
               "pq_topk", "pq_topk_batch", "ivfpq_topk", "semantic_dedup"]


def _vec(seed: float) -> list[float]:
    return [float(((i * 31 + 7) % 13) - 6) * seed for i in range(DIM)]


ADVERSARIAL_VECS = [
    # vec_id 0 is the fixed query vector (QUERY_VEC_ID = 0)
    (0, _vec(1.0), "q"),
    (1, [0.0] * DIM, "zero"),          # zero norm -> score must be 0.0
    (2, _vec(1.0), "dup"),             # identical to the query (cos 1)
    (3, _vec(-1.0), "anti"),           # antiparallel (cos -1)
    (4, _vec(0.001), "tiny"),          # same direction, tiny magnitude
    (5, [1.0] * DIM, "const"),         # constant vector
    (6, [0.0] * (DIM - 1) + [1.0], "axis"),
    (10, _vec(2.5), "scaled"),         # vec_id%10==0 -> neardup synth doubles it
]


@pytest.fixture(scope="module")
def adversarial_vec_dir(tmp_path_factory):
    from vector_search_application_spark.session import get_spark

    spark = get_spark("tests")
    d = str(tmp_path_factory.mktemp("adversarial_vec_sf"))
    spark.createDataFrame(
        [(i, [float(x) for x in v], lbl) for i, v, lbl in ADVERSARIAL_VECS],
        "vec_id long, embedding array<float>, label string",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "embeddings.parquet"))
    return d


@pytest.mark.parametrize("name", VEC_QUERIES)
def test_adversarial_embeddings_parity(spark, adversarial_vec_dir, name):
    decl = next((d for d in REGISTRY if d.name == name), None)
    if decl is None:
        pytest.skip(f"{name} not in registry")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM read_parquet("
        f"'{adversarial_vec_dir}/embeddings.parquet/*.parquet')"
    )
    sdf = decl.spark(spark, adversarial_vec_dir)
    compare_spark_duckdb(sdf, con, decl.sql)


# --- events: timestamp ties, boundary gaps, reversed id order, epoch 0 ---

from datetime import datetime, timedelta

_T0 = datetime(2024, 3, 1, 12, 0, 0)
_MIN = timedelta(minutes=1)
_US = timedelta(microseconds=1)

ADVERSARIAL_EVENTS = [
    # (event_id, ts, user_id, event_type, value, props)
    # user 1: three events with IDENTICAL timestamps — every ordering
    # falls to the event_id tie-break (sessionize, sliding frame, asof)
    (100, _T0, 1, "view", 1.0, '{"k": 1}'),
    (101, _T0, 1, "view", 2.0, '{"k": 2}'),
    (102, _T0, 1, "purchase", 3.0, '{"k": -5}'),
    # user 2: gap exactly == the 30-min session gap (stays in session:
    # the split condition is strict >), then gap+1us (new session)
    (200, _T0, 2, "click", -1.5, "{}"),
    (201, _T0 + 30 * _MIN, 2, "view", 0.0, '{"k": 0}'),
    (202, _T0 + 60 * _MIN + _US, 2, "view", 4.25, None),
    # user 3: single event (1-event session, window frames of size 1)
    (300, _T0, 3, "signup", 10.0, '{"k": 7}'),
    # user 4: purchase EXACTLY the funnel window after the first click
    # (boundary is inclusive -> converts)
    (400, _T0, 4, "click", 1.0, '{"k": 3}'),
    (401, _T0 + 60 * _MIN, 4, "purchase", 2.0, '{"k": 4}'),
    # user 5: purchase one microsecond past the window (no conversion)
    (500, _T0, 5, "click", 1.0, '{"k": 1}'),
    (501, _T0 + 60 * _MIN + _US, 5, "purchase", 2.0, '{"k": 1}'),
    # user 6: purchase with no preceding view (asof NULL branch)
    (600, _T0, 6, "purchase", 5.0, '{"k": 9}'),
    # user 7: event_id order OPPOSES time order
    (702, _T0, 7, "view", 1.0, '{"k": 2}'),
    (701, _T0 + _MIN, 7, "view", 2.0, '{"k": 2}'),
    (700, _T0 + 2 * _MIN, 7, "purchase", 3.0, '{"k": 2}'),
    # user 8: the epoch itself as an event time
    (800, datetime(1970, 1, 1, 0, 0, 0), 8, "error", -3.25, '{"k": 0}'),
]

EVENT_QUERIES = [
    "event_sessionize",
    "event_funnel",
    "event_asof_join",
    "event_value_median",
    "event_props_agg",
    "event_sliding_avg",
    "version_current",
]


@pytest.fixture(scope="module")
def adversarial_event_dir(tmp_path_factory):
    from vector_search_application_spark.session import get_spark

    spark = get_spark("tests")
    d = str(tmp_path_factory.mktemp("adversarial_ev_sf"))
    spark.createDataFrame(
        ADVERSARIAL_EVENTS,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    return d


@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_adversarial_events_parity(spark, adversarial_event_dir, name):
    decl = next((d for d in REGISTRY if d.name == name), None)
    if decl is None:
        pytest.skip(f"{name} not in registry")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet("
        f"'{adversarial_event_dir}/events.parquet/*.parquet')"
    )
    sdf = decl.spark(spark, adversarial_event_dir)
    compare_spark_duckdb(sdf, con, decl.sql)


def test_adversarial_events_semantics(spark, adversarial_event_dir):
    """Direct assertions on the planted edges (parity alone would pass
    if both engines were wrong the same way on OUR formulations)."""
    from vector_search_application_spark.plans.registry import REGISTRY as R

    by = {d.name: d.spark for d in R}
    sess = by["event_sessionize"](spark, adversarial_event_dir).collect()
    per_user = {}
    for r in sess:
        per_user.setdefault(r.user_id, []).append(r)
    # user 2: the exactly-30min gap stays in one session; +1us splits
    assert len(per_user[2]) == 2
    # user 1: identical timestamps collapse into one session
    assert len(per_user[1]) == 1 and per_user[1][0].n_events == 3
    fun = {r.user_id: r.converted
           for r in by["event_funnel"](spark, adversarial_event_dir).collect()}
    assert fun[4] is True    # boundary-inclusive conversion
    assert fun[5] is False   # one microsecond late
    asof = {r.event_id: r.view_event_id
            for r in by["event_asof_join"](spark, adversarial_event_dir).collect()}
    assert asof[102] == 101  # same-ts view visible, highest event_id wins
    assert asof[600] is None  # no preceding view
    assert asof[700] == 701   # time order beats id order


# --- part/products: NULL brands, unicode, empties, extreme prices ---------

# partNumber derives from p_brand + p_partkey, so a NULL brand NULLs the
# primary payload key (and the md5-derived id); NULL/empty names empty
# the sparse/dense text; unicode brands exercise the upper()/replace()
# cleanup on both engines. Every modulo-NULL the synthesis defines also
# fires (partkey 20 -> mfr NULL, 57 -> desc NULL, 3 -> img NULL).
ADVERSARIAL_PARTS = [
    # (p_partkey, p_name, p_brand, p_type, p_size, p_retailprice)
    (1, "plain widget", "Brand#1", "ECONOMY", 1, 10.0),
    (2, None, "Brand#2", "STANDARD", 2, 20.0),          # NULL name
    (3, "", "Brand#3", "STANDARD", 3, 30.0),            # empty name (img-null mod)
    (4, "unicode nameé straße", "Bränd#4", "DELUXE", 4, 40.0),
    (5, "no brand part", None, "ECONOMY", 5, 50.0),     # NULL brand -> NULL pn/id
    (6, "a", "Brand#6", "ECONOMY", 6, 0.0),             # zero price
    (7, "negative price", "Brand#7", "ECONOMY", 7, -1.5),
    (20, "mfr null mod", "Brand#20", "STANDARD", 8, 60.004),  # partkey%20==0
    (57, "desc null mod", "Brand#57", "STANDARD", 9, 1e9),    # partkey%50==7
    (123, "shared brand", "Brand#1", "ECONOMY", 10, 70.0),
]

PART_QUERIES = [
    "ingest_products",
    "validate_quarantine",
    "partno_classifier",
    "partno_explain",
    "exact_cascade_primary",
    "exact_cascade_secondary",
    "exact_cascade_miss",
    "exact_cascade_batch",
    "fusion_max_dedup",
    "fusion_max_dedup_batch",
    "search_details_projection",
    "search_ids_projection",
]


@pytest.fixture(scope="module")
def adversarial_part_dir(tmp_path_factory):
    from vector_search_application_spark.session import get_spark

    spark = get_spark("tests")
    d = str(tmp_path_factory.mktemp("adversarial_part_sf"))
    spark.createDataFrame(
        ADVERSARIAL_PARTS,
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "part.parquet"))
    return d


@pytest.mark.parametrize("name", PART_QUERIES)
def test_adversarial_parts_parity(spark, adversarial_part_dir, name):
    decl = next((d for d in REGISTRY if d.name == name), None)
    if decl is None:
        pytest.skip(f"{name} not in registry")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW part AS SELECT * FROM read_parquet("
        f"'{adversarial_part_dir}/part.parquet/*.parquet')"
    )
    sdf = decl.spark(spark, adversarial_part_dir)
    compare_spark_duckdb(sdf, con, decl.sql)


# --- lineitem/orders: money-math boundaries, dangling keys, date edge -----

from datetime import datetime as _dt2

_CUTOFF = _dt2(1998, 9, 2)

ADVERSARIAL_LINEITEM = [
    # (l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
    #  l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
    #  l_shipdate)
    (1, 1, 1, 1, 1.0, 0.125, 0.0, 0.0, "N", "O", _dt2(1998, 1, 1)),   # 12.5 cents: exact .5 boundary
    (1, 2, 1, 2, 2.0, 0.005, 0.01, 0.02, "N", "O", _dt2(1998, 1, 2)),  # sub-cent price
    (2, 3, 2, 1, None, 100.0, 0.05, 0.03, "A", "F", _dt2(1997, 6, 1)),  # NULL quantity
    (2, 4, 2, 2, 3.0, 0.0, 0.06, 0.0, "A", "F", _dt2(1997, 6, 2)),    # zero price
    (3, 5, 3, 1, 4.0, 1e9, 0.01, 0.08, "R", "F", _dt2(1996, 1, 1)),   # extreme price
    (4, 6, 3, 1, 5.0, 50.0, 0.02, 0.01, "N", "O", _CUTOFF),           # exactly AT the cutoff (kept: <=)
    (5, 7, 4, 1, 6.0, 60.0, 0.03, 0.02, "N", "O",
     _dt2(1998, 9, 3)),                                               # one day past (dropped)
    (99, 8, 4, 1, 7.0, 70.0, 0.04, 0.03, "N", "O",
     _dt2(1998, 1, 3)),                                               # orderkey with NO orders row
    # --- rows exercising the r6 join family (Q4/Q5/Q10 shapes) ---
    (6, 9, 1, 1, 2.0, 0.125, 0.0, 0.0, "N", "O", _dt2(1996, 4, 14)),  # ship = orderdate+30 EXACTLY: strict > excludes
    (6, 9, 2, 2, 1.0, 200.0, 0.10, 0.0, "R", "F", _dt2(1996, 4, 15)),  # +31 days: late; supplier nation != customer nation
    (7, 10, 4, 1, 1.0, 30.0, 0.0, 0.0, "N", "O", _dt2(1996, 8, 31)),  # +30 exactly again (Aug 1 + 30)
    (7, 10, 1, 2, 1.0, 40.0, 0.02, 0.01, "N", "O", _dt2(1996, 9, 15)),  # +45: late
    (7, 10, 1, 3, 1.0, 45.0, 0.0, 0.0, "N", "O", _dt2(1996, 9, 20)),  # SECOND late row: semi-join must not double-count
    (8, 11, 3, 1, 1.0, 15.0, 0.0, 0.0, "N", "O", _dt2(1996, 9, 5)),   # in quarter, never late
    (9, 12, 5, 1, 1.0, 500.0, 0.25, 0.0, "R", "F", _dt2(1997, 3, 1)),  # Q10: returned revenue
    (9, 12, 5, 2, 1.0, 999.0, 0.0, 0.0, "N", "O", _dt2(1997, 3, 2)),  # Q10: non-returned, excluded
    (10, 13, 77, 1, 1.0, 80.0, 0.0, 0.0, "R", "F", _dt2(1996, 5, 1)),  # l_suppkey with NO supplier row
]

ADVERSARIAL_ORDERS = [
    # (o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
    #  o_orderpriority)
    (1, 10, "O", 0.13, _dt2(1997, 12, 30), "1-URGENT"),
    (2, 10, "F", 100.0, _dt2(1997, 5, 30), "2-HIGH"),   # same customer, 2 orders
    (3, 11, "F", 1e9, _dt2(1995, 12, 30), "3-MEDIUM"),
    (4, 12, "O", 50.0, _dt2(1998, 8, 30), "4-NOT SPECIFIED"),
    (5, 13, "O", 60.0, _dt2(1998, 9, 1), "5-LOW"),
    (42, 14, "O", 1.0, _dt2(1998, 1, 1), "1-URGENT"),   # order with NO lineitems
    # --- r6 join family ---
    (6, 10, "O", 100.0, _dt2(1996, 3, 15), "1-URGENT"),  # Q5 year, ASIA customer
    (7, 11, "F", 100.0, _dt2(1996, 8, 1), "2-HIGH"),     # Q4 quarter, two late rows
    (8, 11, "O", 15.0, _dt2(1996, 9, 1), "3-MEDIUM"),    # Q4 quarter, never late
    (9, 12, "O", 1499.0, _dt2(1997, 2, 1), "5-LOW"),     # Q10 quarter
    (10, 13, "O", 80.0, _dt2(1996, 5, 1), "4-NOT SPECIFIED"),  # customer has NULL nationkey
]

ADVERSARIAL_CUSTOMER = [
    # (c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)
    (10, "Customer#000000010", 1, 0.0, "BUILDING"),
    (11, "Customer#000000011", 2, -5.5, "MACHINERY"),   # negative balance
    (12, "Customer#000000012", 3, 1e7, "AUTOMOBILE"),
    (13, "Customer#000000013", None, 1.0, "HOUSEHOLD"),  # NULL nationkey: must drop at the dim join in BOTH engines
    (14, "Customer#000000014", 99, 2.0, "BUILDING"),    # nationkey with NO nation row
]

ADVERSARIAL_NATION = [
    (1, "NATION_A", 1), (2, "NATION_B", 2), (3, "NATION_C", 1),
]

ADVERSARIAL_REGION = [(1, "ASIA"), (2, "EUROPE")]

ADVERSARIAL_SUPPLIER = [
    # (s_suppkey, s_name, s_nationkey, s_acctbal)
    (1, "Supplier#1", 1, 0.0),
    (2, "Supplier#2", 2, 1.0),
    (3, "Supplier#3", 1, 2.0),
    (4, "Supplier#4", 3, 3.0),
    (5, "Supplier#5", 1, 4.0),
]

TPCH_QUERIES = [
    "lineitem_pricing_summary", "top_customer_revenue",
    "revenue_by_nation", "order_priority_semijoin",
    "local_supplier_revenue", "returned_item_report",
]


@pytest.fixture(scope="module")
def adversarial_tpch_dir(tmp_path_factory):
    from vector_search_application_spark.session import get_spark

    spark = get_spark("tests")
    d = str(tmp_path_factory.mktemp("adversarial_tpch"))
    spark.createDataFrame(
        ADVERSARIAL_LINEITEM,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "lineitem.parquet"))
    spark.createDataFrame(
        ADVERSARIAL_ORDERS,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "orders.parquet"))
    spark.createDataFrame(
        ADVERSARIAL_CUSTOMER,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "customer.parquet"))
    spark.createDataFrame(
        ADVERSARIAL_NATION, "n_nationkey int, n_name string, n_regionkey int"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "nation.parquet"))
    spark.createDataFrame(
        ADVERSARIAL_REGION, "r_regionkey int, r_name string"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "region.parquet"))
    spark.createDataFrame(
        ADVERSARIAL_SUPPLIER,
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "supplier.parquet"))
    return d


@pytest.mark.parametrize("name", TPCH_QUERIES)
def test_adversarial_tpch_parity(spark, adversarial_tpch_dir, name):
    """Money-math boundaries (a 12.5-cent exact-half rounding, sub-cent
    and 1e9 prices, NULL quantity), the shipdate cutoff inclusive edge,
    a lineitem with no orders row (inner-join drop), an order with no
    lineitems, a customer with a NULL nationkey, a nationkey with no
    nation row, a suppkey with no supplier row, the semi-join's
    +30-days strict-inequality boundary, and an order with TWO late
    lineitems (must count once) must all agree cross-engine."""
    decl = next((d for d in REGISTRY if d.name == name), None)
    if decl is None:
        pytest.skip(f"{name} not in registry")
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "nation", "region",
              "supplier"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet("
            f"'{adversarial_tpch_dir}/{t}.parquet/*.parquet')"
        )
    sdf = decl.spark(spark, adversarial_tpch_dir)
    compare_spark_duckdb(sdf, con, decl.sql)


def test_adversarial_tpch_semantics(spark, adversarial_tpch_dir):
    """Pinned expectations the parity check alone can't distinguish
    from a shared bug: the semi-join counts order 7 ONCE despite two
    late lineitems and excludes both exactly-+30-day shipments; only
    the ASIA-nation 1996 revenue survives the Q5 dim chain; the
    returned-item report keeps only the R-flag row."""
    by = {d.name: d for d in REGISTRY}
    semi = {
        r["o_orderpriority"]: r["order_count"]
        for r in by["order_priority_semijoin"].spark(
            spark, adversarial_tpch_dir
        ).collect()
    }
    assert semi == {"2-HIGH": 1}  # order 7 once; order 8 never late
    rev = by["revenue_by_nation"].spark(spark, adversarial_tpch_dir).collect()
    assert [r["n_name"] for r in rev] == ["NATION_A"]
    # order 6 only: 0.125 -> 13 cents (HALF_UP at the .5 boundary, both
    # engines) with 0% discount, plus 200.00 at 10%: (13*100 +
    # 20000*90) / 10000 dollars
    assert rev[0]["n_orders"] == 1
    assert rev[0]["revenue"] == 180.13
    ret = by["returned_item_report"].spark(spark, adversarial_tpch_dir).collect()
    assert len(ret) == 1 and ret[0]["c_custkey"] == 12
    assert ret[0]["revenue"] == 375.0  # 50000 cents * (100-25)bp / 1e4
