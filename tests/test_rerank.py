"""MMR re-rank (operators/rerank.py): the engine result must equal the
python reference model exactly (deterministic greedy — never an
approximation), and actually diversify versus raw top-k."""

from vector_search_application_spark.operators import rerank, topk
from vector_search_application_spark.operators.ann import _py_cosine
from vector_search_application_spark.plans import corpus
from vector_search_application_spark.plans.constants import K, QUERY_VEC_ID

from tests.conftest import SF_SMOKE


def _candidates(spark):
    vecs = corpus.vectors(spark, SF_SMOKE)
    q = corpus.query_vector(spark, SF_SMOKE, QUERY_VEC_ID)
    cand_df = topk.topk(
        topk.score_against_query(vecs, q, extra_cols=["embedding"]),
        rerank.MMR_CANDIDATES,
    )
    return [
        (r["vec_id"], float(r["score"]), [float(x) for x in r["embedding"]])
        for r in cand_df.collect()
    ]


def test_mmr_matches_python_model_exactly(spark):
    got = [
        (r["rank"], r["vec_id"], r["score"], r["mmr"])
        for r in rerank.mmr_rerank(
            corpus.vectors(spark, SF_SMOKE),
            corpus.query_vector(spark, SF_SMOKE, QUERY_VEC_ID),
        ).collect()
    ]
    want = rerank.mmr_select(_candidates(spark))
    assert got == want
    # first pick is the raw argmax; ranks are 1..k
    assert got[0][0] == 1 and got[0][1] == QUERY_VEC_ID
    assert [r for r, *_ in got] == list(range(1, K + 1))


def test_mmr_diversifies_the_head(spark):
    """Mean pairwise similarity of the MMR selection must not exceed
    the raw top-k head's (lam < 1 trades relevance for diversity)."""
    cands = _candidates(spark)
    by_id = {cid: vec for cid, _, vec in cands}
    raw_ids = [cid for cid, _, _ in cands[:K]]
    mmr_ids = [cid for _, cid, _, _ in rerank.mmr_select(cands)]

    def mean_pairwise(ids):
        sims = [
            _py_cosine(by_id[a], by_id[b])
            for i, a in enumerate(ids)
            for b in ids[i + 1 :]
        ]
        return sum(sims) / len(sims)

    assert mean_pairwise(mmr_ids) <= mean_pairwise(raw_ids) + 1e-9


def test_mmr_lambda_one_is_plain_topk(spark):
    """lam = 1 removes the diversity term: selection must be the raw
    score order."""
    cands = _candidates(spark)
    got = [cid for _, cid, _, _ in rerank.mmr_select(cands, lam=1.0)]
    assert got == [cid for cid, _, _ in cands[:K]]
