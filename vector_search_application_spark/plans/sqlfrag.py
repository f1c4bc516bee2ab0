"""Reusable DuckDB SQL fragments for the oracle side of the registry.

These mirror the Spark operators in ``operators/`` exactly (same
constants, same rounding, same tie-breaks); see the parity conventions
in ``functions/portable.py``.
"""

from __future__ import annotations

from ..functions import portable as P
from .constants import BM25_B, BM25_K1


def postings_ctes(src: str = "documents", id_col: str = "doc_id",
                  text_col: str = "text") -> str:
    """CTEs: toks, tf, dl, postings, stats, dfreq over a text corpus."""
    return f"""
toks AS (
    -- NULL ids are unindexable (T5: the reference requires _id at
    -- upload); explicit here so the oracle matches the engine even
    -- though the dl equi-join below would drop them anyway
    SELECT {id_col} AS id,
           unnest({P.tokens_sql(text_col)}) AS term
    FROM {src}
    WHERE {id_col} IS NOT NULL
),
tf AS (SELECT id, term, count(*)::BIGINT AS tf FROM toks GROUP BY id, term),
dl AS (SELECT id, CAST(sum(tf) AS BIGINT) AS doc_len FROM tf GROUP BY id),
postings AS (SELECT tf.id, tf.term, tf.tf, dl.doc_len FROM tf JOIN dl USING (id)),
stats AS (SELECT count(*)::BIGINT AS n_docs, avg(doc_len) AS avgdl FROM dl),
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term)
""".strip()


def qterms_cte_literal(query_text: str) -> str:
    lit = query_text.replace("'", "''")
    return (
        "qt AS (SELECT DISTINCT unnest("
        + P.tokens_sql(f"'{lit}'")
        + ") AS term)"
    )


def bm25_scored_cte(k1: float = BM25_K1, b: float = BM25_B) -> str:
    """CTE ``bm25_scored(id, score)`` from postings/stats/dfreq/qt."""
    return f"""
bm25_matched AS (
    SELECT p.id,
           ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
           * (p.tf::DOUBLE * {k1 + 1.0})
             / (p.tf::DOUBLE + {k1} * ({1.0 - b} + {b} * p.doc_len::DOUBLE / s.avgdl))
               AS w
    FROM postings p
    JOIN qt USING (term)
    JOIN dfreq d USING (term)
    CROSS JOIN stats s
),
bm25_scored AS (
    SELECT id, {P.rounded_sql('sum(w)')} AS score
    FROM bm25_matched GROUP BY id
)
""".strip()


def dense_scored_cte(qvec_cte: str, src: str = "embeddings",
                     id_col: str = "vec_id", vec_col: str = "embedding") -> str:
    """CTEs ``q`` + ``dense_scored(id, score)``."""
    cos = P.cosine_sql(f"e.{vec_col}", "q.qvec")
    return f"""
q AS {qvec_cte},
dense_scored AS (
    SELECT e.{id_col} AS id, {P.rounded_sql(cos)} AS score
    FROM {src} e CROSS JOIN q
)
""".strip()


def ranked_branch_cte(name: str, source: str, branch_k: int) -> str:
    """CTE ``{name}_top(id, score, rank)`` — rank by (score DESC, id ASC)."""
    return f"""
{name}_top AS (
    SELECT id, score, rank FROM (
        SELECT id, score,
               row_number() OVER (ORDER BY score DESC, id ASC) AS rank
        FROM {source}
    ) WHERE rank <= {branch_k}
)
""".strip()
