"""Pluggable embedding stage (SURVEY.md §2.3 E1): mapInPandas over
Arrow batches, the Spark shape of the reference's batched parallel
embedding loop (reference scripts/indexing.py:445-512 — batch<=8192,
2 workers -> here: one Arrow batch per task, executors in parallel,
model loaded once per Python worker).

Two backends:
  - "onnx": fastembed's BAAI/bge-small-en-v1.5, the reference's
    production model (reference app/config/config.py:43). Not installed
    in this environment — import-gated; raises a clear error if
    requested without the package.
  - "hash" (default): the deterministic signed-hash projection,
    bit-compatible with functions/embedder.py's JVM/SQL implementation
    (verified in tests/test_embed_udf.py), so the distributed plumbing
    is exercised without the model weights.

Output is posting form (id, dim, comp) — identical schema to the
declarative embedder, so downstream search plans are backend-agnostic.
"""

from __future__ import annotations

import hashlib
import math
import re
from typing import Iterator

from pyspark.sql import DataFrame

from ..plans.constants import HASH_EMBED_DIM
from .ann import _round_half_up

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def _hash_embed_one(text: str, dim: int) -> dict[int, float]:
    """Python twin of functions/embedder.py (md5 low-60-bit hash,
    dim = h mod dim, sign = bit 6). Must stay in lockstep."""
    raw: dict[int, float] = {}
    for term in _TOKEN_RE.findall(text.lower()):
        h = int(hashlib.md5(term.encode()).hexdigest()[:15], 16)
        d = h % dim
        sign = 1.0 if (h >> 6) % 2 == 0 else -1.0
        raw[d] = raw.get(d, 0.0) + sign
    nrm = math.sqrt(sum(v * v for v in raw.values()))
    if nrm > 0:
        # Spark ROUND is HALF_UP over the shortest decimal repr; Python
        # round() is banker's — exact halfway values (e.g. 1/128) would
        # silently diverge from the declarative embedder
        return {d: _round_half_up(v / nrm) for d, v in raw.items()}
    return {d: 0.0 for d in raw}


def embed_map_in_pandas(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    backend: str = "hash",
    dim: int = HASH_EMBED_DIM,
) -> DataFrame:
    """(id, dim, comp) via Arrow-batched Python workers.

    NOTE: needs a loopback-pinned session in this environment
    (session.get_spark); the declarative embedder is the Python-free
    path used by declared queries.
    """
    if backend not in ("hash", "onnx"):
        raise ValueError(f"unknown embed backend: {backend}")
    if backend == "onnx":
        try:
            import fastembed  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "fastembed/ONNX runtime not available in this environment; "
                "install fastembed to use the production model "
                "(reference scripts/indexing.py:326-340)"
            ) from e

    # NULL ids are unindexable — same exclusion as the declarative
    # embed_postings this stage must stay row-compatible with (a
    # NULL-id doc's postings would pool into one phantom entry in any
    # downstream groupBy('id'))
    narrowed = docs.filter(docs[id_col].isNotNull()).select(
        docs[id_col].alias("id"), docs[text_col].alias("t")
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        if backend == "onnx":
            from fastembed import TextEmbedding

            model = TextEmbedding("BAAI/bge-small-en-v1.5")
        for pdf in batches:
            ids, dims, comps = [], [], []
            if backend == "onnx":
                vecs = model.passage_embed(pdf["t"].fillna("").tolist())
                for i, vec in zip(pdf["id"], vecs):
                    for d, v in enumerate(vec):
                        if v != 0.0:
                            ids.append(i); dims.append(d)
                            comps.append(_round_half_up(float(v)))
            else:
                for i, text in zip(pdf["id"], pdf["t"]):
                    for d, v in _hash_embed_one(text or "", dim).items():
                        ids.append(i); dims.append(d); comps.append(v)
            yield pd.DataFrame({"id": ids, "dim": dims, "comp": comps})

    return narrowed.mapInPandas(run, "id bigint, dim int, comp double")
