"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference product-search system
(domini1969/vector-search-application).

This is NOT a port: the reference's FastAPI + Qdrant + HNSW machinery is
replaced by idiomatic Spark — DataFrame/SQL plans optimized by Catalyst,
window-rank + outer-join fusion operators, posting-list BM25 in pure SQL
aggregations, MERGE-style mutations via anti-join rewrites, and
Arrow-batched pandas stages only where built-ins cannot express the
semantics (model inference, multimodal decode).

Package map (mirrors SURVEY.md §2 inventory):
  functions/   scalar + portable deterministic functions (hashing,
               tokenizer, embedder, classifier, text analysis)
  operators/   query operators (top-k, exact cascade, fusion, BM25,
               dedup, ANN, mutations)
  sources/     ingest readers and export sinks (JSON, tar.gz, directory
               import, delta import)
  plans/       corpus derivations shared by engine and DuckDB oracle
  streaming/   Structured Streaming incremental ingest
"""

__version__ = "0.1.0"
