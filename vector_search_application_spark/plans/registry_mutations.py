"""Registry entries for mutation / versioning / delta-import operators
(SURVEY.md §2.9 M1-M9, §2.2 T4, §2.1 S5, §2.13 set ops).

The 'new snapshot' of the documents corpus is derived deterministically
from the documents table itself in BOTH engines (modify doc_id%10==0,
drop doc_id%7==3, insert fresh copies of doc_id%13==0 under new ids) so
the delta semantics are fully oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import mutations
from . import corpus
from .registry_core import declare

DOC_COLS = ["text", "lang", "source", "n_chars"]
MOD_MOD = 10      # doc_id % 10 == 0  -> text modified
DEL_MOD = 7       # doc_id % 7 == 3   -> absent from new snapshot
INS_MOD = 13      # doc_id % 13 == 0  -> re-inserted under doc_id + 10M
INS_OFFSET = 10_000_000

NEW_DOCS_CTE = f"""
new_docs AS (
    SELECT doc_id,
           CASE WHEN doc_id % {MOD_MOD} = 0 THEN text || ' updated' ELSE text END
               AS text,
           lang, source, n_chars
    FROM documents WHERE doc_id % {DEL_MOD} <> 3
    UNION ALL
    SELECT doc_id + {INS_OFFSET}, 'fresh ' || text, lang, source, n_chars
    FROM documents WHERE doc_id % {INS_MOD} = 0
)
""".strip()

# twin of operators/mutations.content_hash: length-prefixed field
# encoding (len:value, bare 'n' for NULL) -> ONE sha256; uniquely
# decodable, so unambiguous under NULLs and under field values
# containing any delimiter — change both engines together
def _enc(field: str) -> str:
    return (
        f"CASE WHEN {field} IS NULL THEN 'n' "
        f"ELSE concat(length({field}::VARCHAR)::VARCHAR, ':', {field}::VARCHAR) END"
    )


# iterate DOC_COLS, never a literal tuple: the Spark side hashes
# exactly DOC_COLS (mutations.content_hash(DOC_COLS)), so one constant
# must govern both twins or an edit drifts them apart silently
_HASH_SQL = (
    "sha256(concat(" + ", ".join(_enc(f) for f in DOC_COLS) + "))"
)


def new_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic delta snapshot (Spark twin of NEW_DOCS_CTE)."""
    docs = corpus.docs(spark, sf_dir)
    kept = docs.filter(F.col("doc_id") % DEL_MOD != 3).select(
        "doc_id",
        F.when(
            F.col("doc_id") % MOD_MOD == 0, F.concat(F.col("text"), F.lit(" updated"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    inserted = docs.filter(F.col("doc_id") % INS_MOD == 0).select(
        (F.col("doc_id") + INS_OFFSET).alias("doc_id"),
        F.concat(F.lit("fresh "), F.col("text")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    return kept.unionByName(inserted)


@declare(
    "doc_content_hash",
    f"""
SELECT doc_id, {_HASH_SQL} AS content_hash
FROM documents
""",
    survey_ids="T4,C5",
)
def q_doc_content_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = corpus.docs(spark, sf_dir)
    # oracle-paired: the whitelist rejects types whose cast('string')
    # rendering diverges from the _HASH_SQL twin's ::VARCHAR
    mutations.check_hash_cols(docs, DOC_COLS)
    return docs.select(
        "doc_id", mutations.content_hash(DOC_COLS).alias("content_hash")
    )


@declare(
    "delta_classify",
    f"""
WITH {NEW_DOCS_CTE},
o AS (SELECT doc_id, {_HASH_SQL} AS old_hash FROM documents),
n AS (SELECT doc_id, {_HASH_SQL} AS new_hash FROM new_docs),
joined AS (
    SELECT coalesce(o.doc_id, n.doc_id) AS doc_id, old_hash, new_hash
    FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
)
SELECT doc_id,
       CASE WHEN old_hash IS NULL THEN 'insert'
            WHEN new_hash IS NULL THEN 'delete'
            WHEN old_hash <> new_hash THEN 'update' END AS change_type
FROM joined
WHERE CASE WHEN old_hash IS NULL THEN 'insert'
           WHEN new_hash IS NULL THEN 'delete'
           WHEN old_hash <> new_hash THEN 'update' END IS NOT NULL
""",
    survey_ids="T4,S5",
)
def q_delta_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mutations.delta_classify(
        corpus.docs(spark, sf_dir), new_docs(spark, sf_dir), "doc_id", DOC_COLS
    )


@declare(
    "upsert_merge",
    f"""
WITH {NEW_DOCS_CTE},
merged AS (
    SELECT * FROM new_docs
    UNION ALL
    SELECT d.* FROM documents d
    WHERE NOT EXISTS (SELECT 1 FROM new_docs n WHERE n.doc_id = d.doc_id)
)
SELECT doc_id, {_HASH_SQL} AS content_hash FROM merged
""",
    survey_ids="M1,M4",
)
def q_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    merged = mutations.upsert(
        corpus.docs(spark, sf_dir), new_docs(spark, sf_dir), "doc_id"
    )
    mutations.check_hash_cols(merged, DOC_COLS)
    return merged.select(
        "doc_id", mutations.content_hash(DOC_COLS).alias("content_hash")
    )


@declare(
    "cleanup_old",
    f"""
WITH {NEW_DOCS_CTE}
SELECT d.doc_id FROM documents d
WHERE NOT EXISTS (SELECT 1 FROM new_docs n WHERE n.doc_id = d.doc_id)
""",
    survey_ids="M3,M2,M9",
)
def q_cleanup_old(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mutations.cleanup_old(
        corpus.docs(spark, sf_dir), new_docs(spark, sf_dir), "doc_id"
    ).select("doc_id")


# --- versioning over the events table: user_id = document key, each ---
# --- event is one version, ordered by (ts, event_id)                ---


@declare(
    "version_current",
    """
WITH versioned AS (
    SELECT user_id, event_id, event_type, ts,
           row_number() OVER (
               PARTITION BY user_id
               ORDER BY epoch_us(ts) ASC, event_id ASC) AS version
    FROM events
),
maxv AS (
    SELECT user_id, max(version) AS version FROM versioned GROUP BY user_id
)
SELECT v.user_id, v.version, v.event_id, v.event_type, epoch_us(v.ts) AS ts_us
FROM versioned v JOIN maxv USING (user_id, version)
""",
    survey_ids="M4,M5",
)
def q_version_current(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = corpus._read(spark, sf_dir, "events")
    events = raw.select(
        "user_id",
        "event_id",
        "event_type",
        corpus.ts_us(raw).alias("ts_us"),
    )
    return mutations.current_versions(
        events, "user_id", ["ts_us", "event_id"]
    ).select("user_id", "version", "event_id", "event_type", "ts_us")


@declare(
    "version_history",
    """
WITH versioned AS (
    SELECT user_id, event_id, event_type,
           row_number() OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS version
    FROM events WHERE user_id < 5
),
ranked AS (
    SELECT user_id, version, event_id, event_type,
           row_number() OVER (
               PARTITION BY user_id ORDER BY version DESC) AS rn
    FROM versioned
)
SELECT user_id, version, event_id, event_type FROM ranked WHERE rn <= 3
""",
    survey_ids="M6",
)
def q_version_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = (
        corpus._read(spark, sf_dir, "events")
        .filter(F.col("user_id") < 5)
        .select("user_id", "event_id", "event_type", "ts")
    )
    return mutations.version_history(events, "user_id", ["ts", "event_id"], 3).select(
        "user_id", "version", "event_id", "event_type"
    )


@declare(
    "version_archive",
    """
WITH versioned AS (
    SELECT user_id, event_id, event_type,
           row_number() OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS version
    FROM events
),
maxv AS (
    SELECT user_id, max(version) AS mx FROM versioned GROUP BY user_id
)
SELECT v.user_id::VARCHAR || '_v' || v.version::VARCHAR AS history_id,
       v.user_id AS original_id, v.version, v.event_id, v.event_type
FROM versioned v JOIN maxv USING (user_id)
WHERE v.version < maxv.mx AND v.user_id < 5
""",
    survey_ids="M5,M6",
)
def q_version_archive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5 archive-on-update as a TABLE PAIR (reference
    version_service.py:112-127): materialize main + history to disk —
    history ids '{key}_v{n}' with an original_id back-pointer — then
    read the history table back. The oracle derives the same archive
    relationally, so the materialized layout must hold exactly the
    superseded versions (every key's rows minus its current one)."""
    import os as _os

    # atexit-registered scratch (streaming/ingest._scratch_dir): a bare
    # mkdtemp left the full main+history parquet copies behind on every
    # gate/bench execution of this query
    from ..streaming.ingest import _scratch_dir

    events = corpus._read(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    # materialize the versioning window ONCE: the main and history
    # writes are separate actions and would otherwise each re-run the
    # full scan+window shuffle (localCheckpoint blocks are freed by
    # the ContextCleaner when the RDD drops out of scope)
    v = mutations.with_versions(
        events, "user_id", ["ts", "event_id"]
    ).localCheckpoint(eager=True)
    main, history = mutations.versioned_tables_from(v, "user_id")
    work = _scratch_dir("version_pair_")
    main_dir = _os.path.join(work, "events_main")
    hist_dir = _os.path.join(work, "events_history")
    main.write.mode("overwrite").parquet(main_dir)
    history.write.mode("overwrite").parquet(hist_dir)
    return (
        spark.read.parquet(hist_dir)
        .filter(F.col("original_id") < 5)
        .select("history_id", "original_id", "version", "event_id", "event_type")
    )


@declare(
    "version_get",
    """
WITH versioned AS (
    SELECT user_id, event_id, event_type,
           row_number() OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS version
    FROM events
)
SELECT user_id, version, event_id, event_type
FROM versioned WHERE user_id = 7 AND version = 2
""",
    survey_ids="M7,M8",
)
def q_version_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = corpus._read(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    return mutations.get_version(events, "user_id", ["ts", "event_id"], 7, 2).select(
        "user_id", "version", "event_id", "event_type"
    )
