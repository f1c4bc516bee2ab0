"""SparkSession factory tuned for this engine.

Local testing runs on local[N]; the same configs are the ones we would
ship on a 1000-executor cluster: AQE on (runtime re-planning, skew-join
splitting, partition coalescing), Arrow enabled for the pandas stages,
and shuffle partitions sized explicitly rather than left at the 200
default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "vector-search-application-spark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    active = SparkSession.getActiveSession()
    if active is None:
        # getActiveSession is JVM-thread-local: a session created on
        # another thread (conftest's, the HTTP shim's) is visible only
        # through the default slot. Without this, the builder path
        # below would "create" a session that getOrCreate actually
        # reuses — while applying EVERY builder option to it,
        # clobbering e.g. the creator's shuffle_partitions=8 with 32
        active = getattr(SparkSession, "_instantiatedSession", None)
    if active is not None:
        # an explicit shuffle_partitions must take effect even on a
        # reused session — it is a runtime conf, and a bench or test
        # that asked for 8 partitions silently running under the old
        # session's 32 would skew every number it records (app_name
        # cannot change on reuse; that is cosmetic)
        if shuffle_partitions is not None:
            active.conf.set(
                "spark.sql.shuffle.partitions", str(shuffle_partitions)
            )
        return active
    # Python workers hang resolving a non-loopback hostname in this
    # environment; pin everything to 127.0.0.1.
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sp = shuffle_partitions
    if sp is None:
        # SPARK_GRAFT_CPUS='*' is valid for local[*] but not int()
        sp = int(cpus) if cpus.isdigit() else (os.cpu_count() or 8)
    return (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.driver.host", "127.0.0.1")
        .config("spark.driver.bindAddress", "127.0.0.1")
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # some testdata generations write parquet TIMESTAMP(NANOS),
        # which Spark 4 rejects unless read as BIGINT nanos; setting it
        # at the factory means every reader inherits it (plans/corpus
        # re-sets it defensively for sessions built elsewhere)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
