"""SparkSession factory with the engine's canonical configuration.

Always build sessions through here: shuffle-partition sizing, AQE, Arrow
batches and UTC session time are load-bearing for determinism and for the
pandas-UDF hot path (SURVEY.md §4 item 5 — explicit shuffle control).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(cores: int | None = None, shuffle_partitions: int | None = None,
              app_name: str = "x227f_spark", extra_conf: dict | None = None,
              driver_memory: str | None = None) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        env_sp = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
        if env_sp:
            shuffle_partitions = int(env_sp)
        else:
            # 2x cores: over-decompose so dynamic task scheduling absorbs
            # stragglers (at exactly 1 task/core every stage barrier waits
            # on the slowest partition) without paying per-task Python-UDF
            # setup on too many tiny tasks. AQE coalescing still merges
            # genuinely small shuffles. A real cluster sizes this the same
            # way (2-4x total executor cores).
            shuffle_partitions = 2 * cores
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # let AQE re-size the final stage of plans that feed a cache
        # (InMemoryRelation): without this, a cached repartition(col) is
        # frozen at spark.sql.shuffle.partitions regardless of data size,
        # so small cached layouts (e.g. PageRank's iteration-invariant
        # sides on a tiny graph) pin every downstream stage to N tasks of
        # scheduler floor. CoalescedHashPartitioning still satisfies the
        # join distribution, and coalescePartitions.parallelismFirst floors
        # the result at default.parallelism, so full partitions at the
        # 1M-round design point stay uncoalesced and the exchange-free
        # iteration joins are preserved.
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
                "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", driver_memory or "24g")
        .config("spark.ui.enabled", "false")
        # bound AQE/UI plan stringification — a runaway plan should degrade
        # to a truncated explain, not an OOM in StringBuilder
        .config("spark.sql.maxPlanStringLength", str(2 * 1024 * 1024))
        .config("spark.sql.parquet.compression.codec", "zstd")
        # fallback reclaim of any checkpoint/broadcast blocks the engine's
        # explicit round-end unpersist missed (ContextCleaner is weak-ref
        # driven; a long-running crawl driver may otherwise never GC)
        .config("spark.cleaner.periodicGC.interval", "10min")
    )
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir:
        # e.g. a tmpfs for shuffle/spill when benchmarking compute scaling
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
