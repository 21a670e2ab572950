"""SparkSession factory with the engine's standard knobs.

Local-mode defaults sized for this sandbox (32 cores / 128 GiB, see
SURVEY.md §7); on a real cluster the same knobs apply per-executor and
AQE re-plans at runtime. Arrow batches are bounded by *records* here —
multi-MB ``html`` blobs mean records-per-batch is the effective bytes
bound (SURVEY.md §4 "Vectorization").
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow batching is bounded by BYTES (scale-safe for multi-KB html rows:
# a 32 MiB batch is ~14k small synthetic pages or ~650 real 50 KiB CC
# pages); the records bound is a backstop. Measured on this host:
# 512-row batches cost ~20% extraction throughput at 32 cores vs
# byte-bounded large batches.
DEFAULT_ARROW_BATCH = 65536
DEFAULT_ARROW_BYTES = "32m"


def get_spark(app: str = "pcx-extract", master: str | None = None,
              shuffle_partitions: int | None = None,
              arrow_batch: int = DEFAULT_ARROW_BATCH,
              arrow_bytes: str = DEFAULT_ARROW_BYTES,
              driver_memory: str = "48g") -> SparkSession:
    master = master or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    if shuffle_partitions is None:
        n = master.split("[")[-1].rstrip("]*")
        shuffle_partitions = int(n) if n.isdigit() else 32
    b = (
        SparkSession.builder
        .master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch))
        .config("spark.sql.execution.arrow.maxBytesPerBatch", arrow_bytes)
        .config("spark.driver.memory", driver_memory)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # throughput GC: G1 pause targets cost ~10-20% on scan-heavy
        # local runs; Parallel matches batch workloads
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
    )
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
