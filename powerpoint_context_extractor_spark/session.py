"""SparkSession factory with the engine's standard knobs.

Local-mode defaults sized for this sandbox (32 cores / 128 GiB, see
SURVEY.md §7); on a real cluster the same knobs apply per-executor and
AQE re-plans at runtime. Arrow batches are bounded by *records* here —
multi-MB ``html`` blobs mean records-per-batch is the effective bytes
bound (SURVEY.md §4 "Vectorization").
"""

from __future__ import annotations

import os
import re

from pyspark.sql import SparkSession

# Arrow batching is bounded by BYTES (scale-safe for multi-KB html rows);
# the records bound is a backstop. Measured on this host: 512-row batches
# cost ~20% extraction throughput at 32 cores (per-batch Python overhead),
# while 32 MiB batches starve Python workers at full width (chunky
# JVM-produce -> Python-consume pipeline: 32-wide runs never beat 17.2s
# over 300k pages at 32m across 5 JVMs, vs 10.5-13.5s repeatedly at
# 8-16m; the 8-wide arm is insensitive). 16 MiB ~= 3k synthetic pages
# per batch keeps both amortization and pipelining.
DEFAULT_ARROW_BATCH = 65536
DEFAULT_ARROW_BYTES = "16m"


_MEM_RE = re.compile(r"^\s*(\d+)\s*([kmgt])b?\s*$", re.I)


def _gc_opts(driver_memory: str) -> str:
    """ParallelGC always; add the -Xmn4g young-gen cap whenever the heap
    is >= 8 GiB. Parses every JVM memory-string form ('8g', '8gb',
    '8192m', '48G') — endswith/rstrip('gb') silently skipped the
    mitigation for '8gb'/'8192m' (r3 ADVICE)."""
    opts = "-XX:+UseParallelGC"
    m = _MEM_RE.match(driver_memory)
    if m:
        mib = int(m.group(1)) * {"k": 1 / 1024, "m": 1,
                                 "g": 1024, "t": 1024 * 1024}[m.group(2).lower()]
        if mib >= 8 * 1024:
            opts += " -Xmn4g"
    return opts


def get_spark(app: str = "pcx-extract", master: str | None = None,
              shuffle_partitions: int | None = None,
              arrow_batch: int = DEFAULT_ARROW_BATCH,
              arrow_bytes: str = DEFAULT_ARROW_BYTES,
              driver_memory: str = "48g",
              extra_conf: dict | None = None) -> SparkSession:
    """``extra_conf`` entries are applied at BUILDER time — the seam for
    core (non-SQL) confs like ``spark.python.worker.reuse`` that
    ``spark.conf.set`` rejects after startup (bench/width32.py)."""
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
        # local runs; Parallel matches batch workloads. The 4g young-gen
        # cap bounds stop-the-world pause size at full width: transient
        # Arrow batch buffers die young, and with an unbounded young gen
        # 32-wide runs showed 1.6-7.5s single pauses (amplified by VM
        # steal) vs <=353ms capped — measured 23s vs 2s total GC over a
        # 300k-page pass set.
        .config("spark.driver.extraJavaOptions", _gc_opts(driver_memory))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
