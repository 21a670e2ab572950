"""Binary artifact sink (SURVEY.md §2 S6): write one payload file per
row with deterministic zero-padded names — the reference saves each
extracted slide image as ``slide_{n:03d}_img_{m}.{ext}``
(`pptx_extractor/slides/extractor.py:258-279,332-346`).

Spark shape: the *manifest* (filename, size, sha) is a pure built-in
projection (oracle-checkable); the actual byte write runs executor-side
via ``foreachPartition`` so no payload ever funnels through the driver.
Filenames are derived from the row key alone, so re-running a partition
(task retry / resume) rewrites the same bytes to the same path —
idempotent, like the snapshot commit protocol in table_io.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def artifact_manifest(df: DataFrame, id_col: str, payload_col: str,
                      prefix: str = "artifact", width: int = 5,
                      ext: str = "bin") -> DataFrame:
    """Deterministic (filename, n_bytes, payload_sha) per row — the
    sink's write plan, checkable without touching a filesystem."""
    return df.select(
        F.format_string(f"{prefix}_%0{width}d.{ext}", F.col(id_col))
        .alias("filename"),
        F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
        F.sha2(F.col(payload_col), 256).alias("payload_sha"))


def write_artifacts(df: DataFrame, out_dir: str, id_col: str = "doc_id",
                    payload_col: str = "payload",
                    prefix: str = "artifact", width: int = 5,
                    ext: str = "bin") -> int:
    """Write each payload to ``out_dir/<prefix>_<id padded>.<ext>``.

    Executor-side, one file per row, no driver funnel; returns the
    number of files written. ``out_dir`` must be a path visible to all
    executors (shared FS / object store in a real cluster)."""
    os.makedirs(out_dir, exist_ok=True)
    named = df.select(
        F.format_string(f"{prefix}_%0{width}d.{ext}", F.col(id_col))
        .alias("filename"),
        F.col(payload_col).alias("payload"))

    acc = df.sparkSession.sparkContext.accumulator(0)

    def _write_partition(rows):
        n = 0
        for r in rows:
            tmp = os.path.join(out_dir, f".{r['filename']}.tmp")
            with open(tmp, "wb") as f:
                f.write(bytes(r["payload"]) if r["payload"] is not None
                        else b"")
            os.replace(tmp, os.path.join(out_dir, r["filename"]))
            n += 1
        acc.add(n)

    named.foreachPartition(_write_partition)
    # single pass over the data; writes are idempotent per path, so a
    # retried task re-writes identical bytes (count may overshoot on
    # retry — informational only)
    return acc.value
