"""Iceberg-emulated snapshot tables: Parquet data + ``_snapshots.json``.

The reference has no checkpointing — reruns redo everything
(`pptx_extract.py:184-191` only re-filters). At 10^12-doc scale resume
is mandatory, so this module provides the Iceberg-style contract the
north_rule asks for — atomic snapshot commit, snapshot-isolated reads,
resume via anti-join against committed keys — behind one seam, so a
real Iceberg catalog is a config swap (same append/read/committed-keys
API; no jars are available in this sandbox, SURVEY.md §7).

Commit protocol (write-temp-then-manifest-swap):
  1. Spark writes the batch to ``<root>/snap-<uuid>/`` (has _SUCCESS).
  2. The manifest ``_snapshots.json`` is rewritten to a temp file and
     atomically ``os.replace``d, appending {snapshot_id, files,
     row_count, run_id, committed_at}.
Readers union only manifest-listed files, so half-written directories
are invisible (snapshot isolation).
"""

from __future__ import annotations

import json
import os
import uuid
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_snapshots.json"


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

    def snapshots(self) -> list:
        if not os.path.exists(self._manifest_path):
            return []
        with open(self._manifest_path, encoding="utf-8") as f:
            return json.load(f)["snapshots"]

    def _commit(self, entry: dict) -> None:
        snaps = self.snapshots()
        snaps.append(entry)
        tmp = self._manifest_path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump({"snapshots": snaps}, f, indent=1)
        os.replace(tmp, self._manifest_path)  # atomic swap

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
