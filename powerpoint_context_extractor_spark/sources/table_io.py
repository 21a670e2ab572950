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
from pyspark.sql import functions as F

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

    def _entries(self) -> list:
        """Raw manifest entries in commit order (compactions included).

        A torn TRAILING line (crash mid-append) is tolerated and
        skipped — the half-committed snapshot simply never happened,
        which is the write-data-then-manifest protocol's crash
        semantics. A malformed line ANYWHERE ELSE is real corruption
        and still raises (ADVICE r3)."""
        snaps = []
        if os.path.exists(self._legacy_manifest_path):  # pre-r3 tables
            with open(self._legacy_manifest_path, encoding="utf-8") as f:
                snaps.extend(json.load(f)["snapshots"])
        if os.path.exists(self._manifest_path):
            with open(self._manifest_path, encoding="utf-8") as f:
                lines = [ln for ln in f if ln.strip()]
            for i, line in enumerate(lines):
                try:
                    snaps.append(json.loads(line))
                except json.JSONDecodeError:
                    if i == len(lines) - 1:
                        break             # torn final line: not committed
                    raise
        return snaps

    def snapshots(self) -> list:
        """LIVE snapshots: replay the append-log, letting a compaction
        entry supersede the snapshot ids it lists in ``replaces`` (the
        Iceberg rewrite-files/replace-commit analog). Readers that
        captured file lists before a compaction keep reading the old
        files untouched — snapshot isolation holds; ``vacuum()`` is the
        separate, explicitly-invoked destructive step."""
        live: dict = {}
        for e in self._entries():
            for rid in e.get("replaces", ()):  # compaction supersedes
                live.pop(rid, None)
            live[e["snapshot_id"]] = e
        return list(live.values())

    def _commit(self, entry: dict) -> None:
        """O(1) in snapshot count: one O_APPEND write of one JSON line.
        A single write() of a short line is atomic on POSIX local
        filesystems, so concurrent committers interleave whole lines,
        never bytes (pinned by tests/test_plans.py concurrency test)."""
        line = json.dumps(entry, separators=(",", ":")) + "\n"
        buf = line.encode("utf-8")
        fd = os.open(self._manifest_path,
                     os.O_WRONLY | os.O_APPEND | os.O_CREAT, 0o644)
        try:
            # loop on short writes (ADVICE r3); O_APPEND keeps each
            # os.write atomic w.r.t. other appenders, and _entries()
            # tolerates the torn final line a crash mid-loop leaves
            while buf:
                n = os.write(fd, buf)
                buf = buf[n:]
        finally:
            os.close(fd)

    def data_files(self) -> list:
        files = []
        for s in self.snapshots():
            files.extend(s["files"])
        return files

    # -- schema evolution (r6: the Iceberg add-column/widen analog) ----
    #: type changes an append may make to an existing column, old ->
    #: new (Iceberg's promotion rules: integers widen, float widens to
    #: double — never the lossy direction)
    _WIDENINGS = {("tinyint", "smallint"), ("tinyint", "int"),
                  ("tinyint", "bigint"), ("smallint", "int"),
                  ("smallint", "bigint"), ("int", "bigint"),
                  ("float", "double")}

    def _snap_schema(self, spark: SparkSession, snap: dict) -> list:
        """(name, simple type) pairs for one snapshot: the manifest
        records the schema at commit time (r6+); pre-r6 entries derive
        it once from the snapshot's own parquet footer."""
        if "schema" in snap:
            return [tuple(c) for c in snap["schema"]]
        st = spark.read.parquet(snap["files"][0]).schema
        return [(f.name, f.dataType.simpleString()) for f in st]

    def table_schema(self, spark: SparkSession) -> list | None:
        """Current schema = the LATEST live snapshot's schema (adds
        and widenings land by appending; a column absent from the
        newest snapshot is dropped from evolved reads)."""
        snaps = self.snapshots()
        return self._snap_schema(spark, snaps[-1]) if snaps else None

    def _check_evolution(self, cur: list | None, new: list) -> None:
        if cur is None:
            return
        cur_types = dict(cur)
        for name, t in new:
            old = cur_types.get(name)
            if old is None or old == t:
                continue
            if (old, t) in self._WIDENINGS:
                continue          # widening: reads cast old data up
            raise ValueError(
                f"schema evolution: column {name!r} cannot change "
                f"{old} -> {t} (only additive changes and integer/"
                "float widenings are allowed)")

    def read_evolved(self, spark: SparkSession) -> DataFrame | None:
        """Read across schema versions: project every snapshot to the
        latest schema — missing columns become typed NULLs, widened
        columns cast up, dropped columns are omitted. Snapshots are
        grouped by schema so the scan count is O(#distinct schemas)
        (a handful, ever), not O(#snapshots); each group is a plain
        multi-file parquet read with pushdown intact — no mergeSchema
        footer sampling."""
        snaps = self.snapshots()
        if not snaps:
            return None
        latest = self._snap_schema(spark, snaps[-1])
        groups: dict = {}
        for s in snaps:
            key = tuple(self._snap_schema(spark, s))
            groups.setdefault(key, []).extend(s["files"])
        out = None
        for key, files in groups.items():
            have = {n for n, _ in key}
            proj = spark.read.parquet(*files).select(
                *[(F.col(n).cast(t) if n in have
                   else F.lit(None).cast(t)).alias(n)
                  for n, t in latest])
            out = proj if out is None else out.unionByName(proj)
        return out

    # -- IO --------------------------------------------------------------
    def append(self, df: DataFrame, run_id: str,
               write_options: dict | None = None) -> dict:
        """``write_options`` are passed to the parquet writer (r8 seam:
        the extraction sink sets ``parquet.enable.dictionary=false`` —
        its url/text/spans columns are unique per row, so dictionary
        encoding always falls back after burning the page-build CPU;
        measured 11% off the sf1.0 extract+write wall, same bytes)."""
        new_schema = [(f.name, f.dataType.simpleString())
                      for f in df.schema.fields]
        self._check_evolution(self.table_schema(df.sparkSession),
                              new_schema)
        snap_id = uuid.uuid4().hex
        out_dir = os.path.join(self.root, f"snap-{snap_id}")
        w = df.write.mode("error")
        for k, v in (write_options or {}).items():
            w = w.option(k, v)
        w.parquet(out_dir)
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
            "schema": [list(c) for c in new_schema],
            "committed_at": datetime.now(timezone.utc).isoformat(),
        }
        self._commit(entry)
        return entry

    def _acquire_compact_lock(self, stale_lock_s: float) -> tuple:
        """O_CREAT|O_EXCL lock file enforcing single-compactor mutual
        exclusion (r4 VERDICT #8). A lock older than ``stale_lock_s``
        (a crashed compactor — its rewrite dir is garbage that vacuum
        ignores, its replace-commit never happened) is broken via
        ``os.replace`` to a unique name, so exactly one of N takeover
        racers wins the rename and re-acquisition stays race-free.

        The first line of the lock file is a per-acquisition OWNER
        TOKEN (r4 ADVICE #1): a live compactor heartbeats the lock's
        mtime so it never goes stale mid-run, and verifies the token
        before its replace-commit and before its final unlink — losing
        ownership (another compactor broke a lock that DID go stale,
        e.g. across a long GC/VM pause) aborts the commit instead of
        double-committing, and never deletes the new holder's lock.
        Returns (lock_path, owner_token)."""
        import time

        lock = os.path.join(self.root, "_compact.lock")
        token = uuid.uuid4().hex

        def _try() -> bool:
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY,
                             0o644)
            except FileExistsError:
                return False
            os.write(fd,
                     f"{token} {os.getpid()} {time.time()}\n".encode("utf-8"))
            os.close(fd)
            return True

        if not _try():
            try:
                age = time.time() - os.path.getmtime(lock)
            except OSError:
                age = 0.0                 # holder just released; retry
            if age > stale_lock_s:
                stale = f"{lock}.stale-{uuid.uuid4().hex}"
                try:
                    os.replace(lock, stale)   # one takeover racer wins
                    os.unlink(stale)
                except FileNotFoundError:
                    pass                      # lost the takeover race
            if not _try():
                raise RuntimeError(
                    f"concurrent compaction: {lock} is held (age "
                    f"{age:.0f}s); compaction must run as a single "
                    f"maintenance job")
        return lock, token

    def _owns_compact_lock(self, lock: str, token: str) -> bool:
        """True iff the lock file still starts with our owner token."""
        try:
            with open(lock, encoding="utf-8") as f:
                return f.readline().split()[0] == token
        except (OSError, IndexError):
            return False

    def compact(self, spark: SparkSession, run_id: str = "compact",
                key_col: str | None = None,
                order_col: str | None = None,
                stale_lock_s: float = 3600.0) -> dict | None:
        """Rewrite all currently-live snapshots into ONE new snapshot
        and commit it with a ``replaces`` list (a single O_APPEND line,
        like every other commit). Without keys this is pure small-file
        compaction; with ``key_col``+``order_col`` it also keeps only
        the newest row per key (row_number over order_col DESC) — the
        upsert-table compaction an update-mode streaming sink needs so
        the table stops growing one row per (key, epoch).

        Concurrent appends are safe: only the snapshots this call SAW
        are replaced; an append racing past us stays live. Concurrent
        COMPACTIONS are excluded by ``_compact.lock`` (r4 VERDICT #8):
        a second compactor raises instead of double-committing a full
        rewrite. A crashed compactor's lock goes stale after
        ``stale_lock_s`` and is broken race-free; a LIVE compactor
        running longer than ``stale_lock_s`` (plausible at the 100 TB
        scale this targets) is protected by a heartbeat thread that
        refreshes the lock's mtime, and — belt over braces — by owner-
        token verification immediately before the replace-commit and
        the final unlink (r4 ADVICE #1: a slow original must neither
        double-commit after losing the lock nor delete the new
        holder's lock). On a real Iceberg catalog this seam is the
        optimistic-swap conflict the catalog rejects."""
        import threading

        lock, token = self._acquire_compact_lock(stale_lock_s)
        stop = threading.Event()
        beat_s = max(min(stale_lock_s / 4.0, 60.0), 0.05)

        def _heartbeat() -> None:
            while not stop.wait(beat_s):
                if not self._owns_compact_lock(lock, token):
                    return                # ownership lost: stop touching
                try:
                    os.utime(lock)
                except OSError:
                    return

        t = threading.Thread(target=_heartbeat, daemon=True,
                             name="pcx-compact-heartbeat")
        t.start()
        try:
            return self._compact_locked(spark, run_id, key_col, order_col,
                                        lock=lock, token=token)
        finally:
            stop.set()
            t.join(timeout=5.0)
            if self._owns_compact_lock(lock, token):
                try:
                    os.unlink(lock)
                except FileNotFoundError:
                    pass

    def _compact_locked(self, spark: SparkSession, run_id: str,
                        key_col: str | None,
                        order_col: str | None,
                        lock: str | None = None,
                        token: str | None = None) -> dict | None:
        snaps = self.snapshots()
        files = [f for s in snaps for f in s["files"]]
        if not files:
            return None
        # evolved read: compaction across schema versions projects to
        # the latest schema instead of trusting one footer's layout
        df = self.read_evolved(spark)
        if key_col is not None:
            from pyspark.sql import Window as W
            from pyspark.sql import functions as F
            if order_col is None:
                raise ValueError("key_col compaction needs order_col")
            rn = F.row_number().over(
                W.partitionBy(key_col).orderBy(F.col(order_col).desc()))
            df = (df.withColumn("_rn", rn).filter(F.col("_rn") == 1)
                  .drop("_rn"))
        snap_id = uuid.uuid4().hex
        out_dir = os.path.join(self.root, f"snap-{snap_id}")
        df.write.mode("error").parquet(out_dir)
        new_files = sorted(
            os.path.join(out_dir, f) for f in os.listdir(out_dir)
            if f.endswith(".parquet"))
        entry = {
            "snapshot_id": snap_id,
            "run_id": run_id,
            "files": new_files,
            "row_count": _footer_row_count(new_files),
            "schema": [[f.name, f.dataType.simpleString()]
                       for f in df.schema.fields],
            "replaces": [s["snapshot_id"] for s in snaps],
            "committed_at": datetime.now(timezone.utc).isoformat(),
        }
        if lock is not None and not self._owns_compact_lock(lock, token):
            # ownership was lost mid-rewrite (lock went stale despite
            # the heartbeat — e.g. a multi-minute VM pause): ABORT the
            # replace-commit; the rewrite dir is unreferenced garbage
            # that vacuum ignores and the new lock holder proceeds alone
            raise RuntimeError(
                f"compaction lost {lock} ownership before commit; "
                "aborting replace-commit (another compactor took over)")
        self._commit(entry)
        return entry

    def _validate_optimistic(self, expected_ids: set) -> None:
        """Optimistic-concurrency validation before a replace-commit
        (the Iceberg validate-added-snapshots analog, r6 ADVICE):
        re-read the manifest and abort if live snapshots exist that
        the pending commit's ``replaces`` list does not cover — e.g.
        an ``append()`` that committed mid-merge. Aborting leaves the
        rewrite dir unreferenced (vacuum-ignorable garbage); the
        caller reruns against the new table state."""
        live = {s["snapshot_id"] for s in self.snapshots()}
        extra = live - expected_ids
        if extra:
            raise RuntimeError(
                f"optimistic-concurrency conflict: {len(extra)} "
                "snapshot(s) committed concurrently (append takes no "
                "lock); aborting replace-commit — rerun against the "
                "new table state")

    def merge(self, spark: SparkSession, source: DataFrame,
              key_col: str, run_id: str = "merge",
              delete_col: str | None = None,
              stale_lock_s: float = 600.0) -> dict | None:
        """Keyed upsert — the Iceberg/Delta ``MERGE INTO`` analog:
        matched target rows are replaced by their source row,
        unmatched source rows insert, and source rows with
        ``delete_col`` true delete their key. Copy-on-write via ONE
        replace-commit: surviving target rows (left_anti on the
        source keys) union the non-delete source rows and replace all
        prior snapshots atomically — time travel still reads the
        pre-merge snapshots, and the commit serializes with
        compactions through the same owner-token lock.

        Concurrent ``append()`` (which by design never takes the
        compaction lock) is handled with Iceberg-style OPTIMISTIC
        CONCURRENCY (r6 ADVICE): the manifest is re-read immediately
        before the replace-commit, and if any snapshot appeared that
        the merge's ``replaces`` list does not cover, the merge
        ABORTS (its rewrite dir is unreferenced garbage vacuum
        ignores) — callers rerun the merge against the new state.
        Without this check the late append's rows would survive
        beside the merged snapshot and could duplicate merged keys.

        The source must be unique per key (a key that both updates
        and deletes is ambiguous) — enforced with one small
        aggregation over the source before any write.

        Scale note: copy-on-write rewrites the table; a partitioned
        deployment rewrites only touched partitions — the anti-join +
        union plan is identical per partition."""
        from pyspark.sql import functions as F
        dupes = (source.groupBy(key_col).count()
                 .filter(F.col("count") > 1).limit(1).count())
        if dupes:
            raise ValueError(
                f"merge: source has duplicate {key_col} keys")
        lock, token = self._acquire_compact_lock(stale_lock_s)
        try:
            cur = self.read_evolved(spark)
            if delete_col is not None:
                inserts = (source.filter(
                    ~F.coalesce(F.col(delete_col), F.lit(False)))
                    .drop(delete_col))
            else:
                inserts = source
            if cur is None:
                out = inserts
                replaced: list = []
            else:
                out = (cur.join(source.select(key_col), key_col,
                                "left_anti")
                       .unionByName(inserts))
                replaced = [s["snapshot_id"] for s in self.snapshots()]
            new_schema = [(f.name, f.dataType.simpleString())
                          for f in out.schema.fields]
            self._check_evolution(self.table_schema(spark), new_schema)
            snap_id = uuid.uuid4().hex
            out_dir = os.path.join(self.root, f"snap-{snap_id}")
            out.write.mode("error").parquet(out_dir)
            files = sorted(
                os.path.join(out_dir, f) for f in os.listdir(out_dir)
                if f.endswith(".parquet"))
            entry = {
                "snapshot_id": snap_id,
                "run_id": run_id,
                "files": files,
                "row_count": _footer_row_count(files),
                "schema": [list(c) for c in new_schema],
                "replaces": replaced,
                "committed_at":
                    datetime.now(timezone.utc).isoformat(),
            }
            if not self._owns_compact_lock(lock, token):
                raise RuntimeError(
                    "merge lost lock ownership before commit; aborting")
            self._validate_optimistic(set(replaced))
            self._commit(entry)
            return entry
        finally:
            if self._owns_compact_lock(lock, token):
                os.unlink(lock)

    def vacuum(self) -> list:
        """Delete snap dirs no longer referenced by any live snapshot
        (replaced by a compaction). Explicit and separate from
        compact() so in-flight readers of pre-compaction file lists
        get a grace window the caller controls. Returns removed dirs."""
        import shutil
        live_dirs = {os.path.dirname(f) for s in self.snapshots()
                     for f in s["files"]}
        removed = []
        for name in os.listdir(self.root):
            path = os.path.join(self.root, name)
            if (name.startswith("snap-") and os.path.isdir(path)
                    and path not in live_dirs):
                shutil.rmtree(path)
                removed.append(path)
        return removed

    def read(self, spark: SparkSession) -> DataFrame | None:
        files = self.data_files()
        if not files:
            return None
        return spark.read.parquet(*files)

    # -- time travel (r6: the Iceberg snapshot-as-of read analog) -------
    def snapshots_at(self, snapshot_id: str | None = None,
                     as_of_ts: str | None = None) -> list:
        """LIVE snapshots as of a historical point: replay the
        append-log only up to (and including) ``snapshot_id``, or up
        to the last entry with ``committed_at <= as_of_ts`` (ISO
        string; manifest timestamps are UTC ISO so plain string
        comparison is chronological). Compactions after the cut
        simply haven't happened yet in the replay, so the pre-compact
        file lists come back exactly as a reader at that time saw
        them — O(manifest), no data touched."""
        if (snapshot_id is None) == (as_of_ts is None):
            raise ValueError(
                "time travel: pass exactly one of snapshot_id / as_of_ts")
        live: dict = {}
        found = False
        for e in self._entries():
            if as_of_ts is not None and e["committed_at"] > as_of_ts:
                break
            for rid in e.get("replaces", ()):
                live.pop(rid, None)
            live[e["snapshot_id"]] = e
            if snapshot_id is not None and e["snapshot_id"] == snapshot_id:
                found = True
                break
        if snapshot_id is not None and not found:
            raise ValueError(
                f"time travel: unknown snapshot_id {snapshot_id!r}")
        return list(live.values())

    def read_at(self, spark: SparkSession,
                snapshot_id: str | None = None,
                as_of_ts: str | None = None) -> DataFrame | None:
        """Read the table as of a snapshot id or timestamp. Raises if
        the historical files were already vacuumed (snapshot isolation
        holds until vacuum — the explicit destructive step — exactly
        like expiring snapshots in Iceberg)."""
        snaps = self.snapshots_at(snapshot_id=snapshot_id,
                                  as_of_ts=as_of_ts)
        files = [f for s in snaps for f in s["files"]]
        gone = [f for f in files if not os.path.exists(f)]
        if gone:
            raise ValueError(
                "time travel: target snapshot's files were vacuumed: "
                + gone[0])
        if not files:
            return None
        return spark.read.parquet(*files)

    def committed_keys(self, spark: SparkSession, key_col: str) -> DataFrame | None:
        """Column-pruned scan of just the key column across committed
        snapshots — the probe side of the resume anti-join (U3)."""
        df = self.read(spark)
        return None if df is None else df.select(key_col)


def _footer_minmax(path: str, col: str):
    """Column min/max from the parquet footer — metadata only, no
    data pages (the Iceberg manifest column-stats analog). Returns
    None when any row group lacks stats (then the file cannot be
    skipped safely)."""
    import pyarrow.parquet as pq
    md = pq.ParquetFile(path).metadata
    idx = None
    for i in range(md.num_columns):
        if md.schema.column(i).name == col:
            idx = i
            break
    if idx is None:
        return None
    lo = hi = None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            return None
        lo = st.min if lo is None else min(lo, st.min)
        hi = st.max if hi is None else max(hi, st.max)
    return (lo, hi) if lo is not None else None


def _pruned_files(self, col: str, lo, hi) -> tuple:
    """(surviving files, skipped count) for a [lo, hi] range predicate
    on ``col`` using footer stats only — the manifest-level file-skip
    every table format performs before any scan. Files without stats
    survive (never skip blind)."""
    keep = []
    skipped = 0
    for f in self.data_files():
        rng = _footer_minmax(f, col)
        if rng is None or (rng[1] >= lo and rng[0] <= hi):
            keep.append(f)
        else:
            skipped += 1
    return keep, skipped


def _read_pruned(self, spark: SparkSession, col: str, lo, hi):
    """Range read with manifest-stats file skipping (r7): only files
    whose footer [min, max] intersects [lo, hi] are scanned; the
    residual filter still applies (stats prune FILES, not rows).
    Returns None for an empty table or fully-pruned range."""
    files, _ = self._pruned_files(col, lo, hi)
    if not files:
        return None
    return (spark.read.parquet(*files)
            .filter((F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi))))


def _read_changes(self, spark: SparkSession, since_snapshot_id: str):
    """Incremental (CDC-style) read: the rows committed strictly
    AFTER ``since_snapshot_id`` in manifest order (r7 — the
    incremental-pipeline primitive: consumers checkpoint a snapshot
    id and read only what landed since). Requires the post-anchor
    history to be APPEND-ONLY — a replace commit (compaction/merge)
    rewrites old rows and would make 'new rows since' ambiguous, so
    it raises instead of silently double-counting. Returns None when
    nothing landed since."""
    entries = self._entries()
    idx = None
    for i, e in enumerate(entries):
        if e["snapshot_id"] == since_snapshot_id:
            idx = i
            break
    if idx is None:
        raise ValueError(
            f"read_changes: unknown snapshot {since_snapshot_id!r}")
    later = entries[idx + 1:]
    if any(e.get("replaces") for e in later):
        raise ValueError(
            "read_changes: a replace commit (compaction/merge) exists "
            "after the anchor snapshot; incremental semantics need an "
            "append-only suffix — re-anchor past the replace")
    files = [f for e in later for f in e["files"]]
    if not files:
        return None
    return spark.read.parquet(*files)


SnapshotTable._pruned_files = _pruned_files
SnapshotTable.read_pruned = _read_pruned
SnapshotTable.read_changes = _read_changes
