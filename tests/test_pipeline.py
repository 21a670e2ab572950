"""Pipeline-level tests: kernel-over-Spark byte-identity, lineage
reconciliation, resume exactly-once, metamorphic properties
(FIXTURES.md §5)."""

import os

import pytest
from pyspark.sql import functions as F

from powerpoint_context_extractor_spark import corpus
from powerpoint_context_extractor_spark.kernel import extract_document
from powerpoint_context_extractor_spark.operators.extract import extract_pages
from powerpoint_context_extractor_spark.plans.flagship import (
    run_extraction, write_pages_table,
)
from powerpoint_context_extractor_spark.sources.table_io import SnapshotTable


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pages"))
    rows = list(corpus.generate_pages_rows(300, seed=42)) + corpus.fixture_pages()
    write_pages_table(spark, rows, d, num_partitions=6)
    return d


def test_spark_matches_kernel_byte_identical(spark, pages_dir):
    pages = spark.read.parquet(pages_dir)
    got = {r["url"]: r for r in extract_pages(pages, num_partitions=5).collect()}
    rows = {r["url"]: r for r in pages.select("url", "html", "text").collect()}
    assert set(got) == set(rows)
    for url, src in rows.items():
        expected = extract_document(url, bytes(src["html"]))
        g = got[url]
        if expected.error is None:
            assert g["text"] == expected.text, url          # byte-identical
            assert g["text_source"] == "kernel"
            assert g["n_blocks"] == expected.n_blocks
            assert [s.asDict() for s in (g["spans"] or [])] == expected.spans
        else:
            assert g["error"] == expected.error
            assert g["text"] == src["text"]                  # J2 fallback
            assert g["text_source"] == "fallback"


def test_mixed_corpus_zero_decode_errors(spark, pages_dir):
    """r3 VERDICT #1 'done' gate: the bulk corpus now carries ~3%
    legacy-charset pages (cp1252/utf-16/BOM) and the charset sniffer
    decodes every HTML page — zero decode_error rows; the only error
    rows are corrupt binary payloads."""
    pages = spark.read.parquet(pages_dir)
    got = extract_pages(pages)
    by = {r["charset"]: r["n"] for r in
          got.groupBy("charset").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got.filter(F.col("error").startswith("decode_error")).count() == 0
    # all decode paths actually exercised by the mixed corpus — incl.
    # the r4 WHATWG CJK superset codecs from the cjk-charset fixtures
    for cs in ("utf-8", "utf-8-bom", "utf-16", "cp1252", "binary",
               "cp932", "gbk", "cp949"):
        assert by.get(cs, 0) > 0, (cs, by)


def test_run_extraction_lineage_reconciles(spark, pages_dir, tmp_path):
    out = str(tmp_path / "out")
    pages = spark.read.parquet(pages_dir)
    n_input = pages.count()
    info = run_extraction(spark, pages, out, num_partitions=4)
    assert info["snapshot"]["row_count"] == n_input
    lineage = SnapshotTable(os.path.join(out, "lineage")).read(spark)
    agg = lineage.agg(F.sum("row_count").alias("n"), F.sum("ok_count").alias("ok"),
                      F.sum("fail_count").alias("fail")).collect()[0]
    assert agg["n"] == n_input                       # sum(row_count)=input rows
    assert agg["ok"] + agg["fail"] == n_input        # ok+fail reconciles
    assert agg["fail"] > 0                           # corpus contains bad rows
    per = lineage.select("partition_id").distinct().count()
    assert 1 <= per <= 4  # AQE may coalesce the repartition(4)


def test_resume_exactly_once(spark, pages_dir, tmp_path):
    out = str(tmp_path / "out")
    pages = spark.read.parquet(pages_dir)
    first = pages.limit(120)
    run_extraction(spark, first, out, num_partitions=3)
    # second run over the FULL input resumes: only missing urls processed
    info2 = run_extraction(spark, pages, out, num_partitions=3)
    tbl = SnapshotTable(os.path.join(out, "extracted")).read(spark)
    assert tbl.count() == pages.count()
    assert tbl.select("url").distinct().count() == pages.count()  # exactly-once
    assert info2["snapshot"]["row_count"] == pages.count() - 120
    # idempotent third run: nothing left to do
    info3 = run_extraction(spark, pages, out, num_partitions=3)
    assert info3["snapshot"]["row_count"] == 0


def test_uncommitted_snapshot_dir_is_invisible(spark, pages_dir, tmp_path):
    """Crash-safety: a snap- dir without a manifest entry (simulating a
    job killed mid-write, before the atomic manifest swap) must be
    invisible to readers and to resume."""
    import shutil
    out = str(tmp_path / "out")
    pages = spark.read.parquet(pages_dir)
    run_extraction(spark, pages.limit(50), out, num_partitions=2)
    ext_root = os.path.join(out, "extracted")
    committed = SnapshotTable(ext_root).read(spark).count()
    # fake a torn write: copy a real snap dir under a new uncommitted name
    snaps = [d for d in os.listdir(ext_root) if d.startswith("snap-")]
    shutil.copytree(os.path.join(ext_root, snaps[0]),
                    os.path.join(ext_root, "snap-deadbeef-uncommitted"))
    assert SnapshotTable(ext_root).read(spark).count() == committed
    # resume still sees only committed urls: full rerun adds the rest once
    run_extraction(spark, pages, out, num_partitions=2)
    tbl = SnapshotTable(ext_root).read(spark)
    assert tbl.count() == pages.count()
    assert tbl.select("url").distinct().count() == pages.count()


def test_heavy_hitter_detection_on_skewed_hosts(spark, pages_dir):
    from powerpoint_context_extractor_spark.operators.textstats import (
        detect_heavy_hitters,
    )
    pages = spark.read.parquet(pages_dir)
    hosts = pages.select(
        F.regexp_extract("url", r"https://([^./]+)\.", 1).alias("host"))
    hh = detect_heavy_hitters(hosts, "host", fraction_threshold=0.15)
    assert hh == ["host0"]  # corpus plants ~30% of rows on host0


def test_salt_and_order_invariance(spark, pages_dir):
    """Changing partition count / input order changes no per-url output
    (FIXTURES.md §5: order independence + salt invariance)."""
    pages = spark.read.parquet(pages_dir)
    a = {r["url"]: (r["text"], r["n_blocks"], r["error"])
         for r in extract_pages(pages, num_partitions=2).collect()}
    shuffled = pages.orderBy(F.reverse(F.col("url")))
    b = {r["url"]: (r["text"], r["n_blocks"], r["error"])
         for r in extract_pages(shuffled, num_partitions=7).collect()}
    assert a == b


def test_subset_semantics(spark, pages_dir):
    """Extracting a url-subset == subsetting the full run (the reference's
    slide_filter contract, `pptx_extract.py:250-252`)."""
    pages = spark.read.parquet(pages_dir)
    full = {r["url"]: r["text"]
            for r in extract_pages(pages).collect()}
    subset_urls = sorted(full)[:50]
    sub = {r["url"]: r["text"]
           for r in extract_pages(pages.filter(F.col("url").isin(subset_urls))).collect()}
    assert sub == {u: full[u] for u in subset_urls}


def test_extract_plan_prunes_columns(spark, pages_dir):
    """The parquet scan must read only (url, html, text) — never warc_ts/
    lang (F7 / ReadSchema check)."""
    pages = spark.read.parquet(pages_dir)
    plan = extract_pages(pages)._jdf.queryExecution().executedPlan().toString()
    assert "warc_ts" not in plan
    assert "lang" not in plan


def test_query_scratch_dirs_stay_inside_session_root(spark, sf_dir):
    """r4 VERDICT #9 'done' gate: the temp-dir-using contract queries
    nest ALL scratch under one atexit-cleaned session root — a sweep
    leaves no new pcx_*/spark_graft_* entries at the top of /tmp."""
    import os
    import tempfile

    import __spark_entry__ as entry_mod
    tmp = tempfile.gettempdir()
    before = set(os.listdir(tmp))
    entry_mod._sink_jsonl_shards(spark, sf_dir).count()
    entry_mod._warc_extract(spark, sf_dir).count()
    allowed = set()
    if entry_mod._TMP_ROOT:
        allowed.add(os.path.basename(entry_mod._TMP_ROOT))
    from powerpoint_context_extractor_spark.streaming import ingest
    if ingest._TMP_ROOT:
        allowed.add(os.path.basename(ingest._TMP_ROOT))
    leaked = {e for e in set(os.listdir(tmp)) - before - allowed
              if e.startswith(("pcx_", "spark_graft"))}
    assert not leaked, leaked
    # everything the queries made lives under the session root
    assert entry_mod._TMP_ROOT and os.path.isdir(entry_mod._TMP_ROOT)
    assert any(n.startswith(("pcx_jsonl_", "warc_"))
               for n in os.listdir(entry_mod._TMP_ROOT))


def test_snapshot_commit_is_metadata_only(spark, tmp_path, monkeypatch):
    """The commit path must not rescan the just-written data: row_count
    comes from parquet footers (Iceberg-manifest analog). Spies on
    DataFrameReader.parquet — zero reads during append()."""
    from pyspark.sql.readwriter import DataFrameReader
    from powerpoint_context_extractor_spark.sources.table_io import (
        SnapshotTable,
    )
    reads = []
    orig = DataFrameReader.parquet

    def spy(self, *paths, **kw):
        reads.append(paths)
        return orig(self, *paths, **kw)

    monkeypatch.setattr(DataFrameReader, "parquet", spy)
    tbl = SnapshotTable(str(tmp_path / "t"))
    entry = tbl.append(spark.range(1234).toDF("id"), "run-x")
    assert entry["row_count"] == 1234
    assert reads == []          # no Spark re-read of committed data
    # readers still see exactly the committed rows
    assert tbl.read(spark).count() == 1234


def test_snapshot_time_travel_and_vacuum_guard(spark, tmp_path):
    """r6 time travel: as-of reads replay the manifest to a historical
    point (by snapshot id or timestamp); a later compaction doesn't
    rewrite history; vacuum honestly breaks pre-compaction targets."""
    import pytest as _pytest

    from powerpoint_context_extractor_spark.sources.table_io import (
        SnapshotTable,
    )
    tbl = SnapshotTable(str(tmp_path / "ttv"))
    s1 = tbl.append(spark.range(0, 10).toDF("id"), "a")
    s2 = tbl.append(spark.range(10, 25).toDF("id"), "b")
    tbl.compact(spark, run_id="c")
    s3 = tbl.append(spark.range(25, 30).toDF("id"), "d")

    def ids(df):
        return sorted(r["id"] for r in df.collect())

    assert ids(tbl.read_at(spark, snapshot_id=s1["snapshot_id"])) \
        == list(range(10))
    assert ids(tbl.read_at(spark, snapshot_id=s2["snapshot_id"])) \
        == list(range(25))
    # timestamp cut at s2's commit == the same state
    assert ids(tbl.read_at(spark, as_of_ts=s2["committed_at"])) \
        == list(range(25))
    # current read includes the compaction + third append
    assert ids(tbl.read(spark)) == list(range(30))
    with _pytest.raises(ValueError, match="unknown snapshot_id"):
        tbl.read_at(spark, snapshot_id="nope")
    with _pytest.raises(ValueError, match="exactly one"):
        tbl.read_at(spark)
    # vacuum drops the replaced pre-compaction files -> honest error
    # for historical targets, while current reads stay intact
    assert tbl.vacuum()
    with _pytest.raises(ValueError, match="vacuumed"):
        tbl.read_at(spark, snapshot_id=s1["snapshot_id"])
    assert ids(tbl.read(spark)) == list(range(30))
    assert ids(tbl.read_at(spark, snapshot_id=s3["snapshot_id"])) \
        == list(range(30))


def test_merge_upsert_semantics_and_history(spark, tmp_path):
    """r6: SnapshotTable.merge — matched keys take the source value,
    delete-marked keys vanish, new keys insert; the pre-merge snapshot
    stays time-travel readable; duplicate source keys are rejected
    BEFORE any write; the compaction lock is released afterwards."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from powerpoint_context_extractor_spark.sources.table_io import (
        SnapshotTable,
    )
    tbl = SnapshotTable(str(tmp_path / "t"))
    base = spark.createDataFrame(
        [(i, f"old{i}") for i in range(10)], "k long, v string")
    s1 = tbl.append(base, "base")
    src = spark.createDataFrame(
        [(2, "new2", False), (4, "new4", False),   # updates
         (7, None, True),                          # delete
         (100, "new100", False)],                  # insert
        "k long, v string, is_delete boolean")
    tbl.merge(spark, src, "k", delete_col="is_delete")
    got = {r["k"]: r["v"] for r in tbl.read(spark).collect()}
    want = {i: f"old{i}" for i in range(10) if i != 7}
    want.update({2: "new2", 4: "new4", 100: "new100"})
    assert got == want
    # pre-merge history intact
    old = {r["k"]: r["v"]
           for r in tbl.read_at(spark,
                                snapshot_id=s1["snapshot_id"]).collect()}
    assert old == {i: f"old{i}" for i in range(10)}
    # duplicate source keys rejected before any commit
    n_snaps = len(tbl.snapshots())
    dup = spark.createDataFrame(
        [(1, "a", False), (1, "b", True)],
        "k long, v string, is_delete boolean")
    with pytest.raises(ValueError, match="duplicate"):
        tbl.merge(spark, dup, "k", delete_col="is_delete")
    assert len(tbl.snapshots()) == n_snaps
    # lock released: a follow-up merge works immediately
    tbl.merge(spark, spark.createDataFrame(
        [(101, "x", False)], "k long, v string, is_delete boolean"),
        "k", delete_col="is_delete")
    assert tbl.read(spark).filter(F.col("k") == 101).count() == 1
    assert not [f for f in os.listdir(str(tmp_path / "t"))
                if f.endswith(".lock")]


def test_capstone_pretrain_corpus_plan_and_wds(spark, sf_dir, tmp_path):
    """r8 (capstone v4, r7 VERDICT #2): the pretraining capstone now
    commits its three multi-consumer stages (gated/kept/rows) through
    SnapshotTable boundaries, so the FINAL plan scans a stage-local
    handful of parquet files instead of re-executing its upstream
    ~150 times (the r7 one-plan amplification this audit used to pin
    at <=170 corpus scans). Still no collect/cache/localCheckpoint
    anywhere (no InMemoryTableScan, no RDD-checkpoint scan), no
    BroadcastNestedLoopJoin, and the output rows route into WDS tar
    shards that read back exactly."""
    import __spark_entry__ as entry_mod
    from powerpoint_context_extractor_spark.sources.wds import (
        read_wds_shards, write_wds_shards,
    )
    out = entry_mod.queries()["capstone_pretrain_corpus"](spark, sf_dir)
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "InMemoryTableScan" not in final          # nothing cached
    assert "BroadcastNestedLoopJoin" not in final    # no cross blowup
    # the snapshot boundaries collapse the subtree re-execution: the
    # final plan joins the committed `rows` snapshot with the global
    # order index over it — a handful of scans, not ~150. A
    # regression that silently re-inlines a subtree busts the ceiling.
    n_scans = final.count("Scan parquet")
    assert 1 <= n_scans <= 12, n_scans
    rows = out.collect()
    assert rows, "capstone produced no rows at sf0.001"
    # contract invariants: contiguous global order, consistent shards
    idxs = sorted(r["global_idx"] for r in rows)
    assert idxs == list(range(len(rows)))
    assert all(r["shard_id"] == r["global_idx"] % 8 for r in rows)
    by_order = sorted(rows, key=lambda r: (r["domain"], r["doc_id"],
                                           r["rep"]))
    assert [r["global_idx"] for r in by_order] == list(range(len(rows)))
    # decontamination: no canary doc (doc_id%17==5) and no eval doc
    # (doc_id%101==0) survives; gate: no stopword-free doc survives
    assert not [r for r in rows if r["doc_id"] % 17 == 5]
    assert not [r for r in rows if r["doc_id"] % 101 == 0]
    assert not [r for r in rows if r["doc_id"] % 7 == 3]
    # the WDS sink stage: shard the emitted corpus rows and read back
    key = [(r["global_idx"], f'{r["doc_id"]}|{r["domain"]}|{r["rep"]}')
           for r in rows]
    df = spark.createDataFrame(key, "doc_id long, text string")
    wds_dir = str(tmp_path / "wds")
    write_wds_shards(df, wds_dir, n_shards=4, key_col="doc_id",
                     text_col="text")
    back = {(r["doc_id"], r["text"])
            for r in read_wds_shards(spark, wds_dir).collect()}
    assert back == set(key)


def test_merge_aborts_on_concurrent_append(spark, tmp_path):
    """r7 (r6 ADVICE): an append() that commits while a merge is
    writing (append never takes the compaction lock) trips the
    optimistic-concurrency validation — the merge ABORTS instead of
    committing a replace that would leave the append's rows
    duplicating merged keys; a rerun then succeeds and sees BOTH the
    late append and the merge."""
    import pytest

    from powerpoint_context_extractor_spark.sources.table_io import (
        SnapshotTable,
    )
    root = str(tmp_path / "t")
    tbl = SnapshotTable(root)
    tbl.append(spark.createDataFrame(
        [(i, f"old{i}") for i in range(5)], "k long, v string"), "base")

    # inject the race at the validation seam: a REAL append through a
    # second handle lands after the merge captured its `replaces` list
    # but before its commit — exactly the window the ADVICE describes
    real_validate = tbl._validate_optimistic
    fired = {"n": 0}

    def racy_validate(expected_ids):
        if fired["n"] == 0:
            fired["n"] += 1
            SnapshotTable(root).append(spark.createDataFrame(
                [(2, "late2")], "k long, v string"), "late")
        real_validate(expected_ids)

    tbl._validate_optimistic = racy_validate
    src = spark.createDataFrame([(2, "merged2")], "k long, v string")
    with pytest.raises(RuntimeError, match="optimistic-concurrency"):
        tbl.merge(spark, src, "k")
    tbl._validate_optimistic = real_validate
    # nothing replaced: base + late append both live, no merge commit
    live = {s["run_id"] for s in tbl.snapshots()}
    assert live == {"base", "late"}
    # lock was released on abort; rerun succeeds against the new state
    tbl.merge(spark, src, "k")
    got = sorted((r["k"], r["v"]) for r in tbl.read(spark).collect())
    # k=2 resolved by the rerun merge: exactly ONE row, the source's
    assert got == [(0, "old0"), (1, "old1"), (2, "merged2"),
                   (3, "old3"), (4, "old4")]
    # the unit seam directly: stale expected-ids raise, current pass
    cur_ids = {s["snapshot_id"] for s in tbl.snapshots()}
    tbl._validate_optimistic(cur_ids)
    with pytest.raises(RuntimeError, match="optimistic-concurrency"):
        tbl._validate_optimistic(set())    # pretends no snapshot seen


def test_stats_pruning_and_incremental_read(spark, tmp_path):
    """r7: footer-stats file skipping prunes exactly the out-of-range
    files (metadata only — the skip count is pinned), fully-pruned
    ranges return None, stats-less columns never skip blind; and
    read_changes returns exactly the post-anchor appends, returns
    None for nothing-new, raises on unknown anchors and on
    replace-commits after the anchor."""
    import pytest

    from powerpoint_context_extractor_spark.sources.table_io import (
        SnapshotTable,
    )
    tbl = SnapshotTable(str(tmp_path / "t"))
    snaps = []
    for k in range(4):
        df = spark.createDataFrame(
            [(k * 100 + i, f"v{k}-{i}") for i in range(100)],
            "k long, v string").coalesce(1)
        snaps.append(tbl.append(df, f"run-{k}"))
    files, skipped = tbl._pruned_files("k", 150, 260)
    assert skipped == 2 and len(files) == 2       # files 0 and 3 skip
    got = sorted(r["k"] for r in
                 tbl.read_pruned(spark, "k", 150, 260).collect())
    assert got == list(range(150, 261))
    assert tbl.read_pruned(spark, "k", 10_000, 20_000) is None
    # string column has stats too; a bogus column never skips
    f2, s2 = tbl._pruned_files("nope", 0, 1)
    assert s2 == 0 and len(f2) == 4
    # incremental read: everything after snapshot 1
    inc = sorted(r["k"] for r in
                 tbl.read_changes(spark,
                                  snaps[1]["snapshot_id"]).collect())
    assert inc == list(range(200, 400))
    assert tbl.read_changes(spark, snaps[3]["snapshot_id"]) is None
    with pytest.raises(ValueError, match="unknown snapshot"):
        tbl.read_changes(spark, "nope")
    tbl.compact(spark, run_id="c")
    with pytest.raises(ValueError, match="replace commit"):
        tbl.read_changes(spark, snaps[1]["snapshot_id"])
