"""Tests for the from-scratch snapshot/manifest table format
(sources/icetable.py): stats pruning, time travel, atomic commits,
copy-on-write MERGE."""

from __future__ import annotations

import os

import pytest

from pdf_extractor_spark.sources import icetable as it

STATS = ["doc_id", "host"]


def _df(spark, lo, hi, host="a.com"):
    return spark.createDataFrame(
        [(i, host, f"text {i}") for i in range(lo, hi)],
        "doc_id long, host string, text string",
    ).coalesce(1)


class TestIceTable:
    def test_create_append_read(self, spark, tmp_path):
        path = str(tmp_path / "t")
        it.create_table(_df(spark, 0, 100), path, STATS)
        it.append(_df(spark, 100, 150), path, STATS)
        got = it.read_table(spark, path)
        assert got.count() == 150
        assert got.select("doc_id").distinct().count() == 150

    def test_stats_pruning_skips_files(self, spark, tmp_path):
        path = str(tmp_path / "t")
        it.create_table(_df(spark, 0, 100), path, STATS)
        for lo in range(100, 500, 100):
            it.append(_df(spark, lo, lo + 100), path, STATS)
        all_files = it.plan_files(path)
        assert len(all_files) == 5
        # a point lookup must plan exactly one file...
        pruned = it.plan_files(path, ("doc_id", "=", 250))
        assert len(pruned) == 1
        # ...and the pruned read equals the full filtered read
        fast = it.read_table(
            spark, path, ("doc_id", "between", (150, 349))
        )
        # [150, 349] overlaps the 100s, 200s and 300s files
        assert len(it.plan_files(
            path, ("doc_id", "between", (150, 349)))) == 3
        full = it.read_table(spark, path).where(
            "doc_id between 150 and 349"
        )
        assert (
            fast.where("doc_id between 150 and 349").count()
            == full.count()
            == 200
        )

    def test_empty_plan_returns_schema(self, spark, tmp_path):
        path = str(tmp_path / "t")
        it.create_table(_df(spark, 0, 10), path, STATS)
        got = it.read_table(spark, path, ("doc_id", ">", 10_000))
        assert got.count() == 0
        assert got.columns == ["doc_id", "host", "text"]

    def test_time_travel(self, spark, tmp_path):
        path = str(tmp_path / "t")
        s1 = it.create_table(_df(spark, 0, 10), path, STATS)
        s2 = it.append(_df(spark, 10, 30), path, STATS)
        assert it.read_table(spark, path, snap_id=s1).count() == 10
        assert it.read_table(spark, path, snap_id=s2).count() == 30
        log = it.snapshot_log(path)
        assert [s["operation"] for s in log] == ["create", "append"]
        assert [s["n_rows"] for s in log] == [10, 30]

    def test_merge_rewrites_only_overlapping_files(self, spark, tmp_path):
        path = str(tmp_path / "t")
        it.create_table(_df(spark, 0, 100), path, STATS)
        it.append(_df(spark, 100, 200), path, STATS)
        before = {e["path"] for e in it.plan_files(path)}
        # upsert keys 150-159: only the second file overlaps
        upd = spark.createDataFrame(
            [(i, "a.com", f"UPDATED {i}") for i in range(150, 160)],
            "doc_id long, host string, text string",
        ).coalesce(1)
        it.merge_upsert(spark, upd, path, "doc_id", STATS)
        after = {e["path"] for e in it.plan_files(path)}
        # the 0-99 file carried over by reference
        carried = before & after
        assert len(carried) == 1
        got = it.read_table(spark, path)
        assert got.count() == 200  # no dup, no loss
        updated = got.where("doc_id = 155").collect()[0]
        assert updated.text == "UPDATED 155"

    def test_crash_between_snapshot_and_pointer_is_invisible(
        self, spark, tmp_path
    ):
        path = str(tmp_path / "t")
        s1 = it.create_table(_df(spark, 0, 10), path, STATS)
        # simulate a crash: snapshot file exists, VERSION not flipped
        import json

        fake = {
            "snapshot_id": s1 + 1,
            "parent": s1,
            "operation": "append",
            "committed_at": 0,
            "manifest": [],
        }
        with open(it._snap_path(path, s1 + 1), "w") as fh:
            json.dump(fake, fh)
        assert it.current_snapshot_id(path) == s1
        assert it.read_table(spark, path).count() == 10

    def test_commit_conflict_detected(self, spark, tmp_path):
        path = str(tmp_path / "t")
        it.create_table(_df(spark, 0, 10), path, STATS)
        manifest = it.read_snapshot(path)["manifest"]
        # a competing writer advances the table
        it.append(_df(spark, 10, 20), path, STATS)
        with pytest.raises(it.CommitConflict):
            it._commit(path, manifest, parent=1, operation="append")

    def test_reader_never_lists_the_directory(self, spark, tmp_path):
        # an orphan parquet dropped into data/ (a failed writer's
        # debris) must be invisible: the manifest defines the table
        path = str(tmp_path / "t")
        it.create_table(_df(spark, 0, 10), path, STATS)
        orphan = _df(spark, 1000, 1010)
        orphan.write.parquet(str(tmp_path / "orphan"))
        import shutil

        src = next(
            f
            for f in os.listdir(str(tmp_path / "orphan"))
            if f.endswith(".parquet")
        )
        shutil.copy(
            str(tmp_path / "orphan" / src),
            os.path.join(it._data_dir(path), "orphan.parquet"),
        )
        assert it.read_table(spark, path).count() == 10


class TestExtractToTable:
    def test_resume_and_upsert_on_the_table(self, spark, tmp_path):
        from pdf_extractor_spark.fixtures.corpus import (
            build_pages_frame,
        )
        from pdf_extractor_spark.sources.icetable import (
            extract_to_table,
        )
        from pdf_extractor_spark.sources.pages import (
            pages_from_pandas,
        )

        path = str(tmp_path / "extracted")
        frame = build_pages_frame()
        w1, w2 = frame.iloc[:10], frame.iloc[10:20]

        s1 = extract_to_table(
            spark, pages_from_pandas(spark, w1), path, 2
        )
        assert s1 == 1
        assert it.read_table(spark, path).count() == 10

        # second wave: only the new urls extract, one new snapshot
        both = pages_from_pandas(
            spark,
            __import__("pandas").concat([w1, w2], ignore_index=True),
        )
        s2 = extract_to_table(spark, both, path, 2)
        assert s2 == 2
        got = it.read_table(spark, path)
        assert got.count() == 20
        assert got.select("url").distinct().count() == 20

        # third run with nothing new: NO new snapshot (true no-op)
        assert extract_to_table(spark, both, path, 2) is None
        assert it.current_snapshot_id(path) == 2

        # recrawl upsert: same urls re-extracted, still 20 rows, new
        # snapshot; time travel to s2 still shows the old commit
        s4 = extract_to_table(
            spark,
            pages_from_pandas(spark, w1),
            path,
            2,
            upsert=True,
        )
        assert s4 == 3
        assert it.read_table(spark, path).count() == 20
        assert it.read_table(spark, path, snap_id=2).count() == 20
        ops = [s["operation"] for s in it.snapshot_log(path)]
        assert ops == ["create", "append", "merge"]


class TestMaintenance:
    def test_compact_is_data_neutral(self, spark, tmp_path):
        path = str(tmp_path / "t")
        it.create_table(_df(spark, 0, 50), path, STATS)
        for lo in range(50, 250, 50):
            it.append(_df(spark, lo, lo + 50), path, STATS)
        pre = it.read_table(spark, path)
        pre_ids = sorted(r.doc_id for r in pre.select("doc_id").collect())
        s_before = it.current_snapshot_id(path)
        sid = it.compact(spark, path, STATS, min_rows=100)
        assert sid == s_before + 1
        assert len(it.plan_files(path)) == 1  # 5 small -> 1 file
        post_ids = sorted(
            r.doc_id
            for r in it.read_table(spark, path).select("doc_id").collect()
        )
        assert post_ids == pre_ids
        # the pre-compaction snapshot still reads its own files
        assert it.read_table(spark, path, snap_id=s_before).count() == 250

    def test_compact_noop_when_nothing_small(self, spark, tmp_path):
        path = str(tmp_path / "t")
        it.create_table(_df(spark, 0, 50), path, STATS)
        assert it.compact(spark, path, STATS, min_rows=10) is None

    def test_expire_deletes_unreachable_files_only(self, spark, tmp_path):
        path = str(tmp_path / "t")
        it.create_table(_df(spark, 0, 100), path, STATS)
        it.append(_df(spark, 100, 200), path, STATS)
        # merge rewrites the second file: its old version becomes
        # unreachable once the pre-merge snapshots expire
        upd = spark.createDataFrame(
            [(150, "a.com", "X")],
            "doc_id long, host string, text string",
        ).coalesce(1)
        it.merge_upsert(spark, upd, path, "doc_id", STATS)
        n_data = len(os.listdir(it._data_dir(path)))
        stats = it.expire_snapshots(path, keep_last=1)
        assert stats["snapshots_removed"] == 2
        assert stats["files_removed"] >= 1
        assert len(os.listdir(it._data_dir(path))) < n_data
        # current snapshot intact, full row count preserved
        assert it.read_table(spark, path).count() == 200
        # history beyond the horizon is gone and the log terminates
        assert len(it.snapshot_log(path)) == 1


class TestSchemaEvolution:
    def test_added_column_nulls_for_old_files(self, spark, tmp_path):
        path = str(tmp_path / "t")
        s1 = it.create_table(_df(spark, 0, 10), path, STATS)
        wide = spark.createDataFrame(
            [(i, "b.com", f"text {i}", "en") for i in range(10, 20)],
            "doc_id long, host string, text string, lang string",
        ).coalesce(1)
        it.append(wide, path, STATS)
        got = it.read_table_merged(spark, path)
        assert set(got.columns) == {"doc_id", "host", "text", "lang"}
        assert got.count() == 20
        # pre-evolution rows: lang is null; post: populated
        assert got.where("lang is null").count() == 10
        assert got.where("lang = 'en'").count() == 10
        # old files were NOT rewritten
        assert it.read_table(spark, path, snap_id=s1).columns == [
            "doc_id", "host", "text",
        ]


class TestMetadataCount:
    def test_count_without_reading_data(self, spark, tmp_path):
        path = str(tmp_path / "t")
        it.create_table(_df(spark, 0, 100), path, STATS)
        it.append(_df(spark, 100, 250), path, STATS)
        assert it.count_rows(path) == (250, True)
        # fully-covered range: exact from metadata alone
        n, exact = it.count_rows(path, ("doc_id", "between", (0, 99)))
        assert (n, exact) == (100, True)
        # straddling range: upper bound, flagged inexact
        n, exact = it.count_rows(path, ("doc_id", "between", (50, 149)))
        assert n == 250 and exact is False
        # data files deleted out from under it: metadata still answers
        for e in it.plan_files(path):
            os.remove(e["path"])
        assert it.count_rows(path) == (250, True)


class TestTornCommitChaos:
    """Kill-and-resume chaos on the MERGE path (VERDICT r4 #7): a
    write killed mid-flight leaves partial parquet / an orphan
    snapshot / a torn VERSION tmp on disk; the table must read as if
    the merge never started, and a re-run must produce EXACTLY-ONCE
    output with no duplicate or lost keys."""

    def _expect_after_merge(self):
        # base 0..99 ('a.com'), merge rewrites 40..59 ('new.com')
        return {
            i: ("new.com" if 40 <= i < 60 else "a.com")
            for i in range(100)
        }

    def _assert_exactly_once(self, spark, path):
        got = {
            r["doc_id"]: r["host"]
            for r in it.read_table(spark, path).collect()
        }
        rows = it.read_table(spark, path).count()
        assert rows == len(got) == 100  # count == distinct: no dups
        assert got == self._expect_after_merge()

    def test_kill_before_commit_then_rerun(
        self, spark, tmp_path, monkeypatch
    ):
        path = str(tmp_path / "t")
        it.create_table(_df(spark, 0, 100), path, STATS)
        v1 = it.current_snapshot_id(path)
        incoming = _df(spark, 40, 60, host="new.com")

        # kill AFTER the data files land but BEFORE the snapshot
        # write — the orphan parquet stays on disk forever
        real_commit = it._commit

        def killed(*a, **k):
            raise RuntimeError("simulated kill mid-merge")

        monkeypatch.setattr(it, "_commit", killed)
        with pytest.raises(RuntimeError, match="simulated kill"):
            it.merge_upsert(spark, incoming, path, "doc_id", STATS)
        monkeypatch.setattr(it, "_commit", real_commit)

        n_data = len(os.listdir(it._data_dir(path)))
        assert n_data > len(it.plan_files(path))  # orphans exist
        # the torn merge is invisible: still snapshot v1, old rows
        assert it.current_snapshot_id(path) == v1
        assert it.read_table(spark, path).where(
            "host = 'new.com'"
        ).count() == 0

        # resume: re-run the SAME merge; exactly-once output
        it.merge_upsert(spark, incoming, path, "doc_id", STATS)
        self._assert_exactly_once(spark, path)
        # orphan data files are still not referenced by any manifest
        referenced = {
            e["path"] for e in it.read_snapshot(path)["manifest"]
        }
        on_disk = {
            os.path.join(it._data_dir(path), n)
            for n in os.listdir(it._data_dir(path))
        }
        assert referenced < on_disk  # strict subset: orphans remain

    def test_partial_parquet_and_torn_version_tmp(
        self, spark, tmp_path
    ):
        path = str(tmp_path / "t")
        it.create_table(_df(spark, 0, 100), path, STATS)
        v1 = it.current_snapshot_id(path)

        # half-written parquet (kill mid-os.write, before rename
        # into the manifest): valid magic, truncated body
        some = it.plan_files(path)[0]["path"]
        with open(some, "rb") as fh:
            whole = fh.read()
        torn = os.path.join(
            it._data_dir(path), "deadbeef00000000.parquet"
        )
        with open(torn, "wb") as fh:
            fh.write(whole[: len(whole) // 2])
        # torn snapshot pointer: a stray VERSION tmp never renamed
        with open(it._version_file(path) + ".tmp-dead", "w") as fh:
            fh.write("999")
        # orphan snapshot json for an id that never committed
        orphan_snap = {"snapshot_id": v1 + 1, "parent": v1,
                       "operation": "merge", "manifest": []}
        import json as _json

        with open(it._snap_path(path, v1 + 1), "w") as fh:
            _json.dump(orphan_snap, fh)

        # reads never touch any of the debris
        assert it.current_snapshot_id(path) == v1
        assert it.read_table(spark, path).count() == 100

        # the re-run merge commits OVER the orphan snapshot id and
        # flips the pointer atomically
        incoming = _df(spark, 40, 60, host="new.com")
        v2 = it.merge_upsert(spark, incoming, path, "doc_id", STATS)
        assert v2 == v1 + 1
        assert it.current_snapshot_id(path) == v2
        self._assert_exactly_once(spark, path)
        # the torn parquet is still unreferenced
        referenced = {
            e["path"] for e in it.read_snapshot(path)["manifest"]
        }
        assert torn not in referenced

    def test_double_resume_is_idempotent(self, spark, tmp_path):
        # resume logic re-applied on an ALREADY merged table must
        # not duplicate rows (same-key upsert is idempotent)
        path = str(tmp_path / "t")
        it.create_table(_df(spark, 0, 100), path, STATS)
        incoming = _df(spark, 40, 60, host="new.com")
        it.merge_upsert(spark, incoming, path, "doc_id", STATS)
        it.merge_upsert(spark, incoming, path, "doc_id", STATS)
        self._assert_exactly_once(spark, path)


class TestRemoveOrphanFiles:
    """remove_orphan_files: the cleanup pass that makes torn-commit
    debris bounded instead of permanent, with the mtime grace guard
    protecting in-flight writers."""

    def _plant_debris(self, spark, path):
        # torn merge: data files landed, commit never happened
        import pytest as _pytest

        real = it._commit
        it._commit = lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("kill")
        )
        try:
            with _pytest.raises(RuntimeError):
                it.merge_upsert(
                    spark, _df(spark, 40, 60, host="new.com"),
                    path, "doc_id", STATS,
                )
        finally:
            it._commit = real
        # torn VERSION tmp + orphan snapshot + staging leftovers
        with open(it._version_file(path) + ".tmp-x", "w") as fh:
            fh.write("999")
        import json as _json

        sid = it.current_snapshot_id(path)
        with open(it._snap_path(path, sid + 7), "w") as fh:
            _json.dump({"snapshot_id": sid + 7, "parent": sid,
                        "operation": "merge", "manifest": []}, fh)
        stag = os.path.join(path, "_staging-dead")
        os.makedirs(stag)
        with open(os.path.join(stag, "part-0.parquet"), "wb") as fh:
            fh.write(b"partial")

    def test_grace_guard_protects_fresh_debris(self, spark, tmp_path):
        path = str(tmp_path / "t")
        it.create_table(_df(spark, 0, 100), path, STATS)
        self._plant_debris(spark, path)
        n_data = len(os.listdir(it._data_dir(path)))
        # default grace: everything is newer than 3 days — untouched
        counts = it.remove_orphan_files(path)
        assert counts == {"data_files_removed": 0,
                          "snapshots_removed": 0, "tmp_removed": 0,
                          "staging_removed": 0}
        assert len(os.listdir(it._data_dir(path))) == n_data

    def test_aged_debris_is_removed_and_table_intact(
        self, spark, tmp_path
    ):
        path = str(tmp_path / "t")
        it.create_table(_df(spark, 0, 100), path, STATS)
        self._plant_debris(spark, path)
        counts = it.remove_orphan_files(path, grace_sec=0)
        assert counts["data_files_removed"] > 0
        assert counts["snapshots_removed"] == 1
        assert counts["tmp_removed"] == 1
        assert counts["staging_removed"] == 1
        # every live file survived; the table reads identically
        assert it.read_table(spark, path).count() == 100
        live = {e["path"] for e in it.read_snapshot(path)["manifest"]}
        on_disk = {
            os.path.join(it._data_dir(path), n)
            for n in os.listdir(it._data_dir(path))
        }
        assert live == on_disk  # nothing but live files remain
        # and the table still accepts the resumed merge afterwards
        it.merge_upsert(
            spark, _df(spark, 40, 60, host="new.com"),
            path, "doc_id", STATS,
        )
        got = it.read_table(spark, path)
        assert got.count() == 100
        assert got.where("host = 'new.com'").count() == 20


def test_commit_conflict_retry_succeeds(spark, tmp_path):
    """The optimistic-concurrency story end to end: writer B loses
    the race, sees CommitConflict, re-reads the advanced table and
    retries the same upsert — exactly-once outcome."""
    path = str(tmp_path / "t")
    it.create_table(_df(spark, 0, 100), path, STATS)
    a = _df(spark, 100, 110, host="a-wins.com")  # disjoint keys
    b = _df(spark, 40, 60, host="b-retry.com")
    # writer A commits between B's read and B's commit: simulate by
    # wrapping _commit so B's FIRST attempt sees the table advance
    real_commit = it._commit
    state = {"raced": False}

    def racing_commit(p, manifest, parent, operation):
        if not state["raced"]:
            state["raced"] = True
            real_commit(
                p,
                it.read_snapshot(p)["manifest"]
                + it._write_data_files(a, p, STATS),
                parent,
                "merge",
            )  # A slips in with B's expected parent
        return real_commit(p, manifest, parent, operation)

    it._commit = racing_commit
    try:
        with pytest.raises(it.CommitConflict):
            it.merge_upsert(spark, b, path, "doc_id", STATS)
    finally:
        it._commit = real_commit
    # retry after the conflict: plain re-invocation now succeeds
    it.merge_upsert(spark, b, path, "doc_id", STATS)
    got = it.read_table(spark, path)
    assert got.count() == got.select("doc_id").distinct().count() == 110
    assert got.where("host = 'b-retry.com'").count() == 20
    assert got.where("host = 'a-wins.com'").count() == 10  # A survived
