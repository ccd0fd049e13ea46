"""Versioned table (time travel / change feed) — sources/versioned.py.

Extends the reference's latest+timestamped dual write
(reference_endpoints_etl.py:57-62) into an atomic, append-only commit log.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest

from polygon_algotrading_env_spark.sources.versioned import (
    SchemaMismatchError,
    VersionConflictError,
    VersionedTable,
)


@pytest.fixture()
def root():
    d = tempfile.mkdtemp(prefix="pae_spark_vt_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _df(spark, ids):
    return spark.createDataFrame([(i, f"r{i}") for i in ids], "id long, tag string")


def test_append_and_time_travel(spark, root):
    t = VersionedTable(spark, root)
    assert t.write(_df(spark, [1, 2])) == 0
    assert t.write(_df(spark, [3])) == 1
    assert sorted(r.id for r in t.read().collect()) == [1, 2, 3]
    assert sorted(r.id for r in t.read(version=0).collect()) == [1, 2]


def test_overwrite_keeps_history(spark, root):
    t = VersionedTable(spark, root)
    t.write(_df(spark, [1, 2]))
    t.write(_df(spark, [9]), mode="overwrite")
    assert [r.id for r in t.read().collect()] == [9]
    assert sorted(r.id for r in t.read(version=0).collect()) == [1, 2]
    modes = [c.mode for c in t.history()]
    assert modes == ["append", "overwrite"]


def test_as_of_timestamp(spark, root):
    t = VersionedTable(spark, root)
    t.write(_df(spark, [1]))
    ts0 = t.history()[0].timestamp
    t.write(_df(spark, [2]))
    assert [r.id for r in t.read(as_of_timestamp=ts0).collect()] == [1]
    with pytest.raises(FileNotFoundError):
        t.read(as_of_timestamp=ts0 - 1000)


def test_change_feed(spark, root):
    t = VersionedTable(spark, root)
    t.write(_df(spark, [1, 2]))
    t.write(_df(spark, [3]))
    t.write(_df(spark, [4]))
    assert sorted(r.id for r in t.read_changes(1).collect()) == [3, 4]
    assert sorted(r.id for r in t.read_changes(1, 1).collect()) == [3]
    t.write(_df(spark, [0]), mode="overwrite")
    with pytest.raises(ValueError, match="change feed"):
        t.read_changes(1)


def test_rollback_is_append_only(spark, root):
    t = VersionedTable(spark, root)
    t.write(_df(spark, [1]))
    t.write(_df(spark, [2]))
    v = t.rollback(0)
    assert v == 2
    assert [r.id for r in t.read().collect()] == [1]
    assert sorted(r.id for r in t.read(version=1).collect()) == [1, 2]


def test_append_schema_guard(spark, root):
    t = VersionedTable(spark, root)
    t.write(_df(spark, [1]))
    bad = spark.createDataFrame([(1, 2.0)], "id long, other double")
    with pytest.raises(SchemaMismatchError):
        t.write(bad)
    # overwrite may change schema
    t.write(bad, mode="overwrite")
    assert t.read().columns == ["id", "other"]


def test_version_conflict(spark, root):
    t1 = VersionedTable(spark, root)
    t1.write(_df(spark, [1]))
    # simulate a racing writer that already committed version 1
    t1._commit(
        {
            "version": 1,
            "parent": 0,
            "mode": "append",
            "timestamp": 0.0,
            "live": ["data/v0"],
            "schema": _df(spark, [1]).schema.json(),
        }
    )
    with pytest.raises(VersionConflictError):
        t1._commit({"version": 1, "parent": 0, "mode": "append", "timestamp": 0.0,
                    "live": [], "schema": "{}"})


def test_vacuum(spark, root):
    t = VersionedTable(spark, root)
    t.write(_df(spark, [1]))
    t.write(_df(spark, [2]), mode="overwrite")
    victims = t.vacuum(keep_versions=1, min_age_seconds=0)
    v0_live = list(t._read_manifest(0)["live"])
    assert victims == v0_live
    t.vacuum(keep_versions=1, dry_run=False, min_age_seconds=0)
    with pytest.raises(Exception):
        t.read(version=0).collect()
    assert [r.id for r in t.read().collect()] == [2]


def test_stream_changes_incremental(spark, root, tmp_path):
    t = VersionedTable(spark, root)
    t.write(_df(spark, [1, 2]))
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (
            t.stream_changes()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    assert sorted(r.id for r in spark.read.parquet(sink).collect()) == [1, 2]
    t.write(_df(spark, [3]))
    drain()
    assert sorted(r.id for r in spark.read.parquet(sink).collect()) == [1, 2, 3]


def test_stream_changes_refuses_overwrites(spark, root):
    t = VersionedTable(spark, root)
    t.write(_df(spark, [1]))
    t.write(_df(spark, [2]), mode="overwrite")
    with pytest.raises(ValueError, match="append-only"):
        t.stream_changes()


def test_concurrent_writers_never_clobber(spark, root):
    """Write-then-commit: a loser whose manifest commit conflicts must NOT
    touch the winner's data files — it retries the commit at the next
    version with its already-written unique directory."""
    t1 = VersionedTable(spark, root)
    t2 = VersionedTable(spark, root)
    t1.write(_df(spark, [1]))

    # Interleave: when t1 is about to commit its next write, t2 sneaks in a
    # full write() that wins the version race.
    orig_commit = t1._commit
    injected = {"done": False}

    def racing_commit(manifest):
        if not injected["done"]:
            injected["done"] = True
            t2.write(_df(spark, [100]))  # wins version 1
        orig_commit(manifest)  # t1's first attempt now conflicts

    t1._commit = racing_commit
    v = t1.write(_df(spark, [2]))
    assert v == 2  # retried past the winner
    # Both writers' rows are intact and visible.
    assert sorted(r.id for r in t1.read().collect()) == [1, 2, 100]
    # History: three appends, each with its own immutable directory.
    dirs = [d for m in t1.history() for d in m.live]
    assert len(set(dirs)) == 3


def test_failed_commit_cleans_orphan_data(spark, root):
    t = VersionedTable(spark, root)
    t.write(_df(spark, [1]))

    def always_conflict(manifest):
        raise VersionConflictError("simulated contention")

    t._commit = always_conflict
    import os

    before = set(os.listdir(os.path.join(root, "data")))
    with pytest.raises(VersionConflictError):
        t.write(_df(spark, [2]), max_commit_retries=2)
    after = set(os.listdir(os.path.join(root, "data")))
    assert after == before  # the orphaned unique directory was removed


def test_vacuum_retention_age_protects_young_dirs(spark, root):
    t = VersionedTable(spark, root)
    t.write(_df(spark, [1]))
    t.write(_df(spark, [2]), mode="overwrite")
    # v0's dir is unreferenced but too young to collect at default age.
    assert t.vacuum(keep_versions=1) == []
    assert len(t.vacuum(keep_versions=1, min_age_seconds=0)) == 1


def test_merge_upsert(spark, root):
    t = VersionedTable(spark, root)
    # Merge into empty table = insert.
    assert t.merge_upsert(_df(spark, [1, 2, 3]), "id") == 0

    updates = spark.createDataFrame(
        [(2, "UPDATED"), (9, "NEW")], "id long, tag string"
    )
    v = t.merge_upsert(updates, "id")
    assert v == 1
    rows = {r["id"]: r["tag"] for r in t.read().collect()}
    assert rows == {1: "r1", 2: "UPDATED", 3: "r3", 9: "NEW"}
    # Time travel still sees the pre-merge state.
    pre = {r["id"]: r["tag"] for r in t.read(version=0).collect()}
    assert pre == {1: "r1", 2: "r2", 3: "r3"}
    assert t.history()[-1].mode == "merge"


def test_merge_upsert_rejects_duplicate_keys(spark, root):
    t = VersionedTable(spark, root)
    t.write(_df(spark, [1]))
    dups = spark.createDataFrame(
        [(5, "a"), (5, "b")], "id long, tag string"
    )
    with pytest.raises(ValueError, match="duplicate key"):
        t.merge_upsert(dups, "id")


def test_merge_upsert_schema_guard(spark, root):
    t = VersionedTable(spark, root)
    t.write(_df(spark, [1]))
    other = spark.createDataFrame([(1, 2.0)], "id long, price double")
    with pytest.raises(SchemaMismatchError):
        t.merge_upsert(other, "id")


def test_delete_where(spark, root):
    t = VersionedTable(spark, root)
    t.write(_df(spark, [1, 2, 3, 4]))
    v = t.delete_where("id in (2, 4)")
    assert v == 1
    assert sorted(r.id for r in t.read().collect()) == [1, 3]
    # Audit trail: pre-delete snapshot intact until vacuum; mode recorded.
    assert sorted(r.id for r in t.read(version=0).collect()) == [1, 2, 3, 4]
    assert t.history()[-1].mode == "delete"


def test_delete_where_null_predicate_keeps_rows(spark, root):
    t = VersionedTable(spark, root)
    rows = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "x")], "id long, tag string"
    )
    t.write(rows)
    t.delete_where("tag = 'x'")
    # The NULL-tag row did not match -> it must survive.
    assert sorted(r.id for r in t.read().collect()) == [1, 2]


def test_compact_preserves_contents_and_reduces_files(spark, root):
    import glob
    import os

    t = VersionedTable(spark, root)
    for lo in range(0, 40, 10):  # 4 append commits, several files each
        t.write(_df(spark, range(lo, lo + 10)).repartition(4), mode="append")
    before = sorted(r["id"] for r in t.read().collect())
    n_files_before = len(glob.glob(os.path.join(root, "data", "*", "*.parquet")))
    v = t.compact(target_files=2)
    assert v == t.latest_version()
    after = sorted(r["id"] for r in t.read().collect())
    assert after == before == list(range(40))
    live = t._read_manifest(v)["live"]
    assert len(live) == 1
    n_live_files = len(
        glob.glob(os.path.join(root, live[0], "*.parquet"))
    )
    assert n_live_files == 2 < n_files_before
    # time travel to the pre-compact version still works
    assert sorted(r["id"] for r in t.read(version=v - 1).collect()) == before


def test_change_feed_skips_compact_commits(spark, root):
    t = VersionedTable(spark, root)
    t.write(_df(spark, [1, 2]), mode="append")          # v0
    t.write(_df(spark, [3]), mode="append")             # v1
    t.compact(target_files=1)                           # v2 — no new rows
    t.write(_df(spark, [4]), mode="append")             # v3
    got = sorted(r["id"] for r in t.read_changes(1, 3).collect())
    assert got == [3, 4]


def test_stream_changes_refuses_compacted_history(spark, root):
    t = VersionedTable(spark, root)
    t.write(_df(spark, [1]), mode="append")
    t.compact(target_files=1)
    with pytest.raises(ValueError, match="compact"):
        t.stream_changes()


def test_vacuum_reclaims_precompact_files(spark, root):
    import os

    t = VersionedTable(spark, root)
    t.write(_df(spark, [1, 2]), mode="append")
    t.write(_df(spark, [3]), mode="append")
    t.compact(target_files=1)
    victims = t.vacuum(keep_versions=1, dry_run=False, min_age_seconds=0.0)
    assert len(victims) == 2  # both pre-compact append dirs reclaimed
    assert sorted(r["id"] for r in t.read().collect()) == [1, 2, 3]
    for d in victims:
        assert not os.path.exists(os.path.join(root, d))
