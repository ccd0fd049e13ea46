"""Versioned parquet tables — manifest-based time travel (Delta-lite).

The reference approximates history with a dual write: a stable "latest"
location plus timestamped snapshot keys (reference_endpoints_etl.py:57-62,
aggregates_stocks_etl.py:90-93).  That gives point-in-time reads but no
atomic commits, no lineage between snapshots, and full-copy storage cost
per snapshot.  This module supplies the real thing with the public
transaction-log design (Delta Lake / Iceberg papers): data files are
immutable, and a tiny JSON manifest per commit records which data
directories are live at that version.

Layout::

    <root>/_manifests/v000000000042.json   one small JSON per commit
    <root>/data/c<uuid>/part-*.parquet     immutable files for one commit

Each manifest holds ``{version, parent, mode, timestamp, live, schema}``
where ``live`` is the list of data directories visible at that version —
append commits extend the parent's list, overwrite commits replace it.
Reading version N is just ``spark.read.parquet(*live_dirs)``.

Scale notes (100 TB / 1000 executors):

- The log is O(commits), not O(files): manifests name *directories*; the
  per-file listing inside them is Spark's own distributed file index.
- Commit = one small file created with ``O_CREAT|O_EXCL`` — atomic on
  POSIX/HDFS; on S3 use a conditional PUT (if-none-match) for the same
  optimistic-concurrency guarantee.  Two writers racing to the same
  version: exactly one wins, the loser retries on the next version.
- Write-then-commit: every commit's data lands in its own uniquely named
  directory (``data/c<uuid>``) BEFORE the manifest names it, so a racing
  loser can never clobber the winner's files — on conflict it just
  recomputes the manifest (data already written once) and commits at the
  next version.  Directories never referenced by any manifest (a writer
  that died before committing) are exactly what :meth:`vacuum` reports.
- Appends never rewrite data, so a day's 100 TB ingest is one manifest
  plus its own files; time travel to any prior day is free.
- ``read_changes`` gives incremental consumers (training-data refresh)
  exactly the rows added in a version range without diffing snapshots.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


class VersionConflictError(RuntimeError):
    """Another writer committed this version first — retry the commit."""


class SchemaMismatchError(ValueError):
    """Append schema does not match the table's current schema."""


@dataclass(frozen=True)
class CommitInfo:
    version: int
    parent: int | None
    mode: str
    timestamp: float
    live: tuple[str, ...]
    num_columns: int


class VersionedTable:
    """Append/overwrite versioned table with time travel.

    >>> t = VersionedTable(spark, "/tmp/candles")
    >>> v0 = t.write(day1_df)                # append -> version 0
    >>> v1 = t.write(day2_df)                # append -> version 1
    >>> t.read()                             # latest: day1 + day2
    >>> t.read(version=0)                    # time travel: day1 only
    >>> t.read_changes(start_version=1)      # CDC-lite: day2 only
    >>> t.rollback(0)                        # new commit restoring v0
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root.rstrip("/")
        self._manifest_dir = os.path.join(self.root, "_manifests")

    # ---- log access -----------------------------------------------------

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self._manifest_dir, f"v{version:012d}.json")

    def _read_manifest(self, version: int) -> dict:
        with open(self._manifest_path(version)) as f:
            return json.load(f)

    def latest_version(self) -> int | None:
        if not os.path.isdir(self._manifest_dir):
            return None
        versions = [
            int(name[1:-5])
            for name in os.listdir(self._manifest_dir)
            if name.startswith("v") and name.endswith(".json")
        ]
        return max(versions) if versions else None

    def history(self) -> list[CommitInfo]:
        """All commits, oldest first."""
        latest = self.latest_version()
        if latest is None:
            return []
        out = []
        for v in range(latest + 1):
            m = self._read_manifest(v)
            out.append(
                CommitInfo(
                    version=m["version"],
                    parent=m["parent"],
                    mode=m["mode"],
                    timestamp=m["timestamp"],
                    live=tuple(m["live"]),
                    num_columns=len(json.loads(m["schema"])["fields"]),
                )
            )
        return out

    # ---- writes ---------------------------------------------------------

    def write(
        self, df: DataFrame, mode: str = "append", max_commit_retries: int = 10
    ) -> int:
        """Commit ``df`` as a new version; returns the version number.

        ``mode='append'`` adds the rows to the table; ``'overwrite'``
        replaces the visible contents.  Either way prior versions stay
        readable — data directories are immutable until :meth:`vacuum`.

        Concurrency (the Delta/Iceberg write-then-commit protocol): data
        lands once in a fresh uniquely named directory; only the manifest
        commit races.  A loser never rewrites data — it re-reads the new
        parent, recomputes ``live``, and retries the commit at the next
        version, up to ``max_commit_retries`` times.  If the commit can
        never land (or the writer errors), the orphaned data directory is
        removed before re-raising.
        """
        import shutil
        import uuid

        if mode not in ("append", "overwrite"):
            raise ValueError(f"mode must be append|overwrite, got {mode!r}")
        schema_json = df.schema.json()
        data_dir = f"data/c{uuid.uuid4().hex[:16]}"
        df.write.parquet(os.path.join(self.root, data_dir))
        try:
            for _ in range(max_commit_retries + 1):
                parent = self.latest_version()
                version = 0 if parent is None else parent + 1
                if parent is not None and mode == "append":
                    parent_fields = {
                        f["name"]
                        for f in json.loads(self._read_manifest(parent)["schema"])["fields"]
                    }
                    fields = {f.name for f in df.schema.fields}
                    if fields != parent_fields:
                        raise SchemaMismatchError(
                            f"append columns {sorted(fields)} != table columns "
                            f"{sorted(parent_fields)}"
                        )
                if mode == "append" and parent is not None:
                    live = list(self._read_manifest(parent)["live"]) + [data_dir]
                else:
                    live = [data_dir]
                try:
                    self._commit(
                        {
                            "version": version,
                            "parent": parent,
                            "mode": mode,
                            "timestamp": time.time(),
                            "live": live,
                            "schema": schema_json,
                        }
                    )
                    return version
                except VersionConflictError:
                    continue  # another writer landed this version; recompute
            raise VersionConflictError(
                f"could not commit after {max_commit_retries + 1} attempts"
            )
        except BaseException:
            shutil.rmtree(os.path.join(self.root, data_dir), ignore_errors=True)
            raise

    def merge_upsert(
        self,
        updates: DataFrame,
        key_cols,
        max_commit_retries: int = 10,
    ) -> int:
        """MERGE (insert-or-replace by key): commit a new version whose
        contents are the current snapshot minus rows matching an update
        key, plus every ``updates`` row — the upsert a slowly-changing
        dimension or late-correcting fact feed needs (the reference can
        only full-replace, ``reference_data_etl.py: to_sql
        if_exists='replace'``).

        Plan: snapshot LEFT-ANTI join ``updates`` on the key (broadcast
        when updates are dimension-sized) ∪ updates, landed as one
        overwrite-style commit (mode ``'merge'``). Worst case rewrites the
        visible data — same as Delta's copy-on-write merge without
        deletion vectors; partition-scope the snapshot first for bounded
        rewrites at 100 TB.

        Concurrency: unlike :meth:`write`, the DATA depends on the parent
        snapshot, so a lost commit race discards the stale merge output
        and recomputes from the new parent (optimistic concurrency with
        re-read, the Delta conflict-resolution contract for merges).

        ``updates`` must be key-unique — "both versions of this row win"
        is not a merge; duplicate keys raise.
        """
        import shutil
        import uuid

        keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
        n, n_distinct = (
            updates.count(),
            updates.select(*keys).distinct().count(),
        )
        if n != n_distinct:
            raise ValueError(
                f"updates carry {n - n_distinct} duplicate key(s) on {keys}; "
                "deduplicate (choose a winner) before merging"
            )
        for _ in range(max_commit_retries + 1):
            parent = self.latest_version()
            if parent is None:
                return self.write(updates, mode="append")
            parent_fields = {
                f["name"]
                for f in json.loads(self._read_manifest(parent)["schema"])["fields"]
            }
            fields = {f.name for f in updates.schema.fields}
            if fields != parent_fields:
                raise SchemaMismatchError(
                    f"merge columns {sorted(fields)} != table columns "
                    f"{sorted(parent_fields)}"
                )
            current = self.read(version=parent)
            merged = current.join(
                updates.select(*keys), on=keys, how="left_anti"
            ).unionByName(updates)
            data_dir = f"data/c{uuid.uuid4().hex[:16]}"
            merged.write.parquet(os.path.join(self.root, data_dir))
            try:
                self._commit(
                    {
                        "version": parent + 1,
                        "parent": parent,
                        "mode": "merge",
                        "timestamp": time.time(),
                        "live": [data_dir],
                        "schema": updates.schema.json(),
                    }
                )
                return parent + 1
            except VersionConflictError:
                # The merge output reflects a stale parent — discard and
                # recompute against the commit that beat us.
                shutil.rmtree(
                    os.path.join(self.root, data_dir), ignore_errors=True
                )
                continue
            except BaseException:
                shutil.rmtree(
                    os.path.join(self.root, data_dir), ignore_errors=True
                )
                raise
        raise VersionConflictError(
            f"could not merge after {max_commit_retries + 1} attempts"
        )

    def delete_where(self, condition, max_commit_retries: int = 10) -> int:
        """Row-level DELETE (copy-on-write): commit a new version holding
        every current row NOT matching ``condition`` (a Column or SQL
        string) — the removal-request / right-to-be-forgotten sweep a
        training-data lake must support. Prior versions still contain the
        rows until :meth:`vacuum` reclaims them — run vacuum after the
        retention window to make deletion physical.

        Same optimistic-concurrency contract as :meth:`merge_upsert`: the
        output depends on the parent snapshot, so a lost commit race
        discards the stale rewrite and recomputes.
        """
        import shutil
        import uuid

        import pyspark.sql.functions as F

        cond = F.expr(condition) if isinstance(condition, str) else condition
        for _ in range(max_commit_retries + 1):
            parent = self.latest_version()
            if parent is None:
                raise FileNotFoundError(f"no commits at {self.root}")
            # NULL predicate results mean "did not match" — such rows are
            # KEPT (bare ~cond would silently delete them: ~NULL is NULL,
            # which filter() drops).
            kept = self.read(version=parent).filter(
                ~F.coalesce(cond, F.lit(False))
            )
            data_dir = f"data/c{uuid.uuid4().hex[:16]}"
            kept.write.parquet(os.path.join(self.root, data_dir))
            try:
                self._commit(
                    {
                        "version": parent + 1,
                        "parent": parent,
                        "mode": "delete",
                        "timestamp": time.time(),
                        "live": [data_dir],
                        "schema": self._read_manifest(parent)["schema"],
                    }
                )
                return parent + 1
            except VersionConflictError:
                shutil.rmtree(
                    os.path.join(self.root, data_dir), ignore_errors=True
                )
                continue
            except BaseException:
                shutil.rmtree(
                    os.path.join(self.root, data_dir), ignore_errors=True
                )
                raise
        raise VersionConflictError(
            f"could not delete after {max_commit_retries + 1} attempts"
        )

    def _commit(self, manifest: dict) -> None:
        os.makedirs(self._manifest_dir, exist_ok=True)
        path = self._manifest_path(manifest["version"])
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            raise VersionConflictError(
                f"version {manifest['version']} already committed by another writer"
            ) from None
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f)

    def rollback(self, version: int) -> int:
        """Commit a NEW version whose contents equal ``version`` (the log
        stays append-only — no history is destroyed)."""
        target = self._read_manifest(version)
        parent = self.latest_version()
        assert parent is not None
        self._commit(
            {
                "version": parent + 1,
                "parent": parent,
                "mode": "rollback",
                "timestamp": time.time(),
                "live": target["live"],
                "schema": target["schema"],
            }
        )
        return parent + 1

    # ---- reads ----------------------------------------------------------

    def _resolve(self, version: int | None, as_of_timestamp: float | None) -> int:
        latest = self.latest_version()
        if latest is None:
            raise FileNotFoundError(f"no commits at {self.root}")
        if version is not None:
            if not os.path.exists(self._manifest_path(version)):
                raise FileNotFoundError(f"version {version} not found (latest={latest})")
            return version
        if as_of_timestamp is not None:
            eligible = [
                v for v in range(latest + 1)
                if self._read_manifest(v)["timestamp"] <= as_of_timestamp
            ]
            if not eligible:
                raise FileNotFoundError(
                    f"no version at or before timestamp {as_of_timestamp}"
                )
            return max(eligible)
        return latest

    def read(
        self, version: int | None = None, as_of_timestamp: float | None = None
    ) -> DataFrame:
        """Snapshot read: latest by default, else pinned ``version`` or the
        newest commit with ``timestamp <= as_of_timestamp``."""
        m = self._read_manifest(self._resolve(version, as_of_timestamp))
        paths = [os.path.join(self.root, d) for d in m["live"]]
        return self.spark.read.parquet(*paths)

    def read_changes(
        self, start_version: int, end_version: int | None = None
    ) -> DataFrame:
        """Rows ADDED in versions [start_version, end_version] — the
        change feed an incremental training-data consumer tails.

        Only append commits have a well-defined row-level delta; an
        overwrite/rollback in the range raises so the caller can fall
        back to a full snapshot diff.
        """
        end = self._resolve(end_version, None)
        added: list[str] = []
        for v in range(start_version, end + 1):
            m = self._read_manifest(v)
            if m["mode"] == "compact":
                # Content-preserving rewrite: zero added rows by contract,
                # so the delta is empty — skip it, don't refuse.
                continue
            if m["mode"] != "append":
                raise ValueError(
                    f"version {v} is {m['mode']!r}; change feed is only defined "
                    "over append commits — read a full snapshot instead"
                )
            parent_live = (
                set(self._read_manifest(m["parent"])["live"])
                if m["parent"] is not None
                else set()
            )
            added.extend(d for d in m["live"] if d not in parent_live)
        if not added:
            raise ValueError(f"no data committed in [{start_version}, {end}]")
        return self.spark.read.parquet(*[os.path.join(self.root, d) for d in added])

    # ---- maintenance ----------------------------------------------------

    def vacuum(
        self,
        keep_versions: int = 1,
        dry_run: bool = True,
        min_age_seconds: float = 3600.0,
    ) -> list[str]:
        """Data directories unreferenced by the newest ``keep_versions``
        commits — including orphans from writers that died before their
        manifest commit.  ``dry_run=True`` (default) only reports them;
        pass ``False`` to delete.  Time travel older than the horizon
        stops working — same contract as Delta's VACUUM.

        ``min_age_seconds`` is the in-flight-writer guard (Delta's
        retention window): a directory younger than it is never collected,
        because a written-but-not-yet-committed directory is
        indistinguishable from an orphan.  Set it above the longest
        plausible write-to-commit gap; 0 only in tests."""
        latest = self.latest_version()
        if latest is None:
            return []
        keep = set()
        for v in range(max(0, latest - keep_versions + 1), latest + 1):
            keep.update(self._read_manifest(v)["live"])
        data_root = os.path.join(self.root, "data")
        all_dirs = (
            {f"data/{d}" for d in os.listdir(data_root)}
            if os.path.isdir(data_root)
            else set()
        )
        now = time.time()
        old_enough = {
            d
            for d in all_dirs
            if now - os.path.getmtime(os.path.join(self.root, d)) >= min_age_seconds
        }
        victims = sorted((all_dirs - keep) & old_enough)
        if not dry_run:
            import shutil

            for d in victims:
                shutil.rmtree(os.path.join(self.root, d))
        return victims


    def compact(
        self,
        target_files: int | None = None,
        target_file_mb: int = 128,
    ) -> int:
        """Rewrite the current snapshot into few large files and commit it
        as a content-identical ``mode='compact'`` version — the
        small-files maintenance every append-heavy table needs (a month
        of per-batch commits = thousands of KB-sized parquet files whose
        per-file open/footer cost dominates the scan at 100 TB).

        Output file count is ``target_files`` if given, else
        ceil(live bytes / target_file_mb) — sized from the ACTUAL on-disk
        bytes of the live directories, not row counts. Readers see
        identical rows before and after; ``read_changes`` skips compact
        commits (zero added rows by contract); ``stream_changes`` still
        refuses compacted histories — a file stream cannot express a
        rewrite without re-emitting rows (Delta's ignoreChanges caveat);
        old files become reclaimable by :meth:`vacuum`.

        Concurrency: compaction loses ANY commit race (it must not bury a
        concurrent append's rows under a stale snapshot) — on conflict the
        rewritten directory is removed and ``VersionConflictError``
        propagates; rerun against the new head.
        """
        import math
        import shutil
        import uuid

        parent = self.latest_version()
        if parent is None:
            raise FileNotFoundError(f"no commits at {self.root}")
        manifest = self._read_manifest(parent)
        live = list(manifest["live"])
        total_bytes = 0
        for d in live:
            for dirpath, _dirs, files in os.walk(os.path.join(self.root, d)):
                total_bytes += sum(
                    os.path.getsize(os.path.join(dirpath, f))
                    for f in files
                    if f.endswith(".parquet")
                )
        n_out = target_files or max(
            1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024))
        )
        snapshot = self.read(version=parent).repartition(n_out)
        data_dir = f"data/c{uuid.uuid4().hex[:16]}"
        snapshot.write.parquet(os.path.join(self.root, data_dir))
        try:
            self._commit(
                {
                    "version": parent + 1,
                    "parent": parent,
                    "mode": "compact",
                    "timestamp": time.time(),
                    "live": [data_dir],
                    "schema": manifest["schema"],
                    "compacted_from": parent,
                }
            )
            return parent + 1
        except BaseException:
            shutil.rmtree(os.path.join(self.root, data_dir), ignore_errors=True)
            raise

    # ---- streaming ------------------------------------------------------

    def stream_changes(self):
        """Structured-Streaming change feed: a file-source stream over the
        table's data directories — each append commit's files surface as
        exactly one new micro-batch input (the Delta streaming-source
        pattern, built from the stock parquet file source).

        Contract: append-only tables. Overwrite/rollback rewrite
        *visibility*, not files, so a file stream cannot express them —
        we refuse to start if any non-append commit exists (same
        restriction Delta places on streaming from a changed table
        without ``ignoreChanges``).

        The stream tracks its own progress in the query checkpoint, so a
        restarted consumer resumes from the last processed commit — no
        bookmark table needed.
        """
        from pyspark.sql.types import StructType

        latest = self.latest_version()
        if latest is None:
            raise FileNotFoundError(f"no commits at {self.root}")
        for v in range(latest + 1):
            mode = self._read_manifest(v)["mode"]
            if mode != "append":
                raise ValueError(
                    f"version {v} is {mode!r}; stream_changes requires an "
                    "append-only history — consume snapshots instead"
                )
        schema = StructType.fromJson(
            json.loads(self._read_manifest(latest)["schema"])
        )
        return (
            self.spark.readStream.schema(schema)
            .option("pathGlobFilter", "*.parquet")
            .parquet(os.path.join(self.root, "data", "*"))
        )
