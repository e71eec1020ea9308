"""Persisted-table adapter — the seam SCALE.md's Iceberg mapping plugs into.

``IndexCatalog`` performs EVERY stage-table read/write through a
``TableStore``, so the storage backend is swappable without touching
catalog logic (build/resume/update/merge). SCALE.md ("Iceberg mapping")
documents the 1:1 design — postings partitioned by (field, bucket) =
Iceberg's ``bucket(term)`` transform, tombstone batches = equality-delete
merge-on-read, ``merge()`` = ``rewrite_data_files``, the meta JSON =
snapshot properties; this module makes that mapping a code seam instead of
a paper one.

Three implementations:

* ``ParquetFilesystemStore`` (default) — plain directory-partitioned
  parquet under the warehouse path, byte-identical to the catalog's
  historical inline behavior. What the sandbox runs.
* ``SnapshotParquetStore`` — the Iceberg *semantics* implemented over
  plain parquet, runnable in this sandbox: every write commits a new
  immutable snapshot (data directories never mutate; a JSON manifest
  lists the directories composing each version, exactly Iceberg's
  manifest-list role), readers resolve the current snapshot once at
  ``read()`` so in-flight DataFrames are snapshot-isolated from later
  overwrites, and the table supports time travel, rollback, snapshot
  expiration and optimistic commit locking. See the class docstring for
  the commit protocol.
* ``IcebergTableStore`` — routes the same operations through a configured
  Spark SQL catalog backed by the Iceberg runtime (``writeTo(...)``
  V2 writes, identifier-addressed reads). The Iceberg runtime jars are not
  present in this sandbox, so constructing it against an unconfigured
  session raises with setup guidance rather than failing deep inside a
  write; the class documents exactly what a real deployment provides:

      spark.sql.extensions = org.apache.iceberg.spark.extensions
                             .IcebergSparkSessionExtensions
      spark.sql.catalog.<name> = org.apache.iceberg.spark.SparkCatalog
      spark.sql.catalog.<name>.warehouse = <path>

Single-writer note (unchanged by the seam): the catalog's meta JSON is the
commit point, so concurrent writers to ONE index still need external
coordination; an Iceberg catalog would replace that file with its own
atomic snapshot commit, which is precisely what this seam isolates.
"""

from __future__ import annotations

import abc
import contextlib
import json
import os
import re
import shutil
import time

from pyspark.sql import DataFrame, SparkSession


class TableStore(abc.ABC):
    """Storage backend for the catalog's stage tables.

    ``target`` is the catalog-chosen stable identifier for a table — the
    filesystem path under the warehouse root. Implementations may use it
    directly (filesystem) or map it to their own identifier space
    (Iceberg table names)."""

    @abc.abstractmethod
    def write(self, df: DataFrame, target: str,
              partition_by: tuple[str, ...] = (),
              mode: str = "overwrite") -> None: ...

    @abc.abstractmethod
    def read(self, spark: SparkSession, target: str) -> DataFrame: ...


class ParquetFilesystemStore(TableStore):
    """Directory-partitioned parquet under the warehouse path (default)."""

    def write(self, df: DataFrame, target: str,
              partition_by: tuple[str, ...] = (),
              mode: str = "overwrite") -> None:
        writer = df.write.mode(mode)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(target)

    def read(self, spark: SparkSession, target: str) -> DataFrame:
        return spark.read.parquet(target)


class ConcurrentCommitError(RuntimeError):
    """Another writer holds the table's commit lock (optimistic
    concurrency: the caller retries from a fresh snapshot, Iceberg's
    contract for CommitFailedException)."""


class SnapshotParquetStore(TableStore):
    """Versioned parquet with atomic snapshot commits — the Iceberg table
    semantics (snapshots, manifest lists, append/overwrite operations,
    time travel, rollback, expiration, optimistic locking) implemented
    over the filesystem so the SCALE.md mapping is demonstrable in-sandbox.

    Layout per table ``target``::

        target/
          data/d-000001/...        immutable parquet dirs (never rewritten)
          _v000001.json            snapshot: {"version", "parent",
                                   "operation", "dirs": [...], "ts_ms"}
          _current.json            pointer {"version": N} — the commit point

    Commit protocol (what Iceberg's atomic metadata swap does, reduced to
    POSIX primitives):

    1. take the per-table commit lock (``O_CREAT|O_EXCL`` — a second
       concurrent writer gets :class:`ConcurrentCommitError` instead of a
       corrupted table);
    2. write the new data directory (a crash here leaves only unreachable
       files — the current snapshot never references them);
    3. write the new snapshot manifest: ``overwrite`` lists just the new
       directory, ``append`` lists the parent snapshot's directories plus
       the new one (data is never copied — exactly Iceberg's fast append);
    4. atomically swap ``_current.json`` via ``os.replace`` — the single
       linearization point;
    5. release the lock.

    Snapshot isolation falls out of immutability: ``read()`` resolves the
    pointer once, and the returned (lazy) DataFrame binds to that
    snapshot's directories, which no later commit ever mutates — an
    overwrite racing a long scan cannot change rows under it. (The
    default ``ParquetFilesystemStore`` does NOT have this property:
    ``mode=overwrite`` deletes files a concurrent reader may hold.)
    """

    def _snap_path(self, target: str, v: int) -> str:
        return os.path.join(target, f"_v{v:06d}.json")

    def _current_path(self, target: str) -> str:
        return os.path.join(target, "_current.json")

    def current_version(self, target: str) -> int | None:
        p = self._current_path(target)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)["version"]

    def versions(self, target: str) -> list[dict]:
        """Snapshot history, oldest first (Iceberg ``table.history()``)."""
        out = []
        for name in sorted(os.listdir(target)):
            if name.startswith("_v") and name.endswith(".json"):
                with open(os.path.join(target, name)) as f:
                    out.append(json.load(f))
        return out

    def _read_snapshot(self, target: str, v: int) -> dict:
        with open(self._snap_path(target, v)) as f:
            return json.load(f)

    # a writer that died while holding the lock (OOM-kill, power loss
    # mid-parquet-write) must not brick the table: a lock older than
    # this is considered abandoned and reclaimed. Reclaim alone is NOT
    # sufficient for safety — a slow-but-alive writer can be reclaimed
    # from — so ownership is token-verified at every commit point:
    # the lock file carries an owner token, data dirs are token-unique
    # (two writers never race one directory), snapshot manifests are
    # O_EXCL-created (version collisions fast-fail), and the pointer
    # swap re-verifies token ownership immediately before os.replace.
    # A reclaimed-from writer therefore aborts with
    # ConcurrentCommitError instead of corrupting the table — the same
    # contract as Iceberg's CommitFailedException. Reclaim itself is an
    # atomic rename, so two concurrent reclaimers cannot both unlink+
    # create: exactly one wins the rename, the loser re-contends.
    LOCK_TTL_SEC = 600.0

    class _LockHandle:
        """Owner-token view of a held commit lock."""

        def __init__(self, path: str, token: str):
            self.path = path
            self.token = token

        def owned(self) -> bool:
            try:
                with open(self.path) as f:
                    return json.load(f).get("token") == self.token
            except (OSError, ValueError):
                return False

        def verify(self) -> None:
            """Raise unless this handle still owns the lock — called at
            every point whose outcome publishes state (manifest write,
            pointer swap)."""
            if not self.owned():
                raise ConcurrentCommitError(
                    f"commit lock for {os.path.dirname(self.path)} was "
                    f"reclaimed mid-commit (slow write exceeded "
                    f"LOCK_TTL_SEC); aborting before publishing state")

    @contextlib.contextmanager
    def _commit_lock(self, target: str):
        import uuid
        lock = os.path.join(target, "_commit.lock")
        token = uuid.uuid4().hex
        payload = json.dumps({"token": token, "pid": os.getpid(),
                              "ts": time.time()}).encode()
        for attempt in (0, 1):
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, payload)
                os.close(fd)
                break
            except FileExistsError:
                try:
                    age = time.time() - os.path.getmtime(lock)
                except OSError:
                    continue  # holder just released it: retry the open
                if attempt == 0 and age > self.LOCK_TTL_SEC:
                    # abandoned by a crashed writer: reclaim via atomic
                    # rename — exactly ONE of N concurrent reclaimers
                    # wins (the rest get FileNotFoundError and retry
                    # the O_EXCL create, where one wins and the others
                    # see a fresh lock)
                    try:
                        os.replace(lock, lock + f".reclaimed.{token}")
                        os.unlink(lock + f".reclaimed.{token}")
                    except FileNotFoundError:
                        pass
                    continue
                raise ConcurrentCommitError(
                    f"concurrent commit in flight for {target} "
                    f"(lock {lock}, age {age:.0f}s)")
        else:
            raise ConcurrentCommitError(
                f"could not acquire commit lock for {target} ({lock})")
        handle = self._LockHandle(lock, token)
        try:
            yield handle
        finally:
            # unlink only if still owner: after a reclaim, the path names
            # the NEW holder's lock and must survive this writer's exit
            if handle.owned():
                try:
                    os.unlink(lock)
                except FileNotFoundError:
                    pass

    def write(self, df: DataFrame, target: str,
              partition_by: tuple[str, ...] = (),
              mode: str = "overwrite") -> None:
        os.makedirs(target, exist_ok=True)
        with self._commit_lock(target) as lock:
            parent = self.current_version(target)
            # next version = max over ALL snapshots, not parent+1: after
            # a rollback the parent is an old version, and parent+1
            # would OVERWRITE an abandoned-lineage snapshot's manifest
            # and data dir, forging history and corrupting time travel
            existing = [sn["version"] for sn in self.versions(target)]
            v = max(existing, default=parent or 0) + 1
            # token-suffixed data dir: a reclaimed-from writer racing the
            # reclaimer on the SAME computed version still writes a
            # disjoint directory — concurrent Spark jobs never share an
            # output path. The loser's dir becomes unreachable garbage
            # (Iceberg's orphan files; remove_orphan_files analog below).
            ddir = os.path.join(target, "data", f"d-{v:06d}-{lock.token[:8]}")
            writer = df.write.mode("overwrite")
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.parquet(ddir)
            # ownership re-verify AFTER the (possibly >TTL-slow) data
            # write, BEFORE any state publication
            lock.verify()
            if mode == "append" and parent is not None:
                dirs = self._read_snapshot(target, parent)["dirs"] + [ddir]
            else:
                dirs = [ddir]
            snap = {"version": v, "parent": parent, "operation": mode,
                    "dirs": dirs, "ts_ms": int(time.time() * 1000)}
            # O_EXCL manifest create: if a racing writer already committed
            # this version number, fail fast instead of forging history
            try:
                mfd = os.open(self._snap_path(target, v),
                              os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                raise ConcurrentCommitError(
                    f"snapshot v{v} already committed by a concurrent "
                    f"writer at {target}; retry from a fresh snapshot")
            with os.fdopen(mfd, "w") as f:
                json.dump(snap, f, indent=1, sort_keys=True)
            tmp = self._current_path(target) + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"version": v}, f)
            # final ownership check immediately before the linearization
            # point — the fix for the reclaim race: a reclaimed-from
            # writer aborts here instead of swapping the pointer
            lock.verify()
            os.replace(tmp, self._current_path(target))

    def read(self, spark: SparkSession, target: str) -> DataFrame:
        v = self.current_version(target)
        if v is None:
            raise FileNotFoundError(f"no committed snapshot at {target}")
        return self.read_version(spark, target, v)

    def read_version(self, spark: SparkSession, target: str,
                     version: int) -> DataFrame:
        """Time-travel read: the table exactly as of ``version``. Multiple
        data dirs (fast appends) union per-dir — each dir is a complete
        partitioned parquet root, so partition columns round-trip."""
        snap = self._read_snapshot(target, version)
        dfs = [spark.read.parquet(d) for d in snap["dirs"]]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    def rollback(self, target: str, version: int) -> None:
        """Point the table back at an earlier snapshot (Iceberg
        ``rollback_to_snapshot``): a pure pointer swap — the bad
        snapshot's data stays on disk until expired."""
        if not os.path.exists(self._snap_path(target, version)):
            raise FileNotFoundError(f"no snapshot v{version} at {target}")
        with self._commit_lock(target) as lock:
            tmp = self._current_path(target) + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"version": version}, f)
            lock.verify()
            os.replace(tmp, self._current_path(target))

    def expire_snapshots(self, target: str, keep_last: int = 1) -> int:
        """Drop all but the newest ``keep_last`` snapshots ending at the
        current pointer, then delete data directories no retained snapshot
        references (Iceberg ``expire_snapshots``). Returns the number of
        data dirs removed. Never touches the current snapshot's data.

        ``keep_last`` must be >= 1: Python's ``[-0:]`` slice would
        silently retain EVERYTHING, the opposite of what a keep-nothing
        caller intends — rejected loudly instead."""
        if keep_last < 1:
            raise ValueError(
                f"keep_last must be >= 1 (got {keep_last}); the current "
                f"snapshot is never expirable")
        cur = self.current_version(target)
        if cur is None:
            return 0  # nothing committed: nothing to expire
        snaps = self.versions(target)
        retained = [s for s in snaps if s["version"] <= cur][-keep_last:]
        retained_v = {s["version"] for s in retained}
        keep_dirs = {d for s in retained for d in s["dirs"]}
        removed = 0
        with self._commit_lock(target):
            for s in snaps:
                if s["version"] not in retained_v and s["version"] != cur:
                    os.unlink(self._snap_path(target, s["version"]))
            data_root = os.path.join(target, "data")
            for name in sorted(os.listdir(data_root)):
                d = os.path.join(data_root, name)
                if d not in keep_dirs:
                    shutil.rmtree(d)
                    removed += 1
        return removed


class IcebergTableStore(TableStore):
    """Stage tables as Iceberg tables in a configured Spark SQL catalog.

    Identifier mapping: the catalog's filesystem-style target path becomes
    ``<catalog>.<namespace>.<slug>`` where the slug is the path with every
    non-word run collapsed to ``_`` (stable and reversible enough for
    segment/stage names, which are already ``[a-z0-9_]``)."""

    def __init__(self, spark: SparkSession, catalog: str,
                 namespace: str = "xltsearch"):
        impl = spark.conf.get(f"spark.sql.catalog.{catalog}", None)
        if impl is None:
            raise RuntimeError(
                f"Spark SQL catalog {catalog!r} is not configured; an "
                f"IcebergTableStore needs the Iceberg runtime on the "
                f"classpath and spark.sql.catalog.{catalog} set to "
                f"org.apache.iceberg.spark.SparkCatalog (see module "
                f"docstring for the full config)")
        self.catalog = catalog
        self.namespace = namespace

    def _ident(self, target: str) -> str:
        slug = re.sub(r"\W+", "_", target).strip("_")
        return f"{self.catalog}.{self.namespace}.{slug}"

    def write(self, df: DataFrame, target: str,
              partition_by: tuple[str, ...] = (),
              mode: str = "overwrite") -> None:
        from pyspark.sql import functions as F
        writer = df.writeTo(self._ident(target)).using("iceberg")
        if partition_by:
            writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
        if mode == "overwrite":
            writer.createOrReplace()
        else:  # append (tombstone batches)
            writer.append()

    def read(self, spark: SparkSession, target: str) -> DataFrame:
        return spark.read.table(self._ident(target))
