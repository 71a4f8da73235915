"""Copy-on-write table versions with atomic manifest-swap commits.

The streaming sink (streaming/sink.py) already gives epoch-idempotent
commits for appends; this module closes the batch-MERGE gap the round-5
review called out: ``etl_merge_upsert`` computes the right rows, but a
plain ``mode("overwrite")`` rewrite lets a concurrent reader observe a
half-written table (or, worse, an empty one mid-delete). Here a MERGE
is a copy-on-write commit:

1. The new table version is written to a PRIVATE per-attempt staging
   directory (``_stage_v<N>_<uuid>``) — never touching the live one,
   and never shared with a racing writer.
2. The commit, under an exclusive flock, compare-and-swaps: re-read
   the committed version (must still be N-1), atomically rename the
   staging dir to ``v=<N>``, then a SINGLE atomic ``os.replace`` of
   the ``_current`` manifest (POSIX rename atomicity — the same
   primitive every log-structured table format ultimately relies on).

Readers resolve the manifest first, then read only the pinned
version's recorded file list, so they see the old version until the
instant of the swap and the new one after — never a mix, never a
partial write. A crash before the publish leaves an orphaned
``_stage_*`` directory no reader can ever resolve; the manifest — and
so every reader — still points at the old version
(tests/test_table_commit.py::test_crash_mid_merge_preserves_old_version),
and ``vacuum(sweep_stages=True)`` reclaims the orphan. A crash in the
narrow window between the rename and the manifest swap leaves a
``v=<N>`` directory NEWER than the manifest; ``read_table`` refuses
versions above the committed one, so that never-committed data is
equally unreadable until a retried publish adopts or replaces it.

At 100 TB this is exactly the Iceberg/Delta commit shape reduced to
its kernel: O(changed files) data write, O(1) metadata swap, retained
old versions give snapshot-isolated readers and time travel until a
vacuum drops them. The manifest carries the file list and readers are
pinned to it (never a directory listing). Because staging dirs are
unique per attempt, two committers that both staged v=N resolve to one
winner and one ConcurrentCommitError — with the loser's data untouched
in its own staging dir and the winner's files enumerated from a
directory only it ever wrote — never a silent lost update and never a
torn winner (the round-7 review's shared-staging race).

Linearizability claim (single filesystem): commits are linearizable
with the linearization point at the manifest ``os.replace``. Publishing
v=N requires the committed version to still be N−1 under the exclusive
flock, so the committed history is a single total order of versions
with no gaps and no forks; a reader's snapshot is always the state of
exactly one committed prefix (it resolves the manifest once, then only
manifest-named files), and a writer that loses the CAS observes the
winner's commit on re-read — the optimistic-retry loop therefore
implements serializable read-modify-write over table versions. Tested
by genuinely interleaved writer threads with a concurrent reader
(tests/test_table_commit.py::test_concurrent_merge_writers_retry_until_both_land
and ::test_truly_concurrent_publishes_serialize) AND — because flock
ownership and rename atomicity are kernel contracts BETWEEN processes
that a single-process threaded test cannot validate — by two separate
driver PROCESSES racing publish on one table
(::test_cross_process_publish_serializes, round-15). Cross-HOST
coordination is out of scope by design: that is the catalog's CAS
(Iceberg metastore/REST, Delta LogStore) — this module is the
single-filesystem kernel those protocols wrap.
"""

from __future__ import annotations

import contextlib
import fcntl
import json
import os
import shutil
import tempfile
import time
import uuid
from pyspark.sql import DataFrame, SparkSession

_MANIFEST = "_current"
_LOCK = "_commit.lock"
_FILES = "_files.json"


class ConcurrentCommitError(RuntimeError):
    """Another writer committed between this writer's stage and publish.

    The loser's staged directory is intact but unpublished; the correct
    response is to re-read the table, re-stage against the new committed
    state, and retry — the optimistic-concurrency loop every
    log-structured table format (Iceberg, Delta) runs on commit
    conflict."""


@contextlib.contextmanager
def _commit_lock(root: str):
    """Serialize publishers on one host: an exclusive flock held across
    the read-check-swap. The kernel releases the lock when the holder
    dies, so a crashed committer can never wedge the table (the failure
    mode an O_EXCL claim file would have). Cross-host writers need a
    catalog CAS (what Iceberg's metastore/REST catalog provides) — this
    module is the single-filesystem kernel of that protocol."""
    with open(os.path.join(root, _LOCK), "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        yield


def _manifest_path(root: str) -> str:
    return os.path.join(root, _MANIFEST)


def current_version(root: str) -> int | None:
    """The committed version, or None for an uninitialized table. Only
    the manifest decides — staged/orphaned v= directories are invisible."""
    try:
        with open(_manifest_path(root), "r", encoding="utf-8") as f:
            return int(json.load(f)["version"])
    except (OSError, ValueError, KeyError):
        return None


def _read_manifest(root: str) -> dict:
    with open(_manifest_path(root), "r", encoding="utf-8") as f:
        return json.load(f)


def _version_dir(root: str, version: int) -> str:
    return os.path.join(root, f"v={version}")


def stage_version(df: DataFrame, root: str) -> tuple[int, str]:
    """Step 1 of a commit: write the full next-version data to a
    PRIVATE staging directory (``_stage_v<N>_<uuid>``) without
    publishing it. Returns (version, staging_dir).

    The staging dir is unique per attempt — two writers racing the same
    next version never share a directory, so neither can clobber or
    tear the other's staged data (the round-7 review's race: with a
    shared ``v=N`` staging dir, the CAS winner could publish the
    loser's half-overwritten files). A crashed attempt leaves an
    orphaned ``_stage_*`` dir that readers can never resolve (only the
    manifest names readable paths); ``vacuum(sweep_stages=True)``
    reclaims them."""
    os.makedirs(root, exist_ok=True)
    version = (current_version(root) or 0) + 1
    staging_dir = os.path.join(
        root, f"_stage_v{version}_{uuid.uuid4().hex[:12]}"
    )
    df.write.mode("overwrite").parquet(staging_dir)
    return version, staging_dir


def publish_version(root: str, version: int, staging_dir: str) -> None:
    """Step 2 of a commit: compare-and-swap the manifest to ``version``,
    adopting the private staging dir as the version directory.

    Under the commit flock: re-read the committed version (publishing
    v=N requires the table to still be at N-1 — two writers that both
    staged v=N serialize, the first wins, the second raises
    ConcurrentCommitError with its staged data intact), remove any
    orphaned ``v=N`` left by a writer that crashed between its rename
    and its manifest swap (provably unpublished: the manifest still
    says N-1, and readers only resolve manifest-named paths), rename
    the staging dir to ``v=N`` (atomic within a filesystem), then
    ``os.replace`` the fsynced manifest — readers resolve the old
    manifest or the new one, never a torn write.

    The file list is enumerated from the PRIVATE staging dir before the
    rename — no concurrent writer can be mutating it — and recorded
    twice: in the manifest (current-version readers) and as
    ``_files.json`` inside the version dir (time-travel readers), so no
    reader ever depends on a directory-listing race."""
    files = sorted(
        f for f in os.listdir(staging_dir)
        if f.endswith(".parquet") or f.startswith("part-")
    )
    with open(os.path.join(staging_dir, _FILES), "w", encoding="utf-8") as f:
        json.dump(files, f)
    data_dir = _version_dir(root, version)
    manifest = {
        "version": version,
        "path": os.path.basename(data_dir),
        "files": files,
        "committed_at": time.time(),
    }
    fd, tmp = tempfile.mkstemp(prefix="_manifest_", dir=root)
    try:
        with os.fdopen(fd, "w", encoding="utf-8") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        with _commit_lock(root):
            cur = current_version(root) or 0
            if cur != version - 1:
                raise ConcurrentCommitError(
                    f"cannot publish v={version}: table at v={cur}, "
                    f"expected v={version - 1} — another writer committed "
                    "first; re-stage against the new state and retry"
                )
            if os.path.isdir(data_dir):
                shutil.rmtree(data_dir)
            os.rename(staging_dir, data_dir)
            os.replace(tmp, _manifest_path(root))
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def commit_version(df: DataFrame, root: str) -> int:
    """stage + publish in one call (the no-crash path)."""
    version, staging_dir = stage_version(df, root)
    publish_version(root, version, staging_dir)
    return version


def read_table(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Read the committed table state (or a retained older ``version`` —
    time travel). Resolves the manifest FIRST, then pins that version's
    directory: a commit racing this read flips the whole result to one
    side of the swap, never a mix.

    Reads are pinned to the MANIFEST'S FILE LIST, not the directory: a
    retried stage that overwrites ``v=N`` under a reader, or any stray
    file landing in the version dir, cannot widen or tear the read —
    the reader touches exactly the files the commit recorded. Current
    reads take the list from ``_current``; time-travel reads take it
    from the version dir's ``_files.json`` (written at publish).
    Versions committed before that file existed fall back to the
    directory read (immutable once superseded, so still safe).

    Time travel is only valid for versions ≤ the committed one: a
    ``v=N`` directory NEWER than the manifest is a publisher that
    crashed between its rename and its manifest swap — never-committed
    data a concurrent retry may legitimately remove — so asking for it
    raises instead of resolving it."""
    committed = current_version(root)
    if committed is None:
        raise FileNotFoundError(f"no committed version at {root}")
    if version is not None and version > committed:
        raise FileNotFoundError(
            f"version {version} was never committed at {root} "
            f"(table is at v={committed}; a v={version} directory, if "
            "present, is a crashed publish attempt)"
        )
    pinned = version if version is not None else committed
    data_dir = _version_dir(root, pinned)
    files: list[str] | None = None
    try:
        manifest = _read_manifest(root)
        if manifest.get("version") == pinned and manifest.get("files"):
            files = manifest["files"]
    except (OSError, ValueError):
        pass
    if files is None:
        try:
            with open(os.path.join(data_dir, _FILES), encoding="utf-8") as f:
                files = json.load(f)
        except (OSError, ValueError):
            files = None
    if files:
        return spark.read.parquet(*[os.path.join(data_dir, f) for f in files])
    return spark.read.parquet(data_dir)


def merge_commit(
    root: str,
    updates: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    before_publish=None,
) -> int:
    """MERGE-upsert as a copy-on-write commit: the committed snapshot
    and the update batch are merged (updates win per key; ties broken
    by ``order_cols`` descending), staged as the next version, then
    published atomically. ``before_publish`` is the crash-injection
    seam for tests — called between stage and publish, where a real
    crash would leave the table readable at the old version."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    spark = updates.sparkSession
    base = read_table(spark, root).withColumn("_is_update", F.lit(0))
    upd = updates.withColumn("_is_update", F.lit(1))
    w = Window.partitionBy(*key_cols).orderBy(
        F.col("_is_update").desc(), *[F.col(c).desc() for c in order_cols]
    )
    merged = (
        upd.unionByName(base)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_is_update")
    )
    version, staging_dir = stage_version(merged, root)
    if before_publish is not None:
        before_publish(version)
    publish_version(root, version, staging_dir)
    return version


# ---------------------------------------------------------------------------
# Multi-table snapshots: one atomic swap across N tables
# ---------------------------------------------------------------------------
#
# A pipeline rarely rewrites one table in isolation — a fact and its
# dimensions must flip TOGETHER or a reader joins fact@new against
# dim@old and sees orphans that exist in neither committed state. The
# snapshot layout nests per-table version dirs under one root and
# publishes ONE manifest naming every table's version: the same
# os.replace atomicity now covers the whole join graph.

_SNAP_MANIFEST = "_current_tx"


def current_tx(root: str) -> dict | None:
    """The committed snapshot manifest {tx, tables: {name: version}},
    or None for an uninitialized snapshot root."""
    try:
        with open(os.path.join(root, _SNAP_MANIFEST), encoding="utf-8") as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def stage_snapshot(dfs: dict[str, DataFrame], root: str) -> dict:
    """Write every table's next version to a PRIVATE per-attempt
    staging dir (same unique-staging rule as stage_version — racing
    writers never share a directory). Versions advance per-table from
    the committed manifest; the returned dict carries the staging dirs
    for publish_snapshot to adopt."""
    os.makedirs(root, exist_ok=True)
    cur = current_tx(root) or {"tx": 0, "tables": {}}
    attempt = uuid.uuid4().hex[:12]
    staged = {"tx": cur["tx"] + 1, "tables": {}, "stage_dirs": {}}
    for name, df in dfs.items():
        version = cur["tables"].get(name, 0) + 1
        stage_dir = os.path.join(root, name, f"_stage_v{version}_{attempt}")
        df.write.mode("overwrite").parquet(stage_dir)
        staged["tables"][name] = version
        staged["stage_dirs"][name] = stage_dir
    return staged


def publish_snapshot(root: str, staged: dict) -> None:
    """Compare-and-swap publish of a staged snapshot: one os.replace
    covers every table — readers see all tables at the old tx or all at
    the new, never a mix. Runs under the commit flock with a re-read:
    publishing tx=T requires the snapshot root to still be at T-1, so
    two writers that both staged T serialize and the loser raises
    ConcurrentCommitError with its staged data intact. After the CAS
    check, each table's private staging dir is renamed to its ``v=N``
    (removing any orphan left by a writer that crashed mid-publish —
    provably unpublished, since the manifest still reads T-1); the
    renames need not be jointly atomic because readers only resolve
    manifest-named paths, and the manifest flips last, once. Per-table
    file lists are enumerated from the private staging dirs and
    recorded in the manifest so snapshot readers are pinned to
    committed files, not listings."""
    import time as _time

    tables = staged.get("tables")
    if not isinstance(tables, dict) or not tables:
        raise ValueError(
            "staged dict has no 'tables' mapping — publish_snapshot "
            "requires the dict returned by stage_snapshot"
        )
    stage_dirs = staged.get("stage_dirs") or {}
    missing = sorted(set(tables) - set(stage_dirs))
    if missing:
        raise ValueError(
            "staged dict has no stage_dirs entry for "
            f"{missing} — publish_snapshot requires the dict returned "
            "by stage_snapshot (private per-attempt staging dirs); "
            "re-stage rather than publishing a hand-built manifest"
        )
    files = {
        name: sorted(
            f
            for f in os.listdir(stage_dirs[name])
            if f.endswith(".parquet") or f.startswith("part-")
        )
        for name in staged["tables"]
    }
    manifest = {
        k: v for k, v in staged.items() if k != "stage_dirs"
    }
    manifest = dict(manifest, files=files, committed_at=_time.time())
    fd, tmp = tempfile.mkstemp(prefix="_tx_", dir=root)
    try:
        with os.fdopen(fd, "w", encoding="utf-8") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        with _commit_lock(root):
            cur = current_tx(root) or {"tx": 0}
            if cur["tx"] != staged["tx"] - 1:
                raise ConcurrentCommitError(
                    f"cannot publish tx={staged['tx']}: snapshot at "
                    f"tx={cur['tx']}, expected tx={staged['tx'] - 1} — "
                    "another writer committed first; re-stage and retry"
                )
            for name, v in staged["tables"].items():
                data_dir = os.path.join(root, name, f"v={v}")
                if os.path.isdir(data_dir):
                    shutil.rmtree(data_dir)
                os.rename(stage_dirs[name], data_dir)
            os.replace(tmp, os.path.join(root, _SNAP_MANIFEST))
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def commit_snapshot(
    dfs: dict[str, DataFrame], root: str, before_publish=None
) -> int:
    """stage + publish for a table set; ``before_publish`` is the
    crash-injection seam (called with the staged manifest)."""
    staged = stage_snapshot(dfs, root)
    if before_publish is not None:
        before_publish(staged)
    publish_snapshot(root, staged)
    return staged["tx"]


def read_snapshot(
    spark: SparkSession, root: str, table: str, tx: dict | None = None
) -> DataFrame:
    """Read ``table`` at the committed snapshot (or a caller-pinned
    manifest — resolve current_tx ONCE and pass it in when several
    tables must be read at the same tx; re-resolving per table would
    reintroduce the mixed-version race this module exists to kill)."""
    manifest = tx if tx is not None else current_tx(root)
    if manifest is None or table not in manifest["tables"]:
        raise FileNotFoundError(f"no committed version of {table} at {root}")
    version = manifest["tables"][table]
    data_dir = os.path.join(root, table, f"v={version}")
    files = (manifest.get("files") or {}).get(table)
    if files:
        return spark.read.parquet(*[os.path.join(data_dir, f) for f in files])
    return spark.read.parquet(data_dir)


def _tombstone_rename(root: str, v: int) -> tuple[str | None, bool]:
    """Atomically move ``v=<v>`` aside to a unique ``_tomb_*`` name so
    its tree can be deleted after the commit lock is released. Returns
    ``(tombstone_path, reclaimed)``: ``(dst, True)`` on rename,
    ``(None, True)`` if the version dir no longer exists (matching the
    old rmtree(ignore_errors=True) tolerance), ``(None, False)`` if
    the rename failed in a way a different destination name cannot fix
    — the dir is still on disk and the caller must NOT report it as
    reclaimed. Only name-collision errnos (EEXIST/ENOTEMPTY) retry
    with another name; a persistent error (EACCES, EXDEV, ...) would
    otherwise burn 1000 rename syscalls while holding the commit
    lock."""
    import errno

    src = _version_dir(root, v)
    for attempt in range(1000):
        dst = os.path.join(root, f"_tomb_v{v}.{os.getpid()}.{attempt}")
        if os.path.exists(dst):
            continue
        try:
            os.rename(src, dst)
            return dst, True
        except FileNotFoundError:
            return None, True
        except OSError as e:
            if e.errno in (errno.EEXIST, errno.ENOTEMPTY):
                continue
            return None, False
    return None, False


def vacuum(root: str, keep: int = 2, sweep_stages: bool = False) -> list[int]:
    """Drop all but the newest ``keep`` committed-or-older version
    directories, never touching the current one or anything newer than
    it. Returns the removed version numbers. The retention window IS
    the snapshot-isolation guarantee for lagging readers — size it to
    the longest reader you allow, exactly like a table format's
    retention policy.

    ``sweep_stages=True`` additionally reclaims orphaned ``_stage_*``
    directories left by crashed commit attempts — including a crashed
    FIRST-ever commit (no manifest yet) and the nested
    ``<root>/<table>/_stage_*`` layout a crashed stage_snapshot leaves,
    so the sweep runs before (and independently of) the version-window
    logic. Only enable it when no stage is in flight (the
    maintenance-window rule every table format's orphan-file cleanup
    carries), since the filesystem cannot distinguish a crashed stage
    from a slow one."""
    import re

    if sweep_stages and os.path.isdir(root):
        for d in os.listdir(root):
            p = os.path.join(root, d)
            if d.startswith("_stage_"):
                shutil.rmtree(p, ignore_errors=True)
            elif os.path.isdir(p) and not d.startswith("v="):
                # snapshot layout: per-table subdirs hold their own stages
                for sub in os.listdir(p):
                    if sub.startswith("_stage_"):
                        shutil.rmtree(
                            os.path.join(p, sub), ignore_errors=True
                        )
    if not os.path.isdir(root):
        return []
    # The manifest read and every rmtree below run under the SAME
    # exclusive flock the publishers hold across their
    # rename→manifest-swap critical section. Without it, vacuum could
    # read cur=N-1, then a publisher renames its stage to v=N, and
    # vacuum's "newer than manifest" sweep deletes v=N in the instant
    # before the publisher's manifest swap — committing a manifest
    # pointer to a deleted directory (the round-7 advice's data-loss
    # window). Under the lock, vacuum sees the table strictly before
    # or strictly after any publish, never mid-swap. Orphaned
    # ``_stage_*`` dirs stay outside the lock's protection by design
    # (stage_version runs unlocked); the maintenance-window rule in
    # the docstring is still the only guard for in-flight stages.
    # Liveness: the critical section below does only O(manifest) work —
    # droppable version dirs are atomically RENAMED to `_tomb_*` names
    # under the lock (publishers therefore never see them mid-delete),
    # and their (possibly huge) trees are reclaimed AFTER the lock is
    # released, so a vacuum of many large versions never blocks
    # publishers for the full deletion time (round-9 advice). A vacuum
    # that crashes between rename and delete leaves an inert `_tomb_*`
    # dir (read_table refuses non-v= names); the next vacuum sweeps any
    # leftovers, also outside the lock.
    tombs: list[str] = []
    droppable: list[int] = []
    with _commit_lock(root):
        cur = current_version(root)
        versions = sorted(
            int(m.group(1))
            for d in os.listdir(root)
            if (m := re.fullmatch(r"v=(\d+)", d))
        )
        if sweep_stages:
            # v= dirs NEWER than the manifest (or any v= dir when no
            # manifest exists) are publishers that crashed between
            # their rename and their manifest swap — provably
            # unpublished (the manifest is the only commit authority)
            # and unreadable (read_table refuses them), so the
            # maintenance window may reclaim them; without this they
            # would leak forever, since the retention window below
            # only drops OLD versions. A LIVE publisher in that window
            # cannot be mistaken for a crashed one here: it holds the
            # flock we are holding.
            for v in [x for x in versions if cur is None or x > cur]:
                t, _ok = _tombstone_rename(root, v)
                if t is not None:
                    tombs.append(t)
                versions.remove(v)
        if cur is not None:
            # droppable reports only versions actually reclaimed (or
            # already gone) — a rename that failed on a persistent
            # errno leaves the dir on disk, and reporting it would
            # make callers believe retention was enforced when it
            # wasn't.
            for v in [x for x in versions if x <= cur - keep]:
                t, ok = _tombstone_rename(root, v)
                if t is not None:
                    tombs.append(t)
                if ok:
                    droppable.append(v)
    for t in tombs:
        shutil.rmtree(t, ignore_errors=True)
    for d in os.listdir(root):
        if d.startswith("_tomb_"):
            shutil.rmtree(os.path.join(root, d), ignore_errors=True)
    return droppable


__all__ = [
    "ConcurrentCommitError",
    "commit_snapshot",
    "commit_version",
    "current_tx",
    "current_version",
    "merge_commit",
    "publish_snapshot",
    "publish_version",
    "read_snapshot",
    "read_table",
    "stage_snapshot",
    "stage_version",
    "vacuum",
]
