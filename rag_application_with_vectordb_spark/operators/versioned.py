"""Snapshot-versioned parquet store: manifests, time travel, vacuum.

The reference's store is a mutable in-memory array with no history
(``services/vectorDb.ts:5``); production tables need the opposite —
every commit immutable, every past version readable, storage reclaimed
only by explicit retention. This module is that mechanism in its
minimal trustworthy form (an Iceberg/Delta-lite):

- **Commit = data + manifest.** Each commit writes its rows to a fresh
  ``data/c<N>/`` directory and then publishes ``manifests/v<N>.json``
  listing EVERY data directory in the snapshot (inherited + new), with
  the parent version and operation recorded. Data directories are
  immutable once published.
- **Atomic publish.** The manifest is written to a temp name and
  ``os.rename``d in; the current version is simply the highest
  manifest present, so a crash before the rename leaves the previous
  version intact and a half-written commit invisible (its orphan data
  directory is swept by the next ``vacuum``). Same single-writer,
  local-FS caveat as ``ann.ivf_compact`` — an object-store deployment
  publishes the manifest via a conditional PUT.
- **Time travel** = read the file list of manifest N. **Copy-on-write
  delete** = rewrite the surviving rows as a new commit whose manifest
  references only the new directory. **Vacuum** = drop manifests
  older than the retention, then delete data directories no kept
  manifest references.

At 100 TB nothing here changes: manifests stay tiny (they list
directories, not rows), reads plan from the manifest (no directory
listing), and vacuum's reachability set is a set union over a few
JSON files.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

__all__ = ["VersionedStore"]


class VersionedStore:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(os.path.join(path, "manifests"), exist_ok=True)
        os.makedirs(os.path.join(path, "data"), exist_ok=True)

    # -- manifest plumbing ---------------------------------------------------

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.path, "manifests", f"v{version}.json")

    def versions(self) -> list[int]:
        out = []
        for p in glob.glob(os.path.join(self.path, "manifests", "v*.json")):
            name = os.path.basename(p)
            out.append(int(name[1:-5]))
        return sorted(out)

    def current_version(self) -> int:
        vs = self.versions()
        return vs[-1] if vs else 0

    def _read_manifest(self, version: int) -> dict:
        p = self._manifest_path(version)
        if not os.path.exists(p):
            raise ValueError(f"version {version} does not exist (vacuumed or never committed)")
        with open(p) as f:
            return json.load(f)

    def _publish(self, version: int, op: str, dirs: list[str], n_rows: int) -> None:
        import time

        manifest = {
            "version": version,
            "op": op,
            "parent": version - 1 if version > 1 else None,
            "data_dirs": dirs,
            "n_rows": n_rows,
            "committed_at": time.time(),
        }
        tmp = self._manifest_path(version) + f".tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.rename(tmp, self._manifest_path(version))

    def _write_commit_dir(self, df: DataFrame, version: int) -> tuple[str, int]:
        rel = f"c{version}"
        full = os.path.join(self.path, "data", rel)
        df.write.mode("overwrite").parquet(full)
        n = self.spark.read.parquet(full).count()
        return rel, n

    # -- operations ------------------------------------------------------------

    def append(self, df: DataFrame) -> int:
        """Commit ``df`` as new rows on top of the current snapshot."""
        v = self.current_version() + 1
        rel, n_new = self._write_commit_dir(df, v)
        prev_dirs, prev_rows = [], 0
        if v > 1:
            prev = self._read_manifest(v - 1)
            prev_dirs, prev_rows = prev["data_dirs"], prev["n_rows"]
        self._publish(v, "append", prev_dirs + [rel], prev_rows + n_new)
        return v

    def overwrite(self, df: DataFrame) -> int:
        """Commit ``df`` as the ENTIRE new snapshot (old versions remain
        readable until vacuumed)."""
        v = self.current_version() + 1
        rel, n = self._write_commit_dir(df, v)
        self._publish(v, "overwrite", [rel], n)
        return v

    def delete_where(self, condition) -> int:
        """Copy-on-write delete: survivors are rewritten as one new
        directory; no published file is ever modified."""
        survivors = self.read().filter(~condition)
        v = self.current_version() + 1
        rel, n = self._write_commit_dir(survivors, v)
        self._publish(v, "delete", [rel], n)
        return v

    def rollback(self, version: int) -> int:
        """Restore a retained historical snapshot as a NEW commit (Delta
        RESTORE semantics): the new manifest references the target
        version's data directories — no data is copied, history stays
        linear (the rolled-back-from versions remain readable until
        vacuumed), and vacuum keeps the referenced directories alive
        because reachability is computed from retained manifests."""
        m = self._read_manifest(version)  # raises if vacuumed/never existed
        v = self.current_version() + 1
        self._publish(v, f"rollback:{version}", list(m["data_dirs"]), m["n_rows"])
        return v

    def read(self, version: int | None = None) -> DataFrame:
        """Read a snapshot (default: current). Time travel = pass any
        retained version number."""
        v = version if version is not None else self.current_version()
        if v == 0:
            raise ValueError("store has no commits yet")
        m = self._read_manifest(v)
        dirs = [os.path.join(self.path, "data", d) for d in m["data_dirs"]]
        return self.spark.read.parquet(*dirs)

    def read_as_of(self, ts: float) -> DataFrame:
        """AS OF timestamp read: the newest retained version committed at
        or before ``ts`` (SQL ``FOR TIMESTAMP AS OF`` semantics). Raises
        if every retained commit is newer."""
        best = None
        for v in self.versions():
            m = self._read_manifest(v)
            if m["committed_at"] <= ts and (best is None or v > best):
                best = v
        if best is None:
            raise ValueError(f"no retained version committed at or before {ts}")
        return self.read(best)

    def vacuum(self, keep_last: int = 1) -> list[str]:
        """Expire all but the newest ``keep_last`` versions, then delete
        every data directory no retained manifest references (including
        orphans from crashed commits). Returns the deleted directories."""
        vs = self.versions()
        keep = set(vs[-keep_last:]) if vs else set()
        reachable: set[str] = set()
        for v in keep:
            reachable.update(self._read_manifest(v)["data_dirs"])
        for v in vs:
            if v not in keep:
                os.remove(self._manifest_path(v))
        deleted = []
        for full in glob.glob(os.path.join(self.path, "data", "c*")):
            if os.path.basename(full) not in reachable:
                shutil.rmtree(full, ignore_errors=True)
                deleted.append(full)
        return sorted(deleted)
