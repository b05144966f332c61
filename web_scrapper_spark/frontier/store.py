"""Snapshot-committed parquet tables (Iceberg-style semantics).

The north rule calls for frontier/seen state "maintained as Iceberg
tables ... resumable from any snapshot". This runtime has no Iceberg
jar, so this module provides the same commit semantics on plain
parquet + an atomic JSON manifest (SURVEY.md §7 Phase 2 decision):

- every commit writes a NEW immutable snapshot directory
  (``<root>/<table>/snap-<n>/`` parquet) and atomically swaps the
  manifest (write-temp + ``os.replace``) — readers never see a partial
  snapshot;
- the manifest records per-snapshot lineage: epoch, parent snapshot,
  row count, and arbitrary metrics — the per-partition lineage +
  fetch/parse metrics of the north rule live here;
- ``read(..., snapshot=k)`` time-travels; resume = read latest
  committed epoch (crawl/epoch.py).

On a real cluster the identical API maps 1:1 onto Iceberg
(``df.writeTo(...).createOrReplace()`` / snapshot ids); only this file
would change.
"""

from __future__ import annotations

import json
import os
import shutil
import threading
import time
from typing import Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_manifest.json"


class SnapshotStore:
    """Commits to DIFFERENT tables may run concurrently (the epoch
    engine overlaps the frontier and seen writes from two threads);
    the manifest read-modify-write is serialized by ``_lock``.
    Concurrent commits to the SAME table are not supported — snapshot
    ids are assigned under the lock but per-table ordering is the
    caller's responsibility."""

    def __init__(self, root: str):
        self.root = root
        self._lock = threading.Lock()
        self._pending: Optional[Dict] = None
        os.makedirs(root, exist_ok=True)

    # -- manifest ----------------------------------------------------------
    def _manifest_path(self) -> str:
        return os.path.join(self.root, MANIFEST)

    def manifest(self) -> Dict:
        # inside an epoch batch, the pending manifest IS the manifest
        # (disk + this epoch's deferred entries) — readers and snap-id
        # assignment see one consistent view
        if self._pending is not None:
            return self._pending
        path = self._manifest_path()
        if not os.path.exists(path):
            return {"tables": {}, "epochs": []}
        with open(path) as fh:
            return json.load(fh)

    def begin_epoch_batch(self) -> None:
        """Defer manifest durability for one epoch: snapshot entries
        accumulate in the in-memory pending manifest and hit disk ONCE
        at :meth:`commit_epoch` (one serialize + atomic replace per
        epoch instead of one per table — the epoch's serial commit
        chain measured 7-9 manifest rewrites). Crash before
        commit_epoch leaves the on-disk manifest untouched; the
        epoch's snapshot dirs are orphans resume already ignores (the
        same guarantee the per-table writes gave, since visibility was
        always gated on the epoch record)."""
        with self._lock:
            if self._pending is not None:
                raise RuntimeError("epoch batch already open")
            # manifest() reads disk while _pending is still None
            self._pending = self.manifest()

    def abort_epoch_batch(self) -> None:
        """Discard the deferred entries (failure path): the on-disk
        manifest never saw this epoch."""
        with self._lock:
            self._pending = None

    def _write_manifest(self, manifest: Dict) -> None:
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=1, sort_keys=True)
        os.replace(tmp, self._manifest_path())

    # -- commits -----------------------------------------------------------
    def commit(
        self,
        table: str,
        df: DataFrame,
        epoch: int,
        metrics: Optional[Dict] = None,
        mode: str = "replace",
    ) -> int:
        """Write ``df`` as the next snapshot of ``table``; returns its id.

        ``mode`` records the table's read semantics on the snapshot
        entry: ``'replace'`` (latest snapshot is the table — old ones
        are superseded and safely expirable) vs ``'append'`` (the table
        is the UNION of committed snapshots — every delta is live data,
        and :meth:`expire_snapshots` refuses to drop it without
        ``force``)."""
        if mode not in ("replace", "append"):
            raise ValueError(f"unknown commit mode {mode!r}")
        with self._lock:
            snaps = self.manifest()["tables"].get(table, [])
            snap_id = (snaps[-1]["id"] + 1) if snaps else 0
        rel = os.path.join(table, f"snap-{snap_id:05d}")
        path = os.path.join(self.root, rel)
        df.write.mode("overwrite").parquet(path)  # concurrent-safe: own dir
        count = _parquet_rows(path)
        with self._lock:
            manifest = self.manifest()
            snaps = manifest["tables"].setdefault(table, [])
            snaps.append(
                {
                    "id": snap_id,
                    "epoch": epoch,
                    "path": rel,
                    "rows": count,
                    "parent": snaps[-1]["id"] if snaps else None,
                    "committed_at": time.time(),
                    "metrics": metrics or {},
                    "mode": mode,
                }
            )
            if self._pending is None:
                self._write_manifest(manifest)
            # batch mode: the entry lives in the pending manifest and
            # lands on disk with commit_epoch's single write
        return snap_id

    def commit_blob(
        self, name: str, data: bytes, epoch: int, meta: Optional[Dict] = None
    ) -> int:
        """Commit an opaque binary sidecar (e.g. the seen-set bloom
        bitmap) as the next snapshot of ``name``. Same lineage rules as
        table snapshots; bitmap-sized, not data-sized."""
        with self._lock:
            snaps = self.manifest()["tables"].get(name, [])
            snap_id = (snaps[-1]["id"] + 1) if snaps else 0
        rel = os.path.join(name, f"blob-{snap_id:05d}.bin")
        path = os.path.join(self.root, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(data)
        os.replace(tmp, path)
        with self._lock:
            manifest = self.manifest()
            snaps = manifest["tables"].setdefault(name, [])
            snaps.append(
                {
                    "id": snap_id,
                    "epoch": epoch,
                    "path": rel,
                    "rows": len(data),
                    "parent": snaps[-1]["id"] if snaps else None,
                    "committed_at": time.time(),
                    "metrics": meta or {},
                }
            )
            if self._pending is None:
                self._write_manifest(manifest)
        return snap_id

    def read_blob(self, name: str) -> Optional[Dict]:
        """Latest blob snapshot of ``name``: {'epoch', 'data', 'meta'},
        or None. Unlike tables, the LATEST blob is returned even if its
        epoch never committed: a bloom written by a crashed epoch is a
        SUPERSET of the committed seen set, and supersets are safe
        (extra keys only cause false positives, which the exact
        anti-join drops; missing keys would cause duplicate fetches)."""
        snaps = [s for s in self.snapshots(name) if s.get("path")]
        if not snaps:
            return None
        entry = snaps[-1]
        with open(os.path.join(self.root, entry["path"]), "rb") as fh:
            data = fh.read()
        return {"epoch": entry["epoch"], "data": data, "meta": entry["metrics"]}

    def commit_epoch(self, epoch: int, tables: Dict[str, int], metrics: Dict) -> None:
        """Record a completed epoch: table→snapshot-id mapping + metrics.
        An epoch absent from this list is treated as never having
        happened on resume (its orphan snapshots are ignored). Closes
        an open epoch batch: this is the ONE durable manifest write
        the whole epoch makes."""
        with self._lock:
            manifest = self.manifest()
            manifest["epochs"] = [
                e for e in manifest["epochs"] if e["epoch"] != epoch
            ]
            manifest["epochs"].append(
                {"epoch": epoch, "tables": tables, "metrics": metrics}
            )
            manifest["epochs"].sort(key=lambda e: e["epoch"])
            self._pending = None
            self._write_manifest(manifest)

    # -- reads -------------------------------------------------------------
    def snapshots(self, table: str) -> List[Dict]:
        return self.manifest()["tables"].get(table, [])

    def latest_id(self, table: str) -> Optional[int]:
        snaps = self.snapshots(table)
        return snaps[-1]["id"] if snaps else None

    def read(
        self, spark: SparkSession, table: str, snapshot: Optional[int] = None
    ) -> DataFrame:
        snaps = self.snapshots(table)
        if not snaps:
            raise KeyError(f"no snapshots for table {table!r}")
        if snapshot is None:
            entry = snaps[-1]
        else:
            matches = [s for s in snaps if s["id"] == snapshot]
            if not matches:
                raise KeyError(f"snapshot {snapshot} of {table!r} not found")
            entry = matches[0]
        if entry.get("path") is None:
            raise KeyError(
                f"snapshot {entry['id']} of {table!r} expired (path nulled "
                "by expire_snapshots) — time travel past the retention window"
            )
        return spark.read.parquet(os.path.join(self.root, entry["path"]))

    def read_union(
        self, spark: SparkSession, table: str, up_to_epoch: Optional[int] = None
    ) -> Optional[DataFrame]:
        """Append-semantics read: each snapshot of an append table holds
        one epoch's increment; the table's content is the union of all
        snapshot dirs (what Iceberg's append commit gives natively)."""
        snaps = self.snapshots(table)
        if up_to_epoch is not None:
            snaps = [s for s in snaps if s["epoch"] <= up_to_epoch]
        paths = [os.path.join(self.root, s["path"]) for s in snaps if s.get("path")]
        if not paths:
            return None
        return spark.read.parquet(*paths)

    def committed_ids(
        self,
        table: str,
        up_to_epoch: Optional[int] = None,
        after_epoch: Optional[int] = None,
    ) -> List[int]:
        """Snapshot ids of ``table`` referenced by COMMITTED epochs —
        orphan snapshots written by a crashed epoch (present in
        ``tables`` but never in an epoch record) are excluded, so a
        resumed run that re-writes the same epoch never double-counts.
        ``after_epoch`` keeps only epochs strictly later (merge-on-read
        readers use it to skip deltas already folded into a base)."""
        ids = []
        for e in self.manifest()["epochs"]:
            if up_to_epoch is not None and e["epoch"] > up_to_epoch:
                continue
            if after_epoch is not None and e["epoch"] <= after_epoch:
                continue
            if table in e.get("tables", {}):
                ids.append(e["tables"][table])
        return ids

    def latest_committed(
        self, table: str, up_to_epoch: Optional[int] = None
    ) -> Optional[Dict]:
        """The newest committed epoch record that wrote ``table``:
        {'epoch', 'id'} — how a merge-on-read reader finds its base."""
        best = None
        for e in self.manifest()["epochs"]:
            if up_to_epoch is not None and e["epoch"] > up_to_epoch:
                continue
            if table in e.get("tables", {}):
                if best is None or e["epoch"] > best["epoch"]:
                    best = {"epoch": e["epoch"], "id": e["tables"][table]}
        return best

    def read_committed(
        self,
        spark: SparkSession,
        table: str,
        up_to_epoch: Optional[int] = None,
        after_epoch: Optional[int] = None,
    ) -> Optional[DataFrame]:
        """Append-semantics read over committed epochs only: the
        table's content is the union of the delta snapshots referenced
        by epoch records (what Iceberg's snapshot-isolation read gives
        natively). Use this — not ``read_union`` — for crash safety.

        Refuses loudly (KeyError) if a committed delta's snapshot dir
        was expired — silently skipping it would serve a truncated
        union (e.g. a seen set missing fetched URLs) as if complete."""
        ids = set(self.committed_ids(table, up_to_epoch, after_epoch))
        snaps = [s for s in self.snapshots(table) if s["id"] in ids]
        gone = [s["id"] for s in snaps if not s.get("path")]
        if gone:
            raise KeyError(
                f"committed snapshots {gone} of {table!r} expired (paths "
                "nulled by expire_snapshots) — the union would be silently "
                "truncated; restore from backup or narrow after_epoch past "
                "the expired range"
            )
        paths = [os.path.join(self.root, s["path"]) for s in snaps]
        if not paths:
            return None
        return spark.read.parquet(*paths)

    def committed_rows(
        self,
        table: str,
        up_to_epoch: Optional[int] = None,
        after_epoch: Optional[int] = None,
    ) -> int:
        """Total rows across committed delta snapshots (footer counts —
        no Spark job)."""
        ids = set(self.committed_ids(table, up_to_epoch, after_epoch))
        return sum(
            s["rows"] for s in self.snapshots(table) if s["id"] in ids
        )

    def last_epoch(self) -> Optional[Dict]:
        epochs = self.manifest()["epochs"]
        return epochs[-1] if epochs else None

    def epoch_metrics(self) -> List[Dict]:
        return [
            {"epoch": e["epoch"], **e["metrics"]} for e in self.manifest()["epochs"]
        ]

    def expire_snapshots(
        self, table: str, keep_last: int = 2, force: bool = False
    ) -> int:
        """Iceberg-style maintenance: drop old snapshot dirs, keep the
        manifest lineage rows (paths nulled). Returns #removed.

        Append-mode snapshots referenced by a committed epoch are LIVE
        data (the table is their union), so expiring one would corrupt
        every ``read_committed`` — refused unless ``force=True`` (the
        engine passes force after folding deltas into a new base, when
        readers skip them via ``after_epoch``).

        Refuses to run while an epoch batch is open: the write below
        would flush the PENDING manifest (uncommitted-epoch snapshot
        rows) to disk, breaking ``begin_epoch_batch``'s invariant that
        the on-disk manifest is untouched until ``commit_epoch``."""
        with self._lock:
            if self._pending is not None:
                raise RuntimeError(
                    "expire_snapshots inside an open epoch batch would "
                    "flush the pending (uncommitted) manifest to disk — "
                    "run maintenance after commit_epoch/abort_epoch_batch"
                )
            manifest = self.manifest()
            snaps = manifest["tables"].get(table, [])
            doomed = snaps[:-keep_last] if keep_last else snaps
            if not force:
                committed = set(self.committed_ids(table))
                live = [
                    e["id"]
                    for e in doomed
                    if e.get("path")
                    and e.get("mode") == "append"
                    and e["id"] in committed
                ]
                if live:
                    raise ValueError(
                        f"snapshots {live} of append table {table!r} are "
                        "committed live data — expiring them would truncate "
                        "read_committed; pass force=True only after folding "
                        "them into a base"
                    )
            removed = 0
            for entry in doomed:
                if entry.get("path"):
                    target = os.path.join(self.root, entry["path"])
                    if os.path.isdir(target):
                        shutil.rmtree(target, ignore_errors=True)
                    else:  # blob snapshots are single files
                        try:
                            os.remove(target)
                        except OSError:
                            pass
                    entry["path"] = None
                    removed += 1
            if removed:
                # no-op expiries (nothing old enough) must not pay a
                # manifest rewrite — the epoch's write budget is ONE
                # durable write (commit_epoch) plus maintenance that
                # actually did something
                self._write_manifest(manifest)
            return removed


def _parquet_rows(path: str) -> int:
    """Row count from parquet footers — no Spark job, no full scan;
    footer reads threaded so many-file snapshots don't serialize."""
    from concurrent.futures import ThreadPoolExecutor

    import pyarrow.parquet as pq

    files = [
        os.path.join(path, n) for n in os.listdir(path) if n.endswith(".parquet")
    ]
    if not files:
        return 0
    if len(files) == 1:
        return pq.ParquetFile(files[0]).metadata.num_rows

    def rows(f: str) -> int:
        return pq.ParquetFile(f).metadata.num_rows

    with ThreadPoolExecutor(max_workers=min(16, len(files))) as pool:
        return sum(pool.map(rows, files))
