"""Persistent shared-state TABLE contract: keyed state one job writes
and another, separately-launched job reads.

Reference: `state/DatastoreStateInterface.java` /
`state/MemcachedStateInterface.java` — the reference shares state
ACROSS pipelines through an external KV store: CustomsStatusComparator
writes `email -> ScannedByEntry{ip_address, timestamp}`
(`customs/CustomsStatusComparator.java:155-164`, model
`CustomsAtRiskAccountState/CustomsAtRiskAccountStateModel.java`) and
the separately-running CustomsLoginFailureForAtRiskAccount reads it
(`customs/CustomsLoginFailureForAtRiskAccount.java:100-127`).

Spark mapping — state-as-TABLE, not state-as-KV: per-key state at any
volume is itself a keyed dataset, so the engine persists it as
versioned parquet snapshots with an atomically-flipped pointer and
merges deltas with an idempotent last-writer-wins upsert (the
standard `foreachBatch` + MERGE recipe; on an object store the
snapshot/pointer pair is exactly what Delta/Iceberg give you — this
module is the same contract over plain parquet so the container needs
no extra deps, and a Delta-backed implementation would swap in behind
the same four methods).

Why this scales where per-event KV round-trips don't: the state table
is ACCOUNT-cardinality (millions of rows), not event-cardinality;
merge is one shuffle on the key; readers take the snapshot as a
broadcast dim per micro-batch (the per-batch dim refresh pattern, T9).
The reference itself batches its Datastore lookups for the same
reason (`PostProcessing.java:102-126`).

Crash-safety model:
- Snapshots are immutable directories `v=NNNNNNNN/`; the pointer file
  `_LATEST.json` is replaced atomically (tempfile + os.replace), so a
  reader sees the old or the new snapshot, never a partial one.
- Writers serialize through an O_EXCL lock file (the analog of
  Datastore's per-entity transactions); a crashed writer leaves a
  stale lock that `lock_timeout` surfaces loudly rather than silently
  corrupting.
- `merge` is IDEMPOTENT per (job_id, batch_id): foreachBatch replays
  the last batch after a failure, and the committed-batch watermark in
  the pointer makes the replay a no-op — exactly-once state effects
  over at-least-once delivery.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


class StateTableError(Exception):
    """Lock/pointer failures — the StateException analog."""


class StateTable:
    """Versioned keyed state table on shared storage.

    Parameters
    ----------
    path : directory owning the snapshots and pointer.
    key_cols : state key (last-writer-wins per key).
    seq_cols : recency columns, DESCENDING — the newest row per key
        survives a merge. Must totally order rows within a key
        together with `tie_cols`, or merges are nondeterministic.
    tie_cols : ASCENDING tie-break columns (lexicographic-min wins on
        equal seq). Both orders are associative, so merging deltas
        incrementally equals one merge of their union.
    keep_versions : immutable snapshot dirs retained after a flip
        (readers of version N-1 may still be streaming it).
    """

    def __init__(
        self,
        path: str,
        key_cols: list[str],
        seq_cols: list[str],
        tie_cols: list[str] | None = None,
        keep_versions: int = 2,
        lock_timeout: float = 60.0,
    ) -> None:
        self.path = path
        self.key_cols = list(key_cols)
        self.seq_cols = list(seq_cols)
        self.tie_cols = list(tie_cols or [])
        self.keep_versions = int(keep_versions)
        self.lock_timeout = float(lock_timeout)
        os.makedirs(path, exist_ok=True)

    # ---- pointer & lock plumbing -------------------------------------

    @property
    def _pointer_path(self) -> str:
        return os.path.join(self.path, "_LATEST.json")

    def _read_pointer(self) -> dict:
        try:
            with open(self._pointer_path) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"version": 0, "committed": {}}

    def _write_pointer(self, meta: dict) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.path, prefix="_ptr_")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(meta, f)
            os.replace(tmp, self._pointer_path)  # atomic on POSIX
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise

    def _snapshot_dir(self, version: int) -> str:
        return os.path.join(self.path, f"v={version:08d}")

    def _acquire_lock(self) -> str:
        lock = os.path.join(self.path, "_LOCK")
        deadline = time.monotonic() + self.lock_timeout
        while True:
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, str(os.getpid()).encode())
                os.close(fd)
                return lock
            except FileExistsError:
                if time.monotonic() > deadline:
                    raise StateTableError(
                        f"state table writer lock held past "
                        f"{self.lock_timeout}s: {lock} (crashed writer? "
                        "remove the lock file after verifying)"
                    ) from None
                time.sleep(0.05)

    # ---- contract ----------------------------------------------------

    def version(self) -> int:
        return int(self._read_pointer()["version"])

    def read(self, spark: SparkSession, schema: str | None = None) -> DataFrame:
        """Latest committed snapshot as a batch DataFrame (snapshot
        isolation: concurrent merges don't move this plan's data). An
        empty table needs `schema` to produce an empty frame."""
        meta = self._read_pointer()
        if meta["version"] == 0:
            if schema is None:
                raise StateTableError(
                    "empty state table and no schema provided"
                )
            return spark.createDataFrame([], schema)
        return spark.read.parquet(self._snapshot_dir(meta["version"]))

    def merge(
        self,
        delta: DataFrame,
        job_id: str = "default",
        batch_id: int | None = None,
    ) -> bool:
        """Idempotent keyed upsert: union(current, delta) -> keep the
        newest row per key (seq desc, tie asc) -> write snapshot
        version+1 -> flip the pointer. Returns False (no-op) when
        `batch_id` was already committed by `job_id` — the replayed-
        batch case. One shuffle on the key; state-table-sized, not
        corpus-sized."""
        lock = self._acquire_lock()
        try:
            meta = self._read_pointer()
            if batch_id is not None:
                last = meta["committed"].get(job_id)
                if last is not None and batch_id <= last:
                    return False
            cur_version = int(meta["version"])
            merged = delta
            if cur_version > 0:
                current = delta.sparkSession.read.parquet(
                    self._snapshot_dir(cur_version)
                )
                merged = current.unionByName(delta)
            order = [F.col(c).desc() for c in self.seq_cols] + [
                F.col(c).asc() for c in self.tie_cols
            ]
            w = Window.partitionBy(*self.key_cols).orderBy(*order)
            merged = (
                merged.withColumn("__rn", F.row_number().over(w))
                .where(F.col("__rn") == 1)
                .drop("__rn")
            )
            new_version = cur_version + 1
            merged.write.mode("overwrite").parquet(
                self._snapshot_dir(new_version)
            )
            if batch_id is not None:
                meta["committed"][job_id] = batch_id
            meta["version"] = new_version
            self._write_pointer(meta)
            self._prune(new_version)
            return True
        finally:
            os.unlink(lock)

    def foreach_batch_merger(self, job_id: str):
        """The writeStream.foreachBatch hook:
        ``stream.writeStream.foreachBatch(table.foreach_batch_merger(
        "job-a"))`` — Spark hands (batch_df, batch_id); replays after
        a restart dedupe on the committed watermark."""

        def fn(batch_df: DataFrame, batch_id: int) -> None:
            self.merge(batch_df, job_id=job_id, batch_id=batch_id)

        return fn

    def _prune(self, latest: int) -> None:
        floor = latest - self.keep_versions
        for name in os.listdir(self.path):
            if not name.startswith("v="):
                continue
            try:
                v = int(name.split("=", 1)[1])
            except ValueError:
                continue
            if v <= floor:
                shutil.rmtree(os.path.join(self.path, name),
                              ignore_errors=True)


# ---------------------------------------------------------------------------
# Domain binding: the at-risk-account state contract.

AT_RISK_SCHEMA = "email string, scanned_by string, scanned_at timestamp"


def at_risk_state_table(path: str, **kw) -> StateTable:
    """The `customs_lfara` Datastore kind as a state table: key =
    email, newest scan wins (`CustomsAtRiskAccountStateModel.
    ScannedByEntry` carries ip_address + timestamp; the comparator
    overwrites per email, so last-writer-wins IS the reference
    semantics). tie_cols mirrors `status_comparator_state`'s
    (window_start DESC, addr ASC) ordering so the incremental merge
    of comparator deltas equals the one-shot batch state."""
    return StateTable(
        path,
        key_cols=["email"],
        seq_cols=["scanned_at"],
        tie_cols=["scanned_by"],
        **kw,
    )
