"""External KV-state plane: the control-plane state twin.

Reference: `state/State.java:10-73`, `state/StateCursor.java:12-160`,
`state/StateInterface.java`, `state/MemcachedStateInterface.java` /
`state/DatastoreStateInterface.java`, `state/StateException.java` —
the pipeline's cross-run state (watchlists, alert confirmation flow,
auth profiles in batch mode) lives in an external KV store addressed
by (namespace, kind, key) with JSON document values.

Spark mapping: this driver-side twin is the CONTROL-plane face —
config-scale data (watchlist entries, confirmation records) that the
engine materializes into broadcast dims (`watchlist_dataframe`). The
DATA-plane per-key state at event volume lives in Structured
Streaming state stores (`streaming/state.py`, `streaming/suppress.py`)
— the engine never round-trips per-event state through a remote KV at
scale, which is also why the reference batches its Datastore lookups
(`PostProcessing.java:102-126`); a broadcast join makes the batching
moot.

The memcached/datastore backends are network seams absent from this
container; `MemoryStateInterface` is the deterministic local
implementation with the same contract, golden-replayed against
`state/StateTest.java` (set/get round-trip, missing key -> None,
zero-length keys rejected) so a real backend can slot in behind the
same cursor semantics.
"""

from __future__ import annotations

import json
from abc import ABC, abstractmethod

from pyspark.sql import DataFrame, SparkSession


class StateException(Exception):
    """`state/StateException.java` — state layer failures."""


class StateInterface(ABC):
    """Backend contract (`state/StateInterface.java`): raw string
    get/set/enumerate under a (namespace, kind) scope."""

    def __init__(self, kind: str, namespace: str = "default") -> None:
        self.kind = kind
        self.namespace = namespace

    @abstractmethod
    def get_object(self, key: str) -> str | None: ...

    @abstractmethod
    def save_object(self, key: str, value: str) -> None: ...

    @abstractmethod
    def get_all_objects(self) -> list[str]: ...

    @abstractmethod
    def delete_all(self) -> None: ...

    def initialize(self) -> None:  # connection setup seam
        pass

    def done(self) -> None:  # connection teardown seam
        pass


class MemoryStateInterface(StateInterface):
    """Deterministic in-process backend — the local twin of the
    memcached/datastore seams. A class-level store keyed by
    (namespace, kind) gives separate State instances over the same
    scope a shared view, like two clients of one memcached."""

    _STORES: dict[tuple[str, str], dict[str, str]] = {}

    def _store(self) -> dict[str, str]:
        return self._STORES.setdefault((self.namespace, self.kind), {})

    def get_object(self, key: str) -> str | None:
        return self._store().get(key)

    def save_object(self, key: str, value: str) -> None:
        self._store()[key] = value

    def get_all_objects(self) -> list[str]:
        return list(self._store().values())

    def delete_all(self) -> None:
        self._store().clear()


class StateCursor:
    """`state/StateCursor.java:12-160`: typed get/set over the backend
    with JSON serde; a transaction cursor buffers writes until
    commit() (the datastore transactional path — `newCursor(cls,
    true)`), a plain cursor writes through. Zero-length keys raise
    StateException on both paths (StateTest
    testStateSetZeroLengthKey/testStateGetZeroLengthKey)."""

    def __init__(self, iface: StateInterface, transaction: bool) -> None:
        self._iface = iface
        self._transaction = transaction
        self._pending: list[tuple[str, str]] = []

    def get(self, key: str) -> dict | None:
        if not key:
            raise StateException("zero length key")
        buf = self._iface.get_object(key)
        return None if buf is None else json.loads(buf)

    def set(self, key: str, value: dict) -> None:
        if not key:
            raise StateException("zero length key")
        buf = json.dumps(value)
        if self._transaction:
            self._pending.append((key, buf))
        else:
            self._iface.save_object(key, buf)

    def get_all(self) -> list[dict]:
        return [json.loads(v) for v in self._iface.get_all_objects()]

    def commit(self) -> None:
        for key, buf in self._pending:
            self._iface.save_object(key, buf)
        self._pending = []


class State:
    """`state/State.java:10-73` — the cursor factory over a backend."""

    def __init__(self, iface: StateInterface) -> None:
        self._iface = iface

    def initialize(self) -> None:
        self._iface.initialize()

    def delete_all(self) -> None:
        self._iface.delete_all()

    def new_cursor(self, transaction: bool = False) -> StateCursor:
        return StateCursor(self._iface, transaction)

    def done(self) -> None:
        self._iface.done()


# ---------------------------------------------------------------------------
# Watchlist (`Watchlist.java:41-330`) — state-backed watched-object
# registry; entries are {"type", "object", "severity", "expires_at",
# "created_by"} documents keyed by the watched object, exactly the
# reference's Jackson field names (golden TestWatchlist).

WATCHLIST_NAMESPACE = "watchlist"
WATCHLIST_IP_KIND = "ip"
WATCHLIST_EMAIL_KIND = "email"


class Watchlist:
    """Watchlist reader over the state plane. `iface_factory(kind,
    namespace)` supplies the backend (MemoryStateInterface locally, a
    datastore client in deployment — `Watchlist.java:195-236`)."""

    def __init__(self, iface_factory=MemoryStateInterface) -> None:
        self._states = {
            kind: State(iface_factory(kind, WATCHLIST_NAMESPACE))
            for kind in (WATCHLIST_IP_KIND, WATCHLIST_EMAIL_KIND)
        }
        for s in self._states.values():
            s.initialize()

    def _get_watched(self, kind: str) -> list[dict] | None:
        s = self._states.get(kind)
        if s is None:
            return None
        return s.new_cursor().get_all()

    def get_watched_ips(self) -> list[dict]:
        return self._get_watched(WATCHLIST_IP_KIND)

    def get_watched_emails(self) -> list[dict]:
        return self._get_watched(WATCHLIST_EMAIL_KIND)

    def get_watchlist_entries(
        self, kind: str, values: list[str]
    ) -> list[dict]:
        """Group-fetch by object value (`Watchlist.java:243-280`) —
        unknown kinds return an empty list like the reference."""
        s = self._states.get(kind)
        if s is None:
            return []
        c = s.new_cursor()
        out = []
        for v in values:
            e = c.get(v)
            if e is not None:
                out.append(e)
        return out

    def done(self) -> None:
        for s in self._states.values():
            s.done()


def watchlist_dataframe(spark: SparkSession, wl: Watchlist) -> DataFrame:
    """Materialize the watchlist state as the broadcast dim consumed
    by `operators/customs.watchlist_match` (wl_type / wl_object /
    wl_severity / wl_created_by). Watchlists are config-scale (KBs):
    the one correct 100 TB shape is snapshot -> broadcast, never
    per-event KV lookups."""
    rows = [
        (e.get("type"), e.get("object"), e.get("severity"),
         e.get("created_by"), e.get("expires_at"))
        for e in (wl.get_watched_ips() or []) + (wl.get_watched_emails() or [])
    ]
    return spark.createDataFrame(
        rows,
        "wl_type string, wl_object string, wl_severity string, "
        "wl_created_by string, wl_expires_at string",
    )
