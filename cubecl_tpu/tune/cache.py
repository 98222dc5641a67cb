"""Autotune cache: in-memory + persistent sqlite store.

Reference: ``TuneCache`` with persistent validation
(cubecl-runtime/src/tune/tune_cache.rs:35-231) over the environment's
sqlite ``Store`` (cubecl-environment/src/persistence/sqlite.rs).
"""

from __future__ import annotations

import json
import os
import sqlite3
from typing import Any, Dict, Optional, Tuple

from ..runtime.config import cache_root
from ..utils.pool import LeasePool


class PersistentStore:
    """Namespaced sqlite key-value store (reference persistence/store.rs).
    Shared by autotune + compilation caches + bundles.

    Connections are leased from a bounded ``LeasePool`` (the reference
    leases expensive reusable resources the same way,
    cubecl-common/src/pool.rs): each lease is thread-exclusive, so no
    global lock is needed, and connections are reused instead of being
    opened (and leaked until GC) once per operation."""

    def __init__(self, namespace: str, path: Optional[str] = None):
        self.namespace = namespace
        self.path = path or os.path.join(cache_root(), "store.sqlite")
        self._pool: LeasePool = LeasePool(self._connect, max_size=4)
        self._init()

    def _connect(self):
        # leases may migrate between threads; exclusivity comes from the
        # pool (one holder per connection at a time)
        conn = sqlite3.connect(self.path, timeout=5.0,
                               check_same_thread=False)
        conn.execute("PRAGMA journal_mode=WAL")
        return conn

    def _init(self) -> None:
        with self._pool.acquire() as conn, conn:
            conn.execute(
                "CREATE TABLE IF NOT EXISTS kv ("
                " ns TEXT NOT NULL, k TEXT NOT NULL, v TEXT NOT NULL,"
                " PRIMARY KEY (ns, k))")

    def get(self, key: str) -> Optional[str]:
        with self._pool.acquire() as conn, conn:
            row = conn.execute(
                "SELECT v FROM kv WHERE ns=? AND k=?",
                (self.namespace, key)).fetchone()
        return row[0] if row else None

    def put(self, key: str, value: str) -> None:
        with self._pool.acquire() as conn, conn:
            conn.execute(
                "INSERT OR REPLACE INTO kv (ns, k, v) VALUES (?,?,?)",
                (self.namespace, key, value))

    def delete(self, key: str) -> None:
        with self._pool.acquire() as conn, conn:
            conn.execute("DELETE FROM kv WHERE ns=? AND k=?",
                         (self.namespace, key))

    def items(self):
        with self._pool.acquire() as conn, conn:
            return conn.execute(
                "SELECT k, v FROM kv WHERE ns=?", (self.namespace,)).fetchall()


class TuneCache:
    """Fastest-candidate cache for one TunableSet on one device."""

    def __init__(self, set_name: str, device_fingerprint: str,
                 checksum: str, persistent: bool = True):
        self.mem: Dict[str, Tuple[int, str, dict]] = {}  # key -> (index, name, timings)
        self.checksum = checksum
        self.store = PersistentStore(
            f"autotune/{device_fingerprint}/{set_name}") if persistent else None
        if self.store is not None:
            self._load()

    def _load(self) -> None:
        for k, v in self.store.items():
            try:
                entry = json.loads(v)
            except json.JSONDecodeError:
                continue
            if entry.get("checksum") != self.checksum:
                continue  # stale code — ignore (reference checksum guard)
            self.mem[k] = (entry["index"], entry.get("name", "?"),
                           entry.get("timings", {}))

    def get(self, key: Any) -> Optional[int]:
        hit = self.mem.get(str(key))
        return hit[0] if hit else None

    def timings(self, key: Any) -> dict:
        """Measured per-candidate seconds recorded when the key was tuned."""
        hit = self.mem.get(str(key))
        return hit[2] if hit else {}

    def put(self, key: Any, index: int, name: str,
            timings: Optional[dict] = None) -> None:
        self.mem[str(key)] = (index, name, timings or {})
        if self.store is not None:
            self.store.put(str(key), json.dumps({
                "index": index, "name": name, "checksum": self.checksum,
                "timings": timings or {}}))
