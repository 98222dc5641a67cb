"""Cache bundles — export/import pre-warmed autotune + throughput caches.

Reference: cubecl-environment bundles (bundle/{export,import,manifest,
sqlite,embedded}.rs; cubecl/src/lib.rs:7-37) and named environments
(environment.rs:1-60) — the framework's checkpoint/resume equivalent
(SURVEY §5): ship a bundle with your app so first-run autotuning and peak
measurement are already done.

A bundle is a single JSON file: manifest + the kv rows of selected
namespaces from the persistent store.
"""

from __future__ import annotations

import json
import time
from typing import Dict, List, Optional

from .config import cache_root
from ..tune.cache import PersistentStore
from ..utils.hashing import stable_hash_str


BUNDLE_VERSION = 1


def export_bundle(path: str, namespaces: Optional[List[str]] = None,
                  note: str = "") -> dict:
    """Write all (or selected) cache namespaces to a bundle file."""
    import sqlite3
    import os

    db = PersistentStore("__manifest__").path
    rows: Dict[str, Dict[str, str]] = {}
    if os.path.exists(db):
        conn = sqlite3.connect(db)
        try:
            for ns, k, v in conn.execute("SELECT ns, k, v FROM kv"):
                if namespaces and not any(ns.startswith(p)
                                          for p in namespaces):
                    continue
                rows.setdefault(ns, {})[k] = v
        finally:
            conn.close()
    manifest = {
        "version": BUNDLE_VERSION,
        "created": time.time(),
        "note": note,
        "namespaces": sorted(rows),
        "entries": sum(len(v) for v in rows.values()),
        "checksum": stable_hash_str(json.dumps(rows, sort_keys=True)),
    }
    with open(path, "w") as f:
        json.dump({"manifest": manifest, "data": rows}, f)
    return manifest


def import_bundle(path: str, overwrite: bool = False) -> dict:
    """Load a bundle into the active environment's store."""
    with open(path) as f:
        bundle = json.load(f)
    manifest = bundle["manifest"]
    if manifest.get("version") != BUNDLE_VERSION:
        raise ValueError(f"unsupported bundle version {manifest.get('version')}")
    data = bundle["data"]
    check = stable_hash_str(json.dumps(data, sort_keys=True))
    if check != manifest["checksum"]:
        raise ValueError("bundle checksum mismatch (corrupted bundle)")
    for ns, kv in data.items():
        store = PersistentStore(ns)
        for k, v in kv.items():
            if not overwrite and store.get(k) is not None:
                continue
            store.put(k, v)
    return manifest
