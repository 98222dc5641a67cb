"""Stable hashing (reference cubecl-common/src/hash.rs).

Uses the native C++ xxhash64-style hasher from csrc when built (see
cubecl_tpu/csrc/native.cc), falling back to hashlib. The digest must be
stable across processes — it keys the persistent compilation/autotune
stores (reference compiler.rs:25-50, tune_cache.rs:35)."""

from __future__ import annotations

import hashlib
from typing import Optional

from .native import load_native

_native = load_native()


def stable_hash_bytes(data: bytes) -> str:
    if _native is not None:
        return f"{_native.xxh64(data, len(data), 0):016x}"
    return hashlib.sha256(data).hexdigest()[:16]


def stable_hash_str(text: str) -> str:
    return stable_hash_bytes(text.encode("utf-8"))
