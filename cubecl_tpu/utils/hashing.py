"""Stable hashing (reference cubecl-common/src/hash.rs).

Uses the native C++ xxhash64-style hasher from csrc when built (see
cubecl_tpu/csrc/native.cc), with a bit-identical pure-Python fallback so
the digest is stable across environments with and without a working g++
toolchain — it keys the persistent compilation/autotune/bundle stores
(reference compiler.rs:25-50, tune_cache.rs:35), and a toolchain-dependent
key function would make shared or copied caches silently miss."""

from __future__ import annotations

import struct

from .native import load_native

_native = load_native()

_P1 = 11400714785074694791
_P2 = 14029467366897019727
_P3 = 1609587929392839161
_P4 = 9650029242287828579
_P5 = 2870177450012600261
_M = 0xFFFFFFFFFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _xxh64_py(data: bytes, seed: int = 0) -> int:
    n = len(data)
    p = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        limit = n - 32
        while p <= limit:
            w1, w2, w3, w4 = struct.unpack_from("<QQQQ", data, p)
            v1 = (_rotl((v1 + w1 * _P2) & _M, 31) * _P1) & _M
            v2 = (_rotl((v2 + w2 * _P2) & _M, 31) * _P1) & _M
            v3 = (_rotl((v3 + w3 * _P2) & _M, 31) * _P1) & _M
            v4 = (_rotl((v4 + w4 * _P2) & _M, 31) * _P1) & _M
            p += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = (h * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while p + 8 <= n:
        (w,) = struct.unpack_from("<Q", data, p)
        h ^= (_rotl((w * _P2) & _M, 31) * _P1) & _M
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        p += 8
    if p + 4 <= n:
        (w,) = struct.unpack_from("<I", data, p)
        h ^= (w * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        p += 4
    while p < n:
        h ^= (data[p] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        p += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def stable_hash_bytes(data: bytes) -> str:
    if _native is not None:
        return f"{_native.xxh64(data, len(data), 0):016x}"
    return f"{_xxh64_py(data):016x}"


def stable_hash_str(text: str) -> str:
    return stable_hash_bytes(text.encode("utf-8"))
