"""Memory management.

Reference: ``MemoryManagement<Storage>`` with persistent + dynamic sliced
pools (cubecl-runtime/src/memory_management/memory_manage.rs:122,
memory_pool/sliced_pool.rs:13-60), exponential bucket sizing
(memory_manage.rs:166-190), ``MemoryAllocationMode{Auto,Persistent}``
(memory_manage.rs:112) and ``MemoryUsage`` reporting (client.rs:1072).

TPU adaptation: device allocation is owned by XLA's BFC arena (PJRT) —
re-pooling HBM underneath it would fight the runtime — so pools here are
LOGICAL: live-handle byte tracking and usage/peak reporting. The
reference's pinned-host staging arena (cubecl-cuda io/controller.rs) has
no TPU counterpart worth keeping: PJRT owns its own transfer staging and
exposes no copy-into-preallocated-host-buffer API, so a Python-side
arena only added a copy (round-2 decision: deleted rather than kept as
decorative parity). D2H batching lives in ``JaxServer.read`` instead
(one ``jax.device_get`` for all requested handles)."""

from __future__ import annotations

import threading
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np


class MemoryUsage:
    """reference MemoryUsage (memory_management/base)."""

    bytes_in_use: int = 0
    bytes_reserved: int = 0
    number_allocs: int = 0
    peak_bytes: int = 0

    def __str__(self) -> str:
        mb = 1024 * 1024
        return (f"MemoryUsage(in_use={self.bytes_in_use / mb:.1f}MB, "
                f"reserved={self.bytes_reserved / mb:.1f}MB, "
                f"allocs={self.number_allocs}, peak={self.peak_bytes / mb:.1f}MB)")


class MemoryManagement:
    """Device-side logical memory manager (usage tracking + modes)."""

    def __init__(self, config: Optional[dict] = None):
        self.usage = MemoryUsage()
        self.mode = "auto"  # MemoryAllocationMode
        self._live: Dict[int, int] = {}  # handle id -> bytes
        self._lock = threading.Lock()

    def on_alloc(self, handle_id: int, nbytes: int) -> None:
        with self._lock:
            self._live[handle_id] = nbytes
            self.usage.bytes_in_use += nbytes
            self.usage.number_allocs += 1
            self.usage.peak_bytes = max(self.usage.peak_bytes,
                                        self.usage.bytes_in_use)
            self.usage.bytes_reserved = max(self.usage.bytes_reserved,
                                            self.usage.bytes_in_use)

    def on_free(self, handle_id: int) -> None:
        with self._lock:
            nbytes = self._live.pop(handle_id, 0)
            self.usage.bytes_in_use -= nbytes

    def allocation_mode(self, mode: str) -> None:
        assert mode in ("auto", "persistent")
        self.mode = mode

    def cleanup(self, explicit: bool = True) -> None:
        # device memory is XLA-owned; drop python references is all we can do
        pass

    def memory_usage(self) -> MemoryUsage:
        return self.usage
