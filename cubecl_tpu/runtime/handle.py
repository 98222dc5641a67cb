"""Handles — pooled device memory references.

Reference: ``Handle``/``Binding`` (cubecl-runtime/src/server/handle.rs:
10,138) — an id into the memory pools plus byte offsets. Here a handle
wraps a jax.Array slot managed by the server's MemoryManagement; mutable
kernel launches rebind ``array`` (functional in-place: XLA donation makes
this zero-copy on device).
"""

from __future__ import annotations

import itertools
import threading
from typing import Any, Optional, Tuple

_IDS = itertools.count()


class Handle:
    __slots__ = ("id", "_array", "shape", "dtype", "offset_start",
                 "offset_end", "stream", "_server")

    def __init__(self, array, server=None, stream: int = 0):
        self.id = next(_IDS)
        self._server = server
        self._array = array
        self.shape = tuple(array.shape)
        self.dtype = array.dtype
        self.offset_start: Optional[int] = None
        self.offset_end: Optional[int] = None
        self.stream = stream

    @property
    def array(self):
        """The backing jax array. Reading it first flushes any launches
        still queued on the owning server's stream scheduler — direct
        ``handle.array`` consumers (ops code, timing harnesses) must see
        settled dispatch order, exactly like ``client.read``."""
        srv = self._server
        if srv is not None:
            srv.flush_streams()
        return self._array

    @array.setter
    def array(self, value) -> None:
        srv = self._server
        if srv is not None:
            srv.flush_streams()
        self._array = value

    @property
    def size_bytes(self) -> int:
        n = 1
        for s in self.shape:
            n *= s
        return n * self._array.dtype.itemsize

    def binding(self) -> "Handle":
        """reference Handle::binding — consume into a kernel binding; the
        distinction is moot under functional arrays, kept for API parity."""
        return self

    def clone(self) -> "Handle":
        h = Handle(self.array, self._server, self.stream)
        return h

    def __repr__(self) -> str:
        return f"Handle(id={self.id}, shape={self.shape}, dtype={self.dtype})"
