"""Generic lease pool (reference cubecl-common/src/pool.rs — used there
for wgpu shared-binding reuse; here for host staging buffers and any
expensive reusable resource).

A resource is checked out as a ``Lease`` (context manager); dropping it
returns the resource for reuse. The pool grows on demand up to
``max_size``, after which acquire blocks until a lease returns.
"""

from __future__ import annotations

import threading
from typing import Any, Callable, Generic, List, Optional, TypeVar

T = TypeVar("T")


class Lease(Generic[T]):
    def __init__(self, pool: "LeasePool[T]", item: T):
        self._pool = pool
        self.item = item
        self._returned = False

    def release(self) -> None:
        if not self._returned:
            self._returned = True
            self._pool._return(self.item)

    def __enter__(self) -> T:
        return self.item

    def __exit__(self, *exc) -> None:
        self.release()

    def __del__(self):  # safety net — leases should be released explicitly
        try:
            self.release()
        except Exception:
            pass


class LeasePool(Generic[T]):
    """Bounded pool of reusable resources created by ``factory``."""

    def __init__(self, factory: Callable[[], T],
                 max_size: Optional[int] = None):
        self._factory = factory
        self._max = max_size
        self._free: List[T] = []
        self._total = 0
        self._lock = threading.Lock()
        self._available = threading.Condition(self._lock)

    def acquire(self, timeout: Optional[float] = None) -> Lease[T]:
        with self._available:
            while True:
                if self._free:
                    return Lease(self, self._free.pop())
                if self._max is None or self._total < self._max:
                    self._total += 1
                    break
                if not self._available.wait(timeout):
                    raise TimeoutError("lease pool exhausted")
        return Lease(self, self._factory())

    def _return(self, item: T) -> None:
        with self._available:
            self._free.append(item)
            self._available.notify()

    @property
    def size(self) -> int:
        return self._total

    @property
    def free(self) -> int:
        return len(self._free)
