"""Device actor — serialized access to a device server.

Reference: ``DeviceHandle`` (cubecl-common/src/device/handle/mod.rs:27) —
a channel-backed thread per device when multi-threaded, a mutex otherwise
(handle/mod.rs:18-24). Clients are cheap clones that ``submit`` closures
onto the actor (client.rs:888).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import Any, Callable, Optional


class DeviceHandle:
    """Owns a server instance; all access is serialized through submit()."""

    def __init__(self, server, multi_threading: bool = False):
        self._server = server
        self._mt = multi_threading
        if multi_threading:
            self._q: "queue.Queue" = queue.Queue()
            self._thread = threading.Thread(
                target=self._loop, daemon=True,
                name=f"cubecl-device-{getattr(server, 'name', '?')}")
            self._thread.start()
        else:
            self._lock = threading.RLock()

    def _loop(self) -> None:
        while True:
            item = self._q.get()
            if item is None:
                return
            fn, fut = item
            try:
                fut.set_result(fn(self._server))
            except BaseException as e:  # noqa: BLE001
                fut.set_exception(e)

    def submit(self, fn: Callable[[Any], Any]) -> Future:
        """Ship a closure to the server (reference DeviceHandle::submit,
        handle/mod.rs:72)."""
        fut: Future = Future()
        if self._mt:
            self._q.put((fn, fut))
        else:
            with self._lock:
                try:
                    fut.set_result(fn(self._server))
                except BaseException as e:  # noqa: BLE001
                    fut.set_exception(e)
        return fut

    def call(self, fn: Callable[[Any], Any]) -> Any:
        return self.submit(fn).result()

    def shutdown(self) -> None:
        if self._mt:
            self._q.put(None)


_REGISTRY: dict = {}
_REG_LOCK = threading.Lock()


def get_or_create(key, factory: Callable[[], DeviceHandle]) -> DeviceHandle:
    """Device registry (reference cubecl-common device registry + DeviceId)."""
    with _REG_LOCK:
        h = _REGISTRY.get(key)
        if h is None:
            h = factory()
            _REGISTRY[key] = h
        return h
