"""Dry-run launch mode: compile + tune without executing.

Reference: cubecl-runtime/src/dry_run.rs:1-50 — ``LaunchMode{Execute,
Skip}`` for cache warming; autotune opts back in via ``RealRun``.

Enable with ``CUBECL_COMPILATION_DRY_RUN=true`` (or config
``[compilation] dry_run``); kernels compile (warming the persistent XLA
cache) but do not dispatch. Autotune benchmarks run for real inside
``real_run()`` so tuning results stay meaningful.
"""

from __future__ import annotations

import contextlib
import threading

from .config import runtime_config

_TLS = threading.local()


def dry_run_enabled() -> bool:
    if getattr(_TLS, "real", 0):
        return False
    return bool(runtime_config().get("compilation", {}).get("dry_run", False))


@contextlib.contextmanager
def real_run():
    """Force execution inside a dry-run session (reference RealRun)."""
    _TLS.real = getattr(_TLS, "real", 0) + 1
    try:
        yield
    finally:
        _TLS.real -= 1
