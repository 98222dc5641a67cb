"""Peak-throughput measurement.

Reference: throughput runners (cubecl-std/src/throughput/base.rs:26,
runners/{compute_direct,compute_cmma,memory_direct,launch_overhead}.rs)
with ``ThroughputMode{ComputeDirect,ComputeCmma,Memory,Launch}``
(cubecl-runtime/src/throughput/base.rs:9) and the measured-peak cache
feeding autotune roofline bounds (tune/bounds_generator.rs).

Measured peaks are cached persistently per device fingerprint.
"""

from __future__ import annotations

import json
import time
from typing import Dict, Optional

from ..runtime.profile import benchmark
from ..tune.cache import PersistentStore


def _device_of(client):
    return client._dev.call(lambda s: s.device)


def measure_memory_bw(client, nbytes: int = 1 << 26, iters: int = 10) -> float:
    """Copy bandwidth in bytes/s (read+write counted)."""
    import jax
    import jax.numpy as jnp

    dev = _device_of(client)
    with jax.default_device(dev):
        x = jnp.zeros((nbytes // 4,), jnp.float32)
        f = jax.jit(lambda v: v + 1.0)
        r = f(x)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(iters):
            r = f(r)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / iters
    return 2 * nbytes / dt


def measure_compute_mxu(client, n: int = 4096, iters: int = 10,
                        dtype: str = "bfloat16") -> float:
    """MXU peak FLOP/s via chained matmuls (the CMMA-peak runner)."""
    import jax
    import jax.numpy as jnp

    dev = _device_of(client)
    with jax.default_device(dev):
        a = jnp.ones((n, n), dtype)
        b = jnp.ones((n, n), dtype)

        def chain(a, b):
            c = a
            for _ in range(4):
                c = jax.lax.dot_general(
                    c, b, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(dtype)
            return c

        f = jax.jit(chain)
        r = f(a, b)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(iters):
            r = f(r, b)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / iters
    return 4 * 2 * n ** 3 / dt


def measure_compute_vpu(client, n: int = 1 << 24, iters: int = 10) -> float:
    """VPU peak FLOP/s via fused multiply-adds (compute-direct runner)."""
    import jax
    import jax.numpy as jnp

    dev = _device_of(client)
    K = 64
    with jax.default_device(dev):
        x = jnp.ones((n,), jnp.float32)

        def chain(v):
            for _ in range(K):
                v = v * 1.000001 + 0.5
            return v

        f = jax.jit(chain)
        r = f(x)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(iters):
            r = f(r)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / iters
    return 2 * K * n / dt


def measure_launch_overhead(client, iters: int = 100) -> float:
    """Seconds per (tiny) kernel launch, including dispatch."""
    import jax
    import jax.numpy as jnp

    dev = _device_of(client)
    with jax.default_device(dev):
        x = jnp.zeros((8, 128), jnp.float32)
        f = jax.jit(lambda v: v + 1.0)
        r = f(x)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(iters):
            r = f(r)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / iters


class ThroughputCache:
    """Measured peaks per device (reference throughput/cache.rs)."""

    MODES = {
        "memory": measure_memory_bw,
        "compute_cmma": measure_compute_mxu,
        "compute_direct": measure_compute_vpu,
        "launch": measure_launch_overhead,
    }

    def __init__(self, client):
        self.client = client
        fp = client.properties().identity.fingerprint
        self.store = PersistentStore(f"throughput/{fp}")

    def get(self, mode: str) -> float:
        cached = self.store.get(mode)
        if cached is not None:
            return float(json.loads(cached))
        val = self.MODES[mode](self.client)
        self.store.put(mode, json.dumps(val))
        return val

    def all(self) -> Dict[str, float]:
        return {m: self.get(m) for m in self.MODES}
