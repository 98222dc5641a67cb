"""Peak-throughput measurement.

Reference: throughput runners (cubecl-std/src/throughput/base.rs:26,
runners/{compute_direct,compute_cmma,memory_direct,launch_overhead}.rs)
with ``ThroughputMode{ComputeDirect,ComputeCmma,Memory,Launch}``
(cubecl-runtime/src/throughput/base.rs:9) and the measured-peak cache
feeding autotune roofline bounds (tune/bounds_generator.rs).

Measured peaks are cached persistently per device fingerprint. All
runners follow the BENCH_NOTES measurement rules: D2H readback as the
completion barrier, slopes between short and long runs sized so the
timed spread dwarfs the tunnel's +-2-4ms jitter, and working sets big
enough that XLA cannot keep them VMEM-resident.
"""

from __future__ import annotations

import json
import time
from typing import Dict, Optional

from ..tune.cache import PersistentStore
from ..tune.timing import (chain_args_time, chain_pingpong_time,
                            chain_scalar_time)


def _device_of(client):
    return client._dev.call(lambda s: s.device)


def _slope_calls(run1, read_back, lo: int, hi: int, reps: int = 3) -> float:
    """Seconds per call: slope between lo and hi sequential dispatches
    (dispatch is async; the tunnel RTT is paid once per measurement and
    cancels in the slope)."""
    import numpy as np

    def run_n(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            r = None
            for _ in range(n):
                r = run1(r)
            read_back(r)
            best = min(best, time.perf_counter() - t0)
        return best

    tlo, thi = run_n(lo), run_n(hi)
    return max((thi - tlo) / (hi - lo), 1e-9)


def measure_memory_bw(client, nbytes: int = 1 << 28) -> float:
    """Peak HBM READ bandwidth in bytes/s, via a streaming reduce (the
    read-dominated bound autotune's roofline wants; r+w patterns add
    their own write traffic on top)."""
    import jax
    import jax.numpy as jnp

    dev = _device_of(client)
    with jax.default_device(dev):
        x = jnp.ones((nbytes // 4,), jnp.float32)
        per = chain_scalar_time(lambda v: jnp.sum(v).reshape(1), x,
                                lo=20, hi=80)
    return nbytes / per


def measure_compute_mxu(client, n: int = 4096,
                        dtype: str = "bfloat16") -> float:
    """MXU peak FLOP/s via chained matmuls (the CMMA-peak runner)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    dev = _device_of(client)
    with jax.default_device(dev):
        a = jnp.ones((n, n), dtype)
        b = jnp.ones((n, n), dtype)

        def chain(c, b):
            for _ in range(4):
                c = jax.lax.dot_general(
                    c, b, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(dtype)
            return c

        f = jax.jit(chain)
        np.asarray(f(a, b)[:1, :1])
        # auto-extending device chain (the host _slope_calls loop at
        # 2-vs-10 dispatches once read 242 TF — 123% of nominal)
        per = chain_args_time(lambda c, bb: f(c, bb), (a, b), lo=4, hi=16)
    return 4 * 2 * n ** 3 / per  # chain() does 4 matmuls per call


def measure_compute_vpu(client, n: int = 1 << 25) -> float:
    """VPU peak FLOP/s via fused multiply-adds (compute-direct runner)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    dev = _device_of(client)
    K = 256
    with jax.default_device(dev):
        x = jnp.ones((n,), jnp.float32)

        def chain(v):
            for _ in range(K):
                v = v * 1.000001 + 0.5
            return v

        f = jax.jit(chain)
        np.asarray(f(x)[:1])
        per = chain_pingpong_time(f, x, lo=4, hi=16)
    return 2 * K * n / per


def measure_launch_overhead(client, lo: int = 50, hi: int = 400) -> float:
    """Seconds per (tiny) kernel launch, including host dispatch — the
    per-call Python + PJRT cost a launch-bound loop pays (graph capture
    amortizes it; see BENCH_NOTES known overheads)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    dev = _device_of(client)
    with jax.default_device(dev):
        x = jnp.zeros((8, 128), jnp.float32)
        f = jax.jit(lambda v: v + 1.0)
        np.asarray(f(x)[:1, :1])
        return _slope_calls(lambda r: f(x if r is None else r),
                            lambda r: np.asarray(r[:1, :1]), lo, hi)


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
