"""Tunnel-proof device timing harnesses (see BENCH_NOTES.md).

Three hazards govern every perf number taken through the axon tunnel
(reference: the tune benchmark driver times with device events,
cubecl-runtime/src/tune/tune_benchmark.rs:26 — these harnesses are the
TPU/tunnel equivalent):

1. completion must be forced with a >=1-element D2H readback
   (``block_until_ready`` may return early through the tunnel);
2. the timed spread ``(hi - lo) * per_iter`` must dwarf the +-2-4ms
   per-measurement jitter (>= ~40ms) or the slope is noise — all
   helpers AUTO-EXTEND their chains (recompiling longer ones) until
   the spread clears ``_MIN_SPREAD``, because hand-picked chain
   lengths repeatedly produced 15-25% phantom swings;
3. chained loops over arrays that fit in VMEM (< ~100MB) may never
   touch HBM — benchmark r+w kernels on >=256MB working sets.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Sequence

_MIN_SPREAD = 0.04   # seconds; ~10x the tunnel's per-measurement jitter
_MAX_CHAIN = 100_000  # fori_loop is rolled — chain length costs no compile


def _best(fn, reps):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def _auto_slope(make_run, lo: int, hi: int, reps: int) -> float:
    """Slope between lo- and hi-length chains, auto-extending until the
    timed spread dwarfs tunnel jitter (hazard 2). ``make_run(n)`` must
    return a zero-arg callable that runs the n-chain and BLOCKS on a
    D2H readback (hazard 1). Extending costs a recompile of the longer
    chains — that is the price of a valid number."""
    spread = 0.0
    meas_lo, meas_hi = lo, hi
    for _ in range(6):
        rlo, rhi = make_run(lo), make_run(hi)
        rlo()          # warm + compile
        rhi()
        tlo, thi = _best(rlo, reps), _best(rhi, reps)
        spread = thi - tlo
        # remember the chain lengths this spread was MEASURED at — the
        # rescale below must not leak into the returned slope (dividing
        # the last spread by an already-scaled chain understates per-iter
        # time by up to 16x when all rounds exhaust)
        meas_lo, meas_hi = lo, hi
        if spread >= _MIN_SPREAD or hi >= _MAX_CHAIN:
            break
        if spread <= 1e-3:
            scale = 16
        else:
            scale = min(16, max(2, int(-(-0.06 // spread))))
        lo, hi = lo * scale, hi * scale
    return max(spread / (meas_hi - meas_lo), 1e-9)


def chain_scalar_time(f: Callable[[Any], Any], x, lo: int = 50,
                      hi: int = 200, reps: int = 4) -> float:
    """Per-iteration device time of ``f(x) -> small array`` for
    READ-dominated kernels: the input is tied to the running scalar
    carry with ``optimization_barrier`` so iterations cannot be CSE'd
    or hoisted, and the input is never rewritten (1n traffic)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    out0 = f(x)
    init = jnp.zeros_like(out0)

    def make_run(n):
        @jax.jit
        def run(x, s0):
            def body(_i, s):
                xx, ss = jax.lax.optimization_barrier((x, s))
                return f(xx) + ss * 1e-30
            return jax.lax.fori_loop(0, n, body, s0)
        return lambda: np.asarray(run(x, init).reshape(-1)[:1])

    return _auto_slope(make_run, lo, hi, reps)


def chain_pingpong_time(f: Callable[[Any], Any], x, lo: int = 20,
                        hi: int = 80, reps: int = 4) -> float:
    """Per-iteration device time of a same-shape map ``f(x) -> y``: the
    output feeds the next iteration's input (true serialization). NOTE
    hazard 4 (BENCH_NOTES): unless f aliases its buffer in-place, XLA
    copies the result back into the loop carry each iteration — a full
    extra read+write billed to f. Compare like with like."""
    import jax
    import numpy as np

    def make_run(n):
        @jax.jit
        def run(x0):
            def body(_i, xv):
                return f(jax.lax.optimization_barrier(xv))
            return jax.lax.fori_loop(0, n, body, x0)
        return lambda: np.asarray(run(x).reshape(-1)[:1])

    return _auto_slope(make_run, lo, hi, reps)


def chain_args_time(f: Callable[..., Any], args: Sequence[Any],
                    lo: int = 20, hi: int = 80, reps: int = 4) -> float:
    """Per-iteration time of ``f(*args) -> pytree`` (multi-input kernels,
    e.g. attention): args are barrier-tied to a scalar carry; the first
    output leaf's first element feeds the carry so no iteration can be
    elided. Pass ALL large arrays through ``args`` — closing over a
    concrete array ships it as a literal in the remote compile request
    (HTTP 413)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    args = tuple(args)

    def make_run(n):
        @jax.jit
        def run(args, s0):
            def body(_i, s):
                a2, ss = jax.lax.optimization_barrier((args, s))
                o = f(*a2)
                # tie EVERY output leaf into the carry — a first-leaf-
                # only carry lets XLA DCE whole sibling kernels (e.g. a
                # split dq/dkv backward pair times only dq; round-5
                # review). NOTE this still cannot stop slice-sinking
                # through XLA-level composite outputs — functions whose
                # outputs are not opaque kernel results (e.g. a whole
                # train step) need a true chained loop instead.
                t = sum(leaf.reshape(-1)[0].astype(jnp.float32)
                        for leaf in jax.tree_util.tree_leaves(o))
                return ss * 1e-30 + t
            return jax.lax.fori_loop(0, n, body, s0)
        return lambda: np.asarray(run(args, 0.0))

    return _auto_slope(make_run, lo, hi, reps)
