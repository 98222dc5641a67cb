"""Sparse MoE dispatch: capacity-grouped expert matmul with tile
skipping — the serving-grade alternative to computing every expert
densely.

TPU-native structure (megablocks idea, re-shaped for Mosaic):
tokens are scattered to a fixed-capacity (E, cap, d) layout (static
shapes — the TPU answer to ragged grouped GEMM), and the kernel's grid
sweeps (expert, cap-tile); a SCALAR-PREFETCHED per-expert token count
lets every tile past ``ceil(count[e]/bt)`` skip BOTH MXU matmuls, so
compute scales with the actual routed tokens rather than E·cap. The
dense-einsum path (models/llama._moe) stays the training/ep-sharding
reference; this one wins at serving when expert load is unbalanced.

Reference analogue: the reference's kernel crates express persistent
specialized matmuls per config (cubecl-matmul); the capacity-grouped
layout + runtime-count tile skip is the TPU-idiomatic equivalent.
"""

from __future__ import annotations

import functools
import math

import jax
import numpy as np


@functools.partial(jax.jit, static_argnames=("bt", "interpret"))
def expert_matmul(xg, w, counts, bt: int = 128, interpret: bool = False):
    """Batched per-expert matmul with dead-tile skipping.

    xg:     (E, cap, d)  capacity-grouped tokens (rows >= counts[e]
                         are padding whose content is ignored BUT whose
                         output is undefined — mask downstream)
    w:      (E, d, f)    per-expert weights
    counts: (E,) int32   live rows per expert
    -> (E, cap, f)
    """
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    E, cap, d = xg.shape
    f = w.shape[2]
    bt = min(bt, cap)
    while cap % bt:        # largest divisor of the capacity
        bt -= 8 if bt > 8 else 1
    n_t = cap // bt

    def kernel(cnt_ref, x_ref, w_ref, o_ref):
        e = pl.program_id(0)
        t = pl.program_id(1)

        def _run():
            o_ref[0] = jax.lax.dot(
                x_ref[0], w_ref[0],
                preferred_element_type=jnp.float32).astype(o_ref.dtype)

        # tiles fully past the expert's live rows skip the MXU work
        pl.when(t * bt < cnt_ref[e])(_run)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(E, n_t),
        in_specs=[
            pl.BlockSpec((1, bt, d), lambda e, t, cnt: (e, t, 0)),
            pl.BlockSpec((1, d, f), lambda e, t, cnt: (e, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bt, f), lambda e, t, cnt: (e, t, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((E, cap, f), xg.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
        name=f"expert_mm_{bt}x{d}x{f}",
    )(counts, xg, w)


def moe_dispatch(x, router_logits, top_k: int, capacity: int):
    """Token -> expert-capacity scatter. x (T, d), logits (T, E) ->
    (xg (E, cap, d), gates (T, k), slot (T, k), expert (T, k),
    counts (E,), live (T, k)). Tokens beyond an expert's capacity are
    DROPPED (live=False) — standard capacity-factor semantics; their
    gate weight is renormalized away by the combine step.
    """
    import jax.numpy as jnp

    T, E = router_logits.shape
    topv, tope = jax.lax.top_k(router_logits, top_k)       # (T, k)
    gates = jax.nn.softmax(topv, axis=-1)
    # slot of token t's j-th choice within expert e = its rank among
    # earlier (t', j') routed to e — computed with one cumulative sum
    # over the flattened one-hot (static shapes, no sort)
    flat_e = tope.reshape(-1)                              # (T*k,)
    oh = jax.nn.one_hot(flat_e, E, dtype=jnp.int32)        # (T*k, E)
    ranks = jnp.cumsum(oh, axis=0) - oh                    # exclusive
    slot = jnp.take_along_axis(ranks, flat_e[:, None],
                               axis=1)[:, 0].reshape(T, top_k)
    counts_full = oh.sum(0)                                # (E,)
    live = slot < capacity
    counts = jnp.minimum(counts_full, capacity).astype(jnp.int32)

    d = x.shape[1]
    xg = jnp.zeros((E, capacity, d), x.dtype)
    flat_slot = jnp.where(live, slot, capacity - 1).reshape(-1)
    flat_live = live.reshape(-1)
    src = jnp.repeat(x, top_k, axis=0)                     # (T*k, d)
    # scatter-add is safe: each (e, slot) pair is unique among live
    # entries; dead entries contribute zeros
    xg = xg.at[flat_e, flat_slot].add(
        jnp.where(flat_live[:, None], src, 0).astype(x.dtype))
    return xg, gates, slot, tope, counts, live


def moe_combine(yg, gates, slot, expert, live):
    """Gather expert outputs back per token and mix by (renormalized)
    gates: yg (E, cap, f) -> (T, f)."""
    import jax.numpy as jnp

    T, k = gates.shape
    flat_e = expert.reshape(-1)
    flat_s = jnp.where(live, slot, 0).reshape(-1)
    picked = yg[flat_e, flat_s].reshape(T, k, -1)          # (T, k, f)
    # skipped tiles leave their output UNDEFINED on hardware — zero
    # dead gathers explicitly (NaN * 0 would poison the mix)
    picked = jnp.where(live[..., None], picked, 0)
    g = jnp.where(live, gates, 0.0)
    denom = jnp.maximum(g.sum(-1, keepdims=True), 1e-9)
    g = (g / denom).astype(picked.dtype)
    return jnp.einsum("tk,tkf->tf", g, picked)
