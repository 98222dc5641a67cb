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

    # Dead tiles skip the MXU (pl.when above) but a naive (e, t) index
    # map still streams their x block in and their o block out — at
    # E=8/cap=2048/d=f=4096 with 2.8x skew that dead-tile DMA was
    # ~0.5ms of a 1.6ms launch (117 TF, 59% of MXU, round 4). Clamping
    # t to the expert's LAST LIVE tile makes every dead step reuse the
    # resident block: Mosaic elides the re-fetch (input index
    # unchanged) and coalesces the writeback (output index unchanged),
    # so dead tiles cost only a grid step. Dead output rows stay
    # undefined either way (see docstring) — moe_combine masks them.
    # Round-5 v5e measurements after the clamp (see BENCH_NOTES "MoE
    # expert matmul: the weight-stream wall"): skew 137.6 TF-live at
    # bt=128 / 132.5 at bt=256 (was 117); dense-equivalent (all experts
    # full, bt=256) 187.8 TF = 95% of the dedicated matmul kernel and
    # ABOVE XLA's batched einsum (183.2). The remaining skew gap is the
    # per-expert 32MB weight fetch (measured 650 GB/s) serializing with
    # compute at expert boundaries — irreducible traffic the skewed
    # counts can't cover; k-splitting the weight would re-fetch it per
    # live tile (write-only out windows can't accumulate across
    # non-adjacent grid revisits), so bt=128 + clamp is the optimum of
    # this layout.
    def _t_live(t, cnt, e):
        last = jnp.maximum((cnt[e] + bt - 1) // bt - 1, 0)
        return jnp.minimum(t, last)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(E, n_t),
        in_specs=[
            pl.BlockSpec((1, bt, d),
                         lambda e, t, cnt: (e, _t_live(t, cnt, e), 0)),
            pl.BlockSpec((1, d, f), lambda e, t, cnt: (e, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, bt, f), lambda e, t, cnt: (e, _t_live(t, cnt, e), 0)),
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


# ---------------------------------------------------------------------------
# Expert parallelism: all_to_all token dispatch over an `ep` mesh axis
# ---------------------------------------------------------------------------


def _slots_in_bins(bin_ids, n_bins, valid=None):
    """Rank of each element within its bin (exclusive running count),
    sort-free via a cumulative one-hot. bin_ids (N,) int32 ->
    (slot (N,), counts (n_bins,)). ``valid`` masks elements that must
    not consume a slot."""
    import jax
    import jax.numpy as jnp

    oh = jax.nn.one_hot(bin_ids, n_bins, dtype=jnp.int32)
    if valid is not None:
        oh = oh * valid[:, None].astype(jnp.int32)
    ranks = jnp.cumsum(oh, axis=0) - oh                    # exclusive
    slot = jnp.take_along_axis(ranks, bin_ids[:, None], axis=1)[:, 0]
    return slot, oh.sum(0)


def moe_ep_ffn(x, router_w, w1, w2, w3, *, n_experts: int, top_k: int,
               cap_send: int, cap_local: int, axis: str = "ep",
               bt: int = 128, interpret: bool = False):
    """Expert-parallel sparse MoE FFN — call INSIDE shard_map.

    The GShard/Switch dispatch, built TPU-first: static-shape send
    buffers + two `lax.all_to_all` hops on ICI, a sort-free cumulative
    one-hot slot assignment at both ends, and the capacity-grouped
    `expert_matmul` pallas kernel (scalar-prefetch tile skip) for the
    expert GEMMs. No NCCL-style p2p plumbing: the collective IS the
    router fabric (reference ships raw collectives only,
    crates/cubecl-runtime/src/comm — composition left to users).

    x        (T_local, d)      this shard's tokens
    router_w (d, E)            replicated
    w1,w3    (E_local, d, f)   this shard's experts (E_local = E/ep)
    w2       (E_local, f, d)
    cap_send  per-destination-shard send capacity (tokens overflowing
              a destination's send bin are dropped at the SOURCE)
    cap_local per-local-expert compute capacity (overflow dropped at
              the DESTINATION; the origin learns via the echoed
              validity flag and renormalizes gates)
    -> (T_local, d)
    """
    import jax
    import jax.numpy as jnp

    ep = jax.lax.axis_size(axis)
    e_local = n_experts // ep
    assert e_local * ep == n_experts, (n_experts, ep)
    T, d = x.shape

    logits = x @ router_w                                   # (T, E)
    topv, tope = jax.lax.top_k(logits, top_k)
    gates = jax.nn.softmax(topv, axis=-1)                   # (T, k)

    # ---- source side: bin choices by destination shard --------------
    flat_e = tope.reshape(-1)                               # (T*k,)
    dest = flat_e // e_local
    eid = flat_e % e_local
    slot, _ = _slots_in_bins(dest, ep)
    live = slot < cap_send
    slot_c = jnp.where(live, slot, cap_send - 1)

    src = jnp.repeat(x, top_k, axis=0)                      # (T*k, d)
    xsend = jnp.zeros((ep, cap_send, d), x.dtype).at[dest, slot_c].add(
        jnp.where(live[:, None], src, 0).astype(x.dtype))
    # metadata rides one int buffer: 0 = empty, else local expert id+1
    msend = jnp.zeros((ep, cap_send), jnp.int32).at[dest, slot_c].add(
        jnp.where(live, eid + 1, 0).astype(jnp.int32))

    xr = jax.lax.all_to_all(xsend, axis, 0, 0)              # (ep, cap_send, d)
    mr = jax.lax.all_to_all(msend, axis, 0, 0)

    # ---- destination side: group received tokens per local expert ---
    n_r = ep * cap_send
    mr_f = mr.reshape(n_r)
    valid_r = mr_f > 0
    eid_r = jnp.maximum(mr_f - 1, 0)
    slot2, counts_full = _slots_in_bins(eid_r, e_local, valid=valid_r)
    live2 = valid_r & (slot2 < cap_local)
    slot2_c = jnp.where(live2, slot2, cap_local - 1)
    counts = jnp.minimum(counts_full, cap_local).astype(jnp.int32)

    xg = jnp.zeros((e_local, cap_local, d), x.dtype).at[eid_r, slot2_c].add(
        jnp.where(live2[:, None], xr.reshape(n_r, d), 0).astype(x.dtype))

    h = jax.nn.silu(expert_matmul(xg, w1, counts, bt=bt,
                                  interpret=interpret)) * \
        expert_matmul(xg, w3, counts, bt=bt, interpret=interpret)
    yg = expert_matmul(h.astype(xg.dtype), w2, counts, bt=bt,
                       interpret=interpret)                 # (E_l, cap, d)

    # gather back into the received layout; echo the survival flag so
    # origins can renormalize away destination-dropped choices
    y_r = jnp.where(live2[:, None], yg[eid_r, slot2_c], 0)
    f_r = live2.astype(jnp.int32)
    y_back = jax.lax.all_to_all(y_r.reshape(ep, cap_send, d), axis, 0, 0)
    f_back = jax.lax.all_to_all(f_r.reshape(ep, cap_send), axis, 0, 0)

    # ---- origin combine ---------------------------------------------
    ok = live & (f_back[dest, slot_c] > 0)                  # (T*k,)
    picked = jnp.where(ok[:, None], y_back[dest, slot_c], 0)
    picked = picked.reshape(T, top_k, d)
    g = jnp.where(ok.reshape(T, top_k), gates, 0.0)
    denom = jnp.maximum(g.sum(-1, keepdims=True), 1e-9)
    g = (g / denom).astype(picked.dtype)
    return jnp.einsum("tk,tkd->td", g, picked)
