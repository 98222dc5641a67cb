"""Sharded training: AdamW, global-norm clipping, mixed precision,
gradient accumulation, and ZeRO-3-style FSDP — the production training
loop the reference leaves to downstream burn (SURVEY §2.9: the
reference ships device enumeration + collectives; burn composes them
into optimizers).

TPU-native design (scaling-book recipe, not a DeepSpeed translation):
FSDP here is *sharding annotations*, not hand-written gather loops —
parameters and optimizer moments carry a ``NamedSharding`` over the
``fsdp`` mesh axis, the train step is jitted with matching
``out_shardings`` and donated state, and XLA/GSPMD inserts the
all-gather (weights, fwd+bwd) and reduce-scatter (grads) collectives
on ICI. One axis serves as both data- and param-shard axis, exactly
like jax's canonical FSDP. Optimizer math is optax-free pure-jaxpr
(tested against optax.adamw as the oracle) so the whole step stays a
single compiled program with no Python between microbatches.

Mixed precision follows the production convention: f32 master weights
+ moments (sharded), compute in bf16 (cast inside the step so the
bf16 copy never persists in HBM), gradient accumulation over
microbatches via ``lax.scan`` in f32.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np

__all__ = [
    "adamw_init",
    "adamw_update",
    "clip_by_global_norm",
    "warmup_cosine",
    "fsdp_shardings",
    "make_fsdp_train_step",
]


# ---------------------------------------------------------------------------
# AdamW (pure jaxpr, decoupled weight decay, bias correction)
# ---------------------------------------------------------------------------


def adamw_init(params):
    """Moment trees in f32 regardless of param dtype + a step counter."""
    import jax
    import jax.numpy as jnp

    zeros = lambda p: jnp.zeros(p.shape, jnp.float32)  # noqa: E731
    return {
        "m": jax.tree_util.tree_map(zeros, params),
        "v": jax.tree_util.tree_map(zeros, params),
        "step": jnp.zeros((), jnp.int32),
    }


def adamw_update(params, grads, state, lr, *, b1=0.9, b2=0.999, eps=1e-8,
                 weight_decay=0.0):
    """One AdamW step. Returns (new_params, new_state). All math in f32;
    the update is cast back to each param's dtype at the end (for f32
    master weights that cast is a no-op)."""
    import jax
    import jax.numpy as jnp

    step = state["step"] + 1
    c1 = 1.0 - b1 ** step.astype(jnp.float32)
    c2 = 1.0 - b2 ** step.astype(jnp.float32)

    def upd(p, g, m, v):
        g = g.astype(jnp.float32)
        m = b1 * m + (1.0 - b1) * g
        v = b2 * v + (1.0 - b2) * g * g
        u = (m / c1) / (jnp.sqrt(v / c2) + eps)
        if weight_decay:
            u = u + weight_decay * p.astype(jnp.float32)
        return (p - (lr * u).astype(p.dtype)).astype(p.dtype), m, v

    flat, treedef = jax.tree_util.tree_flatten(params)
    gflat = treedef.flatten_up_to(grads)
    mflat = treedef.flatten_up_to(state["m"])
    vflat = treedef.flatten_up_to(state["v"])
    out = [upd(p, g, m, v) for p, g, m, v in zip(flat, gflat, mflat, vflat)]
    new_p = treedef.unflatten([o[0] for o in out])
    new_m = treedef.unflatten([o[1] for o in out])
    new_v = treedef.unflatten([o[2] for o in out])
    return new_p, {"m": new_m, "v": new_v, "step": step}


def warmup_cosine(peak_lr: float, warmup_steps: int, total_steps: int,
                  end_lr: float = 0.0):
    """Linear warmup to ``peak_lr`` then cosine decay to ``end_lr`` —
    the production default. Returns schedule(step) -> lr (traceable)."""
    import jax.numpy as jnp

    def schedule(step):
        s = step.astype(jnp.float32) if hasattr(step, "astype") \
            else jnp.float32(step)
        warm = peak_lr * s / max(1, warmup_steps)
        prog = jnp.clip((s - warmup_steps)
                        / max(1, total_steps - warmup_steps), 0.0, 1.0)
        cos = end_lr + (peak_lr - end_lr) * 0.5 * (1 + jnp.cos(jnp.pi * prog))
        return jnp.where(s < warmup_steps, warm, cos)

    return schedule


def clip_by_global_norm(grads, max_norm: float):
    """Scale the whole gradient tree so its global L2 norm <= max_norm.
    Returns (clipped, global_norm)."""
    import jax
    import jax.numpy as jnp

    leaves = jax.tree_util.tree_leaves(grads)
    gn = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in leaves))
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(gn, 1e-12))
    return jax.tree_util.tree_map(
        lambda g: (g.astype(jnp.float32) * scale).astype(g.dtype), grads), gn


# ---------------------------------------------------------------------------
# FSDP shardings: annotate, don't orchestrate
# ---------------------------------------------------------------------------


def fsdp_shardings(tree, mesh, axis: str = "fsdp", min_elems: int = 2 ** 12):
    """A NamedSharding tree: each leaf sharded along its largest
    ``axis``-divisible dimension; small/indivisible leaves replicated.

    ZeRO-3's per-parameter partitioning falls out of GSPMD from these
    annotations alone — weights are all-gathered just-in-time per layer
    in fwd/bwd and grads reduce-scattered, with no manual bucketing
    (DeepSpeed's ~3k LoC of gather/partition machinery is exactly what
    the compiler owns on TPU)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = mesh.shape[axis]

    def spec_for(leaf):
        shape = getattr(leaf, "shape", ())
        if not shape or int(np.prod(shape)) < min_elems:
            return P()
        dims = [d for d in range(len(shape)) if shape[d] % n == 0]
        if not dims:
            return P()
        best = max(dims, key=lambda d: shape[d])
        spec = [None] * len(shape)
        spec[best] = axis
        return P(*spec)

    return jax.tree_util.tree_map(
        lambda leaf: NamedSharding(mesh, spec_for(leaf)), tree)


# ---------------------------------------------------------------------------
# The jitted FSDP step factory
# ---------------------------------------------------------------------------


def make_fsdp_train_step(
    loss_fn: Callable[[Any, Any], Any],
    mesh,
    params,
    *,
    axis: str = "fsdp",
    lr: float = 1e-3,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    max_grad_norm: Optional[float] = None,
    compute_dtype=None,
    accum_steps: int = 1,
    batch_spec=None,
):
    """Build (init_state, jitted_step) for FSDP training.

    loss_fn(params, batch) -> scalar loss. ``params`` are the f32
    master weights; the returned ``init_state(params)`` shards them +
    AdamW moments along ``axis``. The step donates its state (pure
    in-place update stream, no HBM double-buffering of the master
    copy) and accepts ``batch`` sharded on the same axis (FSDP's data
    axis IS its shard axis).

    compute_dtype: e.g. jnp.bfloat16 — master stays f32, the cast
    lives inside the step. accum_steps>1: batch's leading dim is
    split into that many microbatches and grads accumulate in f32
    via lax.scan (sequential, constant memory).
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    pshard = fsdp_shardings(params, mesh, axis)
    sshard = {
        "params": pshard,
        "opt": {"m": pshard, "v": pshard,
                "step": NamedSharding(mesh, P())},
    }
    if batch_spec is None:
        batch_spec = P(axis)
    bshard = NamedSharding(mesh, batch_spec)

    def init_state(p):
        # device_put onto a REPLICATED sharding aliases the source
        # buffer for the same-device shard; the step's donation would
        # then delete the caller's original arrays. Copy first (init-
        # only cost) so donated state never shares storage with inputs.
        p = jax.tree_util.tree_map(jnp.copy, p)
        p = jax.device_put(p, pshard)
        opt = jax.device_put(adamw_init(p), sshard["opt"])
        return {"params": p, "opt": opt}

    def grads_of(p, batch):
        cp = (jax.tree_util.tree_map(
            lambda x: x.astype(compute_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, p)
            if compute_dtype is not None else p)
        loss, g = jax.value_and_grad(loss_fn)(cp, batch)
        g = jax.tree_util.tree_map(lambda x: x.astype(jnp.float32), g)
        return loss.astype(jnp.float32), g

    def step(state, batch):
        p = state["params"]
        if accum_steps > 1:
            def micro(carry, mb):
                acc, lsum = carry
                loss, g = grads_of(p, mb)
                return (jax.tree_util.tree_map(jnp.add, acc, g),
                        lsum + loss), None

            mbs = jax.tree_util.tree_map(
                lambda x: x.reshape((accum_steps, x.shape[0] // accum_steps)
                                    + x.shape[1:]), batch)
            zero = jax.tree_util.tree_map(
                lambda x: jnp.zeros(x.shape, jnp.float32), p)
            (g, lsum), _ = jax.lax.scan(micro, (zero, jnp.float32(0)), mbs)
            g = jax.tree_util.tree_map(lambda x: x / accum_steps, g)
            loss = lsum / accum_steps
        else:
            loss, g = grads_of(p, batch)
        if max_grad_norm is not None:
            g, _ = clip_by_global_norm(g, max_grad_norm)
        lr_t = lr(state["opt"]["step"]) if callable(lr) else lr
        new_p, new_opt = adamw_update(p, g, state["opt"], lr_t, b1=b1, b2=b2,
                                      eps=eps, weight_decay=weight_decay)
        return {"params": new_p, "opt": new_opt}, loss

    jstep = jax.jit(step, in_shardings=(sshard, bshard),
                    out_shardings=(sshard, NamedSharding(mesh, P())),
                    donate_argnums=(0,))
    return init_state, jstep, bshard
