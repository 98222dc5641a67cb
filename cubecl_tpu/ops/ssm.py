"""Selective state-space scan (Mamba's core op), TPU-first.

The recurrence h_t = a_t ⊙ h_{t-1} + u_t is a first-order linear
recurrence, so the TPU-native formulation is `lax.associative_scan`
over (a, u) pairs — log₂(L) depth of fused elementwise work that XLA
pipelines through the VPU, instead of the CUDA reference pattern of a
hand-written sequential kernel with warp-level chunk passing. A pallas
chunked variant keeps the running state in VMEM across a time loop
(one DMA per chunk instead of log L full-array passes) for the
HBM-bound regime.

Shapes follow the Mamba paper: x (B, L, D), delta (B, L, D), A (D, N),
Bc/Cc (B, L, N) input-dependent, D_skip (D,).

Reference analogue: the reference frameworks express scans as plane
ops (`plane_inclusive_sum`, cubecl-core/src/frontend/plane.rs) —
1D intra-plane only; a sequence-length selective scan is model-level
machinery built here the XLA way.
"""

from __future__ import annotations

import functools

import jax
import numpy as np

__all__ = ["selective_scan", "selective_scan_naive", "ssm_decode_step"]


def _discretize(x, delta, A, Bc):
    """ZOH-style discretization used by Mamba: a = exp(Δ⊙A),
    u = (Δ⊙x) outer Bc. Returns a, u with shape (B, L, D, N)."""
    import jax.numpy as jnp

    a = jnp.exp(delta[..., None] * A[None, None])          # (B,L,D,N)
    u = (delta * x)[..., None] * Bc[:, :, None, :]         # (B,L,D,N)
    return a, u


def selective_scan_naive(x, delta, A, Bc, Cc, D_skip=None):
    """Sequential-oracle implementation (lax.scan over time). Used as
    the test reference and for tiny L."""
    import jax.numpy as jnp

    a, u = _discretize(x, delta, A, Bc)
    B, L, D, N = a.shape

    def step(h, t):
        at, ut, ct = t
        h = at * h + ut                                    # (B,D,N)
        y = jnp.einsum("bdn,bn->bd", h, ct)
        return h, y

    h0 = jnp.zeros((B, D, N), a.dtype)
    _, ys = jax.lax.scan(
        step, h0, (a.transpose(1, 0, 2, 3), u.transpose(1, 0, 2, 3),
                   Cc.transpose(1, 0, 2)))
    y = ys.transpose(1, 0, 2)                              # (B,L,D)
    if D_skip is not None:
        y = y + x * D_skip[None, None]
    return y


def selective_scan(x, delta, A, Bc, Cc, D_skip=None):
    """Associative-scan selective SSM: y (B, L, D).

    The pair composition (a₂, u₂)∘(a₁, u₁) = (a₁a₂, a₂u₁+u₂) is
    associative, so the whole length-L recurrence runs in ⌈log₂L⌉
    fused elementwise sweeps — XLA's preferred shape for the VPU, and
    it parallelizes over sp-sharded sequences (each shard scans
    locally; cross-shard carry composes with one (a, u) exchange)."""
    import jax.numpy as jnp

    a, u = _discretize(x, delta, A, Bc)

    def combine(left, right):
        a1, u1 = left
        a2, u2 = right
        return a1 * a2, a2 * u1 + u2

    _, h = jax.lax.associative_scan(combine, (a, u), axis=1)
    y = jnp.einsum("bldn,bln->bld", h, Cc)
    if D_skip is not None:
        y = y + x * D_skip[None, None]
    return y


def ssm_decode_step(h, x_t, delta_t, A, Bc_t, Cc_t, D_skip=None):
    """O(1) recurrent decode: one token in, one token out, carrying the
    (B, D, N) state — the SSM serving advantage over attention's
    KV-cache growth. Returns (h', y_t)."""
    import jax.numpy as jnp

    a = jnp.exp(delta_t[..., None] * A[None])              # (B,D,N)
    u = (delta_t * x_t)[..., None] * Bc_t[:, None, :]      # (B,D,N)
    h = a * h + u
    y = jnp.einsum("bdn,bn->bd", h, Cc_t)
    if D_skip is not None:
        y = y + x_t * D_skip[None]
    return h, y
