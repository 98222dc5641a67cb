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

import jax
import numpy as np

__all__ = ["scan_chunked_core", "selective_scan",
           "selective_scan_chunked", "selective_scan_naive",
           "selective_scan_sp", "ssm_decode_step"]


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


def selective_scan_sp(x, delta, A, Bc, Cc, D_skip=None, axis: str = "sp"):
    """Sequence-parallel selective scan — call INSIDE shard_map with
    the L axis sharded on ``axis``.

    Three phases, one collective: (1) each shard scans its local
    subsequence, keeping BOTH scan elements (cumulative decay A_cum and
    local state h_loc); (2) one all_gather exchanges each shard's
    (a_total, h_total) summary — B·D·N numbers, independent of L; (3)
    each shard composes the exclusive prefix of earlier shards and
    fixes up: h_t = A_cum_t · h_prefix + h_loc_t. Scan cost stays
    O(L/S) per shard; the collective is O(B·D·N·S) on ICI."""
    import jax.numpy as jnp

    a, u = _discretize(x, delta, A, Bc)                    # (B,Ls,D,N)

    def combine(left, right):
        a1, u1 = left
        a2, u2 = right
        return a1 * a2, a2 * u1 + u2

    a_cum, h_loc = jax.lax.associative_scan(combine, (a, u), axis=1)

    S = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    a_tot = jax.lax.all_gather(a_cum[:, -1], axis)         # (S,B,D,N)
    h_tot = jax.lax.all_gather(h_loc[:, -1], axis)
    h_pre = jnp.zeros_like(h_tot[0])
    for j in range(S):                                     # S static, tiny
        upd = a_tot[j] * h_pre + h_tot[j]
        h_pre = jnp.where(j < idx, upd, h_pre)
    h = a_cum * h_pre[:, None] + h_loc
    y = jnp.einsum("bldn,bln->bld", h, Cc)
    if D_skip is not None:
        y = y + x * D_skip[None, None]
    return y


def scan_chunked_core(af, uf, chunk: int = 1024, interpret: bool = False,
                      hier: bool | None = None):
    """The pallas single-pass scan over pre-discretized, lane-padded
    (B, L, DNp) decay/input arrays (DNp % 128 == 0) -> h (B, L, DNp).
    Exposed separately so bench.py can time EXACTLY the 3-array-pass
    kernel traffic (a read + u read + h write).

    ``hier`` selects the segmented (hierarchical) in-tile scan: 3
    masked doubling steps within 8-row segments (the f32 sublane tile),
    one compaction roll, a 1/8-size cross-segment scan, and a sublane
    broadcast — ~31 full-tile VPU op-equivalents per chunk vs ~60 for
    the flat ⌈log₂ lc⌉ doubling scan at lc=1024. Auto-enabled when the
    chunk is a multiple of 8 (measured v5e, bench shape B=8 L=2048
    DN=16384: flat 540 GB/s → hier closes most of the gap to the
    677 GB/s pure-DMA ceiling of this 2-read+1-write pattern; see
    BENCH_NOTES "Selective scan")."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, L, dnp = af.shape
    assert dnp % 128 == 0, dnp
    lc = min(chunk, L)
    while L % lc:
        lc -= 1
    n_l = L // lc
    SEG = 8
    if hier is None:
        # auto only when the cross-segment totals tile (R = lc/8 rows)
        # is itself sublane-tile aligned (R % 8 == 0, i.e. lc % 64):
        # ragged-R rolls/reshape-slices are exactly the shape class
        # where interpreter and Mosaic have diverged before (rounds
        # 3-4); hardware smoke covers R=16/64, bench runs R=128
        hier = lc % 64 == 0
    hier = hier and lc % SEG == 0 and lc > SEG   # segmented needs 8|lc

    def kernel(a_ref, u_ref, h_ref, carry):
        c = pl.program_id(2)

        @pl.when(c == 0)
        def _init():
            carry[...] = jnp.zeros_like(carry)

        a_blk = a_ref[0].astype(jnp.float32)               # (lc,128)
        u_blk = u_ref[0].astype(jnp.float32)
        # In-tile inclusive scan via Hillis-Steele doubling steps.
        # `lax.associative_scan` is NOT used here: its recursive
        # odd/even slicing emits zero-sized vectors Mosaic rejects
        # ("vector types must have positive constant sizes but got
        # 0, 128" — first v5e run, round 4), and its odd-offset slices
        # aren't sublane-aligned anyway. The doubling form uses only
        # full-tile rolls + selects (Mosaic-legal).
        roll = ((lambda x, s, ax=0: jnp.roll(x, s, axis=ax)) if interpret
                else (lambda x, s, ax=0: pltpu.roll(x, s, ax)))
        row = jax.lax.broadcasted_iota(jnp.int32, (lc, 128), 0)
        if not hier:
            A_s, U_s = a_blk, u_blk
            d = 1
            while d < lc:
                live = row >= d
                a_prev = jnp.where(live, roll(A_s, d), 1.0)
                u_prev = jnp.where(live, roll(U_s, d), 0.0)
                A_s, U_s = a_prev * A_s, A_s * u_prev + U_s
                d *= 2
            h = A_s * carry[0:1] + U_s
        else:
            R = lc // SEG
            seg_row = jax.lax.rem(row, SEG)
            # phase A: inclusive scan WITHIN each 8-row segment
            # (3 doubling steps on the full tile)
            A_w, U_w = a_blk, u_blk
            d = 1
            while d < SEG:
                live = seg_row >= d
                a_prev = jnp.where(live, roll(A_w, d), 1.0)
                u_prev = jnp.where(live, roll(U_w, d), 0.0)
                A_w, U_w = a_prev * A_w, A_w * u_prev + U_w
                d *= 2
            # phase B: segment totals live at rows 8r+7; a roll UP by
            # SEG-1 puts them at rows 8r, where a (R,SEG,128)[:,0,:]
            # reshape-slice (sublane-tile aligned) compacts them to a
            # (R,128) tile scanned at 1/8 the VPU cost.
            up = lc - (SEG - 1)
            tA = roll(A_w, up).reshape(R, SEG, 128)[:, 0, :]
            tU = roll(U_w, up).reshape(R, SEG, 128)[:, 0, :]
            rrow = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
            SA, SU = tA, tU
            d = 1
            while d < R:
                live = rrow >= d
                a_prev = jnp.where(live, roll(SA, d), 1.0)
                u_prev = jnp.where(live, roll(SU, d), 0.0)
                SA, SU = a_prev * SA, SA * u_prev + SU
                d *= 2
            # exclusive per-segment prefixes, chunk carry folded in
            EA = jnp.where(rrow >= 1, roll(SA, 1), 1.0)
            EU = jnp.where(rrow >= 1, roll(SU, 1), 0.0)
            hpre = EA * carry[0:1] + EU                    # (R,128)
            # phase C: broadcast prefixes back onto segment rows
            hpre_b = jnp.broadcast_to(hpre[:, None, :],
                                      (R, SEG, 128)).reshape(lc, 128)
            h = A_w * hpre_b + U_w
        h_ref[0] = h.astype(h_ref.dtype)
        # last row -> carry via an aligned [0:1] slice of a 1-roll
        # (a direct [lc-1:lc] slice is not sublane-aligned)
        carry[0:1] = roll(h, 1)[0:1]

    grid = (B, dnp // 128, n_l)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, lc, 128), lambda b, d, c: (b, c, d)),
            pl.BlockSpec((1, lc, 128), lambda b, d, c: (b, c, d)),
        ],
        out_specs=pl.BlockSpec((1, lc, 128), lambda b, d, c: (b, c, d)),
        out_shape=jax.ShapeDtypeStruct((B, L, dnp), af.dtype),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
        name=f"selective_scan_{lc}",
    )(af, uf)


def selective_scan_chunked(x, delta, A, Bc, Cc, D_skip=None,
                           chunk: int = 1024, interpret: bool = False,
                           hier: bool | None = None):
    """Single-pass pallas selective scan.

    `lax.associative_scan` makes ⌈log₂L⌉ full passes over the (a, u)
    arrays in HBM; this kernel streams each (chunk, 128) tile of the
    flattened (B, L, D·N) problem through VMEM ONCE — a local
    associative scan inside the tile (static-shape slices, Mosaic-
    legal) composed with a running carry kept in VMEM scratch across
    the sequential grid axis. HBM traffic drops from (2+2)·log₂L to
    3 array passes. Grid: (B, DN/128 parallel, L/chunk arbitrary).
    """
    import jax.numpy as jnp

    B, L, D = x.shape
    N = A.shape[1]
    a, u = _discretize(x, delta, A, Bc)                    # (B,L,D,N)
    DN = D * N
    af = a.reshape(B, L, DN)
    uf = u.reshape(B, L, DN)
    pad_dn = (-DN) % 128
    if pad_dn:
        af = jnp.pad(af, ((0, 0), (0, 0), (0, pad_dn)))
        uf = jnp.pad(uf, ((0, 0), (0, 0), (0, pad_dn)))
    h = scan_chunked_core(af, uf, chunk=chunk, interpret=interpret,
                          hier=hier)
    if pad_dn:
        h = h[..., :DN]
    y = jnp.einsum("bldn,bln->bld", h.reshape(B, L, D, N), Cc)
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
