"""Flash attention on the MXU (std kernel-library member).

The reference ecosystem keeps attention in its kernel crates (cubek);
here it is a hand-written Pallas kernel following the TPU flash-attention
recipe (online softmax with f32 statistics, two-matmul inner loop,
causal tile skipping):

- grid (batch, heads, q_tiles, kv_tiles); kv innermost ("arbitrary") so
  the (m, l, acc) scratch stays resident across a Q row's KV sweep
- scores tile exists only in VMEM; stats ride (block_q, 128) f32 scratch
- whole KV tiles above the causal diagonal are skipped
- mask value is -0.7*f32max (not -inf) to avoid exp(-inf - -inf) NaNs

Forward and backward are both Pallas kernels behind a ``jax.custom_vjp``
(backward = dKV + dQ kernels over saved (o, lse) residuals, guide-standard
flash structure).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import numpy as np

DEFAULT_MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)

# The whole family runs its online softmax in BASE-2: scores are scaled
# by sm_scale*log2(e) once (folded into the MXU epilogue multiply) and
# the exponentials are jnp.exp2. exp() is NOT free on the VPU — exp2
# measured +7% end-to-end at S=8192 (1024-blocks, BENCH_NOTES flash
# section); identical math (exp2((s-m)·log2e) ≡ exp(s-m)). The saved
# lse residual is base-2 as well (lse2 = log2-sum-exp2) — both backward
# kernels consume it as p = exp2(s2 - lse2).
_LOG2E = float(np.log2(np.e))
MIN_BLOCK = 128  # NUM_LANES — TPU tile constraint


def _fit_block(block: int, s: int) -> int:
    """Largest divisor of ``s`` not exceeding ``block`` (preferring
    lane-tile multiples) — so raising a default block size can never
    break sequence lengths that tiled under the old default (e.g.
    Sq=3072 with block_q=2048 picks 1536, not an assert)."""
    b = min(block, s)
    if s % b == 0:
        return b
    best = 1
    best_tile = 0
    for d in range(1, int(math.isqrt(s)) + 1):
        if s % d == 0:
            for cand in (d, s // d):
                if cand <= b:
                    if cand % MIN_BLOCK == 0:
                        best_tile = max(best_tile, cand)
                    best = max(best, cand)
    return best_tile or best


def _seg_overlap(sq_ref, sk_ref):
    """True iff this (q_tile, kv_tile) pair can share a segment id.

    Packed sequences have contiguous segments, so the tile's id set is
    exactly [min, max]; two tiles interact iff those ranges intersect.
    Cost: two (block, 128) VPU reductions — noise next to the two MXU
    matmuls they skip."""
    import jax.numpy as jnp

    sqt = sq_ref[0]
    skt = sk_ref[0]
    return jnp.logical_and(jnp.min(sqt) <= jnp.max(skt),
                           jnp.max(sqt) >= jnp.min(skt))


def _fwd_call(q, k, v, causal: bool, sm_scale: float,
              block_q: int, block_k: int, interpret: bool,
              kv_len=None, seg=None, window=None, need_lse: bool = True):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, Sq, D = q.shape
    Skv = k.shape[2]
    kv_mask_pre = kv_len is not None and kv_len < Skv
    causal_self = causal and not kv_mask_pre and seg is None \
        and window is None and Sq == Skv
    if block_q is None:
        # the triangular grid (below) prefers 1024² tiles from S=4096
        # up: measured 103.9 TF vs 80.7 for rect 2048² at S=4096
        block_q = 1024 if (Sq > 4096 or (causal_self and Sq >= 4096)) \
            else 2048
    if block_k is None:
        block_k = 1024 if (Skv > 4096 or (causal_self and Skv >= 4096)) \
            else 2048
    bq = _fit_block(block_q, Sq)
    bk = _fit_block(block_k, Skv)
    assert Sq % bq == 0 and Skv % bk == 0, \
        f"seq lens ({Sq},{Skv}) must tile by ({bq},{bk})"
    grid = (B, H, Sq // bq, Skv // bk)
    n_kv = Skv // bk
    kv_mask = kv_len is not None and kv_len < Skv
    # Fold sm_scale*log2(e) into Q BEFORE the kernel: the in-kernel
    # s-multiply was a full VPU pass over every (bq, bk) score tile
    # (S²/(bq·bk) times); the pre-scale is one pass over Q. Scale in
    # f32, round once back to the storage dtype (same rounding class as
    # the original load-cast). Round-4 flash-8k work: the kernel is
    # VPU-bound on score-matrix elementwise ops, not MXU-bound
    # (VERDICT r3 item 6).
    q = (q.astype(jnp.float32) * (sm_scale * _LOG2E)).astype(q.dtype)
    # Pure-causal masking uses the THRESHOLD form: the tile-local
    # row-col difference iota compared against the scalar
    # `ki*bk - qi*bq` — the per-tile adds of absolute positions fold
    # into the threshold. Two rejected alternatives, both measured on
    # v5e round 4: a lax.cond that skips masking on interior tiles
    # (77 vs 107 TF at S=8192 — branching breaks Mosaic's software
    # pipeline) and a VMEM-resident (bq, bk) diff INPUT (+2.5 TF at
    # S=8192 but 84 -> 60 TF at S=2048 where bq=bk=2048 makes the
    # resident block 16MB of DMA).
    simple_causal = causal and not kv_mask and seg is None \
        and window is None
    if simple_causal and Sq == Skv and bq == bk and Sq // bq >= 4:
        # triangular grid: the rectangular grid + pl.when-skip left the
        # pipeline at 61% issued-MXU while a dense run of the same
        # geometry measures 79% (v5e wall decomposition, round 4) —
        # dead tiles still burn grid steps, window DMAs, and pipeline
        # ramp. Enumerating ONLY live tiles via scalar-prefetched
        # (qi, ki) tables removes them: S=8192 106→114-120 TF
        # (session-dependent through the tunnel; r4 driver captured
        # 114.1, r5 re-measure 120.1 — the r4 commit's "123" was a
        # one-session high, retired), S=16384 129 TF. Below 4 q-tiles
        # the rectangular grid's fat
        # single tile wins (S=2048: 84.3 rect-2048² vs 79.4 tri-1024²),
        # and tri only pays off with square tiles (bk=512 variants
        # measured worse) — hence the routing guard.
        return _fwd_call_tri(q, k, v, bq, bk, interpret, need_lse)

    def kernel(*refs):
        n_seg = 0 if seg is None else 2
        q_ref, k_ref, v_ref = refs[0:3]
        sq_ref, sk_ref = (refs[3:5] if seg is not None else (None, None))
        o_ref = refs[3 + n_seg]
        lse_ref = refs[4 + n_seg] if need_lse else None
        m_sc, l_sc, acc_sc = refs[3 + n_seg + (2 if need_lse else 1):]
        qi = pl.program_id(2)
        ki = pl.program_id(3)

        @pl.when(ki == 0)
        def _init():
            m_sc[...] = jnp.full_like(m_sc, -jnp.inf)
            l_sc[...] = jnp.zeros_like(l_sc)
            acc_sc[...] = jnp.zeros_like(acc_sc)

        def _run():
            # feed the MXU at the INPUT dtype (bf16 runs single-pass;
            # upcasting first would force f32-rate passes) — f32
            # accumulation comes from preferred_element_type
            qt = q_ref[0, 0]                               # [bq, D]
            kt = k_ref[0, 0]                               # [bk, D]
            s = jax.lax.dot_general(
                qt, kt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)       # [bq, bk]
            # (sm_scale*log2e is pre-folded into q — see above)
            if simple_causal:
                # cols <= rows  ⇔  (r - c) >= ki*bk - qi*bq
                d = (jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
                     - jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1))
                s = jnp.where(d >= ki * bk - qi * bq, s,
                              DEFAULT_MASK_VALUE)
            elif causal or kv_mask or seg is not None or window is not None:
                rows = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0) \
                    + qi * bq
                cols = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) \
                    + ki * bk
                ok = cols <= rows if causal else cols == cols
                if kv_mask:  # padded keys (static length) masked out
                    ok = ok & (cols < kv_len)
                if seg is not None:  # packed sequences: same-segment only
                    sq = sq_ref[0, :, 0]
                    sk = sk_ref[0, :, 0]
                    ok = ok & (sq[:, None] == sk[None, :])
                if window is not None:  # banded: col in [row-l, row+r]
                    wl, wr = window
                    ok = ok & (rows - cols <= wl) & (cols - rows <= wr)
                s = jnp.where(ok, s, DEFAULT_MASK_VALUE)

            m_prev = m_sc[...]                             # [bq, 128]
            l_prev = l_sc[...]
            m_curr = jnp.max(s, axis=1, keepdims=True)     # [bq, 1]
            m_next = jnp.maximum(m_prev, m_curr)           # [bq, 128]
            alpha = jnp.exp2(m_prev - m_next)
            p = jnp.exp2(s - m_next[:, :1])                # [bq, bk]
            l_corr = alpha * l_prev
            l_next = l_corr + jnp.sum(p, axis=1, keepdims=True)
            m_sc[...] = m_next
            l_sc[...] = l_next

            vt = v_ref[0, 0]                               # [bk, D]
            # P·V at the storage dtype (standard flash practice: the
            # f32 statistics m/l already carry the softmax precision)
            acc_sc[...] = acc_sc[...] * alpha[:, :1] + jax.lax.dot(
                p.astype(vt.dtype), vt,
                preferred_element_type=jnp.float32)

        cond = ((qi + 1) * bq - 1) >= (ki * bk) if causal else None
        if window is not None:
            # the band only intersects tiles whose column range overlaps
            # [tile_rows - left, tile_rows + right] — whole off-band
            # tiles skip BOTH MXU matmuls (cost becomes ~O(S*window))
            wl, wr = window
            wc = jnp.logical_and(
                ki * bk + bk - 1 >= qi * bq - wl,
                qi * bq + bq - 1 + wr >= ki * bk)
            cond = wc if cond is None else jnp.logical_and(cond, wc)
        if seg is not None:
            # packed segments are contiguous, so a whole tile pair is
            # dead unless the [min, max] segment-id ranges intersect —
            # skipping both MXU matmuls (a fully-masked tile would only
            # contribute p≈0)
            ov = _seg_overlap(sq_ref, sk_ref)
            cond = ov if cond is None else jnp.logical_and(cond, ov)
        if cond is not None:
            pl.when(cond)(_run)
        else:
            _run()

        @pl.when(ki == n_kv - 1)
        def _done():
            l = l_sc[...][:, :1]
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            o_ref[0, 0] = (acc_sc[...] * l_inv).astype(o_ref.dtype)
            if need_lse:
                lse_ref[0, 0] = (m_sc[...] + jnp.log2(
                    jnp.maximum(l_sc[...], 1e-37)))  # base-2 residual

    # the (bq,128) lse residual output costs ~10%% at long S (an extra
    # staged out-window per step) — inference paths skip it entirely
    out_shapes = (
        jax.ShapeDtypeStruct((B, H, Sq, D), q.dtype),
    ) + ((jax.ShapeDtypeStruct((B, H, Sq, 128), jnp.float32),)
         if need_lse else ())
    flops = 4 * B * H * Sq * Skv * D * (0.5 if causal else 1.0)
    in_specs = [
        pl.BlockSpec((1, 1, bq, D), lambda b, h, qi, ki: (b, h, qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bk, D), lambda b, h, qi, ki: (b, h, ki, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bk, D), lambda b, h, qi, ki: (b, h, ki, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [q, k, v]
    if seg is not None:
        # segment ids ride an lse-style broadcast layout (B, S, 128):
        # Mosaic rejects (1, bq) blocks on a (B, S) array
        in_specs += [
            pl.BlockSpec((1, bq, 128), lambda b, h, qi, ki: (b, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, 128), lambda b, h, qi, ki: (b, ki, 0),
                         memory_space=pltpu.VMEM),
        ]
        inputs += [seg[0], seg[1]]
    res = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, 1, bq, D), lambda b, h, qi, ki: (b, h, qi, 0),
                         memory_space=pltpu.VMEM),
        ) + ((pl.BlockSpec((1, 1, bq, 128),
                           lambda b, h, qi, ki: (b, h, qi, 0),
                           memory_space=pltpu.VMEM),) if need_lse else ()),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),   # m
            pltpu.VMEM((bq, 128), jnp.float32),   # l
            pltpu.VMEM((bq, D), jnp.float32),     # acc
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            # segment variants + fat KV blocks overflow the 16MB default
            # scoped-VMEM limit (observed 17.5MB at (1024,2048) blocks)
            vmem_limit_bytes=100 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=int(flops),
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize
            + q.size * q.dtype.itemsize,
            transcendentals=B * H * Sq * Skv),
        interpret=interpret,
        name=f"flash_attn_{bq}x{bk}"
        + ("" if need_lse else "_nolse")
        + (f"_w{window[0]}_{window[1]}" if window else ""),
    )(*inputs)
    return res if need_lse else (res[0], None)


def _fwd_call_tri(q, k, v, bq: int, bk: int, interpret: bool,
                  need_lse: bool):
    """Causal self-attention forward on a TRIANGULAR grid.

    The grid's third axis enumerates only the causally-live (qi, ki)
    tile pairs; scalar-prefetched int32 tables drive the BlockSpec
    index maps (the paged-attention pattern, reused for density).
    Measured v5e S=8192 round 4: rectangular+skip ran at 61% issued
    MXU; dense same-geometry probes: dots-only 92%, full softmax
    stats 79% — the bubble was the dead grid steps, not the math.
    ``q`` arrives pre-scaled by sm_scale*log2(e) (base-2 softmax).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, Sq, D = q.shape
    nq = Sq // bq
    pairs = []
    for qi in range(nq):
        last_ki = ((qi + 1) * bq - 1) // bk
        for ki in range(last_ki + 1):
            pairs.append((qi, ki, 1 if ki == 0 else 0,
                          1 if ki == last_ki else 0))
    tab = jnp.asarray(np.array(pairs, np.int32).T)     # (4, T)
    T = len(pairs)
    n_out = 2 if need_lse else 1

    def kernel(tab_ref, q_ref, k_ref, v_ref, *rest):
        o_ref = rest[0]
        lse_ref = rest[1] if need_lse else None
        m_sc, l_sc, acc_sc = rest[n_out:]
        t = pl.program_id(2)
        qi = tab_ref[0, t]
        ki = tab_ref[1, t]

        @pl.when(tab_ref[2, t] == 1)
        def _init():
            m_sc[...] = jnp.full_like(m_sc, -jnp.inf)
            l_sc[...] = jnp.zeros_like(l_sc)
            acc_sc[...] = jnp.zeros_like(acc_sc)

        qt = q_ref[0, 0]                               # [bq, D]
        kt = k_ref[0, 0]                               # [bk, D]
        s = jax.lax.dot_general(
            qt, kt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # [bq, bk]
        # threshold causal mask: cols<=rows ⇔ (r-c) >= ki*bk - qi*bq
        d = (jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
             - jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1))
        s = jnp.where(d >= ki * bk - qi * bq, s, DEFAULT_MASK_VALUE)

        m_prev = m_sc[...]
        l_prev = l_sc[...]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - m_next[:, :1])
        l_sc[...] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_sc[...] = m_next
        vt = v_ref[0, 0]
        acc_sc[...] = acc_sc[...] * alpha[:, :1] + jax.lax.dot(
            p.astype(vt.dtype), vt, preferred_element_type=jnp.float32)

        @pl.when(tab_ref[3, t] == 1)
        def _done():
            l = l_sc[...][:, :1]
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            o_ref[0, 0] = (acc_sc[...] * l_inv).astype(o_ref.dtype)
            if need_lse:
                lse_ref[0, 0] = (m_sc[...] + jnp.log2(
                    jnp.maximum(l_sc[...], 1e-37)))

    out_shapes = (jax.ShapeDtypeStruct((B, H, Sq, D), q.dtype),) + (
        (jax.ShapeDtypeStruct((B, H, Sq, 128), jnp.float32),)
        if need_lse else ())
    out_specs = (pl.BlockSpec((1, 1, bq, D),
                              lambda b, h, t, tab: (b, h, tab[0, t], 0)),
                 ) + ((pl.BlockSpec((1, 1, bq, 128),
                                    lambda b, h, t, tab: (b, h, tab[0, t],
                                                          0)),)
                      if need_lse else ())
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H, T),
        in_specs=[
            pl.BlockSpec((1, 1, bq, D),
                         lambda b, h, t, tab: (b, h, tab[0, t], 0)),
            pl.BlockSpec((1, 1, bk, D),
                         lambda b, h, t, tab: (b, h, tab[1, t], 0)),
            pl.BlockSpec((1, 1, bk, D),
                         lambda b, h, t, tab: (b, h, tab[1, t], 0)),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),   # m
            pltpu.VMEM((bq, 128), jnp.float32),   # l
            pltpu.VMEM((bq, D), jnp.float32),     # acc
        ],
    )
    res = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
        name=f"flash_attn_tri_{bq}x{bk}" + ("" if need_lse else "_nolse"),
    )(tab, q, k, v)
    return res if need_lse else (res[0], None)


def _reference_attention(q, k, v, causal, sm_scale):
    import jax
    import jax.numpy as jnp

    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * sm_scale
    if causal:
        Sq, Skv = q.shape[2], k.shape[2]
        mask = jnp.tril(jnp.ones((Sq, Skv), bool))
        s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p,
                      v.astype(jnp.float32)).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def flash_attention(q, k, v, causal: bool = True,
                    sm_scale: Optional[float] = None,
                    block_q: Optional[int] = None,
                    block_k: Optional[int] = None,
                    interpret: bool = False,
                    kv_len: Optional[int] = None):
    """softmax(q k^T / sqrt(d)) v with flash tiling.

    q/k/v: [batch, heads, seq, head_dim]; head_dim should be a multiple
    of 128 for full MXU utilization (pads otherwise via XLA).

    Block defaults auto-pick by sequence length (None -> 2048 single
    fat tiles below S=4096; 1024² from S=4096 up, where pure-causal
    self-attention routes to the TRIANGULAR grid — scalar-prefetched
    (qi, ki) tables enumerate only live tiles. Round-4 v5e, bf16
    causal: S=2048 82-84 TF, S=4096 103.7, S=8192 114-120 (~59% peak;
    session-dependent — r4 driver 114.1, r5 re-measure 120.1),
    S=16384 129 (65.5%); see BENCH_NOTES "Round 4: the dead-step
    wall" for the physics and the measured routing guards.
    MXU operands stay at the storage dtype (measured perf-neutral vs
    explicit f32 upcasts — Mosaic fuses the converts — but it is the
    principled convention); f32 lives in preferred_element_type
    accumulation and the softmax statistics, and the softmax runs in
    base-2 (exp2; +7%% at S=8192 — see the module note).
    """
    scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(
        q.shape[-1])
    o, _lse = _fwd_call(q, k, v, causal, scale, block_q, block_k, interpret,
                        kv_len, need_lse=False)
    return o


def _fwd(q, k, v, causal, sm_scale, block_q, block_k, interpret,
         kv_len=None):
    scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(
        q.shape[-1])
    o, lse = _fwd_call(q, k, v, causal, scale, block_q, block_k, interpret,
                       kv_len)
    return o, (q, k, v, o, lse)


def _bwd_dkv_call(q, k, v, do, lse, di, causal, scale, bq, bk, interpret,
                  kv_len=None, seg=None, window=None):
    """dK/dV kernel: grid (B, H, kv, q) with q innermost so the dk/dv
    accumulators stay resident per KV tile (guide §7: dKV iterates Q
    per KV tile). Pure-causal self-attention shapes route to a
    TRIANGULAR grid (scalar-prefetched (ki, qi) tables enumerate only
    live tiles — the same dead-step pipeline fix as the forward,
    measured +16% there)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, Sq, D = q.shape
    Skv = k.shape[2]
    n_q = Sq // bq
    n_k = Skv // bk
    kv_mask = kv_len is not None and kv_len < Skv
    tri = (causal and not kv_mask and seg is None and window is None
           and Sq == Skv and bq == bk and n_q >= 4)
    if tri:
        pairs = []
        for ki_ in range(n_k):
            first_qi = (ki_ * bk) // bq
            for qi_ in range(first_qi, n_q):
                pairs.append((ki_, qi_, 1 if qi_ == first_qi else 0,
                              1 if qi_ == n_q - 1 else 0))
        tab = jnp.asarray(np.array(pairs, np.int32).T)    # (4, T)
        grid = (B, H, len(pairs))
    else:
        grid = (B, H, n_k, n_q)

    def kernel(*refs):
        if tri:
            tab_ref, refs = refs[0], refs[1:]
        if seg is None:
            (q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
             dk_ref, dv_ref, dk_sc, dv_sc) = refs
            sq_ref = sk_ref = None
        else:
            (q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, sq_ref, sk_ref,
             dk_ref, dv_ref, dk_sc, dv_sc) = refs
        if tri:
            t = pl.program_id(2)
            ki = tab_ref[0, t]
            qi = tab_ref[1, t]
            first = tab_ref[2, t] == 1
            last = tab_ref[3, t] == 1
        else:
            qi = pl.program_id(3)
            ki = pl.program_id(2)
            first = qi == 0
            last = qi == n_q - 1

        @pl.when(first)
        def _init():
            dk_sc[...] = jnp.zeros_like(dk_sc)
            dv_sc[...] = jnp.zeros_like(dv_sc)

        def _run():
            qt = q_ref[0, 0]
            kt = k_ref[0, 0]
            vt = v_ref[0, 0]
            dot = do_ref[0, 0]
            lse = lse_ref[0, 0][:, :1]
            dit = di_ref[0, 0][:, :1]
            s = jax.lax.dot_general(
                qt, kt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * (scale * _LOG2E)
            if tri:
                d = (jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
                     - jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1))
                s = jnp.where(d >= ki * bk - qi * bq, s,
                              DEFAULT_MASK_VALUE)
            elif causal or kv_mask or seg is not None or window is not None:
                rows = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0) \
                    + qi * bq
                cols = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) \
                    + ki * bk
                ok = cols <= rows if causal else cols == cols
                if kv_mask:
                    ok = ok & (cols < kv_len)
                if seg is not None:
                    sq = sq_ref[0, :, 0]
                    sk = sk_ref[0, :, 0]
                    ok = ok & (sq[:, None] == sk[None, :])
                if window is not None:
                    wl, wr = window
                    ok = ok & (rows - cols <= wl) & (cols - rows <= wr)
                s = jnp.where(ok, s, DEFAULT_MASK_VALUE)
            p = jnp.exp2(s - lse)                         # [bq, bk]
            # dV += P^T dO — P/dS feed the MXU at the storage dtype
            # (f32 accumulate), matching the forward's convention
            dv_sc[...] += jax.lax.dot_general(
                p.astype(dot.dtype), dot, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(
                dot, vt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)       # [bq, bk]
            ds = p * (dp - dit) * scale
            # dK += dS^T Q
            dk_sc[...] += jax.lax.dot_general(
                ds.astype(qt.dtype), qt, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        cond = None
        if not tri:
            cond = ((qi + 1) * bq - 1) >= (ki * bk) if causal else None
            if window is not None:
                wl, wr = window
                wc = jnp.logical_and(
                    ki * bk + bk - 1 >= qi * bq - wl,
                    qi * bq + bq - 1 + wr >= ki * bk)
                cond = wc if cond is None else jnp.logical_and(cond, wc)
            if seg is not None:
                ov = _seg_overlap(sq_ref, sk_ref)
                cond = ov if cond is None else jnp.logical_and(cond, ov)
        if cond is not None:
            pl.when(cond)(_run)
        else:
            _run()

        @pl.when(last)
        def _done():
            dk_ref[0, 0] = dk_sc[...].astype(dk_ref.dtype)
            dv_ref[0, 0] = dv_sc[...].astype(dv_ref.dtype)

    if tri:
        qix = lambda b, h, t, tab: (b, h, tab[1, t], 0)   # noqa: E731
        kix = lambda b, h, t, tab: (b, h, tab[0, t], 0)   # noqa: E731
    else:
        qix = lambda b, h, ki, qi: (b, h, qi, 0)          # noqa: E731
        kix = lambda b, h, ki, qi: (b, h, ki, 0)          # noqa: E731
    in_specs = [
        pl.BlockSpec((1, 1, bq, D), qix, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bk, D), kix, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bk, D), kix, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bq, D), qix, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bq, 128), qix, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bq, 128), qix, memory_space=pltpu.VMEM),
    ]
    inputs = [q, k, v, do, lse, di]
    if seg is not None:
        in_specs += [
            pl.BlockSpec((1, bq, 128), lambda b, h, ki, qi: (b, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, 128), lambda b, h, ki, qi: (b, ki, 0),
                         memory_space=pltpu.VMEM),
        ]
        inputs += [seg[0], seg[1]]
    out_specs = (
        pl.BlockSpec((1, 1, bk, D), kix, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bk, D), kix, memory_space=pltpu.VMEM),
    )
    out_shape = (
        jax.ShapeDtypeStruct(k.shape, k.dtype),
        jax.ShapeDtypeStruct(v.shape, v.dtype),
    )
    scratch = [
        pltpu.VMEM((bk, D), jnp.float32),
        pltpu.VMEM((bk, D), jnp.float32),
    ]
    cp = pltpu.CompilerParams(
        dimension_semantics=(("parallel", "parallel", "arbitrary") if tri
                             else ("parallel", "parallel", "parallel",
                                   "arbitrary")),
        # segment variants + fat KV blocks overflow the 16MB default
        # scoped-VMEM limit (observed 17.5MB at (1024,2048) blocks)
        vmem_limit_bytes=100 * 2**20)
    if tri:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid, in_specs=in_specs,
            out_specs=out_specs, scratch_shapes=scratch)
        return pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape,
            compiler_params=cp, interpret=interpret,
            name=f"flash_bwd_dkv_tri_{bq}x{bk}",
        )(tab, *inputs)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=cp,
        interpret=interpret,
        name=f"flash_bwd_dkv_{bq}x{bk}",
    )(*inputs)


def _bwd_dq_call(q, k, v, do, lse, di, causal, scale, bq, bk, interpret,
                 kv_len=None, seg=None, window=None):
    """dQ kernel: grid (B, H, q, kv) with kv innermost (resident dq acc)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, Sq, D = q.shape
    Skv = k.shape[2]
    n_q = Sq // bq
    n_kv = Skv // bk
    kv_mask = kv_len is not None and kv_len < Skv
    tri = (causal and not kv_mask and seg is None and window is None
           and Sq == Skv and bq == bk and n_q >= 4)
    if tri:
        pairs = []
        for qi_ in range(n_q):
            last_ki = ((qi_ + 1) * bq - 1) // bk
            for ki_ in range(last_ki + 1):
                pairs.append((qi_, ki_, 1 if ki_ == 0 else 0,
                              1 if ki_ == last_ki else 0))
        tab = jnp.asarray(np.array(pairs, np.int32).T)    # (4, T)
        grid = (B, H, len(pairs))
    else:
        grid = (B, H, n_q, n_kv)

    def kernel(*refs):
        if tri:
            tab_ref, refs = refs[0], refs[1:]
        if seg is None:
            (q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
             dq_ref, dq_sc) = refs
            sq_ref = sk_ref = None
        else:
            (q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, sq_ref, sk_ref,
             dq_ref, dq_sc) = refs
        if tri:
            t = pl.program_id(2)
            qi = tab_ref[0, t]
            ki = tab_ref[1, t]
            first = tab_ref[2, t] == 1
            last = tab_ref[3, t] == 1
        else:
            qi = pl.program_id(2)
            ki = pl.program_id(3)
            first = ki == 0
            last = ki == n_kv - 1

        @pl.when(first)
        def _init():
            dq_sc[...] = jnp.zeros_like(dq_sc)

        def _run():
            qt = q_ref[0, 0]
            kt = k_ref[0, 0]
            vt = v_ref[0, 0]
            dot = do_ref[0, 0]
            lse = lse_ref[0, 0][:, :1]
            dit = di_ref[0, 0][:, :1]
            s = jax.lax.dot_general(
                qt, kt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * (scale * _LOG2E)
            if tri:
                d = (jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
                     - jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1))
                s = jnp.where(d >= ki * bk - qi * bq, s,
                              DEFAULT_MASK_VALUE)
            elif causal or kv_mask or seg is not None or window is not None:
                rows = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0) \
                    + qi * bq
                cols = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) \
                    + ki * bk
                ok = cols <= rows if causal else cols == cols
                if kv_mask:
                    ok = ok & (cols < kv_len)
                if seg is not None:
                    sq = sq_ref[0, :, 0]
                    sk = sk_ref[0, :, 0]
                    ok = ok & (sq[:, None] == sk[None, :])
                if window is not None:
                    wl, wr = window
                    ok = ok & (rows - cols <= wl) & (cols - rows <= wr)
                s = jnp.where(ok, s, DEFAULT_MASK_VALUE)
            p = jnp.exp2(s - lse)
            dp = jax.lax.dot_general(
                dot, vt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds = p * (dp - dit) * scale
            dq_sc[...] += jax.lax.dot(ds.astype(kt.dtype), kt,
                                      preferred_element_type=jnp.float32)

        cond = None
        if not tri:
            cond = ((qi + 1) * bq - 1) >= (ki * bk) if causal else None
            if window is not None:
                wl, wr = window
                wc = jnp.logical_and(
                    ki * bk + bk - 1 >= qi * bq - wl,
                    qi * bq + bq - 1 + wr >= ki * bk)
                cond = wc if cond is None else jnp.logical_and(cond, wc)
            if seg is not None:
                ov = _seg_overlap(sq_ref, sk_ref)
                cond = ov if cond is None else jnp.logical_and(cond, ov)
        if cond is not None:
            pl.when(cond)(_run)
        else:
            _run()

        @pl.when(last)
        def _done():
            dq_ref[0, 0] = dq_sc[...].astype(dq_ref.dtype)

    if tri:
        qix = lambda b, h, t, tab: (b, h, tab[0, t], 0)   # noqa: E731
        kix = lambda b, h, t, tab: (b, h, tab[1, t], 0)   # noqa: E731
    else:
        qix = lambda b, h, qi, ki: (b, h, qi, 0)          # noqa: E731
        kix = lambda b, h, qi, ki: (b, h, ki, 0)          # noqa: E731
    in_specs = [
        pl.BlockSpec((1, 1, bq, D), qix, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bk, D), kix, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bk, D), kix, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bq, D), qix, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bq, 128), qix, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bq, 128), qix, memory_space=pltpu.VMEM),
    ]
    inputs = [q, k, v, do, lse, di]
    if seg is not None:
        in_specs += [
            pl.BlockSpec((1, bq, 128), lambda b, h, qi, ki: (b, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, 128), lambda b, h, qi, ki: (b, ki, 0),
                         memory_space=pltpu.VMEM),
        ]
        inputs += [seg[0], seg[1]]
    out_specs = pl.BlockSpec((1, 1, bq, D), qix, memory_space=pltpu.VMEM)
    cp = pltpu.CompilerParams(
        dimension_semantics=(("parallel", "parallel", "arbitrary") if tri
                             else ("parallel", "parallel", "parallel",
                                   "arbitrary")),
        # segment variants + fat KV blocks overflow the 16MB default
        # scoped-VMEM limit (observed 17.5MB at (1024,2048) blocks)
        vmem_limit_bytes=100 * 2**20)
    if tri:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid, in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[pltpu.VMEM((bq, D), jnp.float32)])
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
            compiler_params=cp, interpret=interpret,
            name=f"flash_bwd_dq_tri_{bq}x{bk}",
        )(tab, *inputs)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, D), jnp.float32)],
        compiler_params=cp,
        interpret=interpret,
        name=f"flash_bwd_dq_{bq}x{bk}",
    )(*inputs)


def _bwd(causal, sm_scale, block_q, block_k, interpret, kv_len, res, do):
    """Flash backward: dKV + dQ Pallas kernels over saved (o, lse)
    residuals (guide §7 structure). KV blocks cap at 1024 — the backward
    carries more live scratch, and (1024, 1024) measures fastest on v5e.
    Honest fwd+bwd rates (ALL THREE grads tied into the timing carry —
    the round-4 "111 TF" chained only dq and let XLA drop the dkv
    kernel): S=2048 67.7, S=8192 108.5 TF (driver rows
    flash_fwdbwd_tflops / _8k, model-flops convention: 7 causal-halved
    matmuls, recompute not credited). The forward alone prefers
    (2048, 2048) blocks."""
    import jax.numpy as jnp

    q, k, v, o, lse = res
    scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(
        q.shape[-1])
    bq = _fit_block(block_q if block_q is not None else 1024, q.shape[2])
    bk = _fit_block(min(block_k if block_k is not None else 1024, 1024),
                    k.shape[2])
    # D_i = rowsum(dO * O), broadcast to the (bq, 128) stats layout
    di = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                 axis=-1, keepdims=True)
    di = jnp.broadcast_to(di, di.shape[:-1] + (128,))
    dk, dv = _bwd_dkv_call(q, k, v, do, lse, di, causal, scale, bq, bk,
                           interpret, kv_len)
    dq = _bwd_dq_call(q, k, v, do, lse, di, causal, scale, bq, bk,
                      interpret, kv_len)
    return dq, dk, dv


flash_attention.defvjp(_fwd, _bwd)


def flash_attention_padded(q, k, v, causal: bool = True,
                           sm_scale: Optional[float] = None,
                           block_q: int = 1024, block_k: int = 2048,
                           interpret: bool = False):
    """flash_attention for ARBITRARY seq lens / head dims.

    Pads head_dim up to a lane multiple (zero q/k columns leave the
    scores unchanged; zero v columns are sliced off) and the sequence
    dims up to tile multiples; padded KEYS are masked inside the kernel
    via the static ``kv_len`` (padded queries produce rows that are
    sliced off). Fully differentiable — pad/slice transpose through the
    custom_vjp. The softmax scale always comes from the REAL head_dim.
    """
    import jax.numpy as jnp

    B, H, Sq, D = q.shape
    Skv = k.shape[2]
    scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(D)
    Dp = -(-D // MIN_BLOCK) * MIN_BLOCK
    bq = min(block_q, -(-Sq // MIN_BLOCK) * MIN_BLOCK)
    bk = min(block_k, -(-Skv // MIN_BLOCK) * MIN_BLOCK)
    Sqp = -(-Sq // bq) * bq
    Skp = -(-Skv // bk) * bk
    if (Dp, Sqp, Skp) == (D, Sq, Skv):
        return flash_attention(q, k, v, causal, scale, bq, bk, interpret)

    def pad(x, s_to):
        return jnp.pad(x, ((0, 0), (0, 0), (0, s_to - x.shape[2]),
                           (0, Dp - D)))

    o = flash_attention(pad(q, Sqp), pad(k, Skp), pad(v, Skp), causal,
                        scale, bq, bk, interpret,
                        Skv if Skp != Skv else None)
    return o[:, :, :Sq, :D]


# ---------------------------------------------------------------------------
# Segmented (packed-sequence) flash attention
# ---------------------------------------------------------------------------


def _bcast_seg(seg):
    """(B, S) int32 -> the (B, S, 128) lane-broadcast layout Mosaic needs
    (a (1, bq) block on a (B, S) array violates the sublane rule)."""
    import jax.numpy as jnp

    s = jnp.asarray(seg, jnp.int32)
    return jnp.broadcast_to(s[..., None], s.shape + (128,))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _flash_seg(q, k, v, seg_q_b, seg_kv_b, causal, scale, block_q, block_k,
               interpret):
    o, _lse = _fwd_call(q, k, v, causal, scale, block_q, block_k, interpret,
                        None, (seg_q_b, seg_kv_b), need_lse=False)
    return o


def _flash_seg_fwd(q, k, v, seg_q_b, seg_kv_b, causal, scale, block_q,
                   block_k, interpret):
    o, lse = _fwd_call(q, k, v, causal, scale, block_q, block_k, interpret,
                       None, (seg_q_b, seg_kv_b))
    return o, (q, k, v, seg_q_b, seg_kv_b, o, lse)


def _flash_seg_bwd(causal, scale, block_q, block_k, interpret, res, do):
    import jax.numpy as jnp

    q, k, v, seg_q_b, seg_kv_b, o, lse = res
    bq = _fit_block(block_q, q.shape[2])
    bk = _fit_block(min(block_k, 1024), k.shape[2])
    di = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                 axis=-1, keepdims=True)
    di = jnp.broadcast_to(di, di.shape[:-1] + (128,))
    seg = (seg_q_b, seg_kv_b)
    dk, dv = _bwd_dkv_call(q, k, v, do, lse, di, causal, scale, bq, bk,
                           interpret, None, seg)
    dq = _bwd_dq_call(q, k, v, do, lse, di, causal, scale, bq, bk,
                      interpret, None, seg)
    zq = np.zeros(seg_q_b.shape, jax.dtypes.float0)
    zk = np.zeros(seg_kv_b.shape, jax.dtypes.float0)
    return dq, dk, dv, zq, zk


_flash_seg.defvjp(_flash_seg_fwd, _flash_seg_bwd)


def flash_attention_segmented(q, k, v, segment_ids_q, segment_ids_kv=None,
                              causal: bool = True,
                              sm_scale: Optional[float] = None,
                              block_q: int = 1024, block_k: int = 1024,
                              interpret: bool = False):
    """Packed-sequence flash attention: positions attend only within the
    same segment id (plus the causal mask). segment_ids: (B, S) int32;
    use a reserved id (e.g. -1) for padding slots so they attend nothing
    real. Fully differentiable.

    Cross-segment tiles are skipped whole (``_seg_overlap`` min/max
    range test — segments are contiguous in packed layouts), so cost
    approaches the block-diagonal ideal as segments shrink. Block
    defaults (round-2 v5e sweep, S=2048 bf16 causal, 2 segments,
    170-call chains): (1024,1024) 0.423ms vs (1024,2048 — nothing
    skippable at this S) 0.592 — smaller tiles skip more but pay
    per-tile efficiency; 1024² is the crossover, 1.4× from the skip
    alone and growing with segment count."""
    if segment_ids_kv is None:
        segment_ids_kv = segment_ids_q
    scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(
        q.shape[-1])
    return _flash_seg(q, k, v, _bcast_seg(segment_ids_q),
                      _bcast_seg(segment_ids_kv), causal, scale,
                      block_q, block_k, interpret)


# ---------------------------------------------------------------------------
# Local (sliding-window) attention — banded tile skipping
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _flash_local(q, k, v, window, causal, scale, block_q, block_k,
                 interpret):
    o, _lse = _fwd_call(q, k, v, causal, scale, block_q, block_k,
                        interpret, window=window, need_lse=False)
    return o


def _flash_local_fwd(q, k, v, window, causal, scale, block_q, block_k,
                     interpret):
    o, lse = _fwd_call(q, k, v, causal, scale, block_q, block_k,
                       interpret, window=window)
    return o, (q, k, v, o, lse)


def _flash_local_bwd(window, causal, scale, block_q, block_k, interpret,
                     res, do):
    import jax.numpy as jnp

    q, k, v, o, lse = res
    bq = _fit_block(block_q, q.shape[2])
    bk = _fit_block(min(block_k, 1024), k.shape[2])
    di = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                 axis=-1, keepdims=True)
    di = jnp.broadcast_to(di, di.shape[:-1] + (128,))
    dk, dv = _bwd_dkv_call(q, k, v, do, lse, di, causal, scale, bq, bk,
                           interpret, window=window)
    dq = _bwd_dq_call(q, k, v, do, lse, di, causal, scale, bq, bk,
                      interpret, window=window)
    return dq, dk, dv


_flash_local.defvjp(_flash_local_fwd, _flash_local_bwd)


def flash_attention_local(q, k, v, left: int, right: int = 0,
                          causal: bool = True,
                          sm_scale: Optional[float] = None,
                          block_q: int = 1024, block_k: int = 1024,
                          interpret: bool = False):
    """Sliding-window (banded) flash attention: position i attends keys
    j with ``i - left <= j <= i + right`` (mistral-style local attention
    when ``causal`` and ``right == 0``). Fully differentiable.

    The splash-attention idea (a mask-driven tile schedule) specialises
    here to an index test: whole KV tiles outside the band skip BOTH MXU
    matmuls in forward AND backward, so cost scales with
    ``S * (left + right + block)`` instead of ``S^2``. Smaller tiles
    skip more (the segmented kernel's 1024^2 crossover applies — see
    flash_attention_segmented's block notes).

    Ref: the reference keeps attention in its kernel-library ecosystem
    (cubek); jax's splash_attention is the public TPU baseline for
    masked variants.
    """
    scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(
        q.shape[-1])
    assert left >= 0 and right >= 0
    return _flash_local(q, k, v, (int(left), int(right)), causal, scale,
                        block_q, block_k, interpret)


# ---------------------------------------------------------------------------
# Block-sparse attention (splash-style mask-driven tile schedule)
# ---------------------------------------------------------------------------


def build_block_schedule(block_mask, allow_empty: bool = False) -> tuple:
    """(kv_ids, counts): per q-tile list of active kv tiles, padded by
    repeating the last active id (repeated runtime block indices are
    skipped compute-side; Mosaic re-DMAs only on index change).
    ``allow_empty`` admits all-zero rows (padded with tile 0, count 0) —
    the backward's TRANSPOSED schedule can have kv tiles no q attends;
    their dk/dv are zero and the compute guard never fires."""
    bm = np.asarray(block_mask, bool)
    n_q, n_kv = bm.shape
    counts = bm.sum(1).astype(np.int32)
    if not allow_empty:
        assert counts.min() > 0, "every q tile must attend >= 1 kv tile"
    max_active = max(int(counts.max()), 1)
    kv_ids = np.zeros((n_q, max_active), np.int32)
    for qi in range(n_q):
        ids = np.nonzero(bm[qi])[0]
        if len(ids) == 0:
            continue
        kv_ids[qi, :len(ids)] = ids
        kv_ids[qi, len(ids):] = ids[-1]
    return kv_ids, counts


def flash_attention_block_sparse(q, k, v, block_mask,
                                 causal: bool = True,
                                 sm_scale: Optional[float] = None,
                                 block_q: int = 512, block_k: int = 512,
                                 interpret: bool = False):
    """Flash attention over an ARBITRARY block-level mask (the
    splash-attention idea, jax/experimental/pallas/ops/tpu/
    splash_attention as the public baseline): ``block_mask[qi, ki]``
    says whether q tile ``qi`` attends kv tile ``ki``. The kv tile list
    of every q row is SCALAR-PREFETCHED and drives the K/V BlockSpec
    index maps, so the grid only sweeps ACTIVE tiles — cost scales with
    ``nnz(block_mask)``, not n_q*n_kv. ``causal`` additionally applies
    the in-tile diagonal mask. Differentiable: the backward runs the
    same schedule for dQ and its TRANSPOSE for dK/dV, so gradients also
    cost O(nnz).
    """
    B, H, Sq, D = q.shape
    Skv = k.shape[2]
    bq = _fit_block(block_q, Sq)
    bk = _fit_block(block_k, Skv)
    n_q, n_kv = Sq // bq, Skv // bk
    bm = np.asarray(block_mask, bool)
    assert bm.shape == (n_q, n_kv), \
        f"block_mask {bm.shape} != tile grid {(n_q, n_kv)} for blocks " \
        f"({bq},{bk})"
    if causal:
        # off-causal blocks can never contribute — prune them from the
        # schedule outright
        qr = np.arange(n_q)[:, None]
        kr = np.arange(n_kv)[None, :]
        bm = bm & (kr * bk <= qr * bq + bq - 1)
    counts = bm.sum(1)
    assert counts.min() > 0, "every q tile must attend >= 1 kv tile"
    scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(D)
    # the mask rides as a hashable static arg through the custom_vjp
    # (schedules are rebuilt per direction from it)
    bm_key = tuple(map(tuple, bm.tolist()))
    return _flash_bsp(q, k, v, bm_key, causal, scale, bq, bk, interpret)


def _bsp_fwd_call(q, k, v, bm, causal, scale, bq, bk, interpret,
                  need_lse: bool = True):
    """(o, lse) over the scalar-prefetched schedule of pruned mask bm."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, Sq, D = q.shape
    kv_ids, counts = build_block_schedule(bm)
    max_active = kv_ids.shape[1]

    def kernel(ids_ref, cnt_ref, q_ref, k_ref, v_ref, o_ref, *rest):
        lse_ref = rest[0] if need_lse else None
        m_sc, l_sc, acc_sc = rest[1:] if need_lse else rest
        qi = pl.program_id(2)
        j = pl.program_id(3)

        @pl.when(j == 0)
        def _init():
            m_sc[...] = jnp.full_like(m_sc, -jnp.inf)
            l_sc[...] = jnp.zeros_like(l_sc)
            acc_sc[...] = jnp.zeros_like(acc_sc)

        def _run():
            ki = ids_ref[qi, j]
            qt = q_ref[0, 0]
            kt = k_ref[0, 0]
            s = jax.lax.dot_general(
                qt, kt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            s = s * (scale * _LOG2E)  # base-2 softmax (module note)
            if causal:
                rows = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0) \
                    + qi * bq
                cols = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) \
                    + ki * bk
                s = jnp.where(cols <= rows, s, DEFAULT_MASK_VALUE)
            m_prev, l_prev = m_sc[...], l_sc[...]
            m_curr = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp2(m_prev - m_next)
            p = jnp.exp2(s - m_next[:, :1])
            l_sc[...] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
            m_sc[...] = m_next
            vt = v_ref[0, 0]
            acc_sc[...] = acc_sc[...] * alpha[:, :1] + jax.lax.dot(
                p.astype(vt.dtype), vt,
                preferred_element_type=jnp.float32)

        pl.when(j < cnt_ref[qi])(_run)

        @pl.when(j == max_active - 1)
        def _done():
            l = l_sc[...][:, :1]
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            o_ref[0, 0] = (acc_sc[...] * l_inv).astype(o_ref.dtype)
            if need_lse:
                lse_ref[0, 0] = (m_sc[...] + jnp.log2(
                    jnp.maximum(l_sc[...], 1e-37)))  # base-2 residual

    def _kv_idx(b, h, qi, j, ids, cnt):
        import jax.numpy as jnp

        return (b, h, ids[qi, jnp.minimum(j, cnt[qi] - 1)], 0)

    def _q_idx(b, h, qi, j, ids, cnt):
        return (b, h, qi, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, H, bm.shape[0], max_active),
        in_specs=[
            pl.BlockSpec((1, 1, bq, D), _q_idx),
            pl.BlockSpec((1, 1, bk, D), _kv_idx),
            pl.BlockSpec((1, 1, bk, D), _kv_idx),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, bq, D), _q_idx),
        ) + ((pl.BlockSpec((1, 1, bq, 128), _q_idx),)
             if need_lse else ()),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, D), jnp.float32),
        ],
    )
    res = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
        ) + ((jax.ShapeDtypeStruct((B, H, Sq, 128), jnp.float32),)
             if need_lse else ()),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
        name=f"flash_block_sparse_{bq}x{bk}"
        + ("" if need_lse else "_nolse"),
    )(jnp.asarray(kv_ids), jnp.asarray(counts), q, k, v)
    return res if need_lse else (res[0], None)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _flash_bsp(q, k, v, bm_key, causal, scale, bq, bk, interpret):
    bm = np.array(bm_key, bool)
    o, _ = _bsp_fwd_call(q, k, v, bm, causal, scale, bq, bk, interpret,
                         need_lse=False)
    return o


def _flash_bsp_fwd(q, k, v, bm_key, causal, scale, bq, bk, interpret):
    bm = np.array(bm_key, bool)
    o, lse = _bsp_fwd_call(q, k, v, bm, causal, scale, bq, bk, interpret)
    return o, (q, k, v, o, lse)


def _bsp_dq_call(q, k, v, do, lse, di, bm, causal, scale, bq, bk,
                 interpret):
    """dQ over the FORWARD schedule (per q tile, its active kv tiles —
    kv innermost so the dq accumulator stays VMEM-resident)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, Sq, D = q.shape
    kv_ids, counts = build_block_schedule(bm)
    max_active = kv_ids.shape[1]

    def kernel(ids_ref, cnt_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
               di_ref, dq_ref, dq_sc):
        qi = pl.program_id(2)
        j = pl.program_id(3)

        @pl.when(j == 0)
        def _init():
            dq_sc[...] = jnp.zeros_like(dq_sc)

        def _run():
            ki = ids_ref[qi, j]
            qt = q_ref[0, 0]
            kt = k_ref[0, 0]
            vt = v_ref[0, 0]
            dot = do_ref[0, 0]
            lse_t = lse_ref[0, 0][:, :1]
            dit = di_ref[0, 0][:, :1]
            s = jax.lax.dot_general(
                qt, kt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * (scale * _LOG2E)
            if causal:
                rows = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0) \
                    + qi * bq
                cols = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) \
                    + ki * bk
                s = jnp.where(cols <= rows, s, DEFAULT_MASK_VALUE)
            p = jnp.exp2(s - lse_t)
            dp = jax.lax.dot_general(
                dot, vt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds = p * (dp - dit) * scale
            dq_sc[...] += jax.lax.dot(ds.astype(kt.dtype), kt,
                                      preferred_element_type=jnp.float32)

        pl.when(j < cnt_ref[qi])(_run)

        @pl.when(j == max_active - 1)
        def _done():
            dq_ref[0, 0] = dq_sc[...].astype(dq_ref.dtype)

    def _kv_idx(b, h, qi, j, ids, cnt):
        import jax.numpy as jnp

        return (b, h, ids[qi, jnp.minimum(j, cnt[qi] - 1)], 0)

    def _q_idx(b, h, qi, j, ids, cnt):
        return (b, h, qi, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, H, bm.shape[0], max_active),
        in_specs=[
            pl.BlockSpec((1, 1, bq, D), _q_idx),
            pl.BlockSpec((1, 1, bk, D), _kv_idx),
            pl.BlockSpec((1, 1, bk, D), _kv_idx),
            pl.BlockSpec((1, 1, bq, D), _q_idx),
            pl.BlockSpec((1, 1, bq, 128), _q_idx),
            pl.BlockSpec((1, 1, bq, 128), _q_idx),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, D), _q_idx),
        scratch_shapes=[pltpu.VMEM((bq, D), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
        name=f"flash_bsp_dq_{bq}x{bk}",
    )(jnp.asarray(kv_ids), jnp.asarray(counts), q, k, v, do, lse, di)


def _bsp_dkv_call(q, k, v, do, lse, di, bm, causal, scale, bq, bk,
                  interpret):
    """dK/dV over the TRANSPOSED schedule (per kv tile, the q tiles
    that attend it — q innermost so dk/dv accumulators stay resident).
    kv tiles nothing attends keep count 0: the guard never fires and
    the zero-initialized scratch writes out zero gradients."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, Sq, D = q.shape
    q_ids, q_counts = build_block_schedule(bm.T, allow_empty=True)
    max_active = q_ids.shape[1]

    def kernel(ids_ref, cnt_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
               di_ref, dk_ref, dv_ref, dk_sc, dv_sc):
        ki = pl.program_id(2)
        j = pl.program_id(3)

        @pl.when(j == 0)
        def _init():
            dk_sc[...] = jnp.zeros_like(dk_sc)
            dv_sc[...] = jnp.zeros_like(dv_sc)

        def _run():
            qi = ids_ref[ki, j]
            qt = q_ref[0, 0]
            kt = k_ref[0, 0]
            vt = v_ref[0, 0]
            dot = do_ref[0, 0]
            lse_t = lse_ref[0, 0][:, :1]
            dit = di_ref[0, 0][:, :1]
            s = jax.lax.dot_general(
                qt, kt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * (scale * _LOG2E)
            if causal:
                rows = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0) \
                    + qi * bq
                cols = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) \
                    + ki * bk
                s = jnp.where(cols <= rows, s, DEFAULT_MASK_VALUE)
            p = jnp.exp2(s - lse_t)
            dv_sc[...] += jax.lax.dot_general(
                p.astype(dot.dtype), dot, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(
                dot, vt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds = p * (dp - dit) * scale
            dk_sc[...] += jax.lax.dot_general(
                ds.astype(qt.dtype), qt, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        pl.when(j < cnt_ref[ki])(_run)

        @pl.when(j == max_active - 1)
        def _done():
            dk_ref[0, 0] = dk_sc[...].astype(dk_ref.dtype)
            dv_ref[0, 0] = dv_sc[...].astype(dv_ref.dtype)

    def _q_idx(b, h, ki, j, ids, cnt):
        import jax.numpy as jnp

        return (b, h, ids[ki, jnp.minimum(j, jnp.maximum(
            cnt[ki] - 1, 0))], 0)

    def _kv_idx(b, h, ki, j, ids, cnt):
        return (b, h, ki, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, H, bm.shape[1], max_active),
        in_specs=[
            pl.BlockSpec((1, 1, bq, D), _q_idx),
            pl.BlockSpec((1, 1, bk, D), _kv_idx),
            pl.BlockSpec((1, 1, bk, D), _kv_idx),
            pl.BlockSpec((1, 1, bq, D), _q_idx),
            pl.BlockSpec((1, 1, bq, 128), _q_idx),
            pl.BlockSpec((1, 1, bq, 128), _q_idx),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, bk, D), _kv_idx),
            pl.BlockSpec((1, 1, bk, D), _kv_idx),
        ),
        scratch_shapes=[
            pltpu.VMEM((bk, D), jnp.float32),
            pltpu.VMEM((bk, D), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
        name=f"flash_bsp_dkv_{bq}x{bk}",
    )(jnp.asarray(q_ids), jnp.asarray(q_counts), q, k, v, do, lse, di)


def _flash_bsp_bwd(bm_key, causal, scale, bq, bk, interpret, res, do):
    import jax.numpy as jnp

    q, k, v, o, lse = res
    bm = np.array(bm_key, bool)
    di = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                 axis=-1, keepdims=True)
    di = jnp.broadcast_to(di, di.shape[:-1] + (128,))
    dq = _bsp_dq_call(q, k, v, do, lse, di, bm, causal, scale, bq, bk,
                      interpret)
    dk, dv = _bsp_dkv_call(q, k, v, do, lse, di, bm, causal, scale, bq,
                           bk, interpret)
    return dq, dk, dv


_flash_bsp.defvjp(_flash_bsp_fwd, _flash_bsp_bwd)


# ---------------------------------------------------------------------------
# Head-packed flash forward for head_dim < 128 (round-2 verdict #3)
# ---------------------------------------------------------------------------


def _fwd_call_packed(q, k, v, causal, sm_scale, block_q, block_k,
                     interpret, kv_len=None, window=None):
    """Flash forward with ``g = 128 // head_dim`` heads PACKED side by
    side on the lane axis. A 64-wide head underfills everything a TPU
    has: q/k/v stream at half lane width, vregs are half-empty, and the
    MXU pads K/N to 128 anyway (measured v5e: K=64 and N=64 matmuls run
    at 0.54x/0.53x the 128-wide rate — the padding is physics, see
    BENCH_NOTES). Packing restores what CAN be recovered:

    - full 128-lane DMA windows for q/k/v (the streaming-cliff rule:
      width-128 buffers stream at ~750 GB/s on v5e),
    - ONE row-stacked (g*bq, bk) softmax per tile pair (one VPU op
      chain for all packed heads),
    - 1/g the grid steps.

    All cross-head data movement is ROW-stacked (sublane dim) — Mosaic
    rejects sub-tile lane concatenation/reshape. Outputs (o, lse) are
    written UNPACKED via (1, g, bq, D) blocks, so the caller and the
    backward consume them directly.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, Sq, D = q.shape
    Skv = k.shape[2]
    g = 128 // D
    assert D * g == 128 and H % g == 0
    Hp = H // g

    def pack(x):
        b, h, s_, d = x.shape
        # heads g*i .. g*i+g-1 -> lanes [0:D], [D:2D], ... of packed row i
        return x.reshape(b, Hp, g, s_, d).transpose(0, 1, 3, 2, 4) \
                .reshape(b, Hp, s_, g * d)

    qp, kp, vp = pack(q), pack(k), pack(v)
    bq = _fit_block(block_q, Sq)
    bk = _fit_block(block_k, Skv)
    grid = (B, Hp, Sq // bq, Skv // bk)
    n_kv = Skv // bk
    kv_mask = kv_len is not None and kv_len < Skv

    def kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_sc, l_sc, acc_sc):
        qi = pl.program_id(2)
        ki = pl.program_id(3)

        @pl.when(ki == 0)
        def _init():
            m_sc[...] = jnp.full_like(m_sc, -jnp.inf)
            l_sc[...] = jnp.zeros_like(l_sc)
            acc_sc[...] = jnp.zeros_like(acc_sc)

        def _run():
            qt = q_ref[0, 0]                       # (bq, 128) = g heads
            kt = k_ref[0, 0]                       # (bk, 128)
            # per-head QK dots at the TRUE contraction (static lane
            # slices), stacked on ROWS for one shared softmax phase
            ss = [jax.lax.dot_general(
                qt[:, t * D:(t + 1) * D], kt[:, t * D:(t + 1) * D],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) for t in range(g)]
            s = jnp.concatenate(ss, axis=0)        # (g*bq, bk) row concat
            s = s * (sm_scale * _LOG2E)  # base-2 softmax (module note)
            if causal or kv_mask or window is not None:
                rows1 = jax.lax.broadcasted_iota(
                    jnp.int32, (bq, bk), 0) + qi * bq
                rows = jnp.concatenate([rows1] * g, axis=0)
                cols = jax.lax.broadcasted_iota(
                    jnp.int32, (g * bq, bk), 1) + ki * bk
                ok = cols <= rows if causal else cols == cols
                if kv_mask:
                    ok = ok & (cols < kv_len)
                if window is not None:
                    wl, wr = window
                    ok = ok & (rows - cols <= wl) & (cols - rows <= wr)
                s = jnp.where(ok, s, DEFAULT_MASK_VALUE)

            # ONE row-stacked softmax update for all packed heads
            m_prev, l_prev = m_sc[...], l_sc[...]  # (g*bq, 128)
            m_curr = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp2(m_prev - m_next)
            p = jnp.exp2(s - m_next[:, :1])        # (g*bq, bk)
            l_sc[...] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
            m_sc[...] = m_next

            vt = v_ref[0, 0]                       # (bk, 128)
            pvs = [jax.lax.dot(
                p[t * bq:(t + 1) * bq].astype(vt.dtype),
                vt[:, t * D:(t + 1) * D],
                preferred_element_type=jnp.float32) for t in range(g)]
            pv = jnp.concatenate(pvs, axis=0)      # (g*bq, D) row concat
            acc_sc[...] = acc_sc[...] * alpha[:, :1] + pv

        cond = ((qi + 1) * bq - 1) >= (ki * bk) if causal else None
        if window is not None:
            wl, wr = window
            wc = jnp.logical_and(
                ki * bk + bk - 1 >= qi * bq - wl,
                qi * bq + bq - 1 + wr >= ki * bk)
            cond = wc if cond is None else jnp.logical_and(cond, wc)
        if cond is not None:
            pl.when(cond)(_run)
        else:
            _run()

        @pl.when(ki == n_kv - 1)
        def _done():
            l = l_sc[...][:, :1]                   # (g*bq, 1)
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            o = (acc_sc[...] * l_inv).astype(o_ref.dtype)
            o_ref[0] = o.reshape(g, bq, D)         # unpacked head blocks
            lse = m_sc[...] + jnp.log2(
                jnp.maximum(l_sc[...], 1e-37))     # base-2 residual
            lse_ref[0] = lse.reshape(g, bq, 128)

    out_shapes = (
        jax.ShapeDtypeStruct((B, H, Sq, D), q.dtype),
        jax.ShapeDtypeStruct((B, H, Sq, 128), jnp.float32),
    )
    in_specs = [
        pl.BlockSpec((1, 1, bq, 128), lambda b, h, qi, ki: (b, h, qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bk, 128), lambda b, h, qi, ki: (b, h, ki, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bk, 128), lambda b, h, qi, ki: (b, h, ki, 0),
                     memory_space=pltpu.VMEM),
    ]
    flops = 4 * B * H * Sq * Skv * D * (0.5 if causal else 1.0)
    o, lse = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, g, bq, D),
                         lambda b, h, qi, ki: (b, h, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, bq, 128),
                         lambda b, h, qi, ki: (b, h, qi, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((g * bq, 128), jnp.float32),
            pltpu.VMEM((g * bq, 128), jnp.float32),
            pltpu.VMEM((g * bq, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            vmem_limit_bytes=100 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=int(flops),
            bytes_accessed=(q.size + k.size + v.size + q.size)
            * q.dtype.itemsize,
            transcendentals=B * H * Sq * Skv),
        interpret=interpret,
        name=f"flash_attn_hd{D}x{g}_{bq}x{bk}",
    )(qp, kp, vp)
    return o, lse


def flash_attention_packed(q, k, v, causal: bool = True,
                           sm_scale: Optional[float] = None,
                           block_q: int = 1024, block_k: int = 1024,
                           interpret: bool = False,
                           window=None):
    """flash attention for head_dim in {32, 64}: packs 128//head_dim
    heads per 128-lane tile (full-width DMA + stacked softmax). Fully
    differentiable — the backward runs the existing per-head kernels on
    the unpacked lse (padded to the lane tile by Mosaic); the forward
    is the serving-hot path this packing accelerates.
    """
    scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(
        q.shape[-1])
    D = q.shape[-1]
    g = 128 // D
    if D % 128 == 0 or q.shape[1] % g:
        return flash_attention(q, k, v, causal, scale, block_q, block_k,
                               interpret)
    return _flash_packed(q, k, v, causal, scale, block_q, block_k,
                         interpret, window)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _flash_packed(q, k, v, causal, scale, block_q, block_k, interpret,
                  window):
    o, _ = _fwd_call_packed(q, k, v, causal, scale, block_q, block_k,
                            interpret, window=window)
    return o


def _flash_packed_fwd(q, k, v, causal, scale, block_q, block_k,
                      interpret, window):
    o, lse = _fwd_call_packed(q, k, v, causal, scale, block_q, block_k,
                              interpret, window=window)
    return o, (q, k, v, o, lse)


def _flash_packed_bwd(causal, scale, block_q, block_k, interpret, window,
                      res, do):
    import jax.numpy as jnp

    q, k, v, o, lse = res
    bq = _fit_block(block_q, q.shape[2])
    bk = _fit_block(min(block_k, 1024), k.shape[2])
    di = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                 axis=-1, keepdims=True)
    di = jnp.broadcast_to(di, di.shape[:-1] + (128,))
    dk, dv = _bwd_dkv_call(q, k, v, do, lse, di, causal, scale, bq, bk,
                           interpret, window=window)
    dq = _bwd_dq_call(q, k, v, do, lse, di, causal, scale, bq, bk,
                      interpret, window=window)
    return dq, dk, dv


_flash_packed.defvjp(_flash_packed_fwd, _flash_packed_bwd)
