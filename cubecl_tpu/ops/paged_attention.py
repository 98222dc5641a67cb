"""Paged-KV decode attention — the serving kernel.

The KV cache lives in fixed-size pages scattered through HBM; each
sequence owns a page list (block table). One decode step attends a
query vector against the sequence's pages without materializing a
contiguous KV view.

TPU-native structure (pallas guide: PrefetchScalarGridSpec):
- grid (batch, kv_heads, pages_per_seq), pages innermost so the online
  softmax stats stay resident in VMEM scratch across a sequence's sweep
- the block table + lengths are SCALAR-PREFETCHED: the k/v BlockSpec
  index_maps read ``page_indices[b, i]`` to drive the HBM->VMEM DMA of
  exactly the right page (the hardware-level equivalent of the
  reference's gather-free paged loads)
- GQA for free: q carries the (group = H // H_kv) query heads of one kv
  head as the fragment's row dim, so scores are (group, page) MXU tiles
- pages past the sequence length are skipped whole; positions past it
  are masked inside the final page

No backward: decode is inference-only (training uses flash_attention).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import numpy as np

DEFAULT_MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)


def pages_bucket(n: int, min_bucket: int = 8) -> int:
    """Shape-bucketing policy for block-table widths: next power of two
    >= n (floored at ``min_bucket``). One compiled decode kernel then
    serves every context length within a bucket — without bucketing,
    every new table width is a fresh 0.4-2s remote AOT compile
    (round-1 VERDICT missing #4; reference metadata.rs one-info-buffer
    shape ABI is the CUDA answer, padded launch plans are the TPU one).

    Cost model (measured on v5e, B=16 Hkv=8 D=128 f32): a real page step
    costs ~80us, a padded step ~48us — the @pl.when guard skips the
    compute but Mosaic still performs the window DMA for runtime-equal
    dynamic indices (the clamped index_map repeats the last valid page;
    compile-time-provable revisits would be skipped, runtime ones are
    not). Average padding within a power-of-two bucket is ~25%, vs a
    0.4-2s remote recompile every `page` tokens for exact-width tables
    (~15ms/step amortized) — bucketing wins ~20-50x for growing
    contexts. Fixed-capacity caches (models/llama.init_kv_cache) sized
    once need no bucketing at all: one compile for the session."""
    b = max(1, min_bucket)
    while b < n:
        b *= 2
    return b


def paged_attention(q, k_pages, v_pages, page_indices, lengths,
                    sm_scale: Optional[float] = None,
                    interpret: bool = False,
                    bucket_pages: bool = True,
                    unroll: int = 16,
                    k_scales=None, v_scales=None,
                    window: int = 0, sinks: int = 0, pos_meta=None,
                    layer: int = 0, dynamic_grid: Optional[bool] = None):
    """Decode attention over a paged KV cache.

    q:            (B, H, D)            one query vector per head
    k_pages/v_pages: (H_kv, P, page_size, D)  the global page pools,
                  or a STACKED whole-model pool (L, H_kv, P, page, D)
                  with ``layer`` selecting the layer: the layer axis
                  folds into the same (head, page) flattening the
                  kernel already does (a free bitcast of the contiguous
                  pool), and ``layer`` enters through the table rebase —
                  so serving loops never materialize a per-layer slice
                  (measured round 4: slicing the stack cost ~1.7 ms/layer
                  in HBM copies at 1B scale, 10x the attention itself)
    page_indices: (B, max_pages) int32 block table (page ids within a
                  head's pool; same table for every kv head)
    lengths:      (B,) int32 current sequence lengths
    bucket_pages: pad the table width to a power-of-two bucket so one
                  compile serves a whole context-length range
    unroll:       pages DMA'd per grid step (each gets its own BlockSpec
                  so Mosaic issues ``unroll`` HBM window fetches at once;
                  a single small page per step is DMA-latency-bound).
                  Measured v5e, B=16 x 2048-token contexts, f32: u=1
                  269 GB/s KV stream, u=2 382, u=4 524, u=8 620, u=16
                  **772 = 94% of the width-128 streaming ceiling** —
                  page DMAs are 64KB, so latency dominates until ~16
                  are in flight (348us/step beats jax's own paged
                  kernel, 352 at its best pages_per_compute_block).
                  Halved automatically until it divides the (bucketed)
                  table width.
    dynamic_grid: choose the LIVE-step dynamic grid (visits exactly the
                  work that holds KV) vs the static capacity grid (one
                  step per capacity page-chunk, dead steps' compute
                  skipped but their pipeline ramp paid). Default (None)
                  auto-selects: dynamic when ``lengths`` is a concrete
                  array (eager decode step), static under tracing —
                  measured round 5 on v5e, a Mosaic dynamic grid bound
                  inside ``lax.fori_loop``/``while_loop`` aborts the TPU
                  backend ("INTERNAL: TPU backend error") at EVERY
                  config, while the same call at the top level of a jit
                  is fine. Captured serving loops therefore take the
                  capacity grid; pass ``dynamic_grid=True`` explicitly
                  inside a plain (loop-free) jit with ragged short
                  contexts in a large cache, where the live grid's
                  dead-step skip is worth ~capacity/live_steps.
    -> (B, H, D)
    """
    import jax.numpy as jnp

    B, H, D = q.shape
    if k_pages.ndim == 5:
        assert pos_meta is None, "ring metadata is a per-layer-pool mode"
        nl, Hkv, P, page, _ = k_pages.shape
        head_base = layer * Hkv
        k_pages = k_pages.reshape(nl * Hkv, P, page, D)
        v_pages = v_pages.reshape(nl * Hkv, P, page, D)
        if k_scales is not None:
            k_scales = k_scales.reshape(nl * Hkv, P, page)
            v_scales = v_scales.reshape(nl * Hkv, P, page)
    else:
        head_base = 0
        Hkv, P, page, _ = k_pages.shape
    assert H % Hkv == 0
    G = H // Hkv
    scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(D)
    qg = q.reshape(B, Hkv, G, D)
    if bucket_pages and pos_meta is None:
        # (ring tables are a small static capacity — no bucketing, and
        # padded/repeated entries would double-count their metadata)
        mb = pages_bucket(page_indices.shape[1])
        if mb != page_indices.shape[1]:
            # padded entries are never read: the index_map clamps the
            # page step to the last valid page per sequence (compute is
            # skipped there; the window DMA still happens — see the
            # pages_bucket cost model)
            page_indices = jnp.pad(
                page_indices, ((0, 0), (0, mb - page_indices.shape[1])))
    # flatten (head, page) so one scalar table drives the DMA per head:
    # the kernel runs per (b, h) and the index_map rebases into head h's
    # pool — fold the head (and stacked layer) into the leading page axis
    kf = k_pages.reshape(-1, page, D)
    vf = v_pages.reshape(-1, page, D)
    # int8 KV mode: dequant folds onto the score / probability COLUMNS
    # inside the kernel (two lane-broadcast multiplies), so the MXU
    # operands never materialize a dequantized KV tile. The scales are
    # PRE-GATHERED into block-table order by XLA (1/128th of the KV
    # bytes — negligible traffic) so each grid step reads ONE contiguous
    # (1, span) window instead of 2U page-scattered (1, 1, page)
    # windows: >4 tiny scale windows on the DYNAMIC live grid abort the
    # v5e backend at runtime (round-5 smoke: u=8's 16 scale windows
    # "INTERNAL: TPU backend error"; u=1 fine — measured, mechanism is
    # the per-step DMA fan-out, not the quant math), and on every grid
    # they were latency-bound DMAs. Layout (B*Hkv*n_steps, 1, span):
    # Mosaic requires the last-two block dims to be (%8, %128) or EQUAL
    # to the array dims (round-4 smoke), so each step's span rides the
    # trailing axis exactly.
    assert (k_scales is None) == (v_scales is None)
    # ring-buffer (bounded-memory StreamingLLM) mode: per-slot ABSOLUTE
    # position metadata replaces the table-order position iota — slots
    # of a recycled page carry stale positions and mask out exactly.
    # Tiled per kv head so the same clamped window specs serve it.
    mf = None
    if pos_meta is not None:
        mf = jnp.tile(pos_meta.reshape(P, page).astype(jnp.int32),
                      (Hkv, 1)).reshape(Hkv * P, 1, page)
    max_pages = page_indices.shape[1]
    if dynamic_grid is None:
        # auto: a traced `lengths` means we may be inside lax control
        # flow, where Mosaic dynamic grid bounds abort the backend
        # (see the dynamic_grid docstring note)
        dynamic_grid = not isinstance(lengths, jax.core.Tracer)
    if k_scales is not None and dynamic_grid and window == 0 \
            and pos_meta is None:
        # (window/ring modes route to the static capacity grid below
        # regardless of dynamic_grid, and the static grid runs deeper
        # int8 unrolls fine — only the LIVE route needs the clamp)
        # int8 KV on the DYNAMIC grid: >4 in-flight int8 page windows
        # per step abort the v5e backend at runtime (round-5 smoke;
        # u=8 "INTERNAL: TPU backend error" in EVERY formulation tried
        # — per-page scale windows, pre-gathered scale windows — while
        # u<=4 passes and the STATIC grid runs u=8+ fine, so the
        # trigger is sub-32-bit windowed DMA depth under a dynamic
        # trip count, not the quant math). int8 streams 4x fewer KV
        # bytes, so u=4's shallower DMA pipeline costs far less than
        # it would at f32.
        unroll = min(unroll, 4)
    while unroll > 1 and max_pages % unroll:
        unroll //= 2
    # per-head rebased tables: head h uses pi + (layer*Hkv + h)*P
    heads = (head_base
             + jnp.arange(Hkv, dtype=page_indices.dtype)) * P
    pi_h = (page_indices[:, None, :] + heads[None, :, None])  # (B,Hkv,mp)

    ksf = vsf = None
    if k_scales is not None:
        ksf = _gather_scales(k_scales, pi_h, page, unroll)
        vsf = _gather_scales(v_scales, pi_h, page, unroll)
    if window == 0 and mf is None and dynamic_grid:
        # live-step dynamic grid — the grid length is the actual work,
        # not B*Hkv*capacity. Tables build OUTSIDE the inner jit so the
        # 16 per-layer calls of a decode step CSE to one table
        # computation
        work = _decode_work_tables(lengths, page, unroll, max_pages,
                                   Hkv, B)
        out = _paged_call_live(qg, kf, vf, pi_h, lengths, work, scale,
                               interpret, G, page, max_pages, unroll,
                               ksf, vsf)
    else:
        out = _paged_call_headed(qg, kf, vf, pi_h, lengths, scale,
                                 interpret, G, page, max_pages, unroll,
                                 ksf, vsf, window, sinks, mf)
    return out.reshape(B, H, D)


def _gather_scales(scales, pi_h, page, U):
    """Gather per-(token, head) quant scales into block-table order:
    scales (Hkv, P, page) or stacked-flat (L*Hkv, P, page), pi_h
    (B, Hkv, mp) head-rebased flat page ids -> (B*Hkv*(mp//U), 1, U*page)
    f32 — one contiguous lane window per (b, h, grid-step), so the
    kernel DMAs a single scale block per step (see the layout note in
    paged_attention)."""
    import jax.numpy as jnp

    B, Hkv, mp = pi_h.shape
    flat = scales.reshape(-1, page).astype(jnp.float32)     # (·*P, page)
    g = flat[pi_h]                                          # (B,Hkv,mp,page)
    return g.reshape(B * Hkv * (mp // U), 1, U * page)


def _kv_page(b, h, i, pi, ln, page):
    import jax.numpy as jnp

    last = jnp.maximum((ln[b] + page - 1) // page - 1, 0)
    return pi[b, h, jnp.minimum(i, last)]


_TRACE_COUNT = 0  # distinct compiled decode variants (test/diagnostic)


@functools.partial(jax.jit, static_argnames=(
    "sm_scale", "interpret", "G", "page", "max_pages", "unroll",
    "window", "sinks"))
def _paged_call_headed(qg, kf, vf, pi_h, lengths, sm_scale, interpret,
                       G, page, max_pages, unroll=1, ksf=None, vsf=None,
                       window=0, sinks=0, mf=None):
    global _TRACE_COUNT
    _TRACE_COUNT += 1  # runs at trace time only: counts compiled variants
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Hkv, _G, D = qg.shape
    U = unroll
    span = U * page  # KV positions swept per grid step
    quant = ksf is not None
    ring = mf is not None

    def kernel(pi_ref, len_ref, q_ref, *refs):
        k_refs = refs[:U]
        v_refs = refs[U:2 * U]
        n = 2 * U
        ks_ref = vs_ref = m_refs = None
        if quant:
            ks_ref, vs_ref = refs[n:n + 2]
            n += 2
        if ring:
            m_refs = refs[n:n + U]
            n += U
        o_ref, m_sc, l_sc, acc_sc = refs[n:]
        b = pl.program_id(0)
        i = pl.program_id(2)

        @pl.when(i == 0)
        def _init():
            m_sc[...] = jnp.full_like(m_sc, -jnp.inf)
            l_sc[...] = jnp.zeros_like(l_sc)
            acc_sc[...] = jnp.zeros_like(acc_sc)

        seq_len = len_ref[b]
        # ring tables are position-unordered: every step runs (capacity
        # is small by construction); otherwise steps past the length -
        # or in the dead windowed middle - skip compute
        step_live = (i >= 0) if ring else (i * span < seq_len)
        if window and not ring:
            # a step is dead when its whole span falls between the
            # sinks and the window tail
            step_live = jnp.logical_and(
                step_live,
                jnp.logical_or(i * span < sinks,
                               (i + 1) * span > seq_len - window))

        @pl.when(step_live)
        def _run():
            qt = q_ref[0, 0]                              # (G, D)
            # one fused (span, D) KV tile per step: U pages DMA'd
            # concurrently (each ref has its own window), one matmul
            # at the storage dtype (f32 accumulation via preferred)
            kt = jnp.concatenate([r[0] for r in k_refs], axis=0)
            if quant:
                kt = kt.astype(jnp.float32)
            s = jax.lax.dot_general(
                qt, kt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)       # (G, span)
            # base-2 online softmax (ops/attention.py module note: exp2
            # is measurably cheaper than exp on the VPU; identical math)
            s = s * (sm_scale * 1.4426950408889634)
            if quant:
                # K dequant folded onto score columns (lane broadcast);
                # one pre-gathered (1, span) window per step
                s = s * ks_ref[0]
            if ring:
                # absolute positions ride the metadata windows; stale
                # slots of recycled pages (and never-written -1 slots)
                # mask out by value
                pos = jnp.concatenate(
                    [r[0] for r in m_refs], axis=1)       # (1, span)
                pos = jnp.broadcast_to(pos, (G, span))
            else:
                pos = jax.lax.broadcasted_iota(jnp.int32, (G, span), 1) \
                    + i * span
            live = ((pos >= 0) & (pos < seq_len)) if ring \
                else (pos < seq_len)
            if window:
                # StreamingLLM: attend the first `sinks` tokens + the
                # last `window` tokens only (static compile-time mask
                # shape; the step guard below skips dead middle pages'
                # compute)
                live = live & ((pos < sinks)
                               | (pos >= seq_len - window))
            s = jnp.where(live, s, DEFAULT_MASK_VALUE)

            m_prev, l_prev = m_sc[...], l_sc[...]
            m_curr = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp2(m_prev - m_next)
            p = jnp.exp2(s - m_next[:, :1])
            l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
            m_sc[...] = m_next
            l_sc[...] = l_next
            vt = jnp.concatenate([r[0] for r in v_refs], axis=0)
            if quant:
                # V dequant folded onto probability columns
                acc_sc[...] = acc_sc[...] * alpha[:, :1] + jax.lax.dot(
                    p * vs_ref[0], vt.astype(jnp.float32),
                    preferred_element_type=jnp.float32)
            else:
                acc_sc[...] = acc_sc[...] * alpha[:, :1] + jax.lax.dot(
                    p.astype(vt.dtype), vt,
                    preferred_element_type=jnp.float32)

        @pl.when(i == max_pages // U - 1)
        def _done():
            l = l_sc[...][:, :1]
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            o_ref[0, 0] = (acc_sc[...] * l_inv).astype(o_ref.dtype)

    # clamp each slot's page step to the sequence's last valid page:
    # steps past seq_len repeat the previous block index, so Mosaic's
    # pipeline skips their DMA entirely — ragged batch rows and bucket
    # padding stream no dead KV
    def _page_at(b, h, i, pi, ln):
        if ring:   # unclamped: repeated pages would double-count meta
            return pi[b, h, i]
        return _kv_page(b, h, i, pi, ln, page)

    def _slot_spec(u):
        return pl.BlockSpec((1, page, D),
                            lambda b, h, i, pi, ln, u=u: (_page_at(
                                b, h, i * U + u, pi, ln), 0, 0))

    def _meta_spec(u):
        # (1, 1, page) over an (Hkv*P, 1, page) array: the last-two
        # block dims equal the array dims (Mosaic's sublane rule)
        return pl.BlockSpec((1, 1, page),
                            lambda b, h, i, pi, ln, u=u: (_page_at(
                                b, h, i * U + u, pi, ln), 0, 0))

    n_steps = max_pages // U

    def _gathered_scale_spec():
        # pre-gathered (B*Hkv*n_steps, 1, span): ONE window per step
        return pl.BlockSpec(
            (1, 1, span),
            lambda b, h, i, pi, ln: ((b * Hkv + h) * n_steps + i, 0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, Hkv, max_pages // U),
        in_specs=(
            [pl.BlockSpec((1, 1, G, D),
                          lambda b, h, i, pi, ln: (b, h, 0, 0))]
            + [_slot_spec(u) for u in range(U)]     # k slots
            + [_slot_spec(u) for u in range(U)]     # v slots
            + ([_gathered_scale_spec()] * 2 if quant else [])
            + ([_meta_spec(u) for u in range(U)] if ring else [])
        ),
        out_specs=pl.BlockSpec((1, 1, G, D),
                               lambda b, h, i, pi, ln: (b, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((G, 128), jnp.float32),
            pltpu.VMEM((G, 128), jnp.float32),
            pltpu.VMEM((G, D), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, D), qg.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
        name=f"paged_attn_g{G}_p{page}_u{U}" + ("_q8" if quant else "")
        + ("_ring" if ring else ""),
    )(pi_h, lengths, qg, *([kf] * U), *([vf] * U),
      *([ksf, vsf] if quant else []),
      *(([mf] * U) if ring else []))


def _decode_work_tables(lengths, page, U, max_pages, Hkv, B):
    """Live-step work list for the DYNAMIC decode grid: one entry per
    (batch row, kv head, page-chunk) that actually holds KV, b-major
    then head then chunk. Returns (W, wb, wh, wi, first, last): W is
    the traced live step count (the Mosaic dynamic grid bound); the
    tables are capacity-sized int32 vectors, scalar-prefetched so the
    kernel visits exactly the live work instead of B*Hkv*capacity —
    the legacy grid's dead steps cost pipeline ramp even with their
    compute AND DMA skipped (the round-4 "dead-step wall": 2048-step
    capacity grids made B=16 decode ctx-independent at ~4ms/layer-16).
    Rows with length 0 still get one all-masked step so their output
    block is written (zeros), matching the legacy grid."""
    import jax.numpy as jnp

    pages_b = (lengths + page - 1) // page
    steps_b = jnp.maximum((pages_b + U - 1) // U, 1)       # (B,)
    cnt = Hkv * steps_b
    ends = jnp.cumsum(cnt)
    W = ends[-1].astype(jnp.int32)
    cap = B * Hkv * max(max_pages // U, 1)
    s = jnp.arange(cap, dtype=jnp.int32)
    wb = jnp.minimum(jnp.searchsorted(ends, s, side="right"),
                     B - 1).astype(jnp.int32)
    r = s - (ends[wb] - cnt[wb]).astype(jnp.int32)
    sb = steps_b[wb].astype(jnp.int32)
    wh = jnp.minimum(r // sb, Hkv - 1).astype(jnp.int32)
    wi = (r % sb).astype(jnp.int32)
    first = (wi == 0).astype(jnp.int32)
    last = (wi == sb - 1).astype(jnp.int32)
    return W, wb, wh, wi, first, last


@functools.partial(jax.jit, static_argnames=(
    "sm_scale", "interpret", "G", "page", "max_pages", "unroll"))
def _paged_call_live(qg, kf, vf, pi_h, lengths, work, sm_scale,
                     interpret, G, page, max_pages, unroll=1,
                     ksf=None, vsf=None):
    """Decode attention on a live-step dynamic grid (the default path;
    window/ring modes use the legacy capacity grid above).

    Dead KV slots (page-chunk slots past a row's last page) index the
    constant pool page 0: after the first touch every later occurrence
    is revisit-skipped by Mosaic, and their columns carry positions
    >= seq_len so the existing mask zeroes them — garbage-tolerant by
    construction (pools are zeros-initialized; stale reals mask out)."""
    global _TRACE_COUNT
    _TRACE_COUNT += 1
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Hkv, _G, D = qg.shape
    U = unroll
    span = U * page
    quant = ksf is not None
    W, wb, wh, wi, first, last = work

    def kernel(pi_ref, len_ref, wb_ref, wh_ref, wi_ref, fr_ref, ls_ref,
               q_ref, *refs):
        k_refs = refs[:U]
        v_refs = refs[U:2 * U]
        n = 2 * U
        ks_ref = vs_ref = None
        if quant:
            ks_ref, vs_ref = refs[n:n + 2]
            n += 2
        o_ref, m_sc, l_sc, acc_sc = refs[n:]
        st = pl.program_id(0)
        b = wb_ref[st]
        i = wi_ref[st]

        @pl.when(fr_ref[st] == 1)
        def _init():
            m_sc[...] = jnp.full_like(m_sc, -jnp.inf)
            l_sc[...] = jnp.zeros_like(l_sc)
            acc_sc[...] = jnp.zeros_like(acc_sc)

        seq_len = len_ref[b]

        # every enumerated step is live by construction EXCEPT the one
        # placeholder step a length-0 row gets (so its output block is
        # written): skipping it keeps l==0 -> zero output, as legacy
        @pl.when(i * span < seq_len)
        def _run():
            qt = q_ref[0, 0]                          # (G, D)
            kt = jnp.concatenate([r[0] for r in k_refs], axis=0)
            if quant:
                kt = kt.astype(jnp.float32)
            s = jax.lax.dot_general(
                qt, kt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)   # (G, span)
            s = s * (sm_scale * 1.4426950408889634)
            if quant:
                s = s * ks_ref[0]   # pre-gathered (1, span) window
            pos = jax.lax.broadcasted_iota(jnp.int32, (G, span), 1) \
                + i * span
            s = jnp.where(pos < seq_len, s, DEFAULT_MASK_VALUE)

            m_prev, l_prev = m_sc[...], l_sc[...]
            m_curr = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp2(m_prev - m_next)
            p = jnp.exp2(s - m_next[:, :1])
            l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
            m_sc[...] = m_next
            l_sc[...] = l_next
            vt = jnp.concatenate([r[0] for r in v_refs], axis=0)
            if quant:
                acc_sc[...] = acc_sc[...] * alpha[:, :1] + jax.lax.dot(
                    p * vs_ref[0], vt.astype(jnp.float32),
                    preferred_element_type=jnp.float32)
            else:
                acc_sc[...] = acc_sc[...] * alpha[:, :1] + jax.lax.dot(
                    p.astype(vt.dtype), vt,
                    preferred_element_type=jnp.float32)

        @pl.when(ls_ref[st] == 1)
        def _done():
            l = l_sc[...][:, :1]
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            o_ref[0, 0] = (acc_sc[...] * l_inv).astype(o_ref.dtype)

    def _page_live(st, u, pi, ln, wb_, wh_, wi_):
        b = wb_[st]
        idx = wi_[st] * U + u
        pb = (ln[b] + page - 1) // page
        return jnp.where(idx < pb, pi[b, wh_[st], idx], 0)

    def _slot_spec(u):
        return pl.BlockSpec(
            (1, page, D),
            lambda st, pi, ln, wb_, wh_, wi_, fr_, ls_, u=u: (
                _page_live(st, u, pi, ln, wb_, wh_, wi_), 0, 0))

    n_steps = max(max_pages // U, 1)

    def _gathered_scale_spec():
        # pre-gathered (B*Hkv*n_steps, 1, span): ONE window per step
        # (2U page-scattered (1, 1, page) windows abort the dynamic
        # grid at runtime — see the paged_attention layout note)
        return pl.BlockSpec(
            (1, 1, span),
            lambda st, pi, ln, wb_, wh_, wi_, fr_, ls_: (
                (wb_[st] * Hkv + wh_[st]) * n_steps + wi_[st], 0, 0))

    def _bh_spec():
        return pl.BlockSpec(
            (1, 1, G, D),
            lambda st, pi, ln, wb_, wh_, wi_, fr_, ls_: (
                wb_[st], wh_[st], 0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(W,),
        in_specs=(
            [_bh_spec()]
            + [_slot_spec(u) for u in range(U)]     # k slots
            + [_slot_spec(u) for u in range(U)]     # v slots
            + ([_gathered_scale_spec()] * 2 if quant else [])
        ),
        out_specs=_bh_spec(),
        scratch_shapes=[
            pltpu.VMEM((G, 128), jnp.float32),
            pltpu.VMEM((G, 128), jnp.float32),
            pltpu.VMEM((G, D), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, D), qg.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
        name=f"paged_attn_live_g{G}_p{page}_u{U}"
        + ("_q8" if quant else ""),
    )(pi_h, lengths, wb, wh, wi, first, last, qg,
      *([kf] * U), *([vf] * U),
      *([ksf, vsf] if quant else []))


def paged_attention_chunked(q, k_pages, v_pages, page_indices, lengths,
                            starts, sm_scale: Optional[float] = None,
                            interpret: bool = False,
                            bucket_pages: bool = True,
                            unroll: int = 8,
                            k_scales=None, v_scales=None,
                            layer: int = 0):
    """CHUNKED-query decode: C query tokens per sequence attend the
    paged KV cache with causal masking inside the chunk. The verify
    pass of speculative decoding and the building block of chunked
    prefill — one kernel sweep scores a whole proposed extension
    instead of C sequential decode steps.

    q:       (B, H, C, D)  queries at positions starts[b]..starts[b]+C-1
    starts:  (B,) int32    chunk start positions
    lengths: (B,) int32    valid KV INCLUDING the chunk (the chunk's
                           K/V must already be written to the pages)
    -> (B, H, C, D)

    GQA rows pack as (G*C) sublanes per kv head: row r = g*C + i holds
    query token i of group-head g; one row-dependent mask serves the
    whole tile (kv_pos <= starts[b] + r%C).
    """
    import jax.numpy as jnp

    B, H, C, D = q.shape
    if k_pages.ndim == 5:   # stacked whole-model pool + layer rebase
        nl, Hkv, P, page, _ = k_pages.shape
        head_base = layer * Hkv
        k_pages = k_pages.reshape(nl * Hkv, P, page, D)
        v_pages = v_pages.reshape(nl * Hkv, P, page, D)
        if k_scales is not None:
            k_scales = k_scales.reshape(nl * Hkv, P, page)
            v_scales = v_scales.reshape(nl * Hkv, P, page)
    else:
        head_base = 0
        Hkv, P, page, _ = k_pages.shape
    G = H // Hkv
    scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(D)
    # (B, Hkv, G, C, D) -> (B, Hkv, G*C, D): row r = g*C + i
    qg = q.reshape(B, Hkv, G, C, D).reshape(B, Hkv, G * C, D)
    if bucket_pages:
        mb = pages_bucket(page_indices.shape[1])
        if mb != page_indices.shape[1]:
            page_indices = jnp.pad(
                page_indices, ((0, 0), (0, mb - page_indices.shape[1])))
    kf = k_pages.reshape(-1, page, D)
    vf = v_pages.reshape(-1, page, D)
    assert (k_scales is None) == (v_scales is None)
    max_pages = page_indices.shape[1]
    while unroll > 1 and max_pages % unroll:
        unroll //= 2
    heads = (head_base
             + jnp.arange(Hkv, dtype=page_indices.dtype)) * P
    pi_h = (page_indices[:, None, :] + heads[None, :, None])
    ksf = vsf = None
    if k_scales is not None:
        # pre-gathered table-order scale windows: see paged_attention
        ksf = _gather_scales(k_scales, pi_h, page, unroll)
        vsf = _gather_scales(v_scales, pi_h, page, unroll)
    out = _paged_chunked_call(qg, kf, vf, pi_h, lengths, starts, scale,
                              interpret, G, C, page, max_pages, unroll,
                              ksf, vsf)
    # (B, Hkv, G*C, D) -> (B, H, C, D)
    return out.reshape(B, Hkv, G, C, D).reshape(B, H, C, D)


@functools.partial(jax.jit, static_argnames=(
    "sm_scale", "interpret", "G", "C", "page", "max_pages", "unroll"))
def _paged_chunked_call(qg, kf, vf, pi_h, lengths, starts, sm_scale,
                        interpret, G, C, page, max_pages, unroll=1,
                        ksf=None, vsf=None):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Hkv, GC, D = qg.shape
    U = unroll
    span = U * page
    quant = ksf is not None

    def kernel(pi_ref, len_ref, st_ref, q_ref, *refs):
        k_refs = refs[:U]
        v_refs = refs[U:2 * U]
        n_in = 2 * U + (2 if quant else 0)
        ks_ref = refs[2 * U] if quant else None
        vs_ref = refs[2 * U + 1] if quant else None
        o_ref, m_sc, l_sc, acc_sc = refs[n_in:]
        b = pl.program_id(0)
        i = pl.program_id(2)

        @pl.when(i == 0)
        def _init():
            m_sc[...] = jnp.full_like(m_sc, -jnp.inf)
            l_sc[...] = jnp.zeros_like(l_sc)
            acc_sc[...] = jnp.zeros_like(acc_sc)

        start = st_ref[b]

        @pl.when(i * span <= start + C - 1)
        def _run():
            qt = q_ref[0, 0]                              # (GC, D)
            kt = jnp.concatenate([r[0] for r in k_refs], axis=0)
            if quant:
                kt = kt.astype(jnp.float32)
            s = jax.lax.dot_general(
                qt, kt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)       # (GC, span)
            s = s * (sm_scale * 1.4426950408889634)       # base-2
            if quant:
                s = s * ks_ref[0]   # pre-gathered (1, span) window
            pos = jax.lax.broadcasted_iota(jnp.int32, (GC, span), 1) \
                + i * span
            # row r = g*C + tok: its query position is start + r%C
            prow = start + jax.lax.broadcasted_iota(
                jnp.int32, (GC, span), 0) % C
            s = jnp.where(pos <= prow, s, DEFAULT_MASK_VALUE)

            m_prev, l_prev = m_sc[...], l_sc[...]
            m_curr = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp2(m_prev - m_next)
            p = jnp.exp2(s - m_next[:, :1])
            l_sc[...] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
            m_sc[...] = m_next
            vt = jnp.concatenate([r[0] for r in v_refs], axis=0)
            if quant:
                acc_sc[...] = acc_sc[...] * alpha[:, :1] + jax.lax.dot(
                    p * vs_ref[0], vt.astype(jnp.float32),
                    preferred_element_type=jnp.float32)
            else:
                acc_sc[...] = acc_sc[...] * alpha[:, :1] + jax.lax.dot(
                    p.astype(vt.dtype), vt,
                    preferred_element_type=jnp.float32)

        @pl.when(i == max_pages // U - 1)
        def _done():
            l = l_sc[...][:, :1]
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            o_ref[0, 0] = (acc_sc[...] * l_inv).astype(o_ref.dtype)

    def _slot_spec(u):
        return pl.BlockSpec((1, page, D),
                            lambda b, h, i, pi, ln, st, u=u: (_kv_page(
                                b, h, i * U + u, pi, ln, page), 0, 0))

    n_steps = max_pages // U

    def _gathered_scale_spec():
        # pre-gathered (B*Hkv*n_steps, 1, span): ONE window per step
        return pl.BlockSpec(
            (1, 1, span),
            lambda b, h, i, pi, ln, st: (
                (b * Hkv + h) * n_steps + i, 0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, Hkv, max_pages // U),
        in_specs=(
            [pl.BlockSpec((1, 1, GC, D),
                          lambda b, h, i, pi, ln, st: (b, h, 0, 0))]
            + [_slot_spec(u) for u in range(U)]
            + [_slot_spec(u) for u in range(U)]
            + ([_gathered_scale_spec()] * 2 if quant else [])
        ),
        out_specs=pl.BlockSpec((1, 1, GC, D),
                               lambda b, h, i, pi, ln, st: (b, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((GC, 128), jnp.float32),
            pltpu.VMEM((GC, 128), jnp.float32),
            pltpu.VMEM((GC, D), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, GC, D), qg.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
        name=f"paged_attn_chunk{C}_g{G}_p{page}_u{U}"
        + ("_q8" if quant else ""),
    )(pi_h, lengths, starts, qg, *([kf] * U), *([vf] * U),
      *([ksf, vsf] if quant else []))


def quantize_kv(pages):
    """Symmetric per-(token, head) int8: (Hkv, P, page, D) float ->
    (int8 values, (Hkv, P, page) f32 scales). The granularity the
    kernel's column-folded dequant expects — one scale per KV position,
    so quantizing a page never rescales previously written tokens."""
    import jax.numpy as jnp

    f = pages.astype(jnp.float32)
    amax = jnp.max(jnp.abs(f), axis=-1)
    scales = jnp.where(amax == 0, 1.0, amax / 127.0)
    q = jnp.round(f / scales[..., None])
    return q.astype(jnp.int8), scales


def paged_attention_reference(q, k_pages, v_pages, page_indices, lengths,
                              sm_scale: Optional[float] = None):
    """XLA oracle: gathers pages into contiguous KV then does plain
    masked attention."""
    import jax.numpy as jnp

    B, H, D = q.shape
    Hkv, P, page, _ = k_pages.shape
    G = H // Hkv
    scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(D)
    max_pages = page_indices.shape[1]
    S = max_pages * page
    k = k_pages[:, page_indices].transpose(1, 0, 2, 3, 4).reshape(
        B, Hkv, S, D)
    v = v_pages[:, page_indices].transpose(1, 0, 2, 3, 4).reshape(
        B, Hkv, S, D)
    qg = q.reshape(B, Hkv, G, D).astype(jnp.float32)
    s = jnp.einsum("bhgd,bhsd->bhgs", qg, k.astype(jnp.float32)) * scale
    pos = jnp.arange(S)[None, None, None, :]
    s = jnp.where(pos < lengths[:, None, None, None], s,
                  DEFAULT_MASK_VALUE)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhgs,bhsd->bhgd", p, v.astype(jnp.float32))
    return o.reshape(B, H, D).astype(q.dtype)
