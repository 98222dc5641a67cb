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


def paged_attention(q, k_pages, v_pages, page_indices, lengths,
                    sm_scale: Optional[float] = None,
                    interpret: bool = False):
    """Decode attention over a paged KV cache.

    q:            (B, H, D)            one query vector per head
    k_pages/v_pages: (H_kv, P, page_size, D)  the global page pools
    page_indices: (B, max_pages) int32 block table (page ids within a
                  head's pool; same table for every kv head)
    lengths:      (B,) int32 current sequence lengths
    -> (B, H, D)
    """
    import jax.numpy as jnp

    B, H, D = q.shape
    Hkv, P, page, _ = k_pages.shape
    assert H % Hkv == 0
    G = H // Hkv
    scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(D)
    qg = q.reshape(B, Hkv, G, D)
    # flatten (head, page) so one scalar table drives the DMA per head:
    # the kernel runs per (b, h) and the index_map rebases into head h's
    # pool — fold the head into the leading page axis
    kf = k_pages.reshape(Hkv * P, page, D)
    vf = v_pages.reshape(Hkv * P, page, D)
    max_pages = page_indices.shape[1]
    # per-head rebased tables: head h uses pi + h*P
    heads = jnp.arange(Hkv, dtype=page_indices.dtype) * P
    pi_h = (page_indices[:, None, :] + heads[None, :, None])  # (B,Hkv,mp)

    out = _paged_call_headed(qg, kf, vf, pi_h, lengths, scale, interpret,
                             G, page, max_pages)
    return out.reshape(B, H, D)


@functools.partial(jax.jit, static_argnames=(
    "sm_scale", "interpret", "G", "page", "max_pages"))
def _paged_call_headed(qg, kf, vf, pi_h, lengths, sm_scale, interpret,
                       G, page, max_pages):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Hkv, _G, D = qg.shape

    def kernel(pi_ref, len_ref, q_ref, k_ref, v_ref, o_ref,
               m_sc, l_sc, acc_sc):
        b = pl.program_id(0)
        i = pl.program_id(2)

        @pl.when(i == 0)
        def _init():
            m_sc[...] = jnp.full_like(m_sc, -jnp.inf)
            l_sc[...] = jnp.zeros_like(l_sc)
            acc_sc[...] = jnp.zeros_like(acc_sc)

        seq_len = len_ref[b]

        @pl.when(i * page < seq_len)
        def _run():
            qt = q_ref[0, 0].astype(jnp.float32)          # (G, D)
            kt = k_ref[0].astype(jnp.float32)             # (page, D)
            s = jax.lax.dot_general(
                qt, kt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)       # (G, page)
            if sm_scale != 1.0:
                s = s * sm_scale
            pos = jax.lax.broadcasted_iota(jnp.int32, (G, page), 1) \
                + i * page
            s = jnp.where(pos < seq_len, s, DEFAULT_MASK_VALUE)

            m_prev, l_prev = m_sc[...], l_sc[...]
            m_curr = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s - m_next[:, :1])
            l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
            m_sc[...] = m_next
            l_sc[...] = l_next
            vt = v_ref[0].astype(jnp.float32)
            acc_sc[...] = acc_sc[...] * alpha[:, :1] + jax.lax.dot(
                p, vt, preferred_element_type=jnp.float32)

        @pl.when(i == max_pages - 1)
        def _done():
            l = l_sc[...][:, :1]
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            o_ref[0, 0] = (acc_sc[...] * l_inv).astype(o_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, Hkv, max_pages),
        in_specs=[
            pl.BlockSpec((1, 1, G, D), lambda b, h, i, pi, ln: (b, h, 0, 0)),
            pl.BlockSpec((1, page, D),
                         lambda b, h, i, pi, ln: (pi[b, h, i], 0, 0)),
            pl.BlockSpec((1, page, D),
                         lambda b, h, i, pi, ln: (pi[b, h, i], 0, 0)),
        ],
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
            dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        interpret=interpret,
        name=f"paged_attn_g{G}_p{page}",
    )(pi_h, lengths, qg, kf, vf)


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
