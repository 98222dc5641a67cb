"""The attention family: dense flash, sliding-window, block-sparse
(all differentiable) and paged-KV decode — the four shapes attention
takes in training and serving.

Runs in interpret mode off-TPU; on a real chip drop interpret=True.
All kernels share the base-2 online-softmax core (see
cubecl_tpu/ops/attention.py module notes for the measured physics).
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def launch():
    import jax
    import jax.numpy as jnp

    from cubecl_tpu.ops.attention import (
        flash_attention,
        flash_attention_block_sparse,
        flash_attention_local,
    )
    from cubecl_tpu.ops.paged_attention import paged_attention

    interp = jax.default_backend() != "tpu"
    B, H, S, D = 1, 2, 512, 128
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, H, S, D).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.randn(B, H, S, D).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.randn(B, H, S, D).astype(np.float32))

    # 1. dense causal flash — the training kernel (custom_vjp)
    loss = lambda q, k, v: jnp.sum(
        flash_attention(q, k, v, True, None, 128, 128, interp) ** 2)
    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    print(f"dense flash: loss grads ok, |dq|max={float(jnp.abs(dq).max()):.3f}")

    # 2. sliding-window (banded): cost ~ S*window, off-band tiles skip
    # both MXU matmuls whole
    o_local = flash_attention_local(q, k, v, left=128, right=0,
                                    block_q=128, block_k=128,
                                    interpret=interp)
    print(f"sliding-window(128): out[0,0,0,:2]={np.asarray(o_local)[0,0,0,:2]}")

    # 3. block-sparse: an arbitrary tile mask (here: local + a global
    # first tile, BigBird-style); schedule is scalar-prefetched, cost
    # and GRADIENTS are O(nnz)
    nt = S // 128
    bm = np.zeros((nt, nt), bool)
    for i in range(nt):
        bm[i, max(0, i - 1):i + 1] = True   # local band
        bm[i, 0] = True                      # global tile
    o_bsp = flash_attention_block_sparse(q, k, v, bm, True, None,
                                         128, 128, interp)
    g = jax.grad(lambda q: jnp.sum(flash_attention_block_sparse(
        q, k, v, bm, True, None, 128, 128, interp)))(q)
    print(f"block-sparse (nnz={int(bm.sum())}/{nt*nt} tiles): "
          f"grad |dq|max={float(jnp.abs(g).max()):.3f}")

    # 4. paged-KV decode — the serving kernel: one query vector per
    # sequence attends scattered KV pages via a block table
    Hkv, pages, page = 2, 4, 128
    kp = jnp.asarray(rng.randn(Hkv, pages, page, D).astype(np.float32) * .3)
    vp = jnp.asarray(rng.randn(Hkv, pages, page, D).astype(np.float32))
    table = jnp.asarray(np.tile(np.arange(pages, dtype=np.int32), (B, 1)))
    lengths = jnp.asarray(np.full((B,), 300, np.int32))
    qd = jnp.asarray(rng.randn(B, H, D).astype(np.float32) * 0.3)
    od = paged_attention(qd, kp, vp, table, lengths, interpret=interp)
    print(f"paged decode (ctx=300 over {pages} pages): "
          f"out[0,0,:2]={np.asarray(od)[0,0,:2]}")


if __name__ == "__main__":
    launch()
