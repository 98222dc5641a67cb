"""Serving showcase: llama decode over a paged KV cache.

Demonstrates the full serving path: prefill into pages, batched greedy
decode through ops.paged_attention (scalar-prefetched block tables),
and the continuous-batching bookkeeping (per-sequence lengths).
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

from cubecl_tpu.models import llama


def main():
    import jax.numpy as jnp

    cfg = llama.LlamaConfig(vocab=256, d_model=256, n_heads=4, n_kv_heads=2,
                            n_layers=2, d_ff=512, seq=64)
    params = llama.init_params(cfg)

    B, S, steps = 4, 12, 8
    prompt = jnp.asarray(
        np.random.randint(0, cfg.vocab, (B, S)).astype(np.int32))

    t0 = time.perf_counter()
    tokens = llama.generate(params, prompt, steps, cfg, max_pages=2)
    dt = time.perf_counter() - t0
    print(f"batch={B} prompt={S} generated={steps} tokens "
          f"in {dt:.2f}s (untuned eager loop)")
    print(np.asarray(tokens))

    # the decode step alone, for latency feel
    cache = llama.init_kv_cache(cfg, B, max_pages=2)
    for t in range(S):
        logits, cache = llama.decode_step(params, cache, prompt[:, t], cfg)
    t0 = time.perf_counter()
    logits, cache = llama.decode_step(
        params, cache, jnp.argmax(logits, -1).astype(jnp.int32), cfg)
    logits.block_until_ready()
    print(f"one decode step: {(time.perf_counter()-t0)*1e3:.1f} ms "
          f"(python-loop overhead included; jit the step for production)")


if __name__ == "__main__":
    main()
