"""Serving showcase: llama decode over a paged KV cache.

Demonstrates the full serving path: prefill into pages, batched greedy
decode through ops.paged_attention (scalar-prefetched block tables),
and CONTINUOUS BATCHING — the native PageAllocator (csrc page_pool_*)
owns the physical pages; requests are admitted into freed batch slots,
grow page-by-page, and release under pool backpressure, vLLM-style.
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


def continuous_batching():
    """8 requests of different target lengths through 4 batch slots over
    a 6-page physical pool: the allocator hands out pages as sequences
    grow, slots recycle when a request finishes, and tight pool pressure
    stalls admissions or PREEMPTS growing sequences (release + requeue
    for recompute) until space frees - vLLM's policy."""
    import jax
    import jax.numpy as jnp

    from cubecl_tpu.runtime.pages import PageAllocator

    cfg = llama.LlamaConfig(vocab=256, d_model=256, n_heads=4,
                            n_kv_heads=2, n_layers=2, d_ff=512, seq=64)
    params = llama.init_params(cfg)

    B, page, table_w, total_pages = 4, 128, 2, 6
    alloc = PageAllocator(total_pages, page)
    assert alloc.admit(-1, 1)       # parking page for stalled slots
    cache = llama.init_kv_cache(cfg, B, table_w, page=page,
                                num_pages=total_pages)
    park_row = alloc.block_table([-1], table_w)[0]

    # request queue: (id, target generated length)
    todo = [(i, 40 + 45 * (i % 4)) for i in range(8)]
    target = dict(todo)
    remaining = {}
    slots = [None] * B                  # slot -> request id
    step_fn = jax.jit(lambda p, c, t: llama.decode_step(p, c, t, cfg))
    tok = jnp.zeros((B,), jnp.int32)
    finished, stalls, preempts, steps = 0, 0, 0, 0

    print(f"native allocator: {alloc.native}; pool {total_pages} pages")
    while finished < 8:
        # admit into free slots (pool permitting)
        for s in range(B):
            if slots[s] is None and todo:
                rid, tgt = todo[0]
                if alloc.admit(rid, 1):
                    todo.pop(0)
                    slots[s] = rid
                    remaining[rid] = tgt
                else:
                    stalls += 1     # pool full: request waits
        # assemble table + lengths (parked rows for empty slots)
        rows, lens = [], []
        for s in range(B):
            if slots[s] is None:
                rows.append(park_row)
                lens.append(0)
            else:
                rows.append(alloc.block_table([slots[s]], table_w)[0])
                lens.append(alloc.lengths[slots[s]] - 1)  # next write pos
        cache = dict(cache,
                     page_indices=jnp.asarray(np.stack(rows)),
                     lengths=jnp.asarray(np.array(lens, np.int32)))
        logits, cache = step_fn(params, cache, tok)
        steps += 1
        # book the generated token; finish + recycle slots
        for s in range(B):
            rid = slots[s]
            if rid is None:
                continue
            remaining[rid] -= 1
            if remaining[rid] <= 0:
                alloc.release(rid)
                slots[s] = None
                finished += 1
            elif not alloc.extend(rid, 1):
                # pool exhausted mid-flight: PREEMPT - release the pages
                # and requeue for recompute (vLLM's preemption policy)
                alloc.release(rid)
                todo.insert(0, (rid, target[rid]))
                slots[s] = None
                preempts += 1
    print(f"8 requests served in {steps} batched steps; "
          f"{stalls} admission stalls, {preempts} preemptions under "
          f"pool pressure; free pages at end: "
          f"{alloc.num_free_pages()}/{total_pages}")


if __name__ == "__main__":
    main()
    continuous_batching()
