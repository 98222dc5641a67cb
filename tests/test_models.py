"""Flagship model + graft entry checks."""

import importlib.util
import os

import numpy as np
import pytest


def _load_entry():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_forward_shapes():
    import jax

    from cubecl_tpu.models import TransformerConfig, forward, init_params

    cfg = TransformerConfig(vocab=64, d_model=32, n_heads=2, n_layers=1,
                            d_ff=64, seq=16)
    params = init_params(cfg)
    tokens = np.random.randint(0, 64, (3, 16)).astype(np.int32)
    logits = jax.jit(lambda p, t: forward(p, t, cfg))(params, tokens)
    assert logits.shape == (3, 16, 64)
    assert np.isfinite(np.asarray(logits)).all()


def test_train_step_reduces_loss():
    import jax

    from cubecl_tpu.models import (
        TransformerConfig,
        init_params,
        make_train_step,
    )

    cfg = TransformerConfig(vocab=32, d_model=32, n_heads=2, n_layers=1,
                            d_ff=64, seq=16)
    params = init_params(cfg)
    step = jax.jit(make_train_step(cfg, lr=0.1))
    tokens = np.random.randint(0, 32, (4, 16)).astype(np.int32)
    losses = []
    for _ in range(5):
        params, loss = step(params, tokens)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_graft_entry_single():
    import jax

    mod = _load_entry()
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == args[1].shape[0]
    assert np.isfinite(np.asarray(out)).all()


def test_graft_dryrun_multichip():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mod = _load_entry()
    mod.dryrun_multichip(8)


def test_sharded_step_matches_single():
    """tp/dp sharded training step must match the unsharded numerics."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from cubecl_tpu.models import (
        TransformerConfig,
        init_params,
        make_sharded_train_step,
        make_train_step,
    )
    from cubecl_tpu.parallel import make_mesh

    cfg = TransformerConfig(vocab=32, d_model=32, n_heads=2, n_layers=1,
                            d_ff=64, seq=16)
    tokens = np.random.randint(0, 32, (4, 16)).astype(np.int32)
    params = init_params(cfg)
    _, loss_ref = jax.jit(make_train_step(cfg, lr=0.1))(params, tokens)

    mesh = make_mesh({"dp": 2, "tp": 2}, jax.devices()[:4])
    jstep, pshard, dshard = make_sharded_train_step(cfg, mesh, lr=0.1)
    p2 = jax.device_put(init_params(cfg), pshard)
    t2 = jax.device_put(tokens, dshard)
    _, loss_sh = jstep(p2, t2)
    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-5)


# ---------------------------------------------------------------- llama


def test_llama_forward_and_train():
    import jax.numpy as jnp

    from cubecl_tpu.models import llama

    cfg = llama.LlamaConfig(vocab=64, d_model=32, n_heads=4, n_kv_heads=2,
                            n_layers=2, d_ff=64, seq=16)
    params = llama.init_params(cfg)
    tokens = jnp.arange(2 * 16, dtype=jnp.int32).reshape(2, 16) % 64
    logits = llama.forward(params, tokens, cfg)
    assert logits.shape == (2, 16, 64)
    step = llama.make_train_step(cfg)
    p1, l1 = step(params, tokens)
    p2, l2 = step(p1, tokens)
    assert float(l2) < float(l1)  # loss decreases on repeated batch


def test_llama_remat_matches():
    """cfg.remat (per-layer jax.checkpoint) must be value- AND
    grad-identical to the plain forward — only memory changes."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cubecl_tpu.models import llama

    base = dict(vocab=64, d_model=32, n_heads=4, n_kv_heads=2,
                n_layers=2, d_ff=64, seq=16)
    cfg0 = llama.LlamaConfig(**base)
    cfg1 = llama.LlamaConfig(**base, remat=True)
    params = llama.init_params(cfg0)
    tokens = jnp.arange(2 * 16, dtype=jnp.int32).reshape(2, 16) % 64
    f0 = llama.forward(params, tokens, cfg0)
    f1 = llama.forward(params, tokens, cfg1)
    np.testing.assert_allclose(np.asarray(f0), np.asarray(f1),
                               rtol=1e-6, atol=1e-6)
    l0, g0 = jax.value_and_grad(llama.loss_fn)(params, tokens, cfg0)
    l1, g1 = jax.value_and_grad(llama.loss_fn)(params, tokens, cfg1)
    assert abs(float(l0) - float(l1)) < 1e-6
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_llama_causality():
    """Changing a future token must not change past logits (RoPE + causal
    mask correctness)."""
    import numpy as np
    import jax.numpy as jnp

    from cubecl_tpu.models import llama

    cfg = llama.LlamaConfig(vocab=64, d_model=32, n_heads=4, n_kv_heads=2,
                            n_layers=1, d_ff=64, seq=8)
    params = llama.init_params(cfg)
    t1 = jnp.zeros((1, 8), jnp.int32)
    t2 = t1.at[0, 7].set(5)
    l1 = llama.forward(params, t1, cfg)
    l2 = llama.forward(params, t2, cfg)
    np.testing.assert_allclose(np.asarray(l1[0, :7]), np.asarray(l2[0, :7]),
                               atol=1e-6)


def test_llama_moe():
    import jax.numpy as jnp

    from cubecl_tpu.models import llama

    cfg = llama.LlamaConfig(vocab=64, d_model=32, n_heads=4, n_kv_heads=4,
                            n_layers=1, d_ff=32, seq=8, n_experts=4,
                            top_k=2)
    params = llama.init_params(cfg)
    tokens = jnp.ones((2, 8), jnp.int32)
    logits = llama.forward(params, tokens, cfg)
    assert logits.shape == (2, 8, 64)
    step = llama.make_train_step(cfg)
    p1, l1 = step(params, tokens)
    assert jnp.isfinite(l1)


def test_llama_sharded_train_step():
    """dp x tp x ep mesh: full MoE train step with NamedShardings."""
    import jax
    import jax.numpy as jnp

    from cubecl_tpu.models import llama

    devs = jax.devices()[:8]
    mesh = jax.sharding.Mesh(
        np.array(devs).reshape(2, 2, 2), ("dp", "tp", "ep"))
    cfg = llama.LlamaConfig(vocab=64, d_model=32, n_heads=4, n_kv_heads=2,
                            n_layers=1, d_ff=32, seq=8, n_experts=2,
                            top_k=1)
    with mesh:
        jstep, pshard, dshard = llama.make_sharded_train_step(cfg, mesh)
        params = jax.device_put(llama.init_params(cfg), pshard)
        tokens = jax.device_put(
            jnp.ones((4, 8), jnp.int32), dshard)
        p1, loss = jstep(params, tokens)
        assert jnp.isfinite(loss)


def test_llama_flash_attention_path():
    """use_flash_attention with non-tile head_dim/seq (padded kernel)."""
    import numpy as np
    import jax.numpy as jnp

    from cubecl_tpu.models import llama

    base = dict(vocab=64, d_model=64, n_heads=2, n_kv_heads=1, n_layers=1,
                d_ff=64, seq=24)
    tokens = jnp.arange(2 * 24, dtype=jnp.int32).reshape(2, 24) % 64
    cfg0 = llama.LlamaConfig(**base, use_flash_attention=False)
    cfg1 = llama.LlamaConfig(**base, use_flash_attention=True)
    params = llama.init_params(cfg0)
    l0 = llama.forward(params, tokens, cfg0)
    l1 = llama.forward(params, tokens, cfg1)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1),
                               atol=2e-5, rtol=1e-4)


def test_llama_paged_decode_matches_forward():
    """Serving path: paged-KV decode reproduces the batched forward's
    logits position by position (RoPE + cache writes + paged attention)."""
    import numpy as np
    import jax.numpy as jnp

    from cubecl_tpu.models import llama

    cfg = llama.LlamaConfig(vocab=64, d_model=128, n_heads=2, n_kv_heads=1,
                            n_layers=2, d_ff=64, seq=8)
    params = llama.init_params(cfg)
    B, S = 2, 6
    prompt = jnp.asarray(np.random.randint(0, 64, (B, S)).astype(np.int32))
    cache = llama.init_kv_cache(cfg, B, max_pages=2, page=128)
    dec = []
    for t in range(S):
        lg, cache = llama.decode_step(params, cache, prompt[:, t], cfg)
        dec.append(lg)
    dec = jnp.stack(dec, axis=1)
    full = llama.forward(params, prompt, cfg)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(full),
                               atol=2e-4, rtol=1e-3)
    toks = llama.generate(params, prompt, 3, cfg, max_pages=2)
    assert toks.shape == (B, 3)


def test_pipeline_parallel_forward():
    """GPipe pp over shard_map/ppermute matches the plain forward."""
    import jax
    import jax.numpy as jnp

    from cubecl_tpu.models import pipeline as pl
    from cubecl_tpu.models import transformer as tr

    cfg = tr.TransformerConfig(vocab=64, d_model=32, n_heads=2, n_layers=4,
                               d_ff=64, seq=16)
    params = tr.init_params(cfg)
    tokens = jnp.asarray(
        np.random.randint(0, 64, (8, 16)).astype(np.int32))
    ref = tr.forward(params, tokens, cfg)
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:4]), ("pp",))
    stacked = pl.stack_layer_params(cfg, params)
    fwd = pl.make_pipelined_forward(cfg, mesh, n_micro=4)
    with mesh:
        got = fwd(stacked, tokens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


# ------------------------------------------------------------------ vit


def test_vit_forward_and_train():
    import jax.numpy as jnp

    from cubecl_tpu.models import vit

    cfg = vit.ViTConfig(image=16, patch=4, channels=3, d_model=32,
                        n_heads=2, n_layers=2, d_ff=64, n_classes=10)
    params = vit.init_params(cfg)
    imgs = jnp.asarray(np.random.rand(4, 16, 16, 3).astype(np.float32))
    labels = jnp.asarray(np.array([0, 3, 7, 9], np.int32))
    logits = vit.forward(params, imgs, cfg)
    assert logits.shape == (4, 10)
    step = vit.make_train_step(cfg, lr=0.05)
    p, l1 = step(params, imgs, labels)
    for _ in range(4):
        p, l2 = step(p, imgs, labels)
    assert float(l2) < float(l1)


def test_vit_sharded_train_step():
    import jax
    import jax.numpy as jnp

    from cubecl_tpu.models import vit

    mesh = jax.sharding.Mesh(
        np.array(jax.devices()[:4]).reshape(2, 2), ("dp", "tp"))
    cfg = vit.ViTConfig(image=16, patch=4, channels=3, d_model=32,
                        n_heads=2, n_layers=1, d_ff=64, n_classes=10)
    with mesh:
        jstep, pshard, ishard = vit.make_sharded_train_step(cfg, mesh)
        params = jax.device_put(vit.init_params(cfg), pshard)
        imgs = jax.device_put(
            jnp.asarray(np.random.rand(4, 16, 16, 3).astype(np.float32)),
            ishard)
        labels = jax.device_put(jnp.zeros((4,), jnp.int32), ishard)
        _, loss = jstep(params, imgs, labels)
        assert jnp.isfinite(loss)


def test_llama_decode_no_recompile_across_contexts():
    """Round-2 verdict item 1 'Done' criterion: decode across growing
    context lengths compiles a BOUNDED number of kernels. With a fixed-
    capacity paged cache the shapes are static (1 compile for the whole
    session); crossing page boundaries must not add variants."""
    import jax
    import jax.numpy as jnp

    from cubecl_tpu.models import llama
    import importlib

    # ops/__init__ re-exports the FUNCTION under the submodule's name;
    # fetch the module itself for its _TRACE_COUNT diagnostic
    pa = importlib.import_module("cubecl_tpu.ops.paged_attention")

    cfg = llama.LlamaConfig(vocab=64, d_model=64, n_heads=2, n_kv_heads=1,
                            n_layers=1, d_ff=64, seq=32,
                            use_framework_kernels=False)
    params = llama.init_params(cfg)
    B, page, max_pages = 2, 8, 4  # capacity 32 tokens
    cache = llama.init_kv_cache(cfg, B, max_pages, page)
    t0 = pa._TRACE_COUNT
    step = jax.jit(lambda p, c, t: llama.decode_step(p, c, t, cfg))
    tok = jnp.zeros((B,), jnp.int32)
    # 18 steps: crosses two page boundaries (8, 16)
    for _ in range(18):
        logits, cache = step(params, cache, tok)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
    assert np.isfinite(np.asarray(logits)).all()
    # one paged-attention variant for the whole growing-context session
    assert pa._TRACE_COUNT - t0 <= 1, pa._TRACE_COUNT - t0
    # <=2: XLA may specialize the first call's fresh-buffer layouts;
    # the growing context itself adds NO variants (the verdict's
    # '<=2 kernels per family' criterion)
    assert step._cache_size() <= 2, step._cache_size()


def test_prefill_matches_token_by_token(client):
    """Batched prefill (one forward, paged KV scatter) is numerically
    identical to S sequential decode steps — same cache pools, same
    logits, and the continuations stay identical."""
    import jax
    import jax.numpy as jnp

    from cubecl_tpu.models import llama

    cfg = llama.LlamaConfig(vocab=64, d_model=64, n_heads=2, n_kv_heads=1,
                            n_layers=2, d_ff=128, seq=32,
                            use_flash_attention=False,
                            use_framework_kernels=False)
    params = llama.init_params(cfg, seed=2)
    B, S, page = 2, 20, 16          # S crosses a page boundary mid-page
    rng = np.random.RandomState(0)
    prompt = jnp.asarray(rng.randint(0, cfg.vocab, (B, S)), jnp.int32)

    c1 = llama.init_kv_cache(cfg, B, 4, page)
    lg1, c1 = llama.prefill(params, c1, prompt, cfg)

    c2 = llama.init_kv_cache(cfg, B, 4, page)
    lg2 = None
    for t in range(S):
        lg2, c2 = llama.decode_step(params, c2, prompt[:, t], cfg)

    np.testing.assert_allclose(np.asarray(lg1), np.asarray(lg2),
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(c1["lengths"]),
                                  np.asarray(c2["lengths"]))
    np.testing.assert_allclose(np.asarray(c1["k"]), np.asarray(c2["k"]),
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(c1["v"]), np.asarray(c2["v"]),
                               atol=2e-5, rtol=1e-5)

    # continuations agree for 3 greedy steps
    t1 = jnp.argmax(lg1, -1).astype(jnp.int32)
    t2 = jnp.argmax(lg2, -1).astype(jnp.int32)
    for _ in range(3):
        lg1, c1 = llama.decode_step(params, c1, t1, cfg)
        lg2, c2 = llama.decode_step(params, c2, t2, cfg)
        t1 = jnp.argmax(lg1, -1).astype(jnp.int32)
        t2 = jnp.argmax(lg2, -1).astype(jnp.int32)
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


def test_llama_int8_kv_cache(client):
    """int8 paged KV: decode matches the f32 cache within the int8
    error budget, and batched prefill matches token-by-token decode in
    quantized mode (same per-token quantization formula)."""
    import dataclasses

    import jax.numpy as jnp

    from cubecl_tpu.models import llama

    cfg = llama.LlamaConfig(vocab=64, d_model=64, n_heads=2, n_kv_heads=1,
                            n_layers=2, d_ff=128, seq=32, kv_dtype="int8",
                            use_flash_attention=False,
                            use_framework_kernels=False)
    params = llama.init_params(cfg, seed=4)
    B, S, page = 2, 20, 16
    rng = np.random.RandomState(7)
    prompt = jnp.asarray(rng.randint(0, cfg.vocab, (B, S)), jnp.int32)

    # quantized stepwise vs quantized prefill: same numbers
    cq = llama.init_kv_cache(cfg, B, 4, page)
    assert cq["k"].dtype == jnp.int8 and "k_scales" in cq
    lq = None
    for t in range(S):
        lq, cq = llama.decode_step(params, cq, prompt[:, t], cfg)
    cp = llama.init_kv_cache(cfg, B, 4, page)
    lp, cp = llama.prefill(params, cp, prompt, cfg)
    # prefill quantizes EXACT attention outputs; stepwise attends the
    # already-quantized cache, so deeper layers diverge by ~1 int8 ulp.
    # Compare DEQUANTIZED caches and logits within the int8 budget.
    kd_p = np.asarray(cp["k"], np.float32) * np.asarray(
        cp["k_scales"])[..., None]
    kd_q = np.asarray(cq["k"], np.float32) * np.asarray(
        cq["k_scales"])[..., None]
    np.testing.assert_allclose(kd_p, kd_q, atol=0.02)
    frac = (np.asarray(cp["k"]) != np.asarray(cq["k"])).mean()
    assert frac < 0.05, frac
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lq),
                               atol=0.02)

    # vs the f32 cache: int8 error budget on logits
    cfg32 = dataclasses.replace(cfg, kv_dtype="")
    c32 = llama.init_kv_cache(cfg32, B, 4, page)
    l32 = None
    for t in range(S):
        l32, c32 = llama.decode_step(params, c32, prompt[:, t], cfg32)
    err = np.abs(np.asarray(lq) - np.asarray(l32)).max()
    assert err < 0.05, err


def test_speculative_decoding_exact(client):
    """Greedy speculative decoding reproduces the target-only greedy
    stream EXACTLY — with a weak independent draft (frequent
    rejections) and with draft == target (all-accepted fast path +
    bonus tokens + draft-cache sync)."""
    import jax.numpy as jnp

    from cubecl_tpu.models import llama

    cfg = llama.LlamaConfig(vocab=64, d_model=64, n_heads=2, n_kv_heads=1,
                            n_layers=2, d_ff=128, seq=32,
                            use_flash_attention=False,
                            use_framework_kernels=False)
    params = llama.init_params(cfg, seed=8)
    draft = llama.init_params(cfg, seed=9)      # independent weak draft
    B, S, steps = 2, 6, 10
    rng = np.random.RandomState(3)
    prompt = jnp.asarray(rng.randint(0, cfg.vocab, (B, S)), jnp.int32)

    want = np.asarray(llama.generate(params, prompt, steps, cfg,
                                     max_pages=2))

    for dparams, note in ((draft, "weak draft"), (params, "self-draft")):
        got, mean_acc = llama.speculative_generate(
            params, prompt, steps, cfg, dparams, cfg, gamma=3,
            max_pages=2)
        np.testing.assert_array_equal(np.asarray(got), want), note
        if dparams is params:
            assert mean_acc == 3.0   # greedy self-draft: always accepted


def test_decode_chunk_matches_sequential(client):
    """decode_chunk(C tokens) == C sequential decode_steps: same cache
    pools and logits (f32 and int8 KV modes)."""
    import dataclasses

    import jax.numpy as jnp

    from cubecl_tpu.models import llama

    base = llama.LlamaConfig(vocab=64, d_model=64, n_heads=2,
                             n_kv_heads=1, n_layers=2, d_ff=128, seq=32,
                             use_flash_attention=False,
                             use_framework_kernels=False)
    rng = np.random.RandomState(5)
    for kv_dtype, tol in (("", 3e-5), ("int8", 3e-5)):
        cfg = dataclasses.replace(base, kv_dtype=kv_dtype)
        params = llama.init_params(cfg, seed=6)
        B, C, page = 2, 5, 16
        toks = jnp.asarray(rng.randint(0, cfg.vocab, (B, 8)), jnp.int32)

        c1 = llama.init_kv_cache(cfg, B, 4, page)
        _, c1 = llama.prefill(params, c1, toks[:, :3], cfg)  # some ctx
        c2 = {k: v for k, v in c1.items()}

        lg1, c1 = llama.decode_chunk(params, c1, toks[:, 3:3 + C], cfg)
        lg2 = []
        for i in range(C):
            l2, c2 = llama.decode_step(params, c2, toks[:, 3 + i], cfg)
            lg2.append(l2)
        lg2 = jnp.stack(lg2, axis=1)
        np.testing.assert_allclose(np.asarray(lg1), np.asarray(lg2),
                                   atol=tol, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(c1["k"]),
                                   np.asarray(c2["k"]), atol=tol)
        np.testing.assert_array_equal(np.asarray(c1["lengths"]),
                                      np.asarray(c2["lengths"]))


def test_prefill_chunked_matches_prefill(client):
    """Chunked prefill (decode_chunk pieces) == one-shot batched
    prefill, including a chunk size that doesn't divide the prompt."""
    import jax.numpy as jnp

    from cubecl_tpu.models import llama

    cfg = llama.LlamaConfig(vocab=64, d_model=64, n_heads=2, n_kv_heads=1,
                            n_layers=2, d_ff=128, seq=32,
                            use_flash_attention=False,
                            use_framework_kernels=False)
    params = llama.init_params(cfg, seed=3)
    B, S, page = 2, 21, 16
    rng = np.random.RandomState(9)
    prompt = jnp.asarray(rng.randint(0, cfg.vocab, (B, S)), jnp.int32)

    c1 = llama.init_kv_cache(cfg, B, 4, page)
    l1, c1 = llama.prefill(params, c1, prompt, cfg)
    c2 = llama.init_kv_cache(cfg, B, 4, page)
    l2, c2 = llama.prefill_chunked(params, c2, prompt, cfg, chunk=8)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(c1["k"]), np.asarray(c2["k"]),
                               atol=3e-5)
    np.testing.assert_array_equal(np.asarray(c1["lengths"]),
                                  np.asarray(c2["lengths"]))


def test_llama_decode_tensor_parallel(client):
    """Paged decode under a tp mesh: the kernel runs per kv-head shard
    via shard_map and matches the unsharded step exactly (f32 + int8)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from cubecl_tpu.models import llama
    from cubecl_tpu.models.transformer import _use_mesh

    base = llama.LlamaConfig(vocab=64, d_model=64, n_heads=4,
                             n_kv_heads=2, n_layers=2, d_ff=128, seq=32,
                             use_flash_attention=False,
                             use_framework_kernels=False)
    devs = np.array(jax.devices()[:2]).reshape(2)
    mesh = Mesh(devs, ("tp",))
    rng = np.random.RandomState(11)
    for kv_dtype in ("", "int8"):
        cfg = dataclasses.replace(base, kv_dtype=kv_dtype)
        params = llama.init_params(cfg, seed=12)
        B, page = 2, 16
        prompt = jnp.asarray(rng.randint(0, cfg.vocab, (B, 6)), jnp.int32)
        tok = jnp.asarray(rng.randint(0, cfg.vocab, (B,)), jnp.int32)

        c1 = llama.init_kv_cache(cfg, B, 4, page)
        _, c1 = llama.prefill(params, c1, prompt, cfg)
        l1, c1 = llama.decode_step(params, c1, tok, cfg)

        c2 = llama.init_kv_cache(cfg, B, 4, page)
        _, c2 = llama.prefill(params, c2, prompt, cfg)
        with _use_mesh(mesh):
            l2, c2 = llama.decode_step(params, c2, tok, cfg)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                   atol=2e-5, rtol=1e-4)


def test_sample_logits(client):
    """Sampler semantics: temp-0/argmax, top-k support masking, top-p
    nucleus support, and full-distribution sampling validity."""
    import jax
    import jax.numpy as jnp

    from cubecl_tpu.models.llama import sample_logits

    logits = jnp.asarray(np.log(np.array(
        [[0.5, 0.3, 0.1, 0.06, 0.04]], np.float32)))
    key = jax.random.PRNGKey(0)

    assert int(sample_logits(logits, key, temperature=0.0)[0]) == 0
    assert int(sample_logits(logits, key, top_k=1)[0]) == 0

    # top_k=2: only tokens {0,1} ever sampled
    seen = {int(sample_logits(logits, jax.random.PRNGKey(i),
                              top_k=2)[0]) for i in range(60)}
    assert seen <= {0, 1} and len(seen) == 2

    # top_p=0.75: nucleus {0.5, 0.3} -> tokens {0,1}
    seen = {int(sample_logits(logits, jax.random.PRNGKey(i),
                              top_p=0.75)[0]) for i in range(60)}
    assert seen <= {0, 1} and len(seen) == 2

    # unconstrained: all tokens reachable, frequencies roughly ordered
    counts = np.zeros(5)
    for i in range(400):
        counts[int(sample_logits(logits, jax.random.PRNGKey(i))[0])] += 1
    assert counts[0] > counts[2] > 0


def test_multi_lora_decode(client):
    """Multi-LoRA batched serving: zero-initialized adapters reproduce
    the base model exactly, and a mixed batch (adapter 0 zero, adapter
    1 nonzero) matches per-adapter homogeneous runs row-wise."""
    import jax
    import jax.numpy as jnp

    from cubecl_tpu.models import llama

    cfg = llama.LlamaConfig(vocab=64, d_model=64, n_heads=2, n_kv_heads=1,
                            n_layers=2, d_ff=128, seq=32,
                            use_flash_attention=False,
                            use_framework_kernels=False)
    params = llama.init_params(cfg, seed=14)
    lora = llama.init_lora(cfg, n_adapters=2, rank=4, seed=15)
    # give adapter 1 a real delta (B inits to zero)
    key = jax.random.PRNGKey(16)
    for li, la in enumerate(lora["layers"]):
        k1, k2, key = jax.random.split(key, 3)
        la["wq_b"] = la["wq_b"].at[1].set(
            jax.random.normal(k1, la["wq_b"].shape[1:]) * 0.1)
        la["wv_b"] = la["wv_b"].at[1].set(
            jax.random.normal(k2, la["wv_b"].shape[1:]) * 0.1)

    B, page = 2, 16
    rng = np.random.RandomState(31)
    prompt = jnp.asarray(rng.randint(0, cfg.vocab, (B, 5)), jnp.int32)
    tok = jnp.asarray(rng.randint(0, cfg.vocab, (B,)), jnp.int32)

    def run(lora_arg, ids):
        c = llama.init_kv_cache(cfg, B, 4, page)
        lg = None
        for t in range(5):
            lg, c = llama.decode_step(params, c, prompt[:, t], cfg,
                                      lora=lora_arg, lora_ids=ids)
        lg, c = llama.decode_step(params, c, tok, cfg, lora=lora_arg,
                                  lora_ids=ids)
        return np.asarray(lg)

    base = run(None, None)
    zeros = run(lora, jnp.zeros((B,), jnp.int32))
    np.testing.assert_allclose(zeros, base, atol=1e-6)   # B=0 exact

    ones = run(lora, jnp.ones((B,), jnp.int32))
    assert np.abs(ones - base).max() > 1e-3              # adapter bites

    mixed = run(lora, jnp.asarray([0, 1], jnp.int32))
    np.testing.assert_allclose(mixed[0], base[0], atol=1e-6)
    np.testing.assert_allclose(mixed[1], ones[1], atol=1e-6)


def test_lora_finetune_only_adapters(client):
    """LoRA fine-tuning: loss decreases while the base stays frozen;
    a different adapter id in the same bank is unaffected."""
    import jax.numpy as jnp

    from cubecl_tpu.models import llama

    cfg = llama.LlamaConfig(vocab=64, d_model=64, n_heads=2, n_kv_heads=1,
                            n_layers=2, d_ff=128, seq=16,
                            use_flash_attention=False,
                            use_framework_kernels=False)
    params = llama.init_params(cfg, seed=20)
    lora = llama.init_lora(cfg, n_adapters=2, rank=4, seed=21)
    step = llama.make_lora_train_step(cfg, params, lr=2.0)
    rng = np.random.RandomState(22)
    toks = jnp.asarray(rng.randint(0, cfg.vocab, (4, 16)), jnp.int32)
    ids = jnp.zeros((4,), jnp.int32)          # train adapter 0 only

    losses = []
    for _ in range(25):
        lora, loss = step(lora, toks, ids)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.01, (losses[0], losses[-1])

    # adapter 1 untouched (grads only flowed to gathered rows)
    for la in lora["layers"]:
        assert float(jnp.abs(la["wq_b"][1]).max()) == 0.0
    # trained adapter changed
    assert float(jnp.abs(lora["layers"][0]["wq_b"][0]).max()) > 0.0


def test_llama_streaming_window_decode(client):
    """StreamingLLM config: windowed decode equals full decode while
    the context fits in sinks+window, then diverges once it overflows
    (the mask actually bites)."""
    import dataclasses

    import jax.numpy as jnp

    from cubecl_tpu.models import llama

    base = llama.LlamaConfig(vocab=64, d_model=64, n_heads=2,
                             n_kv_heads=1, n_layers=2, d_ff=128, seq=64,
                             use_flash_attention=False,
                             use_framework_kernels=False)
    win = dataclasses.replace(base, attn_window=16, attn_sinks=16)
    params = llama.init_params(base, seed=30)
    rng = np.random.RandomState(33)
    page = 16
    toks = jnp.asarray(rng.randint(0, base.vocab, (1, 48)), jnp.int32)

    cf = llama.init_kv_cache(base, 1, 4, page)
    cw = llama.init_kv_cache(win, 1, 4, page)
    same_until_overflow = True
    for t in range(48):
        lf, cf = llama.decode_step(params, cf, toks[:, t], base)
        lw, cw = llama.decode_step(params, cw, toks[:, t], win)
        if t < 31:   # context <= sinks+window: identical
            np.testing.assert_allclose(np.asarray(lf), np.asarray(lw),
                                       atol=1e-5)
    assert np.abs(np.asarray(lf) - np.asarray(lw)).max() > 1e-4


def test_llama_ring_cache_bounded_memory(client):
    """Bounded-memory StreamingLLM: a ring cache with capacity
    sinks+window+slack reproduces the UNBOUNDED windowed-mask decode
    exactly, far beyond its physical capacity."""
    import dataclasses

    import jax.numpy as jnp

    from cubecl_tpu.models import llama

    page = 16
    base = llama.LlamaConfig(vocab=64, d_model=64, n_heads=2,
                             n_kv_heads=1, n_layers=2, d_ff=128, seq=64,
                             attn_window=16, attn_sinks=16,
                             use_flash_attention=False,
                             use_framework_kernels=False)
    ring = dataclasses.replace(base, ring_cache=True)
    params = llama.init_params(base, seed=40)
    rng = np.random.RandomState(41)
    steps = 70                     # >> ring capacity of 48 tokens
    toks = jnp.asarray(rng.randint(0, base.vocab, (1, steps)), jnp.int32)

    cf = llama.init_kv_cache(base, 1, 8, page)    # unbounded oracle
    cr = llama.init_kv_cache(ring, 1, 3, page)    # 3 pages TOTAL
    assert "pos_meta" in cr
    for t in range(steps):
        lf, cf = llama.decode_step(params, cf, toks[:, t], base)
        lr, cr = llama.decode_step(params, cr, toks[:, t], ring)
        np.testing.assert_allclose(np.asarray(lf), np.asarray(lr),
                                   atol=2e-5, rtol=1e-4)
    # the ring cache really is bounded: 3 pages regardless of length
    assert cr["k"].shape[2] == 3
    assert int(cr["lengths"][0]) == steps


def test_selective_scan_matches_naive():
    """Associative-scan selective SSM == the sequential lax.scan oracle."""
    import jax.numpy as jnp

    from cubecl_tpu.ops.ssm import selective_scan, selective_scan_naive

    rng = np.random.RandomState(60)
    B, L, D, N = 2, 33, 8, 4
    x = jnp.asarray(rng.randn(B, L, D).astype(np.float32))
    delta = jnp.asarray(np.abs(rng.randn(B, L, D)).astype(np.float32) * .1)
    A = jnp.asarray(-np.abs(rng.randn(D, N)).astype(np.float32))
    Bc = jnp.asarray(rng.randn(B, L, N).astype(np.float32))
    Cc = jnp.asarray(rng.randn(B, L, N).astype(np.float32))
    Dsk = jnp.asarray(rng.randn(D).astype(np.float32))

    fast = selective_scan(x, delta, A, Bc, Cc, Dsk)
    slow = selective_scan_naive(x, delta, A, Bc, Cc, Dsk)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                               atol=1e-5, rtol=1e-4)


def test_mamba_forward_decode_equivalence():
    """Recurrent O(1)-state decode reproduces the parallel forward's
    logits position by position — conv window + SSM state carried
    exactly (the Mamba family's serving contract)."""
    import jax.numpy as jnp

    from cubecl_tpu.models import mamba

    cfg = mamba.MambaConfig(vocab=61, d_model=32, n_layers=2, seq=12)
    params = mamba.init_params(cfg, seed=61)
    rng = np.random.RandomState(62)
    toks = jnp.asarray(rng.randint(0, cfg.vocab, (2, cfg.seq)), jnp.int32)

    full = np.asarray(mamba.forward(params, toks, cfg))    # (B,L,V)

    state = mamba.decode_init(cfg, batch=2)
    for t in range(cfg.seq):
        logits, state = mamba.decode_step(params, state, toks[:, t], cfg)
        np.testing.assert_allclose(np.asarray(logits), full[:, t],
                                   atol=2e-4, rtol=1e-3)
    # decode state truly constant-size
    assert state[0]["conv"].shape == (2, cfg.d_conv - 1, cfg.d_inner)
    assert state[0]["h"].shape == (2, cfg.d_inner, cfg.d_state)


def test_mamba_scan_impl_equivalence():
    """scan_impl="chunked" (the single-pass pallas kernel) produces the
    same logits as the associative-scan default."""
    import dataclasses

    import jax.numpy as jnp

    from cubecl_tpu.models import mamba

    cfg = mamba.MambaConfig(vocab=61, d_model=32, n_layers=2, seq=256,
                            scan_impl="assoc")
    params = mamba.init_params(cfg, seed=7)
    rng = np.random.RandomState(8)
    toks = jnp.asarray(rng.randint(0, cfg.vocab, (2, cfg.seq)), jnp.int32)
    ref = np.asarray(mamba.forward(params, toks, cfg))
    cfg_c = dataclasses.replace(cfg, scan_impl="chunked")
    got = np.asarray(mamba.forward(params, toks, cfg_c))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_mamba_sharded_train_step():
    """dp×tp mamba train step on the 8-device mesh: loss matches the
    single-device step and decreases over a few iterations."""
    import jax

    from cubecl_tpu.models import mamba
    from cubecl_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs 8 devices")

    cfg = mamba.MambaConfig(vocab=64, d_model=64, n_layers=2, seq=16)
    mesh = make_mesh({"dp": 4, "tp": 2})
    params = mamba.init_params(cfg, seed=63)
    rng = np.random.RandomState(64)
    toks = rng.randint(0, cfg.vocab, (8, cfg.seq)).astype(np.int32)

    jstep, pshard, dshard = mamba.make_sharded_train_step(cfg, mesh, lr=1e-2)
    sp = jax.device_put(params, pshard)
    st = jax.device_put(toks, dshard)
    ref_step = mamba.make_train_step(cfg, lr=1e-2)

    rp = params
    losses = []
    for _ in range(3):
        sp, l_sharded = jstep(sp, st)
        rp, l_ref = ref_step(rp, toks)
        losses.append(float(l_sharded))
        assert abs(float(l_sharded) - float(l_ref)) \
            < 1e-4 * max(1.0, abs(float(l_ref)))
    assert losses[-1] < losses[0]


def test_selective_scan_chunked_matches_naive():
    """Single-pass pallas chunked scan (carry in VMEM scratch) == the
    sequential oracle, incl. a DN%128 padding case and L%chunk != 0."""
    import jax.numpy as jnp

    from cubecl_tpu.ops.ssm import (
        selective_scan_chunked,
        selective_scan_naive,
    )

    rng = np.random.RandomState(65)
    for B, L, D, N, chunk in ((2, 64, 8, 16, 16),   # DN=128 exact
                              (1, 48, 8, 4, 32),    # DN=32 -> pad 96
                              (1, 40, 16, 16, 16)): # L%32!=0 path
        x = jnp.asarray(rng.randn(B, L, D).astype(np.float32))
        delta = jnp.asarray(
            np.abs(rng.randn(B, L, D)).astype(np.float32) * .1)
        A = jnp.asarray(-np.abs(rng.randn(D, N)).astype(np.float32))
        Bc = jnp.asarray(rng.randn(B, L, N).astype(np.float32))
        Cc = jnp.asarray(rng.randn(B, L, N).astype(np.float32))
        Dsk = jnp.asarray(rng.randn(D).astype(np.float32))
        slow = selective_scan_naive(x, delta, A, Bc, Cc, Dsk)
        # auto (flat at these ragged-R chunks), flat, and forced-
        # segmented (interpreter checks the math; hardware auto-hier
        # requires lc % 64 — see scan_chunked_core)
        for hier in (None, False, True):
            fast = selective_scan_chunked(x, delta, A, Bc, Cc, Dsk,
                                          chunk=chunk, interpret=True,
                                          hier=hier)
            np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                                       atol=1e-5, rtol=1e-4)


def test_selective_scan_hier_kernel():
    """Hierarchical (segmented) in-tile scan == sequential oracle on the
    scan core itself — runs the REAL Mosaic kernel in --tpu smoke mode
    (roll-compaction + aligned reshape-slice + sublane broadcast are
    exactly the lowering-sensitive pieces; round 3/4 both shipped
    interpreter-only kernels that broke on hardware)."""
    import jax
    import jax.numpy as jnp

    from cubecl_tpu.ops.ssm import scan_chunked_core

    interp = jax.default_backend() != "tpu"
    rng = np.random.RandomState(7)
    B, L, DN = 2, 512, 256
    a = jnp.asarray((np.exp(-np.abs(rng.randn(B, L, DN))) * .9)
                    .astype(np.float32))
    u = jnp.asarray((rng.randn(B, L, DN) * .1).astype(np.float32))
    h64 = np.zeros((B, DN), np.float64)
    ref = np.zeros((B, L, DN), np.float64)
    a64, u64 = np.asarray(a, np.float64), np.asarray(u, np.float64)
    for t in range(L):
        h64 = a64[:, t] * h64 + u64[:, t]
        ref[:, t] = h64
    # multi-chunk (carry crosses chunks) + single-chunk, both segmented
    for chunk in (128, 512):
        got = np.asarray(scan_chunked_core(a, u, chunk=chunk,
                                           interpret=interp))
        np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_selective_scan_sequence_parallel():
    """sp=8 sharded scan (local scans + one B*D*N summary all_gather)
    == the unsharded scan on the full sequence."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from cubecl_tpu.ops.ssm import selective_scan, selective_scan_sp
    from cubecl_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs 8 devices")

    rng = np.random.RandomState(66)
    B, L, D, N = 2, 64, 8, 4
    x = jnp.asarray(rng.randn(B, L, D).astype(np.float32))
    delta = jnp.asarray(np.abs(rng.randn(B, L, D)).astype(np.float32) * .1)
    A = jnp.asarray(-np.abs(rng.randn(D, N)).astype(np.float32))
    Bc = jnp.asarray(rng.randn(B, L, N).astype(np.float32))
    Cc = jnp.asarray(rng.randn(B, L, N).astype(np.float32))
    Dsk = jnp.asarray(rng.randn(D).astype(np.float32))

    mesh = make_mesh({"sp": 8})
    fn = jax.jit(jax.shard_map(
        lambda *t: selective_scan_sp(*t),
        mesh=mesh,
        in_specs=(P(None, "sp"), P(None, "sp"), P(), P(None, "sp"),
                  P(None, "sp"), P()),
        out_specs=P(None, "sp"), check_vma=False))
    y = fn(x, delta, A, Bc, Cc, Dsk)
    ref = selective_scan(x, delta, A, Bc, Cc, Dsk)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               atol=1e-5, rtol=1e-4)
