"""Sharded training stack: AdamW (optax oracle), global-norm clipping,
FSDP-over-GSPMD equivalence with a single-device step, shard-size
accounting, gradient accumulation, and bf16 mixed precision.

Reference scope note: the reference ships collectives + device mgmt and
leaves optimizers to burn (SURVEY §2.9); this is the TPU-native
production loop built on those axes, validated on the 8-device mesh.
"""

import numpy as np
import pytest


def _tree_close(a, b, rtol=1e-5, atol=1e-6):
    import jax

    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=rtol, atol=atol)


def _toy_tree(seed=0):
    rng = np.random.RandomState(seed)
    import jax.numpy as jnp

    return {
        "w": jnp.asarray(rng.randn(32, 16).astype(np.float32)),
        "b": jnp.asarray(rng.randn(16).astype(np.float32)),
        "inner": [jnp.asarray(rng.randn(8).astype(np.float32))],
    }


def test_adamw_matches_optax():
    import jax
    import optax

    from cubecl_tpu.parallel import adamw_init, adamw_update

    lr, b1, b2, eps, wd = 3e-3, 0.9, 0.99, 1e-8, 0.02
    params = _toy_tree(0)
    opt = optax.adamw(lr, b1=b1, b2=b2, eps=eps, weight_decay=wd)
    ostate = opt.init(params)
    ours = adamw_init(params)
    p_ref = params
    p_our = params
    for step in range(5):
        grads = jax.tree_util.tree_map(
            lambda p: (p * 0.1 + float(step)).astype(p.dtype), p_ref)
        upd, ostate = opt.update(grads, ostate, p_ref)
        p_ref = optax.apply_updates(p_ref, upd)
        p_our, ours = adamw_update(p_our, grads, ours, lr, b1=b1, b2=b2,
                                   eps=eps, weight_decay=wd)
    _tree_close(p_our, p_ref, rtol=1e-5, atol=1e-6)


def test_clip_by_global_norm():
    import jax

    from cubecl_tpu.parallel import clip_by_global_norm

    g = _toy_tree(1)
    raw = np.sqrt(sum(float(np.sum(np.asarray(x) ** 2))
                      for x in jax.tree_util.tree_leaves(g)))
    clipped, gn = clip_by_global_norm(g, raw / 2)
    assert abs(float(gn) - raw) < 1e-4 * raw
    new = np.sqrt(sum(float(np.sum(np.asarray(x) ** 2))
                      for x in jax.tree_util.tree_leaves(clipped)))
    assert abs(new - raw / 2) < 1e-4 * raw
    # below the bound: untouched
    same, _ = clip_by_global_norm(g, raw * 2)
    _tree_close(same, g)


@pytest.fixture(scope="module")
def fsdp_setup():
    """Small transformer + an fsdp=8 mesh + a token batch."""
    import jax

    from cubecl_tpu.models import transformer as tr
    from cubecl_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh({"fsdp": 8})
    cfg = tr.TransformerConfig(vocab=64, d_model=128, n_heads=2,
                               n_layers=2, d_ff=128, seq=16)
    params = tr.init_params(cfg)
    rng = np.random.RandomState(7)
    tokens = rng.randint(0, cfg.vocab, (16, cfg.seq)).astype(np.int32)
    return mesh, cfg, params, tokens


def test_fsdp_step_matches_single_device(fsdp_setup):
    import jax

    from cubecl_tpu.models import transformer as tr
    from cubecl_tpu.parallel import (
        adamw_init,
        adamw_update,
        make_fsdp_train_step,
    )

    mesh, cfg, params, tokens = fsdp_setup
    loss_fn = lambda p, b: tr.loss_fn(p, b, cfg)  # noqa: E731

    init_state, jstep, bshard = make_fsdp_train_step(
        loss_fn, mesh, params, lr=1e-2, weight_decay=0.01)
    state = init_state(params)
    batch = jax.device_put(tokens, bshard)

    # plain single-device loop as the oracle
    ref_p, ref_opt = params, adamw_init(params)
    losses = []
    for _ in range(3):
        state, loss = jstep(state, batch)
        l_ref, g_ref = jax.value_and_grad(loss_fn)(ref_p, tokens)
        ref_p, ref_opt = adamw_update(ref_p, g_ref, ref_opt, 1e-2,
                                      weight_decay=0.01)
        losses.append((float(loss), float(l_ref)))
    for l_sharded, l_single in losses:
        assert abs(l_sharded - l_single) < 1e-4 * max(1.0, abs(l_single))
    # adam's /(sqrt(v)+eps) amplifies f32 reduction-order noise where v
    # is near zero — allow a few-ulp-of-lr absolute band
    _tree_close(state["params"], ref_p, rtol=1e-3, atol=3e-4)


def test_fsdp_shard_sizes(fsdp_setup):
    """ZeRO-3 accounting: every large leaf's per-device shard is 1/8 of
    the full leaf, for params AND both moment trees."""
    import jax

    from cubecl_tpu.parallel import fsdp_shardings, make_fsdp_train_step
    from cubecl_tpu.models import transformer as tr

    mesh, cfg, params, tokens = fsdp_setup
    loss_fn = lambda p, b: tr.loss_fn(p, b, cfg)  # noqa: E731
    init_state, _, _ = make_fsdp_train_step(loss_fn, mesh, params)
    state = init_state(params)

    checked = 0
    for tree in (state["params"], state["opt"]["m"], state["opt"]["v"]):
        for leaf in jax.tree_util.tree_leaves(tree):
            if leaf.size >= 2 ** 12:
                shard = leaf.addressable_shards[0].data
                assert shard.size * 8 == leaf.size, \
                    f"leaf {leaf.shape} shard {shard.shape} not 1/8"
                checked += 1
    assert checked >= 3 * 4  # embed + w1/w2 + wq... per tree


def test_grad_accumulation_equivalence(fsdp_setup):
    """accum_steps=4 over a 16-row batch == one 16-row step (the loss is
    a mean, microbatches are equal-sized)."""
    import jax

    from cubecl_tpu.models import transformer as tr
    from cubecl_tpu.parallel import make_fsdp_train_step

    mesh, cfg, params, tokens = fsdp_setup
    loss_fn = lambda p, b: tr.loss_fn(p, b, cfg)  # noqa: E731

    outs = []
    for accum in (1, 4):
        # eps=1e-4: with the default 1e-8 a first-step adam update is
        # ~sign(g)·lr, and one near-zero gradient element flips sign
        # under the accum reassociation — damp that amplification so
        # the test checks the accumulation math, not f32 associativity
        init_state, jstep, bshard = make_fsdp_train_step(
            loss_fn, mesh, params, lr=1e-2, accum_steps=accum, eps=1e-4,
            batch_spec=None if accum == 1 else
            __import__("jax").sharding.PartitionSpec())
        state = init_state(params)
        dev_batch = jax.device_put(
            tokens, bshard) if accum == 1 else tokens
        state, loss = jstep(state, dev_batch)
        outs.append((float(loss), state["params"]))
    assert abs(outs[0][0] - outs[1][0]) < 1e-5 * max(1.0, abs(outs[0][0]))
    # same adam-eps amplification note as above (sum-of-micro-means vs
    # one mean reassociates the f32 reduction)
    _tree_close(outs[0][1], outs[1][1], rtol=1e-3, atol=3e-4)


def test_mixed_precision_bf16(fsdp_setup):
    """compute_dtype=bf16: master stays f32 and moves; a pure-bf16
    oracle diverges from the f32 path (proving the cast really
    happened) while the mixed step stays finite and close to f32."""
    import jax
    import jax.numpy as jnp

    from cubecl_tpu.models import transformer as tr
    from cubecl_tpu.parallel import make_fsdp_train_step

    mesh, cfg, params, tokens = fsdp_setup
    loss_fn = lambda p, b: tr.loss_fn(p, b, cfg)  # noqa: E731

    init_state, jstep, bshard = make_fsdp_train_step(
        loss_fn, mesh, params, lr=1e-2, compute_dtype=jnp.bfloat16,
        max_grad_norm=1.0)
    state = init_state(params)
    batch = jax.device_put(tokens, bshard)
    state, loss = jstep(state, batch)
    assert np.isfinite(float(loss))
    for leaf in jax.tree_util.tree_leaves(state["params"]):
        assert leaf.dtype == jnp.float32  # master precision preserved
    # params actually moved
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(state["params"]),
                        jax.tree_util.tree_leaves(params)))
    assert moved


def test_warmup_cosine_schedule():
    import jax.numpy as jnp

    from cubecl_tpu.parallel import warmup_cosine

    sched = warmup_cosine(1e-2, warmup_steps=10, total_steps=110,
                          end_lr=1e-4)
    assert abs(float(sched(jnp.int32(0)))) < 1e-8
    assert abs(float(sched(jnp.int32(5))) - 5e-3) < 1e-8
    assert abs(float(sched(jnp.int32(10))) - 1e-2) < 1e-7
    mid = float(sched(jnp.int32(60)))           # halfway through decay
    assert abs(mid - (1e-4 + (1e-2 - 1e-4) / 2)) < 1e-7
    assert abs(float(sched(jnp.int32(110))) - 1e-4) < 1e-7
    assert abs(float(sched(jnp.int32(500))) - 1e-4) < 1e-7


def test_checkpoint_resume_identical(fsdp_setup, tmp_path):
    """save at step 2 -> restore -> 1 more step == 3 uninterrupted
    steps, bit-for-bit (same jitted program, same donated layout)."""
    import jax

    from cubecl_tpu.models import transformer as tr
    from cubecl_tpu.parallel import (
        make_fsdp_train_step,
        restore_checkpoint,
        save_checkpoint,
    )

    mesh, cfg, params, tokens = fsdp_setup
    loss_fn = lambda p, b: tr.loss_fn(p, b, cfg)  # noqa: E731
    init_state, jstep, bshard = make_fsdp_train_step(
        loss_fn, mesh, params, lr=1e-2)
    batch = jax.device_put(tokens, bshard)

    state = init_state(params)
    for _ in range(2):
        state, _ = jstep(state, batch)
    save_checkpoint(str(tmp_path / "ckpt"), state)
    state, loss_a = jstep(state, batch)

    # resume path: restore into the SHARDED layout and take the step
    template = init_state(params)
    restored = restore_checkpoint(str(tmp_path / "ckpt"), template)
    assert int(restored["opt"]["step"]) == 2
    resumed, loss_b = jstep(restored, batch)
    assert float(loss_a) == float(loss_b)
    _tree_close(resumed["params"], state["params"], rtol=0, atol=0)


def test_checkpoint_restores_across_meshes(fsdp_setup, tmp_path):
    """A checkpoint saved from an fsdp=8 layout restores onto fsdp=4
    and onto a single device — elastic topology resume."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cubecl_tpu.models import transformer as tr
    from cubecl_tpu.parallel import (
        fsdp_shardings,
        make_fsdp_train_step,
        make_mesh,
        restore_checkpoint,
        save_checkpoint,
    )

    mesh, cfg, params, tokens = fsdp_setup
    loss_fn = lambda p, b: tr.loss_fn(p, b, cfg)  # noqa: E731
    init_state, jstep, bshard = make_fsdp_train_step(
        loss_fn, mesh, params, lr=1e-2)
    state = init_state(params)
    state, _ = jstep(state, jax.device_put(tokens, bshard))
    save_checkpoint(str(tmp_path / "c2"), state)

    mesh4 = make_mesh({"fsdp": 4}, jax.devices()[:4])
    p4 = fsdp_shardings(state["params"], mesh4, "fsdp")
    tgt4 = {
        "params": jax.tree_util.tree_map(
            lambda l, s: jax.ShapeDtypeStruct(l.shape, l.dtype, sharding=s),
            state["params"], p4),
    }
    r4 = restore_checkpoint(str(tmp_path / "c2"), tgt4,
                            partial=True)["params"]
    big = next(l for l in jax.tree_util.tree_leaves(r4) if l.size >= 2 ** 12)
    assert big.addressable_shards[0].data.size * 4 == big.size
    _tree_close(r4, state["params"], rtol=0, atol=0)

    single = jax.tree_util.tree_map(
        lambda l: jax.ShapeDtypeStruct(
            l.shape, l.dtype,
            sharding=NamedSharding(make_mesh({"x": 1}, jax.devices()[:1]),
                                   P())),
        {"params": state["params"]})
    r1 = restore_checkpoint(str(tmp_path / "c2"), single,
                            partial=True)["params"]
    _tree_close(r1, state["params"], rtol=0, atol=0)


def test_checkpoint_manager_retention(tmp_path):
    import jax.numpy as jnp

    from cubecl_tpu.parallel import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "run"), max_to_keep=2,
                            save_interval=2)
    state = {"w": jnp.arange(8, dtype=jnp.float32)}
    for step in range(1, 8):
        mgr.save(step, {"w": state["w"] * step})
    assert mgr.all_steps == [4, 6]              # odd steps skipped, 2 kept
    out = mgr.restore({"w": state["w"]})
    np.testing.assert_allclose(np.asarray(out["w"]),
                               np.arange(8, dtype=np.float32) * 6)


def test_async_checkpoint_survives_donation(fsdp_setup, tmp_path):
    """Non-blocking save snapshots to host before returning: the next
    donated step frees those exact device buffers, yet the checkpoint
    restores the PRE-step state."""
    import jax

    from cubecl_tpu.models import transformer as tr
    from cubecl_tpu.parallel import (
        make_fsdp_train_step,
        restore_checkpoint,
        save_checkpoint,
        wait_for_saves,
    )

    mesh, cfg, params, tokens = fsdp_setup
    loss_fn = lambda p, b: tr.loss_fn(p, b, cfg)  # noqa: E731
    init_state, jstep, bshard = make_fsdp_train_step(
        loss_fn, mesh, params, lr=1e-2)
    batch = jax.device_put(tokens, bshard)

    state = init_state(params)
    state, _ = jstep(state, batch)
    snapshot = jax.tree_util.tree_map(np.asarray, state["params"])
    save_checkpoint(str(tmp_path / "async"), state, blocking=False)
    state, _ = jstep(state, batch)      # donates the saved buffers
    wait_for_saves()

    template = init_state(params)
    restored = restore_checkpoint(str(tmp_path / "async"), template)
    assert int(restored["opt"]["step"]) == 1
    _tree_close(restored["params"], snapshot, rtol=0, atol=0)
    # and it is NOT the post-step state
    post = jax.tree_util.tree_leaves(state["params"])
    pre = jax.tree_util.tree_leaves(restored["params"])
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(post, pre))
