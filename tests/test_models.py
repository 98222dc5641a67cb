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
