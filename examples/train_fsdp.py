"""Production training loop end-to-end: FSDP (ZeRO-3 via GSPMD
sharding annotations), bf16 mixed precision with f32 master weights,
warmup-cosine LR, gradient accumulation, global-norm clipping, async
sharded checkpoints, and a kill-and-resume that lands bit-exactly on
the uninterrupted run.

Runs anywhere: pass --cpu to simulate an 8-chip mesh on CPU (the same
code jits over real ICI on a TPU pod slice — the mesh is the only
difference). Reference analogue: none (the reference stops at
collectives; SURVEY §2.9) — this is what parallel/train.py exists for.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv and not os.environ.get("CUBECL_EX_REEXEC"):
    # the axon sitecustomize initializes jax at interpreter start, so
    # env changes here are too late — re-exec once with the tunnel off
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8")
    env["CUBECL_EX_REEXEC"] = "1"
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

import shutil
import tempfile

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cubecl_tpu.models import transformer as tr
    from cubecl_tpu.parallel import (
        CheckpointManager,
        make_fsdp_train_step,
        make_mesh,
        wait_for_saves,
        warmup_cosine,
    )

    n = len(jax.devices())
    mesh = make_mesh({"fsdp": n})
    print(f"mesh: fsdp={n} on {jax.devices()[0].platform}")

    cfg = tr.TransformerConfig(vocab=256, d_model=128, n_heads=4,
                               n_layers=2, d_ff=512, seq=64)
    params = tr.init_params(cfg)
    size = sum(l.size for l in jax.tree_util.tree_leaves(params))
    print(f"model: {size/1e6:.1f}M params")

    loss_fn = lambda p, b: tr.loss_fn(p, b, cfg)  # noqa: E731
    init_state, step, bshard = make_fsdp_train_step(
        loss_fn, mesh, params,
        lr=warmup_cosine(3e-3, warmup_steps=3, total_steps=20),
        compute_dtype=jnp.bfloat16, max_grad_norm=1.0,
        weight_decay=0.01, accum_steps=2)
    state = init_state(params)

    shard = next(l for l in jax.tree_util.tree_leaves(state["params"])
                 if l.size >= 2 ** 12).addressable_shards[0].data
    print(f"ZeRO-3: large leaves hold 1/{n} per device "
          f"(e.g. shard {tuple(shard.shape)})")

    rng = np.random.RandomState(0)
    batch = lambda: jax.device_put(  # noqa: E731
        rng.randint(0, cfg.vocab, (2 * n, cfg.seq)).astype(np.int32),
        bshard)

    root = tempfile.mkdtemp(prefix="cubecl_ckpt_")
    mgr = CheckpointManager(root, max_to_keep=2, save_interval=5)
    try:
        fixed = batch()
        for i in range(1, 11):
            state, loss = step(state, fixed)
            if mgr.save(int(state["opt"]["step"]), state):
                print(f"step {i:>3}  loss {float(loss):.4f}  [checkpoint]")
            elif i % 5 == 0 or i <= 3:
                print(f"step {i:>3}  loss {float(loss):.4f}")
        final = float(loss)

        # ---- simulate preemption: resume from the last checkpoint ----
        resume_at = mgr.all_steps[-2]       # pretend the last save lost
        print(f"\nresuming from step {resume_at} ...")
        restored = mgr.restore(init_state(params), step=resume_at)
        while int(restored["opt"]["step"]) < 10:
            restored, loss2 = step(restored, fixed)
        assert float(loss2) == final, (float(loss2), final)
        print(f"resume replay loss {float(loss2):.4f} == uninterrupted "
              f"{final:.4f}  (bit-exact)")
        wait_for_saves()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print("OK")


if __name__ == "__main__":
    main()
