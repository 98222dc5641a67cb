"""Pipeline parallelism (pp axis): GPipe-style microbatch pipeline.

Completes the parallelism menu (dp data / tp tensor / sp sequence /
ep expert / pp pipeline): transformer layers are stacked and sharded
across the ``pp`` mesh axis (each stage holds n_layers / pp of them);
activations stream stage-to-stage with ``jax.lax.ppermute`` over ICI
while every stage works on a different microbatch (the scaling-book
pipelining recipe — bubble fraction (P-1)/(M+P-1)).

Built on the flagship transformer's layer stack; the whole pipeline is
ONE jitted shard_map so XLA schedules the permutes against compute.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

from .transformer import (TransformerConfig, _attention, _gelu,
                          _layernorm)


def stack_layer_params(cfg: TransformerConfig, params: Dict[str, Any]):
    """Stack the per-layer dicts into leading-axis arrays (L, ...) so the
    pp axis can shard dimension 0."""
    import jax
    import jax.numpy as jnp

    layers = params["layers"]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    return {k: v for k, v in params.items() if k != "layers"} | {
        "layers": stacked}


def _apply_layer(layer, x, cfg: TransformerConfig):
    """One transformer block given one layer's params (no leading axis) —
    exactly transformer.forward's block body."""
    h = _layernorm(x, layer["ln1"]["g"], layer["ln1"]["b"])
    x = x + _attention(h, layer, cfg)
    h = _layernorm(x, layer["ln2"]["g"], layer["ln2"]["b"])
    h = _gelu(h @ layer["w1"] + layer["b1"])
    return x + h @ layer["w2"] + layer["b2"]


def make_pipelined_forward(cfg: TransformerConfig, mesh, n_micro: int):
    """Returns forward(stacked_params, tokens) -> logits, jitted as one
    shard_map over the mesh's ``pp`` axis (other axes replicate here;
    compose with dp/tp via the in/out specs of the caller's jit)."""
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    PP = mesh.shape["pp"]
    assert cfg.n_layers % PP == 0

    def run(stage_layers, embed, pos, wout, tokens):
        """Executes on ONE pp stage (leading layer axis = local layers)."""
        stage = jax.lax.axis_index("pp")
        B, S = tokens.shape
        assert B % n_micro == 0
        mb = B // n_micro
        x0 = embed[tokens] + pos[None, :S]
        micro = x0.reshape(n_micro, mb, S, cfg.d_model)

        def apply_stage(h):
            def body(carry, layer):
                return _apply_layer(layer, carry, cfg), None

            out, _ = jax.lax.scan(body, h, stage_layers)
            return out

        steps = n_micro + PP - 1
        outs = jnp.zeros_like(micro)

        def step(i, carry):
            buf, outs = carry
            # stage 0 injects microbatch i (or zeros past the end)
            inj = micro[jnp.minimum(i, n_micro - 1)]
            h = jnp.where(stage == 0, inj, buf)
            h = apply_stage(h)
            # pass to the next stage around the ring
            nxt = jax.lax.ppermute(
                h, "pp", [(j, (j + 1) % PP) for j in range(PP)])
            # the LAST stage's output for microbatch (i - PP + 1)
            done_idx = i - (PP - 1)
            outs = jax.lax.cond(
                (stage == PP - 1) & (done_idx >= 0),
                lambda o: o.at[jnp.maximum(done_idx, 0)].set(h),
                lambda o: o,
                outs)
            return (nxt, outs)

        _, outs = jax.lax.fori_loop(0, steps, step, (micro[0] * 0, outs))
        # only the last stage holds real outputs; replicate them to every
        # stage (masked psum — a ppermute is a permutation, not a bcast)
        outs = jax.lax.psum(
            jnp.where(stage == PP - 1, outs, jnp.zeros_like(outs)), "pp")
        x = outs.reshape(B, S, cfg.d_model)
        x = _layernorm(x, wout["g"], wout["b"])
        return x @ embed.T

    smapped = shard_map(
        run, mesh=mesh,
        in_specs=(P("pp"), P(), P(), P(), P()),
        out_specs=P(),
        check_rep=False)

    @functools.partial(jax.jit)
    def forward(stacked, tokens):
        return smapped(stacked["layers"], stacked["embed"], stacked["pos"],
                       stacked["ln_f"], tokens)

    return forward
