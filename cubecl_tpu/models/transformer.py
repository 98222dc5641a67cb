"""Flagship model: a transformer LM built on the framework's kernels.

The reference is a kernel framework, not a model zoo — this module is the
"downstream Burn/cubek user" of cubecl-tpu: it exercises the kernel
library end-to-end (matmul on the MXU, layernorm/softmax/gelu kernels) and
demonstrates the multi-chip story (SURVEY §2.9 multi-device axis → mesh +
collectives).

Parallelism axes on the mesh:
- ``dp``  — batch data parallel (gradients psum over dp)
- ``tp``  — tensor parallel: attention heads + MLP hidden sharded on tp
- ``sp``  — sequence parallel: activations sharded along sequence for
            norm/elementwise segments (folded into dp on small meshes)

Single-chip forward can route the hot ops through the framework's Pallas
kernels; under a mesh the same functions are jitted with NamedShardings so
XLA inserts the ICI collectives (the scaling-book recipe).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Dict, Optional, Tuple


@dataclasses.dataclass
class TransformerConfig:
    vocab: int = 256
    d_model: int = 128
    n_heads: int = 4
    n_layers: int = 2
    d_ff: int = 512
    seq: int = 64
    dtype: str = "float32"
    # route attention through the framework's flash kernel (requires
    # seq % 128 == 0 and head_dim % 128 == 0; single-device path)
    use_flash_attention: bool = False

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads


def init_params(cfg: TransformerConfig, seed: int = 0) -> Dict[str, Any]:
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 4 + 8 * cfg.n_layers)
    dt = jnp.dtype(cfg.dtype)
    scale = 0.02

    def rnd(k, shape):
        return (jax.random.normal(k, shape) * scale).astype(dt)

    params: Dict[str, Any] = {
        "embed": rnd(ks[0], (cfg.vocab, cfg.d_model)),
        "pos": rnd(ks[1], (cfg.seq, cfg.d_model)),
        "ln_f": {"g": jnp.ones((cfg.d_model,), dt),
                 "b": jnp.zeros((cfg.d_model,), dt)},
        "layers": [],
    }
    i = 4
    for _ in range(cfg.n_layers):
        params["layers"].append({
            "ln1": {"g": jnp.ones((cfg.d_model,), dt),
                    "b": jnp.zeros((cfg.d_model,), dt)},
            "wq": rnd(ks[i], (cfg.d_model, cfg.d_model)),
            "wk": rnd(ks[i + 1], (cfg.d_model, cfg.d_model)),
            "wv": rnd(ks[i + 2], (cfg.d_model, cfg.d_model)),
            "wo": rnd(ks[i + 3], (cfg.d_model, cfg.d_model)),
            "ln2": {"g": jnp.ones((cfg.d_model,), dt),
                    "b": jnp.zeros((cfg.d_model,), dt)},
            "w1": rnd(ks[i + 4], (cfg.d_model, cfg.d_ff)),
            "b1": jnp.zeros((cfg.d_ff,), dt),
            "w2": rnd(ks[i + 5], (cfg.d_ff, cfg.d_model)),
            "b2": jnp.zeros((cfg.d_model,), dt),
        })
        i += 8
    return params


def _layernorm(x, g, b, eps=1e-5):
    import jax
    import jax.numpy as jnp

    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * g + b


def _gelu(x):
    import jax

    return jax.nn.gelu(x, approximate=False)


def _attention(x, layer, cfg: TransformerConfig):
    import jax
    import jax.numpy as jnp

    B, S, D = x.shape
    H, hd = cfg.n_heads, cfg.head_dim
    q = (x @ layer["wq"]).reshape(B, S, H, hd).transpose(0, 2, 1, 3)
    k = (x @ layer["wk"]).reshape(B, S, H, hd).transpose(0, 2, 1, 3)
    v = (x @ layer["wv"]).reshape(B, S, H, hd).transpose(0, 2, 1, 3)
    if cfg.use_flash_attention and S % 128 == 0 and hd % 128 == 0:
        from ..ops.attention import flash_attention

        ctx = flash_attention(q, k, v, True)
    else:
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) \
            / math.sqrt(hd)
        mask = jnp.tril(jnp.ones((S, S), bool))
        scores = jnp.where(mask, scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(B, S, D)
    return ctx @ layer["wo"]


def forward(params, tokens, cfg: TransformerConfig):
    """Logits for a [B, S] int32 token batch."""
    import jax.numpy as jnp

    x = params["embed"][tokens] + params["pos"][None, :tokens.shape[1]]
    for layer in params["layers"]:
        h = _layernorm(x, layer["ln1"]["g"], layer["ln1"]["b"])
        x = x + _attention(h, layer, cfg)
        h = _layernorm(x, layer["ln2"]["g"], layer["ln2"]["b"])
        h = _gelu(h @ layer["w1"] + layer["b1"])
        x = x + h @ layer["w2"] + layer["b2"]
    x = _layernorm(x, params["ln_f"]["g"], params["ln_f"]["b"])
    return x @ params["embed"].T


def loss_fn(params, tokens, cfg: TransformerConfig):
    import jax
    import jax.numpy as jnp

    logits = forward(params, tokens[:, :-1], cfg)
    targets = tokens[:, 1:]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ll = jnp.take_along_axis(logp, targets[..., None], axis=-1)
    return -ll.mean()


def make_train_step(cfg: TransformerConfig, lr: float = 1e-3):
    """SGD training step (optax-free so the step is a pure jaxpr)."""
    import jax

    def step(params, tokens):
        loss, grads = jax.value_and_grad(loss_fn)(params, tokens, cfg)
        new = jax.tree_util.tree_map(lambda p, g: p - lr * g, params, grads)
        return new, loss

    return step


# ---------------------------------------------------------------------------
# Sharding: param/activation specs over a (dp, tp) mesh with sp folded in
# ---------------------------------------------------------------------------


def param_shardings(params, mesh):
    """tp shards attention heads (columns of wq/wk/wv, rows of wo) and the
    MLP hidden dim; everything else replicated."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    def spec_for(path: str):
        if any(w in path for w in ("wq", "wk", "wv", "w1")):
            return P(None, "tp")   # column-parallel
        if any(w in path for w in ("wo", "w2")):
            return P("tp", None)   # row-parallel
        return P()

    def walk(obj, path=""):
        if isinstance(obj, dict):
            return {k: walk(v, f"{path}/{k}") for k, v in obj.items()}
        if isinstance(obj, list):
            return [walk(v, f"{path}/{i}") for i, v in enumerate(obj)]
        return NamedSharding(mesh, spec_for(path))

    return walk(params)


def data_sharding(mesh, seq_parallel: bool = True):
    from jax.sharding import NamedSharding, PartitionSpec as P

    # batch over dp; sequence over sp when the mesh has one
    axes = mesh.axis_names
    if seq_parallel and "sp" in axes:
        return NamedSharding(mesh, P("dp", "sp"))
    return NamedSharding(mesh, P("dp"))


def make_sharded_train_step(cfg: TransformerConfig, mesh, lr: float = 1e-3):
    """jit the train step with explicit in/out shardings: XLA inserts the
    ICI collectives (psum for dp grads, all-gather/reduce-scatter around
    the tp matmuls)."""
    import jax

    step = make_train_step(cfg, lr)
    params0 = init_params(cfg)
    pshard = param_shardings(params0, mesh)
    dshard = data_sharding(mesh)
    jstep = jax.jit(step, in_shardings=(pshard, dshard),
                    out_shardings=(pshard, None))
    return jstep, pshard, dshard
