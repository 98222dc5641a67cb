"""Vision Transformer — third flagship model family (image domain).

Patch embedding is a non-overlapping convolution, which on TPU is
exactly a reshape + MXU matmul (stride == kernel ⇒ no halo), so the
model keeps static shapes and no gathers; encoder blocks are
bidirectional attention + GELU MLP with pre-LN. Shardings follow the
transformer: tp over heads/ffn columns, dp over batch.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

from .transformer import _gelu, _layernorm


@dataclasses.dataclass
class ViTConfig:
    image: int = 32
    patch: int = 4
    channels: int = 3
    d_model: int = 128
    n_heads: int = 4
    n_layers: int = 2
    d_ff: int = 256
    n_classes: int = 10
    dtype: str = "float32"

    @property
    def n_patches(self) -> int:
        return (self.image // self.patch) ** 2

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads


def init_params(cfg: ViTConfig, seed: int = 0) -> Dict[str, Any]:
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(seed)
    ks = iter(jax.random.split(key, 4 + 8 * cfg.n_layers))
    dt = jnp.dtype(cfg.dtype)

    def rnd(shape, scale=0.02):
        return (jax.random.normal(next(ks), shape) * scale).astype(dt)

    d = cfg.d_model
    pdim = cfg.patch * cfg.patch * cfg.channels
    layers = []
    for _ in range(cfg.n_layers):
        layers.append({
            "ln1_g": jnp.ones((d,), dt), "ln1_b": jnp.zeros((d,), dt),
            "wq": rnd((d, d)), "wk": rnd((d, d)), "wv": rnd((d, d)),
            "wo": rnd((d, d)),
            "ln2_g": jnp.ones((d,), dt), "ln2_b": jnp.zeros((d,), dt),
            "w1": rnd((d, cfg.d_ff)), "w2": rnd((cfg.d_ff, d)),
        })
    return {
        "patch_embed": rnd((pdim, d)),
        "cls": rnd((1, 1, d)),
        "pos": rnd((cfg.n_patches + 1, d)),
        "layers": layers,
        "ln_f_g": jnp.ones((d,), dt), "ln_f_b": jnp.zeros((d,), dt),
        "head": rnd((d, cfg.n_classes)),
    }


def _patchify(images, cfg: ViTConfig):
    """(B, H, W, C) -> (B, N, patch*patch*C): stride==kernel conv is a
    pure reshape (no halo) — MXU matmul does the embedding."""
    b, h, w, c = images.shape
    p = cfg.patch
    x = images.reshape(b, h // p, p, w // p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, (h // p) * (w // p), p * p * c)


def _mha(x, layer, cfg: ViTConfig):
    import jax
    import jax.numpy as jnp

    b, s, d = x.shape
    nh, hd = cfg.n_heads, cfg.head_dim
    q = (x @ layer["wq"]).reshape(b, s, nh, hd).transpose(0, 2, 1, 3)
    k = (x @ layer["wk"]).reshape(b, s, nh, hd).transpose(0, 2, 1, 3)
    v = (x @ layer["wv"]).reshape(b, s, nh, hd).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(
        jnp.asarray(hd, jnp.float32)).astype(x.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd",
                   jax.nn.softmax(scores.astype(jnp.float32),
                                  -1).astype(x.dtype), v)
    return o.transpose(0, 2, 1, 3).reshape(b, s, d) @ layer["wo"]


def forward(params, images, cfg: ViTConfig):
    """images (B, H, W, C) float -> logits (B, n_classes)."""
    import jax.numpy as jnp

    x = _patchify(images, cfg) @ params["patch_embed"]      # (B, N, d)
    b = x.shape[0]
    cls = jnp.broadcast_to(params["cls"], (b, 1, cfg.d_model))
    x = jnp.concatenate([cls, x], axis=1) + params["pos"][None]
    for layer in params["layers"]:
        h = _layernorm(x, layer["ln1_g"], layer["ln1_b"])
        x = x + _mha(h, layer, cfg)
        h = _layernorm(x, layer["ln2_g"], layer["ln2_b"])
        x = x + _gelu(h @ layer["w1"]) @ layer["w2"]
    x = _layernorm(x[:, 0], params["ln_f_g"], params["ln_f_b"])  # cls token
    return x @ params["head"]


def loss_fn(params, images, labels, cfg: ViTConfig):
    import jax
    import jax.numpy as jnp

    logits = forward(params, images, cfg).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], -1).mean()


def make_train_step(cfg: ViTConfig, lr: float = 1e-2):
    import jax

    def step(params, images, labels):
        loss, grads = jax.value_and_grad(loss_fn)(params, images, labels,
                                                  cfg)
        new = jax.tree.map(lambda p, g: p - lr * g.astype(p.dtype),
                           params, grads)
        return new, loss

    return step


def param_shardings(params, mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P

    def spec_for(path: str):
        if path.endswith(("wq", "wk", "wv", "w1")):
            return P(None, "tp")
        if path.endswith(("wo", "w2")):
            return P("tp", None)
        return P()

    def walk(obj, path=""):
        if isinstance(obj, dict):
            return {k: walk(v, f"{path}/{k}") for k, v in obj.items()}
        if isinstance(obj, list):
            return [walk(v, f"{path}/{i}") for i, v in enumerate(obj)]
        return NamedSharding(mesh, spec_for(path))

    return walk(params)


def make_sharded_train_step(cfg: ViTConfig, mesh, lr: float = 1e-2):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    step = make_train_step(cfg, lr)
    pshard = param_shardings(init_params(cfg), mesh)
    ishard = NamedSharding(mesh, P("dp"))
    lshard = NamedSharding(mesh, P("dp"))
    return jax.jit(step, in_shardings=(pshard, ishard, lshard),
                   out_shardings=(pshard, None)), pshard, ishard
