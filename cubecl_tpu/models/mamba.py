"""Mamba (selective SSM) model family.

Third architecture family next to the attention transformers
(transformer.py, llama.py) and ViT: shows the framework carrying a
non-attention sequence model where the hot op is a scan, not a
matmul-softmax — and where TPU decode is O(1) state per token (no KV
cache growth; compare llama.py's paged cache machinery).

TPU-native choices: the selective scan runs as an associative scan
(ops/ssm.py) — log-depth elementwise sweeps, XLA/VPU-shaped — and the
depthwise causal conv is K shifted adds (K=4), not a conv primitive,
so the whole block fuses. tp shards d_inner (in/out projection
columns/rows); dp/sp shard batch/sequence, with the scan's cross-shard
carry left to GSPMD's scan partitioning.

Reference analogue: none (the reference ships no models, SURVEY §2.10
examples are kernel demos); parity target is the *capability* that a
user can train+serve this family end-to-end on the framework.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

import numpy as np

__all__ = ["MambaConfig", "init_params", "forward", "loss_fn",
           "make_train_step", "make_sharded_train_step",
           "decode_init", "decode_step"]


@dataclasses.dataclass
class MambaConfig:
    vocab: int = 256
    d_model: int = 128
    n_layers: int = 2
    d_state: int = 16          # N
    d_conv: int = 4            # depthwise causal kernel width
    expand: int = 2
    seq: int = 128
    rms_eps: float = 1e-5
    # "auto" routes sequence-mode scans through the single-pass pallas
    # chunked kernel (hierarchical in-tile scan, 4.4x XLA's
    # associative scan at the bench shape) when the shape profits:
    # L >= 256 and D·N lane-tileable. "assoc"/"chunked" force a path.
    scan_impl: str = "auto"

    @property
    def d_inner(self) -> int:
        return self.expand * self.d_model

    @property
    def dt_rank(self) -> int:
        return max(1, math.ceil(self.d_model / 16))


def init_params(cfg: MambaConfig, seed: int = 0) -> Dict[str, Any]:
    import jax.numpy as jnp

    rng = np.random.RandomState(seed)
    di, N, R = cfg.d_inner, cfg.d_state, cfg.dt_rank

    def lin(m, n, scale=None):
        s = scale if scale is not None else 1.0 / math.sqrt(m)
        return jnp.asarray(rng.randn(m, n).astype(np.float32) * s)

    layers = []
    for _ in range(cfg.n_layers):
        # S4D-real initialization: A row d = -(1..N)
        A_log = jnp.log(jnp.tile(jnp.arange(1, N + 1, dtype=jnp.float32),
                                 (di, 1)))
        dt_bias = jnp.asarray(
            np.log(np.expm1(np.clip(
                np.exp(rng.uniform(np.log(1e-3), np.log(1e-1), di)),
                1e-4, None))).astype(np.float32))
        layers.append({
            "rms": jnp.ones((cfg.d_model,), jnp.float32),
            "in_proj": lin(cfg.d_model, 2 * di),
            "conv_w": jnp.asarray(
                rng.randn(cfg.d_conv, di).astype(np.float32)
                / math.sqrt(cfg.d_conv)),
            "conv_b": jnp.zeros((di,), jnp.float32),
            "x_proj": lin(di, R + 2 * N),
            "dt_w": lin(R, di, scale=R ** -0.5),
            "dt_bias": dt_bias,
            "A_log": A_log,
            "D": jnp.ones((di,), jnp.float32),
            "out_proj": lin(di, cfg.d_model),
        })
    return {
        "embed": jnp.asarray(
            rng.randn(cfg.vocab, cfg.d_model).astype(np.float32) * 0.02),
        "layers": layers,
        "rms_out": jnp.ones((cfg.d_model,), jnp.float32),
    }


def _rmsnorm(x, g, eps):
    import jax.numpy as jnp

    var = jnp.mean(jnp.square(x.astype(jnp.float32)), -1, keepdims=True)
    return (x * jnp.reciprocal(jnp.sqrt(var + eps)).astype(x.dtype)) * g


def _causal_dwconv(x, w, b):
    """Depthwise causal conv over time as K shifted adds — fuses into
    the surrounding elementwise graph instead of lowering to a conv op.
    x (B, L, D), w (K, D) -> (B, L, D)."""
    import jax.numpy as jnp

    K = w.shape[0]
    y = x * w[K - 1]
    for k in range(1, K):
        shifted = jnp.pad(x[:, :-k], ((0, 0), (k, 0), (0, 0)))
        y = y + shifted * w[K - 1 - k]
    return y + b


def _block_ssm(xz, layer, cfg: MambaConfig, conv_state=None, h=None):
    """Shared block body. Sequence mode: xz (B, L, 2*di), returns y.
    Decode mode (conv_state/h given): xz (B, 1, 2*di), returns
    (y, conv_state', h')."""
    import jax
    import jax.numpy as jnp

    from ..ops.ssm import (selective_scan, selective_scan_chunked,
                           ssm_decode_step)

    di, N, R = cfg.d_inner, cfg.d_state, cfg.dt_rank
    x, z = jnp.split(xz, 2, axis=-1)                       # (B,L,di)
    decode = conv_state is not None

    if decode:
        # rolling window of the last K-1 inputs + the new one
        window = jnp.concatenate([conv_state, x], axis=1)  # (B,K,di)
        conv_state = window[:, 1:]
        x = (window * layer["conv_w"][None]).sum(1, keepdims=True) \
            + layer["conv_b"]
    else:
        x = _causal_dwconv(x, layer["conv_w"], layer["conv_b"])
    x = jax.nn.silu(x)

    proj = x @ layer["x_proj"]                             # (B,L,R+2N)
    dt, Bc, Cc = jnp.split(proj, [R, R + N], axis=-1)
    delta = jax.nn.softplus(dt @ layer["dt_w"] + layer["dt_bias"])
    A = -jnp.exp(layer["A_log"])                           # (di,N)

    if decode:
        h, y = ssm_decode_step(h, x[:, 0], delta[:, 0], A, Bc[:, 0],
                               Cc[:, 0], layer["D"])
        y = y[:, None]
    else:
        L = x.shape[1]
        use_chunked = (cfg.scan_impl == "chunked"
                       or (cfg.scan_impl == "auto" and L >= 256
                           and L % 64 == 0
                           and jax.default_backend() == "tpu"))
        if use_chunked:
            # one HBM pass over the discretized (a, u) arrays instead
            # of log2(L) assoc-scan sweeps; interpret never triggers
            # here (auto requires the tpu backend; forcing "chunked"
            # on CPU runs the real Mosaic interpreter via interpret)
            y = selective_scan_chunked(
                x, delta, A, Bc, Cc, layer["D"],
                interpret=jax.default_backend() != "tpu")
        else:
            y = selective_scan(x, delta, A, Bc, Cc, layer["D"])
    y = y * jax.nn.silu(z)
    out = y @ layer["out_proj"]
    return (out, conv_state, h) if decode else out


def forward(params, tokens, cfg: MambaConfig):
    """Logits for (B, L) int32 tokens."""
    x = params["embed"][tokens]
    for layer in params["layers"]:
        res = _block_ssm(_rmsnorm(x, layer["rms"], cfg.rms_eps)
                         @ layer["in_proj"], layer, cfg)
        x = x + res
    x = _rmsnorm(x, params["rms_out"], cfg.rms_eps)
    return x @ params["embed"].T


def loss_fn(params, tokens, cfg: MambaConfig):
    import jax
    import jax.numpy as jnp

    logits = forward(params, tokens[:, :-1], cfg)
    targets = tokens[:, 1:]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
    return -jnp.take_along_axis(logp, targets[..., None], -1).mean()


def make_train_step(cfg: MambaConfig, lr: float = 1e-3):
    import jax

    def step(params, tokens):
        loss, grads = jax.value_and_grad(loss_fn)(params, tokens, cfg)
        new = jax.tree_util.tree_map(lambda p, g: p - lr * g, params, grads)
        return new, loss

    return step


def param_shardings(params, mesh):
    """tp shards d_inner: in_proj/x_proj columns, out_proj/A/D rows."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    def spec_for(path: str, leaf):
        if "in_proj" in path:
            return P(None, "tp")
        if any(k in path for k in ("out_proj", "A_log", "x_proj")):
            return P("tp", None)
        if any(k in path for k in ("conv_w",)):
            return P(None, "tp")
        if any(k in path for k in ("conv_b", "dt_bias", "/D")):
            return P("tp")
        if "dt_w" in path:
            return P(None, "tp")
        return P()

    def walk(obj, path=""):
        if isinstance(obj, dict):
            return {k: walk(v, f"{path}/{k}") for k, v in obj.items()}
        if isinstance(obj, list):
            return [walk(v, f"{path}/{i}") for i, v in enumerate(obj)]
        return NamedSharding(mesh, spec_for(path, obj))

    return walk(params)


def make_sharded_train_step(cfg: MambaConfig, mesh, lr: float = 1e-3):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    step = make_train_step(cfg, lr)
    pshard = param_shardings(init_params(cfg), mesh)
    dshard = NamedSharding(mesh, P("dp"))
    jstep = jax.jit(step, in_shardings=(pshard, dshard),
                    out_shardings=(pshard, None))
    return jstep, pshard, dshard


# ---------------------------------------------------------------------------
# Recurrent decode: O(1) state per token
# ---------------------------------------------------------------------------


def decode_init(cfg: MambaConfig, batch: int):
    """Constant-size decode state: per layer a (B, K-1, di) conv window
    + a (B, di, N) SSM state. Total bytes are independent of generated
    length — the architectural contrast with llama.py's paged KV."""
    import jax.numpy as jnp

    return [{"conv": jnp.zeros((batch, cfg.d_conv - 1, cfg.d_inner),
                               jnp.float32),
             "h": jnp.zeros((batch, cfg.d_inner, cfg.d_state),
                            jnp.float32)}
            for _ in range(cfg.n_layers)]


def decode_step(params, state, token, cfg: MambaConfig):
    """One token (B,) int32 -> (logits (B, vocab), state')."""
    x = params["embed"][token][:, None]                    # (B,1,D)
    new_state = []
    for layer, st in zip(params["layers"], state):
        xz = _rmsnorm(x, layer["rms"], cfg.rms_eps) @ layer["in_proj"]
        out, conv, h = _block_ssm(xz, layer, cfg,
                                  conv_state=st["conv"], h=st["h"])
        x = x + out
        new_state.append({"conv": conv, "h": h})
    x = _rmsnorm(x, params["rms_out"], cfg.rms_eps)
    return (x @ params["embed"].T)[:, 0], new_state
