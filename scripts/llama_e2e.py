"""End-to-end llama re-measure (round 3: self-hosted functional kernels
+ base-2 attention): train-step tok/s and paged decode-step tok/s.
Decode chained on-device via fori_loop; slope over two chain lengths."""
import sys, time
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from cubecl_tpu.models import llama
from cubecl_tpu.tune.timing import chain_args_time

cfg = llama.LlamaConfig(vocab=8192, d_model=768, n_heads=12,
                        n_kv_heads=4, n_layers=8, d_ff=2048, seq=512)
params = llama.init_params(cfg)
n_par = sum(x.size for x in jax.tree_util.tree_leaves(params))
print(f"params: {n_par/1e6:.1f}M", flush=True)

# ---- train step ----------------------------------------------------------
B, S = 8, 512
step = llama.make_train_step(cfg)
rng = np.random.default_rng(0)
tokens = jnp.asarray(rng.integers(0, cfg.vocab, (B, S)), jnp.int32)
per = chain_args_time(lambda p, t: step(p, t)[1], (params, tokens))
print(f"train step: {per*1e3:.2f} ms = {B*S/per/1e3:.0f}k tok/s",
      flush=True)

# ---- decode step (ctx ~512, paged) --------------------------------------
Bd = 16
cache = llama.init_kv_cache(cfg, Bd, max_pages=4)   # capacity 512
tok = jnp.asarray(rng.integers(0, cfg.vocab, (Bd,)), jnp.int32)
# place sequences at ctx 384 so a 100-step chain stays in capacity
cache = dict(cache, lengths=jnp.full((Bd,), 384, jnp.int32))


@jax.jit
def run_n(params, cache, tok, n):
    def body(i, carry):
        c, _ = carry
        lg, c2 = llama.decode_step(params, c, tok, cfg)
        return (c2, lg)
    z = jnp.zeros((Bd, cfg.vocab), jnp.float32)
    return jax.lax.fori_loop(0, n, body, (cache, z))


def timed(n):
    t0 = time.perf_counter()
    c2, lg = run_n(params, cache, tok, n)
    np.asarray(lg[0, 0])
    return time.perf_counter() - t0


timed(5); timed(5)                      # compile + warm
reps = [(10, None), (110, None)]
t10 = min(timed(10) for _ in range(3))
t110 = min(timed(110) for _ in range(3))
per = (t110 - t10) / 100
print(f"decode step: {per*1e3:.2f} ms = {Bd/per:.0f} tok/s", flush=True)
