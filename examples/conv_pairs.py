"""Small-channel conv chains in the pair-packed layout.

XLA's conv is the speed of light for channel-rich NHWC shapes, but at
C=64 it underfills the 128-lane MXU contraction by 2x. `conv2d_pairs`
packs TWO adjacent W-pixels on the lane axis instead (BENCH_NOTES
"Pair-packed conv": 107 TF vs 78-82 XLA at 32x56x56x64, v5e).

The layout contract this example demonstrates: the NHWC<->packed
relayout is real HBM traffic on TPU (64-channel arrays are lane-padded
to 128), so a STACK of C<=64 convs should pack once, chain
`conv2d_pairs_packed` (+ elementwise nonlinearities, which work
unchanged on the packed layout), and unpack once at the end.

Run: python examples/conv_pairs.py          (TPU; ~1 min of compiles)
     PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/conv_pairs.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cubecl_tpu.ops import conv2d_pairs_packed, pack_pairs, unpack_pairs

INTERPRET = jax.default_backend() == "cpu"

N, H, W, C = (4, 28, 28, 64) if INTERPRET else (32, 56, 56, 64)
DEPTH = 3

rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((N, H, W, C)) * 0.1, jnp.bfloat16)
ws = [jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.1, jnp.bfloat16)
      for _ in range(DEPTH)]


@jax.jit
def stack_packed(x, ws):
    """Pack once, chain packed convs + ReLU, unpack once."""
    xp = pack_pairs(x)
    for w in ws:
        xp = conv2d_pairs_packed(xp, w, H, interpret=INTERPRET)
        xp = jax.nn.relu(xp)          # elementwise ops ride the packed
        #                               layout unchanged — no relayout
    return unpack_pairs(xp, H, W, C)


@jax.jit
def stack_xla(x, ws):
    for w in ws:
        x = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(x.dtype)
        x = jax.nn.relu(x)
    return x


got = np.asarray(stack_packed(x, ws).astype(jnp.float32))
ref = np.asarray(stack_xla(x, ws).astype(jnp.float32))
err = float(np.max(np.abs(got - ref)))
print(f"{DEPTH}-layer packed conv stack: max |err| vs XLA = {err:.4f} "
      f"(bf16 envelope)")
assert err < 0.15, err

if not INTERPRET:
    from cubecl_tpu.tune.timing import chain_args_time

    fl = 2 * N * H * W * 9 * C * C * DEPTH
    per = chain_args_time(lambda a: stack_packed(a, ws), (x,))
    per2 = chain_args_time(lambda a: stack_xla(a, ws), (x,))
    print(f"packed chain: {fl / per / 1e12:.1f} TF   "
          f"XLA NHWC chain: {fl / per2 / 1e12:.1f} TF   "
          f"speedup {per2 / per:.2f}x")
