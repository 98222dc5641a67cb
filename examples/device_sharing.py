"""Device sharing (reference examples/device_sharing: reusing an existing
wgpu device/queue). The TPU equivalent: interop with an existing jax
program — framework handles wrap jax arrays zero-copy in both
directions."""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from cubecl_tpu import default_client
from cubecl_tpu.runtime.handle import Handle
from cubecl_tpu.ops import launch_gelu


def launch():
    import jax
    import jax.numpy as jnp

    client = default_client()

    # 1. an array produced by existing jax code ...
    x = jnp.linspace(-3, 3, 1024, dtype=jnp.float32)
    x = jax.jit(lambda v: v * 2.0)(x)

    # 2. ... enters the framework zero-copy as a handle
    h = Handle(x)
    out = client.empty((1024,), "float32")
    launch_gelu(client, h, out, line_size=128, cube_dim=8)

    # 3. ... and the result is a jax array again for downstream jax code
    y = out.array
    z = jax.jit(jnp.tanh)(y)
    print("shared-device roundtrip:", np.asarray(z)[:4])


if __name__ == "__main__":
    launch()
