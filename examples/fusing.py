"""Comptime kernel fusion (reference examples/fusing/src/lib.rs:16-33)."""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from cubecl_tpu import default_client
from cubecl_tpu.ops import launch_fused


def launch():
    client = default_client()
    n = 1024
    a, b, c = (np.random.rand(n).astype(np.float32) for _ in range(3))
    hs = [client.create(v) for v in (a, b, c)]
    out = client.empty((n,), "float32")
    # one fused kernel: relu((a + b) * c) — ops list is comptime
    launch_fused(client, hs, out, ["add", "mul", "relu"], cube_dim=8)
    r = client.read_one(out)
    ref = np.maximum((a + b) * c, 0)
    print("fused chain max err:", np.abs(r - ref).max())


if __name__ == "__main__":
    launch()
