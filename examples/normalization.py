"""Normalization example (reference examples/normalization/src/lib.rs)."""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from cubecl_tpu import default_client
from cubecl_tpu.ops import launch_layernorm, launch_normalize, launch_softmax


def launch():
    client = default_client()
    rows, R = 4, 1024
    x = np.random.randn(rows, R).astype(np.float32)
    i = client.create(x.reshape(-1))

    o = client.empty((rows * R,), "float32")
    launch_normalize(client, i, o, rows, R)
    r = client.read_one(o).reshape(rows, R)
    print("L2-normalize err:",
          np.abs(r - x / np.linalg.norm(x, 1, keepdims=True)).max())

    o = client.empty((rows * R,), "float32")
    launch_softmax(client, i, o, rows, R)
    r = client.read_one(o).reshape(rows, R)
    e = np.exp(x - x.max(1, keepdims=True))
    print("softmax err:", np.abs(r - e / e.sum(1, keepdims=True)).max())

    g = np.ones(R, np.float32)
    b = np.zeros(R, np.float32)
    o = client.empty((rows * R,), "float32")
    launch_layernorm(client, i, client.create(g), client.create(b), o,
                     rows, R)
    r = client.read_one(o).reshape(rows, R)
    e = (x - x.mean(1, keepdims=True)) / np.sqrt(x.var(1, keepdims=True)
                                                 + 1e-5)
    print("layernorm err:", np.abs(r - e).max())


if __name__ == "__main__":
    launch()
