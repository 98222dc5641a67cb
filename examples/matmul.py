"""Autotuned MXU matmul example (BASELINE config 4).

First call tunes tile shapes for the (anchored) shape and persists the
winner; later calls (and later processes) dispatch it directly.
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from cubecl_tpu import default_client
from cubecl_tpu.ops.matmul import matmul_autotuned, matmul_cmma


def launch():
    client = default_client()
    M = N = K = 512
    A = np.random.randn(M, K).astype(np.float32) * 0.1
    B = np.random.randn(K, N).astype(np.float32) * 0.1
    hA = client.create(A.reshape(-1))
    hB = client.create(B.reshape(-1))
    hO = client.empty((M * N,), "float32")

    matmul_autotuned(client, hA, hB, hO, M, N, K)
    r = client.read_one(hO).reshape(M, N)
    print("autotuned matmul max err:", np.abs(r - A @ B).max())

    # the DSL CMMA path (cmma::{fill,load,execute,store} parity)
    hO2 = client.empty((M * N,), "float32")
    matmul_cmma(client, hA, hB, hO2, M, N, K, tile=128)
    r2 = client.read_one(hO2).reshape(M, N)
    print("cmma matmul max err:", np.abs(r2 - A @ B).max())


if __name__ == "__main__":
    launch()
