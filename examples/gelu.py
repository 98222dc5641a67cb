"""GELU example (reference examples/gelu/src/lib.rs:3-19).

Run: python examples/gelu.py
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import math

import numpy as np

from cubecl_tpu import CubeCount, CubeDim, comptime, cube, default_client
from cubecl_tpu.frontend import ABSOLUTE_POS, ArrayArg, MutSlice, Slice, erf


@cube
def gelu_scalar(x):
    sqrt2 = comptime(math.sqrt(2.0))
    return x * (erf(x / sqrt2) + 1.0) / 2.0


@cube
def gelu_array(inp: Slice, out: MutSlice):
    if ABSOLUTE_POS < inp.len():
        out[ABSOLUTE_POS] = gelu_scalar(inp[ABSOLUTE_POS])


def launch():
    client = default_client()
    data = np.array([-1.0, 0.0, 1.0, 5.0], dtype=np.float32)
    inp = client.create(data)
    out = client.empty((4,), "float32")
    gelu_array.launch_unchecked(
        client, CubeCount(1), CubeDim.new_1d(1),
        ArrayArg(inp, line_size=4), ArrayArg(out, line_size=4, mutable=True))
    result = client.read_one(out)
    # Should be [-0.1587, 0.0000, 0.8413, 5.0000]
    print(f"Executed gelu with runtime {client.properties().identity.name}"
          f" => {result}")


if __name__ == "__main__":
    launch()
