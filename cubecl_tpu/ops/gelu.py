"""GELU elementwise kernel (BASELINE config 1; reference examples/gelu/
src/lib.rs:3-19)."""

from __future__ import annotations

import math

import numpy as np

from ..frontend import (
    ABSOLUTE_POS,
    ArrayArg,
    MutSlice,
    Slice,
    cube,
    erf,
)
from ..frontend.comptime import comptime
from ..runtime.base import CubeCount, CubeDim
from ..runtime.handle import Handle


@cube
def gelu_scalar(x):
    """exact gelu via erf (comptime sqrt(2), reference gelu_scalar)."""
    sqrt2 = comptime(math.sqrt(2.0))
    return x * (erf(x / sqrt2) + 1.0) / 2.0


@cube
def gelu_array(inp: Slice, out: MutSlice):
    if ABSOLUTE_POS < inp.len():
        out[ABSOLUTE_POS] = gelu_scalar(inp[ABSOLUTE_POS])


@cube
def gelu_array_exact(inp: Slice, out: MutSlice):
    """no-guard variant for exactly-tiled launches (fast path)."""
    out[ABSOLUTE_POS] = gelu_scalar(inp[ABSOLUTE_POS])


def launch_gelu(client, inp: Handle, out: Handle, line_size: int = 128,
                cube_dim: int = 64, checked: bool = False) -> None:
    n = int(np.prod(inp.shape))
    epc = line_size * cube_dim
    if n % epc == 0 and not checked:
        cubes = n // epc
        gelu_array_exact.launch_unchecked(
            client, CubeCount(cubes), CubeDim.new_1d(cube_dim),
            ArrayArg(inp, line_size=line_size),
            ArrayArg(out, line_size=line_size, mutable=True))
    else:
        line = line_size if n % line_size == 0 else 1
        cubes = -(-n // (line * cube_dim))
        gelu_array.launch(
            client, CubeCount(cubes), CubeDim.new_1d(cube_dim),
            ArrayArg(inp, line_size=line),
            ArrayArg(out, line_size=line, mutable=True))
