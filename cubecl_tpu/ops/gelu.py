"""GELU elementwise kernel (BASELINE config 1; reference examples/gelu/
src/lib.rs:3-19)."""

from __future__ import annotations

import math

import numpy as np

from ..frontend import (
    ABSOLUTE_POS,
    CUBE_POS_X,
    UNIT_POS,
    ArrayArg,
    MutSlice,
    Slice,
    cube,
    cube_range,
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


@cube
def gelu_inplace(buf: MutSlice, iters: int, stride: int):
    """In-place fat-block gelu: one mutable buffer (emitter aliases it —
    no loop-carry copy inside jit loops, see docs/performance.md rule 3)
    swept as iters (stride, 128) slabs per grid step (fat windows, rule
    2; line stays 128, rule 1)."""
    base = CUBE_POS_X * (iters * stride)
    for k in cube_range(0, iters):
        idx = base + k * stride + UNIT_POS
        buf[idx] = gelu_scalar(buf[idx])


def launch_gelu(client, inp: Handle, out: Handle, line_size: int = 128,
                cube_dim: int = 64, checked: bool = False) -> None:
    n = int(np.prod(inp.shape))
    if (out is inp or out.id == inp.id) and n % 128 == 0 and not checked:
        # in-place fast path: fat (1024, 128) slabs, ~4MB windows
        lines = n // 128
        units = min(1024, lines)
        # decrementing by 8 keeps the cube dim sublane-friendly; lines
        # with no multiple-of-8 divisor <= 1024 (e.g. 128*1025) fall
        # through to the generic path instead of dividing by zero
        while lines % units and units > 8:
            units -= 8
        if lines % units == 0:
            iters = 1
            # 8MB slabs win (u=1024 x it=16: 663 GB/s vs 558 at it=8,
            # 511 at it=32 — measured v5e 256MB sweep); 16MB
            # over-commits VMEM
            for it in (16, 8, 4, 2):
                if lines % (units * it) == 0:
                    iters = it
                    break
            gelu_inplace.launch_unchecked(
                client, CubeCount(lines // (units * iters)),
                CubeDim.new_1d(units),
                ArrayArg(inp, line_size=128, mutable=True), iters, units)
            return
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
