"""Device-side quantization kernels.

Reference: cubecl-std/src/quant/{dequantize,round,view}.rs. One cube per
quant block so block scales are cube-uniform loads; tensor-level uses the
reduction tree for absmax.
"""

from __future__ import annotations

import numpy as np

from ..frontend import (
    CUBE_POS_X,
    UNIT_POS,
    ArrayArg,
    MutSlice,
    ScalarArg,
    Slice,
    cast,
    clamp,
    cube,
    cube_range,
    round_,
)
from ..ir.types import f32, i8
from ..runtime.base import CubeCount, CubeDim
from ..runtime.handle import Handle
from .quant import QuantLevel, QuantScheme

CD = 8


@cube
def dequantize_block_kernel(values: Slice, scales: Slice, out: MutSlice,
                            iters: int):
    """One cube per quant block; the block scale is a uniform load."""
    s = scales[CUBE_POS_X]
    base = CUBE_POS_X * (iters * 8)
    for k in cube_range(0, iters):
        idx = base + k * 8 + UNIT_POS
        out[idx] = cast(values[idx], f32) * s


@cube
def quantize_block_kernel(x: Slice, values: MutSlice, scales: MutSlice,
                          iters: int, rmax: float):
    """Symmetric per-block int8 quantization: absmax → scale → round."""
    from ..frontend import abs_, max_, line_max, plane_max

    base = CUBE_POS_X * (iters * 8)
    m = abs_(x[base + UNIT_POS])
    for k in cube_range(0, iters):
        m = max_(m, abs_(x[base + k * 8 + UNIT_POS]))
    amax = plane_max(line_max(m))
    scale = max_(amax / rmax, 1e-12)
    if UNIT_POS == 0:
        scales[CUBE_POS_X] = scale
    inv = 1.0 / scale
    for k in cube_range(0, iters):
        idx = base + k * 8 + UNIT_POS
        q = clamp(round_(x[idx] * inv), -rmax - 1.0, rmax)
        values[idx] = cast(q, i8)


@cube
def dequantize_tensor_kernel(values: Slice, out: MutSlice, scale):
    base = CUBE_POS_X * 8
    idx = base + UNIT_POS
    out[idx] = cast(values[idx], f32) * scale


def _block_plan(n: int, block: int, line: int):
    assert n % block == 0, f"{n} not divisible by block {block}"
    assert block % (line * CD) == 0, \
        f"block {block} must tile by {CD} lines of {line}"
    return n // block, block // (line * CD)


def quantize(client, x: Handle, scheme: QuantScheme,
             line_size: int = 128):
    """→ (values, scales) handles."""
    n = int(np.prod(x.shape))
    rmax = scheme.range_max()
    block = scheme.block_size if scheme.level == QuantLevel.BLOCK else n
    line = line_size if block % (line_size * CD) == 0 else 1
    cubes, iters = _block_plan(n, block, line)
    values = client.empty((n,), "int8")
    scales = client.empty((cubes,), "float32")
    quantize_block_kernel.launch_unchecked(
        client, CubeCount(cubes), CubeDim.new_1d(CD),
        ArrayArg(x, line_size=line), ArrayArg(values, line_size=line,
                                              mutable=True),
        ArrayArg(scales, mutable=True), iters, rmax)
    return values, scales


def dequantize(client, values: Handle, scales: Handle,
               scheme: QuantScheme, line_size: int = 128) -> Handle:
    n = int(np.prod(values.shape))
    block = scheme.block_size if scheme.level == QuantLevel.BLOCK else n
    line = line_size if block % (line_size * CD) == 0 else 1
    cubes, iters = _block_plan(n, block, line)
    out = client.empty((n,), "float32")
    dequantize_block_kernel.launch_unchecked(
        client, CubeCount(cubes), CubeDim.new_1d(CD),
        ArrayArg(values, line_size=line), ArrayArg(scales),
        ArrayArg(out, line_size=line, mutable=True), iters)
    return out
