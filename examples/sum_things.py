"""Reduction variants (reference examples/sum_things/src/lib.rs:6-100):
basic loop w/ unroll, plane_sum, comptime trait-style dispatch."""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from cubecl_tpu import CubeCount, CubeDim, cube, default_client
from cubecl_tpu.frontend import (
    UNIT_POS,
    ArrayArg,
    MutSlice,
    Slice,
    cube_range,
    plane_sum,
)


@cube
def sum_basic(inp: Slice, out: MutSlice, end=None):
    unroll = end is not None
    n = end if end is not None else inp.len()
    acc = 0.0
    if unroll:
        for i in range(n):          # comptime -> unrolled
            acc = acc + inp[i]
    else:
        for i in cube_range(0, n):  # traced loop
            acc = acc + inp[i]
    out[UNIT_POS] = acc


@cube
def sum_subgroup(inp: Slice, out: MutSlice, subgroup: bool, end=None):
    if subgroup:
        out[UNIT_POS] = plane_sum(inp[UNIT_POS])
    else:
        sum_basic(inp, out, end)


# trait-style dispatch: strategies are comptime cube functions
@cube
def sum_plane_kind(inp: Slice):
    return plane_sum(inp[UNIT_POS])


@cube
def sum_basic_kind(inp: Slice):
    acc = 0.0
    for i in cube_range(0, inp.len()):
        acc = acc + inp[i]
    return acc


@cube
def sum_trait(inp: Slice, out: MutSlice, kind):
    out[UNIT_POS] = kind(inp)


def launch():
    client = default_client()
    data = np.arange(8, dtype=np.float32)
    for name, launcher in [
        ("basic", lambda i, o: sum_basic.launch_unchecked(
            client, CubeCount(1), CubeDim.new_1d(8), ArrayArg(i),
            ArrayArg(o, mutable=True), 8)),
        ("subgroup", lambda i, o: sum_subgroup.launch_unchecked(
            client, CubeCount(1), CubeDim.new_1d(8), ArrayArg(i),
            ArrayArg(o, mutable=True), True)),
        ("trait:plane", lambda i, o: sum_trait.launch_unchecked(
            client, CubeCount(1), CubeDim.new_1d(8), ArrayArg(i),
            ArrayArg(o, mutable=True), sum_plane_kind)),
        ("trait:basic", lambda i, o: sum_trait.launch_unchecked(
            client, CubeCount(1), CubeDim.new_1d(8), ArrayArg(i),
            ArrayArg(o, mutable=True), sum_basic_kind)),
    ]:
        i = client.create(data)
        o = client.empty((8,), "float32")
        launcher(i, o)
        print(f"sum[{name}] => {client.read_one(o)[0]}")


if __name__ == "__main__":
    launch()
