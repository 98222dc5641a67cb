"""Shape-polymorphic (runtime-length) launch ABI tests.

Reference: the metadata ABI — one info buffer of
``[buffer_lengths | shapes | strides]`` means one compile per comptime
config, any runtime shape (cubecl-core/src/codegen/metadata.rs:1-40).
Here: kernels compile against a buffer's CAPACITY; the logical length
rides as an implicit i32 scalar (``ArrayArg(dynamic=True)``) and the
grid width is a runtime value (``CubeCount.runtime``) lowered to Mosaic
dynamic grid bounds. The assertions that matter: ONE ``compile_count``
across many logical lengths, with correct masking semantics.
"""

import numpy as np
import pytest

from cubecl_tpu.frontend import (
    ABSOLUTE_POS,
    CUBE_POS_X,
    ArrayArg,
    MutSlice,
    Slice,
    cube,
    line_max,
    line_sum,
)
from cubecl_tpu.frontend.functions import exp
from cubecl_tpu.runtime.base import CubeCount, CubeDim


@cube
def add_one_dyn(inp: Slice, out: MutSlice):
    if ABSOLUTE_POS < inp.len():
        out[ABSOLUTE_POS] = inp[ABSOLUTE_POS] + 1.0


def _server(client):
    return client._dev.call(lambda s: s)


def test_elementwise_dynamic_one_compile(client):
    """Five logical lengths, one capacity -> ONE compiled kernel."""
    srv = _server(client)
    CAP_LINES, UNITS = 64, 8
    cap = CAP_LINES * 128
    x = np.random.randn(cap).astype(np.float32)
    h_in = client.create(x)
    base = np.full(cap, -7.0, np.float32)
    h_out = client.create(base.copy())

    c0 = srv.compile_count
    for n_lines in (8, 16, 24, 64, 40):
        n = n_lines * 128
        client.write(h_out, base)
        cubes = -(-n_lines // UNITS)
        add_one_dyn.launch_unchecked(
            client, CubeCount.runtime(cubes, CAP_LINES // UNITS),
            CubeDim.new_1d(UNITS),
            ArrayArg(h_in, line_size=128, dynamic=True, length=n),
            ArrayArg(h_out, line_size=128, mutable=True, dynamic=True,
                     length=n))
        r = client.read_one(h_out)
        np.testing.assert_allclose(r[:n], x[:n] + 1.0, atol=1e-6)
        # beyond the logical length the buffer is untouched (the runtime
        # grid stops, and unvisited blocks keep old content via aliasing)
        np.testing.assert_array_equal(r[n:], base[n:])
    assert srv.compile_count - c0 == 1


@cube
def add_one_all(inp: Slice, out: MutSlice):
    out[ABSOLUTE_POS] = inp[ABSOLUTE_POS] + 1.0


def test_checked_masks_against_runtime_length(client):
    """checked launch + full-capacity grid: reads return zero and stores
    drop beyond the RUNTIME logical length (reference read_checked
    semantics against runtime buffer_len, io.rs:12-106)."""
    srv = _server(client)
    CAP_LINES, UNITS = 32, 8
    cap = CAP_LINES * 128
    x = np.random.randn(cap).astype(np.float32)
    h_in = client.create(x)
    base = np.full(cap, -3.0, np.float32)
    h_out = client.create(base.copy())

    c0 = srv.compile_count
    for n_lines in (16, 32, 8):
        n = n_lines * 128
        client.write(h_out, base)
        add_one_all.launch(
            client, CubeCount.runtime(CAP_LINES // UNITS,
                                      CAP_LINES // UNITS),
            CubeDim.new_1d(UNITS),
            ArrayArg(h_in, line_size=128, dynamic=True, length=n),
            ArrayArg(h_out, line_size=128, mutable=True, dynamic=True,
                     length=n))
        r = client.read_one(h_out)
        np.testing.assert_allclose(r[:n], x[:n] + 1.0, atol=1e-6)
        np.testing.assert_array_equal(r[n:], base[n:])
    assert srv.compile_count - c0 == 1


@cube
def block_sum_dyn(inp: Slice, out: MutSlice, lines_per_cube: int):
    # reduce family: each cube block-sums its slab; the runtime grid
    # launches only ceil(n / lines_per_cube) cubes
    s = inp.block_sum(CUBE_POS_X * lines_per_cube, lines_per_cube)
    out[CUBE_POS_X] = s


def test_reduce_dynamic_one_compile(client):
    srv = _server(client)
    CAP_LINES, LPC = 64, 8
    cap = CAP_LINES * 128
    x = np.random.randn(cap).astype(np.float32)
    h_in = client.create(x)
    max_cubes = CAP_LINES // LPC
    h_out = client.create(np.zeros(max_cubes, np.float32))

    c0 = srv.compile_count
    for n_lines in (8, 32, 64, 16):
        n = n_lines * 128
        cubes = n_lines // LPC
        block_sum_dyn.launch_unchecked(
            client, CubeCount.runtime(cubes, max_cubes), CubeDim.new_1d(1),
            ArrayArg(h_in, line_size=128, dynamic=True, length=n),
            ArrayArg(h_out, line_size=1, mutable=True), LPC)
        partials = client.read_one(h_out)
        np.testing.assert_allclose(partials[:cubes].sum(), x[:n].sum(),
                                   rtol=1e-4)
    assert srv.compile_count - c0 == 1


@cube
def softmax_rows_dyn(inp: Slice, out: MutSlice):
    # normalization family: one unit per (128,) row, runtime row count
    r = ABSOLUTE_POS
    if r < inp.len():
        v = inp[r]
        e = exp(v - line_max(v))
        out[r] = e / line_sum(e)


def test_softmax_dynamic_one_compile(client):
    srv = _server(client)
    CAP_ROWS, UNITS = 64, 8
    x = np.random.randn(CAP_ROWS, 128).astype(np.float32)
    h_in = client.create(x.reshape(-1))
    base = np.zeros((CAP_ROWS, 128), np.float32)
    h_out = client.create(base.reshape(-1).copy())

    def ref(rows):
        e = np.exp(rows - rows.max(axis=1, keepdims=True))
        return e / e.sum(axis=1, keepdims=True)

    c0 = srv.compile_count
    for rows in (16, 64, 32, 8):
        n = rows * 128
        client.write(h_out, base.reshape(-1))
        softmax_rows_dyn.launch_unchecked(
            client, CubeCount.runtime(rows // UNITS, CAP_ROWS // UNITS),
            CubeDim.new_1d(UNITS),
            ArrayArg(h_in, line_size=128, dynamic=True, length=n),
            ArrayArg(h_out, line_size=128, mutable=True, dynamic=True,
                     length=n))
        r = client.read_one(h_out).reshape(CAP_ROWS, 128)
        np.testing.assert_allclose(r[:rows], ref(x[:rows]), atol=1e-5)
        np.testing.assert_array_equal(r[rows:], base[rows:])
    assert srv.compile_count - c0 == 1


def test_dynamic_len_is_runtime(client):
    """.len() of a dynamic buffer is a runtime value: __len__ raises, and
    using it as a comptime (e.g. unroll bound) fails cleanly."""
    seen = {}

    @cube
    def probe(inp: Slice, out: MutSlice):
        seen["len"] = inp.len()
        out[0] = inp[0]

    x = np.arange(256, dtype=np.float32)
    h = client.create(x)
    o = client.create(np.zeros(256, np.float32))
    probe.launch_unchecked(
        client, CubeCount.runtime(1, 2), CubeDim.new_1d(1),
        ArrayArg(h, line_size=128, dynamic=True, length=128),
        ArrayArg(o, line_size=128, mutable=True))
    from cubecl_tpu.frontend.element import CubeVal

    assert isinstance(seen["len"], CubeVal)  # runtime, not comptime


def test_runtime_count_validation():
    with pytest.raises(AssertionError):
        CubeCount.runtime(9, 8)
    with pytest.raises(AssertionError):
        CubeCount.runtime(0, 8)


def test_cube_count_builtin_dynamic(client):
    """CUBE_COUNT_X reflects the RUNTIME width under a dynamic grid."""
    from cubecl_tpu.frontend import CUBE_COUNT_X

    @cube
    def grid_probe(out: MutSlice):
        if ABSOLUTE_POS < 1:
            out[0] = CUBE_COUNT_X * 1.0

    o = client.create(np.zeros(128, np.float32))
    for gx in (3, 7):
        grid_probe.launch_unchecked(
            client, CubeCount.runtime(gx, 8), CubeDim.new_1d(1),
            ArrayArg(o, line_size=1, mutable=True))
        assert client.read_one(o)[0] == gx
