"""Second kernel-matrix file: minifloats, saturating, short-circuit,
tensors/metadata, barriers/async copy, atomics (cas/swap/bitwise),
shuffles/ballot, enums — completing the reference runtime_tests coverage
(SURVEY §4)."""

import enum

import numpy as np
import pytest

from cubecl_tpu import CubeCount, CubeDim, cube
from cubecl_tpu.frontend import (
    ABSOLUTE_POS,
    UNIT_POS,
    ArrayArg,
    Barrier,
    MutSlice,
    MutTensor,
    SharedMemory,
    Slice,
    Tensor,
    TensorArg,
    cast,
    cube_range,
    plane_ballot,
    plane_broadcast,
    plane_elect,
    plane_shuffle_down,
    plane_shuffle_up,
    plane_shuffle_xor,
    saturating_add,
    saturating_sub,
    sync_cube,
)
from cubecl_tpu.frontend.sync import (
    atomic_and,
    atomic_cas,
    atomic_or,
    atomic_store,
    atomic_swap,
    atomic_xor,
)
from cubecl_tpu.ir.types import bf16, f32, fp8_e4m3, i8, i32, u8, u32


def run1(client, kernel, arrays, scalars=(), comptimes=(), cubes=1, cd=8,
         lines=None, checked=False):
    handles = [client.create(a) for a, _m in arrays]
    args = []
    for (a, m), h in zip(arrays, handles):
        line = 1 if lines is None else lines[len(args)]
        args.append(ArrayArg(h, line_size=line, mutable=m))
    from cubecl_tpu.frontend import ScalarArg

    args += [ScalarArg(v, t) for v, t in scalars]
    args += list(comptimes)
    launch = kernel.launch if checked else kernel.launch_unchecked
    launch(client, CubeCount(cubes), CubeDim.new_1d(cd), *args)
    return [client.read_one(h) for h in handles]


# ------------------------------------------------------------- minifloats


@cube
def k_fp8_roundtrip(inp: Slice, out: MutSlice):
    x = inp[UNIT_POS]
    q = cast(x, fp8_e4m3)
    out[UNIT_POS] = cast(q, f32)


def test_minifloat_fp8(client):
    x = np.array([1.0, -2.0, 0.5, 448.0, 0.0625, -16.0, 3.25, 0.0],
                 np.float32)
    res = run1(client, k_fp8_roundtrip,
               [(x, False), (np.zeros(8, np.float32), True)])
    import ml_dtypes

    expect = x.astype(ml_dtypes.float8_e4m3fn).astype(np.float32)
    np.testing.assert_array_equal(res[1], expect)


@cube
def k_bf16_compute(a: Slice, b: Slice, out: MutSlice):
    out[UNIT_POS] = a[UNIT_POS] * b[UNIT_POS] + a[UNIT_POS]


def test_bf16_compute(client):
    import ml_dtypes

    a = np.random.rand(8).astype(ml_dtypes.bfloat16)
    b = np.random.rand(8).astype(ml_dtypes.bfloat16)
    res = run1(client, k_bf16_compute,
               [(a, False), (b, False),
                (np.zeros(8, ml_dtypes.bfloat16), True)])
    expect = (a * b + a)
    np.testing.assert_allclose(res[2].astype(np.float32),
                               expect.astype(np.float32), rtol=2e-2)


# ------------------------------------------------------------- saturating


@cube
def k_sat(a: Slice, b: Slice, out: MutSlice, sub: bool):
    if sub:
        out[UNIT_POS] = saturating_sub(a[UNIT_POS], b[UNIT_POS])
    else:
        out[UNIT_POS] = saturating_add(a[UNIT_POS], b[UNIT_POS])


@pytest.mark.parametrize("dtype,sub", [("uint8", False), ("uint8", True),
                                       ("int8", False)])
def test_saturating(client, dtype, sub):
    if dtype == "int8":
        a = np.array([100, 5, 120, -100, 1, 127, 99, 0], dtype)
        b = np.array([100, 120, 100, -50, 2, 127, 99, 0], dtype)
    else:
        a = np.array([250, 5, 200, 100, 1, 127, 99, 0], dtype)
        b = np.array([10, 250, 100, 50, 2, 127, 99, 0], dtype)
    res = run1(client, k_sat, [(a, False), (b, False),
                               (np.zeros(8, dtype), True)],
               comptimes=(sub,))
    wide = a.astype(np.int32) - b.astype(np.int32) if sub else \
        a.astype(np.int32) + b.astype(np.int32)
    info = np.iinfo(dtype)
    expect = np.clip(wide, info.min, info.max).astype(dtype)
    np.testing.assert_array_equal(res[2], expect)


# ---------------------------------------------------------- short circuit


@cube
def k_short_circuit(a: Slice, out: MutSlice, flag: bool):
    x = a[UNIT_POS]
    # comptime `flag and ...`: right side only traces when flag is True
    if flag and x > 0.5:
        out[UNIT_POS] = 1.0
    else:
        out[UNIT_POS] = 0.0


@pytest.mark.parametrize("flag", [True, False])
def test_short_circuit(client, flag):
    a = np.array([0.1, 0.9, 0.6, 0.2, 0.8, 0.3, 0.7, 0.4], np.float32)
    res = run1(client, k_short_circuit,
               [(a, False), (np.zeros(8, np.float32), True)],
               comptimes=(flag,))
    expect = ((a > 0.5) & flag).astype(np.float32)
    np.testing.assert_array_equal(res[1], expect)


@cube
def k_runtime_and_or(a: Slice, b: Slice, out: MutSlice):
    x = a[UNIT_POS]
    y = b[UNIT_POS]
    r = 0.0
    if x > 0.0 and y > 0.0:
        r = 1.0
    if x > 0.5 or y > 0.5:
        r = r + 2.0
    out[UNIT_POS] = r


def test_runtime_bool_ops(client):
    a = np.array([0.1, -0.9, 0.6, 0.2, 0.8, -0.3, 0.7, 0.4], np.float32)
    b = np.array([0.9, 0.6, -0.3, 0.2, 0.8, 0.3, 0.9, -0.4], np.float32)
    res = run1(client, k_runtime_and_or,
               [(a, False), (b, False), (np.zeros(8, np.float32), True)])
    expect = ((a > 0) & (b > 0)).astype(np.float32) + \
        2 * ((a > 0.5) | (b > 0.5)).astype(np.float32)
    np.testing.assert_array_equal(res[2], expect)


# --------------------------------------------------------------- tensors


@cube
def k_tensor_2d(t: Tensor, out: MutTensor):
    r = UNIT_POS // 4
    c = UNIT_POS % 4
    out[c, r] = t[r, c]  # transpose via nd indexing


def test_tensor_nd_indexing(client):
    x = np.arange(8, dtype=np.float32).reshape(2, 4)
    h = client.create(x.reshape(-1))
    o = client.empty((8,), "float32")
    k_tensor_2d.launch_unchecked(
        client, CubeCount(1), CubeDim.new_1d(8),
        TensorArg(h, shape=(2, 4)),
        TensorArg(o, shape=(4, 2), mutable=True))
    np.testing.assert_array_equal(client.read_one(o).reshape(4, 2), x.T)


@cube
def k_tensor_meta(t: Tensor, out: MutSlice):
    out[UNIT_POS] = cast(t.shape(0) * 100 + t.shape(1) * 10
                         + t.stride(0), f32)


def test_tensor_metadata_comptime(client):
    h = client.create(np.zeros(12, np.float32))
    o = client.empty((8,), "float32")
    k_tensor_meta.launch_unchecked(
        client, CubeCount(1), CubeDim.new_1d(8),
        TensorArg(h, shape=(3, 4)), ArrayArg(o, mutable=True))
    np.testing.assert_array_equal(client.read_one(o), 3 * 100 + 4 * 10 + 4)


# ------------------------------------------------- barrier + async copy


@cube
def k_async_copy(inp: Slice, out: MutSlice):
    sh = SharedMemory(f32, 8)
    bar = Barrier()
    bar.memcpy_async(sh, inp)
    bar.arrive_and_wait()
    out[UNIT_POS] = sh[UNIT_POS] * 2.0


def test_barrier_memcpy_async(client):
    x = np.arange(8, dtype=np.float32)
    res = run1(client, k_async_copy,
               [(x, False), (np.zeros(8, np.float32), True)])
    np.testing.assert_array_equal(res[1], x * 2)


# ---------------------------------------------------------------- atomics


@cube
def k_atomic_misc(out: MutSlice, op: str):
    if op == "swap":
        atomic_store(out, 0, 5.0)
        atomic_swap(out, 0, 9.0)
    elif op == "cas":
        atomic_store(out, 0, 3.0)
        atomic_cas(out, 0, 3.0, 7.0)  # matches -> 7
        atomic_cas(out, 0, 3.0, 11.0)  # no match -> stays 7


@pytest.mark.parametrize("op,expect", [("swap", 9.0), ("cas", 7.0)])
def test_atomic_swap_cas(client, op, expect):
    res = run1(client, k_atomic_misc, [(np.zeros(1, np.float32), True)],
               comptimes=(op,), cd=1)
    np.testing.assert_allclose(res[0], expect)


@cube
def k_atomic_bitwise(out: MutSlice, a: Slice, op: str):
    if op == "and":
        atomic_and(out, 0, a[UNIT_POS])
    elif op == "or":
        atomic_or(out, 0, a[UNIT_POS])
    elif op == "xor":
        atomic_xor(out, 0, a[UNIT_POS])


@pytest.mark.parametrize("op", ["and", "or", "xor"])
def test_atomic_bitwise(client, op):
    a = np.array([0b1111, 0b1010, 0b0110, 0b0011] * 2, np.int32)
    init = np.array([0b1111 if op == "and" else 0], np.int32)
    res = run1(client, k_atomic_bitwise, [(init, True), (a, False)],
               comptimes=(op,))
    import functools
    import operator

    fn = {"and": operator.and_, "or": operator.or_,
          "xor": operator.xor}[op]
    expect = functools.reduce(fn, a.tolist(), int(init[0]))
    assert res[0][0] == expect


# ------------------------------------------------------ shuffles / ballot


@cube
def k_shuffle(a: Slice, out: MutSlice, kind: str):
    x = a[UNIT_POS]
    if kind == "xor":
        out[UNIT_POS] = plane_shuffle_xor(x, 1)
    elif kind == "up":
        out[UNIT_POS] = plane_shuffle_up(x, 2)
    elif kind == "down":
        out[UNIT_POS] = plane_shuffle_down(x, 2)
    elif kind == "broadcast":
        out[UNIT_POS] = plane_broadcast(x, 3)


@pytest.mark.parametrize("kind", ["xor", "up", "down", "broadcast"])
def test_shuffles(client, kind):
    a = np.arange(8, dtype=np.float32)
    res = run1(client, k_shuffle,
               [(a, False), (np.zeros(8, np.float32), True)],
               comptimes=(kind,))
    lanes = np.arange(8)
    # up/down: out-of-range lanes keep their OWN value (__shfl_up/__shfl_down
    # semantics — the reference leaves the calling lane unchanged)
    perm = {"xor": lanes ^ 1,
            "up": np.where(lanes - 2 < 0, lanes, lanes - 2),
            "down": np.where(lanes + 2 > 7, lanes, lanes + 2),
            "broadcast": np.full(8, 3)}[kind]
    np.testing.assert_array_equal(res[1], a[perm])


@cube
def k_ballot_elect(a: Slice, out: MutSlice):
    x = a[UNIT_POS]
    bits = plane_ballot(x > 0.5)
    first = plane_elect()
    r = cast(bits, f32)
    if first:
        r = r + 1000.0
    out[UNIT_POS] = r


def test_ballot_elect(client):
    a = np.array([0.9, 0.1, 0.8, 0.2, 0.7, 0.3, 0.6, 0.4], np.float32)
    res = run1(client, k_ballot_elect,
               [(a, False), (np.zeros(8, np.float32), True)])
    bits = sum(1 << i for i in range(8) if a[i] > 0.5)
    expect = np.full(8, float(bits))
    expect[0] += 1000.0
    np.testing.assert_array_equal(res[1], expect)


# -------------------------------------------------------- comptime enums


class Mode(enum.Enum):
    DOUBLE = 1
    SQUARE = 2
    NEG = 3


@cube
def k_enum_dispatch(a: Slice, out: MutSlice, mode):
    x = a[UNIT_POS]
    if mode is Mode.DOUBLE:
        out[UNIT_POS] = x * 2.0
    elif mode is Mode.SQUARE:
        out[UNIT_POS] = x * x
    else:
        out[UNIT_POS] = -x


@pytest.mark.parametrize("mode", list(Mode))
def test_comptime_enum_dispatch(client, mode):
    a = np.random.rand(8).astype(np.float32)
    res = run1(client, k_enum_dispatch,
               [(a, False), (np.zeros(8, np.float32), True)],
               comptimes=(mode,))
    expect = {Mode.DOUBLE: a * 2, Mode.SQUARE: a * a, Mode.NEG: -a}[mode]
    np.testing.assert_allclose(res[1], expect, rtol=1e-6)


# --------------------------------------------------------- nd blocking


@cube
def k_scale_rows_nd(t: Tensor, out: MutTensor, lcols: int):
    from cubecl_tpu.frontend import CUBE_POS_X, cube_range

    r = CUBE_POS_X * 8 + UNIT_POS
    for c in cube_range(0, lcols):
        out[r, c] = t[r, c] * 2.0


def test_nd_blocked_2d(client):
    R, C, L = 64, 256, 128
    x = np.random.rand(R, C).astype(np.float32)
    h = client.create(x.reshape(-1))
    o = client.empty((R * C,), "float32")
    ck = k_scale_rows_nd.compile_only(
        client, CubeCount(R // 8), CubeDim.new_1d(8),
        TensorArg(h, shape=(R, C), line_size=L),
        TensorArg(o, shape=(R, C), line_size=L, mutable=True), C // L,
        checked=False)
    assert "mode=nd" in ck.source
    k_scale_rows_nd.launch_unchecked(
        client, CubeCount(R // 8), CubeDim.new_1d(8),
        TensorArg(h, shape=(R, C), line_size=L),
        TensorArg(o, shape=(R, C), line_size=L, mutable=True), C // L)
    np.testing.assert_allclose(client.read_one(o).reshape(R, C), x * 2)


@cube
def k_2d_grid(t: Tensor, out: MutTensor):
    from cubecl_tpu.frontend import CUBE_POS_X, CUBE_POS_Y

    r = CUBE_POS_Y * 8 + UNIT_POS
    c = CUBE_POS_X
    out[r, c] = t[r, c] + 1.0


def test_nd_fallback_whole_strided(client):
    """2D grid with per-line columns falls back to whole-mode (line-dim
    block too small) and must stay correct on unaligned strided spans."""
    R, C, L = 64, 256, 128
    x = np.random.rand(R, C).astype(np.float32)
    h = client.create(x.reshape(-1))
    o = client.empty((R * C,), "float32")
    k_2d_grid.launch_unchecked(
        client, CubeCount(C // L, R // 8), CubeDim.new_1d(8),
        TensorArg(h, shape=(R, C), line_size=L),
        TensorArg(o, shape=(R, C), line_size=L, mutable=True))
    np.testing.assert_allclose(client.read_one(o).reshape(R, C), x + 1)


def test_nd_nonexact_tiling_checked(client):
    """Non-multiple row count: nd planning pads the last block; checked
    (masked) accesses keep the padding from leaking."""
    R, C, L = 60, 256, 128   # 60 % 8 != 0 -> padded row tiles
    x = np.random.rand(R, C).astype(np.float32)
    h = client.create(x.reshape(-1))
    o = client.create(np.full(R * C, -1, np.float32))
    cubes = -(-R // 8)
    ck = k_scale_rows_nd.compile_only(
        client, CubeCount(cubes), CubeDim.new_1d(8),
        TensorArg(h, shape=(R, C), line_size=L),
        TensorArg(o, shape=(R, C), line_size=L, mutable=True), C // L,
        checked=True)
    assert "mode=nd" in ck.source, ck.source
    k_scale_rows_nd.launch(
        client, CubeCount(cubes), CubeDim.new_1d(8),
        TensorArg(h, shape=(R, C), line_size=L),
        TensorArg(o, shape=(R, C), line_size=L, mutable=True), C // L)
    np.testing.assert_allclose(client.read_one(o).reshape(R, C), x * 2)


def test_cmma_nd_windowed_matmul(client):
    """load_tensor/store_tensor fragments drive ND planning: operands
    become VMEM stripes, so shapes far beyond whole-mode VMEM work."""
    from cubecl_tpu.frontend import TensorArg
    from cubecl_tpu.ir.types import elem_from_dtype
    from cubecl_tpu.ops.matmul import matmul_cmma, matmul_cmma_nd_kernel

    M, N, K = 256, 1024, 256
    A = np.random.randn(M, K).astype(np.float32)
    B = np.random.randn(K, N).astype(np.float32)
    hA, hB = client.create(A.reshape(-1)), client.create(B.reshape(-1))
    hO = client.empty((M * N,), "float32")
    ck = matmul_cmma_nd_kernel.compile_only(
        client, CubeCount(N // 1024, M // 128), CubeDim.new_1d(8),
        TensorArg(hA, shape=(M, K), line_size=128),
        TensorArg(hB, shape=(K, N), line_size=128),
        TensorArg(hO, shape=(M, N), line_size=128, mutable=True),
        128, 1024, 128, K, elem_from_dtype(A.dtype))
    assert ck.source.count("mode=nd") == 3, ck.source
    matmul_cmma(client, hA, hB, hO, M, N, K, tile=128)
    got = client.read_one(hO).reshape(M, N)
    np.testing.assert_allclose(got, A @ B, atol=1e-3, rtol=1e-4)


@cube
def k_bcast_varying(inp: Slice, out: MutSlice, lanes: Slice):
    src = lanes[UNIT_POS]
    out[UNIT_POS] = plane_broadcast(inp[UNIT_POS], src)


@cube
def k_shuffle_traced(inp: Slice, out: MutSlice, m: int):
    out[UNIT_POS] = plane_shuffle_xor(inp[UNIT_POS], m)


def test_plane_gather_dynamic_lanes(client):
    """Traced / unit-varying lane arguments lower to a one-hot plane
    gather (O(plane) VPU work) instead of requiring comptime lanes."""
    from cubecl_tpu.frontend import ScalarArg
    from cubecl_tpu.ir.types import i32

    x = np.arange(8, dtype=np.float32) * 10
    lanes = np.array([3, 3, 0, 1, 7, 2, 2, 5], np.int32)
    h, hl = client.create(x), client.create(lanes)
    o = client.empty((8,), "float32")
    k_bcast_varying.launch_unchecked(
        client, CubeCount(1), CubeDim.new_1d(8),
        ArrayArg(h), ArrayArg(o, mutable=True), ArrayArg(hl))
    np.testing.assert_array_equal(client.read_one(o), x[lanes])
    k_shuffle_traced.launch_unchecked(
        client, CubeCount(1), CubeDim.new_1d(8),
        ArrayArg(h), ArrayArg(o, mutable=True), ScalarArg(5, i32))
    np.testing.assert_array_equal(client.read_one(o),
                                  x[np.arange(8) ^ 5])


# ------------------------------------------- round-2 regression coverage


@cube
def k_negstep_loop(out: MutSlice, start: i32, stop: i32):
    acc = 0
    for i in cube_range(start, stop, -2):
        acc = acc + i
    out[UNIT_POS] = cast(acc, f32)


def test_traced_negative_step_loop(client):
    # sign-correct trip count for traced bounds with a negative comptime
    # step: range(10, 0, -2) has 5 iterations, not 6 (iv=0 excluded)
    res = run1(client, k_negstep_loop, [(np.zeros(8, np.float32), True)],
               scalars=((10, i32), (0, i32)))
    np.testing.assert_allclose(res[0], float(sum(range(10, 0, -2))))
    res = run1(client, k_negstep_loop, [(np.zeros(8, np.float32), True)],
               scalars=((9, i32), (3, i32)))
    np.testing.assert_allclose(res[0], float(sum(range(9, 3, -2))))


@cube
def k_read_at(a: Slice, out: MutSlice, idx: i32):
    out[UNIT_POS] = a[idx]


def test_checked_negative_index(client):
    # checked mode must mask NEGATIVE indices too (indices here are signed,
    # unlike the reference's u32) — a lone upper-bound check lets them by
    a = np.arange(8, dtype=np.float32) + 1.0
    res = run1(client, k_read_at,
               [(a, False), (np.full(8, -1.0, np.float32), True)],
               scalars=((-3, i32),), checked=True)
    assert not np.array_equal(res[1], np.full(8, a[-3 % 8])), \
        "negative index wrapped/clamped instead of failing the bound check"


@cube
def k_shuffle_dyn_up(a: Slice, out: MutSlice, d: i32):
    x = a[UNIT_POS]
    out[UNIT_POS] = plane_shuffle_up(x, d)


def test_shuffle_up_traced_delta(client):
    # traced shuffle delta exercises the one-hot gather path; OOB lanes
    # keep their own value
    a = (np.arange(8, dtype=np.float32) + 1.0) * 10.0
    res = run1(client, k_shuffle_dyn_up,
               [(a, False), (np.zeros(8, np.float32), True)],
               scalars=((3, i32),))
    lanes = np.arange(8)
    perm = np.where(lanes - 3 < 0, lanes, lanes - 3)
    np.testing.assert_array_equal(res[1], a[perm])
