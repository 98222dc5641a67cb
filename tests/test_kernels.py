"""Shared kernel test matrix — the analogue of the reference's
backend-parameterized ``testgen_all!`` suite
(cubecl-core/src/runtime_tests/, SURVEY §4), run on the CPU-interpret
backend (the DummyServer/CPU-runtime pattern)."""

import math

import numpy as np
import pytest

from cubecl_tpu import CubeCount, CubeDim, cube, comptime
from cubecl_tpu.frontend import (
    ABSOLUTE_POS,
    CUBE_DIM,
    CUBE_POS_X,
    PLANE_DIM,
    UNIT_POS,
    ArrayArg,
    MutSlice,
    ScalarArg,
    Sequence,
    SharedMemory,
    Slice,
    Vector,
    cast,
    clamp,
    cube_range,
    exp,
    fma,
    line_sum,
    max_,
    min_,
    plane_exclusive_sum,
    plane_inclusive_sum,
    plane_max,
    plane_sum,
    select,
    sqrt,
    sync_cube,
    tanh,
)
from cubecl_tpu.frontend.sync import atomic_add, atomic_max
from cubecl_tpu.ir.types import bf16, f32, i32, u32

FLOATS = ["float32", "bfloat16", "float16"]
INTS = ["int32", "int16", "uint32", "uint8"]


def run1(client, kernel, arrays, scalars=(), comptimes=(), cubes=1, cd=8,
         lines=None, checked=False):
    """Launch helper: arrays = [(np_array, mutable)], returns outputs."""
    handles = [client.create(a) for a, _m in arrays]
    args = []
    for (a, m), h in zip(arrays, handles):
        line = 1 if lines is None else lines[len(args)]
        args.append(ArrayArg(h, line_size=line, mutable=m))
    args += [ScalarArg(v, t) for v, t in scalars]
    args += list(comptimes)
    launch = kernel.launch if checked else kernel.launch_unchecked
    launch(client, CubeCount(cubes), CubeDim.new_1d(cd), *args)
    return [client.read_one(h) for h in handles]


# ---------------------------------------------------------------- assign


@cube
def k_assign(inp: Slice, out: MutSlice):
    out[UNIT_POS] = inp[UNIT_POS]


@pytest.mark.parametrize("dtype", FLOATS + INTS)
def test_assign(client, dtype):
    x = (np.random.rand(8) * 50).astype(dtype)
    res = run1(client, k_assign, [(x, False), (np.zeros(8, dtype), True)])
    np.testing.assert_array_equal(res[1], x)


# ------------------------------------------------------------ binary ops


@cube
def k_binary(a: Slice, b: Slice, out: MutSlice, op: str):
    x = a[UNIT_POS]
    y = b[UNIT_POS]
    if op == "add":
        out[UNIT_POS] = x + y
    elif op == "sub":
        out[UNIT_POS] = x - y
    elif op == "mul":
        out[UNIT_POS] = x * y
    elif op == "div":
        out[UNIT_POS] = x / y
    elif op == "max":
        out[UNIT_POS] = max_(x, y)
    elif op == "min":
        out[UNIT_POS] = min_(x, y)
    elif op == "mod":
        out[UNIT_POS] = x % y


@pytest.mark.parametrize("dtype", ["float32", "bfloat16", "float16",
                                   "int32", "int16", "uint32", "uint8"])
@pytest.mark.parametrize("op", ["add", "sub", "mul", "div", "max", "min",
                                "mod"])
def test_binary(client, dtype, op):
    a = (np.random.rand(8) * 10 + 6).astype(dtype)
    b = (np.random.rand(8) * 5 + 1).astype(dtype)
    is_float = dtype in ("float32", "bfloat16", "float16")
    if not is_float and op == "mod":
        a = np.abs(a) + 1
        b = np.abs(b) + 1
    res = run1(client, k_binary, [(a, False), (b, False),
                                  (np.zeros(8, dtype), True)],
               comptimes=(op,))
    ref = {
        "add": a + b, "sub": a - b, "mul": a * b,
        "div": (a / b if is_float else a // b),
        "max": np.maximum(a, b), "min": np.minimum(a, b), "mod": a % b,
    }[op]
    rtol = 2e-2 if dtype in ("bfloat16", "float16") else 1e-5
    np.testing.assert_allclose(np.asarray(res[2], np.float64),
                               np.asarray(ref, np.float64), rtol=rtol)


# ------------------------------------------------------------- unary ops


@cube
def k_unary(a: Slice, out: MutSlice, op: str):
    x = a[UNIT_POS]
    if op == "exp":
        out[UNIT_POS] = exp(x)
    elif op == "sqrt":
        out[UNIT_POS] = sqrt(x)
    elif op == "tanh":
        out[UNIT_POS] = tanh(x)
    elif op == "neg":
        out[UNIT_POS] = -x
    elif op == "abs":
        out[UNIT_POS] = abs(x)
    elif op == "fma":
        out[UNIT_POS] = fma(x, 2.0, 1.0)
    elif op == "clamp":
        out[UNIT_POS] = clamp(x, 0.2, 0.8)


@pytest.mark.parametrize("op", ["exp", "sqrt", "tanh", "neg", "abs", "fma",
                                "clamp"])
def test_unary(client, op):
    a = np.random.rand(8).astype(np.float32) + 0.1
    res = run1(client, k_unary, [(a, False), (np.zeros(8, np.float32), True)],
               comptimes=(op,))
    ref = {"exp": np.exp(a), "sqrt": np.sqrt(a), "tanh": np.tanh(a),
           "neg": -a, "abs": np.abs(a), "fma": a * 2 + 1,
           "clamp": np.clip(a, 0.2, 0.8)}[op]
    np.testing.assert_allclose(res[1], ref, rtol=1e-5, atol=1e-6)


# ------------------------------------------------------------ comparison


@cube
def k_compare(a: Slice, b: Slice, out: MutSlice):
    x = a[UNIT_POS]
    y = b[UNIT_POS]
    r = 0.0
    if x < y:
        r = 1.0
    elif x == y:
        r = 2.0
    out[UNIT_POS] = r


def test_compare(client):
    a = np.array([1, 5, 3, 3, 9, 0, 2, 2], np.float32)
    b = np.array([2, 1, 3, 4, 9, 1, 2, 0], np.float32)
    res = run1(client, k_compare, [(a, False), (b, False),
                                   (np.zeros(8, np.float32), True)])
    ref = np.where(a < b, 1.0, np.where(a == b, 2.0, 0.0))
    np.testing.assert_array_equal(res[2], ref)


# ---------------------------------------------------------------- bitwise


@cube
def k_bitwise(a: Slice, b: Slice, out: MutSlice, op: str):
    x = a[UNIT_POS]
    y = b[UNIT_POS]
    if op == "and":
        out[UNIT_POS] = x & y
    elif op == "or":
        out[UNIT_POS] = x | y
    elif op == "xor":
        out[UNIT_POS] = x ^ y
    elif op == "shl":
        out[UNIT_POS] = x << 2
    elif op == "shr":
        out[UNIT_POS] = x >> 1


@pytest.mark.parametrize("op", ["and", "or", "xor", "shl", "shr"])
def test_bitwise(client, op):
    a = np.random.randint(0, 255, 8).astype(np.int32)
    b = np.random.randint(0, 255, 8).astype(np.int32)
    res = run1(client, k_bitwise, [(a, False), (b, False),
                                   (np.zeros(8, np.int32), True)],
               comptimes=(op,))
    ref = {"and": a & b, "or": a | b, "xor": a ^ b,
           "shl": a << 2, "shr": a >> 1}[op]
    np.testing.assert_array_equal(res[2], ref)


# ------------------------------------------------------------------ cast


@cube
def k_cast(a: Slice, out: MutSlice, to):
    out[UNIT_POS] = cast(a[UNIT_POS], to)


def test_cast_f32_to_i32(client):
    a = np.array([1.7, -2.3, 3.0, 0.0, 5.9, -1.1, 8.5, 100.0], np.float32)
    res = run1(client, k_cast, [(a, False), (np.zeros(8, np.int32), True)],
               comptimes=(i32,))
    np.testing.assert_array_equal(res[1], a.astype(np.int32))


def test_cast_i32_to_bf16(client):
    a = np.arange(8, dtype=np.int32) * 3
    import jax.numpy as jnp

    res = run1(client, k_cast,
               [(a, False), (np.zeros(8, "bfloat16"), True)],
               comptimes=(bf16,))
    np.testing.assert_array_equal(np.asarray(res[1], np.float32),
                                  a.astype(np.float32))


# ------------------------------------------------------- loops + unroll


@cube
def k_loop(out: MutSlice, n: int, unrolled: bool):
    acc = 0.0
    if unrolled:
        for i in range(n):  # comptime -> unrolled
            acc = acc + float(i)
    else:
        for i in cube_range(0, n):
            acc = acc + cast(i, f32)
    out[UNIT_POS] = acc


@pytest.mark.parametrize("unrolled", [True, False])
def test_loop(client, unrolled):
    res = run1(client, k_loop, [(np.zeros(8, np.float32), True)],
               comptimes=(10, unrolled))
    np.testing.assert_allclose(res[0], 45.0)


@cube
def k_loop_step(out: MutSlice):
    acc = 0
    for i in cube_range(2, 20, 3):
        acc = acc + i
    out[UNIT_POS] = cast(acc, f32)


def test_loop_step(client):
    res = run1(client, k_loop_step, [(np.zeros(8, np.float32), True)])
    np.testing.assert_allclose(res[0], float(sum(range(2, 20, 3))))


@cube
def k_while(out: MutSlice, limit: int):
    i = 0
    s = 0
    while i < limit:
        s = s + i
        i = i + 1
    out[UNIT_POS] = cast(s, f32)


def test_while_comptime_and_runtime(client):
    res = run1(client, k_while, [(np.zeros(8, np.float32), True)],
               comptimes=(7,))
    np.testing.assert_allclose(res[0], 21.0)


@cube
def k_break(out: MutSlice, limit):
    i = 0
    while True:
        i = i + 1
        if i >= limit:
            break
    out[UNIT_POS] = cast(i, f32)


def test_break_runtime_scalar(client):
    res = run1(client, k_break, [(np.zeros(8, np.float32), True)],
               scalars=((9, i32),))
    np.testing.assert_allclose(res[0], 9.0)


# ------------------------------------------------------- early return


@cube
def k_early_return(inp: Slice, out: MutSlice):
    if UNIT_POS >= 4:
        return
    out[UNIT_POS] = inp[UNIT_POS] * 2.0


def test_early_return(client):
    x = np.arange(8, dtype=np.float32)
    res = run1(client, k_early_return,
               [(x, False), (np.zeros(8, np.float32), True)])
    expected = np.where(np.arange(8) < 4, x * 2, 0)
    np.testing.assert_array_equal(res[1], expected)


# -------------------------------------------------------------- vectors


@cube
def k_vector(a: Slice, out: MutSlice):
    v = a[UNIT_POS]          # line of 4
    s = line_sum(v)
    w = v * 2.0 + s
    out[UNIT_POS] = w


def test_vector_line_ops(client):
    a = np.random.rand(32).astype(np.float32)
    res = run1(client, k_vector,
               [(a, False), (np.zeros(32, np.float32), True)],
               lines=[4, 4])
    a4 = a.reshape(8, 4)
    ref = a4 * 2 + a4.sum(1, keepdims=True)
    np.testing.assert_allclose(res[1].reshape(8, 4), ref, rtol=1e-6)


@cube
def k_vec_lane(a: Slice, out: MutSlice):
    v = a[UNIT_POS]
    x0 = v[0]
    x3 = v[3]
    w = Vector.splat(x0 + x3, 4)
    out[UNIT_POS] = w


def test_vector_lane_extract(client):
    a = np.random.rand(32).astype(np.float32)
    res = run1(client, k_vec_lane,
               [(a, False), (np.zeros(32, np.float32), True)],
               lines=[4, 4])
    a4 = a.reshape(8, 4)
    ref = np.broadcast_to((a4[:, 0] + a4[:, 3])[:, None], (8, 4))
    np.testing.assert_allclose(res[1].reshape(8, 4), ref, rtol=1e-6)


# -------------------------------------------------------------- slices


@cube
def k_slice(a: Slice, out: MutSlice):
    sub = a.slice(4, 12)
    out[UNIT_POS] = sub[UNIT_POS]


def test_slice_view(client):
    a = np.arange(16, dtype=np.float32)
    res = run1(client, k_slice, [(a, False), (np.zeros(8, np.float32), True)])
    np.testing.assert_array_equal(res[1], a[4:12])


# ------------------------------------------------------- shared memory


@cube
def k_shared_reverse(a: Slice, out: MutSlice):
    sh = SharedMemory(f32, 8)
    sh[UNIT_POS] = a[UNIT_POS]
    sync_cube()
    out[UNIT_POS] = sh[7 - UNIT_POS]


def test_shared_memory(client):
    a = np.arange(8, dtype=np.float32)
    res = run1(client, k_shared_reverse,
               [(a, False), (np.zeros(8, np.float32), True)])
    np.testing.assert_array_equal(res[1], a[::-1])


# ------------------------------------------------------------ plane ops


@cube
def k_plane(a: Slice, out: MutSlice, op: str):
    x = a[UNIT_POS]
    if op == "sum":
        out[UNIT_POS] = plane_sum(x)
    elif op == "max":
        out[UNIT_POS] = plane_max(x)
    elif op == "inclusive_sum":
        out[UNIT_POS] = plane_inclusive_sum(x)
    elif op == "exclusive_sum":
        out[UNIT_POS] = plane_exclusive_sum(x)


@pytest.mark.parametrize("op", ["sum", "max", "inclusive_sum",
                                "exclusive_sum"])
def test_plane_ops(client, op):
    a = np.random.rand(16).astype(np.float32)
    res = run1(client, k_plane,
               [(a, False), (np.zeros(16, np.float32), True)],
               comptimes=(op,), cd=16)
    g = a.reshape(2, 8)
    ref = {
        "sum": np.repeat(g.sum(1), 8),
        "max": np.repeat(g.max(1), 8),
        "inclusive_sum": np.cumsum(g, 1).reshape(-1),
        "exclusive_sum": (np.cumsum(g, 1) - g).reshape(-1),
    }[op]
    np.testing.assert_allclose(res[1], ref, rtol=1e-5)


# ------------------------------------------------------------- topology


@cube
def k_topology(out: MutSlice):
    out[ABSOLUTE_POS] = cast(CUBE_POS_X * 100 + UNIT_POS * 10
                             + CUBE_DIM, f32)


def test_topology(client):
    res = run1(client, k_topology, [(np.zeros(16, np.float32), True)],
               cubes=2, cd=8)
    expect = np.array([c * 100 + u * 10 + 8
                       for c in range(2) for u in range(8)], np.float32)
    np.testing.assert_array_equal(res[0], expect)


def test_plane_dim_builtin(client):
    @cube
    def k(out: MutSlice):
        out[UNIT_POS] = cast(PLANE_DIM, f32)

    res = run1(client, k, [(np.zeros(8, np.float32), True)])
    np.testing.assert_array_equal(res[0], 8.0)


# -------------------------------------------------------------- atomics


@cube
def k_atomic_add(out: MutSlice, a: Slice):
    atomic_add(out, 0, a[UNIT_POS])


def test_atomic_add(client):
    a = np.arange(8, dtype=np.float32)
    res = run1(client, k_atomic_add,
               [(np.zeros(1, np.float32), True), (a, False)])
    np.testing.assert_allclose(res[0], a.sum())


@cube
def k_atomic_max(out: MutSlice, a: Slice):
    atomic_max(out, 0, a[UNIT_POS])


def test_atomic_max(client):
    a = np.random.rand(8).astype(np.float32)
    res = run1(client, k_atomic_max,
               [(np.zeros(1, np.float32), True), (a, False)])
    np.testing.assert_allclose(res[0], a.max())


# -------------------------------------------------------------- sequence


@cube
def k_seq_sum(bufs: Sequence, out: MutSlice):
    acc = bufs[0][UNIT_POS]
    for i in range(1, len(bufs)):
        acc = acc + bufs[i][UNIT_POS]
    out[UNIT_POS] = acc


def test_sequence_args(client):
    arrs = [np.random.rand(8).astype(np.float32) for _ in range(3)]
    hs = [client.create(a) for a in arrs]
    out = client.create(np.zeros(8, np.float32))
    k_seq_sum.launch_unchecked(
        client, CubeCount(1), CubeDim.new_1d(8),
        Sequence([ArrayArg(h) for h in hs]), ArrayArg(out, mutable=True))
    np.testing.assert_allclose(client.read_one(out), sum(arrs), rtol=1e-6)


# ----------------------------------------------- trait-style dispatch


@cube
def reduce_series(a: Slice, out: MutSlice, kind):
    """comptime strategy dispatch (reference sum_things SumKind trait)."""
    out[UNIT_POS] = kind(a)


@cube
def sum_plane_strategy(a: Slice):
    return plane_sum(a[UNIT_POS])


@cube
def sum_basic_strategy(a: Slice):
    acc = 0.0
    for i in cube_range(0, a.len()):
        acc = acc + a[i]
    return acc


@pytest.mark.parametrize("strategy", [sum_plane_strategy, sum_basic_strategy])
def test_comptime_trait_dispatch(client, strategy):
    a = np.random.rand(8).astype(np.float32)
    res = run1(client, reduce_series,
               [(a, False), (np.zeros(8, np.float32), True)],
               comptimes=(strategy,))
    np.testing.assert_allclose(res[1], a.sum(), rtol=1e-5)


# -------------------------------------------------- checked (bounds) IO


@cube
def k_guarded(a: Slice, out: MutSlice):
    if ABSOLUTE_POS < a.len():
        out[ABSOLUTE_POS] = a[ABSOLUTE_POS] + 1.0


def test_checked_io_tail(client):
    n = 11  # not a multiple of cube dim
    a = np.arange(n, dtype=np.float32)
    ha = client.create(a)
    out = client.create(np.zeros(n, np.float32))
    k_guarded.launch(client, CubeCount(2), CubeDim.new_1d(8),
                     ArrayArg(ha), ArrayArg(out, mutable=True))
    np.testing.assert_array_equal(client.read_one(out), a + 1)


# -------------------------------------------------------------- scalars


@cube
def k_scalar_args(out: MutSlice, alpha, beta):
    out[UNIT_POS] = alpha * cast(UNIT_POS, f32) + beta


def test_runtime_scalars(client):
    res = run1(client, k_scalar_args, [(np.zeros(8, np.float32), True)],
               scalars=((2.5, f32), (1.0, f32)))
    np.testing.assert_allclose(res[0], 2.5 * np.arange(8) + 1.0)


# --------------------------------------------------------------- select


@cube
def k_select(a: Slice, out: MutSlice):
    x = a[UNIT_POS]
    out[UNIT_POS] = select(x > 0.5, x * 10.0, x)


def test_select(client):
    a = np.random.rand(8).astype(np.float32)
    res = run1(client, k_select, [(a, False), (np.zeros(8, np.float32), True)])
    np.testing.assert_allclose(res[1], np.where(a > 0.5, a * 10, a), rtol=1e-6)


@cube
def k_continue(inp: Slice, out: MutSlice):
    acc = 0.0
    for i in cube_range(0, 8):
        v = inp[i]
        if v < 0.0:
            continue
        acc = acc + v
    out[UNIT_POS] = acc


def test_continue_in_traced_loop(client):
    x = np.array([1.0, -2.0, 3.0, -4.0, 5.0, 6.0, -7.0, 8.0], np.float32)
    res = run1(client, k_continue,
               [(x, False), (np.zeros(8, np.float32), True)])
    np.testing.assert_allclose(res[1], x[x > 0].sum())


@cube
def k_continue_break(inp: Slice, out: MutSlice, stop: float):
    acc = 0.0
    i = 0
    while True:
        v = inp[i]
        i = i + 1
        if i >= 8:
            break
        if v < 0.0:
            continue
        acc = acc + v
    out[UNIT_POS] = acc


def test_continue_and_break(client):
    x = np.array([1.0, -2.0, 3.0, -4.0, 5.0, 6.0, -7.0, 8.0], np.float32)
    res = run1(client, k_continue_break,
               [(x, False), (np.zeros(8, np.float32), True)], comptimes=(0.0,))
    # iterations process i=0..6 (break when i reaches 8 pre-add of v[7]);
    # wait: v read then i+=1 then break check -> processes v[0..6]
    expect = sum(v for v in x[:7] if v > 0)
    np.testing.assert_allclose(res[1], expect)


# ------------------------------------------------------------------ varying
# loop bounds (per-unit trip counts — reference RangeLoop is per-thread,
# cubecl-ir/src/branch.rs RangeLoop; lowered to max-trip + k<trip masking)


@cube
def k_vary_stop(inp: Slice, out: MutSlice):
    acc = 0.0
    for i in cube_range(0, UNIT_POS + 1):
        acc = acc + inp[i]
    out[UNIT_POS] = acc


def test_varying_loop_stop(client):
    x = np.arange(1, 9, dtype=np.float32)
    res = run1(client, k_vary_stop,
               [(x, False), (np.zeros(8, np.float32), True)])
    np.testing.assert_allclose(res[1], np.cumsum(x))


@cube
def k_vary_start(inp: Slice, out: MutSlice):
    acc = 0.0
    for i in cube_range(UNIT_POS, 8):
        acc = acc + inp[i]
    out[UNIT_POS] = acc


def test_varying_loop_start(client):
    x = np.arange(1, 9, dtype=np.float32)
    res = run1(client, k_vary_start,
               [(x, False), (np.zeros(8, np.float32), True)])
    np.testing.assert_allclose(res[1], [x[u:].sum() for u in range(8)])


@cube
def k_vary_ragged_store(inp: Slice, out: MutSlice):
    for i in cube_range(0, UNIT_POS + 1):
        v = inp[i]
        if v > 4.0:
            v = v * 10.0
        out[UNIT_POS * 8 + i] = v


def test_varying_loop_masked_stores(client):
    x = np.arange(1, 9, dtype=np.float32)
    res = run1(client, k_vary_ragged_store,
               [(x, False), (np.full(64, -1, np.float32), True)])
    want = np.full((8, 8), -1, np.float32)
    for u in range(8):
        for i in range(u + 1):
            want[u, i] = x[i] * (10 if x[i] > 4 else 1)
    np.testing.assert_allclose(res[1].reshape(8, 8), want)


@cube
def k_strided_loop_load(inp: Slice, out: MutSlice):
    """Regression: stride-c unit access with a loop-var offset near the
    buffer end (exact-span coverage, not c*U which overshoots + clamps)."""
    acc = 0.0
    for i in cube_range(0, 4):
        acc = acc + inp[UNIT_POS * 4 + i]
    out[UNIT_POS] = acc


def test_strided_load_loop_offset(client):
    x = np.arange(32, dtype=np.float32)
    res = run1(client, k_strided_loop_load,
               [(x, False), (np.zeros(8, np.float32), True)])
    np.testing.assert_allclose(res[1], x.reshape(8, 4).sum(1))


@cube
def k_strided_loop_store(inp: Slice, out: MutSlice):
    for i in cube_range(0, 4):
        out[UNIT_POS * 4 + i] = inp[UNIT_POS * 4 + i] * 2.0


def test_strided_store_loop_offset(client):
    x = np.arange(32, dtype=np.float32)
    res = run1(client, k_strided_loop_store,
               [(x, False), (np.zeros(32, np.float32), True)])
    np.testing.assert_allclose(res[1], 2 * x)
