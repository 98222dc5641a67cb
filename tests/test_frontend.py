"""Frontend semantics tests: AST transform, comptime/runtime dispatch,
merge protocol, error messages (the reference's macro expansion snapshot
tests, cubecl-macros/tests)."""

import numpy as np
import pytest

from cubecl_tpu import CubeCount, CubeDim, cube
from cubecl_tpu.frontend import (
    ArrayArg,
    MutSlice,
    ScalarArg,
    Slice,
    UNIT_POS,
    cast,
    cube_range,
)
from cubecl_tpu.ir.types import f32


def run(client, kernel, arrays, comptimes=(), cd=8):
    handles = [client.create(a) for a, _m in arrays]
    args = [ArrayArg(h, mutable=m) for (a, m), h in zip(arrays, handles)]
    kernel.launch_unchecked(client, CubeCount(1), CubeDim.new_1d(cd),
                            *args, *comptimes)
    return [client.read_one(h) for h in handles]


# ----------------------------------------------------- comptime execution


def test_comptime_side_effects_once_per_trace(client):
    calls = []

    @cube
    def k(out: MutSlice):
        calls.append(1)  # comptime side effect
        out[UNIT_POS] = 1.0

    run(client, k, [(np.zeros(8, np.float32), True)])
    n_first = len(calls)
    assert n_first >= 1
    run(client, k, [(np.zeros(8, np.float32), True)])
    assert len(calls) == n_first, "second launch must hit the kernel cache"


def test_comptime_listcomp_and_helpers(client):
    @cube
    def k(out: MutSlice, weights: tuple):
        total = sum(w * w for w in weights)  # pure python at trace time
        out[UNIT_POS] = total * 1.0

    res = run(client, k, [(np.zeros(8, np.float32), True)],
              comptimes=((1.0, 2.0, 3.0),))
    np.testing.assert_allclose(res[0], 14.0)


def test_nested_cube_call_with_return(client):
    @cube
    def helper(x):
        if True:  # comptime branch containing a return
            return x * 3.0
        return x

    @cube
    def k(inp: Slice, out: MutSlice):
        out[UNIT_POS] = helper(inp[UNIT_POS])

    x = np.random.rand(8).astype(np.float32)
    res = run(client, k, [(x, False), (np.zeros(8, np.float32), True)])
    np.testing.assert_allclose(res[1], x * 3, rtol=1e-6)


# -------------------------------------------------------- merge protocol


def test_nested_branch_merge(client):
    @cube
    def k(inp: Slice, out: MutSlice):
        x = inp[UNIT_POS]
        r = 0.0
        if x > 0.25:
            if x > 0.75:
                r = 3.0
            else:
                r = 2.0
        else:
            r = 1.0
        out[UNIT_POS] = r

    x = np.array([0.1, 0.5, 0.9, 0.3, 0.8, 0.2, 0.6, 0.95], np.float32)
    res = run(client, k, [(x, False), (np.zeros(8, np.float32), True)])
    exp = np.where(x > 0.75, 3.0, np.where(x > 0.25, 2.0, 1.0))
    np.testing.assert_array_equal(res[1], exp)


def test_loop_in_branch(client):
    @cube
    def k(inp: Slice, out: MutSlice):
        x = inp[UNIT_POS]
        acc = 0.0
        if x > 0.5:
            for i in cube_range(0, 4):
                acc = acc + 1.0
        out[UNIT_POS] = acc

    x = np.array([0.1, 0.9, 0.6, 0.2, 0.8, 0.3, 0.7, 0.4], np.float32)
    res = run(client, k, [(x, False), (np.zeros(8, np.float32), True)])
    np.testing.assert_array_equal(res[1], np.where(x > 0.5, 4.0, 0.0))


def test_branch_in_loop_carry(client):
    @cube
    def k(inp: Slice, out: MutSlice):
        acc = 0.0
        for i in cube_range(0, 8):
            v = inp[i]
            if v > 0.5:
                acc = acc + v
        out[UNIT_POS] = acc

    x = np.random.rand(8).astype(np.float32)
    res = run(client, k, [(x, False), (np.zeros(8, np.float32), True)])
    np.testing.assert_allclose(res[1], x[x > 0.5].sum(), rtol=1e-5)


def test_comptime_number_promoted_in_branch(client):
    @cube
    def k(inp: Slice, out: MutSlice):
        x = inp[UNIT_POS]
        factor = 1.0            # comptime
        if x > 0.5:
            factor = 10.0       # diverges on a runtime branch -> select
        out[UNIT_POS] = x * factor

    x = np.array([0.1, 0.9, 0.6, 0.2, 0.8, 0.3, 0.7, 0.4], np.float32)
    res = run(client, k, [(x, False), (np.zeros(8, np.float32), True)])
    np.testing.assert_allclose(res[1], np.where(x > 0.5, x * 10, x),
                               rtol=1e-6)


def test_tuple_destructuring_comptime(client):
    @cube
    def k(out: MutSlice, pairs: tuple):
        acc = 0.0
        for a, b in pairs:  # comptime iteration with tuple target
            acc = acc + a * b
        out[UNIT_POS] = acc

    res = run(client, k, [(np.zeros(8, np.float32), True)],
              comptimes=(((1.0, 2.0), (3.0, 4.0)),))
    np.testing.assert_allclose(res[0], 14.0)


# ------------------------------------------------------------ error paths


def test_error_calling_cube_outside_trace():
    @cube
    def k(x):
        return x * 2.0

    with pytest.raises(RuntimeError, match="launch"):
        k(1.0)


def test_error_runtime_value_in_comptime(client):
    from cubecl_tpu.frontend.comptime import comptime

    @cube
    def k(inp: Slice, out: MutSlice):
        v = comptime(inp[UNIT_POS])  # traced value into comptime()
        out[UNIT_POS] = v

    with pytest.raises(Exception, match="comptime"):
        run(client, k, [(np.zeros(8, np.float32), False),
                        (np.zeros(8, np.float32), True)])


def test_error_bool_of_traced():
    from cubecl_tpu.frontend.element import CubeVal
    from cubecl_tpu.ir.value import Value, VarKind
    from cubecl_tpu.ir.types import Type, f32 as _f32

    v = CubeVal(Value(0, Type(_f32), VarKind.LOCAL))
    with pytest.raises(TypeError, match="traced"):
        bool(v)


def test_error_return_value_in_runtime_branch(client):
    @cube
    def k(inp: Slice, out: MutSlice):
        x = inp[UNIT_POS]
        if x > 0.5:
            return 1.0  # value return from runtime branch: unsupported
        out[UNIT_POS] = x

    with pytest.raises(Exception, match="return"):
        run(client, k, [(np.zeros(8, np.float32), False),
                        (np.zeros(8, np.float32), True)])


def test_error_write_to_readonly(client):
    @cube
    def k(inp: Slice, out: MutSlice):
        inp[UNIT_POS] = 1.0  # Slice is read-only

    with pytest.raises(Exception, match="read-only"):
        run(client, k, [(np.zeros(8, np.float32), False),
                        (np.zeros(8, np.float32), True)])


def test_mixed_float_widths_promote(client):
    """Narrow+wide float ops promote to the wider type (wide-accumulator
    pattern); bool+float still errors."""

    @cube
    def k(a: Slice, b: Slice, out: MutSlice):
        out[UNIT_POS] = a[UNIT_POS] + b[UNIT_POS]

    a = np.full(8, 1.5, np.float32)
    b = np.full(8, 0.25, np.float16)
    res = run(client, k, [(a, False), (b, False),
                          (np.zeros(8, np.float32), True)])
    np.testing.assert_allclose(res[2], 1.75)

    @cube
    def kb(a: Slice, b: Slice, out: MutSlice):
        out[UNIT_POS] = a[UNIT_POS] + b[UNIT_POS]

    bb = np.zeros(8, bool)
    with pytest.raises(Exception, match="mismatch|type"):
        run(client, kb, [(a, False), (bb, False),
                         (np.zeros(8, np.float32), True)])


# ----------------------------------------------------- kernel source dump


def test_compiled_source_contains_plan(client):
    @cube
    def k(inp: Slice, out: MutSlice):
        out[UNIT_POS] = inp[UNIT_POS]

    x = np.zeros(8, np.float32)
    h = client.create(x)
    o = client.empty((8,), "float32")
    ck = k.compile_only(client, CubeCount(1), CubeDim.new_1d(8),
                        ArrayArg(h), ArrayArg(o, mutable=True))
    assert "buffer inp" in ck.source
    assert "mode=" in ck.source


def test_struct_of_traced_fields(client):
    """User structs (reference derive CubeType): plain python objects
    holding traced fields work at trace time; rebind rather than mutate
    across runtime branches."""
    import dataclasses

    @dataclasses.dataclass
    class Pair:
        lo: object
        hi: object

    @cube
    def make_pair(x):
        from cubecl_tpu.frontend import max_, min_

        return Pair(min_(x, 0.5), max_(x, 0.5))

    @cube
    def k(inp: Slice, out: MutSlice):
        p = make_pair(inp[UNIT_POS])
        out[UNIT_POS] = p.hi - p.lo

    x = np.random.rand(8).astype(np.float32)
    res = run(client, k, [(x, False), (np.zeros(8, np.float32), True)])
    np.testing.assert_allclose(
        res[1], np.maximum(x, 0.5) - np.minimum(x, 0.5), rtol=1e-6)


def test_comptime_match_statement(client):
    """const_match parity: match over a comptime value selects the traced
    body at trace time."""

    @cube
    def k(inp: Slice, out: MutSlice, mode: str):
        x = inp[UNIT_POS]
        match mode:
            case "double":
                out[UNIT_POS] = x * 2.0
            case "square":
                out[UNIT_POS] = x * x
            case _:
                out[UNIT_POS] = -x

    x = np.random.rand(8).astype(np.float32)
    for mode, ref in [("double", x * 2), ("square", x * x), ("neg", -x)]:
        res = run(client, k, [(x, False), (np.zeros(8, np.float32), True)],
                  comptimes=(mode,))
        np.testing.assert_allclose(res[1], ref, rtol=1e-6)


def test_traced_match_switch(client):
    """Switch parity (reference ir/branch.rs Switch): match over a TRACED
    subject desugars to a predicated if/elif chain — with or-patterns,
    guards and a capture arm."""

    @cube
    def k(inp: Slice, out: MutSlice):
        v = inp[UNIT_POS]
        sel = UNIT_POS % 3
        r = 0.0
        match sel:
            case 0:
                r = v * 2.0
            case 1 | 2 if v > 0.0:
                r = v + 10.0
            case s:
                r = 0.0 - v + s  # capture binds the traced subject
        out[UNIT_POS] = r

    x = np.array([1, -2, 3, -4, 5, -6, 7, 8], np.float32)
    res = run(client, k, [(x, False), (np.zeros(8, np.float32), True)])
    want = [v * 2 if u % 3 == 0 else v + 10 if v > 0 else -v + u % 3
            for u, v in enumerate(x)]
    np.testing.assert_allclose(res[1], want, rtol=1e-6)


def test_comptime_match_structural(client):
    """Structural patterns stay native python match (comptime subject)."""

    @cube
    def k(inp: Slice, out: MutSlice, cfg: tuple):
        match cfg:
            case ("scale", factor):
                out[UNIT_POS] = inp[UNIT_POS] * float(factor)
            case ("shift", by):
                out[UNIT_POS] = inp[UNIT_POS] + float(by)

    x = np.random.rand(8).astype(np.float32)
    for cfg, ref in [(("scale", 3), x * 3), (("shift", 5), x + 5)]:
        res = run(client, k, [(x, False), (np.zeros(8, np.float32), True)],
                  comptimes=(cfg,))
        np.testing.assert_allclose(res[1], ref, rtol=1e-6)


@cube
def _clamp_helper(x):
    if x > 1.0:
        return 1.0
    if x < -1.0:
        return -1.0
    return x


@cube
def _nested_ret_helper(x):
    if x > 0.0:
        if x > 2.0:
            return 2.0
        return x
    return 0.0


def test_value_return_from_runtime_branch(client):
    """Conditional value returns in inlined helpers fold into selects
    (earlier returns win); exact under predication for pure helpers."""

    @cube
    def k(inp: Slice, out: MutSlice, which: int):
        if which == 0:
            out[UNIT_POS] = _clamp_helper(inp[UNIT_POS])
        else:
            out[UNIT_POS] = _nested_ret_helper(inp[UNIT_POS])

    x = np.array([-3, -0.5, 0.5, 3, 1.5, -1.2, 2.5, 0.0], np.float32)
    res = run(client, k, [(x, False), (np.zeros(8, np.float32), True)],
              comptimes=(0,))
    np.testing.assert_allclose(res[1], np.clip(x, -1, 1))
    res = run(client, k, [(x, False), (np.zeros(8, np.float32), True)],
              comptimes=(1,))
    np.testing.assert_allclose(res[1],
                               np.where(x > 0, np.minimum(x, 2.0), 0.0))


# ------------------------------------------------------------ fast math


def test_fast_math_reciprocal_rewrite(client):
    """Kernel-level fast_math flags flow into instruction modes and the
    FastMathProcessor rewrites DIV -> MUL * RECIP (reference
    InstructionModes fp_math_mode + AllowReciprocal, marker.rs:54-74)."""

    @cube(fast_math={"allow_reciprocal": True})
    def k_fm(inp: Slice, d: float, out: MutSlice):
        out[UNIT_POS] = inp[UNIT_POS] / d

    x = np.random.rand(8).astype(np.float32) + 1.0
    h = client.create(x)
    o = client.empty((8,), "float32")
    ck = k_fm.compile_only(client, CubeCount(1), CubeDim.new_1d(8),
                           ArrayArg(h), ScalarArg(3.0),
                           ArrayArg(o, mutable=True))
    assert "recip" in ck.source
    k_fm.launch(client, CubeCount(1), CubeDim.new_1d(8),
                ArrayArg(h), ScalarArg(3.0), ArrayArg(o, mutable=True))
    np.testing.assert_allclose(client.read_one(o), x / 3.0, rtol=1e-6)


def test_fast_math_default_no_rewrite(client):
    @cube
    def k_nofm(inp: Slice, d: float, out: MutSlice):
        out[UNIT_POS] = inp[UNIT_POS] / d

    x = np.ones(8, np.float32)
    h = client.create(x)
    o = client.empty((8,), "float32")
    ck = k_nofm.compile_only(client, CubeCount(1), CubeDim.new_1d(8),
                             ArrayArg(h), ScalarArg(3.0),
                             ArrayArg(o, mutable=True))
    assert "recip" not in ck.source


def test_fast_math_helper_scoped(client):
    """A helper's fast_math flags apply only to the instructions it
    registers (per-function #[cube(fast_math)], reference macros)."""

    @cube(fast_math={"allow_reciprocal": True})
    def fdiv(a, b):
        return a / b

    @cube
    def k_mixed(inp: Slice, d: float, out: MutSlice):
        a = fdiv(inp[UNIT_POS], d)     # rewritten
        b = inp[UNIT_POS] / d          # NOT rewritten
        out[UNIT_POS] = a + b

    x = np.random.rand(8).astype(np.float32)
    h = client.create(x)
    o = client.empty((8,), "float32")
    ck = k_mixed.compile_only(client, CubeCount(1), CubeDim.new_1d(8),
                              ArrayArg(h), ScalarArg(3.0),
                              ArrayArg(o, mutable=True))
    assert ck.source.count("recip") == 1
    k_mixed.launch(client, CubeCount(1), CubeDim.new_1d(8),
                   ArrayArg(h), ScalarArg(3.0), ArrayArg(o, mutable=True))
    np.testing.assert_allclose(client.read_one(o), 2 * x / 3.0, rtol=1e-6)


def test_comptime_index_constants_are_i32(client):
    """A python-int index must register as an i32 constant with an exact
    affine form — emit's out_ty (the BUFFER dtype) must not leak into the
    index (an f32-typed index broke affine analysis and crashed Mosaic's
    integer alignment hints on TPU: round-2 sum_things regression)."""

    @cube
    def k_unrolled(inp: Slice, out: MutSlice):
        acc = 0.0
        for i in range(8):          # comptime -> constant indices
            acc = acc + inp[i]
        out[UNIT_POS] = acc

    x = np.arange(8, dtype=np.float32)
    h = client.create(x)
    o = client.empty((8,), "float32")
    ck = k_unrolled.compile_only(client, CubeCount(1), CubeDim.new_1d(8),
                                 ArrayArg(h), ArrayArg(o, mutable=True))
    assert "f32)" not in ck.source.split("mem.index", 1)[1].split(")")[0]
    assert "index_masked" not in ck.source  # affine proof elides checks
    k_unrolled.launch(client, CubeCount(1), CubeDim.new_1d(8),
                      ArrayArg(h), ArrayArg(o, mutable=True))
    np.testing.assert_allclose(client.read_one(o), np.full(8, x.sum()))
