"""Property-based fuzzing: random @cube kernels vs a numpy oracle.

Generates seeded random elementwise expression kernels (arith, compare,
select, transcendentals, comptime branches, accumulation loops) as real
source files (the tracer needs source access), runs them through the
full DSL -> IR -> Pallas pipeline, and checks against numpy evaluating
the same expression. The reference gets this confidence from its
backend-parameterized testgen matrix; the fuzzer covers the combinatorial
space those hand-written tests cannot.
"""

import importlib.util
import random

import numpy as np
import pytest

from cubecl_tpu import CubeCount, CubeDim
from cubecl_tpu.frontend import ArrayArg

U, L, N_LINES = 8, 128, 64   # 8 units, 128-wide lines, 64 lines/buffer
N = U * L * N_LINES // U      # elements per buffer (per-unit coverage)


def _gen_expr(rng: random.Random, depth: int, nvars: int) -> str:
    """Expression over a, b, c (line values) closed under numpy semantics."""
    if depth == 0:
        choice = rng.random()
        if choice < 0.7:
            return "abc"[rng.randrange(nvars)]
        return f"{rng.uniform(-2, 2):.3f}"
    op = rng.choice(["add", "sub", "mul", "min", "max", "abs", "tanh",
                     "select", "scale"])
    e1 = _gen_expr(rng, depth - 1, nvars)
    if op == "abs":
        return f"abs_({e1})"
    if op == "tanh":
        return f"tanh({e1})"
    if op == "scale":
        return f"({e1}) * {rng.uniform(-1.5, 1.5):.3f}"
    e2 = _gen_expr(rng, depth - 1, nvars)
    if op == "add":
        return f"({e1} + {e2})"
    if op == "sub":
        return f"({e1} - {e2})"
    if op == "mul":
        return f"({e1} * {e2})"
    if op == "min":
        return f"min_({e1}, {e2})"
    if op == "max":
        return f"max_({e1}, {e2})"
    cond = f"({e1} < {e2})"
    e3 = _gen_expr(rng, depth - 1, nvars)
    return f"select({cond}, {e2}, {e3})"


def _numpy_eval(expr: str, a, b, c):
    env = {
        "a": a, "b": b, "c": c,
        "abs_": np.abs, "tanh": np.tanh,
        "min_": np.minimum, "max_": np.maximum,
        "select": np.where,
    }
    return eval(expr, {"__builtins__": {}}, env)  # noqa: S307 — test oracle


def _make_kernel(tmp_path, seed: int, expr: str, loop: bool):
    body = (
        "import math\n"
        "from cubecl_tpu import cube\n"
        "from cubecl_tpu.frontend import (Slice, MutSlice, UNIT_POS,\n"
        "    CUBE_POS_X, cube_range, abs_, tanh, min_, max_, select)\n"
        "\n"
        "@cube\n"
        "def k(A: Slice, B: Slice, C: Slice, out: MutSlice, iters: int):\n")
    if loop:
        body += (
            "    base = CUBE_POS_X * (iters * 8)\n"
            "    for kk in cube_range(0, iters):\n"
            "        idx = base + kk * 8 + UNIT_POS\n"
            "        a = A[idx]\n"
            "        b = B[idx]\n"
            "        c = C[idx]\n"
            f"        out[idx] = {expr}\n")
    else:
        body += (
            "    idx = CUBE_POS_X * 8 + UNIT_POS\n"
            "    a = A[idx]\n"
            "    b = B[idx]\n"
            "    c = C[idx]\n"
            f"    out[idx] = {expr}\n")
    path = tmp_path / f"fuzz_{seed}.py"
    path.write_text(body)
    spec = importlib.util.spec_from_file_location(f"fuzz_{seed}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.k


@pytest.mark.parametrize("seed", range(24))
def test_fuzz_expression_kernels(client, tmp_path, seed):
    rng = random.Random(seed)
    expr = _gen_expr(rng, rng.randint(2, 4), 3)
    loop = rng.random() < 0.5
    line = rng.choice([1, 128])

    n = N
    A = (np.random.RandomState(seed).randn(n) * 1.5).astype(np.float32)
    B = (np.random.RandomState(seed + 1).randn(n) * 1.5).astype(np.float32)
    C = (np.random.RandomState(seed + 2).randn(n) * 1.5).astype(np.float32)
    want = _numpy_eval(expr, A, B, C)

    k = _make_kernel(tmp_path, seed, expr, loop)
    ha, hb, hc = (client.create(v) for v in (A, B, C))
    out = client.empty((n,), "float32")
    n_lines = n // line
    if loop:
        iters = rng.choice([2, 4])
        cubes = n_lines // (8 * iters)
    else:
        iters, cubes = 1, n_lines // 8
    k.launch_unchecked(client, CubeCount(cubes), CubeDim.new_1d(8),
                       ArrayArg(ha, line_size=line),
                       ArrayArg(hb, line_size=line),
                       ArrayArg(hc, line_size=line),
                       ArrayArg(out, line_size=line, mutable=True), iters)
    got = client.read_one(out)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5,
                               err_msg=f"seed={seed} expr={expr} "
                               f"loop={loop} line={line}")


def _gen_int_expr(rng: random.Random, depth: int) -> str:
    if depth == 0:
        if rng.random() < 0.7:
            return "ab"[rng.randrange(2)]
        return str(rng.randint(-5, 5))
    op = rng.choice(["add", "sub", "mul", "min", "max", "select", "shift"])
    e1 = _gen_int_expr(rng, depth - 1)
    if op == "shift":
        return f"({e1} * {2 ** rng.randint(0, 3)})"
    e2 = _gen_int_expr(rng, depth - 1)
    if op == "add":
        return f"({e1} + {e2})"
    if op == "sub":
        return f"({e1} - {e2})"
    if op == "mul":
        return f"({e1} * {e2})"
    if op == "min":
        return f"min_({e1}, {e2})"
    if op == "max":
        return f"max_({e1}, {e2})"
    return f"select(({e1} < {e2}), {e1}, {e2})"


def _numpy_int_eval(expr: str, a, b):
    env = {"a": a, "b": b, "min_": np.minimum, "max_": np.maximum,
           "select": np.where}
    return eval(expr, {"__builtins__": {}}, env)  # noqa: S307


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_int32_kernels(client, tmp_path, seed):
    rng = random.Random(1000 + seed)
    expr = _gen_int_expr(rng, rng.randint(2, 4))
    n = 1024
    A = np.random.RandomState(seed).randint(-50, 50, n).astype(np.int32)
    B = np.random.RandomState(seed + 9).randint(-50, 50, n).astype(np.int32)
    want = _numpy_int_eval(expr, A.astype(np.int64),
                           B.astype(np.int64)).astype(np.int32)  # wraps

    body = (
        "from cubecl_tpu import cube\n"
        "from cubecl_tpu.frontend import (Slice, MutSlice, UNIT_POS,\n"
        "    CUBE_POS_X, min_, max_, select)\n"
        "@cube\n"
        "def k(A: Slice, B: Slice, out: MutSlice):\n"
        "    idx = CUBE_POS_X * 8 + UNIT_POS\n"
        "    a = A[idx]\n"
        "    b = B[idx]\n"
        f"    out[idx] = {expr}\n")
    path = tmp_path / f"fuzzi_{seed}.py"
    path.write_text(body)
    spec = importlib.util.spec_from_file_location(f"fuzzi_{seed}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    ha, hb = client.create(A), client.create(B)
    out = client.empty((n,), "int32")
    mod.k.launch_unchecked(client, CubeCount(n // 8), CubeDim.new_1d(8),
                           ArrayArg(ha), ArrayArg(hb),
                           ArrayArg(out, mutable=True))
    got = client.read_one(out)
    np.testing.assert_array_equal(
        got, want, err_msg=f"seed={seed} expr={expr}")
