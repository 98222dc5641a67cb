"""The book's reduction progression, TPU edition.

Reference: cubecl-book getting-started chapters (benchmark.md,
parallel_reduction.md, vectorized_reduction.md) — reduce a [ROWS, COLS]
f32 matrix to a [ROWS] vector, in stages:

  1. naive      one plane (the TPU minimum schedulable unit — the book
                uses one thread) serially walks every row
  2. parallel   one unit per row (CubeDim parallelism)
  3. vectorized line loads of 512 (the book uses 4-wide lines; TPU lines
                ride the 128-lane VPU so wider is idiomatic)
  4. plane-tree one cube per row: units×lines split the row, plane_sum
                folds the sublanes (the book's final chapter + plane ops)

The book's absolute times (240ms → 3.4ms → 1.1ms on an unstated GPU,
BASELINE.md §1) aren't comparable across hardware; the RATIO story
(naive → parallel ≈ 70×, → vectorized ≈ 220×) is the reproducible
signal. Run with --tpu for book shapes on silicon; default shapes are
small so the example doubles as a CPU smoke test.
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

from cubecl_tpu import CubeCount, CubeDim, cube, default_client
from cubecl_tpu.frontend import (
    CUBE_POS_X,
    UNIT_POS,
    ArrayArg,
    MutSlice,
    Slice,
    cube_range,
    line_sum,
    plane_sum,
)

CD = 8


@cube
def reduce_naive(inp: Slice, out: MutSlice, rows: int, cols: int):
    """Stage 1 — one plane does everything (anti-idiomatic on purpose:
    scalar loads in a serial loop are the pattern the pallas guide says
    never to write; this is the 'before' picture)."""
    for r in cube_range(0, rows):
        acc = 0.0
        for c in cube_range(0, cols):
            acc = acc + inp[r * cols + c]
        if UNIT_POS == 0:
            out[r] = acc


@cube
def reduce_parallel(inp: Slice, out: MutSlice, cols: int):
    """Stage 2 — one unit per row, still scalar loads."""
    r = CUBE_POS_X * 8 + UNIT_POS
    acc = 0.0
    for c in cube_range(0, cols):
        acc = acc + inp[r * cols + c]
    out[r] = acc


@cube
def reduce_vectorized(inp: Slice, out: MutSlice, lines_per_row: int):
    """Stage 3 — line loads (the input is viewed as lines of L)."""
    from cubecl_tpu.frontend import Vector
    from cubecl_tpu.ir.types import f32

    r = CUBE_POS_X * 8 + UNIT_POS
    acc = Vector.zeros(f32, inp.line_size)
    base = r * lines_per_row
    for k in cube_range(0, lines_per_row):
        acc = acc + inp[base + k]
    out[r] = line_sum(acc)


@cube
def reduce_plane_tree(inp: Slice, out: MutSlice, iters: int):
    """Stage 4 — one cube per row: 8 units × L lanes sweep the row,
    plane_sum folds the partial of each unit."""
    from cubecl_tpu.frontend import Vector
    from cubecl_tpu.ir.types import f32

    acc = Vector.zeros(f32, inp.line_size)
    base = CUBE_POS_X * (iters * 8)
    for k in cube_range(0, iters):
        acc = acc + inp[base + k * 8 + UNIT_POS]
    s = plane_sum(line_sum(acc))
    if UNIT_POS == 0:
        out[CUBE_POS_X] = s


from cubecl_tpu.runtime import time_launch  # noqa: E402


def main(tpu=False):
    client = default_client()
    if tpu:
        rows, cols = 512, 8192        # the book's shape (16MB f32)
        naive_rows, naive_cols = 256, 4096  # naive stage: fits whole-mode VMEM
    else:
        rows, cols = 64, 512
        naive_rows, naive_cols = rows, cols
    L = 512 if cols >= 512 * CD else 64  # plane-tree needs cols >= L*CD
    x = np.random.rand(rows, cols).astype(np.float32)
    xn = x[:naive_rows, :naive_cols].copy()
    h = client.create(x.reshape(-1))
    hn = client.create(xn.reshape(-1))
    out = client.empty((rows,), "float32")
    outn = client.empty((naive_rows,), "float32")

    stages = {
        "naive": (reduce_naive, CubeCount(1), CubeDim.new_1d(CD),
                  (ArrayArg(hn), ArrayArg(outn, mutable=True),
                   naive_rows, naive_cols)),
        "parallel": (reduce_parallel, CubeCount(rows // CD),
                     CubeDim.new_1d(CD),
                     (ArrayArg(h), ArrayArg(out, mutable=True), cols)),
        "vectorized": (reduce_vectorized, CubeCount(rows // CD),
                       CubeDim.new_1d(CD),
                       (ArrayArg(h, line_size=L),
                        ArrayArg(out, mutable=True), cols // L)),
        "plane-tree": (reduce_plane_tree, CubeCount(rows),
                       CubeDim.new_1d(CD),
                       (ArrayArg(h, line_size=L),
                        ArrayArg(out, mutable=True), cols // (L * CD))),
    }

    want = x.sum(axis=1)
    wantn = xn.sum(axis=1)

    def run_and_check(name):
        k, cc, cd, args = stages[name]
        k.launch_unchecked(client, cc, cd, *args)
        ref = wantn if name == "naive" else want
        got = client.read_one(args[1].handle)
        np.testing.assert_allclose(got, ref, rtol=1e-3)

    results = []
    for name in stages:
        run_and_check(name)
        k, cc, cd, args = stages[name]
        lo, hi = (1, 3) if name == "naive" else (4, 20)
        t = time_launch(client, k, cc, cd, *args, lo=lo, hi=hi)
        if name == "naive":
            # scale to the full shape (linear in elements)
            t *= (rows * cols) / (naive_rows * naive_cols)
            name = "naive (scaled)" if tpu else "naive"
        results.append((name, t))

    print(f"reduce [{rows},{cols}] f32 -> [{rows}]")
    base = results[0][1]
    for name, t in results:
        print(f"  {name:16s} {t*1e3:9.3f} ms   {base/t:7.1f}x vs naive")


if __name__ == "__main__":
    main(tpu="--tpu" in sys.argv)
