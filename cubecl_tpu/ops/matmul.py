"""Autotuned tiled MXU matmul (BASELINE config 4).

Two implementations behind one autotuned entry point:

1. ``matmul_pallas`` — hand-written Pallas kernel (the ``intrinsic!``-style
   std-kernel path, like the cubek matmul the reference ecosystem uses):
   grid (M/TM, N/TN, K/TK), f32 accumulation in VMEM scratch, bf16/f32
   inputs on the MXU, K innermost ("arbitrary") so the accumulator block
   stays resident, M/N "parallel". Autotune searches tile shapes under a
   VMEM budget with roofline time bounds.

2. ``matmul_cmma`` — the DSL CMMA path (frontend/cmma.py → MXU jnp.dot),
   numerics-parity path exercised by the shared test suite.

Target: ≥90% of MXU peak at bf16 4096³ (BASELINE.md §3).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

from ..frontend import (ArrayArg, MutSlice, MutTensor, ScalarArg,
                        Slice, Tensor, cube, cube_range)
from ..frontend import cmma
from ..frontend.topology import CUBE_POS_X, CUBE_POS_Y
from ..ir.types import bf16, f32
from ..runtime.base import CubeCount, CubeDim
from ..runtime.handle import Handle
from ..runtime.kernel import KernelId, NativeKernelTask
from ..backend.compiler import CompiledKernel
from ..tune import LocalTuner, TunableSet, TuneGroup
from ..tune.anchor import anchor


# ---------------------------------------------------------------------------
# 1. hand-written Pallas kernel
# ---------------------------------------------------------------------------


def _build_matmul(m: int, n: int, k: int, tm: int, tn: int, tk: int,
                  in_dtype: str, out_dtype: str, acc_dtype: str,
                  interpret: bool = False,
                  b_transposed: bool = False,
                  scaled: bool = False) -> CompiledKernel:
    """Tiled MXU matmul. ``b_transposed``: B arrives as (N, K) so its
    windows stream contiguous rows (pre-transposed serving weights —
    measured +4-5% for 8-bit operands on v5e). ``scaled``: two f32
    scalars multiply the accumulator in the epilogue (fused dequant for
    int8/fp8 quantized GEMMs — no int32/f32 intermediate ever touches
    HBM; reference cmma::execute_scaled, cmma.rs:920-953)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = (m // tm, n // tn, k // tk)
    acc_dt = jnp.dtype(acc_dtype)

    # f32 inputs: 3-pass bf16 (≈f32); bf16/int8 use the native MXU pass.
    # fp8 (e4m3/e5m2) operands go to jnp.dot DIRECTLY: Mosaic fuses the
    # widening into the systolic feed (no VPU converts) while VMEM/HBM
    # see 1 byte/elem. A manual astype(bf16) in the kernel instead
    # materializes VPU converts and costs 3.3x — do NOT "help" here.
    # (8-bit STREAMING ceiling is ~75-84% of nominal on v5e even so —
    # see BENCH_NOTES "8-bit streaming matmul ceiling".)
    prec = jax.lax.Precision.HIGHEST if in_dtype == "float32" else None

    def kernel(*refs):
        if scaled:
            sa_ref, sb_ref, a_ref, b_ref, o_ref, acc_ref = refs
        else:
            a_ref, b_ref, o_ref, acc_ref = refs

        @pl.when(pl.program_id(2) == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        if b_transposed:
            acc_ref[...] += jax.lax.dot_general(
                a_ref[...], b_ref[...],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=acc_dt, precision=prec)
        else:
            acc_ref[...] += jnp.dot(a_ref[...], b_ref[...],
                                    preferred_element_type=acc_dt,
                                    precision=prec)

        @pl.when(pl.program_id(2) == grid[2] - 1)
        def _done():
            if scaled:
                scale = sa_ref[0, 0] * sb_ref[0, 0]
                o_ref[...] = (acc_ref[...].astype(jnp.float32)
                              * scale).astype(o_ref.dtype)
            else:
                o_ref[...] = acc_ref[...].astype(o_ref.dtype)

    b_spec = (pl.BlockSpec((tn, tk), lambda i, j, kk: (j, kk),
                           memory_space=pltpu.VMEM) if b_transposed
              else pl.BlockSpec((tk, tn), lambda i, j, kk: (kk, j),
                                memory_space=pltpu.VMEM))
    in_specs = [
        pl.BlockSpec((tm, tk), lambda i, j, kk: (i, kk),
                     memory_space=pltpu.VMEM),
        b_spec,
    ]
    if scaled:
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.dtype(out_dtype)),
        scratch_shapes=[pltpu.VMEM((tm, tn), acc_dt)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # admit whole-K fat tiles (the DSL CMMA path measured these
            # fastest: one dot per output tile) past the 16MB default
            vmem_limit_bytes=min(
                100 * 2**20,
                max(32 * 2**20,
                    2 * _matmul_vmem(tm, tn, tk,
                                     np.dtype(in_dtype).itemsize,
                                     np.dtype(out_dtype).itemsize,
                                     acc_dt.itemsize)))),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=(m * k + k * n) * np.dtype(in_dtype).itemsize
            + m * n * np.dtype(out_dtype).itemsize,
            transcendentals=0),
        name=f"matmul_{tm}x{tn}x{tk}",
        interpret=interpret,
    )

    b_shape = (n, k) if b_transposed else (k, n)

    def fn(buffers, scalars=()):
        if scaled:
            # device scales ride as buffers: (a, sa, b, sb, o)
            a, sa, b, sb, o = buffers
            args = [jnp.asarray(sa).reshape(-1)[:1].reshape(1, 1)
                    .astype(jnp.float32),
                    jnp.asarray(sb).reshape(-1)[:1].reshape(1, 1)
                    .astype(jnp.float32),
                    a.reshape(m, k).astype(jnp.dtype(in_dtype)),
                    b.reshape(b_shape).astype(jnp.dtype(in_dtype))]
        else:
            a, b, o = buffers
            args = [a.reshape(m, k).astype(jnp.dtype(in_dtype)),
                    b.reshape(b_shape).astype(jnp.dtype(in_dtype))]
        out = call(*args)
        return (out.reshape(o.shape),)

    return CompiledKernel(
        fn=fn, mutable_indices=[4 if scaled else 2],
        source=f"pallas matmul {m}x{n}x{k} "
        f"tiles {tm}x{tn}x{tk} {in_dtype}->{out_dtype}"
        f"{' bT' if b_transposed else ''}{' scaled' if scaled else ''}",
        name=f"matmul_{tm}x{tn}x{tk}", flops=2 * m * n * k,
        vmem_estimate=_matmul_vmem(tm, tn, tk,
                                   np.dtype(in_dtype).itemsize,
                                   np.dtype(out_dtype).itemsize,
                                   np.dtype(acc_dtype).itemsize))


def matmul_pallas(client, a: Handle, b: Handle, out: Handle,
                  m: int, n: int, k: int,
                  tm: int = 512, tn: int = 512, tk: int = 512,
                  in_dtype: Optional[str] = None,
                  acc_dtype: str = "float32") -> None:
    in_dtype = in_dtype or str(a.dtype)
    interpret = bool(client._dev.call(
        lambda s: getattr(s.compiler, "interpret", False)))
    kid = KernelId.build("matmul_pallas", m, n, k, tm, tn, tk, in_dtype,
                         str(out.dtype), acc_dtype, interpret)
    task = NativeKernelTask(
        kid, lambda: _build_matmul(m, n, k, tm, tn, tk, in_dtype,
                                   str(out.dtype), acc_dtype, interpret),
        name="matmul_pallas")
    client.launch(task, [a, b, out])


def _matmul_vmem(tm: int, tn: int, tk: int, in_bytes: int,
                 out_bytes: int, acc_bytes: int = 4) -> int:
    """VMEM bytes for one grid step: double-buffered A/B/OUT blocks plus
    the resident accumulator scratch (matches Mosaic's scoped-vmem
    accounting observed on hardware — a t1024x1024x512 f32-out kernel
    measures 16.84M against the 16M limit). fp8 operands feed jnp.dot
    directly — no upcast temporaries (a manual astype would add
    (tm*tk+tk*tn)*2 bytes and cost 3.3x in VPU converts)."""
    return (2 * (tm * tk + tk * tn) * in_bytes
            + 2 * tm * tn * out_bytes + tm * tn * acc_bytes)


def _tile_candidates(m: int, n: int, k: int, in_bytes: int,
                     out_bytes: int = 4, limit: int = 8):
    """Tile shapes: MXU-aligned, VMEM-budgeted (double-buffered A/B/OUT
    blocks + acc must fit in ~16MB scoped VMEM). Ranked by a
    compute-intensity heuristic and capped — compiles are expensive, so
    the tuner gets a short, good list (the reference's TuneGroup
    priority idea)."""
    VMEM = 64 * 1024 * 1024  # the emitter raises vmem_limit_bytes
    out = []
    # 1 B/elem operands (fp8/int8) fit 2048-wide tiles in the same VMEM
    # budget — give them their own, fatter candidate space (round-2/3
    # verdicts: reusing bf16-shaped tiles under-reports narrow dtypes)
    mn_opts = (128, 256, 512, 1024, 2048) if in_bytes == 1 \
        else (128, 256, 512, 1024)
    for tm in mn_opts:
        for tn in mn_opts:
            for tk in (128, 256, 512, 1024, 2048, k):
                if m % tm or n % tn or tk > k or k % tk:
                    continue
                vmem = _matmul_vmem(tm, tn, tk, in_bytes, out_bytes)
                if vmem > VMEM:
                    continue
                # prefer big square-ish MN tiles (arithmetic intensity);
                # whole-K tiles (one dot per output tile, no K loop)
                # measured fastest on v5e — rank them first
                score = (min(tm, tn) * 2 + tm + tn
                         - abs(tm - tn)
                         - abs(tk - 512) // 4
                         + (1024 if tk == k else 0))
                out.append((score, (tm, tn, tk)))
    out.sort(reverse=True)
    seen = set()
    per_mn: dict = {}
    uniq = []
    for _s, t in out:
        # at most 2 tk variants per (tm, tn) so one fat MN shape can't
        # crowd the whole shortlist (keeps the proven 1024x1024xK tiles
        # in the fp8/int8 lists alongside the new 2048-wide candidates)
        if t in seen or per_mn.get(t[:2], 0) >= 2:
            continue
        seen.add(t)
        per_mn[t[:2]] = per_mn.get(t[:2], 0) + 1
        uniq.append(t)
    return uniq[:limit]


_matmul_tuner = LocalTuner("matmul")


def matmul_autotuned(client, a: Handle, b: Handle, out: Handle,
                     m: int, n: int, k: int,
                     in_dtype: Optional[str] = None) -> None:
    """Autotuned entry: searches tile shapes on first use per anchored key
    (reference LocalTuner::execute flow, SURVEY §3.4)."""
    in_dtype = in_dtype or str(a.dtype)
    in_bytes = np.dtype(in_dtype).itemsize
    out_bytes = np.dtype(str(out.dtype)).itemsize

    def key_fn(client_, a_, b_, out_):
        return ("matmul", anchor(m), anchor(n), anchor(k), in_dtype,
                str(out.dtype))

    gen = client.properties().generation

    def work(key):
        flops = 2 * m * n * k
        bytes_ = (m * k + k * n) * in_bytes + m * n * 4
        return (flops, bytes_)

    # integer GEMMs accumulate exactly in i32 on the MXU int8 pass
    acc_dtype = "int32" if np.dtype(in_dtype).kind in "iu" else "float32"
    ts = TunableSet("matmul", key_fn)
    for (tm, tn, tk) in _tile_candidates(m, n, k, in_bytes, out_bytes):
        ts.with_tunable(
            functools.partial(_run_tile, tm=tm, tn=tn, tk=tk, m=m, n=n, k=k,
                              in_dtype=in_dtype, acc_dtype=acc_dtype),
            name=f"t{tm}x{tn}x{tk}", work=lambda key: work(key))
    if not ts.tunables:
        return matmul_pallas(client, a, b, out, m, n, k,
                             tm=min(128, m), tn=min(128, n), tk=min(128, k),
                             in_dtype=in_dtype)
    _matmul_tuner.execute(client, ts, client, a, b, out)


def _run_tile(client, a, b, out, tm, tn, tk, m, n, k, in_dtype,
              acc_dtype="float32"):
    matmul_pallas(client, a, b, out, m, n, k, tm, tn, tk, in_dtype,
                  acc_dtype)


# ---------------------------------------------------------------------------
# 2. DSL CMMA path (numerics parity; reference cmma::execute flow)
# ---------------------------------------------------------------------------


@cube
def matmul_cmma_kernel(a: Slice, b: Slice, out: MutSlice,
                       m: int, n: int, k: int, tile: int, elem):
    """One cube per (tile, tile) output tile; K-loop of MXU executes.
    m/n/k/tile/elem are comptime (static shapes); offsets are traced.
    Reference flow: cmma::{fill,load,execute,store} (cmma.rs:850-953)."""
    row = CUBE_POS_Y * tile
    col = CUBE_POS_X * tile
    acc = cmma.Matrix("accumulator", tile, tile, tile, f32)
    cmma.fill(acc, 0.0)
    ma = cmma.Matrix("a", tile, tile, tile, elem)
    mb = cmma.Matrix("b", tile, tile, tile, elem)
    for kk in cube_range(0, k // tile):
        cmma.load(ma, a, k, offset=row * k + kk * tile)
        cmma.load(mb, b, n, offset=(kk * tile) * n + col)
        cmma.execute(ma, mb, acc, acc)
    cmma.store(acc, out, n, offset=row * n + col)


@cube
def matmul_cmma_nd_kernel(a: Tensor, b: Tensor, out: MutTensor,
                          tm: int, tn: int, tk: int, k: int, elem):
    """Tiled CMMA matmul over TENSOR params: load_tensor/store_tensor
    carry per-dim indices, so the ND planner windows the operands —
    A becomes a (tm, K) row stripe per cy, B a (K, tn) column stripe per
    cx, OUT a (tm, tn) block. tn must span >=8 lines (Mosaic sublane
    blocks) for B/OUT to window; large matmuls then fit VMEM."""
    L = a.line_size
    row = CUBE_POS_Y * tm
    col_l = CUBE_POS_X * (tn // L)
    acc = cmma.Matrix("accumulator", tm, tn, tk, f32)
    cmma.fill(acc, 0.0)
    ma = cmma.Matrix("a", tm, tn, tk, elem)
    mb = cmma.Matrix("b", tm, tn, tk, elem)
    for kk in cube_range(0, k // tk):
        cmma.load_tensor(ma, a, row, kk * (tk // L))
        cmma.load_tensor(mb, b, kk * tk, col_l)
        cmma.execute(ma, mb, acc, acc)
    cmma.store_tensor(acc, out, row, col_l)


def matmul_cmma(client, a: Handle, b: Handle, out: Handle,
                m: int, n: int, k: int, tile: int = 128) -> None:
    """DSL CMMA matmul. With 128-line tensors the ND window planner
    turns operands into VMEM stripes (large shapes); the 1-line fallback
    keeps buffers whole-resident (small/parity shapes only).

    Tile heuristic (round-2 v5e sweep, 4096^3 bf16, valid chains):
    whole-K fragments (tm,tn,tk)=(512,1024,K) hit **186 TF = 94% of MXU
    peak** — one dot per output tile, stripes pipelined by Mosaic;
    K-looped (512,2048,1024) reaches 148, (512,1024,1024) 139. tk=K is
    taken whenever the stripes fit the VMEM budget."""
    from ..frontend import TensorArg
    from ..ir.types import elem_from_dtype

    elem = elem_from_dtype(a.dtype)
    # 128-lines → 2D refs: slab row windows need only sublane alignment
    line = 128 if (k % 128 == 0 and n % 128 == 0) else 1
    if line == 128:
        tm = 512 if m % 512 == 0 else tile
        # tn spans >=8 lines when possible so B/OUT window per cx
        tn = 1024 if n % 1024 == 0 else tile
        # whole-K fragments when the double-buffered stripes fit VMEM;
        # else tk spans 8 lines (1024) so the K-loop's dynamic line
        # offset is provably %8 (Mosaic sublane rule — _aff_multiple
        # emits the multiple_of hint that discharges the proof)
        esz = elem.size
        stripes = (tm * k + k * tn + tm * tn) * esz * 2
        if stripes <= 64 * 2**20:
            tk = k
        elif k % 1024 == 0:
            tk = 1024
        else:
            tk = tile
        matmul_cmma_nd_kernel.launch_unchecked(
            client, CubeCount(n // tn, m // tm), CubeDim.new_1d(8),
            TensorArg(a, shape=(m, k), line_size=line),
            TensorArg(b, shape=(k, n), line_size=line),
            TensorArg(out, shape=(m, n), line_size=line, mutable=True),
            tm, tn, tk, k, elem)
        return
    matmul_cmma_kernel.launch_unchecked(
        client, CubeCount(n // tile, m // tile), CubeDim.new_1d(8),
        ArrayArg(a, line_size=line), ArrayArg(b, line_size=line),
        ArrayArg(out, line_size=line, mutable=True),
        m, n, k, tile, elem)


# ---------------------------------------------------------------------------
# 3. Quantized int8 matmul (serving path: MXU int8 pass is EXACT to i32)
# ---------------------------------------------------------------------------


def matmul_quantized(client, a: Handle, b: Handle, out: Handle,
                     m: int, n: int, k: int,
                     tm: int = 1024, tn: int = 1024, tk: int = 4096,
                     b_transposed: bool = False) -> None:
    """f32 matmul through per-tensor symmetric int8 quantization: absmax
    scales on-device (std.quant_kernels), EXACT int8->int32 MXU GEMM with
    the dequant scale FUSED into the epilogue on the resident accumulator
    (round 4: the old path materialized the full int32 product to HBM
    and dequantized in a second pass — 64MB of extra traffic at 4096²),
    ~1e-2 relative error (quantization noise). v5e 4096³ (round-4
    auto-extended chains, out=bf16): (1024,1024,4096) 299 TOPS, with
    pre-transposed B 312 = the measured 8-bit streaming ceiling
    (BENCH_NOTES "8-bit streaming matmul ceiling"); int32-out tiles of
    round 2 measured 256-272. ``b_transposed``: B handle is (N, K) —
    pre-transposed serving weights."""
    from ..std.quant import QuantScheme
    from ..std.quant_kernels import quantize

    scheme = QuantScheme()  # per-tensor symmetric int8
    qa, sa = quantize(client, a, scheme)
    qb, sb = quantize(client, b, scheme)
    tm, tn, tk = min(tm, m), min(tn, n), min(tk, k)
    while m % tm:
        tm //= 2
    while n % tn:
        tn //= 2
    while k % tk:
        tk //= 2
    interpret = bool(client._dev.call(
        lambda s: getattr(s.compiler, "interpret", False)))
    kid = KernelId.build("matmul_int8_dq", m, n, k, tm, tn, tk,
                         str(out.dtype), interpret, b_transposed)
    task = NativeKernelTask(
        kid, lambda: _build_matmul(m, n, k, tm, tn, tk, "int8",
                                   str(out.dtype), "int32", interpret,
                                   b_transposed=b_transposed, scaled=True),
        name="matmul_int8_dq")
    client.launch(task, [qa, sa, qb, sb, out])


def autotune_best_tile(client, a: Handle, b: Handle, out: Handle,
                       m: int, n: int, k: int,
                       in_dtype: Optional[str] = None) -> Tuple[int, int, int]:
    """Settle the autotune for this shape (runs the capture+slope search on
    first use) and return the winning (tm, tn, tk). Used by bench.py so the
    headline number reflects the REAL tuner's choice, not a hand-rolled
    sweep."""
    in_dtype = in_dtype or str(a.dtype)
    matmul_autotuned(client, a, b, out, m, n, k, in_dtype)
    key = ("matmul", anchor(m), anchor(n), anchor(k), in_dtype,
           str(out.dtype))
    tuner = _matmul_tuner.tuner_for(client, key)
    hit = tuner.cache.mem.get(str(key)) if tuner is not None else None
    if hit is None:
        raise RuntimeError(
            f"autotune did not record a result for {key}: "
            f"tuner={'missing' if tuner is None else 'present'}, "
            f"recorded keys={list(tuner.cache.mem) if tuner else []}")
    name = hit[1]  # "t{tm}x{tn}x{tk}"
    tm, tn, tk = (int(x) for x in name[1:].split("x"))
    return tm, tn, tk


def autotune_top_tiles(client, a: Handle, b: Handle, out: Handle,
                       m: int, n: int, k: int,
                       in_dtype: Optional[str] = None,
                       top: int = 3) -> list:
    """Like :func:`autotune_best_tile` but returns the ``top`` fastest
    tiles by measured time — callers that re-measure with a longer
    harness (bench.py) shortlist through this, so close-call tuner noise
    cannot cost the headline."""
    in_dtype = in_dtype or str(a.dtype)
    best = autotune_best_tile(client, a, b, out, m, n, k, in_dtype)
    key = ("matmul", anchor(m), anchor(n), anchor(k), in_dtype,
           str(out.dtype))
    tuner = _matmul_tuner.tuner_for(client, key)
    timings = tuner.cache.timings(key) if tuner is not None else {}
    if not timings:
        return [best]
    ranked = sorted(timings.items(), key=lambda kv: kv[1])[:top]
    return [tuple(int(x) for x in name[1:].split("x"))
            for name, _t in ranked]


# ---------------------------------------------------------------------------
# 3. fp8 scaled matmul (reference cmma::execute_scaled, cmma.rs:920-953)
# ---------------------------------------------------------------------------


def _build_matmul_scaled(m: int, n: int, k: int, tm: int, tn: int, tk: int,
                         in_dtype: str, out_dtype: str,
                         interpret: bool = False) -> CompiledKernel:
    """fp8 matmul with per-tensor dequant scales applied in the epilogue:
    ``out = (a @ b) * (scale_a * scale_b)``. Scales ride in SMEM (1,1)
    refs so the multiply happens on the resident accumulator block —
    no extra pass over the output. fp8 operands stream at 1 byte/elem
    and feed the MXU directly (Mosaic fuses
    the widening into the systolic feed at bf16 rate; reference
    block-scaled MMA is cubecl-ir features.rs MmaConfig +
    execute_scaled)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = (m // tm, n // tn, k // tk)

    def kernel(sa_ref, sb_ref, a_ref, b_ref, o_ref, acc_ref):
        @pl.when(pl.program_id(2) == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc_ref[...] += jnp.dot(a_ref[...], b_ref[...],
                                preferred_element_type=jnp.float32)

        @pl.when(pl.program_id(2) == grid[2] - 1)
        def _done():
            scale = sa_ref[0, 0] * sb_ref[0, 0]
            o_ref[...] = (acc_ref[...] * scale).astype(o_ref.dtype)

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tm, tk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.dtype(out_dtype)),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=(m * k + k * n)
            + m * n * np.dtype(out_dtype).itemsize,
            transcendentals=0),
        name=f"matmul_scaled_{tm}x{tn}x{tk}",
        interpret=interpret,
    )

    def fn(buffers, scalars=()):
        import jax.numpy as jnp

        a, b, o = buffers
        sa, sb = scalars
        out = call(jnp.full((1, 1), sa, jnp.float32),
                   jnp.full((1, 1), sb, jnp.float32),
                   a.reshape(m, k).astype(jnp.dtype(in_dtype)),
                   b.reshape(k, n).astype(jnp.dtype(in_dtype)))
        return (out.reshape(o.shape),)

    return CompiledKernel(
        fn=fn, mutable_indices=[2],
        source=f"pallas scaled matmul {m}x{n}x{k} tiles {tm}x{tn}x{tk} "
        f"{in_dtype}->{out_dtype}",
        name=f"matmul_scaled_{tm}x{tn}x{tk}", flops=2 * m * n * k,
        vmem_estimate=_matmul_vmem(tm, tn, tk,
                                   np.dtype(in_dtype).itemsize,
                                   np.dtype(out_dtype).itemsize))


def matmul_scaled(client, a: Handle, b: Handle, out: Handle,
                  m: int, n: int, k: int,
                  scale_a: float = 1.0, scale_b: float = 1.0,
                  tm: int = 512, tn: int = 512, tk: int = 512,
                  in_dtype: Optional[str] = None) -> None:
    """Scaled matmul: ``out = (a @ b) * scale_a * scale_b`` — the
    dequantizing epilogue for fp8/int8 quantized weights (reference
    cmma::execute_scaled)."""
    in_dtype = in_dtype or str(a.dtype)
    interpret = bool(client._dev.call(
        lambda s: getattr(s.compiler, "interpret", False)))
    tm, tn, tk = (min(tm, m), min(tn, n), min(tk, k))
    kid = KernelId.build("matmul_scaled", m, n, k, tm, tn, tk, in_dtype,
                         str(out.dtype), interpret)
    task = NativeKernelTask(
        kid, lambda: _build_matmul_scaled(m, n, k, tm, tn, tk, in_dtype,
                                          str(out.dtype), interpret),
        name="matmul_scaled")
    client.launch(task, [a, b, out], [float(scale_a), float(scale_b)])
