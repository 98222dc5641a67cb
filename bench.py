#!/usr/bin/env python
"""Headline benchmark: autotuned bf16 4096^3 matmul as % of MXU peak.

BASELINE.md §3 target: >= 90% of MXU peak on the available TPU.
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The tile comes from the REAL autotune path (ops.matmul.autotune_best_tile:
capture + chained-slope timing, VMEM pre-pruning), then the winning config
is re-measured with the chained-slope harness for the headline number.

Timing notes: through the axon tunnel, block_until_ready does not reliably
block, so completion is forced with a 1-element D2H readback and the
per-iteration time comes from the slope between a short and a long chained
run (subtracting fixed dispatch/transfer overhead). See BENCH_NOTES.md.
"""

import json
import sys

import numpy as np


def _per_iter(f, args, lo=6, hi=42):
    """Auto-extending slope timing (tune.timing enforces the >=40ms
    spread rule — the fixed 4-vs-36 chains of earlier rounds produced a
    110%-of-peak reading once tunnel jitter lined up wrong)."""
    from cubecl_tpu.tune.timing import chain_args_time

    return chain_args_time(f, args, lo=lo, hi=hi)


def _tpu_smoke_counts():
    """Run the Mosaic-sensitive smoke subset ON THE REAL CHIP and report
    the counts in the driver-visible JSON (round-4 VERDICT item 2:
    rounds 3 and 4 both shipped interpreter-only kernels that broke on
    hardware; the reference runs its full testgen matrix on every real
    backend, cubecl-cuda/src/lib.rs:76). Runs as a subprocess BEFORE
    this process touches the TPU so the tunnel has one client at a
    time."""
    import os
    import re
    import subprocess

    env = dict(os.environ, CUBECL_TEST_TPU="1")
    # cheap reachability probe FIRST (its own subprocess, so this
    # process still hasn't touched the chip): without it, a down
    # tunnel turns every smoke test into a TpuRuntime error and the
    # JSON reports tpu_smoke_failed=N as if kernels regressed
    try:
        pr = subprocess.run(
            [sys.executable, "-c",
             "import jax, numpy as np, jax.numpy as jnp\n"
             "assert jax.default_backend() != 'cpu'\n"
             "np.asarray(jnp.zeros(8) + 1)"],
            capture_output=True, timeout=240, env=os.environ.copy())
        if pr.returncode != 0:
            print("# tpu smoke skipped: TPU unreachable "
                  f"({(pr.stderr or b'').decode()[-200:]})",
                  file=sys.stderr)
            return {}
    except Exception as e:  # noqa: BLE001
        print(f"# tpu smoke skipped: probe failed ({e})", file=sys.stderr)
        return {}
    try:
        p = subprocess.run(
            [sys.executable, "-m", "pytest", "tests/", "-q"],
            capture_output=True, text=True, timeout=2400, env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        tail = (p.stdout or "").strip().splitlines()[-1:]
        text = tail[0] if tail else ""
        print(f"# tpu smoke: {text}", file=sys.stderr)
        passed = sum(int(m) for m in re.findall(r"(\d+) passed", text))
        failed = sum(int(m) for m in re.findall(r"(\d+) (?:failed|error)",
                                                text))
        if passed == 0 and failed == 0:
            print(f"# tpu smoke produced no counts; stderr tail: "
                  f"{(p.stderr or '')[-300:]}", file=sys.stderr)
        return {"tpu_smoke_passed": passed, "tpu_smoke_failed": failed}
    except Exception as e:  # noqa: BLE001
        print(f"# tpu smoke suite failed to run: {e}", file=sys.stderr)
        return {}


def main() -> int:
    import jax
    import jax.numpy as jnp

    from cubecl_tpu import TpuRuntime, CpuRuntime
    from cubecl_tpu.ops.matmul import _build_matmul, autotune_top_tiles

    smoke = {}
    if "--no-smoke" not in sys.argv:
        smoke = _tpu_smoke_counts()

    try:
        client = TpuRuntime.client()
        on_tpu = True
    except Exception:
        client = CpuRuntime.client()
        on_tpu = False

    gen = client.properties().generation
    peak = gen.bf16_flops
    dev = client._dev.call(lambda s: s.device)

    M = N = K = 4096 if on_tpu else 512
    A = (np.random.randn(M, K) * 0.1).astype(np.float32)
    B = (np.random.randn(K, N) * 0.1).astype(np.float32)
    a = jax.device_put(jnp.asarray(A, jnp.bfloat16), dev)
    b = jax.device_put(jnp.asarray(B, jnp.bfloat16), dev)

    # the real autotune path picks the tile (VMEM-pruned, slope-timed)
    ah = client.create(a)
    bh = client.create(b)
    oh = client.empty((M * N,), "bfloat16")
    try:
        tiles = autotune_top_tiles(client, ah, bh, oh, M, N, K, "bfloat16")
        print(f"# autotune shortlist {tiles}", file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        print(f"# autotune failed ({e}); falling back to 1024x1024x512",
              file=sys.stderr)
        tiles = [(1024, 1024, 512)]

    best = None
    for tm, tn, tk in tiles:
        try:
            ck = _build_matmul(M, N, K, tm, tn, tk, "bfloat16", "bfloat16",
                               "float32")
            f = jax.jit(lambda x, y, _c=ck: _c.fn([x, y, y], ())[0])
            per = _per_iter(lambda x, y: f(x, y), (a, b))
            tflops = 2 * M * N * K / per / 1e12
            if best is None or tflops > best[1]:
                best = ((tm, tn, tk), tflops, per)
        except Exception as e:  # noqa: BLE001
            print(f"# tile {tm}x{tn}x{tk} failed: {e}", file=sys.stderr)

    if best is None:
        print(json.dumps({"metric": "bf16_4096_matmul_pct_mxu_peak",
                          "value": 0.0, "unit": "%", "vs_baseline": 0.0}))
        return 1

    # fp8 e4m3 matmul (VMEM/HBM at 1 byte/elem, fused MXU widening).
    # fp8 gets its OWN tile autotune (round-2 verdict #4): at 1 B/elem
    # its VMEM budget admits fatter K tiles than bf16's winner, and
    # reusing the bf16 tile under-reported fp8 by ~15%.
    fp8_tflops = None
    if on_tpu:
        try:
            a8 = a.astype(jnp.float8_e4m3fn).reshape(-1)
            b8 = b.astype(jnp.float8_e4m3fn).reshape(-1)
            o0 = jnp.zeros(M * N, jnp.bfloat16)
            ah8 = client.create(a8)
            bh8 = client.create(b8)
            oh8 = client.empty((M * N,), "bfloat16")
            try:
                tiles8 = autotune_top_tiles(client, ah8, bh8, oh8, M, N, K,
                                            "float8_e4m3fn")
                print(f"# fp8 autotune shortlist {tiles8}", file=sys.stderr)
            except Exception as e:  # noqa: BLE001
                print(f"# fp8 autotune FAILED ({e}); measuring the bf16 "
                      f"tile as a non-tuned fallback", file=sys.stderr)
                tiles8 = [best[0]]
            # measure BOTH operand layouts: features.md's "~84%
            # streaming" ceiling was measured with pre-transposed B
            # (the documented serving-weights layout, +4-5% — see
            # BENCH_NOTES "8-bit streaming matmul ceiling"); the
            # row-major figure sits at ~82%. The driver row records
            # the best, keeping the claim and the number in agreement.
            b8t = jnp.asarray(np.ascontiguousarray(B.T),
                              jnp.float8_e4m3fn).reshape(-1)
            for tm, tn, tk in tiles8:
                for bT in (False, True):
                    try:
                        ck8 = _build_matmul(M, N, K, tm, tn, tk,
                                            "float8_e4m3fn", "bfloat16",
                                            "float32", b_transposed=bT)
                        f8 = jax.jit(
                            lambda x, y, z, _c=ck8: _c.fn([x, y, z], ())[0])
                        per8 = _per_iter(lambda x, y, z: f8(x, y, z),
                                         (a8, b8t if bT else b8, o0))
                        t8 = round(2 * M * N * K / per8 / 1e12, 1)
                        if fp8_tflops is None or t8 > fp8_tflops:
                            fp8_tflops = t8
                    except Exception as e:  # noqa: BLE001
                        print(f"# fp8 tile {tm}x{tn}x{tk} bT={bT} "
                              f"failed: {e}", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"# fp8 bench failed: {e}", file=sys.stderr)

    # ---- round-2 kernel lines: reduce / softmax / flash attention -----
    extra = {}
    if on_tpu:
        try:
            extra = _extra_kernel_lines(client)
        except Exception as e:  # noqa: BLE001
            print(f"# extra kernel bench failed: {e}", file=sys.stderr)
        # round-4 family lines: int8 GEMM / conv / selective-scan / MoE /
        # paged decode / captured llama serving loop (VERDICT r3 item 3:
        # regressions in these families must be driver-visible)
        extra.update(_family_lines(client))

    (tile, tflops, per) = best
    pct = 100.0 * tflops * 1e12 / peak
    result = {
        "metric": "bf16_4096_matmul_pct_mxu_peak",
        "value": round(pct, 1),
        "unit": "%",
        "vs_baseline": round(pct / 90.0, 3),
        "detail": {
            "tflops": round(tflops, 1),
            "ms_per_matmul": round(per * 1e3, 3),
            "tile": list(tile),
            "device": gen.name,
            "peak_tflops": peak / 1e12,
            "shape": [M, N, K],
            "fp8_e4m3_tflops": fp8_tflops,
            **smoke,
            **extra,
        },
    }
    print(json.dumps(result))
    return 0


def _extra_kernel_lines(client):
    """Reduce/softmax/attention numbers with the validated harnesses
    (BENCH_NOTES measurement rules; ~2-3 min of compiles + timing)."""
    import jax
    import jax.numpy as jnp

    from cubecl_tpu.frontend import ArrayArg
    from cubecl_tpu.ops.attention import flash_attention
    from cubecl_tpu.ops.normalization import _wide_plan, softmax_lines_inplace
    from cubecl_tpu.ops.reduce import _build_reduce_native
    from cubecl_tpu.runtime.base import CubeCount, CubeDim
    from cubecl_tpu.tune.timing import (chain_args_time, chain_pingpong_time,
                                        chain_scalar_time)

    out = {}
    # reduce: 64M f32 read stream, native kernel vs XLA
    n = 64 * 2**20
    x1 = jnp.asarray(np.random.randn(n).astype(np.float32))
    ck = _build_reduce_native(n, 4096, "float32", False)
    f = jax.jit(lambda v: ck.fn([v, jnp.zeros(1, jnp.float32)], ())[0])
    per = chain_scalar_time(f, x1)
    per_xla = chain_scalar_time(lambda v: jnp.sum(v).reshape(1), x1)
    out["reduce_native_gbps"] = round(n * 4 / per / 1e9, 0)
    out["reduce_xla_gbps"] = round(n * 4 / per_xla / 1e9, 0)
    del x1

    # softmax: 64k x 1024 f32 (256MB), in-place DSL vs XLA, ping-pong
    R, C = 65536, 1024
    xs = jnp.asarray((np.random.randn(R, C) * 0.1).astype(np.float32))
    ih = client.create(xs.reshape(-1))
    units, iters, cubes = _wide_plan(R, C, 4, buffers=1)
    cks = softmax_lines_inplace.compile_only(
        client, CubeCount(cubes), CubeDim.new_1d(units),
        ArrayArg(ih, line_size=C, mutable=True), iters, units, checked=False)
    fs = jax.jit(lambda v: cks.fn([v.reshape(-1)], ())[0].reshape(R, C))
    per = chain_pingpong_time(fs, xs)
    per_xla = chain_pingpong_time(jax.nn.softmax, xs)
    out["softmax_inplace_gbps"] = round(2 * R * C * 4 / per / 1e9, 0)
    out["softmax_xla_gbps"] = round(2 * R * C * 4 / per_xla / 1e9, 0)
    client.free(ih)
    del xs

    # flash attention fwd, S=2048 D=128 B=4 H=8 bf16 causal
    B, H, S, D = 4, 8, 2048, 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, S, D)) * .1, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, S, D)) * .1, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)) * .1, jnp.bfloat16)
    fl = 4 * B * H * S * S * D // 2
    per = chain_args_time(lambda a, b, c: flash_attention(a, b, c), (q, k, v))
    out["flash_fwd_tflops"] = round(fl / per / 1e12, 1)

    # long-context flash (S=8192): causal tile-skip finally outruns the
    # per-step softmax serialization — the realistic training shape
    S8 = 8192
    q8 = jnp.asarray(rng.standard_normal((1, H, S8, D)) * .1, jnp.bfloat16)
    k8 = jnp.asarray(rng.standard_normal((1, H, S8, D)) * .1, jnp.bfloat16)
    v8 = jnp.asarray(rng.standard_normal((1, H, S8, D)) * .1, jnp.bfloat16)
    fl8 = 4 * 1 * H * S8 * S8 * D // 2
    per8 = chain_args_time(lambda a, b, c: flash_attention(a, b, c),
                           (q8, k8, v8))
    out["flash_fwd_8k_tflops"] = round(fl8 / per8 / 1e12, 1)
    del q8, k8, v8

    # DSL CMMA matmul (the language path) — whole-K fragment tiles
    from cubecl_tpu.frontend import TensorArg
    from cubecl_tpu.ir.types import elem_from_dtype
    from cubecl_tpu.ops.matmul import matmul_cmma_nd_kernel

    M = 4096
    am = jnp.asarray(rng.standard_normal((M * M,)) * .1, jnp.bfloat16)
    bm = jnp.asarray(rng.standard_normal((M * M,)) * .1, jnp.bfloat16)
    om = jnp.zeros(M * M, jnp.bfloat16)
    ha, hb, ho = client.create(am), client.create(bm), client.create(om)
    tm, tn = 512, 1024
    ckm = matmul_cmma_nd_kernel.compile_only(
        client, CubeCount(M // tn, M // tm), CubeDim.new_1d(8),
        TensorArg(ha, shape=(M, M), line_size=128),
        TensorArg(hb, shape=(M, M), line_size=128),
        TensorArg(ho, shape=(M, M), line_size=128, mutable=True),
        tm, tn, M, M, elem_from_dtype(ha.dtype))
    fm = jax.jit(lambda a, b, o, _c=ckm: _c.fn([a, b, o], ())[0])
    per = chain_args_time(lambda a, b, o: fm(a, b, o), (am, bm, om),
                          lo=10, hi=80)
    out["dsl_cmma_matmul_tflops"] = round(2 * M ** 3 / per / 1e12, 1)
    for h in (ha, hb, ho):
        client.free(h)
    return out


def _family_lines(client):
    """One driver-captured row per round-3/4 kernel family (each in its
    own try so a single failure can't hide the rest). Values follow the
    BENCH_NOTES harnesses exactly; see the per-family sections there."""
    import jax
    import jax.numpy as jnp

    from cubecl_tpu.tune.timing import chain_args_time

    out = {}
    rng = np.random.default_rng(0)

    # int8 streaming GEMM, pre-transposed B, whole-K tile, bf16 out —
    # the measured 8-bit streaming ceiling config (BENCH_NOTES)
    try:
        from cubecl_tpu.ops.matmul import _build_matmul

        M = N = K = 4096
        a8 = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
        bt8 = jnp.asarray(rng.integers(-127, 127, (N, K)), jnp.int8)
        ck = _build_matmul(M, N, K, 1024, 1024, 4096, "int8", "bfloat16",
                           "int32", b_transposed=True)
        f = jax.jit(lambda x, y, _c=ck: _c.fn([x, y, y], ())[0])
        per = chain_args_time(lambda x, y: f(x, y), (a8, bt8))
        out["int8_tops"] = round(2 * M * N * K / per / 1e12, 1)
        del a8, bt8
    except Exception as e:  # noqa: BLE001
        print(f"# int8 GEMM bench failed: {e}", file=sys.stderr)

    # conv2d native path, the fat-channel shape (79% of MXU peak)
    try:
        from cubecl_tpu.ops.conv import _build_conv

        n_, h_, w_, c_, k_ = 16, 28, 28, 256, 256
        x = jnp.asarray(rng.standard_normal((n_, h_, w_, c_)) * .1,
                        jnp.bfloat16)
        wgt = jnp.asarray(rng.standard_normal((3, 3, c_, k_)) * .1,
                          jnp.bfloat16)
        ck = _build_conv(n_, h_, w_, c_, 3, 3, k_, (1, 1), "SAME",
                         "bfloat16", "float32")
        f = jax.jit(lambda a, b, _c=ck: _c.fn([a, b, a], ())[0])
        per = chain_args_time(lambda a, b: f(a, b), (x, wgt))
        fl = 2 * n_ * h_ * w_ * 3 * 3 * c_ * k_
        out["conv_tflops"] = round(fl / per / 1e12, 1)
        del x, wgt
    except Exception as e:  # noqa: BLE001
        print(f"# conv bench failed: {e}", file=sys.stderr)

    # small-channel conv: the pair-packed pallas kernel (C=K=64, the
    # shape XLA's implicit-GEMM conv underfills 2x on lanes)
    try:
        from cubecl_tpu.ops.conv import conv2d_pairs_packed, pack_pairs

        n_, h_, w_ = 32, 56, 56
        x = jnp.asarray(rng.standard_normal((n_, h_, w_, 64)) * .1,
                        jnp.bfloat16)
        wc = jnp.asarray(rng.standard_normal((3, 3, 64, 64)) * .1,
                         jnp.bfloat16)
        xp = pack_pairs(x)
        f = jax.jit(lambda a, b: conv2d_pairs_packed(a, b, h_))
        per = chain_args_time(lambda a, b: f(a, b), (xp, wc))
        fl = 2 * n_ * h_ * w_ * 9 * 64 * 64
        out["conv_smallc_pairs_tflops"] = round(fl / per / 1e12, 1)
        del x, wc, xp
    except Exception as e:  # noqa: BLE001
        print(f"# small-C conv bench failed: {e}", file=sys.stderr)

    # selective scan: kernel-only core on pre-discretized arrays —
    # exactly 3 HBM passes (a read + u read + h write)
    try:
        from cubecl_tpu.ops.ssm import scan_chunked_core

        B, L, DN = 8, 2048, 16384      # D=1024, N=16 (queue item 5)
        af = jnp.asarray(
            np.exp(-np.abs(rng.standard_normal((B, L, DN)))) * 0.9,
            jnp.float32)
        uf = jnp.asarray(rng.standard_normal((B, L, DN)) * .1, jnp.float32)
        f = jax.jit(lambda a, u: scan_chunked_core(a, u, chunk=1024))
        per = chain_args_time(lambda a, u: f(a, u), (af, uf))
        out["selective_scan_gbps"] = round(3 * B * L * DN * 4 / per / 1e9, 0)
        del af, uf
    except Exception as e:  # noqa: BLE001
        print(f"# selective-scan bench failed: {e}", file=sys.stderr)

    # MoE capacity-grouped expert matmul, skewed counts (tile skip):
    # TF counted on LIVE routed tokens only
    try:
        from cubecl_tpu.ops.moe import expert_matmul

        E, cap, d, f_ = 8, 2048, 4096, 4096
        counts = np.array([2048, 1536, 1024, 512, 256, 128, 128, 64],
                          np.int32)
        xg = jnp.asarray(rng.standard_normal((E, cap, d)) * .1,
                         jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((E, d, f_)) * .02, jnp.bfloat16)
        cj = jnp.asarray(counts)
        per = chain_args_time(
            lambda x, ww: expert_matmul(x, ww, cj, bt=128), (xg, w))
        fl = 2 * int(counts.sum()) * d * f_
        out["moe_expert_matmul_tflops"] = round(fl / per / 1e12, 1)
        # dense-equivalent rate (all experts full): the grouped kernel's
        # pure per-tile MXU rate with no skew/padding — the VERDICT-r4
        # "prove the wall" number (95% of the dedicated matmul kernel)
        full = jnp.full((E,), cap, jnp.int32)
        per_f = chain_args_time(
            lambda x, ww: expert_matmul(x, ww, full, bt=256), (xg, w))
        out["moe_dense_equiv_tflops"] = round(
            2 * E * cap * d * f_ / per_f / 1e12, 1)
        del xg, w
    except Exception as e:  # noqa: BLE001
        print(f"# moe bench failed: {e}", file=sys.stderr)

    # paged-KV decode kernel, B=16 x 2048-token contexts, f32
    try:
        from cubecl_tpu.ops.paged_attention import paged_attention

        B, Hq, Hkv, D, page, npg = 16, 8, 8, 128, 128, 16
        P = B * npg
        q = jnp.asarray(rng.standard_normal((B, Hq, D)) * .1, jnp.float32)
        kp = jnp.asarray(rng.standard_normal((Hkv, P, page, D)) * .1,
                         jnp.float32)
        vp = jnp.asarray(rng.standard_normal((Hkv, P, page, D)) * .1,
                         jnp.float32)
        pi = jnp.asarray(rng.permutation(P).reshape(B, npg), jnp.int32)
        ln = jnp.full((B,), npg * page, jnp.int32)
        per = chain_args_time(
            lambda qq, kk, vv: paged_attention(qq, kk, vv, pi, ln),
            (q, kp, vp))
        out["paged_decode_us_step"] = round(per * 1e6, 0)
        out["paged_decode_kv_gbps"] = round(
            2 * Hkv * B * npg * page * D * 4 / per / 1e9, 0)
        del q, kp, vp
    except Exception as e:  # noqa: BLE001
        print(f"# paged decode bench failed: {e}", file=sys.stderr)

    # end-to-end llama serving loop: whole decode steps compiled as ONE
    # executable (fori_loop body = the graph-capture replay form), B=16
    try:
        out["llama_decode_tok_s"] = _llama_serving_line()
    except Exception as e:  # noqa: BLE001
        print(f"# llama serving bench failed: {e}", file=sys.stderr)

    # same captured loop with the int8-KV cache (4x capacity; the
    # round-5-fixed quantized paged path in the driver's hands)
    try:
        out["llama_decode_int8kv_tok_s"] = _llama_serving_line("int8")
    except Exception as e:  # noqa: BLE001
        print(f"# llama int8-KV serving bench failed: {e}",
              file=sys.stderr)

    # training-side rows (round-4 VERDICT item 3: the custom_vjp flash
    # backward and the end-to-end train step regressed invisibly —
    # BENCH_NOTES prose only). Reference: measure-everything,
    # /root/reference/crates/cubecl-std/src/throughput/base.rs:26
    out.update(_train_lines())
    return out


def _train_lines():
    """flash fwd+bwd TFLOP/s (S=2048 and S=8192) and llama train-step
    MFU. Model-flops convention (no remat credit): fwd+bwd = 3x the
    forward matmul flops; causal attention counted at half the score
    matrix."""
    import jax
    import jax.numpy as jnp

    from cubecl_tpu.ops.attention import flash_attention
    from cubecl_tpu.tune.timing import chain_args_time

    out = {}
    rng = np.random.default_rng(0)
    for key, (B, H, S, D) in (("flash_fwdbwd_tflops", (4, 8, 2048, 128)),
                              ("flash_fwdbwd_8k_tflops", (1, 8, 8192, 128))):
        try:
            q = jnp.asarray(rng.standard_normal((B, H, S, D)) * .1,
                            jnp.bfloat16)
            k = jnp.asarray(rng.standard_normal((B, H, S, D)) * .1,
                            jnp.bfloat16)
            v = jnp.asarray(rng.standard_normal((B, H, S, D)) * .1,
                            jnp.bfloat16)

            def fwdbwd(qq, kk, vv):
                f = lambda *t: flash_attention(*t).astype(  # noqa: E731
                    jnp.float32).sum()
                dq, dk, dv = jax.grad(f, argnums=(0, 1, 2))(qq, kk, vv)
                # tie ALL THREE grads into the timing carry: the
                # backward is split into separate dq and dkv pallas
                # kernels (ops/attention.py), and a dq-only carry lets
                # XLA DCE the dkv kernel entirely (43.4M vs 77.5M
                # compiled FLOPs — round-5 review). The elementwise add
                # is noise; the carry's [0]-slice cannot sink through
                # opaque pallas_call outputs.
                return dq + dk + dv

            per = chain_args_time(fwdbwd, (q, k, v))
            # causal: fwd 2 matmuls + bwd 5 (dV, dP, recomputed P, dQ,
            # dK) = 7 x 2*S*S*D mults, halved by the triangular mask
            fl = 7 * 2 * B * H * S * S * D // 2
            out[key] = round(fl / per / 1e12, 1)
            del q, k, v
        except Exception as e:  # noqa: BLE001
            print(f"# {key} bench failed: {e}", file=sys.stderr)

    try:
        out["llama_train_mfu_pct"] = _llama_train_mfu()
    except Exception as e:  # noqa: BLE001
        print(f"# llama train MFU bench failed: {e}", file=sys.stderr)
    return out


def _llama_train_mfu():
    """End-to-end llama train-step MFU at a production-shaped config:
    0.77B params (d_model=2048, 16 layers, GQA-8, d_ff=5632), bf16,
    B=8 x S=1024, NO remat (activations fit; remat costs ~20% MFU in
    uncredited recompute — measured 34.8 vs 44.0, BENCH_NOTES), full
    fwd+bwd+SGD chained through a fori_loop with the updated params as
    the carry. Model flops = 3x forward (matmul params + causal
    attention), over the generation's bf16 peak. Round-5 v5e: 44.0%."""
    import jax
    import jax.numpy as jnp

    from cubecl_tpu import TpuRuntime
    from cubecl_tpu.models import llama

    import time

    cfg = llama.LlamaConfig(vocab=8192, d_model=2048, n_heads=16,
                            n_kv_heads=8, n_layers=16, d_ff=5632,
                            seq=1024, dtype="bfloat16", remat=False)
    params = llama.init_params(cfg)
    B, S = 8, 1024
    step = llama.make_train_step(cfg)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab, (B, S)), jnp.int32)

    # a REAL chained training loop: each step's updated params feed the
    # next step's forward, so no part of the backward or the update can
    # be dead-code-eliminated. (The first cut timed
    # `lambda p, t: step(p, t)[1]` through chain_args_time — the loss-
    # only carry let XLA DCE the whole backward+update: 14.6M vs 56.3M
    # compiled FLOPs, a ~3-4x inflated MFU. Caught by round-5 review.)
    @jax.jit
    def run_n(params, tokens, n):
        def body(_i, carry):
            p, _l = carry
            return step(p, tokens)
        z = jnp.zeros((), jnp.float32)
        _p2, l = jax.lax.fori_loop(0, n, body, (params, z))
        return l

    def timed(n):
        t0 = time.perf_counter()
        np.asarray(run_n(params, tokens, n))
        return time.perf_counter() - t0

    timed(2)
    timed(2)
    # 438 ms/step: a 10-step spread is ~4.4s, 100x the >=40ms rule
    t_lo = min(timed(3) for _ in range(3))
    t_hi = min(timed(13) for _ in range(3))
    per = (t_hi - t_lo) / 10

    d, L = cfg.d_model, cfg.n_layers
    d_head = d // cfg.n_heads
    kv_cols = cfg.n_kv_heads * d_head
    per_layer = d * d + 2 * d * kv_cols + d * d \
        + 3 * cfg.d_ff * d                       # q,k,v,o + w1,w2,w3
    n_matmul = L * per_layer + d * cfg.vocab     # + tied head
    T = B * (S - 1)
    attn_fwd = 4 * B * cfg.n_heads * (S - 1) ** 2 * d_head // 2
    model_flops = 3 * (2 * n_matmul * T + attn_fwd)
    peak = TpuRuntime.client().properties().generation.bf16_flops
    return round(100.0 * model_flops / per / peak, 1)


def _llama_serving_line(kv_dtype: str = ""):
    """Captured serving loop tok/s (B=16, ctx~512, 8 layers): N decode
    steps as one executable with the KV cache donated between steps —
    the TPU form of reference graph-capture replay (client.rs:998).
    ``kv_dtype="int8"`` benches the quantized-KV cache (pre-gathered
    scale windows + the clamped dynamic-grid rules, BENCH_NOTES
    round-5)."""
    import time

    import jax
    import jax.numpy as jnp

    from cubecl_tpu.models import llama

    cfg = llama.LlamaConfig(vocab=8192, d_model=768, n_heads=12,
                            n_kv_heads=4, n_layers=8, d_ff=2048, seq=512,
                            kv_dtype=kv_dtype)
    params = llama.init_params(cfg)
    Bd = 16
    cache = llama.init_kv_cache(cfg, Bd, max_pages=4)
    cache = dict(cache, lengths=jnp.full((Bd,), 384, jnp.int32))
    rng = np.random.default_rng(0)
    tok = jnp.asarray(rng.integers(0, cfg.vocab, (Bd,)), jnp.int32)

    @jax.jit
    def run_n(params, cache, tok, n):
        def body(i, carry):
            c, _ = carry
            lg, c2 = llama.decode_step(params, c, tok, cfg)
            return (c2, lg)
        z = jnp.zeros((Bd, cfg.vocab), jnp.float32)
        return jax.lax.fori_loop(0, n, body, (cache, z))

    def timed(n):
        t0 = time.perf_counter()
        _c, lg = run_n(params, cache, tok, n)
        np.asarray(lg[0, 0])
        return time.perf_counter() - t0

    timed(5)
    timed(5)
    t_lo = min(timed(10) for _ in range(3))
    t_hi = min(timed(110) for _ in range(3))
    per = (t_hi - t_lo) / 100
    return round(Bd / per, 0)


if __name__ == "__main__":
    sys.exit(main())
