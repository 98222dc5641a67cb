"""Convolutions (the 4th kernel family of the reference ecosystem's
kernel crates: matmul / conv / attention / reduce — SURVEY.md §0).

Two paths, mirroring the matmul structure:

1. ``conv2d`` — the production path: a NativeKernelTask around XLA's
   MXU convolution. On TPU the compiler's conv lowering (implicit GEMM
   with input/filter layout packing) IS the speed of light; a
   hand-written pallas conv cannot beat it, so the native escape hatch
   is the honest design (same reasoning as reduce_sum_native vs XLA).
2. ``conv2d_im2col`` — patches extracted to a (N*OH*OW, R*S*C) matrix,
   multiplied through THIS framework's autotuned MXU matmul: the
   teaching/parity path that exercises our kernel stack end-to-end.
3. ``conv2d_pairs`` — the small-channel (C ≤ 64) 3×3 pallas kernel XLA
   does NOT have: W-pixel pair packing puts TWO pixels on the 128-lane
   axis so every MXU dimension is full, at 1.33× FLOP overhead instead
   of the 2× lane underfill of NHWC C=64 (round-3 ceiling note). See
   the function docstring for the shifted-slab construction.

Layouts: NHWC activations, HWIO filters (TPU-native layouts — channels
ride the 128-lane axis).
"""

from __future__ import annotations

from typing import Tuple, Union

import numpy as np

from ..runtime.handle import Handle
from ..runtime.kernel import KernelId, NativeKernelTask
from ..backend.compiler import CompiledKernel

Pad = Union[str, int, Tuple[int, int]]


def _norm_pad(padding: Pad, r: int, s: int):
    if padding == "SAME":
        return "SAME"
    if padding == "VALID":
        return "VALID"
    if isinstance(padding, int):
        return [(padding, padding), (padding, padding)]
    (ph, pw) = padding
    return [(ph, ph), (pw, pw)]


def _out_hw(h, w, r, s, stride, padding):
    sh, sw = stride
    if padding == "SAME":
        return -(-h // sh), -(-w // sw)
    if padding == "VALID":
        return (h - r) // sh + 1, (w - s) // sw + 1
    pads = _norm_pad(padding, r, s)
    return ((h + pads[0][0] + pads[0][1] - r) // sh + 1,
            (w + pads[1][0] + pads[1][1] - s) // sw + 1)


def _build_conv(n, h, w, c, r, s, k, stride, padding, dtype, acc_dtype):
    import jax
    import jax.numpy as jnp

    oh, ow = _out_hw(h, w, r, s, stride, padding)

    def fn(buffers, scalars=()):
        x, wgt, o = buffers
        y = jax.lax.conv_general_dilated(
            x.reshape(n, h, w, c).astype(jnp.dtype(dtype)),
            wgt.reshape(r, s, c, k).astype(jnp.dtype(dtype)),
            window_strides=stride,
            padding=_norm_pad(padding, r, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.dtype(acc_dtype),
        )
        return (y.astype(o.dtype).reshape(o.shape),)

    return CompiledKernel(
        fn=fn, mutable_indices=[2],
        source=f"native conv2d {n}x{h}x{w}x{c} * {r}x{s}x{c}x{k} "
        f"stride={stride} pad={padding}",
        name="conv2d", flops=2 * n * oh * ow * r * s * c * k)


def conv2d(client, x: Handle, wgt: Handle,
           n: int, h: int, w: int, c: int, r: int, s: int, k: int,
           stride: Tuple[int, int] = (1, 1), padding: Pad = "SAME",
           acc_dtype: str = "float32") -> Handle:
    """NHWC x HWIO -> NHWC convolution on the MXU (native path)."""
    oh, ow = _out_hw(h, w, r, s, stride, padding)
    out = client.empty((n * oh * ow * k,), str(x.dtype))
    kid = KernelId.build("conv2d", n, h, w, c, r, s, k, stride,
                         str(padding), str(x.dtype), acc_dtype)
    task = NativeKernelTask(
        kid, lambda: _build_conv(n, h, w, c, r, s, k, stride, padding,
                                 str(x.dtype), acc_dtype),
        name="conv2d")
    client.launch(task, [x, wgt, out])
    return out


def conv2d_im2col(client, x: Handle, wgt: Handle,
                  n: int, h: int, w: int, c: int, r: int, s: int, k: int,
                  stride: Tuple[int, int] = (1, 1),
                  padding: Pad = "SAME") -> Handle:
    """Conv as im2col + THIS framework's autotuned matmul.

    Patch extraction runs as a native task (pure data movement XLA does
    well); the FLOPs go through ``matmul_autotuned`` — our MXU kernel.
    Requires the GEMM dims to be 128-aligned (pad channels/filters to
    taste); falls back to ``conv2d`` otherwise."""
    from .matmul import matmul_autotuned, matmul_pallas

    oh, ow = _out_hw(h, w, r, s, stride, padding)
    M, K = n * oh * ow, r * s * c
    if M % 128 or K % 128 or k % 128:
        return conv2d(client, x, wgt, n, h, w, c, r, s, k, stride, padding)

    def _build_im2col():
        import jax
        import jax.numpy as jnp

        def fn(buffers, scalars=()):
            (xx, o) = buffers
            xi = xx.reshape(n, h, w, c)
            pads = _norm_pad(padding, r, s)
            if pads == "SAME":
                ph = max(0, (oh - 1) * stride[0] + r - h)
                pw = max(0, (ow - 1) * stride[1] + s - w)
                pads = [(ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2)]
            elif pads == "VALID":
                pads = [(0, 0), (0, 0)]
            xi = jnp.pad(xi, ((0, 0), pads[0], pads[1], (0, 0)))
            cols = jax.lax.conv_general_dilated_patches(
                xi, (r, s), stride, "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            # patches come out channel-major (C, R, S) per pixel; reorder
            # to (R, S, C) to match HWIO filter flattening
            cols = cols.reshape(n * oh * ow, c, r * s).transpose(0, 2, 1)
            return (cols.reshape(o.shape),)

        return CompiledKernel(fn=fn, mutable_indices=[1],
                              source="im2col", name="im2col")

    cols = client.empty((M * K,), str(x.dtype))
    kid = KernelId.build("im2col", n, h, w, c, r, s, stride, str(padding),
                         str(x.dtype))
    client.launch(NativeKernelTask(kid, _build_im2col, name="im2col"),
                  [x, cols])
    out = client.empty((M * k,), str(x.dtype))
    matmul_autotuned(client, cols, wgt, out, M, k, K)
    return out


from ..tune import LocalTuner, TunableSet  # noqa: E402
from ..tune.anchor import anchor  # noqa: E402

_conv_tuner = LocalTuner("conv2d")


def conv2d_autotuned(client, x: Handle, wgt: Handle,
                     n: int, h: int, w: int, c: int, r: int, s: int, k: int,
                     stride: Tuple[int, int] = (1, 1),
                     padding: Pad = "SAME") -> Handle:
    """Autotuned conv entry: native XLA conv vs im2col-through-our-matmul
    per anchored shape (the reference LocalTuner pattern over algorithm
    variants rather than tile sizes)."""
    oh, ow = _out_hw(h, w, r, s, stride, padding)
    M, K = n * oh * ow, r * s * c

    def key_fn(client_, x_, w_):
        return ("conv2d", anchor(n * h * w), c, r, s, k, stride,
                str(padding))

    ts = TunableSet("conv2d", key_fn)
    flops = 2 * M * K * k

    ts.with_tunable(
        lambda cl, xx, ww: conv2d(cl, xx, ww, n, h, w, c, r, s, k,
                                  stride, padding),
        name="native", work=lambda key: (flops, (M * K + K * k) * 4))
    if M % 128 == 0 and K % 128 == 0 and k % 128 == 0:
        ts.with_tunable(
            lambda cl, xx, ww: conv2d_im2col(cl, xx, ww, n, h, w, c, r, s,
                                             k, stride, padding),
            name="im2col", work=lambda key: (flops, (M * K + K * k) * 4))
    if (r, s) == (3, 3) and stride == (1, 1) and padding == "SAME" \
            and c <= 64 and k <= 64 and w % 2 == 0:
        # the small-channel pair-packed kernel (measured 1.3-1.5x the
        # XLA conv at C=64 on v5e — see BENCH_NOTES round 4)
        ts.with_tunable(
            lambda cl, xx, ww: _conv_pairs_task(cl, xx, ww, n, h, w, c, k),
            name="pairs", work=lambda key: (flops, (M * K + K * k) * 4))
    return _conv_tuner.execute(client, ts, client, x, wgt)


def _conv_pairs_task(client, x: Handle, wgt: Handle,
                     n: int, h: int, w: int, c: int, k: int) -> Handle:
    """conv2d_pairs as a NativeKernelTask (handle-level entry)."""
    out = client.empty((n * h * w * k,), str(x.dtype))
    interpret = bool(client._dev.call(
        lambda s: getattr(s.compiler, "interpret", False)))
    kid = KernelId.build("conv2d_pairs", n, h, w, c, k, str(x.dtype),
                         interpret)

    def _build():
        def fn(buffers, scalars=()):
            xx, ww, o = buffers
            y = conv2d_pairs(xx.reshape(n, h, w, c),
                             ww.reshape(3, 3, c, k), interpret=interpret)
            return (y.reshape(o.shape),)

        return CompiledKernel(fn=fn, mutable_indices=[2],
                              source="conv2d_pairs", name="conv2d_pairs")

    client.launch(NativeKernelTask(kid, _build, name="conv2d_pairs"),
                  [x, wgt, out])
    return out


# ---------------------------------------------------------------------------
# 3. Pair-packed small-channel conv (the cubek-class kernel XLA lacks)
# ---------------------------------------------------------------------------


def pack_pairs(x):
    """NHWC (C<=64) -> pair-packed (N, H*W/2, 2*64) serving layout.

    On TPU a (..., 64)-channel array is stored lane-PADDED to 128 in
    HBM, so this reshape is a real relayout (measured 36us at 12.8MB,
    v5e) — pay it once at the stack boundary and keep small-channel
    activations packed BETWEEN conv layers (conv2d_pairs_packed eats
    and emits this layout)."""
    import jax.numpy as jnp

    N, H, W, C = x.shape
    assert C <= 64 and W % 2 == 0, (x.shape,)
    if C < 64:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 64 - C)))
    return x.reshape(N, H * W // 2, 128)


def unpack_pairs(xp, H, W, C):
    """Inverse of :func:`pack_pairs`."""
    N = xp.shape[0]
    return xp.reshape(N, H, W // 2, 2, 64)[..., :C].reshape(N, H, W, C)


def conv2d_pairs(x, w, interpret: bool = False):
    """3x3 / stride-1 / SAME conv for C <= 64, K <= 64 via W-pixel pair
    packing — the fused shift-and-matmul kernel specified by the round-3
    ceiling note (BENCH_NOTES "Small-channel conv").

    NHWC convenience wrapper: packs, runs the packed kernel, unpacks —
    each pack/unpack is a real HBM relayout on TPU (C=64 arrays are
    lane-padded to 128), costing ~2x36us at the bench shape. Layer
    STACKS should call :func:`conv2d_pairs_packed` on a
    :func:`pack_pairs` layout instead and never unpack in between.

    x: (N, H, W, C), w: (3, 3, C, K); C, K <= 64 (zero-padded to 64
    internally), W even, H arbitrary. Returns (N, H, W, K) in x.dtype.
    Measured v5e (32x56x56x64 -> 64, bf16): 110.8 TF packed kernel,
    73.1 TF through this NHWC adapter, 81.8 XLA conv on the same NHWC
    arrays (BENCH_NOTES round 4). Reference analogue: conv is the one
    cubek kernel family that was still on an XLA escape hatch
    (VERDICT r3 item 7).
    """
    N, H, W, C = x.shape
    R, S, Cw, K = w.shape
    assert Cw == C, (w.shape, x.shape)
    out = conv2d_pairs_packed(pack_pairs(x), w, H, interpret=interpret)
    return unpack_pairs(out, H, W, K)


def conv2d_pairs_packed(xp, w, H: int, interpret: bool = False):
    """The packed-layout pair conv kernel: xp (N, H*W/2, 128) from
    :func:`pack_pairs`, w (3, 3, C<=64, K<=64) -> (N, H*W/2, 128)
    (out channels in the K-slots of each pixel's 64-lane group).

    Why: NHWC with C=64 underfills the 128-lane MXU contraction by 2x
    (round-3 microbench: per-tap ceiling 25%, XLA reaches 39%). Packing
    TWO adjacent W-pixels on lanes makes every MXU dim full:

    - rows = (n, h, wp) pixel PAIRS, lanes = 2 px x 64 C = 128;
    - one flat 64-lane roll builds the ODD-pair view xs (row j = px
      (2j+1, 2j+2)) so each output pair row j contracts TWO full source
      rows: xs[j-1] = px (2j-1, 2j) [left slab] and xs[j] = px
      (2j+1, 2j+2) [right slab];
    - 3 dy row-shifts x 2 slabs = 6 resident (128,128) weight matmuls
      accumulate the output pair row directly — issued FLOPs are
      12 taps/pair vs 9 useful = 1.33x overhead (vs 2x lane underfill),
      ceiling 194/1.33 = 146 TF; measured 110.8 TF (v5e bf16,
      32x56x56x64);
    - W-edge validity rides 6 grid-invariant pre-rolled mask inputs
      (in-kernel iota mask construction measured 236us of VPU work vs
      60us for rolls+dots — the masks are data, not compute); H-edges
      fold into the same masks; the flat roll's block-level wraps
      compose to exactly the right pixels everywhere else (per-image
      grid blocks keep wraps in-image).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, rows, lanes = xp.shape
    assert lanes == 128 and rows % H == 0, (xp.shape, H)
    R, S, C, K = w.shape
    assert (R, S) == (3, 3), (w.shape,)
    assert C <= 64 and K <= 64, "pair packing targets C,K <= 64"
    if C < 64:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, 64 - C), (0, 0)))
    if K < 64:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, 64 - K)))
    WP = rows // H
    x = xp

    # block weights: rows = source lanes (px0: 0:64, px1: 64:128),
    # cols = output pair (out a: 0:64, out b: 64:128). Source px s
    # feeds out t with w[dy, s - t + 1] when |s - t| <= 1.
    wd = w.astype(x.dtype)                       # (3, 3, 64, 64)
    z = jnp.zeros((64, 64), x.dtype)
    Wl = jnp.stack([
        jnp.block([[wd[dy, 0], z], [wd[dy, 1], wd[dy, 0]]])
        for dy in range(3)])                     # (3, 128, 128)
    Wr = jnp.stack([
        jnp.block([[wd[dy, 2], wd[dy, 1]], [z, wd[dy, 2]]])
        for dy in range(3)])

    # Validity masks, PRE-ROLLED by each slab's shift and multiplied in
    # AFTER the roll (roll(mask*x) == roll(mask)*roll(x)): in-kernel
    # iota+compare mask construction measured 236us/call of VPU work vs
    # 60us for the rolls+dots themselves (v5e probe, round 4) — the
    # masks are grid-invariant, so they ride ONE (6, rows, 128) input
    # that stays VMEM-resident across the whole grid.
    rr = np.arange(rows)[:, None]
    ll = np.arange(128)[None, :]
    at_end = (rr % WP) == (WP - 1)
    mL = np.where(at_end & (ll < 64), 0.0, 1.0)     # wrapped px 2j-1
    mR = np.where(at_end & (ll >= 64), 0.0, 1.0)    # wrapped px 2j+2
    masks = []
    for o_dy in (-1, 0, 1):
        dy_ok = np.ones((rows, 1))
        if o_dy == -1:
            dy_ok[: WP] = 0.0                        # h == 0
        elif o_dy == 1:
            dy_ok[rows - WP:] = 0.0                  # h == H-1
        sl_shift = (-(o_dy * WP - 1)) % rows
        sr_shift = (-(o_dy * WP)) % rows
        masks.append(np.roll(mL, sl_shift, axis=0) * dy_ok)
        masks.append(np.roll(mR, sr_shift, axis=0) * dy_ok)
    masks = jnp.asarray(np.stack(masks), x.dtype)    # (6, rows, 128)

    def kernel(x_ref, wl_ref, wr_ref, m_ref, o_ref):
        # Mosaic's rotate only handles 32-bit data ("Rotate with
        # non-32-bit data", first v5e compile) — the shift plumbing
        # runs in f32 and each slab casts back to the storage dtype
        # right before its MXU dot (bf16 single-pass rate).
        roll = ((lambda v, s, ax: jnp.roll(v, s, axis=ax)) if interpret
                else (lambda v, s, ax:                      # non-negative
                      pltpu.roll(v, s % v.shape[ax], ax)))
        f32 = jnp.float32
        xb = x_ref[0].astype(f32)                # (rows, 128)
        # odd-pair view: xs[j] = px (2j+1, 2j+2) — one flat 64-lane roll
        t1 = roll(xb, -64, 1)                    # lanes 0:64 <- px 2j+1
        t2 = roll(t1, -1, 0)                     # lanes 64:128 <- px 2j+2
        lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
        xs = jnp.where(lane < 64, t1, t2)
        dt = x_ref.dtype
        acc = jnp.zeros((rows, 128), f32)
        for i, o_dy in enumerate((-1, 0, 1)):
            sl = roll(xs, -(o_dy * WP - 1) % rows, 0).astype(dt)
            sr = roll(xs, (-(o_dy * WP)) % rows, 0).astype(dt)
            acc += jnp.dot(sl * m_ref[2 * i], wl_ref[i],
                           preferred_element_type=f32)
            acc += jnp.dot(sr * m_ref[2 * i + 1], wr_ref[i],
                           preferred_element_type=f32)
        o_ref[0] = acc.astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, rows, 128), lambda n: (n, 0, 0)),
            pl.BlockSpec((3, 128, 128), lambda n: (0, 0, 0)),
            pl.BlockSpec((3, 128, 128), lambda n: (0, 0, 0)),
            pl.BlockSpec((6, rows, 128), lambda n: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rows, 128), lambda n: (n, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, rows, 128), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
        name=f"conv_pairs_{H}x{WP}",
    )(x, Wl, Wr, masks)
    return out
