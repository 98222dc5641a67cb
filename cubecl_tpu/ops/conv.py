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
    return _conv_tuner.execute(client, ts, client, x, wgt)
