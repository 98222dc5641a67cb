"""std-layer tests: layouts, fastdivmod, quant, contiguous, identity."""

import numpy as np
import pytest

from cubecl_tpu.std import (
    FastDivmod,
    LinearLayout,
    PermutedLayout,
    QuantScheme,
    SliceLayout,
    StridedLayout,
    TensorHandle,
    dequantize_np,
    identity,
    quantize_np,
)
from cubecl_tpu.std.quant import QuantLevel
from cubecl_tpu import cube
from cubecl_tpu.frontend import MutSlice, Slice, UNIT_POS
from cubecl_tpu.ir.types import i32, u8
from cubecl_tpu.std.misc import reinterpret_slice


def test_linear_layout():
    l = LinearLayout((4, 8))
    assert l.to_linear(0, 0) == 0
    assert l.to_linear(1, 2) == 10
    assert l.to_linear(3, 7) == 31
    assert l.num_elements() == 32


def test_strided_layout():
    l = StridedLayout((4, 8), strides=(1, 4))  # column-major
    assert l.to_linear(1, 2) == 1 + 8
    assert l.to_linear(3, 0) == 3


def test_permuted_layout():
    inner = LinearLayout((4, 8))
    p = PermutedLayout(inner, (1, 0))
    assert p.shape == (8, 4)
    assert p.to_linear(2, 1) == inner.to_linear(1, 2)


def test_slice_layout():
    inner = LinearLayout((8, 8))
    s = SliceLayout(inner, (2, 3), (4, 4))
    assert s.to_linear(0, 0) == inner.to_linear(2, 3)
    assert s.is_in_bounds(3, 3) is True or s.is_in_bounds(3, 3)


@pytest.mark.parametrize("divisor", [1, 2, 3, 5, 7, 8, 16, 100, 127, 128,
                                     1000, 4096])
def test_fastdivmod_comptime(divisor):
    fd = FastDivmod(divisor)
    for x in list(range(0, 200)) + [10**6, 2**30]:
        assert fd.div(x) == x // divisor
        assert fd.mod(x) == x % divisor


def test_quant_roundtrip_i8():
    x = np.random.randn(256).astype(np.float32)
    s = QuantScheme()
    q, scale = quantize_np(x, s)
    assert q.dtype == np.int8
    back = dequantize_np(q, scale, s)
    assert np.abs(back - x).max() < np.abs(x).max() / 50


def test_quant_block():
    x = np.random.randn(256).astype(np.float32)
    s = QuantScheme(level=QuantLevel.BLOCK, block_size=32)
    q, scale = quantize_np(x, s)
    assert scale.shape == (8,)
    back = dequantize_np(q, scale, s)
    assert np.abs(back - x).max() < np.abs(x).max() / 30


def test_identity_kernel(client):
    h = identity(client, 16)
    r = client.read_one(h).reshape(16, 16)
    np.testing.assert_array_equal(r, np.eye(16, dtype=np.float32))


def test_tensor_handle_contiguity(client):
    h = client.create(np.zeros(24, np.float32))
    t = TensorHandle(h, (2, 3, 4))
    assert t.is_contiguous()
    t2 = TensorHandle(h, (2, 3, 4), strides=(1, 2, 6))
    assert not t2.is_contiguous()


def test_into_contiguous_transpose(client):
    from cubecl_tpu.std import into_contiguous

    x = np.arange(32, dtype=np.float32).reshape(4, 8)
    h = client.create(x.reshape(-1))
    # view as transposed (8, 4) with strides (1, 8)
    t = TensorHandle(h, (8, 4), strides=(1, 8))
    out = into_contiguous(client, t)
    r = client.read_one(out.handle).reshape(8, 4)
    np.testing.assert_array_equal(r, x.T)


def test_zspace_utils():
    from cubecl_tpu.std import (
        broadcast_shapes,
        contiguous_strides,
        delinearize,
        is_contiguous,
        linear_index,
        validate_strides,
    )

    assert contiguous_strides((2, 3, 4)) == (12, 4, 1)
    assert is_contiguous((2, 3), (3, 1))
    assert not is_contiguous((2, 3), (1, 2))
    assert linear_index((1, 2), (3, 1)) == 5
    assert delinearize(5, (2, 3)) == (1, 2)
    assert broadcast_shapes((2, 1, 4), (3, 1)) == (2, 3, 4)
    with pytest.raises(ValueError):
        broadcast_shapes((2,), (3,))
    validate_strides((2, 3), (3, 1))
    with pytest.raises(ValueError):
        validate_strides((2, 3), (1, 1))


def test_client_parity_api(client):
    assert client.io_optimized_vector_sizes(1 << 16)[0] == 512
    client.set_stream(1)
    assert client.current_stream() == 1
    client.set_stream(None)
    h = client.create(np.arange(12, dtype=np.float32))
    t = client.read_tensor(h, (3, 4))
    np.testing.assert_array_equal(t, np.arange(12).reshape(3, 4))
    tt = client.read_tensor(h, (4, 3), strides=(1, 4))
    np.testing.assert_array_equal(tt, np.arange(12).reshape(3, 4).T)


def test_quantize_dequantize_kernels(client):
    from cubecl_tpu.std.quant import QuantLevel, QuantScheme
    from cubecl_tpu.std.quant_kernels import dequantize, quantize

    n, block = 8192, 2048
    x = np.random.randn(n).astype(np.float32) * 3
    h = client.create(x)
    scheme = QuantScheme(level=QuantLevel.BLOCK, block_size=block)
    values, scales = quantize(client, h, scheme)
    v = client.read_one(values)
    s = client.read_one(scales)
    assert v.dtype == np.int8 and s.shape == (n // block,)
    back = client.read_one(dequantize(client, values, scales, scheme))
    assert np.abs(back - x).max() < np.abs(x).max() / 40


def test_quantize_tensor_level(client):
    from cubecl_tpu.std.quant import QuantScheme
    from cubecl_tpu.std.quant_kernels import dequantize, quantize

    n = 8192
    x = np.random.randn(n).astype(np.float32)
    h = client.create(x)
    scheme = QuantScheme()  # tensor-level
    values, scales = quantize(client, h, scheme)
    assert client.read_one(scales).shape == (1,)
    back = client.read_one(dequantize(client, values, scales, scheme))
    assert np.abs(back - x).max() < np.abs(x).max() / 40


def test_into_contiguous_general_strided(client):
    from cubecl_tpu.std import into_contiguous

    # every-other-column view: NOT a pure permutation -> gather path
    x = np.arange(64, dtype=np.float32).reshape(8, 8)
    h = client.create(x.reshape(-1))
    t = TensorHandle(h, (8, 4), strides=(8, 2))
    out = into_contiguous(client, t)
    np.testing.assert_array_equal(
        client.read_one(out.handle).reshape(8, 4), x[:, ::2])


def test_into_contiguous_3d_permute(client):
    from cubecl_tpu.std import into_contiguous

    x = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    h = client.create(x.reshape(-1))
    # view as (4, 2, 3) == transpose(2, 0, 1)
    t = TensorHandle(h, (4, 2, 3), strides=(1, 12, 4))
    out = into_contiguous(client, t)
    np.testing.assert_array_equal(
        client.read_one(out.handle).reshape(4, 2, 3),
        np.transpose(x, (2, 0, 1)))


@cube
def k_reinterp_i32(inp: Slice, out: MutSlice):
    v = reinterpret_slice(inp, i32)
    out[UNIT_POS] = v[UNIT_POS]


@cube
def k_reinterp_u8(inp: Slice, out: MutSlice):
    v = reinterpret_slice(inp, u8)  # line widens 4x
    out[UNIT_POS] = v[UNIT_POS]


def test_reinterpret_slice_cross_dtype(client):
    """Cross-dtype slice views (reference reinterpret_slice.rs): same
    width bitcast and width-changing views with line absorption."""
    from cubecl_tpu.frontend import ArrayArg
    from cubecl_tpu.runtime.base import CubeCount, CubeDim

    x = np.random.rand(8).astype(np.float32)
    h = client.create(x)
    o = client.empty((8,), "int32")
    k_reinterp_i32.launch_unchecked(client, CubeCount(1), CubeDim.new_1d(8),
                                    ArrayArg(h), ArrayArg(o, mutable=True))
    np.testing.assert_array_equal(client.read_one(o), x.view(np.int32))

    o2 = client.empty((32,), "uint8")
    k_reinterp_u8.launch_unchecked(client, CubeCount(1), CubeDim.new_1d(8),
                                   ArrayArg(h),
                                   ArrayArg(o2, line_size=4, mutable=True))
    np.testing.assert_array_equal(client.read_one(o2), x.view(np.uint8))


def test_memory_layout_policy_pitched(client):
    """Pitched allocations pad the row stride to the lane tile
    (MemoryLayoutPolicy parity)."""
    from cubecl_tpu.std import into_contiguous
    from cubecl_tpu.std.contiguous import empty_tensor

    t = empty_tensor(client, (4, 100), policy="pitched")
    assert t.strides == (128, 1)
    assert not t.is_contiguous()
    c = empty_tensor(client, (4, 100))
    assert c.is_contiguous()
    # round-trip through into_contiguous: write pitched, read packed
    src = np.random.rand(4, 128).astype(np.float32)
    client.write(t.handle, src.reshape(-1))
    dense = into_contiguous(client, t)
    got = client.read_one(dense.handle).reshape(4, 100)
    np.testing.assert_array_equal(got, src[:, :100])
