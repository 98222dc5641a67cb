"""IR-layer unit tests (reference: cubecl-ir unit tests + the scope-pass
tests in cubecl-core/src/post_processing)."""

import numpy as np
import pytest

from cubecl_tpu.ir import (
    Builtin,
    Operation,
    Scope,
    Type,
    bf16,
    bool_,
    builtin_value,
    const_value,
    elem_from_dtype,
    f32,
    i32,
    ops as O,
    tpu_device_properties,
    u32,
)
from cubecl_tpu.ir.value import VarKind
from cubecl_tpu.opt.passes import const_fold, dead_code, optimize_scope


def test_elem_types():
    assert f32.size == 4
    assert bf16.size == 2
    assert f32.is_float and not f32.is_int
    assert i32.is_signed and not u32.is_signed
    assert elem_from_dtype(np.float32) is f32
    assert elem_from_dtype("bfloat16") is bf16
    assert repr(Type(f32, 4)) == "f32x4"
    assert Type(f32, 4).size == 16


def test_scope_allocation():
    s = Scope()
    a = s.create_local(Type(f32))
    b = s.create_local_mut(Type(i32))
    assert a.vid != b.vid
    assert b.kind == VarKind.LOCAL_MUT
    sh = s.create_shared(Type(f32, 4), (128,))
    assert s.state.shareds[0].value is sh
    buf = s.add_buffer("x", Type(f32, 2), 64, mutable=True)
    assert s.state.buffers[0].length == 64


def test_const_fold_and_dce():
    s = Scope()
    a = const_value(2.0, Type(f32))
    b = const_value(3.0, Type(f32))
    out = s.create_local(Type(f32))
    s.register(out, Operation(O.ADD, (a, b)))
    dead = s.create_local(Type(f32))
    s.register(dead, Operation(O.MUL, (a, b)))  # unused -> removed
    used = s.create_local(Type(f32))
    s.register(used, Operation(O.MUL, (out, out)))
    store_buf = s.add_buffer("o", Type(f32), 8, True)
    s.register(None, Operation(O.STORE, (store_buf, const_value(0, Type(i32)),
                                         used)))
    optimize_scope(s)
    opcodes = [i.op.opcode for i in s.instructions]
    assert O.STORE in opcodes
    # the add/mul folded: the store value should be constant 25.0
    st = [i for i in s.instructions if i.op.opcode == O.STORE][0]
    assert st.op.args[2].is_const and st.op.args[2].const == 25.0


def test_builtin_folding():
    s = Scope()
    out = s.create_local(Type(i32))
    s.register(out, Operation(O.ADD, (builtin_value(Builtin.CUBE_DIM),
                                      builtin_value(Builtin.CUBE_COUNT_X))))
    buf = s.add_buffer("o", Type(i32), 8, True)
    s.register(None, Operation(O.STORE, (buf, const_value(0, Type(i32)), out)))
    optimize_scope(s, cube_dim=(8, 1, 1), cube_count=(4, 1, 1))
    st = s.instructions[-1]
    assert st.op.args[2].is_const and st.op.args[2].const == 12


def test_device_properties():
    props = tpu_device_properties("TPU v5e", "tpu0")
    assert props.generation.name == "v5e"
    assert props.features.supports_type(bf16, "mma")
    assert props.features.supported_mma(bf16, bf16, f32) is not None
    assert "sum" in props.features.plane
    v5p = tpu_device_properties("TPU v5p", "tpu1")
    assert v5p.generation.name == "v5p"
    assert v5p.generation.hbm_bw > props.generation.hbm_bw
