"""Boundary fuzz of the evaluator's dynamic-window machinery vs numpy.

The superspan+roll paths (``_dyn_window_1d`` / ``_dyn_rows_2d`` /
``_flat_roll`` / ``_onehot_masked_store`` / ``_load_span``) only take
their compiled branches on real TPUs (the interpreter uses exact-slice
fallbacks), yet their correctness is pure index arithmetic: alignment
clamps, signed offsets for checked-mode OOB bases, value/mask pairing
on RMW writeback. Both round-2 advisor bugs and the round-3 sub-32-bit
widening cliff lived exactly here (VERDICT r3 item 8), so this harness
instantiates the MemAccessMixin directly with stub pl/pltpu modules —
``lax.dynamic_slice`` has the same silent-clamp semantics as ``pl.ds``,
and ``jnp.roll`` matches ``pltpu.roll`` — and hammers the functions
with randomized spans × block sizes × strides × dtypes × out-of-range
bases against a numpy oracle, eagerly on CPU (no pallas tracing).

Mosaic *legality* of the same paths is covered by the TPU smoke suite
(`python -m cubecl_tpu test --tpu`); this file covers the *values*.
"""

import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cubecl_tpu.backend.pallas.evaluator.mem import MemAccessMixin


# --------------------------------------------------------------------------
# stub pallas plumbing (semantics-matched to the TPU primitives)
# --------------------------------------------------------------------------


class _DS:
    __slots__ = ("start", "size")

    def __init__(self, start, size):
        self.start, self.size = start, size


class _PL:
    @staticmethod
    def ds(start, size):
        return _DS(start, size)

    @staticmethod
    def multiple_of(x, mult):
        return x  # alignment hints carry no value semantics


class _PLTPU:
    @staticmethod
    def roll(x, shift, axis):
        return jnp.roll(x, shift, axis=axis)


class _Ref:
    """Mutable fake of a pallas Ref with pl.ds-compatible indexing.
    dynamic_slice/dynamic_update_slice clamp the start exactly like ds."""

    def __init__(self, arr):
        self.arr = jnp.asarray(arr)

    @property
    def dtype(self):
        return self.arr.dtype

    def __getitem__(self, key):
        if key is Ellipsis:
            return self.arr
        if isinstance(key, _DS):
            return jax.lax.dynamic_slice(self.arr, (key.start,), (key.size,))
        if isinstance(key, tuple) and isinstance(key[0], _DS):
            ds = key[0]
            return jax.lax.dynamic_slice(
                self.arr, (ds.start, 0), (ds.size, self.arr.shape[1]))
        raise AssertionError(f"unexpected ref index {key!r}")

    def __setitem__(self, key, val):
        val = jnp.asarray(val).astype(self.arr.dtype)
        if key is Ellipsis:
            assert val.shape == self.arr.shape
            self.arr = val
        elif isinstance(key, _DS):
            self.arr = jax.lax.dynamic_update_slice(
                self.arr, val, (key.start,))
        elif isinstance(key, tuple) and isinstance(key[0], _DS):
            self.arr = jax.lax.dynamic_update_slice(
                self.arr, val, (key[0].start, 0))
        else:
            raise AssertionError(f"unexpected ref index {key!r}")


def _mem(U: int = 8) -> MemAccessMixin:
    m = MemAccessMixin.__new__(MemAccessMixin)
    m.jax, m.jnp = jax, jnp
    m.pl, m.pltpu = _PL, _PLTPU
    m.U = U
    m.interpret = False
    return m


def _traced(x: int):
    """A non-int scalar so the code takes its dynamic-offset branches."""
    return jnp.int32(x)


_DTYPES = {"float32": np.float32, "int32": np.int32,
           "bfloat16": jnp.bfloat16}


# --------------------------------------------------------------------------
# _flat_roll: the rotate identity everything else builds on
# --------------------------------------------------------------------------


@pytest.mark.parametrize("seed", range(16))
def test_flat_roll_matches_numpy_roll(seed):
    rng = random.Random(seed)
    m = _mem()
    rows = rng.choice([2, 3, 8, 16, 33])
    total = rows * 128
    x = np.arange(total, dtype=np.float32).reshape(rows, 128)
    s = rng.randrange(0, 2 * total)  # includes shifts >= total (mod rule)
    got = np.asarray(m._flat_roll(jnp.asarray(x), _traced(s), total))
    want = np.roll(x.reshape(-1), -(s % total)).reshape(rows, 128)
    np.testing.assert_array_equal(got, want, err_msg=f"rows={rows} s={s}")


# --------------------------------------------------------------------------
# _dyn_window_1d: load window + RMW writeback at traced offsets
# --------------------------------------------------------------------------


@pytest.mark.parametrize("seed", range(72))
def test_dyn_window_1d(seed):
    rng = random.Random(100 + seed)
    m = _mem()
    name = rng.choice(list(_DTYPES))
    dt = _DTYPES[name]
    A = m._quantum(jnp.dtype(dt))
    span = rng.choice([1, 7, 8, 96, 128, 257, A // 2, A])
    sup = ((span + A - 1) // A) * A + A
    blk = sup + rng.choice([0, A, 3 * A])
    # boundary-heavy base distribution: ends, quantum edges, OOB lows
    rel = rng.choice([
        0, 1, A - 1, A, A + 1, blk - span, max(0, blk - span - 1),
        rng.randrange(0, blk - span + 1),
        rng.randrange(0, blk - span + 1),
        -rng.randrange(1, span + 1),            # checked-mode OOB base
    ])
    base = np.arange(blk, dtype=np.float64) % 997
    orig = base.astype(np.float32) if name != "int32" else \
        base.astype(np.int32)
    ref = _Ref(jnp.asarray(orig, dt))
    win, writeback = m._dyn_window_1d(ref, _traced(rel), span, blk, mult=1)
    win = np.asarray(win.astype(jnp.float32))

    lo, hi = max(rel, 0), min(rel + span, blk)
    orig_f = np.asarray(jnp.asarray(orig, dt).astype(jnp.float32))
    if rel >= 0:
        # fully specified load: window == flat[rel : rel+span]
        np.testing.assert_array_equal(
            win[: hi - lo], orig_f[lo:hi],
            err_msg=f"load {name} span={span} blk={blk} rel={rel}")

    # RMW writeback: only [rel, rel+span) ∩ [0, blk) may change, and it
    # must receive the new window's matching elements (value pairing)
    new = (np.arange(span, dtype=np.float64) % 491 + 1000).astype(
        np.float32)
    writeback(jnp.asarray(new, dt))
    got = np.asarray(ref.arr.astype(jnp.float32))
    want = orig_f.copy()
    for i in range(span):
        t = rel + i
        if 0 <= t < blk:
            want[t] = np.asarray(jnp.asarray(new[i], dt)
                                 .astype(jnp.float32))
    np.testing.assert_array_equal(
        got, want,
        err_msg=f"writeback {name} span={span} blk={blk} rel={rel}")


# --------------------------------------------------------------------------
# _dyn_rows_2d: row windows on 2D refs (sublane superspan + roll)
# --------------------------------------------------------------------------


@pytest.mark.parametrize("seed", range(48))
def test_dyn_rows_2d(seed):
    rng = random.Random(300 + seed)
    m = _mem()
    name = rng.choice(list(_DTYPES))
    dt = _DTYPES[name]
    L = 128
    nrows = rng.choice([1, 2, 5, 8, 9, 16])
    sup = -(-nrows // 8) * 8 + 8
    blk = sup + rng.choice([0, 8, 24, 64])
    rel = rng.choice([
        0, 1, 7, 8, 9, blk - nrows, max(0, blk - nrows - 1),
        rng.randrange(0, blk - nrows + 1),
        -rng.randrange(1, nrows + 1),           # checked-mode OOB base
    ])
    base = (np.arange(blk * L, dtype=np.float64) % 997).reshape(blk, L)
    orig = jnp.asarray(base, dt)
    orig_f = np.asarray(orig.astype(jnp.float32))
    ref = _Ref(orig)
    win, writeback = m._dyn_rows_2d(ref, _traced(rel), nrows, blk, mult=1)
    win = np.asarray(win.astype(jnp.float32))

    lo, hi = max(rel, 0), min(rel + nrows, blk)
    if rel >= 0:
        np.testing.assert_array_equal(
            win[: hi - lo], orig_f[lo:hi],
            err_msg=f"load {name} nrows={nrows} blk={blk} rel={rel}")

    new = (np.arange(nrows * L, dtype=np.float64) % 491 + 1000) \
        .reshape(nrows, L).astype(np.float32)
    writeback(jnp.asarray(new, dt))
    got = np.asarray(ref.arr.astype(jnp.float32))
    want = orig_f.copy()
    for i in range(nrows):
        t = rel + i
        if 0 <= t < blk:
            want[t] = np.asarray(jnp.asarray(new[i], dt)
                                 .astype(jnp.float32))
    np.testing.assert_array_equal(
        got, want,
        err_msg=f"writeback {name} nrows={nrows} blk={blk} rel={rel}")


# --------------------------------------------------------------------------
# _onehot_masked_store: the checked-mode straddling-store scatter
# --------------------------------------------------------------------------


@pytest.mark.parametrize("seed", range(48))
def test_onehot_masked_store(seed):
    rng = random.Random(500 + seed)
    U = 8
    m = _mem(U)
    name = rng.choice(list(_DTYPES))
    dt = _DTYPES[name]
    L = rng.choice([1, 128])
    c = rng.choice([1, 1, 2, 4])
    blk = rng.choice([U * c, U * c + 3, 4 * U * c, 64])
    if blk < 1:
        blk = 8
    # bases that straddle both ends (the exact reason this path exists)
    rel = rng.choice([
        0, blk - (U - 1) * c - 1, blk - (U - 1) * c, blk - 1,
        -3, -(U * c), rng.randrange(-2 * c, blk + 2 * c),
    ])
    mm = np.asarray([rng.random() < 0.7 for _ in range(U)], np.int32)
    base = np.arange(blk * L, dtype=np.float64) % 997
    orig = jnp.asarray(base.reshape((blk, L) if L > 1 else (blk,)), dt)
    orig_f = np.asarray(orig.astype(jnp.float32)).reshape(blk, L)
    ref = _Ref(orig)
    new_np = (np.arange(U * L, dtype=np.float64) % 491 + 1000) \
        .astype(np.float32).reshape(U, L)
    m._onehot_masked_store(ref, _traced(rel), c,
                           jnp.asarray(new_np.reshape(U * L if L == 1
                                                      else (U, L)), dt),
                           jnp.asarray(mm), L, blk)
    got = np.asarray(ref.arr.astype(jnp.float32)).reshape(blk, L)
    want = orig_f.copy()
    for u in range(U):
        t = rel + u * c
        if mm[u] and 0 <= t < blk:
            want[t] = np.asarray(jnp.asarray(new_np[u], dt)
                                 .astype(jnp.float32))
    np.testing.assert_array_equal(
        got, want,
        err_msg=f"{name} L={L} c={c} blk={blk} rel={rel} mm={mm.tolist()}")


# --------------------------------------------------------------------------
# _load_span: strided (U, L) loads at traced bases
# --------------------------------------------------------------------------


@pytest.mark.parametrize("seed", range(64))
def test_load_span_dynamic(seed):
    rng = random.Random(700 + seed)
    U = 8
    m = _mem(U)
    name = rng.choice(list(_DTYPES))
    dt = _DTYPES[name]
    L = rng.choice([1, 1, 128])
    c = 1 if L > 1 else rng.choice([1, 1, 2, 4])
    span = c * U
    if L == 1:
        A = m._quantum(jnp.dtype(dt))
        blk = 2 * A + ((span + A - 1) // A) * A  # superspan always fits
    else:
        blk = rng.choice([span + 8, 4 * span + 8, 64])
    hi_base = blk - ((U - 1) * c + 1)
    rel = rng.choice([
        0, 1, hi_base, max(0, hi_base - 1),
        rng.randrange(0, hi_base + 1), rng.randrange(0, hi_base + 1),
    ])
    base = np.arange(blk * L, dtype=np.float64) % 997
    orig = jnp.asarray(base.reshape((blk, L) if L > 1 else (blk,)), dt)
    orig_f = np.asarray(orig.astype(jnp.float32)).reshape(blk, L)
    ref = _Ref(orig)
    val = m._load_span(ref, _traced(rel), c, L, blk, masked=False, mult=1)
    got = np.asarray(val.astype(jnp.float32)).reshape(U, L)
    want = np.stack([orig_f[rel + u * c] for u in range(U)])
    np.testing.assert_array_equal(
        got, want,
        err_msg=f"{name} L={L} c={c} blk={blk} rel={rel}")


# --------------------------------------------------------------------------
# masked tails: a masked load's clip must keep live-lane pairing intact
# --------------------------------------------------------------------------


@pytest.mark.parametrize("seed", range(24))
def test_load_span_masked_in_range(seed):
    """When the base is within [0, blk - span] the masked clip must be
    the identity — every lane still reads its own line."""
    rng = random.Random(900 + seed)
    U = 8
    m = _mem(U)
    L = 128
    blk = rng.choice([U + 8, 4 * U, 64])
    rel = rng.randrange(0, blk - U + 1)
    base = np.arange(blk * L, dtype=np.float64) % 997
    orig = jnp.asarray(base.reshape(blk, L), jnp.float32)
    ref = _Ref(orig)
    val = m._load_span(ref, _traced(rel), 1, L, blk, masked=True, mult=1)
    got = np.asarray(val)[:U]
    want = np.asarray(orig)[rel:rel + U]
    np.testing.assert_array_equal(got, want,
                                  err_msg=f"blk={blk} rel={rel}")
