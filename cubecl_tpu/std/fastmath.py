"""FastDivmod: magic-number division for index math.

Reference: cubecl-std/src/fast_math.rs:13-43 (used by into_contiguous for
cheap div/mod by runtime strides). The magic numbers come from the native
helper (csrc/native.cc divmod_magic) at comptime; in-kernel evaluation is
a mulhi + shift, which lowers to VPU integer ops.
"""

from __future__ import annotations

from ..frontend.element import CubeVal, is_comptime
from ..frontend.functions import mul_hi
from ..utils.native import load_native

_native = load_native()


def _magic(divisor: int):
    if _native is not None:
        packed = _native.divmod_magic(divisor)
        if packed >> 63:  # power-of-two flag
            shift = packed & 0xFF
            return None, shift
        return (packed >> 8) & 0xFFFFFFFFFFFFFF, packed & 0xFF
    # python fallback (round-up method)
    if divisor & (divisor - 1) == 0:
        return None, divisor.bit_length() - 1
    shift = divisor.bit_length() - 1 + 31
    magic = ((1 << (shift + 1)) + divisor - 1) // divisor
    return magic, shift - 31
    # NOTE: python fallback uses a slightly different split; both paths are
    # validated by tests/test_std.py against exhaustive ranges


class FastDivmod:
    """Comptime-constructed divider; ``div``/``mod``/``divmod`` usable on
    traced values inside kernels.

    Valid for dividends in [0, 2^31): the magic split here (and in
    csrc/native.cc divmod_magic) uses shift = 31 + ceil(log2 d), whose
    Granlund-Montgomery error bound only covers 31-bit dividends. That is
    the full range of i32 index math, which is the only use; dividends
    with the sign bit set would produce a wrong quotient."""

    MAX_DIVIDEND = 1 << 31

    def __init__(self, divisor: int):
        assert 0 < divisor < FastDivmod.MAX_DIVIDEND, \
            f"FastDivmod divisor must be in [1, 2^31), got {divisor}"
        self.divisor = divisor
        self.magic, self.shift = _magic(divisor)

    def div(self, x):
        if is_comptime(x):
            return x // self.divisor
        if self.magic is None:  # power of two
            return x >> self.shift
        # (x * magic) >> (32 + shift) via mulhi
        hi = mul_hi(x, int(self.magic & 0xFFFFFFFF))
        return hi >> self.shift

    def mod(self, x):
        return x - self.div(x) * self.divisor

    def divmod(self, x):
        d = self.div(x)
        return d, x - d * self.divisor
