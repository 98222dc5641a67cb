"""Tensor container: buffer + comptime shape/stride metadata.

Reference: ``Tensor<T>`` (cubecl-core/src/frontend/container/tensor/
base.rs:15) whose launch arg carries ``vector_size``
(tensor/launch.rs ``TensorArg``). On TPU shapes/strides are comptime
(static shapes — the XLA model), replacing the reference's runtime
metadata buffer (codegen/metadata.rs:1-40).
"""

from __future__ import annotations

from typing import Tuple

from .array import MutSlice, Slice
from .element import CubeVal, is_comptime


class Tensor(Slice):
    """Read-only nd tensor view over a linear buffer."""

    def __init__(self, value, shape: Tuple[int, ...], strides: Tuple[int, ...],
                 line_size: int, offset=0):
        length = 1
        for s in shape:
            length *= s
        # length in lines along the innermost contiguous dim
        super().__init__(value, max(1, length // line_size), line_size, offset)
        self._shape = tuple(shape)
        self._strides = tuple(strides)

    # -- comptime metadata (reference meta.shape/stride/rank ops) ------------
    def shape(self, dim: int) -> int:
        return self._shape[dim]

    def stride(self, dim: int) -> int:
        return self._strides[dim]

    @property
    def shape_tuple(self) -> Tuple[int, ...]:
        return self._shape

    @property
    def strides_tuple(self) -> Tuple[int, ...]:
        return self._strides

    def rank(self) -> int:
        return len(self._shape)

    def num_elements(self) -> int:
        n = 1
        for s in self._shape:
            n *= s
        return n

    # -- indexing -------------------------------------------------------------
    def _linear(self, idx):
        """nd index tuple -> linear line index. strides are in elements;
        the innermost access is line-granular."""
        if not isinstance(idx, tuple):
            return idx
        assert len(idx) == len(self._shape), \
            f"expected {len(self._shape)} indices, got {len(idx)}"
        lin = None
        for i, s in zip(idx, self._strides):
            term = i * (s // self._line) if s >= self._line else i * s
            lin = term if lin is None else lin + term
        return lin if lin is not None else 0

    def __getitem__(self, idx):
        return super().__getitem__(self._linear(idx))

    def coords_to_linear(self, *idx):
        return self._linear(tuple(idx))


class MutTensor(Tensor, MutSlice):
    _mutable = True

    def __setitem__(self, idx, v):
        MutSlice.__setitem__(self, self._linear(idx), v)

    def write_masked(self, idx, v, mask):
        MutSlice.write_masked(self, self._linear(idx), v, mask)
