"""Runtime base types: CubeDim, CubeCount, Runtime trait.

Reference: ``CubeDim``/``CubeCount`` (cubecl-runtime/src/server/base.rs:
1063,1166), ``Runtime`` trait (runtime.rs:14-52).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple


@dataclass(frozen=True)
class CubeDim:
    x: int = 1
    y: int = 1
    z: int = 1

    @staticmethod
    def new_1d(x: int) -> "CubeDim":
        return CubeDim(x, 1, 1)

    @staticmethod
    def new_2d(x: int, y: int) -> "CubeDim":
        return CubeDim(x, y, 1)

    @staticmethod
    def new_3d(x: int, y: int, z: int) -> "CubeDim":
        return CubeDim(x, y, z)

    @property
    def num_units(self) -> int:
        return self.x * self.y * self.z

    def as_tuple(self) -> Tuple[int, int, int]:
        return (self.x, self.y, self.z)


@dataclass(frozen=True)
class CubeCount:
    """Static grid size. For ``CubeCount::Dynamic`` (device-buffer-
    resolved grids, reference server/base.rs:1063) use
    :meth:`CubeCount.dynamic` — resolved host-side at launch by the same
    read-back the CUDA server does (cubecl-cuda/src/compute/
    server.rs:1086)."""

    x: int = 1
    y: int = 1
    z: int = 1

    @staticmethod
    def dynamic(handle) -> "DynamicCubeCount":
        """Grid sizes read from the first <=3 elements of ``handle`` at
        launch time."""
        return DynamicCubeCount(handle)

    @staticmethod
    def runtime(x: int, max_x: int) -> "RuntimeCubeCount":
        """Runtime grid width: the kernel compiles ONCE against the
        ``max_x`` capacity and launches with the runtime ``x`` riding as
        a scalar — the shape-polymorphic launch ABI (reference: one
        metadata info buffer serves every runtime shape,
        cubecl-core/src/codegen/metadata.rs:1-40; here Mosaic's dynamic
        grid bounds replace per-shape recompiles)."""
        return RuntimeCubeCount(x, max_x)

    @staticmethod
    def static(x: int, y: int = 1, z: int = 1) -> "CubeCount":
        return CubeCount(x, y, z)

    @property
    def num_cubes(self) -> int:
        return self.x * self.y * self.z

    def as_tuple(self) -> Tuple[int, int, int]:
        return (self.x, self.y, self.z)


class Runtime:
    """Associates a compiler + server + device (reference Runtime trait,
    runtime.rs:14)."""

    name = "abstract"

    @classmethod
    def client(cls, device=None):
        raise NotImplementedError

    @classmethod
    def max_cube_count(cls) -> Tuple[int, int, int]:
        return (2**31 - 1, 65535, 65535)


@dataclass(frozen=True)
class RuntimeCubeCount:
    """Grid whose X width is a RUNTIME value bounded by a compile-time
    capacity. One executable (keyed on ``max_x``) serves every launch
    with ``x <= max_x``: the emitter builds the pallas grid from a
    traced scalar (Mosaic dynamic grid bounds), so changing ``x`` costs
    nothing — no recompile, no padded tail work.

    v1 restriction: y and z must be 1 (the serving-shape cases —
    elementwise/reduce/normalization sweeps — are 1D grids; higher-rank
    runtime grids would entangle ABSOLUTE_POS flattening with runtime
    sizes)."""

    x: int
    max_x: int

    def __post_init__(self):
        assert 1 <= self.x <= self.max_x, \
            f"runtime grid x={self.x} outside [1, {self.max_x}]"

    @property
    def num_cubes(self) -> int:
        return self.x

    def as_tuple(self) -> Tuple[int, int, int]:
        """Capacity tuple — what analyses/plans compile against."""
        return (self.max_x, 1, 1)

    def cache_key(self) -> Tuple:
        """Kernel-id / launch-memo key: capacity only, never ``x``."""
        return ("rt", self.max_x, 1, 1)


class DynamicCubeCount:
    """``CubeCount::Dynamic`` (reference server/base.rs:1063): the grid
    lives in a device buffer, resolved by host read-back at each launch.
    XLA grids are static, so every distinct resolved grid is its own
    compiled executable (cached by kernel id) — intended for
    data-dependent launches whose grid changes rarely; the read-back
    costs one D2H round trip per launch."""

    def __init__(self, handle):
        self.handle = handle

    def resolve(self, client) -> CubeCount:
        import numpy as np

        vals = [int(v) for v in
                np.asarray(client.read_one(self.handle)).ravel()[:3]]
        while len(vals) < 3:
            vals.append(1)
        assert all(v >= 1 for v in vals), \
            f"dynamic cube count must be >= 1 per axis, read {vals}"
        return CubeCount(*vals)
