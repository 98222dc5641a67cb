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
    """Static grid size. The reference also has ``CubeCount::Dynamic``
    (device-buffer-resolved); XLA requires static grids, so dynamic counts
    are resolved host-side before compilation (the same read-back the CUDA
    server does at launch, cubecl-cuda/src/compute/server.rs:1086)."""

    x: int = 1
    y: int = 1
    z: int = 1

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
