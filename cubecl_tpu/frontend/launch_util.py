"""Launch utilities: grid sizing + line-size (vectorization) pickers.

Reference: ``calculate_cube_count_elemwise`` (cubecl-core/src/lib.rs:77),
``tensor_vectorization_factor`` / ``tensor_vector_size_parallel`` /
``...perpendicular`` (lib.rs:89-179) and ``io_optimized_vector_sizes``
(client.rs:1322).

TPU guidance baked in: the lane width is 128, so profitable line sizes
start at 128 (not the GPU's 4); the default cube dim is 8 (one plane =
the sublane count) so an (8, 128) tile fills a vreg.
"""

from __future__ import annotations

from typing import Sequence, Tuple

from ..runtime.base import CubeCount, CubeDim

#: line sizes worth trying on TPU, widest first (reference
#: io_optimized_vector_sizes — GPU returns [4, 2]; lanes are 128 here)
TPU_LINE_SIZES = (512, 256, 128, 8, 1)

DEFAULT_CUBE_DIM = CubeDim(8, 1, 1)


def io_optimized_line_sizes(n_elems: int, dtype_size: int = 4
                            ) -> Tuple[int, ...]:
    """Line sizes to consider for IO-bound kernels on this hardware."""
    return tuple(l for l in TPU_LINE_SIZES if n_elems % l == 0)


def tensor_line_size(n_elems: int, innermost_dim: int,
                     max_line: int = 512) -> int:
    """Largest TPU-friendly line dividing both the innermost dimension and
    the total length (reference tensor_vectorization_factor)."""
    for l in TPU_LINE_SIZES:
        if l <= max_line and innermost_dim % l == 0 and n_elems % l == 0:
            return l
    return 1


def tensor_line_size_parallel(shapes: Sequence[int], strides: Sequence[int],
                              dim: int, max_line: int = 512) -> int:
    """Line size along the iteration dimension (stride-1 required)."""
    if strides[dim] != 1:
        return 1
    return tensor_line_size(int(__import__("math").prod(shapes)),
                            shapes[dim], max_line)


def tensor_line_size_perpendicular(shapes: Sequence[int],
                                   strides: Sequence[int], dim: int,
                                   max_line: int = 512) -> int:
    """Vectorize perpendicular to the iteration dim: the innermost other
    dim must be contiguous."""
    inner = len(shapes) - 1
    if inner == dim or strides[inner] != 1:
        return 1
    return tensor_line_size(int(__import__("math").prod(shapes)),
                            shapes[inner], max_line)


def calculate_cube_count_elemwise(n_elems: int, cube_dim: CubeDim = None,
                                  line_size: int = 128) -> CubeCount:
    """Grid size for an elementwise kernel over n_elems (reference
    calculate_cube_count_elemwise, lib.rs:77)."""
    cd = cube_dim or DEFAULT_CUBE_DIM
    per_cube = cd.num_units * line_size
    return CubeCount(-(-n_elems // per_cube))
