"""cubecl_tpu.std — standard library layer (reference crate: cubecl-std)."""

from .contiguous import TensorHandle, identity, into_contiguous
from .fastmath import FastDivmod
from .layout import (
    ChainLayout,
    Layout,
    LinearLayout,
    PermutedLayout,
    SliceLayout,
    StridedLayout,
    TiledLayout,
)
from .quant import (
    QuantLevel,
    QuantMode,
    QuantParam,
    QuantScheme,
    dequantize_np,
    quantize_np,
)
from .misc import (
    EventBus,
    GLOBAL_EVENTS,
    MatrixBatchLayout,
    matrix_batch_layout,
    reinterpret_slice,
    sin_cos,
    swizzle_2d,
    swizzle_xor,
)
from .throughput import ThroughputCache
from .view import View, ViewMut, VirtualTensor
from .zspace import (
    broadcast_shapes,
    contiguous_strides,
    delinearize,
    is_contiguous,
    linear_index,
    num_elements,
    permuted_strides,
    validate_strides,
)
