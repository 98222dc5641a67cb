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
from .throughput import ThroughputCache
from .view import View, ViewMut, VirtualTensor
