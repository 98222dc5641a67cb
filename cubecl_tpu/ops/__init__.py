"""cubecl_tpu.ops — the kernel library (reference: examples/ + the cubek
kernel crates the reference ecosystem splits out; README.md:164)."""

from .attention import (flash_attention, flash_attention_padded,
                        flash_attention_segmented)
from .conv import (conv2d, conv2d_im2col, conv2d_pairs,
                   conv2d_pairs_packed, pack_pairs, unpack_pairs)
from .paged_attention import paged_attention, paged_attention_reference

from .fusion import FUSABLE, fused_chain, launch_fused
from .gelu import gelu_array, gelu_scalar, launch_gelu
from .matmul import (matmul_autotuned, matmul_cmma, matmul_pallas,
                     matmul_scaled)
from .normalization import (
    launch_layernorm,
    launch_normalize,
    launch_softmax,
    layernorm_rows,
    normalize_rows,
    softmax_rows,
)
from .reduce import (
    reduce_max,
    reduce_mean,
    reduce_sum,
    reduce_sum_autotuned,
    reduce_sum_naive,
)
from .moe import (
    expert_matmul,
    moe_combine,
    moe_dispatch,
    moe_ep_ffn,
)
