"""cubecl_tpu.models — flagship downstream models exercising the kernel
framework end-to-end."""

from .transformer import (
    TransformerConfig,
    forward,
    init_params,
    loss_fn,
    make_sharded_train_step,
    make_train_step,
    param_shardings,
)
from . import llama
from .llama import LlamaConfig
from . import pipeline
from . import vit
from . import mamba
from .mamba import MambaConfig
