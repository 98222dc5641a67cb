"""cubecl_tpu.tune — autotuning (reference: cubecl-runtime/src/tune)."""

from .anchor import anchor, anchor_key
from .cache import PersistentStore, TuneCache
from .operation import Tunable, TunableSet, TuneGroup, checksum
from .timing import chain_args_time, chain_pingpong_time, chain_scalar_time
from .tuner import LocalTuner, Tuner
