"""cubecl_tpu.tune — autotuning (reference: cubecl-runtime/src/tune)."""

from .anchor import anchor, anchor_key
from .cache import PersistentStore, TuneCache
from .operation import Tunable, TunableSet, TuneGroup, checksum
from .tuner import LocalTuner, Tuner
