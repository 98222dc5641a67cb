"""cubecl_tpu.parallel — meshes + collectives (reference:
ServerCommunication / NCCL, SURVEY §2.9/§5)."""

from .comm import CommunicationId, Communicator, ReduceOperation
from .mesh import (auto_mesh, make_hybrid_mesh, make_mesh, named_sharding,
                   shard_array)
from .checkpoint import (
    CheckpointManager,
    restore_checkpoint,
    save_checkpoint,
    wait_for_saves,
)
from .train import (
    adamw_init,
    adamw_update,
    clip_by_global_norm,
    fsdp_shardings,
    make_fsdp_train_step,
    warmup_cosine,
)
