"""Sharded checkpoint/resume for training state.

TPU-native: orbax/tensorstore writes each array shard-parallel from
device memory and restores DIRECTLY into a target sharding — including
a *different* mesh than the one that saved (elastic resume after a
topology change). The reference's persistence layer stops at kernel
bundles + autotune caches (SURVEY §5, runtime/bundle.py here); training
state persistence is the missing production half, supplied on top of
the same fsdp sharding trees (parallel/train.py).
"""

from __future__ import annotations

import os
from typing import Any, Optional

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_step",
           "wait_for_saves", "CheckpointManager"]


_CKPTR = None


def _checkpointer():
    # one long-lived checkpointer so non-blocking saves keep their
    # background thread alive after save_checkpoint returns
    global _CKPTR
    if _CKPTR is None:
        import orbax.checkpoint as ocp

        _CKPTR = ocp.StandardCheckpointer()
    return _CKPTR


def save_checkpoint(path: str, state: Any, *, force: bool = True,
                    blocking: bool = True) -> None:
    """Write one pytree of (possibly sharded) arrays to ``path``.

    blocking=False returns as soon as the device→host snapshot is
    taken (orbax copies synchronously, then writes in the background),
    so the train loop — including a donated step that frees these very
    buffers — continues immediately. Call ``wait_for_saves()`` (or the
    next blocking save) before relying on the files."""
    ckptr = _checkpointer()
    ckptr.save(os.path.abspath(path), state, force=force)
    if blocking:
        ckptr.wait_until_finished()


def wait_for_saves() -> None:
    """Block until every in-flight non-blocking save has committed."""
    _checkpointer().wait_until_finished()


def restore_checkpoint(path: str, target: Any, *,
                       partial: bool = False) -> Any:
    """Restore into the sharding/dtype layout of ``target`` — a pytree
    of arrays OR jax.ShapeDtypeStruct(shape, dtype, sharding=...). The
    on-disk layout need not match: tensorstore reads the slices each
    target shard needs, so a checkpoint saved on an fsdp=8 mesh
    restores onto fsdp=4 (or a single device) unchanged.

    partial=True restores a SUBTREE of what was saved (e.g. params
    without optimizer state — the eval/serving case)."""
    import jax
    import orbax.checkpoint as ocp

    def as_abstract(x):
        if isinstance(x, jax.ShapeDtypeStruct):
            return x
        return jax.ShapeDtypeStruct(x.shape, x.dtype,
                                    sharding=getattr(x, "sharding", None))

    abstract = jax.tree_util.tree_map(as_abstract, target)
    path = os.path.abspath(path)
    if not partial:
        return _checkpointer().restore(path, abstract)
    rargs = jax.tree_util.tree_map(
        lambda a: ocp.ArrayRestoreArgs(sharding=a.sharding,
                                       global_shape=a.shape,
                                       dtype=a.dtype), abstract)
    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(path, args=ocp.args.PyTreeRestore(
            item=abstract, restore_args=rargs, partial_restore=True))


def latest_step(root: str) -> Optional[int]:
    """Largest numeric subdirectory of ``root`` (None if empty)."""
    if not os.path.isdir(root):
        return None
    steps = [int(d) for d in os.listdir(root) if d.isdigit()]
    return max(steps) if steps else None


class CheckpointManager:
    """step-numbered checkpoints under one root with retention.

    save(step, state) keeps at most ``max_to_keep`` newest steps and
    skips steps that aren't multiples of ``save_interval``. restore()
    loads the newest (or a given) step into a target layout.
    """

    def __init__(self, root: str, *, max_to_keep: int = 3,
                 save_interval: int = 1):
        self.root = os.path.abspath(root)
        self.max_to_keep = max_to_keep
        self.save_interval = max(1, save_interval)
        os.makedirs(self.root, exist_ok=True)

    def _dir(self, step: int) -> str:
        return os.path.join(self.root, str(step))

    def save(self, step: int, state: Any) -> bool:
        if step % self.save_interval:
            return False
        save_checkpoint(self._dir(step), state)
        kept = sorted(int(d) for d in os.listdir(self.root) if d.isdigit())
        for old in kept[:-self.max_to_keep]:
            import shutil

            shutil.rmtree(self._dir(old), ignore_errors=True)
        return True

    def restore(self, target: Any, step: Optional[int] = None) -> Any:
        step = latest_step(self.root) if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.root}")
        return restore_checkpoint(self._dir(step), target)

    @property
    def all_steps(self):
        return sorted(int(d) for d in os.listdir(self.root) if d.isdigit())
