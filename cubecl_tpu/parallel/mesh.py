"""Device mesh utilities.

Reference: the reference is single-host multi-GPU (device enumeration +
NCCL, SURVEY §2.9); the TPU-native equivalent is ``jax.sharding.Mesh``
over ICI with named axes. This module standardizes mesh construction for
the framework: data (dp), fsdp, tensor (tp), sequence (sp) and expert (ep)
axes, following the scaling-book recipe (pick a mesh, annotate shardings,
let XLA insert collectives).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np


def make_mesh(axes: Dict[str, int], devices=None):
    """Build a Mesh with named axes, e.g. {"dp": 2, "tp": 4}."""
    import jax
    from jax.sharding import Mesh

    devices = devices if devices is not None else jax.devices()
    n = int(np.prod(list(axes.values())))
    assert len(devices) >= n, \
        f"mesh {axes} needs {n} devices, have {len(devices)}"
    arr = np.array(devices[:n]).reshape(tuple(axes.values()))
    return Mesh(arr, tuple(axes.keys()))


def auto_mesh(n_devices: Optional[int] = None, tp: Optional[int] = None,
              dp: Optional[int] = None):
    """Sensible default mesh for n devices: tp up to 4 (intra-replica),
    rest dp. Mirrors how users size NCCL communicators in the reference."""
    import jax

    n = n_devices or len(jax.devices())
    if tp is None:
        tp = 1
        for cand in (4, 2):
            if n % cand == 0 and n >= cand:
                tp = cand
                break
    dp = dp or (n // tp)
    return make_mesh({"dp": dp, "tp": tp})


def named_sharding(mesh, *spec):
    from jax.sharding import NamedSharding, PartitionSpec

    return NamedSharding(mesh, PartitionSpec(*spec))


def shard_array(arr, mesh, *spec):
    import jax

    return jax.device_put(arr, named_sharding(mesh, *spec))
