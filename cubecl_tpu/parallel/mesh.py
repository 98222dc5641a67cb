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


def make_hybrid_mesh(dcn_axes: Dict[str, int], ici_axes: Dict[str, int],
                     devices=None):
    """Multi-slice mesh: ``dcn_axes`` cross TPU slices (data-center
    network — ~25 GB/s/host, high latency), ``ici_axes`` stay inside a
    slice (inter-chip interconnect — ~100s of GB/s/link). DCN axes are
    OUTERMOST in the device array so any collective over them crosses
    slices exactly once per hop and everything else rides ICI; put only
    latency-tolerant, low-volume axes (dp gradient all-reduce) on DCN and
    keep tp/sp/ep inside a slice (scaling-book multi-slice recipe;
    reference analogue: the per-device-set NCCL communicator registry,
    cubecl-cuda/src/compute/communication.rs:14-50).

    On real multi-slice TPU (devices expose ``slice_index``) the device
    array is grouped by slice via mesh_utils.create_hybrid_device_mesh;
    on single-slice or virtual CPU meshes, devices are partitioned
    contiguously into ``prod(dcn_axes)`` synthetic slices so the same
    program shape (and the dryrun) compiles everywhere.
    """
    import jax
    from jax.sharding import Mesh

    devices = list(devices) if devices is not None else jax.devices()
    n_dcn = int(np.prod(list(dcn_axes.values())))
    n_ici = int(np.prod(list(ici_axes.values())))
    n = n_dcn * n_ici
    assert len(devices) >= n, \
        f"hybrid mesh {dcn_axes}x{ici_axes} needs {n} devices, " \
        f"have {len(devices)}"
    devices = devices[:n]
    names = tuple(dcn_axes.keys()) + tuple(ici_axes.keys())
    shape = tuple(dcn_axes.values()) + tuple(ici_axes.values())

    slice_ids = {getattr(d, "slice_index", None) for d in devices}
    if len(slice_ids) > 1 and None not in slice_ids:
        # real multi-slice: group by slice, DCN axes over slice groups
        from jax.experimental import mesh_utils

        # mesh_shape/dcn_mesh_shape combine elementwise — pad each with
        # 1s so the result is the concatenated (dcn..., ici...) shape
        arr = mesh_utils.create_hybrid_device_mesh(
            (1,) * len(dcn_axes) + tuple(ici_axes.values()),
            tuple(dcn_axes.values()) + (1,) * len(ici_axes),
            devices=devices)
        return Mesh(arr.reshape(shape), names)
    # synthetic slices: contiguous groups (virtual CPU / single slice)
    return Mesh(np.array(devices).reshape(shape), names)


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
