"""Test configuration: force an 8-device virtual CPU mesh.

The shared suite runs TPU-less (the reference's CPU-runtime fallback,
cubecl-cpu/src/lib.rs:19 — SURVEY §4): kernels execute through the Pallas
interpreter and multi-chip sharding tests get 8 virtual devices.
"""

import os
import sys

# NOTE: the axon-tunnel re-exec guard lives in cubecl_tpu/testing.py,
# loaded via addopts before pytest capture starts (see pyproject.toml).

_TPU_MODE = bool(os.environ.get("CUBECL_TEST_TPU"))

if not _TPU_MODE:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               if "xla_force_host_platform_device_count"
                               in os.environ.get("XLA_FLAGS", "")
                               else os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
os.environ.setdefault("CUBECL_AUTOTUNE_CACHE", "false")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest

# ---------------------------------------------------------------------------
# TPU smoke subset (round-2 verdict item 5): the Mosaic-sensitive kernel
# tests — dynamic windows, ND planning, CMMA, checked tails, atomics,
# plane ops, the dynamic-shape ABI — selected by NAME here and marked
# `tpu_smoke`. Run on the real chip with:
#     python -m cubecl_tpu test --tpu
# (sets CUBECL_TEST_TPU=1 -> no CPU re-exec, client = TpuRuntime).
# Every round-2 hardware bug was an interpreter-vs-Mosaic divergence
# found late by benching; this subset finds them in CI time.
# ---------------------------------------------------------------------------

TPU_SMOKE = {
    # dynamic windows / strided spans (the round-2 bug farm)
    "test_varying_loop_stop", "test_varying_loop_start",
    "test_varying_loop_masked_stores", "test_strided_load_loop_offset",
    "test_strided_store_loop_offset", "test_slice_view",
    # ND planning
    "test_nd_blocked_2d", "test_nd_fallback_whole_strided",
    "test_nd_nonexact_tiling_checked", "test_tensor_nd_indexing",
    # checked tails / negative indices
    "test_checked_io_tail", "test_checked_negative_index",
    # CMMA / MXU
    "test_cmma_nd_windowed_matmul",
    # atomics (lockstep-exact lowering)
    "test_atomic_add", "test_atomic_max", "test_atomic_swap_cas",
    "test_atomic_bitwise",
    # plane/sublane ops + dynamic shuffle lanes
    "test_plane_ops", "test_shuffles", "test_ballot_elect",
    "test_plane_gather_dynamic_lanes", "test_shuffle_up_traced_delta",
    # dtypes Mosaic handles specially
    "test_minifloat_fp8", "test_bf16_compute",
    # shared memory / barriers
    "test_shared_memory", "test_barrier_memcpy_async",
    # runtime-shape ABI (dynamic grids + runtime lengths)
    "test_elementwise_dynamic_one_compile",
    "test_checked_masks_against_runtime_length",
    "test_reduce_dynamic_one_compile", "test_softmax_dynamic_one_compile",
    "test_cube_count_builtin_dynamic",
    # control flow on hardware
    "test_loop", "test_continue_and_break", "test_early_return",
    # scalar-prefetched schedules (block-sparse fwd + transposed bwd)
    "test_flash_attention_block_sparse",
    "test_flash_attention_block_sparse_grads",
    # int8 KV paged decode (scale windows + column-folded dequant)
    "test_paged_attention_int8_kv",
    # round-4 kernels: triangular causal grid + pair-packed conv
    "test_flash_attention_triangular_grid",
    "test_conv2d_pairs_small_channel",
    # round-5 kernel: hierarchical in-tile selective scan (roll
    # compaction + aligned reshape-slice + sublane broadcast)
    "test_selective_scan_hier_kernel",
    # round-5: chunked prefill incl. int8 pre-gathered scale windows
    "test_paged_attention_chunked",
    # round-5: StreamingLLM windowed+sinks mode (static capacity grid)
    "test_paged_attention_windowed_sinks",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.name.split("[")[0]
        if base in TPU_SMOKE:
            item.add_marker(pytest.mark.tpu_smoke)
    if _TPU_MODE:
        # on the real chip, run ONLY the smoke subset (everything else
        # assumes the 8-device CPU mesh)
        selected = [i for i in items if i.get_closest_marker("tpu_smoke")]
        deselected = [i for i in items if not i.get_closest_marker("tpu_smoke")]
        if deselected:
            config.hook.pytest_deselected(items=deselected)
        items[:] = selected


@pytest.fixture(scope="session")
def client():
    if _TPU_MODE:
        from cubecl_tpu import TpuRuntime

        return TpuRuntime.client()
    from cubecl_tpu import CpuRuntime

    return CpuRuntime.client()


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(42)
