"""Device features and properties for the TPU backend.

Reference: ``Features``/``MmaConfig`` (cubecl-ir/src/features.rs:10,143) and
``HardwareProperties``/``DeviceProperties``/``DeviceIdentity``
(cubecl-ir/src/properties.rs:26-98). Capability queries flow through
``client.properties()`` exactly like the reference
(cubecl-book/src/core-features/features.md:4-8); §2.11 of SURVEY.md asks the
TPU backend to publish the same capability matrix.

TPU mapping:
- Plane ops         → sublane-group reductions/shuffles: supported
- CMMA              → MXU (128×128 systolic array): bf16/f32/fp8 inputs,
                      f32 accumulate
- TMA               → async VMEM DMA (pltpu.make_async_copy): supported
- cluster           → degenerate (megacore abstracted by Mosaic)
- atomics           → supported via serialized lowering (slow path)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, FrozenSet, List, Optional, Set, Tuple

from . import types as t
from .types import ElemType, Support


@dataclass(frozen=True)
class MmaConfig:
    """One supported MXU matmul configuration (reference MmaConfig,
    features.rs:143). m/n/k are the preferred native tile sizes."""

    a: ElemType
    b: ElemType
    cd: ElemType
    m: int = 128
    n: int = 128
    k: int = 128


@dataclass
class HardwareProperties:
    """reference HardwareProperties, properties.rs:26-60."""

    plane_size_min: int = 8
    plane_size_max: int = 8
    max_bindings: int = 64
    max_shared_memory_size: int = 16 * 1024 * 1024   # shared-scratch budget
    # Scoped-VMEM ceiling the Mosaic compiler accepts via
    # vmem_limit_bytes (real VMEM is 128MB/core on v4+; ~100MB is the
    # practical cap once Mosaic's own buffers are accounted — 32MB
    # double-buffered windows compile and run at this setting on v5e)
    max_vmem_alloc: int = 100 * 1024 * 1024
    max_cube_count: Tuple[int, int, int] = (2**31 - 1, 65535, 65535)
    max_units_per_cube: int = 1024
    max_cube_dim: Tuple[int, int, int] = (1024, 1024, 64)
    num_streaming_multiprocessors: Optional[int] = None  # TensorCores/chip
    num_tensor_cores: Optional[int] = None
    min_tensor_cores_per_sm: Optional[int] = None
    load_width: int = 512            # bits; 128-lane f32 vector register row
    memory_alignment: int = 512


@dataclass
class TpuGeneration:
    """Peak numbers per TPU generation, used for roofline autotune bounds
    (reference throughput/ + tune/bounds_generator.rs:46-113)."""

    name: str
    bf16_flops: float          # per chip, FLOP/s
    hbm_bw: float              # bytes/s
    vmem_bytes: int
    int8_ops: Optional[float] = None
    fp8_flops: Optional[float] = None
    # megacore: two TensorCores fused behind one device (v4/v5p). Mosaic
    # partitions the grid across the pair automatically (parallel
    # dimension_semantics); there is no cluster-shared memory or
    # programmable cluster sync, so the CubeCL cluster axis stays
    # degenerate (size 1) on every generation — on v4/v5p the megacore
    # is the scheduler's resource, not the kernel author's. See
    # docs/features.md "Cluster axis".
    megacore: bool = False


TPU_GENERATIONS = {
    "v4": TpuGeneration("v4", 275e12, 1.2e12, 128 * 2**20, megacore=True),
    "v5e": TpuGeneration("v5e", 197e12, 0.82e12, 128 * 2**20,
                         int8_ops=394e12),
    "v5p": TpuGeneration("v5p", 459e12, 2.76e12, 128 * 2**20, megacore=True),
    "v6e": TpuGeneration("v6e", 918e12, 1.64e12, 128 * 2**20,
                         int8_ops=1836e12),
}


class Features:
    """Per-device capability registry (reference Features, features.rs:10)."""

    def __init__(self) -> None:
        self.plane: Set[str] = set()
        self.cmma: Set[MmaConfig] = set()
        self.scaled_mma: Set[MmaConfig] = set()
        self.tma: bool = False
        self.cluster: bool = False
        # fp8 on TPU through v6e: NATIVE storage/streaming (1 byte/elem
        # in HBM and VMEM) and native MXU ingestion (Mosaic fuses the
        # widening into the systolic feed — measured 100% of bf16 peak
        # at 4096^3 on v5e) — but the COMPUTE RATE is bf16's, not a 2x
        # fp8 datapath; this flag records that distinction
        self.fp8_mma_emulated: bool = True
        self.dynamic_line_size: bool = True
        self.atomics: Set[str] = set()
        # type -> set of usages {"buffer", "compute", "mma", "conversion"}
        self.type_usage: Dict[ElemType, Set[str]] = {}

    def register_type(self, ty: ElemType, *usages: str) -> None:
        self.type_usage.setdefault(ty, set()).update(usages)

    def supports_type(self, ty: ElemType, usage: str = "compute") -> bool:
        return usage in self.type_usage.get(ty, set())

    def supported_mma(self, a: ElemType, b: ElemType, cd: ElemType) -> Optional[MmaConfig]:
        for cfg in self.cmma:
            if (cfg.a, cfg.b, cfg.cd) == (a, b, cd):
                return cfg
        return None


@dataclass
class DeviceIdentity:
    name: str
    fingerprint: str


class DeviceProperties:
    """reference DeviceProperties, properties.rs:98."""

    def __init__(self, identity: DeviceIdentity, hardware: HardwareProperties,
                 features: Features, generation: TpuGeneration):
        self.identity = identity
        self.hardware = hardware
        self.features = features
        self.generation = generation

    def feature_enabled(self, name: str) -> bool:
        return bool(getattr(self.features, name, False))


def tpu_device_properties(device_kind: str, name: str) -> DeviceProperties:
    """Build the property set for a TPU device (the analogue of the per-arch
    feature registration in cubecl-cuda/src/runtime.rs:108-320)."""
    kind = device_kind.lower()
    gen_key = "v5p"
    for key in TPU_GENERATIONS:
        if key in kind:
            gen_key = key
    # jax reports e.g. "TPU v5 lite" for v5e
    if "v5" in kind and ("lite" in kind or "v5e" in kind):
        gen_key = "v5e"
    gen = TPU_GENERATIONS[gen_key]

    feats = Features()
    feats.plane = {
        "sum", "prod", "max", "min", "all", "any", "ballot", "elect",
        "broadcast", "shuffle", "shuffle_xor", "shuffle_up", "shuffle_down",
        "inclusive_sum", "exclusive_sum", "inclusive_prod", "exclusive_prod",
    }
    feats.tma = True       # async VMEM DMA
    # cluster axis: OFF on every generation by decision, not omission.
    # v5e/v6e have one TensorCore per chip (nothing to cluster); v4/v5p
    # megacore pairs are auto-partitioned by Mosaic with no
    # cluster-shared memory or user sync — exposing CLUSTER_POS would
    # promise a resource the kernel cannot actually control.
    feats.cluster = False
    feats.atomics = {"add", "sub", "max", "min", "and", "or", "xor",
                     "swap", "cas", "load", "store"}

    for ty in (t.f32, t.bf16, t.f16, t.flex32):
        feats.register_type(ty, "buffer", "compute", "conversion")
    for ty in (t.i8, t.i16, t.i32, t.u8, t.u16, t.u32, t.bool_):
        feats.register_type(ty, "buffer", "compute", "conversion")
    for ty in (t.f64, t.i64, t.u64):  # emulated by XLA (x32 default mode)
        feats.register_type(ty, "buffer", "compute")
    for ty in (t.fp8_e4m3, t.fp8_e5m2):
        # mma usage is EMULATED (bf16 upcast at the MXU): see
        # Features.fp8_mma_emulated and ops/matmul.py
        feats.register_type(ty, "buffer", "conversion", "mma")
    feats.fp8_mma_emulated = gen.fp8_flops is None
    feats.register_type(t.bf16, "mma")
    feats.register_type(t.f32, "mma")

    feats.cmma = {
        MmaConfig(t.bf16, t.bf16, t.f32),
        MmaConfig(t.bf16, t.bf16, t.bf16),
        MmaConfig(t.f32, t.f32, t.f32),
        MmaConfig(t.fp8_e4m3, t.fp8_e4m3, t.f32),
        MmaConfig(t.fp8_e5m2, t.fp8_e5m2, t.f32),
        MmaConfig(t.i8, t.i8, t.i32),
    }

    hw = HardwareProperties()
    import hashlib

    fp = hashlib.sha256(f"tpu:{name}:{gen.name}".encode()).hexdigest()[:16]
    return DeviceProperties(DeviceIdentity(name, fp), hw, feats, gen)


def cpu_device_properties(name: str = "cpu-interpret") -> DeviceProperties:
    """Properties for the CPU interpreter backend — the DummyServer analogue
    (cubecl-runtime/tests/dummy/server.rs:29-42): full type matrix, plane
    size 8, small VMEM irrelevant."""
    props = tpu_device_properties("v5p", name)
    props.identity = DeviceIdentity(name, "cpu0000deadbeef")
    return props
