"""Workspace CLI (reference xtask, xtask/src/main.rs:8-30):

    python -m cubecl_tpu info          device + feature matrix
    python -m cubecl_tpu test [args]   run the test suite (pytest passthru)
    python -m cubecl_tpu bench         run bench.py (headline metric)
    python -m cubecl_tpu throughput    peak compute/memory/launch probes
    python -m cubecl_tpu bundle export|import PATH
                                       pre-warmed cache bundles
"""

from __future__ import annotations

import os
import subprocess
import sys


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def cmd_info() -> int:
    from . import default_client
    from .ir.types import ALL_ELEM_TYPES

    client = default_client()
    props = client.properties()
    print(f"device: {props.identity.name} ({props.generation.name})")
    hw = props.hardware
    print(f"plane={hw.plane_size_min} max_shared={hw.max_shared_memory_size}B "
          f"max_cube_dim={hw.max_cube_dim} load_width={hw.load_width}")
    feats = props.features
    print("type support (compute/mma):")
    for t in ALL_ELEM_TYPES.values():
        c = "y" if feats.supports_type(t, "compute") else "-"
        m = "y" if feats.supports_type(t, "mma") else "-"
        print(f"  {t.name:10s} {c}/{m}")
    return 0


def cmd_test(args) -> int:
    env = dict(os.environ)
    args = list(args)
    if "--tpu" in args:
        # real-chip smoke subset (round-2 verdict item 5): Mosaic-
        # sensitive kernel tests on hardware; the conftest deselects
        # everything not marked tpu_smoke and hands out a TPU client
        args.remove("--tpu")
        env["CUBECL_TEST_TPU"] = "1"
        env["PYTHONPATH"] = _repo_root() + os.pathsep + \
            env.get("PYTHONPATH", "")
    return subprocess.call([sys.executable, "-m", "pytest", "tests/", "-q",
                            *args], cwd=_repo_root(), env=env)


def cmd_bench() -> int:
    return subprocess.call([sys.executable, "bench.py"], cwd=_repo_root())


def cmd_throughput() -> int:
    from . import default_client

    client = default_client()
    for mode in ("memory", "compute_direct", "compute_cmma", "launch"):
        try:
            v = client.measure_throughput(mode)
            unit = {"memory": "GB/s", "launch": "us/launch"}.get(
                mode, "GFLOP/s")
            scale = {"memory": 1e9, "launch": 1e-6}.get(mode, 1e9)
            print(f"{mode:16s} {v / scale:12.1f} {unit}")
        except Exception as e:  # pragma: no cover
            print(f"{mode:16s} failed: {e}")
    return 0


def cmd_bundle(args) -> int:
    from . import default_client
    from .runtime.bundle import export_bundle, import_bundle

    if not args or args[0] not in ("export", "import"):
        print("usage: bundle export|import PATH", file=sys.stderr)
        return 2
    path = args[1] if len(args) > 1 else "cubecl_bundle.json"
    if args[0] == "export":
        export_bundle(path)
        print(f"exported {path}")
    else:
        import_bundle(path)
        print(f"imported {path}")
    return 0


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0
    cmd, args = argv[0], argv[1:]
    if cmd == "info":
        return cmd_info()
    if cmd == "test":
        return cmd_test(args)
    if cmd == "bench":
        return cmd_bench()
    if cmd == "throughput":
        return cmd_throughput()
    if cmd == "bundle":
        return cmd_bundle(args)
    print(f"unknown command {cmd!r}\n{__doc__}", file=sys.stderr)
    return 2


if __name__ == "__main__":
    sys.exit(main())
