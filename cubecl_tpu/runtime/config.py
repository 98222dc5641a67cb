"""Runtime configuration.

Reference: global ``CubeClRuntimeConfig`` loaded from ``cubecl.toml`` found
by walking up the directory tree, with env-var overrides
(cubecl-runtime/src/config/base.rs:19-60; book advanced-usage/config.md).
Sections: profiling, autotune, compilation, streaming, memory, environment.

Env overrides use ``CUBECL_<SECTION>_<KEY>`` (e.g.
``CUBECL_AUTOTUNE_LEVEL=full``, ``CUBECL_PROFILING_LEVEL=basic``).
"""

from __future__ import annotations

import os
import threading
from typing import Any, Dict, Optional

try:
    import tomllib
except ImportError:  # pragma: no cover
    tomllib = None

_LOCK = threading.Lock()
_CACHE: Optional[Dict[str, Any]] = None

DEFAULTS: Dict[str, Any] = {
    "profiling": {"level": "minimal", "logger": "stderr"},
    "autotune": {"level": "balanced", "cache": True},
    "compilation": {"cache": True, "log_level": "minimal"},
    "streaming": {"multi_threading": False, "max_streams": 4,
                  "policy": "single"},
    "memory": {},
    "environment": {"name": "default", "root": None},
    "throughput": {"cache": True},
}


def _find_config_file(start: Optional[str] = None) -> Optional[str]:
    d = os.path.abspath(start or os.getcwd())
    while True:
        for name in ("cubecl.toml", "CubeCL.toml", "cubecl_tpu.toml"):
            p = os.path.join(d, name)
            if os.path.exists(p):
                return p
        parent = os.path.dirname(d)
        if parent == d:
            return None
        d = parent


def _deep_merge(base: Dict, over: Dict) -> Dict:
    out = dict(base)
    for k, v in over.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def _env_overrides(cfg: Dict[str, Any]) -> Dict[str, Any]:
    out = {k: dict(v) if isinstance(v, dict) else v for k, v in cfg.items()}
    for key, val in os.environ.items():
        if not key.startswith("CUBECL_"):
            continue
        parts = key[len("CUBECL_"):].lower().split("_", 1)
        if len(parts) != 2:
            continue
        section, name = parts
        if section not in out or not isinstance(out[section], dict):
            continue
        if val.lower() in ("true", "false"):
            parsed: Any = val.lower() == "true"
        else:
            try:
                parsed = int(val)
            except ValueError:
                parsed = val
        out[section][name] = parsed
    return out


def runtime_config(reload: bool = False) -> Dict[str, Any]:
    global _CACHE
    with _LOCK:
        if _CACHE is not None and not reload:
            return _CACHE
        cfg = {k: dict(v) if isinstance(v, dict) else v
               for k, v in DEFAULTS.items()}
        path = _find_config_file()
        if path and tomllib is not None:
            try:
                with open(path, "rb") as f:
                    cfg = _deep_merge(cfg, tomllib.load(f))
            except Exception:
                pass
        cfg = _env_overrides(cfg)
        _CACHE = cfg
        return cfg


def cache_root() -> str:
    """Persistent-store directory (reference cubecl-environment named
    environments, environment.rs:1-60)."""
    cfg = runtime_config()
    root = cfg["environment"].get("root")
    if root:
        base = root
    else:
        base = os.path.join(os.path.expanduser("~"), ".cache", "cubecl_tpu")
    env = cfg["environment"].get("name", "default")
    path = os.path.join(base, env)
    os.makedirs(path, exist_ok=True)
    return path
