"""Loader for the native C++ runtime library (csrc/native.cc).

The reference keeps its hot runtime bookkeeping native (Rust): memory-pool
offset management (cubecl-runtime/src/memory_management/memory_pool/
sliced_pool.rs), stable hashing, fastdivmod magic numbers. Here those live
in one C++ shared object built on demand with g++ and bound via ctypes
(pybind11 is not available in this image). Every caller has a pure-Python
fallback so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_LOCK = threading.Lock()
_CACHED: Optional[ctypes.CDLL] = None
_TRIED = False


def _csrc_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(__file__)), "csrc")


def _build(src: str, out: str) -> bool:
    try:
        r = subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", src, "-o", out],
            capture_output=True, timeout=120)
        return r.returncode == 0
    except Exception:
        return False


def load_native() -> Optional[ctypes.CDLL]:
    global _CACHED, _TRIED
    with _LOCK:
        if _TRIED:
            return _CACHED
        _TRIED = True
        if os.environ.get("CUBECL_NO_NATIVE"):
            # force the pure-Python fallbacks (hashing etc.) — used to
            # exercise toolchain-free environments
            return None
        d = _csrc_dir()
        src = os.path.join(d, "native.cc")
        so = os.path.join(d, "libcubecl_native.so")
        if not os.path.exists(src):
            return None
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            if not _build(src, so):
                return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        # signatures
        lib.xxh64.restype = ctypes.c_uint64
        lib.xxh64.argtypes = [ctypes.c_char_p, ctypes.c_size_t, ctypes.c_uint64]
        lib.divmod_magic.restype = ctypes.c_uint64
        lib.divmod_magic.argtypes = [ctypes.c_uint32]
        # page pool (KV block manager, runtime/pages.py)
        lib.page_pool_create.restype = ctypes.c_int64
        lib.page_pool_create.argtypes = [ctypes.c_int32]
        for name in ("page_pool_destroy", "page_pool_num_free"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_int32
            fn.argtypes = [ctypes.c_int64]
        for name in ("page_pool_seq_pages", "page_pool_append",
                     "page_pool_free_seq"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_int32
            fn.argtypes = [ctypes.c_int64, ctypes.c_int64]
        lib.page_pool_alloc_seq.restype = ctypes.c_int32
        lib.page_pool_alloc_seq.argtypes = [ctypes.c_int64, ctypes.c_int64,
                                            ctypes.c_int32]
        lib.page_pool_fork.restype = ctypes.c_int32
        lib.page_pool_fork.argtypes = [ctypes.c_int64, ctypes.c_int64,
                                       ctypes.c_int64]
        lib.page_pool_fill_table.restype = ctypes.c_int32
        lib.page_pool_fill_table.argtypes = [
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32]
        lib.page_pool_refcount.restype = ctypes.c_int32
        lib.page_pool_refcount.argtypes = [ctypes.c_int64, ctypes.c_int32]
        lib.page_pool_unshare_last.restype = ctypes.c_int64
        lib.page_pool_unshare_last.argtypes = [ctypes.c_int64,
                                               ctypes.c_int64]
        for name in ("page_pool_register_prefix", "page_pool_admit_cached"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_int32
            fn.argtypes = [ctypes.c_int64, ctypes.c_int64,
                           ctypes.POINTER(ctypes.c_uint64),
                           ctypes.c_int32]
        _CACHED = lib
        return _CACHED
