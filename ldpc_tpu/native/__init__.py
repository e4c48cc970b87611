"""Native (C++) host-side components.

``gf2core.cpp`` is the packed-word GF(2) elimination backend for the
``mod2`` toolbox — the counterpart of the reference's header-only C++
core (reference: src_cpp/gf2dense.hpp). It compiles on first use with
the system g++ into a per-user cache and loads via ctypes; every entry
point has a pure-numpy fallback, so the package works without a
toolchain.
"""

import ctypes
import os
import subprocess
import sysconfig
import tempfile
from typing import Optional

_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "gf2core.cpp")


def _cache_dir() -> str:
    base = os.environ.get(
        "LDPC_TPU_CACHE",
        os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
            "ldpc_tpu",
        ),
    )
    os.makedirs(base, exist_ok=True)
    return base


def load_gf2core() -> Optional[ctypes.CDLL]:
    """The compiled gf2core library, building it on first call.

    Returns None when no toolchain is available (callers fall back to
    the numpy implementation).
    """
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("LDPC_TPU_DISABLE_NATIVE"):
        return None
    so_path = os.path.join(_cache_dir(), "gf2core.so")
    try:
        if not os.path.exists(so_path) or os.path.getmtime(
            so_path
        ) < os.path.getmtime(_SRC):
            with tempfile.TemporaryDirectory(dir=_cache_dir()) as tmp:
                tmp_so = os.path.join(tmp, "gf2core.so")
                subprocess.run(
                    [
                        "g++", "-O3", "-march=native", "-std=c++17",
                        "-shared", "-fPIC", "-o", tmp_so, _SRC,
                    ],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
                os.replace(tmp_so, so_path)
        lib = ctypes.CDLL(so_path)
    except Exception:
        return None
    lib.gf2_row_reduce.restype = ctypes.c_int
    lib.gf2_row_reduce.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p,
    ]
    lib.gf2_estimate_distance.restype = ctypes.c_longlong
    lib.gf2_estimate_distance.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_double,
        ctypes.c_uint64, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int,
    ]
    _LIB = lib
    return _LIB


__all__ = ["load_gf2core"]
