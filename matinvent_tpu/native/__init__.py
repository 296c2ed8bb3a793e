"""Native (C++) runtime components with on-demand compilation.

Modules here are built once with the system g++ into a cache directory and
loaded through ctypes; every native entry point has a pure-Python fallback so
the framework works on boxes without a toolchain.
"""
from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import tempfile

_CACHE_DIR = os.environ.get(
    "MATINVENT_NATIVE_CACHE", os.path.join(tempfile.gettempdir(), "matinvent_native")
)


def _build(src_path: str) -> str | None:
    """Compile src to a cached .so keyed by source hash; None on failure."""
    with open(src_path, "rb") as fh:
        digest = hashlib.sha256(fh.read()).hexdigest()[:16]
    name = os.path.splitext(os.path.basename(src_path))[0]
    so_path = os.path.join(_CACHE_DIR, f"{name}-{digest}.so")
    if os.path.exists(so_path):
        return so_path
    os.makedirs(_CACHE_DIR, exist_ok=True)
    tmp = so_path + ".tmp"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src_path, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, so_path)
        return so_path
    except Exception as e:  # toolchain missing / compile error -> fallback
        logging.debug(f"native build failed for {src_path}: {e}")
        return None


_charge_lib = None
_charge_tried = False


def charge_balance_lib():
    """ctypes handle to the charge-balance module, or None (use fallback)."""
    global _charge_lib, _charge_tried
    if _charge_tried:
        return _charge_lib
    _charge_tried = True
    src = os.path.join(os.path.dirname(__file__), "charge_balance.cpp")
    so = _build(src)
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    lib.charge_balanced.restype = ctypes.c_int
    lib.charge_balanced.argtypes = [
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int,
    ]
    _charge_lib = lib
    return _charge_lib


def charge_balanced_native(
    ox_lists: list[list[int]], counts: list[int], ens: list[float]
) -> bool | None:
    """Native charge-balance check; None when the native lib is unavailable."""
    lib = charge_balance_lib()
    if lib is None:
        return None
    flat: list[int] = []
    offsets = [0]
    for states in ox_lists:
        flat.extend(states)
        offsets.append(len(flat))
    n = len(ox_lists)
    ox_arr = (ctypes.c_int * len(flat))(*flat)
    off_arr = (ctypes.c_int * (n + 1))(*offsets)
    cnt_arr = (ctypes.c_int * n)(*counts)
    en_arr = (ctypes.c_double * n)(*[e if e is not None else -1.0 for e in ens])
    return bool(lib.charge_balanced(ox_arr, off_arr, cnt_arr, en_arr, n))
