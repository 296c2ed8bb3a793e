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
    try:
        with open(src_path, "rb") as fh:
            digest = hashlib.sha256(fh.read()).hexdigest()[:16]
    except OSError as e:  # source missing/unreadable (broken install)
        logging.debug(f"native source unreadable at {src_path}: {e}")
        return None
    name = os.path.splitext(os.path.basename(src_path))[0]
    so_path = os.path.join(_CACHE_DIR, f"{name}-{digest}.so")
    if os.path.exists(so_path):
        return so_path
    os.makedirs(_CACHE_DIR, exist_ok=True)
    # per-process temp: two concurrent builders (pytest + a background
    # script) sharing one temp path could interleave g++ output and publish
    # a truncated .so under the hash-keyed name
    tmp = f"{so_path}.tmp{os.getpid()}"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src_path, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, so_path)
        return so_path
    except Exception as e:  # toolchain missing / compile error -> fallback
        logging.debug(f"native build failed for {src_path}: {e}")
        return None


#: lazily built libs by source basename: name -> handle (None = build failed)
_libs: dict = {}


def _lazy_lib(src_name: str, fn_name: str, restype, argtypes, warn: str = ""):
    """Shared lazy build-and-load: compile <src_name> once, bind <fn_name>'s
    signature, cache the handle (None on failure -> callers use the Python
    fallback). ``warn`` is logged at WARNING level on first failure so a
    missing toolchain's performance cliff is observable, not silent."""
    if src_name in _libs:
        return _libs[src_name]
    src = os.path.join(os.path.dirname(__file__), src_name)
    so = _build(src)
    if so is None:
        if warn:
            logging.warning(warn)
        _libs[src_name] = None
        return None
    try:
        lib = ctypes.CDLL(so)
        fn = getattr(lib, fn_name)
        fn.restype = restype
        fn.argtypes = argtypes
    except (OSError, AttributeError) as e:
        # corrupt cached .so or missing symbol: degrade to the Python
        # fallback ONCE (cache None) instead of re-raising on every call
        logging.warning(f"native {src_name} load failed ({e}); " + (warn or ""))
        _libs[src_name] = None
        return None
    _libs[src_name] = lib
    return lib


def charge_balance_lib():
    """ctypes handle to the charge-balance module, or None (use fallback)."""
    return _lazy_lib(
        "charge_balance.cpp",
        "charge_balanced",
        ctypes.c_int,
        [
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int,
        ],
    )


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


def structure_fit_lib():
    """ctypes handle to the exact-structure-fit module, or None (fallback)."""
    return _lazy_lib(
        "structure_fit.cpp",
        "structure_fit",
        ctypes.c_int,
        [
            ctypes.POINTER(ctypes.c_double),  # l1 [9]
            ctypes.POINTER(ctypes.c_double),  # f1 [n*3]
            ctypes.POINTER(ctypes.c_int32),   # sp1 [n]
            ctypes.POINTER(ctypes.c_double),  # l2 [9]
            ctypes.POINTER(ctypes.c_double),  # f2 [n*3]
            ctypes.c_int,                     # n
            ctypes.POINTER(ctypes.c_int32),   # relabel [R*n]
            ctypes.c_int,                     # R
            ctypes.c_double,                  # ltol
            ctypes.c_double,                  # stol
            ctypes.c_double,                  # angle_tol
            ctypes.c_int,                     # scale (bool)
        ],
        warn=(
            "native structure_fit build failed — the exact matcher falls "
            "back to pure Python (~30-2500x slower per batch); set "
            "structure_matcher: fast in the sample filter config if the "
            "RL loop's per-iteration dedup becomes the bottleneck"
        ),
    )


def structure_fit_native(
    l1, f1, sp1, l2, f2, relabelings, ltol, stol, angle_tol, scale
) -> bool | None:
    """Native exact structure fit; None when the native lib is unavailable.

    Inputs mirror ExactStructureMatcher.fit_prepared internals: Niggli-reduced
    lattices (row-major 3x3), wrapped fractional coords, structure-1 species,
    and the candidate species relabelings of structure 2 (already in
    structure-1's vocabulary; ordered fit passes ``[sp2]``).
    """
    lib = structure_fit_lib()
    if lib is None:
        return None
    import numpy as np

    n = len(sp1)
    l1a = np.ascontiguousarray(l1, dtype=np.float64)
    l2a = np.ascontiguousarray(l2, dtype=np.float64)
    f1a = np.ascontiguousarray(f1, dtype=np.float64)
    f2a = np.ascontiguousarray(f2, dtype=np.float64)
    sp1a = np.ascontiguousarray(sp1, dtype=np.int32)
    rel = np.ascontiguousarray(np.stack(relabelings), dtype=np.int32)
    dptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))  # noqa: E731
    iptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))  # noqa: E731
    return bool(
        lib.structure_fit(
            dptr(l1a), dptr(f1a), iptr(sp1a), dptr(l2a), dptr(f2a),
            ctypes.c_int(n), iptr(rel), ctypes.c_int(rel.shape[0]),
            ctypes.c_double(ltol), ctypes.c_double(stol),
            ctypes.c_double(angle_tol), ctypes.c_int(1 if scale else 0),
        )
    )
