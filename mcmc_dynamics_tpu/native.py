"""ctypes bindings to the native C++ runtime library (catalog ingest, binary
catalog cache, radial binning).

The library is compiled on first use with the system toolchain into a per-user cache
directory; every entry point degrades gracefully to the NumPy implementation when the
toolchain or library is unavailable, so the native layer is an accelerator, never a
hard dependency.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import pathlib
import subprocess
import tempfile
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["load_library", "native_available", "read_csv", "cache_write",
           "cache_read", "radial_bins"]

_SOURCE = pathlib.Path(__file__).resolve().parents[1] / "native" / "mcmcd_native.cpp"
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_dir() -> pathlib.Path:
    """Per-user, 0700 cache directory.

    The default is uid-suffixed and created with restrictive permissions so
    no other local user can pre-plant a library at a predictable path that
    load_library() would then CDLL (arbitrary code execution); a pre-existing
    directory owned by someone else is rejected."""
    base = os.environ.get("MCMCD_NATIVE_CACHE")
    if base is None:
        uid = os.getuid() if hasattr(os, "getuid") else "na"
        base = os.path.join(tempfile.gettempdir(), f"mcmcd_native_{uid}")
    path = pathlib.Path(base)
    path.mkdir(parents=True, exist_ok=True, mode=0o700)
    # lstat: a pre-planted symlink to a victim-owned but attacker-writable
    # directory would pass a stat()-through-the-link ownership check
    st = os.lstat(path)
    import stat as stat_mod
    if stat_mod.S_ISLNK(st.st_mode):
        raise RuntimeError(
            f"Native cache dir {path} is a symlink; refusing to load "
            "libraries through it. Set MCMCD_NATIVE_CACHE.")
    if hasattr(os, "getuid") and st.st_uid != os.getuid():
        raise RuntimeError(
            f"Native cache dir {path} is owned by uid {st.st_uid}, not us; "
            "refusing to load libraries from it. Set MCMCD_NATIVE_CACHE.")
    if st.st_mode & 0o022:
        raise RuntimeError(
            f"Native cache dir {path} is group/world-writable; refusing to "
            "load libraries from it. Set MCMCD_NATIVE_CACHE.")
    return path


def load_library() -> Optional[ctypes.CDLL]:
    """Compile (if needed) and load the native library; None when unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not _SOURCE.exists():
        return None
    tag = hashlib.sha1(_SOURCE.read_bytes()).hexdigest()[:12]
    try:
        build_dir = _build_dir()
    except RuntimeError as err:
        logger.warning("%s Using NumPy paths.", err)
        return None
    so_path = build_dir / f"libmcmcd_{tag}.so"
    if not so_path.exists():
        # compile to a unique temp name and os.replace into place: a killed
        # compiler or a concurrent build can never leave a truncated .so at
        # the final path (whose mere existence would skip rebuilds forever)
        tmp_path = build_dir / f".libmcmcd_{tag}.{os.getpid()}.tmp.so"
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
               str(_SOURCE), "-o", str(tmp_path)]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(tmp_path, so_path)
        except Exception as err:
            logger.warning("Native library build failed (%s); using NumPy paths.",
                           err)
            tmp_path.unlink(missing_ok=True)
            return None
    try:
        lib = ctypes.CDLL(str(so_path))
    except OSError as err:
        logger.warning("Native library load failed (%s).", err)
        return None

    lib.mcmcd_read_csv.restype = ctypes.c_long
    lib.mcmcd_read_csv.argtypes = [ctypes.c_char_p, ctypes.c_long,
                                   ctypes.POINTER(ctypes.POINTER(ctypes.c_double))]
    lib.mcmcd_free.argtypes = [ctypes.POINTER(ctypes.c_double)]
    lib.mcmcd_cache_write.restype = ctypes.c_int
    lib.mcmcd_cache_write.argtypes = [ctypes.c_char_p,
                                      ctypes.POINTER(ctypes.c_double),
                                      ctypes.c_long, ctypes.c_long]
    lib.mcmcd_cache_open.restype = ctypes.POINTER(ctypes.c_double)
    lib.mcmcd_cache_open.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_long),
                                     ctypes.POINTER(ctypes.c_long),
                                     ctypes.POINTER(ctypes.c_void_p),
                                     ctypes.POINTER(ctypes.c_long)]
    lib.mcmcd_cache_close.argtypes = [ctypes.c_void_p, ctypes.c_long]
    lib.mcmcd_radial_bins.restype = ctypes.c_long
    lib.mcmcd_radial_bins.argtypes = [ctypes.POINTER(ctypes.c_double),
                                      ctypes.c_long, ctypes.c_long,
                                      ctypes.c_double,
                                      ctypes.POINTER(ctypes.c_int32)]
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return load_library() is not None


def read_csv(path, n_cols: int) -> Optional[np.ndarray]:
    """Fast numeric CSV parse -> (rows, n_cols) float64 array; None on fallback."""
    if n_cols < 1 or n_cols > 64:
        return None  # beyond the native row buffer: use the pandas fallback
    lib = load_library()
    if lib is None:
        return None
    out = ctypes.POINTER(ctypes.c_double)()
    rows = lib.mcmcd_read_csv(str(path).encode(), n_cols, ctypes.byref(out))
    if rows < 0:
        return None
    try:
        arr = np.ctypeslib.as_array(out, shape=(rows, n_cols)).copy()
    finally:
        lib.mcmcd_free(out)
    return arr


def cache_write(path, data: np.ndarray) -> bool:
    lib = load_library()
    if lib is None:
        return False
    data = np.ascontiguousarray(data, dtype=np.float64)
    rows, cols = data.shape
    ptr = data.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    return lib.mcmcd_cache_write(str(path).encode(), ptr, rows, cols) == 0


def cache_read(path) -> Optional[np.ndarray]:
    """Load a binary catalog cache through mmap (copied out to own the memory)."""
    lib = load_library()
    if lib is None:
        return None
    rows = ctypes.c_long()
    cols = ctypes.c_long()
    handle = ctypes.c_void_p()
    size = ctypes.c_long()
    ptr = lib.mcmcd_cache_open(str(path).encode(), ctypes.byref(rows),
                               ctypes.byref(cols), ctypes.byref(handle),
                               ctypes.byref(size))
    if not ptr:
        return None
    try:
        arr = np.ctypeslib.as_array(ptr, shape=(rows.value, cols.value)).copy()
    finally:
        lib.mcmcd_cache_close(handle, size)
    return arr


def radial_bins(r: np.ndarray, nstars: int, dlogr: float) -> Optional[np.ndarray]:
    lib = load_library()
    if lib is None:
        return None
    r = np.ascontiguousarray(r, dtype=np.float64)
    out = np.empty(r.size, dtype=np.int32)
    lib.mcmcd_radial_bins(r.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                          r.size, nstars, dlogr,
                          out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out
