"""CSV input with a native C++ fast path.

``read_csv`` parses CARLA log CSVs through the mmap + ``std::from_chars``
loader in ``native/csvloader.cpp`` (built on demand with g++ and bound via
ctypes) and wraps the resulting double matrix in a pandas DataFrame so the
scenario predicates work unchanged.  Falls back to ``pandas.read_csv``
when the toolchain or shared library is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np
import pandas as pd

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libdmvcsv.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "csvloader.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-fPIC", "-shared", src, "-o", _SO_PATH],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        if not os.path.exists(_SO_PATH) and not _build():
            _lib_failed = True
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            _lib_failed = True
            return None
        lib.dmv_csv_open.restype = ctypes.c_void_p
        lib.dmv_csv_open.argtypes = [ctypes.c_char_p]
        lib.dmv_csv_rows.restype = ctypes.c_int64
        lib.dmv_csv_rows.argtypes = [ctypes.c_void_p]
        lib.dmv_csv_cols.restype = ctypes.c_int64
        lib.dmv_csv_cols.argtypes = [ctypes.c_void_p]
        lib.dmv_csv_header.restype = ctypes.c_char_p
        lib.dmv_csv_header.argtypes = [ctypes.c_void_p]
        lib.dmv_csv_copy.restype = None
        lib.dmv_csv_copy.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_double)]
        lib.dmv_csv_close.restype = None
        lib.dmv_csv_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load_lib() is not None


def read_csv_native(path: str) -> Optional[Tuple[list, np.ndarray]]:
    """(column names, (rows, cols) float64 matrix) or None on failure."""
    lib = _load_lib()
    if lib is None:
        return None
    handle = lib.dmv_csv_open(os.fsencode(path))
    if not handle:
        return None
    try:
        rows = lib.dmv_csv_rows(handle)
        cols = lib.dmv_csv_cols(handle)
        header = lib.dmv_csv_header(handle).decode("utf-8", "replace")
        out = np.empty((rows, cols), np.float64)
        lib.dmv_csv_copy(handle, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        return header.split(","), out
    finally:
        lib.dmv_csv_close(handle)


# parse cache: the pipeline reads each CSV several times (start conditions,
# human extraction, THW, …); keyed by (path, mtime, size) so edits
# invalidate.  Each read_csv call wraps a COPY of the cached matrix, so
# callers that mutate their DataFrame (e.g. sut.writeback) can't corrupt it.
_parse_cache: dict = {}
_PARSE_CACHE_MAX = 512


def read_csv(path: str) -> pd.DataFrame:
    """DataFrame over the native parse; pandas fallback."""
    try:
        st = os.stat(path)
        key = (os.path.abspath(path), st.st_mtime_ns, st.st_size)
    except OSError:
        key = None
    # single .get: a check-then-index pair races the clear()-based
    # eviction under concurrent read_csv calls (KeyError)
    entry = _parse_cache.get(key) if key is not None else None
    if entry is not None:
        names, data = entry
        return pd.DataFrame(data.copy(), columns=names)
    parsed = read_csv_native(path)
    if parsed is None:
        df = pd.read_csv(path)
        # cache the fallback too (the multiple-reads-per-CSV pattern is why
        # the cache exists) — but only all-numeric frames, and served as
        # float64 like the native path so hits and misses agree on dtypes
        if key is not None and len(df.columns) and all(
            np.issubdtype(dt, np.number) for dt in df.dtypes
        ):
            data = df.to_numpy(np.float64)
            if len(_parse_cache) >= _PARSE_CACHE_MAX:
                _parse_cache.clear()
            _parse_cache[key] = (list(df.columns), data)
            return pd.DataFrame(data.copy(), columns=list(df.columns))
        return df
    names, data = parsed
    # pandas naming convention for blank header fields
    names = [n if n.strip() else f"Unnamed: {i}" for i, n in enumerate(names)]
    if key is not None:
        if len(_parse_cache) >= _PARSE_CACHE_MAX:
            _parse_cache.clear()
        _parse_cache[key] = (names, data)
    return pd.DataFrame(data.copy(), columns=names)
