"""Native runtime components: ctypes bindings for the C++ gid directory.

`GidMap` is an int64 -> int64 open-addressing hash used for the hot
gid -> (segId, vecId) lookups (the analogue of the reference's gid/map FDB
range, fdb/FdbVectorStore.java:575-601). Values pack (segId << 32) | vecId.
Batch put/get/remove take numpy arrays and run without per-element Python.

The shared library builds on first import (g++ is in the image); if that
fails, `PyGidMap` — a dict fallback with the same interface — is used so the
package keeps working in constrained environments.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

LOG = logging.getLogger("vectorsearch_tpu.native")


def _compile_shared(src: str, out: str, extra: tuple = ()) -> None:
    """Compiles src -> out atomically: build to a pid-unique temp file and
    os.replace() it over the target, so concurrent processes (tests + bench)
    can't interleave writes and a crashed build never leaves a half-written
    .so with a fresh mtime (which would suppress rebuilds forever)."""
    tmp = f"{out}.tmp.{os.getpid()}.so"
    try:
        for cc in ("g++", "cc"):  # g++ is the compiler the image documents
            try:
                subprocess.run(
                    [cc, "-O3", "-shared", "-fPIC", *extra, "-o", tmp, src],
                    check=True, capture_output=True,
                )
                os.replace(tmp, out)
                return
            except FileNotFoundError:
                continue
        raise RuntimeError(f"no C compiler found for {src}")
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_REPO_ROOT, "native", "gidmap.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "libgidmap.so")
_build_lock = threading.Lock()
_lib = None
_lib_attempted = False


def _load_library():
    global _lib, _lib_attempted
    with _build_lock:
        if _lib_attempted:
            return _lib
        _lib_attempted = True
        try:
            if not os.path.exists(_LIB) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
            ):
                _compile_shared(_SRC, _LIB)
            lib = ctypes.CDLL(_LIB)
            lib.gidmap_create.restype = ctypes.c_void_p
            lib.gidmap_create.argtypes = [ctypes.c_uint64]
            lib.gidmap_destroy.argtypes = [ctypes.c_void_p]
            lib.gidmap_size.restype = ctypes.c_uint64
            lib.gidmap_size.argtypes = [ctypes.c_void_p]
            lib.gidmap_put.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64]
            lib.gidmap_get.restype = ctypes.c_int64
            lib.gidmap_get.argtypes = [ctypes.c_void_p, ctypes.c_int64]
            lib.gidmap_remove.restype = ctypes.c_int
            lib.gidmap_remove.argtypes = [ctypes.c_void_p, ctypes.c_int64]
            p64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
            lib.gidmap_put_batch.argtypes = [ctypes.c_void_p, p64, p64, ctypes.c_uint64]
            lib.gidmap_get_batch.argtypes = [ctypes.c_void_p, p64, p64, ctypes.c_uint64]
            lib.gidmap_remove_batch.argtypes = [ctypes.c_void_p, p64, ctypes.c_uint64]
            lib.gidmap_items.restype = ctypes.c_uint64
            lib.gidmap_items.argtypes = [ctypes.c_void_p, p64, p64, ctypes.c_uint64]
            _lib = lib
        except Exception:
            LOG.warning("native gidmap unavailable; using Python fallback",
                        exc_info=True)
            _lib = None
        return _lib


_RB_SRC = os.path.join(_REPO_ROOT, "native", "resultbuilder.c")
_RB_LIB = os.path.join(_REPO_ROOT, "native", "_vsresults.so")
_rb_lock = threading.Lock()
_rb_mod = None
_rb_attempted = False


def load_result_builder():
    """Returns the C build_results function (see native/resultbuilder.c) or
    None; builds the extension on first call. Unlike the ctypes gidmap this
    is a real CPython extension (it constructs Python result objects), so it
    compiles against the interpreter headers and is imported as a module."""
    global _rb_mod, _rb_attempted
    with _rb_lock:
        if _rb_attempted:
            return getattr(_rb_mod, "build_results", None)
        _rb_attempted = True
        try:
            import sysconfig

            if not os.path.exists(_RB_LIB) or (
                os.path.exists(_RB_SRC)
                and os.path.getmtime(_RB_SRC) > os.path.getmtime(_RB_LIB)
            ):
                _compile_shared(
                    _RB_SRC, _RB_LIB,
                    extra=("-I", sysconfig.get_paths()["include"]),
                )
            import importlib.machinery
            import importlib.util

            loader = importlib.machinery.ExtensionFileLoader("_vsresults", _RB_LIB)
            spec = importlib.util.spec_from_loader("_vsresults", loader)
            mod = importlib.util.module_from_spec(spec)
            loader.exec_module(mod)
            _rb_mod = mod
        except Exception:
            LOG.warning("native result builder unavailable; using Python loop",
                        exc_info=True)
            _rb_mod = None
        return getattr(_rb_mod, "build_results", None)


def pack_loc(seg_id: int, vec_id: int) -> int:
    return (seg_id << 32) | (vec_id & 0xFFFFFFFF)


def unpack_loc(packed: int) -> tuple[int, int]:
    if packed < 0:
        return (-1, -1)
    return (packed >> 32, packed & 0xFFFFFFFF)


class GidMap:
    """int64 -> int64 map backed by the native table (dict fallback)."""

    def __new__(cls, initial_cap: int = 1024):
        if _load_library() is None:
            return PyGidMap(initial_cap)
        return super().__new__(cls)

    def __init__(self, initial_cap: int = 1024):
        self._lib = _lib
        self._h = ctypes.c_void_p(self._lib.gidmap_create(max(16, initial_cap)))

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.gidmap_destroy(self._h)
                self._h = None
        except Exception:
            pass

    def __len__(self):
        return int(self._lib.gidmap_size(self._h))

    def put(self, key: int, val: int) -> None:
        self._lib.gidmap_put(self._h, key, val)

    def get(self, key: int, default: int = -1) -> int:
        v = int(self._lib.gidmap_get(self._h, key))
        return v if v >= 0 else default

    def __contains__(self, key: int) -> bool:
        return int(self._lib.gidmap_get(self._h, key)) >= 0

    def remove(self, key: int) -> bool:
        return bool(self._lib.gidmap_remove(self._h, key))

    def put_batch(self, keys: np.ndarray, vals: np.ndarray) -> None:
        keys = np.ascontiguousarray(keys, np.int64)
        vals = np.ascontiguousarray(vals, np.int64)
        self._lib.gidmap_put_batch(self._h, keys, vals, len(keys))

    def get_batch(self, keys: np.ndarray) -> np.ndarray:
        keys = np.ascontiguousarray(keys, np.int64)
        out = np.empty(len(keys), np.int64)
        self._lib.gidmap_get_batch(self._h, keys, out, len(keys))
        return out

    def remove_batch(self, keys: np.ndarray) -> None:
        keys = np.ascontiguousarray(keys, np.int64)
        self._lib.gidmap_remove_batch(self._h, keys, len(keys))

    def items_arrays(self) -> tuple[np.ndarray, np.ndarray]:
        n = len(self)
        keys = np.empty(n, np.int64)
        vals = np.empty(n, np.int64)
        w = int(self._lib.gidmap_items(self._h, keys, vals, n))
        return keys[:w], vals[:w]


class PyGidMap:
    """Pure-Python fallback with the same interface."""

    def __init__(self, initial_cap: int = 1024):
        self._d: dict[int, int] = {}

    def __len__(self):
        return len(self._d)

    def put(self, key, val):
        self._d[int(key)] = int(val)

    def get(self, key, default=-1):
        return self._d.get(int(key), default)

    def __contains__(self, key):
        return int(key) in self._d

    def remove(self, key):
        return self._d.pop(int(key), None) is not None

    def put_batch(self, keys, vals):
        for k, v in zip(np.asarray(keys, np.int64), np.asarray(vals, np.int64)):
            self._d[int(k)] = int(v)

    def get_batch(self, keys):
        return np.array([self._d.get(int(k), -1) for k in keys], np.int64)

    def remove_batch(self, keys):
        for k in keys:
            self._d.pop(int(k), None)

    def items_arrays(self):
        if not self._d:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        keys = np.fromiter(self._d.keys(), np.int64, len(self._d))
        vals = np.fromiter(self._d.values(), np.int64, len(self._d))
        return keys, vals
