"""Native (C++) component loader: builds cpp/*.cc into a shared library on
first use (cached by source hash) and exposes ctypes bindings.

Components:
* FeatureCache / FeatureCacheWriter — mmap'd record store, the LMDB
  replacement for precomputed features (cpp/feature_cache.cc).
* mas_batch_cpu — threaded batched Viterbi MAS, host fallback / oracle for
  the device kernel (cpp/mas.cc).
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_CPP_DIR = os.path.join(_REPO_ROOT, "cpp")
_BUILD_DIR = os.environ.get("RADMMM_NATIVE_BUILD_DIR",
                            os.path.join(_CPP_DIR, "build"))
_SOURCES = ["feature_cache.cc", "mas.cc"]

_lib: Optional[ctypes.CDLL] = None


def _source_hash() -> str:
    h = hashlib.sha256()
    for s in _SOURCES:
        with open(os.path.join(_CPP_DIR, s), "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:16]


def build_native(force: bool = False) -> str:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    so_path = os.path.join(_BUILD_DIR, f"libradmmm_native_{_source_hash()}.so")
    if os.path.exists(so_path) and not force:
        return so_path
    srcs = [os.path.join(_CPP_DIR, s) for s in _SOURCES]
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           "-pthread", "-o", so_path] + srcs
    subprocess.run(cmd, check=True, capture_output=True)
    return so_path


def get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(build_native())
        lib.cache_writer_open.restype = ctypes.c_void_p
        lib.cache_writer_open.argtypes = [ctypes.c_char_p]
        lib.cache_writer_put.restype = ctypes.c_int
        lib.cache_writer_put.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                         ctypes.c_void_p, ctypes.c_uint64]
        lib.cache_writer_close.restype = ctypes.c_int
        lib.cache_writer_close.argtypes = [ctypes.c_void_p]
        lib.cache_open.restype = ctypes.c_void_p
        lib.cache_open.argtypes = [ctypes.c_char_p]
        lib.cache_count.restype = ctypes.c_uint64
        lib.cache_count.argtypes = [ctypes.c_void_p]
        lib.cache_get.restype = ctypes.c_void_p
        lib.cache_get.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                  ctypes.POINTER(ctypes.c_uint64)]
        lib.cache_close.argtypes = [ctypes.c_void_p]
        lib.mas_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int]
        _lib = lib
    return _lib


class FeatureCacheWriter:
    """Append-only writer; call close() (or use as context manager)."""

    def __init__(self, path: str):
        self._lib = get_lib()
        self._h = self._lib.cache_writer_open(path.encode())
        if not self._h:
            raise OSError(f"cannot open cache for writing at {path}")

    def put(self, key: str, data: bytes) -> None:
        rc = self._lib.cache_writer_put(self._h, key.encode(), data,
                                        len(data))
        if rc != 0:
            raise OSError(f"cache write failed for {key}")

    def put_array(self, key: str, arr: np.ndarray) -> None:
        import io
        buf = io.BytesIO()
        np.save(buf, arr, allow_pickle=False)
        self.put(key, buf.getvalue())

    def close(self) -> None:
        if self._h:
            self._lib.cache_writer_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class FeatureCache:
    """mmap'd zero-copy reader; safe for concurrent lookups."""

    def __init__(self, path: str):
        self._lib = get_lib()
        self._h = self._lib.cache_open(path.encode())
        if not self._h:
            raise OSError(f"cannot open cache at {path}")

    def __len__(self):
        return int(self._lib.cache_count(self._h))

    def get(self, key: str) -> Optional[bytes]:
        n = ctypes.c_uint64()
        ptr = self._lib.cache_get(self._h, key.encode(), ctypes.byref(n))
        if not ptr:
            return None
        return ctypes.string_at(ptr, n.value)

    def get_array(self, key: str) -> Optional[np.ndarray]:
        raw = self.get(key)
        if raw is None:
            return None
        import io
        return np.load(io.BytesIO(raw), allow_pickle=False)

    def close(self):
        if self._h:
            self._lib.cache_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def mas_batch_cpu(attn: np.ndarray, text_lens: np.ndarray,
                  mel_lens: np.ndarray, n_threads: int = 0) -> np.ndarray:
    """Batched width-1 MAS on host threads. attn: (B, T_mel, T_text)."""
    lib = get_lib()
    attn = np.ascontiguousarray(attn, np.float32)
    out = np.zeros_like(attn)
    B, T_mel, T_text = attn.shape
    ml = np.ascontiguousarray(mel_lens, np.int32)
    tl = np.ascontiguousarray(text_lens, np.int32)
    lib.mas_batch(
        attn.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        B, T_mel, T_text,
        ml.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        tl.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_threads)
    return out
