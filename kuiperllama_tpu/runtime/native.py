"""ctypes bindings for the native runtime (C++ loader + BPE engine).

Builds the shared libraries on first use with g++ (cached next to the
sources; `cmake` builds the same targets for release use — CMakeLists.txt).
pybind11 isn't in this image, so the C ABI + ctypes is the binding layer.
Every native component has a pure-Python fallback; `available()` reports
whether the toolchain produced usable libraries.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

_SRC_DIR = os.path.join(os.path.dirname(__file__), "src")
_BUILD_DIR = os.path.join(os.path.dirname(__file__), "_build")
_lock = threading.Lock()
_libs = {}


def _build(name: str) -> Optional[str]:
    src = os.path.join(_SRC_DIR, f"{name}.cpp")
    out = os.path.join(_BUILD_DIR, f"lib{name}.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", src, "-o", out]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None
    return out


def _load(name: str):
    with _lock:
        if name in _libs:
            return _libs[name]
        path = _build(name)
        lib = ctypes.CDLL(path) if path else None
        _libs[name] = lib
        return lib


def available() -> bool:
    return _load("loader") is not None and _load("spm_bpe") is not None


# ---------------------------------------------------------------------------
# loader


class KtHeader(ctypes.Structure):
    _fields_ = [
        ("dim", ctypes.c_int32),
        ("hidden_dim", ctypes.c_int32),
        ("n_layers", ctypes.c_int32),
        ("n_heads", ctypes.c_int32),
        ("n_kv_heads", ctypes.c_int32),
        ("vocab_size", ctypes.c_int32),
        ("seq_len", ctypes.c_int32),
        ("group_size", ctypes.c_int32),
        ("tied", ctypes.c_int32),
        ("quantized", ctypes.c_int32),
        ("qkv_bias", ctypes.c_int32),
        ("body_offset", ctypes.c_int64),
        ("file_size", ctypes.c_int64),
    ]


def parse_header(path: str, quant_hint: int = -1) -> KtHeader:
    """Parse + validate a .bin header natively (raises ValueError on a
    malformed/truncated file — the reference fatals instead,
    model.cpp:57-80)."""
    lib = _load("loader")
    if lib is None:
        raise RuntimeError("native loader unavailable (no g++?)")
    lib.kt_parse_header.restype = ctypes.c_int
    lib.kt_parse_header.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                    ctypes.POINTER(KtHeader)]
    h = KtHeader()
    rc = lib.kt_parse_header(path.encode(), quant_hint, ctypes.byref(h))
    if rc != 0:
        raise ValueError(f"invalid checkpoint {path!r} (native rc={rc})")
    return h


class MappedFile:
    """Zero-copy mmap of a checkpoint (reference RawModelData)."""

    def __init__(self, path: str):
        lib = _load("loader")
        if lib is None:
            raise RuntimeError("native loader unavailable")
        lib.kt_open.restype = ctypes.c_void_p
        lib.kt_open.argtypes = [ctypes.c_char_p]
        lib.kt_data.restype = ctypes.c_void_p
        lib.kt_data.argtypes = [ctypes.c_void_p]
        lib.kt_size.restype = ctypes.c_int64
        lib.kt_size.argtypes = [ctypes.c_void_p]
        self._lib = lib
        self._h = lib.kt_open(path.encode())
        if not self._h:
            raise OSError(f"cannot mmap {path!r}")

    def view(self):
        """The whole file as a read-only numpy uint8 view (zero copy)."""
        import numpy as np

        size = self._lib.kt_size(self._h)
        ptr = self._lib.kt_data(self._h)
        buf = (ctypes.c_uint8 * size).from_address(ptr)
        arr = np.frombuffer(buf, dtype=np.uint8)
        arr.flags.writeable = False
        return arr

    def close(self):
        if self._h:
            self._lib.kt_close.argtypes = [ctypes.c_void_p]
            self._lib.kt_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


# ---------------------------------------------------------------------------
# BPE merge engine


class SpmMergeEngine:
    """Greedy score-BPE merges in C++ (reference tiktoken.h:17-92)."""

    def __init__(self, pieces: List[str], scores: List[float]):
        lib = _load("spm_bpe")
        if lib is None:
            raise RuntimeError("native bpe engine unavailable")
        lib.spm_create.restype = ctypes.c_void_p
        lib.spm_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
        ]
        lib.spm_merge.restype = ctypes.c_int32
        lib.spm_merge.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ]
        lib.spm_destroy.argtypes = [ctypes.c_void_p]
        self._lib = lib
        raw = [p.encode("utf-8") for p in pieces]
        arr = (ctypes.c_char_p * len(raw))(*raw)
        lens = (ctypes.c_int32 * len(raw))(*[len(r) for r in raw])
        sc = (ctypes.c_float * len(scores))(*scores)
        self._h = lib.spm_create(arr, lens, sc, len(raw))

    def merge(self, ids: List[int]) -> List[int]:
        n = len(ids)
        if n <= 1:
            return list(ids)
        buf = (ctypes.c_int32 * n)(*ids)
        out_n = self._lib.spm_merge(self._h, buf, n)
        return list(buf[:out_n])

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.spm_destroy(self._h)
        except Exception:
            pass
