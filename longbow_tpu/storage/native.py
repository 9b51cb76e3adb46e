"""ctypes loader for the native runtime library (native/longbow_native.cpp).

Builds on first use with g++ -O3 -shared into .native_build/ (cached by
source mtime); falls back to pure-Python (zlib.crc32 framing) when no
compiler is available so the package never hard-fails.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

_REPO = Path(__file__).resolve().parents[2]
_SRC = _REPO / "native" / "longbow_native.cpp"
_BUILD = _REPO / ".native_build"
_LOCK = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[Path]:
    so = _BUILD / "longbow_native.so"
    try:
        if so.exists() and so.stat().st_mtime >= _SRC.stat().st_mtime:
            return so
        _BUILD.mkdir(exist_ok=True)
        subprocess.run(
            [
                "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                str(_SRC), "-o", str(so),
            ],
            check=True,
            capture_output=True,
        )
        return so
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _LOCK:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        so = _build()
        if so is None:
            return None
        lib = ctypes.CDLL(str(so))
        lib.lb_crc32c.restype = ctypes.c_uint32
        lib.lb_crc32c.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint32
        ]
        lib.lb_wal_frame_size.restype = ctypes.c_uint64
        lib.lb_wal_frame_size.argtypes = [ctypes.c_uint16, ctypes.c_uint32]
        lib.lb_wal_encode.restype = ctypes.c_uint64
        lib.lb_wal_encode.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64, ctypes.c_double,
            ctypes.c_char_p, ctypes.c_uint16, ctypes.c_uint8,
            ctypes.c_char_p, ctypes.c_uint32,
        ]
        lib.lb_wal_scan.restype = ctypes.c_int64
        lib.lb_wal_scan.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint64),
        ]
        # io_uring WAL backend (reference: wal_backend_linux.go:15-125)
        lib.lb_uring_open.restype = ctypes.c_uint64
        lib.lb_uring_open.argtypes = [ctypes.c_char_p, ctypes.c_uint32]
        lib.lb_uring_write.restype = ctypes.c_int64
        lib.lb_uring_write.argtypes = [
            ctypes.c_uint64, ctypes.c_char_p, ctypes.c_uint64
        ]
        lib.lb_uring_fsync.restype = ctypes.c_int64
        lib.lb_uring_fsync.argtypes = [ctypes.c_uint64]
        lib.lb_uring_size.restype = ctypes.c_int64
        lib.lb_uring_size.argtypes = [ctypes.c_uint64]
        lib.lb_uring_truncate.restype = ctypes.c_int64
        lib.lb_uring_truncate.argtypes = [ctypes.c_uint64]
        lib.lb_uring_close.restype = None
        lib.lb_uring_close.argtypes = [ctypes.c_uint64]
        # fast ticket-vector parse (reference: zero_alloc_parser.go)
        lib.lb_json_f32.restype = ctypes.c_int64
        lib.lb_json_f32.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_uint64),
        ]
        # single-pass f32 -> bf16-bits (scan-mirror ingest hot path)
        lib.lb_f32_to_bf16.restype = None
        lib.lb_f32_to_bf16.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint64
        ]
        # inverse expansion (scan serving: mirror -> wire f32)
        lib.lb_bf16_to_f32.restype = None
        lib.lb_bf16_to_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint64
        ]
        _lib = lib
        return _lib


_PY_TABLE = None


def _py_crc32c(data: bytes, seed: int = 0) -> int:
    """Pure-Python CRC32C — same polynomial as the native path so WALs
    stay readable regardless of which implementation wrote them. Only
    used when g++ is unavailable (it is baked into this image)."""
    global _PY_TABLE
    if _PY_TABLE is None:
        poly = 0x82F63B78
        tbl = []
        for i in range(256):
            crc = i
            for _ in range(8):
                crc = (crc >> 1) ^ (poly if crc & 1 else 0)
            tbl.append(crc)
        _PY_TABLE = tbl
    crc = ~seed & 0xFFFFFFFF
    for b in data:
        crc = _PY_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return ~crc & 0xFFFFFFFF


def crc32c(data: bytes, seed: int = 0) -> int:
    lib = get_lib()
    if lib is not None:
        return lib.lb_crc32c(data, len(data), seed)
    return _py_crc32c(data, seed)


def native_available() -> bool:
    return get_lib() is not None
