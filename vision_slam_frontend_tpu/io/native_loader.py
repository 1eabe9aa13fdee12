"""ctypes bindings for the native host runtime (native/vsf_native.cpp).

Provides a threaded JPEG decoder and a C++ bag scanner, with transparent
fallback to the pure-Python paths (io/image.py, io/rosbag.py) when the
shared library isn't built. Build with `make -C native`.

This is the TPU framework's native data path — the role the reference's C++
driver + cv::imdecode play on its single CPU thread
(reference: src/slam_frontend_main.cc:98-109, :271-328) — decoding stereo
pairs ahead of the device loop on a thread pool.
"""

from __future__ import annotations

import ctypes
import os
from typing import Iterator, List, Optional, Tuple

import numpy as np

_LIB = None


class _BagConnection(ctypes.Structure):
    _fields_ = [
        ("conn", ctypes.c_int32),
        ("topic", ctypes.c_char * 256),
        ("type", ctypes.c_char * 128),
    ]


class _BagRecord(ctypes.Structure):
    _fields_ = [
        ("conn", ctypes.c_int32),
        ("time_ns", ctypes.c_int64),
        ("offset", ctypes.c_int64),
        ("size", ctypes.c_int64),
    ]


def _lib_path() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "native",
        "vsf_native.so",
    )


def load_native():
    """Load (and memoize) the native library; None if unavailable.

    Only successful loads are memoized: a transient dlopen failure (e.g.
    fd exhaustion while other tests fork subprocesses) must not disable the
    native path for the rest of the process.
    """
    global _LIB
    if _LIB is not None:
        return _LIB
    path = _lib_path()
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.vsf_decode_jpeg_gray.restype = ctypes.c_int
    lib.vsf_decode_jpeg_gray.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.vsf_decode_jpeg_batch.restype = ctypes.c_int
    lib.vsf_decode_jpeg_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int32, ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
    ]
    lib.vsf_bag_open.restype = ctypes.c_void_p
    lib.vsf_bag_open.argtypes = [ctypes.c_char_p]
    lib.vsf_bag_num_records.restype = ctypes.c_int32
    lib.vsf_bag_num_records.argtypes = [ctypes.c_void_p]
    lib.vsf_bag_num_connections.restype = ctypes.c_int32
    lib.vsf_bag_num_connections.argtypes = [ctypes.c_void_p]
    lib.vsf_bag_get_connections.argtypes = [ctypes.c_void_p, ctypes.POINTER(_BagConnection)]
    lib.vsf_bag_get_records.argtypes = [ctypes.c_void_p, ctypes.POINTER(_BagRecord)]
    lib.vsf_bag_read.restype = ctypes.c_int
    lib.vsf_bag_read.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p]
    lib.vsf_bag_close.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return load_native() is not None


def decode_jpeg_gray(data: bytes) -> Optional[np.ndarray]:
    """Decode one JPEG to a grayscale uint8 array; None if native unavailable
    or the buffer isn't a decodable JPEG."""
    lib = load_native()
    if lib is None:
        return None
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    rc = lib.vsf_decode_jpeg_gray(data, len(data), None, 0, ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        return None
    out = np.empty((h.value, w.value), np.uint8)
    rc = lib.vsf_decode_jpeg_gray(
        data, len(data), out.ctypes.data_as(ctypes.c_void_p), out.size,
        ctypes.byref(w), ctypes.byref(h),
    )
    return out if rc == 0 else None


def decode_jpeg_batch(
    buffers: List[bytes], width: int, height: int, num_threads: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode N same-sized JPEGs concurrently -> ((N, H, W) uint8, status (N,))."""
    lib = load_native()
    if lib is None:
        raise RuntimeError("native library not built (make -C native)")
    n = len(buffers)
    out = np.zeros((n, height, width), np.uint8)
    status = np.zeros(n, np.int32)
    arr_t = ctypes.c_char_p * n
    len_t = ctypes.c_int64 * n
    datas = arr_t(*buffers)
    lens = len_t(*[len(b) for b in buffers])
    lib.vsf_decode_jpeg_batch(
        datas, lens, n, out.ctypes.data_as(ctypes.c_void_p), width, height,
        num_threads, status.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out, status


class NativeBagReader:
    """C++-indexed bag reading: full record index up front, zero-copy-ish
    message access. Falls back to io/rosbag.py for compressed chunks (the
    native scanner indexes uncompressed chunks only)."""

    def __init__(self, path: str):
        lib = load_native()
        if lib is None:
            raise RuntimeError("native library not built (make -C native)")
        self._lib = lib
        self._handle = lib.vsf_bag_open(path.encode())
        if not self._handle:
            raise ValueError(f"{path}: not a readable ROS bag v2.0 file")
        nconn = lib.vsf_bag_num_connections(self._handle)
        conns = (_BagConnection * nconn)()
        lib.vsf_bag_get_connections(self._handle, conns)
        self.connections = {
            c.conn: (c.topic.decode(), c.type.decode()) for c in conns
        }
        nrec = lib.vsf_bag_num_records(self._handle)
        recs = (_BagRecord * nrec)()
        lib.vsf_bag_get_records(self._handle, recs)
        self._records = [(r.conn, r.time_ns, r.offset, r.size) for r in recs]

    def __len__(self) -> int:
        return len(self._records)

    def read_messages(
        self, topics: Optional[List[str]] = None
    ) -> Iterator[Tuple[str, int, bytes]]:
        """Yield (topic, t_ns, raw serialized body) in file order."""
        topic_set = set(topics) if topics else None
        for conn, t_ns, offset, size in self._records:
            topic, _ = self.connections.get(conn, ("", ""))
            if topic_set is not None and topic not in topic_set:
                continue
            buf = np.empty(size, np.uint8)
            rc = self._lib.vsf_bag_read(
                self._handle, offset, size, buf.ctypes.data_as(ctypes.c_void_p)
            )
            if rc != 0:
                continue
            yield topic, t_ns, buf.tobytes()

    def close(self) -> None:
        if self._handle:
            self._lib.vsf_bag_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
