"""ctypes binding to the native shared-memory ring (native/shm_ring.c).

The realtime transport boundary between a robot bus process (EtherCAT/
sim) and the JAX control process — ≙ ``RobotStateHandle`` arrays +
``realtime_tools::RealtimeBuffer`` in the reference (SURVEY.md §2.6).

The native library is compiled on first use with the system C compiler
(no pip deps); the .so is cached next to the source.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native"
)
_SRC = os.path.join(_NATIVE_DIR, "shm_ring.c")
_SO = os.path.join(_NATIVE_DIR, "_shm_ring.so")

_lib = None
_lock = threading.Lock()


def _build() -> str:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(
        _SRC
    ):
        return _SO
    cc = os.environ.get("CC", "cc")
    cmd = [cc, "-O2", "-shared", "-fPIC", "-o", _SO, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO


def _load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        lib = ctypes.CDLL(_build())
        lib.qlt_ring_create.argtypes = [
            ctypes.c_char_p,
            ctypes.c_uint32,
            ctypes.c_uint32,
        ]
        lib.qlt_ring_create.restype = ctypes.c_int
        lib.qlt_ring_open.argtypes = [ctypes.c_char_p]
        lib.qlt_ring_open.restype = ctypes.c_void_p
        lib.qlt_ring_push.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_uint32,
        ]
        lib.qlt_ring_push.restype = ctypes.c_int64
        lib.qlt_ring_pop_latest.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_uint32,
        ]
        lib.qlt_ring_pop_latest.restype = ctypes.c_int64
        lib.qlt_ring_read_at.argtypes = [
            ctypes.c_void_p,
            ctypes.c_uint64,
            ctypes.c_void_p,
            ctypes.c_uint32,
        ]
        lib.qlt_ring_read_at.restype = ctypes.c_int64
        lib.qlt_ring_head.argtypes = [ctypes.c_void_p]
        lib.qlt_ring_head.restype = ctypes.c_uint64
        lib.qlt_ring_slot_size.argtypes = [ctypes.c_void_p]
        lib.qlt_ring_slot_size.restype = ctypes.c_uint32
        lib.qlt_ring_close.argtypes = [ctypes.c_void_p]
        lib.qlt_ring_unlink.argtypes = [ctypes.c_char_p]
        lib.qlt_ring_unlink.restype = ctypes.c_int
        _lib = lib
        return lib


class ShmRing:
    """Single-writer / multi-reader latest-value ring over POSIX shm.

    Samples are fixed-dtype numpy structured records or flat float32
    vectors (``slot_floats``).
    """

    def __init__(self, name: str, ptr: int, slot_size: int):
        self._name = name
        self._ptr = ptr
        self.slot_size = slot_size

    # -- lifecycle -------------------------------------------------------

    @classmethod
    def create(cls, name: str, slot_floats: int, n_slots: int = 64):
        lib = _load()
        slot_size = 4 * slot_floats
        rc = lib.qlt_ring_create(name.encode(), slot_size, n_slots)
        if rc != 0:
            raise OSError(f"qlt_ring_create({name}) failed: {rc}")
        return cls.open(name)

    @classmethod
    def open(cls, name: str):
        lib = _load()
        ptr = lib.qlt_ring_open(name.encode())
        if not ptr:
            raise OSError(f"qlt_ring_open({name}) failed")
        return cls(name, ptr, lib.qlt_ring_slot_size(ptr))

    def close(self) -> None:
        if self._ptr:
            _load().qlt_ring_close(self._ptr)
            self._ptr = 0

    @staticmethod
    def unlink(name: str) -> None:
        _load().qlt_ring_unlink(name.encode())

    # -- data path -------------------------------------------------------

    def push(self, vec: np.ndarray) -> int:
        """Publish one float32 sample. Never blocks (writer side)."""
        v = np.ascontiguousarray(vec, np.float32)
        if v.nbytes > self.slot_size:
            raise ValueError("sample larger than slot")
        idx = _load().qlt_ring_push(
            self._ptr, v.ctypes.data_as(ctypes.c_void_p), v.nbytes
        )
        if idx < 0:
            raise OSError(f"push failed: {idx}")
        return int(idx)

    def pop_latest(self, n_floats: int):
        """Most recent complete sample → (index, vector) or None."""
        out = np.empty(n_floats, np.float32)
        idx = _load().qlt_ring_pop_latest(
            self._ptr, out.ctypes.data_as(ctypes.c_void_p), out.nbytes
        )
        if idx < 0:
            return None
        return int(idx), out

    def read_at(self, idx: int, n_floats: int):
        out = np.empty(n_floats, np.float32)
        rc = _load().qlt_ring_read_at(
            self._ptr,
            ctypes.c_uint64(idx),
            out.ctypes.data_as(ctypes.c_void_p),
            out.nbytes,
        )
        if rc < 0:
            return None
        return out

    @property
    def head(self) -> int:
        return int(_load().qlt_ring_head(self._ptr))
