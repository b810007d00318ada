"""ctypes bindings for the native replay-buffer runtime (runtime/replaybuf.cc).

The shared library is built on demand with g++ (single translation unit, no
cmake needed) and cached next to the source. Everything degrades gracefully:
if no C++ toolchain is available, data.replay falls back to .npz.
"""

from __future__ import annotations

import ctypes
import logging
from pathlib import Path
from typing import Optional

import numpy as np

from ._native import REPO_ROOT, build_or_load, fptr as _fptr

logger = logging.getLogger(__name__)

_SRC = REPO_ROOT / "runtime" / "replaybuf.cc"
_LIB = REPO_ROOT / "runtime" / "libreplaybuf.so"

_lib: Optional[ctypes.CDLL] = None
_tried = False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None when unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    lib = build_or_load(_SRC, _LIB, extra_flags=("-pthread",))
    if lib is None:
        return None
    lib.rb_write.restype = ctypes.c_int
    lib.rb_write.argtypes = [
        ctypes.c_char_p, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
    ]
    lib.rb_open.restype = ctypes.c_void_p
    lib.rb_open.argtypes = [ctypes.c_char_p]
    lib.rb_rows.restype = ctypes.c_uint64
    lib.rb_rows.argtypes = [ctypes.c_void_p]
    lib.rb_dim.restype = ctypes.c_uint64
    lib.rb_dim.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.rb_data.restype = ctypes.POINTER(ctypes.c_float)
    lib.rb_data.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.rb_gather.restype = ctypes.c_int
    lib.rb_gather.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int64),
        ctypes.c_uint64, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]
    lib.rb_close.restype = None
    lib.rb_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


class ReplayBuffer:
    """Zero-copy view over an mmap'd replay-buffer file.

    Arrays are exposed as numpy views directly onto the mapping — no
    deserialization. ``gather`` pulls shuffled batches on worker threads.
    """

    NAMES = ("s0", "a0", "sn", "ts")

    def __init__(self, path: str, shapes: dict):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native replaybuf unavailable")
        self._lib = lib
        self._h = lib.rb_open(str(path).encode())
        if not self._h:
            raise IOError(f"cannot open replay buffer {path}")
        self.n = int(lib.rb_rows(self._h))
        self.shapes = shapes
        self.arrays = {}
        for i, name in enumerate(self.NAMES):
            d = int(lib.rb_dim(self._h, i))
            ptr = lib.rb_data(self._h, i)
            flat = np.ctypeslib.as_array(ptr, shape=(self.n * d,))
            self.arrays[name] = flat.reshape((self.n,) + tuple(shapes[name]))

    def copy_arrays(self) -> dict:
        """Heap COPIES of all arrays, safe to use after close().

        The ``arrays`` views alias the mmap directly: close()/GC munmaps
        the pages under them (and under anything that zero-copied them,
        e.g. jnp.asarray on the CPU backend) — callers that outlive the
        buffer must copy.
        """
        return {k: np.array(v, copy=True) for k, v in self.arrays.items()}

    def gather(self, name: str, idx: np.ndarray, n_threads: int = 8) -> np.ndarray:
        i = self.NAMES.index(name)
        idx = np.ascontiguousarray(idx, dtype=np.int64)
        d = int(np.prod(self.shapes[name], dtype=np.int64)) if self.shapes[name] else 1
        out = np.empty((idx.shape[0], d), dtype=np.float32)
        rc = self._lib.rb_gather(
            self._h, i, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            idx.shape[0], _fptr(out), n_threads,
        )
        if rc != 0:
            raise RuntimeError(f"rb_gather failed: {rc}")
        return out.reshape((idx.shape[0],) + tuple(self.shapes[name]))

    def close(self):
        if self._h:
            self._lib.rb_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:  # noqa: BLE001 — interpreter teardown
            pass


def write_buffer(path: str, s0, a0, sn, ts) -> bool:
    """Write the native format; returns False when the lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return False
    arrs = [np.ascontiguousarray(np.asarray(x), dtype=np.float32) for x in (s0, a0, sn, ts)]
    n = arrs[0].shape[0]
    if any(a.shape[0] != n for a in arrs):
        raise ValueError(
            f"row-count mismatch: {[a.shape[0] for a in arrs]} (rb_write would "
            "read past the end of the shorter arrays)"
        )
    dims = (ctypes.c_uint64 * 4)(
        *[int(np.prod(a.shape[1:], dtype=np.int64)) if a.ndim > 1 else 1 for a in arrs]
    )
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    rc = lib.rb_write(str(path).encode(), n, dims, *[_fptr(a) for a in arrs])
    return rc == 0


def open_buffer(path: str, shapes: dict) -> ReplayBuffer:
    return ReplayBuffer(path, shapes)
