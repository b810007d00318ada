"""ctypes bindings for the native tick-telemetry ring log (runtime/ticklog.cc).

The serving controller (serving.py) ticks at ~800 Hz device-amortized on one
v5e; recording telemetry through Python file IO per tick would dominate the
loop. ``TickLog`` appends one fixed-width float32 record per tick into an
mmap'd ring file — a memcpy plus a release-ordered cursor store, no
syscalls — and the records survive a process crash (the pages belong to the
OS once written). A monitoring process can ``TickLog.open`` the same file
and tail it live.

The record schema is caller-defined (``width`` floats); the conventional
serving layout is ``[t_rel_s, tick_ms, action..., obs...]`` (relative seconds — an
absolute unix epoch would alias to a 128 s grid in float32) — see
scripts/serve_demo.py. Built on demand like the replay-buffer runtime
(runtime/__init__.py) and degrades gracefully when no toolchain exists.
"""

from __future__ import annotations

import ctypes
import logging
from pathlib import Path
from typing import Optional

import numpy as np

from ._native import REPO_ROOT, build_or_load, fptr as _fptr

logger = logging.getLogger(__name__)

_SRC = REPO_ROOT / "runtime" / "ticklog.cc"
_LIB = REPO_ROOT / "runtime" / "libticklog.so"

_lib: Optional[ctypes.CDLL] = None
_tried = False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None when unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    lib = build_or_load(_SRC, _LIB)
    if lib is None:
        return None
    lib.tl_create.restype = ctypes.c_void_p
    lib.tl_create.argtypes = [ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint64]
    lib.tl_open.restype = ctypes.c_void_p
    lib.tl_open.argtypes = [ctypes.c_char_p]
    for name in ("tl_count", "tl_capacity", "tl_width"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_uint64
        fn.argtypes = [ctypes.c_void_p]
    lib.tl_append.restype = ctypes.c_uint64
    lib.tl_append.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
    lib.tl_read.restype = ctypes.c_int
    lib.tl_read.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.tl_last.restype = ctypes.c_uint64
    lib.tl_last.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64, ctypes.POINTER(ctypes.c_float),
    ]
    lib.tl_sync.restype = ctypes.c_int
    lib.tl_sync.argtypes = [ctypes.c_void_p]
    lib.tl_close.restype = None
    lib.tl_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


class TickLog:
    """A fixed-width float32 ring log over an mmap'd file.

    ``TickLog.create(path, capacity, width)`` creates a new log (or resumes
    an existing compatible one — restart-friendly); ``TickLog.open(path)``
    attaches to whatever is there (e.g. a live controller's log from a
    monitoring process). Single writer; any number of readers.
    """

    def __init__(self, handle, lib):
        self._h = handle
        self._lib = lib
        self.capacity = int(lib.tl_capacity(handle))
        self.width = int(lib.tl_width(handle))

    @classmethod
    def create(cls, path: str, capacity: int, width: int) -> "TickLog":
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native ticklog unavailable (no C++ toolchain)")
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        h = lib.tl_create(str(path).encode(), capacity, width)
        if not h:
            raise IOError(
                f"cannot create tick log {path} (existing file with "
                f"different capacity/width?)"
            )
        return cls(h, lib)

    @classmethod
    def open(cls, path: str) -> "TickLog":
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native ticklog unavailable (no C++ toolchain)")
        h = lib.tl_open(str(path).encode())
        if not h:
            raise IOError(f"cannot open tick log {path}")
        return cls(h, lib)

    @property
    def count(self) -> int:
        """Total records ever appended (monotone; ring retains the last
        ``capacity`` of them)."""
        return int(self._lib.tl_count(self._h))

    def append(self, record) -> int:
        rec = np.ascontiguousarray(record, dtype=np.float32).reshape(-1)
        if rec.shape[0] != self.width:
            raise ValueError(f"record has {rec.shape[0]} floats, log width is {self.width}")
        n = int(self._lib.tl_append(self._h, _fptr(rec)))
        if n == 0:
            raise RuntimeError("tl_append failed")
        return n

    def read(self, start: int, k: int) -> np.ndarray:
        """Records [start, start+k) by absolute index; raises if any of them
        was already evicted from the ring (or not yet written)."""
        out = np.empty((k, self.width), dtype=np.float32)
        rc = self._lib.tl_read(self._h, start, k, _fptr(out))
        if rc != 0:
            raise IndexError(
                f"records [{start}, {start + k}) unavailable "
                f"(count={self.count}, capacity={self.capacity})"
            )
        return out

    def last(self, k: int) -> np.ndarray:
        """The newest min(k, retained) records, oldest-first."""
        out = np.empty((k, self.width), dtype=np.float32)
        n = int(self._lib.tl_last(self._h, k, _fptr(out)))
        return out[:n]

    def sync(self):
        """msync the mapping (machine-crash durability; appends already
        survive process crashes without it)."""
        rc = self._lib.tl_sync(self._h)
        if rc != 0:
            raise OSError("msync failed")

    def close(self):
        if self._h:
            self._lib.tl_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:  # noqa: BLE001 — interpreter teardown
            pass


def _main(argv=None):
    """Monitoring CLI: ``python -m neurallaplacecontrol_tpu.runtime.ticklog
    <path> [--last N] [--follow]`` prints records as JSON lines (one float
    list per record, the writer's schema order). ``--follow`` tails a LIVE
    log from another process — the cross-process read path the ring was
    built for."""
    import argparse
    import json
    import sys
    import time as _time

    p = argparse.ArgumentParser(description=_main.__doc__)
    p.add_argument("path")
    p.add_argument("--last", type=int, default=10)
    p.add_argument("--follow", action="store_true")
    p.add_argument("--poll_s", type=float, default=0.2)
    args = p.parse_args(argv)

    log = TickLog.open(args.path)
    # snapshot the cursor BEFORE dumping so records appended while the
    # initial batch prints are picked up by the follow loop (no gap)
    cursor = log.count
    print(
        f"# {args.path}: {cursor} records, width {log.width}, "
        f"ring capacity {log.capacity}",
        file=sys.stderr,
    )
    k = min(args.last, cursor, log.capacity)
    if k > 0:
        try:
            rows = log.read(cursor - k, k)
        except IndexError:  # writer lapped the ring between count and read
            rows = []
        for row in rows:
            print(json.dumps([round(float(x), 6) for x in row]))
    while args.follow:
        new = log.count
        if new > cursor:
            start = max(cursor, new - log.capacity)  # skip lapped records
            try:
                rows = log.read(start, new - start)
            except IndexError:  # lapped between count and read
                cursor = new
                continue
            for row in rows:
                print(json.dumps([round(float(x), 6) for x in row]), flush=True)
            cursor = new
        else:
            _time.sleep(args.poll_s)


if __name__ == "__main__":
    _main()
