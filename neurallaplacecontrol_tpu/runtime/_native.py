"""Shared build-or-load scaffolding for the native runtime components.

Each native component is one C++ translation unit under runtime/ compiled
to a sibling .so with g++ on demand (no cmake). Loading rules, shared by
every component so fixes land once:

- a shipped .so is usable as-is when no source exists;
- when the source is newer than the .so, rebuild — but if the rebuild
  fails (no toolchain), FALL BACK to the existing .so instead of refusing:
  git does not preserve mtimes, so a fresh clone routinely has .cc newer
  than the shipped binary on machines with no compiler at all;
- everything degrades to None so callers can keep a pure-Python fallback.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

REPO_ROOT = Path(__file__).resolve().parents[2]


def build_or_load(src: Path, lib_path: Path, extra_flags=()) -> Optional[ctypes.CDLL]:
    """Compile ``src`` to ``lib_path`` if stale, then load it. Returns None
    only when no loadable library can be produced OR found."""
    stale = src.exists() and (
        not lib_path.exists() or lib_path.stat().st_mtime < src.stat().st_mtime
    )
    if stale:
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", *extra_flags,
                 str(src), "-o", str(lib_path)],
                check=True,
                capture_output=True,
            )
        except (OSError, subprocess.CalledProcessError) as e:
            if lib_path.exists():
                logger.warning(
                    "rebuilding %s failed (%s); using the existing shipped "
                    "library", lib_path.name, e,
                )
            else:
                logger.info("native %s unavailable (%s)", lib_path.name, e)
                return None
    if not lib_path.exists():
        return None
    return ctypes.CDLL(str(lib_path))


def fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
