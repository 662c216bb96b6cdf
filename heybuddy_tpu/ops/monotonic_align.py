"""
Monotonic alignment search (maximum path) for VITS training.

Two implementations with identical semantics:

* **Native C++** (``native/monotonic_align.cpp``): the reference depends on a
  Cython ``monotonic_align`` extension for this DP (reference setup.py:8,
  piper/models.py:663-722); ours is a C ABI library loaded via ctypes,
  compiled on first use (g++ -O3) and cached.
* **Numpy fallback** used when no compiler is available.

The DP is inherently sequential over mel frames with O(t_x) work per step —
host CPU is the right place for it (a TPU lax.scan would serialize the grid
dimension for no benefit), so like the original VITS it runs host-side between
device steps.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from heybuddy_tpu.utils.log import logger

__all__ = ["maximum_path"]

_LIB: Optional[ctypes.CDLL] = None
_LIB_FAILED = False


def _source_path() -> str:
    return os.path.join(os.path.dirname(__file__), "..", "..", "native", "monotonic_align.cpp")


def _load_library() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    source = os.path.abspath(_source_path())
    if not os.path.exists(source):
        _LIB_FAILED = True
        return None
    cache_dir = os.path.join(
        os.environ.get("HEYBUDDY_CACHE_DIR", os.path.expanduser("~/.cache/heybuddy-tpu")),
        "native",
    )
    os.makedirs(cache_dir, exist_ok=True)
    lib_path = os.path.join(cache_dir, "monotonic_align.so")
    if not os.path.exists(lib_path) or os.path.getmtime(lib_path) < os.path.getmtime(source):
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", lib_path, source],
                check=True,
                capture_output=True,
            )
        except (subprocess.CalledProcessError, FileNotFoundError) as ex:
            logger.warning(f"Could not build native monotonic_align ({ex}); using numpy fallback")
            _LIB_FAILED = True
            return None
    lib = ctypes.CDLL(lib_path)
    lib.maximum_path_batch.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.maximum_path_batch.restype = None
    _LIB = lib
    return _LIB


def _maximum_path_numpy(value: np.ndarray, t_x: int, t_y: int) -> np.ndarray:
    """Reference DP in numpy for one (t_x, t_y) log-likelihood matrix."""
    neg_inf = -np.inf
    dp = value.copy()
    for y in range(t_y):
        x_lo = max(y + t_x - t_y, 0)
        x_hi = min(y + 1, t_x)
        for x in range(x_lo, x_hi):
            if y == 0:
                best = 0.0 if x == 0 else neg_inf
            else:
                stay = dp[x, y - 1] if x < t_x else neg_inf
                step = dp[x - 1, y - 1] if x > 0 else neg_inf
                best = max(stay, step)
            dp[x, y] += best
    path = np.zeros_like(value, dtype=np.int32)
    index = t_x - 1
    for y in range(t_y - 1, -1, -1):
        path[index, y] = 1
        if index != 0 and (y == index or dp[index - 1, y - 1] >= dp[index, y - 1]):
            index -= 1
    return path


def maximum_path(value: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """
    Batched monotonic maximum path.

    Args:
        value: (batch, t_x, t_y) float32 log-likelihoods.
        mask: (batch, t_x, t_y) 0/1 feasibility mask encoding per-sample lengths.

    Returns int32 (batch, t_x, t_y) 0/1 alignment paths.
    """
    value = np.ascontiguousarray(np.asarray(value, dtype=np.float32) * mask)
    batch, max_tx, max_ty = value.shape
    t_xs = mask[:, :, 0].sum(axis=1).astype(np.int32)
    t_ys = mask[:, 0, :].sum(axis=1).astype(np.int32)

    lib = _load_library()
    paths = np.zeros((batch, max_tx, max_ty), dtype=np.int32)
    if lib is not None:
        work = value.copy()
        lib.maximum_path_batch(
            work.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            paths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            t_xs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            t_ys.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            batch,
            max_tx,
            max_ty,
        )
    else:
        for b in range(batch):
            paths[b, : t_xs[b], : t_ys[b]] = _maximum_path_numpy(
                value[b, : t_xs[b], : t_ys[b]], int(t_xs[b]), int(t_ys[b])
            )
    return paths * mask.astype(np.int32)
