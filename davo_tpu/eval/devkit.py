"""ctypes binding for the C++ KITTI odometry evaluator.

Builds tools/kitti_devkit on first use (cached .so). The C++ and the
Python (`eval/metrics.py`) implementations cross-check each other —
the reference's only native component was this evaluator (SURVEY.md
R13), so parity here is load-bearing for metric claims.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DEVKIT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tools",
    "kitti_devkit",
)
_LIB_PATH = os.path.join(_DEVKIT_DIR, "libkitti_eval.so")
_lib = None


def _build() -> None:
    subprocess.run(
        ["make", "-C", _DEVKIT_DIR, "libkitti_eval.so"],
        check=True,
        capture_output=True,
    )


def _load():
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.join(_DEVKIT_DIR, "evaluate_odometry.cc")
    if not os.path.exists(_LIB_PATH) or (
        os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)
    ):
        _build()
    lib = ctypes.CDLL(_LIB_PATH)
    lib.kitti_evaluate.restype = ctypes.c_int
    lib.kitti_evaluate.argtypes = [
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
    ]
    _lib = lib
    return lib


def kitti_seg_errors_cpp(
    gt: np.ndarray, pred: np.ndarray, step: int = 10
) -> dict:
    """C++ devkit equivalent of `metrics.kitti_seg_errors` (means only)."""
    lib = _load()
    gt64 = np.ascontiguousarray(gt, dtype=np.float64)
    pred64 = np.ascontiguousarray(pred, dtype=np.float64)
    assert gt64.shape == pred64.shape and gt64.shape[1:] == (4, 4)
    n = len(gt64)
    t_err = ctypes.c_double()
    r_err = ctypes.c_double()
    count = lib.kitti_evaluate(
        gt64.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        pred64.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n,
        step,
        ctypes.byref(t_err),
        ctypes.byref(r_err),
    )
    if count == 0:
        return {
            "t_err_pct": float("nan"),
            "r_err_deg_per_100m": float("nan"),
            "n_segments": 0,
        }
    return {
        "t_err_pct": 100.0 * t_err.value,
        "r_err_deg_per_100m": np.degrees(r_err.value) * 100.0,
        "n_segments": count,
    }
