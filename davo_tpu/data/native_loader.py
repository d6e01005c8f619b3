"""ctypes binding for the native multithreaded snippet-batch loader.

The reference feeds training through native TF queue runners
(<ref>/data_loader.py); `PreparedSnippets` (data/prep.py) is the
serial Python reader for the same offline triplet layout, and this
binding swaps its decode loop for the C++ thread pool in
tools/native_loader/snippet_loader.cc (built on first use, like the
devkit). Yields dict batches identical to `PreparedSnippets.batches`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LOADER_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tools",
    "native_loader",
)
_LIB_PATH = os.path.join(_LOADER_DIR, "libsnippet_loader.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.join(_LOADER_DIR, "snippet_loader.cc")
    if not os.path.exists(_LIB_PATH) or (
        os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)
    ):
        subprocess.run(
            ["make", "-C", _LOADER_DIR, "libsnippet_loader.so"],
            check=True,
            capture_output=True,
        )
    lib = ctypes.CDLL(_LIB_PATH)
    fp = ctypes.POINTER(ctypes.c_float)
    lib.snl_create.restype = ctypes.c_void_p
    ip = ctypes.POINTER(ctypes.c_int32)
    lib.snl_create.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_ulonglong, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.snl_next.restype = ctypes.c_int
    lib.snl_next.argtypes = [ctypes.c_void_p, fp, fp, fp, ip, fp]
    lib.snl_error.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int]
    lib.snl_destroy.argtypes = [ctypes.c_void_p]
    lib.snl_probe.restype = ctypes.c_int
    lib.snl_probe.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    _lib = lib
    return lib


def available() -> bool:
    """True if the native loader can be built/loaded on this host."""
    try:
        _load()
        return True
    except Exception:
        return False


class NativeSnippetLoader:
    """Drop-in for `PreparedSnippets` + its batch loop, C++-backed.

    Decode runs on `threads` worker threads with a 3-deep ready queue,
    so `batches()` overlaps JPEG decode with the training step instead
    of serializing them (the Python reader decodes on the calling
    thread). Per-epoch shuffling; ragged tail batches are dropped,
    matching `PreparedSnippets.batches`.
    """

    def __init__(
        self,
        data_dir: str,
        split: str = "train",
        batch_size: int = 4,
        threads: int | None = None,
        seed: int = 0,
        shuffle: bool = True,
        loop: bool = True,
        with_seg: bool | None = None,
        with_gt: bool | None = None,
    ):
        if threads is None:
            # Oversubscribe 2x: decode threads stall on file I/O, and
            # measured throughput kept scaling past the core count
            # (4-core host: 4t=514 img/s, 8t=1,293 vs python 376).
            threads = min(8, 2 * (os.cpu_count() or 4))
        lib = _load()
        self._lib = lib
        self.dir = data_dir
        with open(os.path.join(data_dir, f"{split}.txt")) as f:
            self.names = [l.strip() for l in f if l.strip()]
        if not self.names:
            raise ValueError(f"empty split {split} in {data_dir}")
        self.batch = batch_size
        h = ctypes.c_int()
        w = ctypes.c_int()
        probe = os.path.join(data_dir, self.names[0] + ".jpg")
        if not lib.snl_probe(
            probe.encode(), ctypes.byref(h), ctypes.byref(w)
        ):
            raise ValueError(f"cannot probe {probe}")
        self.height, self.width = h.value, w.value
        # Prepared sets are uniform: presence checked on one item.
        # with_seg/with_gt None = auto (decode when present); pass
        # False to skip decode + transfer of unconsumed lanes.
        seg_avail = os.path.exists(
            os.path.join(data_dir, self.names[0] + "_seg.png")
        )
        gt_avail = os.path.exists(
            os.path.join(data_dir, self.names[0] + "_pose.txt")
        )
        self.has_seg = seg_avail if with_seg is None else (
            with_seg and seg_avail
        )
        self.has_gt = gt_avail if with_gt is None else (
            with_gt and gt_avail
        )
        blob = "\n".join(self.names).encode()
        self._h = lib.snl_create(
            data_dir.encode(), blob, batch_size, self.height, self.width,
            threads, seed, int(shuffle), int(loop), int(self.has_seg),
            int(self.has_gt),
        )
        if not self._h:
            raise ValueError(
                f"native loader init failed ({len(self.names)} items, "
                f"batch {batch_size})"
            )

    def __len__(self) -> int:
        return len(self.names)

    def _error(self) -> str:
        buf = ctypes.create_string_buffer(512)
        self._lib.snl_error(self._h, buf, len(buf))
        return buf.value.decode()

    def batches(self, steps: int | None = None):
        fp = ctypes.POINTER(ctypes.c_float)
        ip = ctypes.POINTER(ctypes.c_int32)
        B, H, W = self.batch, self.height, self.width
        produced = 0
        while steps is None or produced < steps:
            target = np.empty((B, H, W, 3), np.float32)
            sources = np.empty((B, 2, H, W, 3), np.float32)
            K = np.empty((B, 3, 3), np.float32)
            seg = (
                np.empty((B, H, W), np.int32) if self.has_seg else None
            )
            gt = (
                np.empty((B, 2, 4, 4), np.float32) if self.has_gt else None
            )
            rc = self._lib.snl_next(
                self._h,
                target.ctypes.data_as(fp),
                sources.ctypes.data_as(fp),
                K.ctypes.data_as(fp),
                seg.ctypes.data_as(ip) if seg is not None else None,
                gt.ctypes.data_as(fp) if gt is not None else None,
            )
            if rc == 0:
                return
            if rc < 0:
                raise RuntimeError(f"native loader: {self._error()}")
            out = {"target": target, "sources": sources, "K": K}
            if seg is not None:
                out["seg"] = seg
            if gt is not None:
                out["gt_pose"] = gt
            yield out
            produced += 1

    def close(self) -> None:
        if self._h:
            self._lib.snl_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
