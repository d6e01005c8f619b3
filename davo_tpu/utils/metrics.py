"""Structured metrics: JSONL stream + optional TensorBoard.

Replaces the reference's `tf.summary` scalars (SURVEY.md §5). Every
record is one JSON line {step, wall_time, **scalars}; TensorBoard
output is best-effort (enabled when tensorboardX/tf is importable).
"""

from __future__ import annotations

import json
import os
import time


class MetricsLogger:
    def __init__(self, log_dir: str, tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self._file = open(self.path, "a")
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def log(self, step: int, scalars: dict) -> None:
        record = {"step": step, "wall_time": time.time()}
        record.update({k: float(v) for k, v in scalars.items()})
        self._file.write(json.dumps(record) + "\n")
        self._file.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), step)

    def log_images(self, step: int, images: dict) -> None:
        """Image summaries (reference parity: the TF `tf.summary.image`
        warped-target / disparity panels, SURVEY.md §5 observability).

        images: name -> (H, W, 3) or (H, W) float array in [0, 1].
        Written to TensorBoard when available AND always dumped as PNGs
        under <log_dir>/images/ so training remains debuggable without
        a TB install."""
        import numpy as np

        img_dir = os.path.join(os.path.dirname(self.path), "images")
        os.makedirs(img_dir, exist_ok=True)
        for name, img in images.items():
            arr = np.asarray(img, np.float32)
            if arr.ndim == 2:
                arr = np.repeat(arr[..., None], 3, -1)
            arr = np.clip(arr, 0.0, 1.0)
            if self._tb is not None:
                self._tb.add_image(
                    name, (arr * 255).astype("uint8"), step,
                    dataformats="HWC",
                )
            try:
                import cv2

                cv2.imwrite(
                    os.path.join(img_dir, f"{name}_{step:07d}.png"),
                    cv2.cvtColor(
                        (arr * 255).astype("uint8"), cv2.COLOR_RGB2BGR
                    ),
                )
            except Exception:
                pass

    def close(self) -> None:
        self._file.close()
        if self._tb is not None:
            self._tb.close()
