"""Training image summaries: warped targets + disparity panels.

Reference parity: DAVO's TensorBoard shows the photometrically warped
source->target reconstructions and the predicted disparity maps
(`<ref>/davo.py` image summaries, SURVEY.md §5 observability) — the
primary debugging surface for photometric training. Rendered with one
jitted forward on the current batch (device compute), converted to
small numpy panels on host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from davo_tpu.core.warp import projective_inverse_warp
from davo_tpu.models.dispnet import disp_to_depth


def _colorize(x: np.ndarray) -> np.ndarray:
    """Normalize a scalar map to [0, 1] and apply a blue->red ramp."""
    lo, hi = np.percentile(x, 2), np.percentile(x, 98)
    n = np.clip((x - lo) / max(hi - lo, 1e-6), 0.0, 1.0)
    return np.stack([n, 0.4 * (1 - np.abs(2 * n - 1)), 1.0 - n], axis=-1)


def make_summary_fn(model, cfg):
    """Returns (params, batch) -> dict[str, np.ndarray] image panels."""

    @jax.jit
    def _warp(params, target, sources, seg, K):
        out = model.apply(
            params, target, sources,
            seg=seg if cfg.model.attention == "flow_seg" else None,
            train=True,
        )
        disp0 = out["disp"][0][..., 0]
        depth = disp_to_depth(disp0)
        warped, valid = projective_inverse_warp(
            sources[:, 0], depth, out["poses"][:, 0], K
        )
        return disp0, warped, valid

    def summarize(params, batch) -> dict:
        seg = jnp.asarray(batch["seg"]) if "seg" in batch else None
        disp0, warped, valid = _warp(
            params,
            jnp.asarray(batch["target"]),
            jnp.asarray(batch["sources"]),
            seg,
            jnp.asarray(batch["K"]),
        )
        tgt = np.asarray(batch["target"][0])
        w = np.asarray(warped[0], np.float32)
        v = np.asarray(valid[0], np.float32).reshape(tgt.shape[0], tgt.shape[1], 1)
        return {
            "target": tgt,
            "source0": np.asarray(batch["sources"][0, 0]),
            "warped_source0": w * v,
            "photometric_err": _colorize(
                np.abs(w - tgt).mean(-1) * v[..., 0]
            ),
            "disparity": _colorize(np.asarray(disp0[0], np.float32)),
        }

    return summarize
