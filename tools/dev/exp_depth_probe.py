"""Depth-learnability probe (r2 loss iteration): border+min-reproj vs
the r1 masked loss, supervised tier, single loop-roll world.

Usage: tools/dev/tpu_run.sh "tools/dev/exp_depth_probe.py [STEPS]" <t> 1
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from davo_tpu.config import Config, TrainConfig
from davo_tpu.data.snippets import SnippetDataset
from davo_tpu.data.synthetic import SyntheticSequence
from davo_tpu.models import presets
from davo_tpu.models.dispnet import disp_to_depth
from davo_tpu.train.loop import fit

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 2500

base = presets.get("tiny")
H, W = base.model.img_height, base.model.img_width
seq = SyntheticSequence(
    n_frames=24, seed=1, height=H, width=W, plane_z=30.0,
    forward_speed=0.8, trajectory="loop", loop_roll=True,
    texture_mode="procedural",
)
gt_med = float(np.median(seq.depth(0)))
frames = np.stack([seq.frame(i) for i in range(17)])
segs = np.stack([seq.seg(i) for i in range(17)])

for masking in ("border", "valid"):
    cfg = Config(
        model=base.model,
        train=TrainConfig(
            batch_size=16, learning_rate=4e-3, lr_schedule="cosine",
            max_steps=STEPS, pose_supervision_weight=100.0,
            smooth_weight=0.1, photo_masking=masking,
            log_every=max(STEPS // 5, 1),
        ),
    )
    ds = SnippetDataset(
        seq, batch_size=16, with_seg=True, with_gt=True,
        augment="color", seed=0,
    )
    model, state, hist = fit(
        cfg, ds.batches(steps=STEPS),
        log_fn=lambda s, m, v=masking: print(
            f"[{v}] step {s}: "
            + " ".join(f"{k}={val:.4f}" for k, val in m.items()),
            flush=True,
        ),
    )

    @jax.jit
    def depth_fn(t, s, g):
        out = model.apply(state.params, t, s[:, None], seg=g, train=True)
        return disp_to_depth(out["disp"][0][..., 0])

    d = np.asarray(
        depth_fn(
            jnp.asarray(frames[1:17]), jnp.asarray(frames[0:16]),
            jnp.asarray(segs[1:17]),
        )
    )
    print(
        f"[{masking}] depth_med={float(np.median(d)):.1f} vs GT "
        f"{gt_med:.1f} (ratio {float(np.median(d)) / gt_med:.2f})",
        flush=True,
    )
