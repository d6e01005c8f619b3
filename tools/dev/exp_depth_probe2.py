"""Depth probe in the EXACT e2e failing regime: 16 radius-spread
loop-roll worlds, B=16, supervised, border+min+edge-crop loss.

Usage: tools/dev/tpu_run.sh "tools/dev/exp_depth_probe2.py [STEPS]" <t> 1
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
from davo_tpu.data.snippets import MultiSourceDataset
from davo_tpu.data.synthetic import SyntheticSequence
from davo_tpu.models import presets
from davo_tpu.models.dispnet import disp_to_depth
from davo_tpu.train.loop import fit

STEP_GRID = (
    [int(v) for v in sys.argv[1].split(",")] if len(sys.argv) > 1
    else [800, 2500]
)

base = presets.get("tiny")
H, W = base.model.img_height, base.model.img_width
WORLD_KW = dict(
    height=H, width=W, plane_z=30.0, forward_speed=0.8,
    trajectory="loop", loop_roll=True, texture_mode="procedural",
)
worlds = [
    SyntheticSequence(
        n_frames=24, seed=s,
        loop_radius=(30.0, 60.0, 100.0, 160.0)[s % 4], **WORLD_KW,
    )
    for s in range(1, 17)
]
train_w = worlds[0]
unseen_w = SyntheticSequence(n_frames=20, seed=99, **WORLD_KW)
evals = {
    "train-world": train_w,
    "unseen-world": unseen_w,
}

for STEPS in STEP_GRID:
  cfg = Config(
    model=base.model,
    train=TrainConfig(
        batch_size=16, learning_rate=4e-3, lr_schedule="cosine",
        max_steps=STEPS, pose_supervision_weight=100.0,
        smooth_weight=0.1, log_every=max(STEPS // 8, 1),
    ),
)
  ds = MultiSourceDataset(
      worlds, batch_size=16, with_seg=True, with_gt=True,
      augment="color", seed=0,
  )
  model, state, hist = fit(
      cfg, ds.batches(steps=STEPS),
      log_fn=lambda s, m, n=STEPS: print(
          f"[{n}] step {s}: "
          + " ".join(f"{k}={v:.4f}" for k, v in m.items()),
          flush=True,
      ),
  )

  @jax.jit
  def depth_fn(t, s, g):
      out = model.apply(state.params, t, s[:, None], seg=g, train=True)
      return disp_to_depth(out["disp"][0][..., 0])

  for tag, w in evals.items():
      fr = np.stack([w.frame(i) for i in range(17)])
      sg = np.stack([w.seg(i) for i in range(17)])
      gt_med = float(np.median(w.depth(0)))
      d = np.asarray(
          depth_fn(jnp.asarray(fr[1:17]), jnp.asarray(fr[0:16]),
                   jnp.asarray(sg[1:17]))
      )
      print(
          f"[{STEPS}] {tag}: depth_med={float(np.median(d)):.1f} vs GT "
          f"{gt_med:.1f} (ratio {float(np.median(d)) / gt_med:.2f})",
          flush=True,
      )
