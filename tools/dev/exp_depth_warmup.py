"""Depth warm-up validation in the e2e failing regime (16 radius-
spread loop-roll worlds, B=16, supervised): track depth_med DURING
training, warmup on vs off.

CPU: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python \
    tools/dev/exp_depth_warmup.py [STEPS] [warmups,comma] [masking]
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
from davo_tpu.train.loop import create_state, make_train_step

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 800
WARMUPS = (
    [int(v) for v in sys.argv[2].split(",")] if len(sys.argv) > 2
    else [0, 250]
)
MASKING = sys.argv[3] if len(sys.argv) > 3 else "border"
# argv[4] == "fullres": Monodepth2-style full-res multi-scale sampling.
FULLRES = len(sys.argv) > 4 and sys.argv[4] == "fullres"

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
ev = worlds[0]
fr = jnp.asarray(np.stack([ev.frame(i) for i in range(9)]))
sg = jnp.asarray(np.stack([ev.seg(i) for i in range(9)]))
gt_med = float(np.median(ev.depth(0)))

for warmup in WARMUPS:
    cfg = Config(
        model=base.model,
        train=TrainConfig(
            batch_size=16, learning_rate=4e-3, lr_schedule="cosine",
            max_steps=STEPS, pose_supervision_weight=100.0,
            smooth_weight=0.1, depth_warmup_steps=warmup,
            photo_masking=MASKING, photo_fullres=FULLRES,
            log_every=max(STEPS // 8, 1),
        ),
    )
    ds = MultiSourceDataset(
        worlds, batch_size=16, with_seg=True, with_gt=True,
        augment="color", seed=0,
    )
    it = ds.batches(steps=STEPS)
    first = next(it)
    model, state, tx = create_state(cfg, jax.random.key(0), first)
    step_fn = make_train_step(model, tx, cfg)

    @jax.jit
    def depth_fn(params):
        out = model.apply(params, fr[1:9], fr[0:8][:, None], seg=sg[1:9],
                          train=True)
        return jnp.median(disp_to_depth(out["disp"][0][..., 0]))

    batch = first
    for i in range(STEPS):
        state, metrics = step_fn(state, batch)
        if (i + 1) % max(STEPS // 16, 1) == 0 or i == 0:
            dm = float(depth_fn(state.params))
            print(
                f"[{MASKING}{'+fullres' if FULLRES else ''} wu={warmup}] step {i + 1}: depth_med={dm:.1f} "
                f"photo={float(metrics['photo']):.4f} "
                f"pose_sup={float(metrics.get('pose_sup', 0.0)):.4f} "
                f"smooth={float(metrics['smooth']):.6f}",
                flush=True,
            )
        try:
            batch = next(it)
        except StopIteration:
            break
    dm = float(depth_fn(state.params))
    print(
        f"[{MASKING}{'+fullres' if FULLRES else ''} wu={warmup}] FINAL depth_med={dm:.1f} vs GT {gt_med:.1f} "
        f"(ratio {dm / gt_med:.2f})",
        flush=True,
    )
