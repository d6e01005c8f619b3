"""Training-step throughput profile (flagship config, real chip).

Inference is profiled to death (R2_RESULTS); the TRAIN step (forward +
backward + Adam) has only incidental steps/s logs from e2e runs. This
measures it properly: ms/step and frames/s across batch sizes and
attention variants, remat on/off (HBM/FLOP trade), using the repo
timing protocol (min over >= 5 loops, one jitted program; hand-rolled
here because the step donates + chains state, which `timed` cannot).

Usage: tools/dev/tpu_run.sh tools/dev/exp_train_prof.py <timeout> 1
       argv: [IMG_H] [IMG_W] (default 128 416)
"""

import dataclasses
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from probe_common import compile_error_summary  # noqa: E402

from davo_tpu.config import Config, ModelConfig, TrainConfig
from davo_tpu.train.loop import create_state, make_train_step

H = int(sys.argv[1]) if len(sys.argv) > 1 else 128
W = int(sys.argv[2]) if len(sys.argv) > 2 else 416
# argv[3] == "smoke": tiny channels so the harness plumbing can be
# validated on CPU (the flagship backward takes minutes/step there).
SMOKE = len(sys.argv) > 3 and sys.argv[3] == "smoke"
TINY_KW = dict(
    pose_channels=(8, 12, 16), disp_channels=(8, 12, 16),
    flow_levels=2, flow_search_range=2, compute_dtype="float32",
)


def bench(tag, model_kw, batch, remat=False, sup=0.0):
    if SMOKE:
        model_kw = {**TINY_KW, **model_kw}
    cfg = Config(
        model=ModelConfig(img_height=H, img_width=W, **model_kw),
        train=TrainConfig(
            batch_size=batch, pose_supervision_weight=sup, remat=remat,
            smooth_weight=0.1,
        ),
    )
    rng = np.random.default_rng(0)
    b = {
        "target": jnp.asarray(
            rng.uniform(size=(batch, H, W, 3)), jnp.float32
        ),
        "sources": jnp.asarray(
            rng.uniform(size=(batch, 2, H, W, 3)), jnp.float32
        ),
        "K": jnp.asarray(
            np.tile(
                np.array([[120.0, 0, W / 2], [0, 120.0, H / 2], [0, 0, 1]],
                         np.float32),
                (batch, 1, 1),
            )
        ),
    }
    if cfg.model.attention == "flow_seg":
        b["seg"] = jnp.asarray(
            rng.integers(0, 19, (batch, H, W)), jnp.int32
        )
    if sup > 0:
        b["gt_pose"] = jnp.asarray(
            np.tile(np.eye(4, dtype=np.float32), (batch, 2, 1, 1))
        )
    model, state, tx = create_state(cfg, jax.random.key(0), b)
    step = make_train_step(model, tx, cfg)

    # The step donates state; time with a fresh state each call is
    # wrong (H2D in the loop) — instead chain states like real training.
    def run(state_in, batch_in):
        s, m = step(state_in, batch_in)
        return s

    state = run(state, b)
    jax.block_until_ready(state.params)
    import time

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(8):
            state = run(state, b)
        jax.block_until_ready(state.params)
        times.append((time.perf_counter() - t0) / 8)
    ms = min(times) * 1000.0
    print(
        f"{tag:<44} {ms:8.2f} ms/step  {batch / ms * 1000:7.0f} frames/s",
        flush=True,
    )
    return ms


def main():
    print("devices:", jax.devices(), flush=True)
    if jax.devices()[0].platform != "tpu":
        print("REFUSING: not on TPU (training-throughput numbers must "
              "be chip numbers — ADVICE r2)", flush=True)
        sys.exit(2)
    full = dict(attention="flow_seg")
    if SMOKE:
        bench("smoke flow_seg B=2", full, 2)
        bench("smoke B=2 remat+sup", full, 2, remat=True, sup=100.0)
        bench(
            "smoke B=2 fuse_est_train",
            dict(attention="flow_seg", fuse_estimator_train=True), 2,
        )
        bench(
            "smoke B=2 fuse_level_train",
            dict(attention="flow_seg", fuse_flow_level_train=True), 2,
        )
        bench(
            "smoke B=2 ALL fused train",
            dict(
                attention="flow_seg", fuse_flow_level_train=True,
                fuse_pyramid_train=True, fuse_pose_encoder_train=True,
                fuse_attention_train=True, fuse_disp_encoder_train=True,
            ),
            2,
        )
        return
    fast = dict(
        attention="flow_seg", costvol_feat_channels=8, flow_search_range=3
    )
    for batch in (8, 16, 32):
        bench(f"davo B={batch} photometric", full, batch)
    bench("davo B=16 + remat", full, 16, remat=True)
    bench("davo B=16 supervised", full, 16, sup=100.0)
    bench("davo-fast B=16 photometric", fast, 16)
    bench("attention=none B=16", dict(attention="none"), 16, sup=100.0)
    # Trainable fused estimator (hand-written Pallas VJP): fwd+bwd of
    # all estimator chains each as one kernel. Independent try — a
    # Mosaic rejection must not kill the sweep.
    try:
        bench(
            "davo B=16 fuse_estimator_train",
            dict(attention="flow_seg", fuse_estimator_train=True), 16,
        )
        bench(
            "davo-fast B=16 fuse_est_train",
            {**fast, "fuse_estimator_train": True}, 16,
        )
    except Exception as e:
        print(f"fuse_estimator_train FAILED: {compile_error_summary(e)}", flush=True)
    # Whole-flow-level training fusion (costvol bwd included).
    try:
        bench(
            "davo B=16 fuse_flow_level_train",
            dict(attention="flow_seg", fuse_flow_level_train=True), 16,
        )
        bench(
            "davo-fast B=16 fuse_level_train",
            {**fast, "fuse_flow_level_train": True}, 16,
        )
    except Exception as e:
        print(f"fuse_flow_level_train FAILED: {compile_error_summary(e)}", flush=True)
    # Everything-fused training: flow levels + pyramid + pose encoder
    # + attention, all via hand-written VJPs.
    all_train = dict(
        fuse_flow_level_train=True, fuse_pyramid_train=True,
        fuse_pose_encoder_train=True, fuse_attention_train=True,
        fuse_disp_encoder_train=True,
    )
    try:
        bench(
            "davo-fast B=16 ALL fused train",
            {**fast, **all_train}, 16,
        )
    except Exception as e:
        print(f"all-fused train FAILED: {compile_error_summary(e)}", flush=True)
    # remat headroom: find the largest batch that fits each way.
    for batch in (64, 128):
        for remat in (False, True):
            try:
                bench(f"davo B={batch} remat={remat}", full, batch,
                      remat=remat)
            except Exception as e:
                print(f"davo B={batch} remat={remat}: OOM/err "
                      f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
