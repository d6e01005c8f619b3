"""Long-sequence streaming-eval profile (PLAN_R2 #7 / PLAN_R3 #6):
KITTI seq-00 scale (4,541 frames @ 128x416) through the full
flow_seg forward, single chip — throughput + device-memory profile.

The render+eval loop is CHUNKED (host frames materialized 512 at a
time) so host RSS stays bounded too; the device never holds more than
one batch of pairs (B=128 -> ~82 MB of activations per step at the
measured peak).

Usage: tools/dev/tpu_run.sh "tools/dev/exp_longseq.py [N_FRAMES]" <t> 1
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from davo_tpu.data.synthetic import SyntheticSequence
from davo_tpu.eval.runner import (
    assemble_trajectory,
    evaluate_sequence,
    make_pose_apply_fn,
)
from davo_tpu.models import presets
from davo_tpu.train.loop import create_state

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4541
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 128
CHUNK = 512  # host frames rendered/resident at a time

print("devices:", jax.devices(), flush=True)
if jax.devices()[0].platform != "tpu":
    print("REFUSING: not on TPU — a CPU-fallback number would pollute "
          "the long-sequence profile (ADVICE r2)", flush=True)
    sys.exit(2)

cfg = presets.get("davo-fast")
H, W = cfg.model.img_height, cfg.model.img_width
seq = SyntheticSequence(
    n_frames=N, height=H, width=W, plane_z=30.0, forward_speed=0.8,
    trajectory="loop", loop_roll=True, texture_mode="procedural", seed=7,
)

# Untrained params: this is a throughput/memory profile, not a metric
# run (metrics ride results_r2_e2e.json).
sample = {
    "target": np.zeros((1, H, W, 3), np.float32),
    "sources": np.zeros((1, 1, H, W, 3), np.float32),
    "seg": np.zeros((1, H, W), np.int32),
}
model, state, _ = create_state(cfg, jax.random.key(0), sample)
apply_fn = make_pose_apply_fn(model, state.params, cfg.model.attention)


def mem_stats(tag: str) -> dict:
    try:
        s = jax.local_devices()[0].memory_stats() or {}
    except Exception:
        s = {}
    out = {
        k: s.get(k)
        for k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
        if k in s
    }
    print(f"[mem {tag}] {out}", flush=True)
    return out


mem0 = mem_stats("after-init")

rels = []
t_render = 0.0
t0 = time.time()
prev_tail = None  # last frame of the previous chunk (pair overlap)
for start in range(0, N, CHUNK):
    end = min(start + CHUNK, N)
    tr0 = time.time()
    chunk = np.stack([seq.frame(i) for i in range(start, end)])
    segc = np.stack([seq.seg(i) for i in range(start, end)])
    t_render += time.time() - tr0
    if prev_tail is not None:
        frames = np.concatenate([prev_tail[0], chunk])
        segs = np.concatenate([prev_tail[1], segc])
    else:
        frames, segs = chunk, segc
    # consecutive pairs inside the (overlapped) chunk
    n_pairs = len(frames) - 1
    for b0 in range(0, n_pairs, BATCH):
        b1 = min(b0 + BATCH, n_pairs)
        # fixed-shape batches: pad the ragged tail
        tgt = frames[b0 + 1 : b1 + 1]
        src = frames[b0:b1]
        sg = segs[b0 + 1 : b1 + 1]
        pad = BATCH - (b1 - b0)
        if pad:
            tgt = np.concatenate([tgt, np.repeat(tgt[-1:], pad, 0)])
            src = np.concatenate([src, np.repeat(src[-1:], pad, 0)])
            sg = np.concatenate([sg, np.repeat(sg[-1:], pad, 0)])
        out = np.asarray(apply_fn(jnp.asarray(tgt), jnp.asarray(src),
                                  jnp.asarray(sg)))
        rels.append(out[: b1 - b0])
    prev_tail = (frames[-1:], segs[-1:])
total_s = time.time() - t0
mem1 = mem_stats("after-run")

pose_vecs = np.concatenate(rels)
assert pose_vecs.shape[0] == N - 1, pose_vecs.shape
from davo_tpu.core import geometry as geo

mats = np.asarray(geo.pose_vec_to_mat(jnp.asarray(pose_vecs, jnp.float32)))
traj = assemble_trajectory(mats)
rep = evaluate_sequence(traj, seq.poses)

device_s = total_s - t_render
report = {
    "n_frames": N,
    "total_s": round(total_s, 2),
    "host_render_s": round(t_render, 2),
    "device_s": round(device_s, 2),
    "fps_total": round((N - 1) / total_s, 1),
    "fps_device": round((N - 1) / device_s, 1),
    "peak_bytes_in_use": mem1.get("peak_bytes_in_use"),
    "bytes_limit": mem1.get("bytes_limit"),
    "eval_finite": bool(np.isfinite(rep["t_err_pct"])),
}
print(json.dumps(report), flush=True)
