"""Quality ladder 4b: the GENERALIZATION axis on wander worlds.

Ladder 4's first arm exposed a new, sharper failure mode than the r3
floor: on rotation-identifiable wander worlds, supervised training on
16 tiny worlds reaches t_err ~30 % with per-axis pred-vs-GT rotation
correlation ~0 on the HELD-OUT eval world — while the convention
micro-test (exp_rot_convention) hits corr 0.96 when overfitting one
world. The stack can represent and learn rotation; it does not
GENERALIZE it from 16x24 = 384 training frames. The suspects are
data scale and within-world trajectory diversity, tested here:

  worlds128       128 train worlds (8x data diversity)
  frames96        16 worlds x 96 frames (4x within-world rotation
                  variety per texture)
  worlds128_f96   both (32x frames total)

Protocol == ladder 4 (tiny preset, 2500 steps, same 1,300-frame
seed-99 eval world, same diagnostics). If per-axis corr rises with
data, the r4 floor is a DATA budget, not a model defect — and the
res128 + data arm becomes the ratchet candidate.

Usage: tools/dev/tpu_run.sh "tools/dev/exp_quality_ladder4b.py [OUT]" 21600 3
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

from davo_tpu.config import Config, TrainConfig
from davo_tpu.data.snippets import MultiSourceDataset
from davo_tpu.data.synthetic import SyntheticSequence
from davo_tpu.eval.runner import (
    assemble_trajectory,
    evaluate_sequence,
    make_pose_apply_fn,
    predict_sequence,
)
from davo_tpu.models import presets

sys.path.insert(0, os.path.dirname(__file__))
from exp_quality_ladder4 import (  # noqa: E402
    EVAL_FRAMES,
    WANDER_KW,
    mat_to_euler_np,
    rot_angle,
)

OUT = (
    sys.argv[1]
    if len(sys.argv) > 1
    else "/root/repo/results_r4_quality_gen.json"
)


def run_arm(preset="tiny", steps=2500, batch=16, n_worlds=16,
            n_frames=24, infinite=False):
    base = presets.get(preset)
    H, W = base.model.img_height, base.model.img_width
    train_worlds = [
        SyntheticSequence(n_frames=n_frames, height=H, width=W, seed=s,
                          **WANDER_KW)
        for s in range(1, n_worlds + 1)
    ]
    from probe_common import cached_eval_world

    frames, segs, gt, _K = cached_eval_world(
        "wander", 99, EVAL_FRAMES, H, W, WANDER_KW
    )

    cfg = Config(
        model=base.model,
        train=TrainConfig(
            batch_size=batch, learning_rate=4e-3, lr_schedule="cosine",
            max_steps=steps, pose_supervision_weight=100.0,
            rot_weight=10.0, smooth_weight=0.1,
            photo_masking="border", depth_warmup_steps=250,
            warp_gather="take4",  # pin the r4 anchor protocol
            log_every=max(steps // 8, 1),
        ),
    )
    if infinite:
        # Never-repeating world stream (data/snippets.py
        # ProceduralWorldsDataset): memorization impossible — the
        # clean test of "rotation is readable but not generalized
        # from a finite world set". seeds start above the eval
        # world's (99) and the fixed train range.
        from davo_tpu.data.snippets import ProceduralWorldsDataset

        ds = ProceduralWorldsDataset(
            lambda s: SyntheticSequence(
                n_frames=n_frames, height=H, width=W,
                seed=1000 + s % 1000003, **WANDER_KW
            ),
            batch_size=batch, with_seg=True, with_gt=True,
            augment="color", seed=0, pool_size=16,
        )
    else:
        ds = MultiSourceDataset(
            train_worlds, batch_size=batch, with_seg=True, with_gt=True,
            augment="color", seed=0,
        )
    from davo_tpu.train.loop import fit

    t0 = time.time()
    model, state, _ = fit(
        cfg, ds.batches(steps=steps),
        log_fn=lambda s, m: print(
            f"  step {s}: total={m.get('total', float('nan')):.4f} "
            f"pose_sup={m.get('pose_sup', float('nan')):.5f}",
            flush=True,
        ),
    )
    apply_fn = make_pose_apply_fn(model, state.params, "flow_seg")
    rels = np.asarray(
        predict_sequence(apply_fn, frames, seg=segs, batch_size=64)
    )
    pred = assemble_trajectory(rels)
    ev = evaluate_sequence(pred, gt)
    ev["train_s"] = time.time() - t0

    # Memorization-vs-readability diagnostic: rotation corr on a LONG
    # seed-1 world — same texture family as a train world, trajectory
    # beyond the 24 trained frames. High corr here + low corr on
    # seed-99 = texture-shortcut memorization; low corr on both =
    # rotation cue not generalizing at all.
    tw_frames, tw_segs, tw_gt_poses, _ = cached_eval_world(
        "wander", 1, 400, H, W, WANDER_KW
    )
    tw_rels = np.asarray(
        predict_sequence(apply_fn, tw_frames, seg=tw_segs,
                         batch_size=64)
    )
    tw_gt = tw_gt_poses
    tw_gt_rels = np.stack(
        [np.linalg.inv(tw_gt[i]) @ tw_gt[i + 1]
         for i in range(len(tw_gt) - 1)]
    )
    te = mat_to_euler_np(tw_rels[:, :3, :3])
    ge = mat_to_euler_np(tw_gt_rels[:, :3, :3])
    for k, name in enumerate(("rx", "ry", "rz")):
        ev[f"diag_tw_corr_{name}"] = float(
            np.corrcoef(te[:, k], ge[:, k])[0, 1]
        )
    print(
        "  train-world diag: rx {diag_tw_corr_rx:.2f} "
        "ry {diag_tw_corr_ry:.2f} rz {diag_tw_corr_rz:.2f}".format(**ev),
        flush=True,
    )

    gt_rels = np.stack(
        [np.linalg.inv(gt[i]) @ gt[i + 1] for i in range(len(gt) - 1)]
    )
    pred_eul = mat_to_euler_np(rels[:, :3, :3])
    gt_eul = mat_to_euler_np(gt_rels[:, :3, :3])
    for k, name in enumerate(("rx", "ry", "rz")):
        ev[f"diag_corr_{name}"] = float(
            np.corrcoef(pred_eul[:, k], gt_eul[:, k])[0, 1]
        )
    pr_ang, gt_ang = rot_angle(rels), rot_angle(gt_rels)
    ev["diag_rot_corr"] = float(np.corrcoef(pr_ang, gt_ang)[0, 1])
    ev["diag_rot_ratio_mean"] = float(np.mean(pr_ang / (gt_ang + 1e-9)))
    print(
        "  diag: rot-corr {diag_rot_corr:.3f} (rx {diag_corr_rx:.2f} "
        "ry {diag_corr_ry:.2f} rz {diag_corr_rz:.2f}) ratio "
        "{diag_rot_ratio_mean:.3f}".format(**ev),
        flush=True,
    )
    return ev


def main():
    print("devices:", jax.devices(), flush=True)
    if jax.devices()[0].platform != "tpu":
        print("REFUSING: not on TPU", flush=True)
        sys.exit(2)
    res = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            res = json.load(f)

    def arm(name, fn):
        ddl = os.environ.get("DAVO_ARM_DEADLINE_UTC", "0615")
        if time.strftime("%H%M", time.gmtime()) >= ddl:
            print(f"deadline {ddl}Z passed; skipping arm {name} "
                  "(clean exit keeps the chip claim healthy)",
                  flush=True)
            return
        if name in res:
            print(f"{name}: done previously "
                  f"(t_err {res[name]['t_err_pct']:.2f})", flush=True)
            return
        print(f"=== arm {name} ===", flush=True)
        res[name] = fn()
        with open(OUT + ".tmp", "w") as f:
            json.dump(res, f, indent=1, default=float)
            f.write("\n")
        os.replace(OUT + ".tmp", OUT)
        e = res[name]
        print(
            f"{name}: t_err {e['t_err_pct']:.2f} %  "
            f"r_err {e['r_err_deg_per_100m']:.2f}  "
            f"snippet {e['snippet_ate_mean']:.3f}  "
            f"rot_corr {e['diag_rot_corr']:.3f}  ({e['train_s']:.0f}s)",
            flush=True,
        )

    # r5 order: the never-repeating stream FIRST — it is the decisive
    # arm for the memorization-vs-readability hypothesis (VERDICT r4
    # missing #2). The finite-data sweep is trimmed to ONE datapoint
    # (worlds128) for the r5 chip budget: the infinite arms ARE the
    # asymptote of that axis, so the fine-grained finite curve
    # (frames96, worlds128_f96[_long]) only matters if infinite and
    # finite DISAGREE — re-add from git history in that case.
    # worlds128 (the finite datapoint) before infinite_long: ladder7
    # measured the steps axis non-monotone at tiny res, so the 6k arm
    # is the first cut when the wall clock bites (r5 session 3).
    arm("infinite", lambda: run_arm(infinite=True))
    arm("worlds128", lambda: run_arm(n_worlds=128))
    arm("infinite_long", lambda: run_arm(infinite=True, steps=6000))
    print("ladder4b ->", OUT, flush=True)


if __name__ == "__main__":
    main()
