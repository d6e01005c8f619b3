"""r5 followup: compose the round's ladder winners into one res128 arm.

Runs at the END of the round's chip queue (r5_followup.sh, invoked by
r5_queue3.sh once queue 2 finishes), when the decisive tiny-protocol
science arms exist:

  results_r5_quality_flowsup.json  (ladder7: flow supervision x the
                                    oracle-fixed geometric head)
  results_r5_warp_gate.json        (banded-warp quality gate)

Decision (decide(), also importable by the shell hook on CPU):

  * pose head + flow_supervision_weight: the ladder7 arm with the
    best t_err (tie-break: held-out diag_corr_ry). Composed only if
    it either beats the tiny conv anchor (27.42 — ladder5 drive_tiny,
    results_r4_quality_drive.json) by >= 1.0 t_err points or moves
    held-out rotation (corr_ry > 0.3). Otherwise this arm would just
    duplicate exp_ratchet_r5's conv recipe, so the script exits and
    the followup budget extends the ratchet instead (18k steps).
  * warp gather: same evidence rule as exp_ratchet_r5.pick_gather
    (fastest banded band within GATE_TOL of the take4 twin anchor).

Protocol: ratchet drive_res128 (davo-small 128x416, 16 drive worlds,
B=8), 8000 steps, resumable Orbax at /tmp/r5_followup_ckpt, deadline-
aware at each 1000-step checkpoint; eval on the cached 1,300-frame
seed-99 drive world. Anchors: results_r5_ratchet.json (same window)
and the r4 drive_res128 23.34 @ 2500 steps.

Usage: tools/dev/tpu_run.sh "tools/dev/exp_followup_compose.py [OUT]" 10800 3
"""

import dataclasses
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

sys.path.insert(0, "/root/repo")

OUT = (
    sys.argv[1]
    if len(sys.argv) > 1 and __name__ == "__main__"
    else "/root/repo/results_r5_followup.json"
)
LADDER7 = "/root/repo/results_r5_quality_flowsup.json"
CKPT = "/tmp/r5_followup_ckpt"
TOTAL = int(os.environ.get("DAVO_FOLLOWUP_TOTAL", "8000"))
CONV_TINY_ANCHOR = 27.42  # ladder5 drive_tiny conv head, same protocol

# ladder7 arm name -> (pose_head, flow_supervision_weight)
ARMS = {
    "flowsup_geo": ("geo_hybrid", 1.0),
    "flowsup_geo_long": ("geo_hybrid", 1.0),
    "geo_fixed": ("geo_hybrid", 0.0),
    "flowsup_conv": ("conv", 1.0),
}


def decide():
    """(head, flow_sup, winner_name, winner_eval) or None, plus why."""
    try:
        with open(LADDER7) as f:
            r = json.load(f)
    except FileNotFoundError:
        return None, "no ladder7 artifact"
    best = None
    for name, (head, fs) in ARMS.items():
        e = r.get(name)
        if not e or "t_err_pct" not in e:
            continue
        key = (e["t_err_pct"], -e.get("diag_corr_ry", 0.0))
        if best is None or key < best[0]:
            best = (key, name, head, fs, e)
    if best is None:
        return None, "ladder7 artifact has no finished arms"
    _, name, head, fs, e = best
    corr = e.get("diag_corr_ry", 0.0)
    moves_rot = corr > 0.3
    beats = e["t_err_pct"] <= CONV_TINY_ANCHOR - 1.0
    why = (
        f"winner {name} t_err {e['t_err_pct']:.2f} "
        f"(anchor {CONV_TINY_ANCHOR}) corr_ry {corr:.2f}"
    )
    if not (moves_rot or beats):
        return None, why + " — no compose-worthy signal"
    return (head, fs, name, e), why


def main():
    import jax
    import numpy as np

    from davo_tpu.config import Config, TrainConfig
    from davo_tpu.core import warp as warp_mod
    from davo_tpu.data.snippets import MultiSourceDataset
    from davo_tpu.data.synthetic import DriveSequence
    from davo_tpu.eval.runner import (
        assemble_trajectory,
        evaluate_sequence,
        make_pose_apply_fn,
        predict_sequence,
    )
    from davo_tpu.models import presets

    sys.path.insert(0, os.path.dirname(__file__))
    from exp_quality_ladder5 import (  # noqa: E402
        DRIVE_KW,
        EVAL_FRAMES,
        mat_to_euler_np,
        rot_angle,
    )
    from exp_ratchet_r5 import pick_gather  # noqa: E402

    print("devices:", jax.devices(), flush=True)
    if jax.devices()[0].platform != "tpu":
        print("REFUSING: not on TPU", flush=True)
        sys.exit(2)

    d, why = decide()
    print("decision:", d and d[:3], "|", why, flush=True)
    if d is None:
        sys.exit(0)
    head, fs, winner, _ = d

    gather, band, gwhy = pick_gather()
    warp_mod.configure(gather, band)
    print(f"gather={gather} band={band}: {gwhy}", flush=True)

    base = presets.get("davo-small")
    mcfg = dataclasses.replace(base.model, pose_head=head)
    H, W = mcfg.img_height, mcfg.img_width
    train_worlds = [
        DriveSequence(n_frames=24, height=H, width=W, seed=s, **DRIVE_KW)
        for s in range(1, 17)
    ]
    cfg = Config(
        model=mcfg,
        train=TrainConfig(
            batch_size=8, learning_rate=4e-3, lr_schedule="cosine",
            max_steps=TOTAL, pose_supervision_weight=100.0,
            rot_weight=10.0, smooth_weight=0.1,
            flow_supervision_weight=fs,
            photo_masking="border", depth_warmup_steps=250,
            grad_clip_norm=10.0 if head == "geo_hybrid" else 0.0,
            log_every=250,
            warp_gather=gather, warp_band=band,
        ),
    )
    ds = MultiSourceDataset(
        train_worlds, batch_size=8, with_seg=True, with_gt=True,
        with_flow=fs > 0.0, augment="color", seed=0,
    )
    from davo_tpu.train.loop import (
        create_state,
        make_checkpoint_manager,
        make_train_step,
        restore_checkpoint,
        save_checkpoint,
    )

    it = ds.batches(steps=None)
    first = next(it)
    model, state, tx = create_state(cfg, jax.random.key(0), first)
    mngr = make_checkpoint_manager(CKPT)
    restored = restore_checkpoint(mngr, state)
    if restored is not None:
        state = restored
    s0 = int(state.step)
    print(f"composing {winner} -> res128: head={head} flow_sup={fs}; "
          f"starting at step {s0}/{TOTAL}", flush=True)

    step_fn = make_train_step(model, tx, cfg)
    batch = first
    t0 = time.time()
    ddl = os.environ.get("DAVO_ARM_DEADLINE_UTC", "2000")
    done = s0
    for i in range(s0, TOTAL):
        state, metrics = step_fn(state, batch)
        done = i + 1
        if done % 250 == 0:
            print(
                f"  step {done}: total={float(metrics['total']):.4f} "
                f"pose_sup={float(metrics.get('pose_sup', np.nan)):.5f} "
                f"flow_sup={float(metrics.get('flow_sup', np.nan)):.4f} "
                f"({(done - s0) / (time.time() - t0):.2f} steps/s)",
                flush=True,
            )
        if done % 1000 == 0:
            save_checkpoint(mngr, state)
            if time.strftime("%H%M", time.gmtime()) >= ddl:
                print(f"deadline {ddl}Z: eval at step {done}",
                      flush=True)
                break
        batch = next(it)
    save_checkpoint(mngr, state)
    mngr.wait_until_finished()
    train_s = time.time() - t0

    from probe_common import cached_eval_world

    frames, segs, gt, eval_K = cached_eval_world(
        "drive", 99, EVAL_FRAMES, H, W, DRIVE_KW
    )
    apply_kw = {"K": eval_K} if head == "geo_hybrid" else {}
    apply_fn = make_pose_apply_fn(
        model, state.params, "flow_seg", **apply_kw
    )
    rels = np.asarray(
        predict_sequence(apply_fn, frames, seg=segs, batch_size=64)
    )
    pred = assemble_trajectory(rels)
    ev = evaluate_sequence(pred, gt)
    ev["train_s_final_segment"] = train_s
    ev["gather"] = f"{gather}{band if gather == 'banded' else ''}"
    ev["steps"] = done
    ev["pose_head"] = head
    ev["flow_supervision_weight"] = fs
    ev["composed_from"] = winner

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

    res = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            res = json.load(f)
    res[f"compose_{head}_fs{fs:g}_{done}"] = ev
    with open(OUT + ".tmp", "w") as f:
        json.dump(res, f, indent=1, default=float)
        f.write("\n")
    os.replace(OUT + ".tmp", OUT)
    print(
        f"COMPOSE: t_err {ev['t_err_pct']:.2f} %  "
        f"r_err {ev['r_err_deg_per_100m']:.2f}  "
        f"snippet {ev['snippet_ate_mean']:.3f}  "
        f"rot_corr ry {ev['diag_corr_ry']:.3f}",
        flush=True,
    )
    print("->", OUT, flush=True)


if __name__ == "__main__":
    main()
