"""The in-repo segmentation source (SURVEY.md R8 / §7.2 risk item).

The reference consumes precomputed DeepLab masks it cannot produce;
this stack trains SegNetLite on synthetic GT labels and stamps
`*_seg.png` onto prepared trees. Tests: (a) the net learns (held-out
viewpoints of training worlds — synthetic static labels are Voronoi
cells independent of appearance, so cross-world eval is meaningless by
construction); (b) ckpt round-trip; (c) the prep annotator makes a
seg-less prepared tree flow_seg-trainable end to end.
"""

import numpy as np

from davo_tpu.data.synthetic import SyntheticSequence


def _tiny_segnet(tmp_path, steps=150):
    from davo_tpu.models.segnet import save_segnet
    from davo_tpu.train.seg import train_segnet

    model, params, metrics = train_segnet(
        steps=steps,
        batch_size=4,
        height=48,
        width=64,
        n_worlds=2,
        frames_per_world=6,
        channels=(8, 16, 32),
        log_every=0,
    )
    ckpt = tmp_path / "segnet"
    save_segnet(str(ckpt), model, params)
    return ckpt, metrics


def test_segnet_learns_and_roundtrips(tmp_path):
    from davo_tpu.models.segnet import make_seg_infer

    ckpt, metrics = _tiny_segnet(tmp_path)
    # Majority-class floor on these worlds is well under 0.35; the net
    # must beat it by memorizing region appearance across viewpoints.
    assert metrics["eval_pixel_acc"] > 0.45, metrics
    assert metrics["eval_classes_present"] >= 4

    infer = make_seg_infer(str(ckpt))
    seq = SyntheticSequence(n_frames=3, height=48, width=64, seed=0,
                            n_dynamic=2)
    img = np.stack([seq.frame(i) for i in range(3)]).astype(np.float32)
    lab = np.asarray(infer(img))
    assert lab.shape == (3, 48, 64)
    assert lab.dtype == np.uint8
    # Restored net == trained net on training-world frames.
    gt = np.stack([seq.seg(i) for i in range(3)])
    assert (lab == gt).mean() > 0.45


def test_prep_write_seg_enables_flow_seg(tmp_path):
    """A prepared tree without masks + the repo's own segnet ->
    flow_seg trains from it (VERDICT r2 missing #4 closed)."""
    import cv2

    from davo_tpu.data.kitti import format_poses_kitti
    from davo_tpu.data.prep import (
        PreparedSnippets,
        annotate_prepared_seg,
        prepare_kitti_odometry,
    )
    from davo_tpu.models.segnet import make_seg_infer

    ckpt, _ = _tiny_segnet(tmp_path, steps=30)

    # KITTI tree WITHOUT a seg/ dir -> prepared tree has no masks.
    seq = SyntheticSequence(n_frames=6, height=48, width=64, seed=3)
    root = tmp_path / "kitti"
    img_dir = root / "sequences" / "00" / "image_2"
    img_dir.mkdir(parents=True)
    for i in range(6):
        cv2.imwrite(
            str(img_dir / f"{i:06d}.png"),
            cv2.cvtColor(
                (seq.frame(i) * 255).astype(np.uint8), cv2.COLOR_RGB2BGR
            ),
        )
    K = seq.K
    calib = " ".join(
        str(v) for v in np.hstack([K, np.zeros((3, 1))]).ravel()
    )
    (root / "sequences" / "00" / "calib.txt").write_text(f"P2: {calib}\n")
    (root / "poses").mkdir()
    (root / "poses" / "00.txt").write_text(format_poses_kitti(seq.poses))

    out = tmp_path / "prepared"
    prepare_kitti_odometry(
        str(root), str(out), height=48, width=64,
        seqs=("00",), num_workers=1, val_fraction=0.25,
    )
    assert not PreparedSnippets(str(out), split="train").has_seg

    n = annotate_prepared_seg(
        str(out), make_seg_infer(str(ckpt)), batch_size=2
    )
    assert n == 4  # frames 1..4

    ds = PreparedSnippets(str(out), split="train")
    assert ds.has_seg
    batch = next(ds.batches(batch_size=min(2, len(ds)), steps=1))
    assert batch["seg"].shape[1:] == (48, 64)
    assert batch["seg"].min() >= 0 and batch["seg"].max() < 19

    # The flagship model trains a step from the self-annotated tree.
    import jax

    from davo_tpu.config import Config, ModelConfig, TrainConfig
    from davo_tpu.train.loop import create_state, make_train_step

    cfg = Config(
        model=ModelConfig(
            img_height=48, img_width=64,
            pose_channels=(8, 12, 16), disp_channels=(8, 12, 16),
            flow_levels=3, flow_search_range=2, attention="flow_seg",
            compute_dtype="float32",
        ),
        train=TrainConfig(batch_size=2, max_steps=1),
    )
    model, state, tx = create_state(cfg, jax.random.key(0), batch)
    step = make_train_step(model, tx, cfg)
    state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics["total"]))
