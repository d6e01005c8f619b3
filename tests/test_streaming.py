"""Context-parallel streaming eval + offline prep tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from davo_tpu.config import Config, ModelConfig, TrainConfig
from davo_tpu.data.synthetic import SyntheticSequence
from davo_tpu.dist.mesh import make_mesh
from davo_tpu.dist.streaming import make_streaming_eval, pad_pairs
from davo_tpu.eval.runner import assemble_trajectory, predict_sequence
from davo_tpu.train.loop import create_state

TINY = ModelConfig(
    img_height=32, img_width=32,
    pose_channels=(8, 12), disp_channels=(8, 12),
    flow_levels=2, flow_search_range=2,
    attention="none", pose_scale=1.0, compute_dtype="float32",
)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
class TestStreamingEval:
    def test_matches_host_loop(self):
        """Sharded streaming (chunks + in-jit associative scan) must
        equal the single-device predict_sequence + host assembly."""
        seq = SyntheticSequence(n_frames=18, height=32, width=32, seed=4)
        frames = np.stack([seq.frame(i) for i in range(len(seq))])
        cfg = Config(model=TINY, train=TrainConfig(batch_size=4))
        sample = {
            "target": frames[:4],
            "sources": frames[:4][:, None],
            "K": np.eye(3, dtype=np.float32)[None].repeat(4, 0),
        }
        model, state, _ = create_state(cfg, jax.random.key(0), sample)

        # Host-loop reference.
        @jax.jit
        def apply_fn(t, s, g=None):
            out = model.apply(state.params, t, s[:, None], train=False)
            return out["poses"][:, 0]

        rels = predict_sequence(apply_fn, frames, batch_size=4)
        want = assemble_trajectory(rels)

        # Sharded streaming (17 pairs -> pad to 24 = 8*3).
        mesh = make_mesh()
        padded, n_pairs = pad_pairs(frames, mesh.shape["data"])
        stream = make_streaming_eval(model, state.params, mesh)
        poses, vecs = stream(padded)
        got = poses[: n_pairs + 1]
        np.testing.assert_allclose(got, want, atol=2e-4)

    @pytest.mark.slow
    def test_long_sequence(self):
        """KITTI-seq-00-scale capability check: a 1,025-frame sequence
        (1,024 pairs = 128/chip on 8 devices) streams through one
        sharded program; trajectory length and finiteness pinned."""
        seq = SyntheticSequence(
            n_frames=1025, height=32, width=32, seed=12,
            forward_speed=0.05, jitter=0.005,  # stay on the plane
        )
        frames = np.stack([seq.frame(i) for i in range(len(seq))])
        cfg = Config(model=TINY, train=TrainConfig(batch_size=4))
        sample = {
            "target": frames[:4],
            "sources": frames[:4][:, None],
            "K": np.eye(3, dtype=np.float32)[None].repeat(4, 0),
        }
        model, state, _ = create_state(cfg, jax.random.key(0), sample)
        mesh = make_mesh()
        stream = make_streaming_eval(model, state.params, mesh)
        poses, vecs = stream(frames)
        assert poses.shape == (1025, 4, 4)
        assert vecs.shape == (1024, 6)
        assert np.all(np.isfinite(poses))
        # Rotations stay orthonormal through 1k compositions (f32 scan).
        R = poses[-1, :3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)

    def test_pad_pairs(self):
        frames = np.zeros((18, 4, 4, 3), np.float32)
        padded, n = pad_pairs(frames, 8)
        assert n == 17
        assert (len(padded) - 1) % 8 == 0


class TestOfflinePrep:
    def test_roundtrip(self, tmp_path):
        """Write a KITTI tree, run prep, read back via PreparedSnippets."""
        import cv2

        from davo_tpu.data.kitti import format_poses_kitti
        from davo_tpu.data.prep import PreparedSnippets, prepare_kitti_odometry

        seq = SyntheticSequence(n_frames=6, height=48, width=64, seed=0)
        root = tmp_path / "kitti"
        img_dir = root / "sequences" / "00" / "image_2"
        seg_dir = root / "sequences" / "00" / "seg"
        img_dir.mkdir(parents=True)
        seg_dir.mkdir(parents=True)
        for i in range(6):
            cv2.imwrite(
                str(img_dir / f"{i:06d}.png"),
                cv2.cvtColor(
                    (seq.frame(i) * 255).astype(np.uint8), cv2.COLOR_RGB2BGR
                ),
            )
            cv2.imwrite(
                str(seg_dir / f"{i:06d}.png"),
                seq.seg(i).astype(np.uint8),
            )
        K = seq.K
        calib = " ".join(
            str(v) for v in np.hstack([K, np.zeros((3, 1))]).ravel()
        )
        (root / "sequences" / "00" / "calib.txt").write_text(f"P2: {calib}\n")
        (root / "poses").mkdir()
        (root / "poses" / "00.txt").write_text(format_poses_kitti(seq.poses))

        out = tmp_path / "prepared"
        counts = prepare_kitti_odometry(
            str(root), str(out), height=24, width=32,
            seqs=("00",), num_workers=1, val_fraction=0.25,
        )
        assert counts["train"] + counts["val"] == 4  # frames 1..4

        ds = PreparedSnippets(str(out), split="train")
        assert len(ds) == counts["train"]
        assert ds.has_seg  # seg/ dir rode into the prepared layout
        batch = next(ds.batches(batch_size=min(2, len(ds)), steps=1))
        assert batch["target"].shape[1:] == (24, 32, 3)
        assert batch["sources"].shape[1:] == (2, 24, 32, 3)
        assert batch["K"].shape[1:] == (3, 3)
        # Seg labels round-trip losslessly at the target frame: item
        # names encode the frame index (<seq>_<t>), so compare against
        # the source world's nearest-resized labels directly.
        assert batch["seg"].shape[1:] == (24, 32)
        name0 = sorted(ds.names)[0]
        t0 = int(name0.split("_")[1])
        item = ds.load(name0)
        want = cv2.resize(
            seq.seg(t0).astype(np.uint8), (32, 24),
            interpolation=cv2.INTER_NEAREST,
        )
        np.testing.assert_array_equal(item["seg"], want.astype(np.int32))
        # GT warp transforms ride too (supervised tier from prepared
        # data): target->past and target->future, model convention —
        # must equal the synthetic world's exact warp_pose.
        assert ds.has_gt and batch["gt_pose"].shape[1:] == (2, 4, 4)
        np.testing.assert_allclose(
            item["gt_pose"][0], seq.warp_pose(t0, t0 - 1), atol=1e-5
        )
        np.testing.assert_allclose(
            item["gt_pose"][1], seq.warp_pose(t0, t0 + 1), atol=1e-5
        )

    def test_raw_roundtrip(self, tmp_path):
        """KITTI *raw* layout (R11 kitti_raw_loader parity): drives +
        calib_cam_to_cam + oxts; static frames dropped by GPS speed;
        prepared set reads back with correct shapes and K."""
        import cv2

        from davo_tpu.data.kitti import KittiRaw
        from davo_tpu.data.prep import PreparedSnippets, prepare_kitti_raw

        seq = SyntheticSequence(n_frames=8, height=48, width=64, seed=1)
        root = tmp_path / "raw"
        date = "2011_09_26"
        ddir = root / date / f"{date}_drive_0001_sync"
        img_dir = ddir / "image_02" / "data"
        oxts_dir = ddir / "oxts" / "data"
        img_dir.mkdir(parents=True)
        oxts_dir.mkdir(parents=True)
        for i in range(8):
            cv2.imwrite(
                str(img_dir / f"{i:010d}.png"),
                cv2.cvtColor(
                    (seq.frame(i) * 255).astype(np.uint8), cv2.COLOR_RGB2BGR
                ),
            )
            # oxts row: lat lon alt roll pitch yaw vn ve ... — frames
            # 0-2 are static (speed 0), the rest drive at 5 m/s.
            vn = 0.0 if i < 3 else 3.0
            ve = 0.0 if i < 3 else 4.0
            (oxts_dir / f"{i:010d}.txt").write_text(
                f"49.0 8.4 112.0 0.0 0.0 0.0 {vn} {ve} 5.0 0.0 0.0\n"
            )
        K = seq.K
        p02 = " ".join(str(v) for v in np.hstack([K, np.zeros((3, 1))]).ravel())
        (root / date / "calib_cam_to_cam.txt").write_text(
            "calib_time: 09-Jan-2012 13:57:47\n"
            "S_00: 1.392000e+03 5.120000e+02\n"
            f"P_rect_02: {p02}\n"
        )

        assert KittiRaw.list_drives(str(root)) == [(date, "0001")]
        kr = KittiRaw(str(root), date, "0001")
        assert len(kr) == 8
        np.testing.assert_allclose(kr.K, K, atol=1e-6)
        sp = kr.speeds()
        assert sp is not None and sp[0] == 0.0 and sp[4] == 5.0

        out = tmp_path / "prepared_raw"
        counts = prepare_kitti_raw(
            str(root), str(out), height=24, width=32,
            num_workers=1, val_fraction=0.0, min_speed=1.0,
        )
        # Triplets at t=1..6; t in {1,2,3} touch a static frame -> only
        # t=4,5,6 survive.
        assert counts["train"] == 3 and counts["static_dropped"] == 3

        ds = PreparedSnippets(str(out), split="train")
        batch = next(ds.batches(batch_size=3, steps=1))
        assert batch["target"].shape == (3, 24, 32, 3)
        assert batch["sources"].shape == (3, 2, 24, 32, 3)
        # K followed the resize: fx scaled by 32/64, fy by 24/48.
        np.testing.assert_allclose(
            batch["K"][0][0, 0], K[0, 0] * 32 / 64, rtol=1e-6
        )

    def test_cityscapes_roundtrip(self, tmp_path):
        """Cityscapes leftImg8bit_sequence layout (R11 optional source):
        adapter lists groups, reads camera.json intrinsics; prep writes
        triplets that read back with K scaled."""
        import cv2
        import json as _json

        from davo_tpu.data.kitti import CityscapesSeq
        from davo_tpu.data.prep import PreparedSnippets, prepare_cityscapes

        seq = SyntheticSequence(n_frames=5, height=48, width=64, seed=2)
        root = tmp_path / "cs"
        city, sid = "aachen", "000001"
        img_dir = root / "leftImg8bit_sequence" / "train" / city
        cam_dir = root / "camera" / "train" / city
        img_dir.mkdir(parents=True)
        cam_dir.mkdir(parents=True)
        K = seq.K
        for i in range(5):
            stem = f"{city}_{sid}_{i:06d}"
            cv2.imwrite(
                str(img_dir / (stem + "_leftImg8bit.png")),
                cv2.cvtColor(
                    (seq.frame(i) * 255).astype(np.uint8), cv2.COLOR_RGB2BGR
                ),
            )
            # Like the real camera package: ONE json per sequence
            # group, for an annotated mid-group frame — NOT frame 0.
            if i == 3:
                (cam_dir / (stem + "_camera.json")).write_text(
                    _json.dumps({"intrinsic": {
                        "fx": float(K[0, 0]), "fy": float(K[1, 1]),
                        "u0": float(K[0, 2]), "v0": float(K[1, 2]),
                    }})
                )

        assert CityscapesSeq.list_sequences(str(root)) == [(city, sid)]
        cs = CityscapesSeq(str(root), "train", city, sid)
        assert len(cs) == 5
        np.testing.assert_allclose(cs.K, K, atol=1e-6)

        out = tmp_path / "prepared_cs"
        counts = prepare_cityscapes(
            str(root), str(out), height=24, width=32,
            num_workers=1, val_fraction=0.0,
        )
        assert counts["train"] == 3  # t = 1..3

        ds = PreparedSnippets(str(out), split="train")
        batch = next(ds.batches(batch_size=3, steps=1))
        assert batch["target"].shape == (3, 24, 32, 3)
        np.testing.assert_allclose(
            batch["K"][0][1, 1], K[1, 1] * 24 / 48, rtol=1e-6
        )
