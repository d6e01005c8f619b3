"""Native C++ batch loader vs the Python `PreparedSnippets` reader:
same layout, same batches (SURVEY.md R9 — the reference's input
pipeline is native TF queue runners; ours is a C++ decode pool)."""

import os

import numpy as np
import pytest

from davo_tpu.data.native_loader import NativeSnippetLoader, available
from davo_tpu.data.prep import PreparedSnippets
from davo_tpu.data.synthetic import SyntheticSequence

pytestmark = pytest.mark.skipif(
    not available(), reason="native loader toolchain unavailable"
)

H, W, N_ITEMS = 24, 32, 10


@pytest.fixture(scope="module")
def prepared_dir(tmp_path_factory):
    """Write a tiny prepared-layout dir (concat triplets + cam files)."""
    import cv2

    out = tmp_path_factory.mktemp("prepared")
    seq = SyntheticSequence(n_frames=N_ITEMS + 2, height=H, width=W, seed=3)
    names = []
    for t in range(1, N_ITEMS + 1):
        frames = [
            (seq.frame(i) * 255).astype(np.uint8) for i in (t - 1, t, t + 1)
        ]
        name = f"00_{t:06d}"
        cv2.imwrite(
            str(out / f"{name}.jpg"),
            cv2.cvtColor(np.concatenate(frames, axis=1), cv2.COLOR_RGB2BGR),
        )
        (out / f"{name}_cam.txt").write_text(
            ",".join(str(v) for v in seq.K.ravel())
        )
        names.append(name)
    (out / "train.txt").write_text("\n".join(names) + "\n")
    return str(out)


def test_matches_python_reader(prepared_dir):
    """Unshuffled epoch == PreparedSnippets item-for-item. Decoders
    differ (libjpeg direct vs cv2), so pixel tolerance is a couple of
    quantization steps; K is parsed text and must match exactly."""
    native = NativeSnippetLoader(
        prepared_dir, batch_size=4, shuffle=False, loop=False, threads=3
    )
    assert (native.height, native.width) == (H, W)
    py = PreparedSnippets(prepared_dir)
    order = sorted(py.names) if py.names != native.names else native.names
    assert native.names == py.names

    got = list(native.batches())
    assert len(got) == N_ITEMS // 4  # ragged tail dropped, like python
    for bi, batch in enumerate(got):
        assert batch["target"].shape == (4, H, W, 3)
        assert batch["sources"].shape == (4, 2, H, W, 3)
        for k in range(4):
            item = py.load(order[bi * 4 + k])
            np.testing.assert_allclose(
                batch["target"][k], item["target"], atol=3 / 255.0
            )
            np.testing.assert_allclose(
                batch["sources"][k], item["sources"], atol=3 / 255.0
            )
            np.testing.assert_allclose(batch["K"][k], item["K"], atol=1e-5)
    native.close()


def test_end_of_data_and_determinism(prepared_dir):
    """loop=False stops after full batches; same seed -> same order."""
    runs = []
    for _ in range(2):
        native = NativeSnippetLoader(
            prepared_dir, batch_size=4, shuffle=True, loop=False, seed=7
        )
        batches = list(native.batches())
        assert len(batches) == 2
        runs.append(np.stack([b["target"] for b in batches]))
        native.close()
    np.testing.assert_array_equal(runs[0], runs[1])


def test_looping_stream(prepared_dir):
    """loop=True reshuffles across epochs and never raises StopIteration."""
    native = NativeSnippetLoader(
        prepared_dir, batch_size=4, shuffle=True, loop=True, seed=0
    )
    seen = 0
    for batch in native.batches(steps=7):  # > 2 epochs of 2 batches
        assert np.isfinite(batch["target"]).all()
        assert batch["target"].min() >= 0.0 and batch["target"].max() <= 1.0
        seen += 1
    assert seen == 7
    native.close()


def test_seg_maps(prepared_dir, tmp_path):
    """*_seg.png label maps decode natively and match the python
    reader exactly (labels are lossless)."""
    import shutil

    import cv2

    seq = SyntheticSequence(n_frames=N_ITEMS + 2, height=H, width=W, seed=3)
    d = tmp_path / "with_seg"
    shutil.copytree(prepared_dir, d)
    for t in range(1, N_ITEMS + 1):
        cv2.imwrite(
            str(d / f"00_{t:06d}_seg.png"), seq.seg(t).astype(np.uint8)
        )
    native = NativeSnippetLoader(
        str(d), batch_size=4, shuffle=False, loop=False, threads=3
    )
    assert native.has_seg
    py = PreparedSnippets(str(d))
    assert py.has_seg
    # GT pose lane: two 4x4 warp transforms per item (_pose.txt).
    gts = {}
    for t in range(1, N_ITEMS + 1):
        past = np.linalg.inv(seq.poses[t - 1]) @ seq.poses[t]
        futr = np.linalg.inv(seq.poses[t + 1]) @ seq.poses[t]
        gt = np.stack([past, futr])
        gts[f"00_{t:06d}"] = gt
        (d / f"00_{t:06d}_pose.txt").write_text(
            ",".join(str(v) for v in gt.ravel())
        )
    native.close()
    native = NativeSnippetLoader(
        str(d), batch_size=4, shuffle=False, loop=False, threads=3
    )
    assert native.has_gt
    batch = next(native.batches())
    assert batch["seg"].shape == (4, H, W)
    assert batch["seg"].dtype == np.int32
    assert batch["gt_pose"].shape == (4, 2, 4, 4)
    for k in range(4):
        item = py.load(py.names[k])
        np.testing.assert_array_equal(batch["seg"][k], item["seg"])
        np.testing.assert_allclose(
            batch["gt_pose"][k], gts[py.names[k]], atol=1e-6
        )
    native.close()


def test_shape_mismatch_error(prepared_dir, tmp_path):
    """A corrupt-size item surfaces as a RuntimeError, not a hang."""
    import shutil

    import cv2

    bad = tmp_path / "bad"
    shutil.copytree(prepared_dir, bad)
    # Overwrite one item with the wrong triplet width.
    cv2.imwrite(
        str(bad / "00_000001.jpg"),
        np.zeros((H, 2 * W, 3), np.uint8),
    )
    native = NativeSnippetLoader(
        str(bad), batch_size=4, shuffle=False, loop=False
    )
    with pytest.raises(RuntimeError, match="shape mismatch"):
        list(native.batches())
    native.close()
