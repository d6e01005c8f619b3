"""Offline dataset preparation: raw KITTI -> training snippet dirs.

Reference parity: `<ref>/data/prepare_train_data.py` +
`kitti_odom_loader.py` / `kitti_raw_loader.py` (SURVEY.md R11 [H]):
resize frames, write `[I_{t-1} I_t I_{t+1}]` horizontally-concatenated
snippet images plus per-snippet `*_cam.txt` intrinsics and train/val
split lists, with a multiprocessing pool over frames; raw drives drop
near-static frames by GPS speed. The online `SnippetDataset` does not
need this (it reads sequences directly); the offline form exists for
(a) parity with the reference's dataset layout and (b) amortizing
decode+resize for long training runs.
"""

from __future__ import annotations

import os
from multiprocessing import Pool

import numpy as np

from davo_tpu.data.kitti import (
    TRAIN_SEQS,
    CityscapesSeq,
    KittiOdometry,
    KittiRaw,
)


def _write_snippet(args) -> str:
    import cv2

    root, seq, t, out_dir, height, width, native_hw = args
    ko = KittiOdometry(root, seq)
    frames = [
        (ko.load_frame(i, height, width) * 255).astype(np.uint8)
        for i in (t - 1, t, t + 1)
    ]
    concat = np.concatenate(frames, axis=1)  # H x 3W x 3
    name = f"{seq}_{t:06d}"
    cv2.imwrite(
        os.path.join(out_dir, name + ".jpg"),
        cv2.cvtColor(concat, cv2.COLOR_RGB2BGR),
    )
    if ko.seg_dir is not None:
        # Reference parity (SURVEY.md R8): precomputed seg label maps
        # ride with the prepared snippets so flow_seg trains from this
        # layout. Target frame's labels only (the model consumes
        # target seg); PNG — labels must survive losslessly.
        cv2.imwrite(
            os.path.join(out_dir, name + "_seg.png"),
            ko.load_seg(t, height, width).astype(np.uint8),
        )
    if getattr(ko, "gt_poses", None) is not None:
        # GT warp transforms for the supervised tier: one 4x4 per
        # source, mapping TARGET-cam points to SOURCE-cam points
        # (model convention; see snippets.KittiAdapter.gt_rel).
        P = ko.gt_poses
        past = np.linalg.inv(P[t - 1]) @ P[t]
        futr = np.linalg.inv(P[t + 1]) @ P[t]
        with open(os.path.join(out_dir, name + "_pose.txt"), "w") as f:
            f.write(",".join(
                str(v) for v in np.stack([past, futr]).ravel()
            ))
    K = ko.scaled_intrinsics(height, width, native_hw)
    with open(os.path.join(out_dir, name + "_cam.txt"), "w") as f:
        f.write(",".join(str(v) for v in K.ravel()))
    return name


def prepare_kitti_odometry(
    root: str,
    out_dir: str,
    height: int = 128,
    width: int = 416,
    seqs: tuple = TRAIN_SEQS,
    num_workers: int = 4,
    val_fraction: float = 0.1,
    seed: int = 0,
) -> dict:
    """Build the reference-layout training set. Returns counts."""
    os.makedirs(out_dir, exist_ok=True)
    jobs = []
    for seq in seqs:
        ko = KittiOdometry(root, seq)
        import cv2

        native_hw = cv2.imread(ko.frame_path(0)).shape[:2]
        for t in range(1, len(ko) - 1):
            jobs.append((root, seq, t, out_dir, height, width, native_hw))

    if num_workers > 1:
        with Pool(num_workers) as pool:
            names = pool.map(_write_snippet, jobs)
    else:
        names = [_write_snippet(j) for j in jobs]

    rng = np.random.default_rng(seed)
    order = rng.permutation(len(names))
    n_val = int(len(names) * val_fraction)
    val = sorted(names[i] for i in order[:n_val])
    train = sorted(names[i] for i in order[n_val:])
    with open(os.path.join(out_dir, "train.txt"), "w") as f:
        f.write("\n".join(train) + "\n")
    with open(os.path.join(out_dir, "val.txt"), "w") as f:
        f.write("\n".join(val) + "\n")
    return {"train": len(train), "val": len(val)}


def _write_raw_snippet(args) -> str:
    import cv2

    root, date, drive, t, out_dir, height, width, native_hw = args
    kr = KittiRaw(root, date, drive)
    frames = [
        (kr.load_frame(i, height, width) * 255).astype(np.uint8)
        for i in (t - 1, t, t + 1)
    ]
    name = f"{date}_{drive}_{t:06d}"
    cv2.imwrite(
        os.path.join(out_dir, name + ".jpg"),
        cv2.cvtColor(np.concatenate(frames, axis=1), cv2.COLOR_RGB2BGR),
    )
    K = kr.scaled_intrinsics(height, width, native_hw)
    with open(os.path.join(out_dir, name + "_cam.txt"), "w") as f:
        f.write(",".join(str(v) for v in K.ravel()))
    return name


def prepare_kitti_raw(
    root: str,
    out_dir: str,
    height: int = 128,
    width: int = 416,
    drives: list[tuple[str, str]] | None = None,
    num_workers: int = 4,
    val_fraction: float = 0.1,
    min_speed: float = 1.0,
    seed: int = 0,
) -> dict:
    """Build the reference-layout training set from raw drives.

    A triplet is kept only if all three frames move faster than
    `min_speed` m/s (oxts GPS; drives without oxts keep everything) —
    the reference's static-scene exclusion. Returns counts.
    """
    import cv2

    os.makedirs(out_dir, exist_ok=True)
    if drives is None:
        drives = KittiRaw.list_drives(root)
    jobs = []
    n_static = 0
    for date, drive in drives:
        kr = KittiRaw(root, date, drive)
        native_hw = cv2.imread(kr.frame_path(0)).shape[:2]
        speeds = kr.speeds()
        for t in range(1, len(kr) - 1):
            if speeds is not None and float(
                speeds[t - 1 : t + 2].min()
            ) < min_speed:
                n_static += 1
                continue
            jobs.append(
                (root, date, drive, t, out_dir, height, width, native_hw)
            )

    if num_workers > 1:
        with Pool(num_workers) as pool:
            names = pool.map(_write_raw_snippet, jobs)
    else:
        names = [_write_raw_snippet(j) for j in jobs]

    rng = np.random.default_rng(seed)
    order = rng.permutation(len(names))
    n_val = int(len(names) * val_fraction)
    val = sorted(names[i] for i in order[:n_val])
    train = sorted(names[i] for i in order[n_val:])
    with open(os.path.join(out_dir, "train.txt"), "w") as f:
        f.write("\n".join(train) + "\n")
    with open(os.path.join(out_dir, "val.txt"), "w") as f:
        f.write("\n".join(val) + "\n")
    return {"train": len(train), "val": len(val), "static_dropped": n_static}


def _write_cityscapes_snippet(args) -> str:
    import cv2

    root, split, city, seq, t, out_dir, height, width, native_hw = args
    cs = CityscapesSeq(root, split, city, seq)
    frames = [
        (cs.load_frame(i, height, width) * 255).astype(np.uint8)
        for i in (t - 1, t, t + 1)
    ]
    name = f"{city}_{seq}_{t:06d}"
    cv2.imwrite(
        os.path.join(out_dir, name + ".jpg"),
        cv2.cvtColor(np.concatenate(frames, axis=1), cv2.COLOR_RGB2BGR),
    )
    K = cs.scaled_intrinsics(height, width, native_hw)
    with open(os.path.join(out_dir, name + "_cam.txt"), "w") as f:
        f.write(",".join(str(v) for v in K.ravel()))
    return name


def prepare_cityscapes(
    root: str,
    out_dir: str,
    height: int = 128,
    width: int = 416,
    split: str = "train",
    num_workers: int = 4,
    val_fraction: float = 0.1,
    seed: int = 0,
) -> dict:
    """Build the reference-layout set from leftImg8bit_sequence groups
    (`<ref>/data/cityscapes_loader.py` analog). Returns counts."""
    import cv2

    os.makedirs(out_dir, exist_ok=True)
    jobs = []
    for city, seq in CityscapesSeq.list_sequences(root, split):
        cs = CityscapesSeq(root, split, city, seq)
        native_hw = cv2.imread(cs.frame_path(0)).shape[:2]
        for t in range(1, len(cs) - 1):
            jobs.append(
                (root, split, city, seq, t, out_dir, height, width, native_hw)
            )

    if num_workers > 1:
        with Pool(num_workers) as pool:
            names = pool.map(_write_cityscapes_snippet, jobs)
    else:
        names = [_write_cityscapes_snippet(j) for j in jobs]

    rng = np.random.default_rng(seed)
    order = rng.permutation(len(names))
    n_val = int(len(names) * val_fraction)
    val = sorted(names[i] for i in order[:n_val])
    train = sorted(names[i] for i in order[n_val:])
    with open(os.path.join(out_dir, "train.txt"), "w") as f:
        f.write("\n".join(train) + "\n")
    with open(os.path.join(out_dir, "val.txt"), "w") as f:
        f.write("\n".join(val) + "\n")
    return {"train": len(train), "val": len(val)}


class PreparedSnippets:
    """Reader for the offline layout (snippet-source protocol-ish).

    Yields dict batches shaped like `SnippetDataset` from the
    concatenated-triplet files the reference pipeline consumes.
    """

    def __init__(self, data_dir: str, split: str = "train", seed: int = 0):
        self.dir = data_dir
        with open(os.path.join(data_dir, f"{split}.txt")) as f:
            self.names = [l.strip() for l in f if l.strip()]
        self.rng = np.random.default_rng(seed)
        # Prepared sets are uniform: presence checked on one item.
        self.has_seg = bool(self.names) and os.path.exists(
            os.path.join(data_dir, self.names[0] + "_seg.png")
        )
        self.has_gt = bool(self.names) and os.path.exists(
            os.path.join(data_dir, self.names[0] + "_pose.txt")
        )

    def __len__(self) -> int:
        return len(self.names)

    def load(self, name: str) -> dict:
        import cv2

        img = cv2.imread(os.path.join(self.dir, name + ".jpg"))
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
        w = img.shape[1] // 3
        prev_f, tgt, nxt = img[:, :w], img[:, w : 2 * w], img[:, 2 * w :]
        with open(os.path.join(self.dir, name + "_cam.txt")) as f:
            K = np.fromstring(f.read(), sep=",").reshape(3, 3)
        out = {
            "target": tgt,
            "sources": np.stack([prev_f, nxt]),
            "K": K.astype(np.float32),
        }
        if self.has_seg:
            seg_path = os.path.join(self.dir, name + "_seg.png")
            seg = cv2.imread(seg_path, cv2.IMREAD_GRAYSCALE)
            if seg is None:  # partially-populated dir: name the file
                raise FileNotFoundError(seg_path)
            out["seg"] = seg.astype(np.int32)
        if self.has_gt:
            with open(os.path.join(self.dir, name + "_pose.txt")) as f:
                out["gt_pose"] = np.fromstring(
                    f.read(), sep=","
                ).reshape(2, 4, 4).astype(np.float32)
        return out

    def batches(self, batch_size: int, steps: int | None = None):
        produced = 0
        while steps is None or produced < steps:
            order = self.rng.permutation(self.names)
            for start in range(0, len(order) - batch_size + 1, batch_size):
                items = [self.load(n) for n in order[start : start + batch_size]]
                yield {
                    k: np.stack([it[k] for it in items]) for k in items[0]
                }
                produced += 1
                if steps is not None and produced >= steps:
                    return
            if len(self.names) < batch_size:
                return


def annotate_prepared_seg(
    data_dir: str,
    infer_fn,
    batch_size: int = 16,
    overwrite: bool = False,
) -> int:
    """Stamp `*_seg.png` onto an existing prepared tree.

    `infer_fn`: batched labeler (B, H, W, 3) float [0,1] -> (B, H, W)
    uint8 (see `models.segnet.make_seg_infer`). Labels the TARGET
    (middle) frame of every snippet — the model consumes target seg
    only (SURVEY.md R8). The reference obtained these maps from an
    external DeepLab run; here the repo's own SegNetLite produces
    them, closing the §7.2 "in-repo seg source" risk. Returns the
    number of files written.
    """
    import cv2

    names = []
    for split in ("train", "val"):
        path = os.path.join(data_dir, f"{split}.txt")
        if os.path.exists(path):
            with open(path) as f:
                names += [l.strip() for l in f if l.strip()]
    todo = [
        n
        for n in names
        if overwrite
        or not os.path.exists(os.path.join(data_dir, n + "_seg.png"))
    ]
    written = 0
    for start in range(0, len(todo), batch_size):
        chunk = todo[start : start + batch_size]
        imgs = []
        for n in chunk:
            path = os.path.join(data_dir, n + ".jpg")
            img = cv2.imread(path)
            if img is None:  # missing/corrupt snippet jpg (ADVICE r3)
                raise FileNotFoundError(
                    f"annotate_prepared_seg: unreadable snippet {path}"
                )
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            w = img.shape[1] // 3
            imgs.append(img[:, w : 2 * w].astype(np.float32) / 255.0)
        labels = np.asarray(infer_fn(np.stack(imgs)))
        for n, lab in zip(chunk, labels):
            cv2.imwrite(
                os.path.join(data_dir, n + "_seg.png"),
                lab.astype(np.uint8),
            )
            written += 1
    return written
