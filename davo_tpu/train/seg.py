"""Train SegNetLite on synthetic GT labels (the in-repo seg source).

The reference has no seg trainer at all — it ships precomputed DeepLab
masks (SURVEY.md R8). This trainer exists so the framework can produce
its own masks: synthetic worlds render exact 19-class labels
(`data/synthetic.py` Voronoi regions + dynamic-object labels), a tiny
encoder-decoder learns them, and `cli prep --write-seg` applies it to
real frames. Quality bar is deliberately modest — the flow_seg
attention mechanism consumes region *partitions*, not boundary-sharp
semantics.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from davo_tpu.data.synthetic import SyntheticSequence
from davo_tpu.models.segnet import SegNetLite


def _render_world(seed: int, n_frames: int, height: int, width: int):
    seq = SyntheticSequence(
        n_frames=n_frames,
        height=height,
        width=width,
        seed=seed,
        n_dynamic=2,
        dynamic_speed=0.6,
    )
    imgs = np.stack([seq.frame(i) for i in range(n_frames)])
    labels = np.stack([seq.seg(i) for i in range(n_frames)])
    return imgs.astype(np.float32), labels.astype(np.int32)


def train_segnet(
    steps: int = 600,
    batch_size: int = 8,
    height: int = 128,
    width: int = 416,
    lr: float = 2e-3,
    seed: int = 0,
    n_worlds: int = 6,
    frames_per_world: int = 8,
    channels: tuple = (16, 32, 64, 128),
    num_classes: int = 19,
    log_every: int = 100,
):
    """Returns (model, params, metrics).

    Eval = HELD-OUT VIEWPOINTS of the training worlds (frames past the
    training range), not a held-out world: synthetic static labels are
    Voronoi cells statistically independent of the texture appearance
    (data/synthetic.py), so cross-world appearance->label mapping does
    not exist to be learned. View generalization is the meaningful
    synthetic metric; on real data (the deployment case for
    `prep --write-seg`) appearance->class is learnable in the ordinary
    way and this trainer is the recipe, not the weights.
    """
    model = SegNetLite(num_classes=num_classes, channels=channels)
    rng = np.random.default_rng(seed)

    n_eval = max(2, frames_per_world // 4)
    imgs, labels, ev_imgs, ev_labels = [], [], [], []
    for w in range(n_worlds):
        im, lab = _render_world(
            seed + w, frames_per_world + n_eval, height, width
        )
        imgs.append(im[:frames_per_world])
        labels.append(lab[:frames_per_world])
        ev_imgs.append(im[frames_per_world:])
        ev_labels.append(lab[frames_per_world:])
    imgs = np.concatenate(imgs)
    labels = np.concatenate(labels)
    ev_imgs = np.concatenate(ev_imgs)
    ev_labels = np.concatenate(ev_labels)

    params = jax.jit(model.init)(
        jax.random.key(seed), jnp.zeros((1, height, width, 3), jnp.float32)
    )
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, img, lab):
        def loss_fn(p):
            logits = model.apply(p, img)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, lab
            ).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.monotonic()
    loss = float("nan")
    for i in range(steps):
        idx = rng.integers(0, len(imgs), batch_size)
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(imgs[idx]), jnp.asarray(labels[idx])
        )
        if log_every and (i % log_every == 0 or i == steps - 1):
            print(
                f"seg step {i:5d}  loss {float(loss):.4f}  "
                f"({time.monotonic() - t0:.0f}s)",
                flush=True,
            )

    pred = np.asarray(
        jax.jit(lambda p, x: jnp.argmax(model.apply(p, x), -1))(
            params, jnp.asarray(ev_imgs)
        )
    )
    acc = float((pred == ev_labels).mean())
    ious = []
    for c in range(num_classes):
        inter = ((pred == c) & (ev_labels == c)).sum()
        union = ((pred == c) | (ev_labels == c)).sum()
        if union:
            ious.append(inter / union)
    metrics = {
        "final_loss": float(loss),
        "eval_pixel_acc": acc,
        "eval_miou": float(np.mean(ious)) if ious else 0.0,
        "eval_classes_present": len(ious),
    }
    return model, params, metrics
