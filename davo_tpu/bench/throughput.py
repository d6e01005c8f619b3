"""Throughput benchmarks for inference and training steps."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from davo_tpu.config import Config
from davo_tpu.models.davo import DavoModel
from davo_tpu.utils.profiling import timed


def _dummy_inputs(cfg: Config, batch: int, rng=None):
    rng = rng or np.random.default_rng(0)
    H, W = cfg.model.img_height, cfg.model.img_width
    data = {
        "target": jnp.asarray(rng.uniform(size=(batch, H, W, 3)), jnp.float32),
        "sources": jnp.asarray(
            rng.uniform(size=(batch, 1, H, W, 3)), jnp.float32
        ),
    }
    if cfg.model.attention == "flow_seg":
        data["seg"] = jnp.asarray(
            rng.integers(0, cfg.model.num_seg_classes, (batch, H, W)),
            jnp.int32,
        )
    return data


def bench_inference(cfg: Config, batch: int = 128, iters: int = 10) -> dict:
    """Full-model streaming pose inference frames/s."""
    model = DavoModel(cfg.model)
    data = _dummy_inputs(cfg, batch)
    params = jax.jit(model.init, static_argnames=("train",))(
        jax.random.key(0),
        data["target"],
        data["sources"],
        seg=data.get("seg"),
        train=False,
    )

    @jax.jit
    def infer(target, sources, seg):
        return model.apply(
            params, target, sources, seg=seg, train=False
        )["poses"]

    result = timed(
        infer, data["target"], data["sources"], data.get("seg"), iters=iters
    )
    return {
        "ms_per_batch": result["ms"],
        "frames_per_s": batch / result["ms"] * 1000.0,
        "batch": batch,
    }


def bench_train_step(cfg: Config, batch: int = 16, iters: int = 5) -> dict:
    """Jitted train-step steps/s (forward+backward+adam)."""
    from davo_tpu.data.snippets import SnippetDataset
    from davo_tpu.data.synthetic import SyntheticSequence
    from davo_tpu.train.loop import create_state, make_train_step

    seq = SyntheticSequence(
        n_frames=batch + 4,
        height=cfg.model.img_height,
        width=cfg.model.img_width,
    )
    ds = SnippetDataset(
        seq,
        batch_size=batch,
        with_seg=cfg.model.attention == "flow_seg",
        with_gt=True,
    )
    b = {k: jnp.asarray(v) for k, v in next(ds.batches(steps=1)).items()}
    model, state, tx = create_state(cfg, jax.random.key(0), b)
    step = make_train_step(model, tx, cfg)

    # The step donates state; time via a fold to keep donation legal.
    import time

    state, _ = step(state, b)  # compile
    jax.block_until_ready(state.params)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step(state, b)
        jax.block_until_ready(state.params)
        times.append((time.perf_counter() - t0) / iters * 1000.0)
    ms = min(times)
    return {
        "ms_per_step": ms,
        "steps_per_s": 1000.0 / ms,
        "frames_per_s": batch * 1000.0 / ms,
        "batch": batch,
    }
