"""Every registered version preset must construct and run a full
train-mode forward (SURVEY.md R15 / the reference's --version axis —
a preset typo should fail CI, not a user's first training step)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from davo_tpu.models import presets
from davo_tpu.models.davo import DavoModel


@pytest.mark.parametrize("name", presets.available())
def test_preset_forward(name):
    cfg = presets.get(name)
    assert cfg.model.img_height > 0 and cfg.model.img_width > 0
    # Shrink spatial dims (keep channels/levels) so the full-size
    # presets init in seconds on CPU while still exercising their
    # channel plumbing.
    model_cfg = dataclasses.replace(
        cfg.model, img_height=32, img_width=64, compute_dtype="float32"
    )
    model = DavoModel(model_cfg)
    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.uniform(size=(1, 32, 64, 3)), jnp.float32)
    s = jnp.asarray(rng.uniform(size=(1, 1, 32, 64, 3)), jnp.float32)
    kw = {}
    if model_cfg.attention == "flow_seg":
        kw["seg"] = jnp.asarray(
            rng.integers(0, model_cfg.num_seg_classes, (1, 32, 64)),
            jnp.int32,
        )
    params = jax.jit(model.init, static_argnames=("train",))(
        jax.random.key(0), t, s, train=True, **kw
    )
    out = model.apply(params, t, s, train=True, **kw)
    assert out["poses"].shape == (1, 1, 6)
    assert np.isfinite(np.asarray(out["poses"])).all()
    # Shallow presets (tiny: 3 decoder levels) emit fewer scales than
    # the default num_scales=4 — the losses handle either.
    assert 1 <= len(out["disp"]) <= model_cfg.num_scales
