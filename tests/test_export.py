"""Serving export: `cli export` serializes the pose forward as
StableHLO; the artifact deserializes and runs with NO model code."""

import jax
import jax.numpy as jnp
import numpy as np

from davo_tpu.cli.main import main


def test_export_roundtrip(tmp_path):
    out = tmp_path / "tiny.stablehlo"
    rc = main(
        ["export", "--version", "tiny", "--out", str(out),
         "--batch-size", "2"]
    )
    assert rc == 0 and out.exists() and out.stat().st_size > 1000

    from jax import export as jexport

    exp = jexport.deserialize(out.read_bytes())
    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.uniform(size=(2, 48, 64, 3)), jnp.float32)
    s = jnp.asarray(rng.uniform(size=(2, 48, 64, 3)), jnp.float32)
    g = jnp.asarray(rng.integers(0, 19, (2, 48, 64)), jnp.int32)
    poses = exp.call(t, s, g)
    assert poses.shape == (2, 6)
    assert np.isfinite(np.asarray(poses)).all()

    # The artifact must equal the live model (params were baked in).
    from davo_tpu.models import presets
    from davo_tpu.models.davo import DavoModel
    from davo_tpu.train.loop import create_state

    cfg = presets.get("tiny")
    sample = {
        "target": np.asarray(t),
        "sources": np.asarray(s)[:, None],
        "K": np.eye(3, dtype=np.float32)[None].repeat(2, 0),
        "seg": np.asarray(g),
    }
    model, state, _ = create_state(cfg, jax.random.key(0), sample)
    direct = model.apply(
        state.params, t, s[:, None], seg=g, train=False
    )["poses"][:, 0]
    np.testing.assert_allclose(
        np.asarray(poses), np.asarray(direct), atol=1e-5
    )
