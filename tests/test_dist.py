"""Distributed-without-a-cluster tests (SURVEY.md §4.4): 8 fake CPU
devices; sharded results must match single-device results."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from davo_tpu.config import Config, ModelConfig, TrainConfig
from davo_tpu.data.snippets import SnippetDataset
from davo_tpu.data.synthetic import SyntheticSequence
from davo_tpu.dist.mesh import batch_sharding, make_mesh, replicated, shard_batch
from davo_tpu.dist.train import (
    make_sharded_pose_apply,
    make_sharded_train_step,
    shard_state,
)
from davo_tpu.train.loop import create_state, make_train_step

TINY = ModelConfig(
    img_height=32,
    img_width=32,
    pose_channels=(8, 12),
    disp_channels=(8, 12),
    flow_levels=2,
    flow_search_range=2,
    attention="none",
    pose_scale=1.0,
    compute_dtype="float32",
)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def batch():
    seq = SyntheticSequence(n_frames=12, height=32, width=32, seed=9)
    ds = SnippetDataset(seq, batch_size=8, with_gt=True, seed=0)
    return {k: jnp.asarray(v) for k, v in next(ds.batches(steps=1)).items()}


class TestMesh:
    def test_shapes(self):
        mesh = make_mesh()
        assert mesh.shape == {"data": 8, "model": 1, "window": 1}
        mesh2 = make_mesh(data=4, model=2)
        assert mesh2.shape == {"data": 4, "model": 2, "window": 1}

    def test_bad_factorization(self):
        with pytest.raises(AssertionError):
            make_mesh(data=3, model=2)

    def test_shard_batch_places(self, batch):
        mesh = make_mesh()
        sharded = shard_batch(dict(batch), mesh)
        assert len(sharded["target"].devices()) == 8
        np.testing.assert_allclose(
            np.asarray(sharded["target"]), np.asarray(batch["target"])
        )


class TestShardedTrainStep:
    @pytest.mark.parametrize("remat", [False, True])
    def test_matches_single_device(self, batch, remat):
        """DP on 8 devices must equal the unsharded step (same math,
        psum-reduced grads) to f32 tolerance — with and without
        forward rematerialization."""
        cfg = Config(
            model=TINY,
            train=TrainConfig(
                batch_size=8, learning_rate=1e-3,
                pose_supervision_weight=10.0, remat=remat,
            ),
        )
        model, state0, tx = create_state(cfg, jax.random.key(0), batch)

        # Single-device reference.
        step_ref = make_train_step(model, tx, cfg)
        state_ref, metrics_ref = step_ref(state0, batch)

        # Sharded.
        model, state1, tx = create_state(cfg, jax.random.key(0), batch)
        mesh = make_mesh()
        state1 = shard_state(state1, mesh)
        sbatch = shard_batch(dict(batch), mesh)
        step_sh = make_sharded_train_step(model, tx, cfg, mesh)
        state_sh, metrics_sh = step_sh(state1, sbatch)

        assert float(metrics_sh["total"]) == pytest.approx(
            float(metrics_ref["total"]), rel=1e-4
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(state_ref.params),
            jax.tree_util.tree_leaves(state_sh.params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-5
            )

    def test_multiple_steps_run(self, batch):
        cfg = Config(model=TINY, train=TrainConfig(batch_size=8))
        model, state, tx = create_state(cfg, jax.random.key(0), batch)
        mesh = make_mesh()
        state = shard_state(state, mesh)
        sbatch = shard_batch(dict(batch), mesh)
        step = make_sharded_train_step(model, tx, cfg, mesh)
        for _ in range(3):
            state, metrics = step(state, sbatch)
        assert int(state.step) == 3
        assert np.isfinite(float(metrics["total"]))


class TestShardedInference:
    def test_pose_apply_matches(self, batch):
        cfg = Config(model=TINY, train=TrainConfig(batch_size=8))
        model, state, _ = create_state(cfg, jax.random.key(0), batch)
        mesh = make_mesh()

        targets = batch["target"]
        sources = batch["sources"][:, 0]

        @jax.jit
        def ref_fn(t, s):
            out = model.apply(state.params, t, s[:, None], train=False)
            return out["poses"][:, 0]

        want = ref_fn(targets, sources)
        fn = make_sharded_pose_apply(model, state.params, mesh)
        got = fn(targets, sources)
        assert len(got.sharding.device_set) == 8
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5
        )
