"""Tensor-parallel rule table: TP-sharded forward == replicated."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from davo_tpu.config import Config, ModelConfig, TrainConfig
from davo_tpu.dist.mesh import make_mesh
from davo_tpu.dist.sharding_rules import (
    match_partition_rules,
    shard_params_tp,
)
from davo_tpu.train.loop import create_state

TINY = ModelConfig(
    img_height=32, img_width=32,
    pose_channels=(8, 16), disp_channels=(8, 16),
    flow_levels=2, flow_search_range=2,
    attention="none", pose_scale=1.0, compute_dtype="float32",
)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    batch = {
        "target": jnp.asarray(rng.uniform(size=(4, 32, 32, 3)), jnp.float32),
        "sources": jnp.asarray(
            rng.uniform(size=(4, 1, 32, 32, 3)), jnp.float32
        ),
        "K": jnp.asarray(np.eye(3, dtype=np.float32)[None].repeat(4, 0)),
    }
    cfg = Config(model=TINY, train=TrainConfig(batch_size=4))
    model, state, _ = create_state(cfg, jax.random.key(0), batch)
    return model, state, batch


class TestTPRules:
    def test_rules_produce_model_axis_shards(self, setup):
        model, state, _ = setup
        mesh = make_mesh(data=4, model=2)
        shardings = match_partition_rules(state.params, mesh)
        leaves = jax.tree_util.tree_leaves(
            shardings, is_leaf=lambda x: hasattr(x, "spec")
        )
        sharded = [s for s in leaves if any(a for a in s.spec)]
        assert len(sharded) > 0, "no parameter got a model-axis shard"

    def test_indivisible_falls_back(self, setup):
        model, state, _ = setup
        mesh = make_mesh(data=1, model=8)  # 8 does not divide some dims
        params = shard_params_tp(state.params, mesh)  # must not raise
        assert params is not None

    def test_tp_forward_matches_replicated(self, setup):
        model, state, batch = setup

        @jax.jit
        def fwd(params, t, s):
            return model.apply(params, t, s, train=False)["poses"]

        want = fwd(state.params, batch["target"], batch["sources"])
        mesh = make_mesh(data=4, model=2)
        tp_params = shard_params_tp(state.params, mesh)
        got = fwd(tp_params, batch["target"], batch["sources"])
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5
        )

    def test_tp_train_step_matches(self, setup):
        model, state, batch = setup
        import optax

        from davo_tpu.train.losses import total_loss

        cfg = Config(model=TINY, train=TrainConfig(batch_size=4))
        tx = optax.adam(1e-3)

        def loss_fn(params):
            out = model.apply(
                params, batch["target"], batch["sources"], train=True
            )
            return total_loss(out, batch, cfg.model, cfg.train)[0]

        g_ref = jax.jit(jax.grad(loss_fn))(state.params)
        mesh = make_mesh(data=4, model=2)
        tp_params = shard_params_tp(state.params, mesh)
        g_tp = jax.jit(jax.grad(loss_fn))(tp_params)
        for a, b in zip(
            jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_tp)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-5
            )


class TestExpertParallelAttention:
    def test_matches_unsharded(self, rng):
        from davo_tpu.models.attention import (
            region_weight_map,
            region_weight_map_ep,
            seg_to_onehot,
        )

        mesh = make_mesh(data=1, model=8)
        seg = jnp.asarray(rng.integers(0, 19, (2, 16, 16)), jnp.int32)
        oh = seg_to_onehot(seg, 19)
        w = jnp.asarray(rng.uniform(0.5, 1.5, (2, 19)), jnp.float32)
        want = region_weight_map(w, oh, (4, 4))
        got = region_weight_map_ep(w, oh, (4, 4), mesh)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5
        )

    def test_non_divisible_resolution(self, rng):
        """hw that does not divide the seg resolution takes the resize
        fallback in BOTH paths (review finding: EP returned the wrong
        shape here)."""
        from davo_tpu.models.attention import (
            region_weight_map,
            region_weight_map_ep,
            seg_to_onehot,
        )

        mesh = make_mesh(data=1, model=8)
        seg = jnp.asarray(rng.integers(0, 19, (2, 30, 30)), jnp.int32)
        oh = seg_to_onehot(seg, 19)
        w = jnp.asarray(rng.uniform(0.5, 1.5, (2, 19)), jnp.float32)
        want = region_weight_map(w, oh, (4, 4))
        got = region_weight_map_ep(w, oh, (4, 4), mesh)
        assert got.shape == want.shape == (2, 4, 4, 1)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5
        )
