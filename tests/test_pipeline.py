"""P3 pipeline parallelism: staged flow->pose forward == single-device
DavoModel forward (SURVEY.md §2.2 P3; CI on the 8-fake-device mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from davo_tpu.config import ModelConfig
from davo_tpu.dist.pipeline import (
    NUM_STAGES,
    make_pipeline_pose_fn,
    pack_microbatches,
)
from davo_tpu.models.davo import DavoModel

CFG = ModelConfig(
    img_height=48,
    img_width=64,
    pose_channels=(8, 12, 16, 16),
    disp_channels=(8, 12, 16, 16),
    flow_levels=3,
    flow_search_range=2,
    compute_dtype="float32",
    attention="flow_seg",
)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    N, H, W = 8, CFG.img_height, CFG.img_width
    tgt = jnp.asarray(rng.uniform(size=(N, H, W, 3)), jnp.float32)
    src = jnp.asarray(rng.uniform(size=(N, H, W, 3)), jnp.float32)
    seg = jnp.asarray(rng.integers(0, 19, (N, H, W)), jnp.int32)
    model = DavoModel(CFG)
    params = jax.jit(model.init, static_argnames=("train",))(
        jax.random.key(0), tgt, src[:, None], seg=seg, train=False
    )
    return model, params, tgt, src, seg


@pytest.mark.skipif(jax.device_count() < NUM_STAGES, reason="needs 2 devices")
class TestPipeline:
    def test_matches_single_device(self, setup):
        model, params, tgt, src, seg = setup
        direct = model.apply(
            params, tgt, src[:, None], seg=seg, train=False
        )["poses"][:, 0]

        mesh = Mesh(
            np.asarray(jax.devices()[:NUM_STAGES]), ("stage",)
        )
        mbs = pack_microbatches(tgt, src, seg, n_microbatches=4)
        fn = make_pipeline_pose_fn(params, CFG, mesh)
        poses = np.asarray(fn(mbs)).reshape(-1, 6)
        np.testing.assert_allclose(
            poses, np.asarray(direct), atol=1e-5
        )

    def test_microbatch_count_invariance(self, setup):
        """Same result with a different schedule depth (bubble size)."""
        model, params, tgt, src, seg = setup
        mesh = Mesh(
            np.asarray(jax.devices()[:NUM_STAGES]), ("stage",)
        )
        fn = make_pipeline_pose_fn(params, CFG, mesh)
        p2 = np.asarray(fn(pack_microbatches(tgt, src, seg, n_microbatches=2))).reshape(-1, 6)
        p8 = np.asarray(fn(pack_microbatches(tgt, src, seg, n_microbatches=8))).reshape(-1, 6)
        np.testing.assert_allclose(p2, p8, atol=1e-5)
