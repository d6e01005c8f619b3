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
    # train=True so the param tree includes DispNet (stage 2 of the
    # 3-stage pipeline); the forward-only tests just ignore it.
    params = jax.jit(model.init, static_argnames=("train",))(
        jax.random.key(0), tgt, src[:, None], seg=seg, train=True
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

    def test_train_grads_match_single_device(self, setup):
        """Pipeline-parallel TRAINING: grads through the staged
        schedule (reverse scan + transposed ppermute = the GPipe
        backward) must equal single-device grads of the same loss."""
        from davo_tpu.dist.pipeline import make_pipeline_train_fns

        model, params, tgt, src, seg = setup
        rng = np.random.default_rng(3)
        gt_vec = jnp.asarray(
            rng.normal(scale=0.05, size=(8, 6)), jnp.float32
        )

        def direct_loss(p):
            poses = model.apply(
                p, tgt, src[:, None], seg=seg, train=False
            )["poses"][:, 0]
            t_err = jnp.sum((poses[..., :3] - gt_vec[..., :3]) ** 2, -1)
            r_err = jnp.sum((poses[..., 3:] - gt_vec[..., 3:]) ** 2, -1)
            return jnp.mean(t_err + 10.0 * r_err)

        ref_loss, ref_grads = jax.value_and_grad(direct_loss)(params)

        mesh = Mesh(np.asarray(jax.devices()[:NUM_STAGES]), ("stage",))
        M = 4
        mbs = pack_microbatches(tgt, src, seg, n_microbatches=M)
        _, grad_fn = make_pipeline_train_fns(CFG, mesh)
        loss, grads = grad_fn(params, mbs, gt_vec.reshape(M, -1, 6))

        assert float(loss) == pytest.approx(float(ref_loss), rel=1e-5)
        ref_flat = jax.tree_util.tree_leaves_with_path(ref_grads)
        got = dict(jax.tree_util.tree_leaves_with_path(grads))
        n_nonzero = 0
        for path, a in ref_flat:
            b = got[path]
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=2e-5,
                err_msg=str(path),
            )
            n_nonzero += int(np.abs(np.asarray(a)).max() > 0)
        assert n_nonzero > 10  # flownet+attn+posenet all receive grads

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


@pytest.mark.skipif(jax.device_count() < 3, reason="needs 3 devices")
class TestPipeline3:
    """Full-graph P3 (SURVEY.md §2.2: flow -> attention+pose ->
    depth/photometric loss): 3-stage loss + grads == single device."""

    def test_full_graph_train_matches_single_device(self, setup):
        from davo_tpu.dist.pipeline import (
            NUM_STAGES_FULL,
            make_pipeline3_train_fns,
        )
        from davo_tpu.models.dispnet import DispNet
        from davo_tpu.train.losses import photometric_loss, pose_vec_l2

        model, params, tgt, src, seg = setup
        rng = np.random.default_rng(5)
        N = tgt.shape[0]
        K = jnp.asarray(
            np.broadcast_to(
                np.array(
                    [[40.0, 0, 32.0], [0, 40.0, 24.0], [0, 0, 1.0]],
                    np.float32,
                ),
                (N, 3, 3),
            )
        )
        gt_vec = jnp.asarray(
            rng.normal(scale=0.05, size=(N, 6)), jnp.float32
        )
        pose_w = 0.5

        def direct_loss(p):
            out = model.apply(
                p, tgt, src[:, None], seg=seg, train=True
            )
            poses = out["poses"][:, 0]
            loss = photometric_loss(
                out["disp"], poses[:, None], tgt, src[:, None], K,
                ssim_weight=0.85, masking="border",
            )
            return loss + pose_w * pose_vec_l2(poses, gt_vec)

        ref_loss, ref_grads = jax.value_and_grad(direct_loss)(params)

        mesh = Mesh(
            np.asarray(jax.devices()[:NUM_STAGES_FULL]), ("stage",)
        )
        M = 4
        mbs = pack_microbatches(tgt, src, seg, n_microbatches=M)
        loss_fn, grad_fn = make_pipeline3_train_fns(
            CFG, mesh, ssim_weight=0.85, pose_weight=pose_w
        )
        loss, grads = grad_fn(
            params, mbs, K.reshape(M, -1, 3, 3), gt_vec.reshape(M, -1, 6)
        )

        # Microbatched photometric means == full-batch mean (equal mb
        # sizes), so the losses agree exactly up to accumulation order.
        assert float(loss) == pytest.approx(float(ref_loss), rel=1e-5)
        ref_flat = jax.tree_util.tree_leaves_with_path(ref_grads)
        got = dict(jax.tree_util.tree_leaves_with_path(grads))
        n_nonzero = 0
        for path, a in ref_flat:
            b = got[path]
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=3e-5,
                err_msg=str(path),
            )
            n_nonzero += int(np.abs(np.asarray(a)).max() > 0)
        # flownet + attn + posenet + DISPNET all receive grads now.
        assert n_nonzero > 15
        disp_grads = jax.tree_util.tree_leaves(
            grads["params"]["dispnet"]
        )
        assert max(float(np.abs(g).max()) for g in disp_grads) > 0
