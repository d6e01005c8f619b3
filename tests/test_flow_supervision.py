"""GT-flow supervision: dataset plumbing + loss semantics (r5).

The synthetic worlds render exact flow, so the supervised-flow tier
is fully testable on CPU: the dataset must emit target->source flow
in the warp convention, and the per-level EPE must vanish exactly on
GT-derived level flows (pinning the stride/rescale convention against
models/flownet.py and geopose.pose_from_flow_pyramid).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from davo_tpu.config import Config, TrainConfig
from davo_tpu.data.snippets import MultiSourceDataset, SnippetDataset
from davo_tpu.data.synthetic import DriveSequence
from davo_tpu.models import presets
from davo_tpu.train.losses import flow_supervision_loss

DRIVE = dict(forward_speed=0.8, yaw_amp=0.02, n_static=4)


@pytest.fixture(scope="module")
def seq():
    return DriveSequence(n_frames=8, height=48, width=64, seed=2, **DRIVE)


class TestDatasetFlow:
    def test_emits_gt_flow(self, seq):
        ds = SnippetDataset(seq, batch_size=2, with_flow=True, seed=0)
        batch = next(ds.batches(steps=1))
        assert batch["gt_flow"].shape == (2, 2, 48, 64, 2)
        assert np.isfinite(batch["gt_flow"]).all()

    def test_flow_convention_matches_source_order(self, seq):
        """gt_flow[:, s] must be the target->source flow for the SAME
        source index s as `sources` (past sources first, then future —
        data/snippets.py snippet())."""
        ds = SnippetDataset(seq, batch_size=1, with_flow=True, seed=0)
        snip = ds.snippet(3)
        np.testing.assert_allclose(
            snip["gt_flow"][0], seq.gt_flow(3, 2), atol=0
        )
        np.testing.assert_allclose(
            snip["gt_flow"][1], seq.gt_flow(3, 4), atol=0
        )

    def test_zoom_augment_rejected(self, seq):
        with pytest.raises(ValueError):
            SnippetDataset(seq, with_flow=True, augment=True)

    def test_color_augment_allowed(self, seq):
        ds = SnippetDataset(seq, batch_size=1, with_flow=True,
                            augment="color", seed=0)
        assert ds.with_flow


class TestFlowSupervisionLoss:
    def test_zero_on_gt_level_flows(self, seq):
        """Striding GT down to each level in level-pixel units must
        give (near-)zero EPE — the convention pin."""
        t = 3
        full = np.stack(
            [seq.gt_flow(t, t - 1), seq.gt_flow(t, t + 1)], 0
        )[None]  # (1, 2, H, W, 2)
        pyrs = []
        for s in range(2):
            levels = []
            for stride in (4, 8):
                g = full[0, s, ::stride, ::stride]
                levels.append(
                    jnp.asarray(
                        np.stack(
                            [g[..., 0] / stride, g[..., 1] / stride], -1
                        )
                    )[None]
                )
            pyrs.append(levels)
        loss = float(flow_supervision_loss(pyrs, jnp.asarray(full)))
        assert loss < 1.1e-3  # sqrt(eps) floor of the Charbonnier

        zero_pyrs = [
            [jnp.zeros_like(lv) for lv in pyr] for pyr in pyrs
        ]
        loss0 = float(flow_supervision_loss(zero_pyrs, jnp.asarray(full)))
        assert loss0 > 10 * loss

    def test_rejects_nondividing_level(self, seq):
        full = jnp.zeros((1, 1, 48, 64, 2))
        with pytest.raises(ValueError):
            flow_supervision_loss([[jnp.zeros((1, 13, 16, 2))]], full)


class TestTrainStepWithFlowSup:
    def test_step_runs_and_reports_metric(self, seq):
        from davo_tpu.train.loop import create_state, make_train_step

        base = presets.get("tiny")
        cfg = Config(
            model=dataclasses.replace(base.model, pose_head="geo_hybrid"),
            train=TrainConfig(
                batch_size=2, max_steps=2, flow_supervision_weight=1.0,
                pose_supervision_weight=100.0, smooth_weight=0.1,
            ),
        )
        ds = MultiSourceDataset(
            [seq], batch_size=2, with_seg=True, with_gt=True,
            with_flow=True, seed=0,
        )
        batch = next(ds.batches(steps=1))
        model, state, tx = create_state(cfg, jax.random.key(0), batch)
        step = make_train_step(model, tx, cfg)
        state, metrics = step(state, batch)
        assert "flow_sup" in metrics
        assert np.isfinite(float(metrics["flow_sup"]))
        assert np.isfinite(float(metrics["total"]))
