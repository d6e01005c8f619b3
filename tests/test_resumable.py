"""Fault injection: kill streaming eval mid-sequence, resume, and get
bit-identical results to an uninterrupted run (SURVEY.md §5)."""

import jax
import numpy as np
import pytest

from davo_tpu.config import Config, ModelConfig, TrainConfig
from davo_tpu.data.synthetic import SyntheticSequence
from davo_tpu.eval.resumable import EvalCursor, resumable_predict_sequence
from davo_tpu.eval.runner import predict_sequence
from davo_tpu.train.loop import create_state

TINY = ModelConfig(
    img_height=32, img_width=32,
    pose_channels=(8, 12), disp_channels=(8, 12),
    flow_levels=2, flow_search_range=2,
    attention="none", pose_scale=1.0, compute_dtype="float32",
)


@pytest.fixture(scope="module")
def model_and_frames():
    seq = SyntheticSequence(n_frames=14, height=32, width=32, seed=6)
    frames = np.stack([seq.frame(i) for i in range(len(seq))])
    cfg = Config(model=TINY, train=TrainConfig(batch_size=4))
    sample = {
        "target": frames[:4],
        "sources": frames[:4][:, None],
        "K": np.eye(3, dtype=np.float32)[None].repeat(4, 0),
    }
    model, state, _ = create_state(cfg, jax.random.key(0), sample)

    @jax.jit
    def apply_fn(t, s, g=None):
        return model.apply(state.params, t, s[:, None], train=False)["poses"][:, 0]

    return apply_fn, frames


class TestResumableEval:
    def test_crash_and_resume_identical(self, model_and_frames, tmp_path):
        apply_fn, frames = model_and_frames

        rels_ref = predict_sequence(apply_fn, frames, batch_size=4)

        cursor_path = str(tmp_path / "cursor.json")
        cursor = EvalCursor(cursor_path)
        with pytest.raises(RuntimeError, match="injected fault"):
            resumable_predict_sequence(
                apply_fn, frames, cursor, "seq0",
                batch_size=4, crash_after_batches=2,
            )
        assert cursor.next_pair("seq0") == 8  # 2 batches committed

        # "Relaunch": fresh cursor object from disk, finish the run.
        cursor2 = EvalCursor(cursor_path)
        rels = resumable_predict_sequence(
            apply_fn, frames, cursor2, "seq0", batch_size=4
        )
        assert cursor2.done("seq0", len(frames) - 1)
        assert rels.shape == rels_ref.shape  # drop-in: (N-1, 4, 4)
        np.testing.assert_allclose(rels, rels_ref, atol=1e-6)

    def test_fresh_run_no_cursor_file(self, model_and_frames, tmp_path):
        apply_fn, frames = model_and_frames
        cursor = EvalCursor(str(tmp_path / "c2.json"))
        rels = resumable_predict_sequence(
            apply_fn, frames, cursor, "s", batch_size=8
        )
        assert rels.shape == (len(frames) - 1, 4, 4)

    def test_stale_cursor_reset(self, model_and_frames, tmp_path):
        """A cursor from a different model or sequence length must be
        discarded, not resumed (review finding: stale rel_vecs were
        silently spliced into the trajectory)."""
        from davo_tpu.eval.resumable import params_fingerprint

        apply_fn, frames = model_and_frames
        path = str(tmp_path / "c3.json")
        cursor = EvalCursor(path)
        resumable_predict_sequence(
            apply_fn, frames, cursor, "s", batch_size=4, fingerprint="modelA"
        )
        n_done = cursor.next_pair("s")
        assert n_done == len(frames) - 1

        # Same seq, different model stamp -> entry reset, full re-run.
        cursor2 = EvalCursor(path)
        rels = resumable_predict_sequence(
            apply_fn, frames, cursor2, "s", batch_size=4, fingerprint="modelB"
        )
        assert rels.shape == (len(frames) - 1, 4, 4)
        assert len(cursor2.rels("s")) == len(frames) - 1  # no stale splice

        # Shorter sequence under the same id -> reset too (length is
        # part of the fingerprint); previously this returned MORE rels
        # than the sequence has pairs.
        cursor3 = EvalCursor(path)
        rels_short = resumable_predict_sequence(
            apply_fn, frames[:9], cursor3, "s", batch_size=4,
            fingerprint="modelB",
        )
        assert rels_short.shape == (8, 4, 4)

        # params_fingerprint: deterministic, changes with values.
        p = {"a": np.ones((3, 3), np.float32)}
        q = {"a": np.full((3, 3), 2.0, np.float32)}
        assert params_fingerprint(p) == params_fingerprint(p)
        assert params_fingerprint(p) != params_fingerprint(q)
