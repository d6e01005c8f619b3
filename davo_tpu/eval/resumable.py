"""Resumable streaming evaluation with persisted progress cursors.

SURVEY.md §5 "Failure detection / elastic recovery": the reference
loses all progress on crash; here every completed batch of frame pairs
advances an atomically-committed JSON cursor (tmp + rename), so a
killed evaluation resumes from the last committed batch. The same
pattern covers multi-host relaunch: the coordinator re-reads cursors
and re-dispatches only unfinished chunks.

A cursor entry carries a `fingerprint` of the run (sequence length +
an optional caller-supplied model/params stamp): resuming with a
different model or a different sequence resets the entry instead of
silently splicing stale predictions into the trajectory.
"""

from __future__ import annotations

import json
import os

import numpy as np


def params_fingerprint(params) -> str:
    """Cheap, deterministic stamp of a param pytree (shapes + value
    checksums) for `resumable_predict_sequence(fingerprint=...)`."""
    import jax

    leaves = jax.tree_util.tree_leaves(params)
    acc = 0.0
    n = 0
    for leaf in leaves:
        a = np.asarray(leaf, np.float64)
        acc += float(np.abs(a).sum()) + float(a.ravel()[:: max(a.size // 7, 1)].sum())
        n += a.size
    return f"p{n}_{acc:.6e}"


class EvalCursor:
    """Atomic per-sequence progress: {seq_id: {next_pair, rel_vecs,
    fingerprint}}."""

    def __init__(self, path: str):
        self.path = path
        self.state: dict = {}
        if os.path.exists(path):
            with open(path) as f:
                self.state = json.load(f)

    def next_pair(self, seq_id: str) -> int:
        return self.state.get(seq_id, {}).get("next_pair", 0)

    def rels(self, seq_id: str) -> list:
        return self.state.get(seq_id, {}).get("rel_vecs", [])

    def validate(self, seq_id: str, fingerprint: str) -> None:
        """Reset the entry if it was produced by a different run
        (different model params or sequence length)."""
        stored = self.state.get(seq_id, {}).get("fingerprint")
        if stored is not None and stored != fingerprint:
            self.state.pop(seq_id, None)

    def commit(
        self,
        seq_id: str,
        next_pair: int,
        new_rels: np.ndarray,
        fingerprint: str | None = None,
    ):
        entry = self.state.setdefault(
            seq_id, {"next_pair": 0, "rel_vecs": []}
        )
        entry["rel_vecs"].extend(np.asarray(new_rels).tolist())
        entry["next_pair"] = next_pair
        if fingerprint is not None:
            entry["fingerprint"] = fingerprint
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.state, f)
        os.replace(tmp, self.path)  # atomic on POSIX

    def done(self, seq_id: str, n_pairs: int) -> bool:
        return self.next_pair(seq_id) >= n_pairs


def resumable_predict_sequence(
    apply_fn,
    frames: np.ndarray,
    cursor: EvalCursor,
    seq_id: str,
    seg: np.ndarray | None = None,
    batch_size: int = 32,
    crash_after_batches: int | None = None,
    fingerprint: str | None = None,
) -> np.ndarray:
    """Drop-in for `runner.predict_sequence` (returns the same
    (N-1, 4, 4) increment matrices), checkpointing each batch.

    `fingerprint`: optional model/params stamp (`params_fingerprint`);
    combined with the sequence length so a cursor written by a
    different checkpoint or a different sequence is discarded, not
    resumed. `crash_after_batches` is the fault-injection hook used by
    tests: raises RuntimeError after committing that many batches.
    """
    import jax.numpy as jnp

    from davo_tpu.core import geometry as geo
    from davo_tpu.eval.runner import iter_pair_batches

    n_pairs = len(frames) - 1
    fp = f"n{n_pairs}" + (f"_{fingerprint}" if fingerprint else "")
    cursor.validate(seq_id, fp)
    start0 = cursor.next_pair(seq_id)
    batches_done = 0
    for start, end, tgt, src, sg in iter_pair_batches(
        frames, seg, batch_size, start0
    ):
        vec = apply_fn(jnp.asarray(tgt), jnp.asarray(src), sg)
        cursor.commit(seq_id, end, np.asarray(vec)[: end - start], fp)
        batches_done += 1
        if crash_after_batches is not None and batches_done >= crash_after_batches:
            raise RuntimeError("injected fault: process killed mid-eval")
    vecs = np.asarray(cursor.rels(seq_id), np.float32)
    return np.asarray(geo.pose_vec_to_mat(jnp.asarray(vecs)))
