"""Resumable streaming evaluation with persisted progress cursors.

SURVEY.md §5 "Failure detection / elastic recovery": the reference
loses all progress on crash; here every completed batch of frame pairs
advances an atomically-committed JSON cursor (tmp + rename), so a
killed evaluation resumes from the last committed batch. The same
pattern covers multi-host relaunch: the coordinator re-reads cursors
and re-dispatches only unfinished chunks.
"""

from __future__ import annotations

import json
import os

import numpy as np


class EvalCursor:
    """Atomic per-sequence progress: {seq_id: {next_pair, rel_vecs}}."""

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

    def commit(self, seq_id: str, next_pair: int, new_rels: np.ndarray):
        entry = self.state.setdefault(
            seq_id, {"next_pair": 0, "rel_vecs": []}
        )
        entry["rel_vecs"].extend(np.asarray(new_rels).tolist())
        entry["next_pair"] = next_pair
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
) -> np.ndarray:
    """Like `runner.predict_sequence` but checkpointing each batch.

    `crash_after_batches` is the fault-injection hook used by tests:
    raises RuntimeError after committing that many batches.
    """
    import jax.numpy as jnp

    n_pairs = len(frames) - 1
    start0 = cursor.next_pair(seq_id)
    batches_done = 0
    for start in range(start0, n_pairs, batch_size):
        end = min(start + batch_size, n_pairs)
        pad = batch_size - (end - start)
        tgt = frames[1:][start:end]
        src = frames[:-1][start:end]
        sg = seg[1:][start:end] if seg is not None else None
        if pad:
            tgt = np.concatenate([tgt, np.repeat(tgt[-1:], pad, 0)], 0)
            src = np.concatenate([src, np.repeat(src[-1:], pad, 0)], 0)
            if sg is not None:
                sg = np.concatenate([sg, np.repeat(sg[-1:], pad, 0)], 0)
        vec = apply_fn(jnp.asarray(tgt), jnp.asarray(src), sg)
        cursor.commit(seq_id, end, np.asarray(vec)[: end - start])
        batches_done += 1
        if crash_after_batches is not None and batches_done >= crash_after_batches:
            raise RuntimeError("injected fault: process killed mid-eval")
    return np.asarray(cursor.rels(seq_id), np.float32)
