"""Shared helpers for the serving-probe harness.

`fingerprint()` hashes the source files that determine probe semantics
(kernels + model wiring + presets/config): results recorded against a
different fingerprint are stale — the code they validated no longer
exists — and must be discarded rather than promoted into
BENCH_FLAGS.json.
"""

from __future__ import annotations

import os
import re

_ANSI = re.compile(r"\x1b\[[0-9;]*[a-zA-Z]")

# Lines in a remote-compile failure that carry the actual cause. The
# first ~300 chars of the exception are axon WARN noise (landlock,
# env-adoption banners) — truncating there hid the real error for two
# rounds (r2's "opaque HTTP 500s" were a fully-explained VMEM OOM all
# along, R3_RESULTS.md).
_CAUSE = re.compile(
    r"(Ran out of memory[^\n]*|Invalid type:[^\n]*|"
    r"ERROR[^\n]*compile:[^\n]*|error:[^\n]*|"
    r"Scoped allocation[^\n]*|RESOURCE_EXHAUSTED[^\n]*)"
)


def compile_error_summary(exc: BaseException | str, limit: int = 1200) -> str:
    """First line of the exception + every cause-carrying line, ANSI
    stripped — so probe JSONs record WHY a compile failed, not the
    relay's log preamble."""
    text = _ANSI.sub("", str(exc))
    lines = text.splitlines()
    head = lines[0] if lines else ""
    causes = []
    for m in _CAUSE.finditer(text):
        frag = m.group(0).strip()
        if frag and frag not in causes:
            causes.append(frag)
    out = " | ".join([head] + causes) if causes else text[:limit]
    return out[:limit]

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))

import sys  # noqa: E402

if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

# Canonical definition lives in the package so the production CLI can
# apply promoted flags under the same gate (davo_tpu/utils/
# serving_flags.py); this module re-exports it for the dev harnesses.
from davo_tpu.utils.serving_flags import (  # noqa: E402,F401
    FINGERPRINT_FILES as _FILES,
    fingerprint,
)


def cached_eval_world(kind: str, seed: int, n_frames: int, H: int,
                      W: int, kw: dict):
    """Disk-cached rendering of an eval world's (frames, segs, poses, K).

    Rendering a 1,300-frame eval world at 128x416 costs ~30-40 min of
    HOST time — which the chip-claim protocol serializes behind the
    TPU job (r5). Caching under /tmp lets a CPU process pre-render
    while the chip trains, and later arms/jobs load in seconds. The
    cache key includes every world parameter; arrays are stored f32 —
    bit-identical to a fresh render (worlds are deterministic in
    seed), so cached and fresh arms are comparable.
    """
    import json as _json

    import numpy as _np

    os.makedirs("/tmp/world_cache", exist_ok=True)
    tag = _json.dumps(kw, sort_keys=True).replace(" ", "")
    tag = re.sub(r"[^A-Za-z0-9_.=,-]", "", tag)
    path = (
        f"/tmp/world_cache/{kind}_s{seed}_n{n_frames}_{H}x{W}_{tag}.npz"
    )
    if os.path.exists(path):
        z = _np.load(path)
        return z["frames"], z["segs"], z["poses"], z["K"]
    from davo_tpu.data.synthetic import DriveSequence, SyntheticSequence

    cls = DriveSequence if kind == "drive" else SyntheticSequence
    seq = cls(n_frames=n_frames, height=H, width=W, seed=seed, **kw)
    frames = _np.stack([seq.frame(i) for i in range(n_frames)])
    segs = _np.stack([seq.seg(i) for i in range(n_frames)])
    poses = _np.asarray(seq.poses)
    K = _np.asarray(seq.K, _np.float32)
    # np.savez appends .npz when missing — keep the suffix on the tmp
    # name so the atomic rename target exists.
    tmp = path + f".tmp{os.getpid()}.npz"
    _np.savez(tmp, frames=frames, segs=segs, poses=poses, K=K)
    os.replace(tmp, path)  # atomic: concurrent writers race benignly
    return frames, segs, poses, K
