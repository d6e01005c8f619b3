"""Shared helpers for the serving-probe harness.

`fingerprint()` hashes the source files that determine probe semantics
(kernels + model wiring + presets/config): results recorded against a
different fingerprint are stale — the code they validated no longer
exists — and must be discarded rather than promoted into
BENCH_FLAGS.json.
"""

from __future__ import annotations

import hashlib
import os

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))

_FILES = (
    "davo_tpu/kernels/rowconv.py",
    "davo_tpu/kernels/costvol.py",
    "davo_tpu/models/flownet.py",
    "davo_tpu/models/attention.py",
    "davo_tpu/models/posenet.py",
    "davo_tpu/models/davo.py",
    "davo_tpu/models/presets.py",
    "davo_tpu/config.py",
)


def fingerprint() -> str:
    h = hashlib.sha256()
    for rel in _FILES:
        with open(os.path.join(ROOT, rel), "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:16]
