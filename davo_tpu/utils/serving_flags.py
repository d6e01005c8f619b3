"""Hardware-validated serving flags (BENCH_FLAGS.json) for production.

`tools/dev/update_bench_flags.py` writes BENCH_FLAGS.json only after a
fused-serving candidate ran on the real chip, matched the XLA
baseline's poses, and won throughput. This module is the package-side
reader: the same gate bench.py applies (validated_on == "tpu" AND the
kernel/model fingerprint matches the installed code), exposed to the
CLI (`infer --serving-flags`) so promoted wins serve production too.

A winner may carry per-computation PJRT compiler options (e.g. the
scoped-vmem raise the fused kernels need — R3_RESULTS.md; XLA_FLAGS
cannot carry TPU-only flags, the client parser fatals). Those must be
applied via `lower().compile(compiler_options=...)`, and only on the
TPU backend: other backends reject unknown options.
"""

from __future__ import annotations

import hashlib
import json
import os

_PKG = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ROOT = os.path.dirname(_PKG)

# The files whose content defines serving semantics: probe results and
# promoted flags measured against different content are stale.
FINGERPRINT_FILES = (
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
    for rel in FINGERPRINT_FILES:
        with open(os.path.join(ROOT, rel), "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:16]


def load_validated_flags(path: str | None = None) -> dict:
    """Gated BENCH_FLAGS load: returns {} unless the file exists, was
    validated on TPU, and fingerprints the current code. Otherwise
    returns {"overrides": {...}, "compiler_options": {...}, ...}."""
    path = path or os.path.join(ROOT, "BENCH_FLAGS.json")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        flags = json.load(f)
    if (
        flags.get("validated_on") == "tpu"
        and flags.get("fingerprint") == fingerprint()
    ):
        return flags
    return {}
