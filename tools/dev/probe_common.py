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
