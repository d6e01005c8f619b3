"""Pre-render the round's eval worlds into /tmp/world_cache on CPU.

The chip-claim protocol serializes everything behind the TPU job, so
a cache miss on the 128x416 1,300-frame drive eval world costs ~35
min of claimed-chip time (R5 ledger). This renders every world the
r5 queue needs, cheapest first, so the first chip jobs hit cache
within minutes and the big render completes in parallel with the
early (tiny-preset) arms.

Usage: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python tools/dev/prerender_worlds.py
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from probe_common import cached_eval_world  # noqa: E402
from exp_quality_ladder4 import WANDER_KW  # noqa: E402
from exp_quality_ladder5 import DRIVE_KW  # noqa: E402

WORLDS = [
    # (kind, seed, n_frames, H, W, kw) — cheapest first.
    ("wander", 1, 400, 48, 64, WANDER_KW),      # ladder4b train-diag
    ("drive", 99, 1300, 48, 64, DRIVE_KW),      # ladder7 eval
    ("wander", 99, 1300, 48, 64, WANDER_KW),    # ladder4b/unsup eval
    ("drive", 99, 1300, 128, 416, DRIVE_KW),    # warp gate + ratchet
]

for kind, seed, n, H, W, kw in WORLDS:
    t0 = time.time()
    frames, _, _, _ = cached_eval_world(kind, seed, n, H, W, kw)
    print(
        f"{kind} s{seed} n{n} {H}x{W}: ready in {time.time() - t0:.0f}s "
        f"({frames.nbytes / 1e6:.0f} MB)",
        flush=True,
    )
print("all worlds cached", flush=True)
