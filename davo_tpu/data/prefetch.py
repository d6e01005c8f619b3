"""Host->device prefetch: overlap H2D transfer with device compute.

The reference relies on TF1 queue runners (SURVEY.md R9); the
TPU-native equivalent is a small double-buffered iterator that calls
`jax.device_put` (optionally with a `NamedSharding` so per-host batches
land directly on the right mesh shards) one batch ahead of consumption,
letting the copy overlap the previous step's compute.
"""

from __future__ import annotations

import collections
from typing import Iterable, Iterator

import jax


def device_prefetch(
    batches: Iterable[dict],
    sharding=None,
    buffer_size: int = 2,
) -> Iterator[dict]:
    """Yield device-resident batches, staying `buffer_size` ahead.

    `sharding` may be a single sharding applied to every leaf or a dict
    mapping batch keys to shardings (e.g. batch-axis NamedSharding for
    arrays, replicated for intrinsics).
    """

    def put(batch: dict) -> dict:
        out = {}
        for key, val in batch.items():
            s = sharding.get(key) if isinstance(sharding, dict) else sharding
            out[key] = jax.device_put(val, s) if s is not None else jax.device_put(val)
        return out

    queue: collections.deque = collections.deque()
    it = iter(batches)
    try:
        for _ in range(buffer_size):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield out
