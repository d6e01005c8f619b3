"""Tensor-parallel sharding rule tables: regex -> PartitionSpec.

SURVEY.md §2.2 P2: shard conv/dense channel dims of the nets over the
'model' mesh axis via NamedSharding rules (the SNIPPETS.md [2]
pattern). The nets are small, so TP here is a capability tier — GSPMD
inserts the resharding collectives; correctness is pinned by
tests/test_dist_tp.py (tp result == replicated result).

Rule semantics: first regex (searched against the '/'-joined param
path) wins; params whose matched dimension is not divisible by the
axis size fall back to replication (GSPMD requires even shards).
"""

from __future__ import annotations

import re

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Conv kernels are HWIO; shard output channels. Dense kernels are
# (in, out); shard out. Biases follow the output dim.
DEFAULT_TP_RULES: list[tuple[str, P]] = [
    (r"pose_head|disp\d+|flow/", P()),          # heads: tiny, replicate
    (r"Conv.*/kernel|enc\d+.*kernel|dec\d+.*kernel|feat.*kernel|est.*kernel",
     P(None, None, None, "model")),
    (r"Dense.*/kernel|fc\d+/kernel", P(None, "model")),
    (r"kernel$", P(None, None, None, "model")),
    (r"bias$", P("model")),
    (r".*", P()),
]


def _spec_fits(spec: P, shape: tuple, mesh: Mesh) -> bool:
    for dim, axis in zip(shape, spec):
        if axis is None:
            continue
        if dim % mesh.shape[axis] != 0:
            return False
    return len(spec) <= len(shape)


def match_partition_rules(
    params, mesh: Mesh, rules: list[tuple[str, P]] | None = None
):
    """Pytree of params -> pytree of NamedSharding."""
    rules = rules or DEFAULT_TP_RULES
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def spec_for(path, leaf) -> NamedSharding:
        name = "/".join(
            getattr(k, "key", getattr(k, "name", str(k))) for k in path
        )
        if np.ndim(leaf) == 0 or np.prod(np.shape(leaf)) == 1:
            return NamedSharding(mesh, P())
        for pattern, spec in rules:
            if re.search(pattern, name):
                if _spec_fits(spec, np.shape(leaf), mesh):
                    return NamedSharding(mesh, spec)
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, P())

    specs = {path: spec_for(path, leaf) for path, leaf in flat}
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(
        treedef, [specs[path] for path, _ in flat]
    )


def shard_params_tp(params, mesh: Mesh, rules=None):
    """Place params per the TP rule table."""
    shardings = match_partition_rules(params, mesh, rules)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
