"""Multi-host logic over loopback: N local processes, one coordinator
(SURVEY.md §4.4). Validates jax.distributed bootstrap, global mesh
construction across processes, per-process data sharding, and a psum
crossing process boundaries."""

import os
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, "/root/repo")
import jax
from davo_tpu.dist.bootstrap import initialize, local_batch_to_global

topo = initialize(
    coordinator_address="127.0.0.1:%PORT%",
    num_processes=2,
    process_id=int(sys.argv[1]),
)
assert topo.num_processes == 2, topo
assert topo.global_device_count == 4, topo

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

mesh = Mesh(np.asarray(jax.devices()).reshape(4, 1, 1), ("data", "model", "window"))
# Each process contributes its local half of a global batch of 4.
local = {"x": np.full((2, 3), float(topo.process_id), np.float32)}
gbatch = local_batch_to_global(local, mesh)
assert gbatch["x"].shape == (4, 3)

@jax.jit
def total(x):
    return x.sum()

# sum = 2 rows of 0 + 2 rows of 1, 3 cols -> 6
val = float(total(gbatch["x"]))
assert val == 6.0, val
print(f"proc {topo.process_id} OK sum={val}", flush=True)
"""


@pytest.mark.slow
def test_two_process_loopback(tmp_path):
    port = 29512
    script = WORKER.replace("%PORT%", str(port))
    worker_py = tmp_path / "worker.py"
    worker_py.write_text(script)
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "PALLAS_AXON_POOL_IPS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker_py), str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outputs.append(out)
    for i, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"proc {i} OK" in out
