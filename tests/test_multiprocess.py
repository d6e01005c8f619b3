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
    port = 29500 + os.getpid() % 400  # avoid cross-run TIME_WAIT clashes
    script = WORKER.replace("%PORT%", str(port))
    worker_py = tmp_path / "worker.py"
    worker_py.write_text(script)
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "PALLAS_AXON_POOL_IPS")
    }
    # File-backed logs: a 64 KB stdout PIPE can fill with Gloo/XLA
    # chatter and block a worker mid-collective (see the fault test).
    procs = []
    for i in range(2):
        with open(tmp_path / f"p{i}.log", "w") as log:
            procs.append(
                subprocess.Popen(
                    [sys.executable, str(worker_py), str(i)],
                    stdout=log,
                    stderr=subprocess.STDOUT,
                    text=True,
                    env=env,
                )
            )
    for p in procs:
        p.wait(timeout=300)
    for i, p in enumerate(procs):
        out = (tmp_path / f"p{i}.log").read_text()
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"proc {i} OK" in out


FAULT_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, "/root/repo")
pid = int(sys.argv[1]); phase = sys.argv[2]; ckpt_dir = sys.argv[3]

import jax
from davo_tpu.dist.bootstrap import initialize, local_batch_to_global
topo = initialize(
    coordinator_address="127.0.0.1:%PORT%", num_processes=2, process_id=pid
)

import numpy as np
import jax.numpy as jnp
import flax.serialization as fser
from jax.sharding import Mesh
from davo_tpu.config import Config, ModelConfig, TrainConfig
from davo_tpu.data.snippets import SnippetDataset
from davo_tpu.data.synthetic import SyntheticSequence
from davo_tpu.dist.train import make_sharded_train_step, shard_state
from davo_tpu.train.loop import create_state
import optax

cfg = Config(
    model=ModelConfig(
        img_height=48, img_width=64, pose_channels=(8, 12),
        disp_channels=(8, 12), num_scales=2, flow_levels=2,
        flow_search_range=2, attention="none", compute_dtype="float32",
    ),
    train=TrainConfig(batch_size=4, learning_rate=1e-3),
)
seq = SyntheticSequence(n_frames=10, height=48, width=64, seed=7)
ds = SnippetDataset(seq, batch_size=4, with_gt=True, seed=0)
batches = list(ds.batches(steps=8, shuffle=False))

model, state, tx = create_state(cfg, jax.random.key(0), batches[0])
mesh = Mesh(
    np.asarray(jax.devices()).reshape(4, 1, 1), ("data", "model", "window")
)
CKPT = os.path.join(ckpt_dir, "state.msgpack")
STEPF = os.path.join(ckpt_dir, "step.txt")
start = 0
if phase == "resume":
    # Restart-from-checkpoint: both processes restore the identical
    # committed state (replicated params -> same bytes everywhere).
    with open(CKPT, "rb") as f:
        state = fser.from_bytes(state, f.read())
    start = int(open(STEPF).read())
    assert start >= 2, f"crash-phase checkpoint missing (start={start})"
state = shard_state(state, mesh)
step_fn = make_sharded_train_step(model, tx, cfg, mesh)

losses = []
for i in range(start, len(batches)):
    gbatch = {
        k: jax.device_put(v, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("data", *([None] * (v.ndim - 1)))
        ))
        for k, v in batches[i].items()
    }
    state, metrics = step_fn(state, gbatch)
    loss = float(metrics["total"])
    losses.append(loss)
    if pid == 0:
        # Atomic commit: write-then-rename, step marker last.
        blob = fser.to_bytes(jax.device_get(state))
        tmp = CKPT + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, CKPT)
        with open(STEPF + ".tmp", "w") as f:
            f.write(str(i + 1))
        os.replace(STEPF + ".tmp", STEPF)
    if phase == "crash" and i == 2 and pid == 1:
        # Simulated host failure mid-training: hard exit, no cleanup.
        os._exit(17)

assert all(np.isfinite(losses)), losses
print(f"proc {pid} phase={phase} DONE start={start} last_loss={losses[-1]:.4f}", flush=True)
"""


@pytest.mark.slow
def test_fault_injection_restart_from_ckpt(tmp_path):
    """SURVEY.md §5 failure-recovery: kill one of two hosts mid-train,
    relaunch both, assert clean restart from the committed checkpoint
    and completion of the remaining steps."""
    port = 28900 + os.getpid() % 400  # avoid cross-run TIME_WAIT clashes
    script = FAULT_WORKER.replace("%PORT%", str(port))
    worker_py = tmp_path / "fault_worker.py"
    worker_py.write_text(script)
    ckpt_dir = tmp_path / "ckpt"
    os.makedirs(ckpt_dir)
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "PALLAS_AXON_POOL_IPS")
    }

    logs = {}

    def launch(phase):
        # Worker output goes to FILES: Gloo/XLA logs overflow a 64 KB
        # stdout PIPE and block the worker mid-print (observed: main
        # thread stuck in anon_pipe_write), deadlocking the lockstep
        # collectives before the injected crash is ever reached.
        procs = []
        for i in range(2):
            log = open(tmp_path / f"{phase}_p{i}.log", "w+")
            logs[(phase, i)] = log
            procs.append(
                subprocess.Popen(
                    [sys.executable, str(worker_py), str(i), phase, str(ckpt_dir)],
                    stdout=log,
                    stderr=subprocess.STDOUT,
                    text=True,
                    env=env,
                )
            )
        return procs

    def read_log(phase, i):
        logs[(phase, i)].flush()
        return (tmp_path / f"{phase}_p{i}.log").read_text()

    # Phase 1: proc 1 hard-exits at step 2. The survivor blocks on the
    # next collective; the driver (this test) detects the death and
    # tears the job down — the real-pod runbook.
    procs = launch("crash")
    procs[1].wait(timeout=300)
    assert procs[1].returncode == 17, (
        f"expected injected crash:\n{read_log('crash', 1)[-2000:]}"
    )
    try:
        procs[0].wait(timeout=10)
    except subprocess.TimeoutExpired:
        pass
    procs[0].kill()
    procs[0].wait()

    # The atomic checkpoint from before the crash must exist.
    assert (ckpt_dir / "state.msgpack").exists()
    assert int((ckpt_dir / "step.txt").read_text()) >= 2

    # Phase 2: relaunch both processes; they restore and finish.
    procs = launch("resume")
    for p in procs:
        p.wait(timeout=300)
    for i, p in enumerate(procs):
        out = read_log("resume", i)
        assert p.returncode == 0, f"resume proc {i} failed:\n{out[-3000:]}"
        assert f"proc {i} phase=resume DONE" in out
    assert int((ckpt_dir / "step.txt").read_text()) == 8
    for log in logs.values():
        log.close()
