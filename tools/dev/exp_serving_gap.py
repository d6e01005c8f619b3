"""Attribute the serving wall-vs-device gap (r5, VERDICT r4 missing #6).

r4 established: device time 6.13 ms/call at B=128 vs 8.96 ms wall,
and scan-batching K calls into one dispatch does NOT recover it
(closed negative, results_r4_serving_scan.json) — so the ~2.8 ms is
either (a) host dispatch cost that chained async dispatch cannot
hide (device idles BETWEEN programs), or (b) a per-call RPC floor of
the tunnel. Probes, at the production bench batch (B=256, davo-fast):

  chain_curve  per-call wall at chain depths 1..32: if the per-call
               cost falls with depth, dispatch pipelines and the
               bench protocol (depth 8) is already near the floor.
  donate       donate_argnums on the inputs (pre-staged distinct
               buffers): does input aliasing/copy own part of the gap?
  trace_busy   device trace over 5 free-running chained calls ->
               device BUSY vs wall SPAN: the direct idle-per-call
               measurement. idle ~0 => the gap is device-side layout/
               copy work (already counted busy); idle ~gap => host/RPC
               dispatch floor -> write the ceiling into BASELINE.

Usage: tools/dev/tpu_run.sh tools/dev/exp_serving_gap.py 2400 3
"""

import glob
import gzip
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from davo_tpu.models import presets
from davo_tpu.models.davo import DavoModel

OUT = (
    sys.argv[1]
    if len(sys.argv) > 1
    else "/root/repo/results_r5_serving_gap.json"
)
B = 256

print("devices:", jax.devices(), flush=True)
assert jax.devices()[0].platform == "tpu", "CPU fallback — abort"

res: dict = {}
if os.path.exists(OUT):
    with open(OUT) as f:
        res = json.load(f)


def save():
    with open(OUT + ".tmp", "w") as f:
        json.dump(res, f, indent=1, default=float)
        f.write("\n")
    os.replace(OUT + ".tmp", OUT)


cfg = presets.get("davo-fast").model
H, W = cfg.img_height, cfg.img_width
model = DavoModel(cfg)
rng = np.random.default_rng(0)
tgt = jnp.asarray(rng.uniform(size=(B, H, W, 3)), jnp.float32)
src = jnp.asarray(rng.uniform(size=(B, 1, H, W, 3)), jnp.float32)
seg = jnp.asarray(rng.integers(0, 19, (B, H, W)), jnp.int32)
params = jax.jit(model.init, static_argnames=("train",))(
    jax.random.key(0), tgt, src, seg=seg, train=False
)


@jax.jit
def infer(t, s, g):
    return model.apply(params, t, s, seg=g, train=False)["poses"]


jax.block_until_ready(infer(tgt, src, seg))

if "chain_curve" in res:
    print("chain_curve: done previously", flush=True)
else:
    curve = {}
    for depth in (1, 2, 4, 8, 16, 32):
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(depth):
                y = infer(tgt, src, seg)
            jax.block_until_ready(y)
            times.append((time.perf_counter() - t0) / depth)
        curve[str(depth)] = min(times) * 1e3
        print(f"  depth {depth:2d}: {curve[str(depth)]:.3f} ms/call",
              flush=True)
    res["chain_curve"] = curve
    save()

if "donate" in res:
    print("donate: done previously", flush=True)
else:
    infer_d = jax.jit(
        lambda t, s, g: model.apply(params, t, s, seg=g, train=False)[
            "poses"
        ],
        donate_argnums=(0, 1, 2),
    )
    # Pre-stage 8 distinct input sets per loop (donated buffers are
    # dead after the call). Staging happens OUTSIDE the timed region.
    times = []
    for _ in range(5):
        sets = [
            (jnp.copy(tgt), jnp.copy(src), jnp.copy(seg))
            for _ in range(8)
        ]
        jax.block_until_ready(sets[-1][0])
        t0 = time.perf_counter()
        for t_, s_, g_ in sets:
            y = infer_d(t_, s_, g_)
        jax.block_until_ready(y)
        times.append((time.perf_counter() - t0) / 8)
    res["donate"] = {"ms_per_call": min(times) * 1e3}
    print(f"donate: {res['donate']['ms_per_call']:.3f} ms/call",
          flush=True)
    save()

if "trace_busy" in res:
    print("trace_busy: done previously", flush=True)
else:
    trace_dir = "/tmp/davo_gap_trace"
    entry = {"ok": False}
    try:
        with jax.profiler.trace(trace_dir):
            for _ in range(5):  # free-running chain, one final fence
                y = infer(tgt, src, seg)
            jax.block_until_ready(y)
        files = sorted(
            glob.glob(
                os.path.join(trace_dir, "**", "*.trace.json.gz"),
                recursive=True,
            ),
            key=os.path.getmtime,
        )
        if files:
            with gzip.open(files[-1], "rt") as f:
                tr = json.load(f)
            pid_names = {
                e["pid"]: e["args"].get("name", "")
                for e in tr.get("traceEvents", [])
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "args" in e
            }
            # Only LEAF device ops (thread-level X events on the TPU
            # pid); sum busy, span = last end - first start.
            evs = [
                e
                for e in tr.get("traceEvents", [])
                if e.get("ph") == "X"
                and e.get("dur")
                and "TPU" in pid_names.get(e.get("pid"), "")
            ]
            if evs:
                # A pid can have several tid rows (op queue vs
                # steps); use the tid with the max busy sum as "the"
                # compute stream to avoid double-counting nests.
                by_tid: dict = {}
                for e in evs:
                    by_tid.setdefault(e["tid"], []).append(e)
                tid, tevs = max(
                    by_tid.items(),
                    key=lambda kv: sum(e["dur"] for e in kv[1]),
                )
                busy = sum(e["dur"] for e in tevs)
                t0 = min(e["ts"] for e in tevs)
                t1 = max(e["ts"] + e["dur"] for e in tevs)
                entry.update(
                    ok=True,
                    n_events=len(tevs),
                    tid=tid,
                    busy_us_per_call=busy / 5.0,
                    span_us_per_call=(t1 - t0) / 5.0,
                    idle_us_per_call=((t1 - t0) - busy) / 5.0,
                )
                print(
                    f"trace: busy {entry['busy_us_per_call']:.0f} us  "
                    f"span {entry['span_us_per_call']:.0f} us  "
                    f"idle {entry['idle_us_per_call']:.0f} us /call",
                    flush=True,
                )
    except Exception as e:  # noqa: BLE001
        entry["error"] = repr(e)
        print(f"trace failed: {e!r}", flush=True)
    res["trace_busy"] = entry
    save()

print(json.dumps(res, indent=1, default=float), flush=True)
print("->", OUT, flush=True)
