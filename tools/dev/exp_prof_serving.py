"""Op-level profile of the serving forward (VERDICT r3 missing #3).

Where do the ~8.4 ms of the B=128 davo-fast forward go? The r2-era
"dispatch-bound, ~100 kernels" model was subtractive inference; this
harness produces a real per-component time table:

  1. Direct component timings (jitted in isolation, real param shapes):
     feature pyramid, flownet (pyramid + costvols + estimators + warp),
     attention net, full model per attention variant.
  2. Subtraction ladder: full(flow_seg) - model(flow) = attention+
     region cost; model(flow) - model(none) ~ flow cost (posenet input
     channels differ slightly: none has no flow channels — noted).
  3. A jax.profiler device trace attempt (perfetto JSON). If the
     tunnel supports it, the trace gives the true per-op table and is
     aggregated inline; if not, the component table stands alone.
  4. cost_analysis() FLOPs -> MFU per component (bench/sol.py peaks).

Resumable: per-arm JSON, skip-if-done.

Usage: tools/dev/tpu_run.sh tools/dev/exp_prof_serving.py 3600 5
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

from davo_tpu.bench.sol import V5E_BF16_TFLOPS
from davo_tpu.models import presets
from davo_tpu.models.davo import DavoModel
from davo_tpu.utils.profiling import timed

OUT = (
    sys.argv[1]
    if len(sys.argv) > 1
    else "/root/repo/results_r4_prof_serving.json"
)
B = 128

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


def record(name, fn, *args, flops=None):
    if name in res:
        print(f"{name}: done previously ({res[name]['ms']:.3f} ms)",
              flush=True)
        return res[name]["ms"]
    t = timed(fn, *args, iters=8, loops=5)
    entry = {"ms": t["ms"], "all_ms": t["all_ms"]}
    if flops is not None:
        entry["gflops"] = flops / 1e9
        entry["mfu_pct"] = (
            100.0 * flops / (t["ms"] / 1e3) / (V5E_BF16_TFLOPS * 1e12)
        )
    res[name] = entry
    save()
    print(
        f"{name:<36} {t['ms']:9.3f} ms"
        + (f"  MFU {entry['mfu_pct']:5.1f} %" if flops else ""),
        flush=True,
    )
    return t["ms"]


def jit_flops(fn, *args):
    try:
        c = jax.jit(fn).lower(*args).compile()
        ca = c.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception as e:  # noqa: BLE001
        print(f"  cost_analysis failed: {e}", flush=True)
        return None


rng = np.random.default_rng(0)
base = presets.get("davo-fast")
cfg = base.model
H, W = cfg.img_height, cfg.img_width
tgt = jnp.asarray(rng.uniform(size=(B, H, W, 3)), jnp.float32)
src = jnp.asarray(rng.uniform(size=(B, 1, H, W, 3)), jnp.float32)
seg = jnp.asarray(rng.integers(0, 19, (B, H, W)), jnp.int32)

variants = {}
for name in ("davo-fast", ):
    pass

# --- full model per attention variant (davo-fast knobs throughout) ---
models = {}
for attn in ("flow_seg", "flow", "none"):
    vcfg = presets.with_overrides("davo-fast", attention=attn).model
    m = DavoModel(vcfg)
    kw = dict(seg=seg) if attn == "flow_seg" else {}
    params = jax.jit(m.init, static_argnames=("train",))(
        jax.random.key(0), tgt, src, train=False, **kw
    )
    models[attn] = (m, params, kw)

    def fwd(t, _m=m, _p=params, _kw=kw):
        return _m.apply(_p, t, src, train=False, **_kw)["poses"]

    fl = jit_flops(fwd, tgt)
    record(f"full_{attn}", jax.jit(fwd), tgt, flops=fl)

m, params, kw = models["flow_seg"]

# --- components ---
both = jnp.concatenate([tgt, src[:, 0]], axis=0)


def pyramid_fn(x):
    return m.apply(
        params, x, method=lambda mm, xx: mm.flownet.pyramid(xx)
    )


fl = jit_flops(pyramid_fn, both)
record("pyramid_2B", jax.jit(pyramid_fn), both, flops=fl)


def flownet_fn(t, s):
    return m.apply(
        params, t, s, method=lambda mm, a, b: mm.flownet(a, b)
    )


fl = jit_flops(flownet_fn, tgt, src[:, 0])
record("flownet", jax.jit(flownet_fn), tgt, src[:, 0], flops=fl)

# attention net on full-res flow
flow_full = jnp.asarray(rng.normal(size=(B, H, W, 2)), jnp.float32)


def attn_fn(fl_):
    return m.apply(
        params, fl_, method=lambda mm, x: mm.attn(x)
    )


fl = jit_flops(attn_fn, flow_full)
record("attn_net", jax.jit(attn_fn), flow_full, flops=fl)

# region weight map + posenet with region fusion
from davo_tpu.models.attention import region_weight_map, seg_to_onehot

weights = jax.nn.softmax(
    jnp.asarray(rng.normal(size=(B, cfg.num_seg_classes)), jnp.float32)
)


# seg one-hot must be computed IN-GRAPH from the int seg (as the model
# does): materializing it host-side and capturing it in the jit
# closure bakes a ~500 MB constant into the program — the remote
# compile helper rejects the request body (HTTP 413).
def regionmap_fn(w, sg):
    oh = seg_to_onehot(sg, cfg.num_seg_classes).astype(jnp.float32)
    return region_weight_map(w, oh, (H // 16, W // 16))


record("region_weight_map", jax.jit(regionmap_fn), weights, seg)

extra = jnp.concatenate(
    [jnp.full((B, H, W, 1), -1.0, jnp.float32), flow_full], axis=-1
)


def posenet_fn(t, s, e, w, sg):
    oh = seg_to_onehot(sg, cfg.num_seg_classes).astype(jnp.float32)
    return m.apply(
        params, t, s, e, w, oh,
        method=lambda mm, a, b, c, ww, oo: mm.posenet(
            a, b, extra=c,
            region_weight_fn=lambda hw: region_weight_map(ww, oo, hw),
        ),
    )


fl = jit_flops(posenet_fn, tgt, src[:, 0], extra, weights, seg)
record("posenet_with_region", jax.jit(posenet_fn), tgt, src[:, 0], extra,
       weights, seg, flops=fl)

# costvol + estimator at each level (davo-fast: 3 levels, /4 /8 /16,
# pyramid channels from cfg)
from davo_tpu.models.flownet import cost_volume

lv_shapes = []
ch = list(cfg.pyramid_channels) if hasattr(cfg, "pyramid_channels") else None
for lv in range(1, cfg.flow_levels):
    h, w = H // (2 ** (lv + 1)), W // (2 ** (lv + 1))
    cproj = cfg.costvol_feat_channels or 32
    f1 = jnp.asarray(rng.normal(size=(B, h, w, cproj)), jnp.float32)
    f2 = jnp.asarray(rng.normal(size=(B, h, w, cproj)), jnp.float32)

    def cv_fn(a, b, _s=cfg.flow_search_range):
        return jax.nn.relu(cost_volume(a, b, _s))

    record(f"costvol_lv{lv}_{h}x{w}", jax.jit(cv_fn), f1, f2)

# flow warp (separable) at /8
from davo_tpu.core.warp import flow_warp_separable

h8, w8 = H // 8, W // 8
feat8 = jnp.asarray(rng.normal(size=(B, h8, w8, 32)), jnp.float32)
flow8 = jnp.asarray(rng.normal(size=(B, h8, w8, 2)), jnp.float32)
record(
    "flow_warp_separable_lv8",
    jax.jit(lambda f, fl_: flow_warp_separable(f, fl_)[0]),
    feat8, flow8,
)

# --- derived subtraction table ---
res["derived"] = {
    "attention_plus_region_ms": res["full_flow_seg"]["ms"]
    - res["full_flow"]["ms"],
    "flow_cost_ms": res["full_flow"]["ms"] - res["full_none"]["ms"],
    "note": "flow/none posenet input channels differ (no flow chans in "
            "none) — flow_cost_ms slightly overstates the flownet",
}
save()

# --- jax.profiler trace attempt ---
if "trace" not in res:
    trace_dir = "/tmp/davo_trace"
    entry = {"ok": False}
    try:
        fwd = jax.jit(
            lambda t: m.apply(params, t, src, train=False, **kw)["poses"]
        )
        fwd(tgt).block_until_ready()
        with jax.profiler.trace(trace_dir):
            for _ in range(3):
                fwd(tgt).block_until_ready()
        files = glob.glob(
            os.path.join(trace_dir, "**", "*.trace.json.gz"),
            recursive=True,
        )
        entry["files"] = files
        if files:
            with gzip.open(files[-1], "rt") as f:
                tr = json.load(f)
            evs = [
                e
                for e in tr.get("traceEvents", [])
                if e.get("ph") == "X" and e.get("dur")
            ]
            # Aggregate device-op durations by name; pick the process
            # with 'TPU' in its name if present.
            pid_names = {
                e["pid"]: e["args"].get("name", "")
                for e in tr.get("traceEvents", [])
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "args" in e
            }
            agg: dict = {}
            for e in evs:
                pname = pid_names.get(e.get("pid"), "")
                if "TPU" not in pname and "tpu" not in pname:
                    continue
                agg[e["name"]] = agg.get(e["name"], 0.0) + e["dur"]
            top = sorted(agg.items(), key=lambda kv: -kv[1])[:40]
            entry["top_ops_us_over_3_calls"] = top
            entry["ok"] = bool(top)
            print("trace top ops (us over 3 calls):", flush=True)
            for name, us in top[:20]:
                print(f"  {us:12.0f}  {name}", flush=True)
    except Exception as e:  # noqa: BLE001
        entry["error"] = repr(e)
        print(f"trace attempt failed: {e!r}", flush=True)
    res["trace"] = entry
    save()

print(json.dumps({k: v.get("ms") if isinstance(v, dict) else None
                  for k, v in res.items()}, indent=1), flush=True)
print("->", OUT, flush=True)
