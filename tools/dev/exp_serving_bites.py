"""Serving perf bites, informed by the r4 op-level profile.

results_r4_prof_serving.json: device time is 6.13 ms/call at B=128
against 8.96 ms wall — a ~2.8 ms host/dispatch gap — and ~0.7 ms of
the device time is pure layout copies. Bites probed here:

  1. Batch amortization: the dispatch gap is per-call, so larger
     batches buy fps directly (B=64's 15.7 ms outlier says the sweep
     must be measured, not assumed). B in {128, 192, 256, 384, 512}.
  2. Name the top trace fusions: dump the compiled HLO and map the
     trace's fusion.N names to their root ops, so the next XLA-level
     bite has a target (e.g. fusion.3 at 700 us/call).

Usage: tools/dev/tpu_run.sh tools/dev/exp_serving_bites.py 3600 5
"""

import json
import os
import re
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
    else "/root/repo/results_r4_serving_bites.json"
)

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

params = None
for B in (128, 192, 256, 384, 512):
    tag = f"fps_B{B}"
    if tag in res:
        print(f"{tag}: done previously ({res[tag]['fps']:.0f} fps)",
              flush=True)
        continue
    tgt = jnp.asarray(rng.uniform(size=(B, H, W, 3)), jnp.float32)
    src = jnp.asarray(rng.uniform(size=(B, 1, H, W, 3)), jnp.float32)
    seg = jnp.asarray(rng.integers(0, 19, (B, H, W)), jnp.int32)
    if params is None:
        params = jax.jit(model.init, static_argnames=("train",))(
            jax.random.key(0), tgt, src, seg=seg, train=False
        )

    @jax.jit
    def infer(t, s, g):
        return model.apply(params, t, s, seg=g, train=False)["poses"]

    try:
        y = infer(tgt, src, seg)
        jax.block_until_ready(y)
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(8):
                y = infer(tgt, src, seg)
            jax.block_until_ready(y)
            times.append((time.perf_counter() - t0) / 8)
        ms = min(times) * 1e3
        res[tag] = {
            "ms": ms, "fps": B / ms * 1e3,
            "med_fps": B / (sorted(times)[2] * 1e3) * 1e3,
        }
        print(f"{tag:<10} {ms:8.3f} ms  {res[tag]['fps']:8.0f} fps "
              f"(med {res[tag]['med_fps']:.0f})", flush=True)
    except Exception as e:  # noqa: BLE001
        res[tag] = {"error": " ".join(str(e).split())[:300]}
        print(f"{tag}: FAIL {res[tag]['error'][:120]}", flush=True)
    save()

# --- map trace fusion names to HLO ops (B=128) ---
if "fusion_map" not in res:
    B = 128
    tgt = jnp.asarray(rng.uniform(size=(B, H, W, 3)), jnp.float32)
    src = jnp.asarray(rng.uniform(size=(B, 1, H, W, 3)), jnp.float32)
    seg = jnp.asarray(rng.integers(0, 19, (B, H, W)), jnp.int32)

    @jax.jit
    def infer128(t, s, g):
        return model.apply(params, t, s, seg=g, train=False)["poses"]

    hlo = infer128.lower(tgt, src, seg).compile().as_text()
    with open("/tmp/davo_fwd_hlo.txt", "w") as f:
        f.write(hlo)
    prof = {}
    ppath = "/root/repo/results_r4_prof_serving.json"
    if os.path.exists(ppath):
        with open(ppath) as f:
            prof = json.load(f)
    tops = (prof.get("trace") or {}).get("top_ops_us_over_3_calls", [])
    fmap = {}
    for name, us in tops[:25]:
        # fusion.N / copy.N / concatenate.N appear as %name = ... in HLO
        pat = re.compile(
            r"^\s*%?" + re.escape(name) + r"\s*=\s*(.+)$", re.M
        )
        mt = pat.search(hlo)
        line = mt.group(1)[:220] if mt else "<not found>"
        # For fusions, also grab the fused computation's root op kinds.
        fmap[name] = {"us_per_call": us / 3.0, "hlo": line}
        if name.startswith("fusion") and mt:
            cm = re.search(r"calls=(%?[\w.\-]+)", mt.group(1))
            if cm:
                comp = cm.group(1).lstrip("%")
                body = re.search(
                    re.escape(comp) + r"\s*(?:\([^)]*\))?\s*->[^{]*\{(.*?)\n\}",
                    hlo, re.S,
                )
                if body:
                    kinds = sorted(set(re.findall(
                        r"=\s*[\w\[\],<>{}\s]*?\b"
                        r"(convolution|dot|gather|scatter|reduce-window"
                        r"|reduce|transpose|broadcast|iota|concatenate"
                        r"|dynamic-slice|select|exponential|divide"
                        r"|multiply|add|subtract|maximum|convert)\b",
                        body.group(1),
                    )))
                    fmap[name]["fused_ops"] = kinds
    res["fusion_map"] = fmap
    save()
    for name, info in fmap.items():
        print(f"{info['us_per_call']:9.1f} us  {name:<ose18}"
              if False else
              f"{info['us_per_call']:9.1f} us  {name:<18} "
              f"{','.join(info.get('fused_ops', []))[:60]}",
              flush=True)
    print("HLO dumped to /tmp/davo_fwd_hlo.txt", flush=True)

print("->", OUT, flush=True)
