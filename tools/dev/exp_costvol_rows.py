"""In-context measurement of costvol_impl="pallas_rows" (r3).

The r2c profile showed the cost volume's cost scales with SLICE-KERNEL
COUNT (~33 us dispatch each; search=3 x 3 levels = 147 kernels). The
rows-layout one-kernel-per-level Pallas costvol collapses that to 3
dispatches with no transpose on its output path. This measures the
REAL davo-fast serving program (the r1 lesson: kernels that win
standalone can lose in context by blocking XLA fusion — the old
use_pallas kernel cost 1,100 fps e2e).

Results append to serving_probe_results.json (repo root) so
`update_bench_flags.py` can promote a measured, equality-checked win
into BENCH_FLAGS.json. Probes are resumable: a probe recorded as
"started" with no result (a hung remote compile killed by tpu_run.sh)
is skipped on retry instead of re-hanging the whole job.

Usage: tools/dev/tpu_run.sh tools/dev/exp_costvol_rows.py 3600 3
"""

import dataclasses
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from davo_tpu.models import presets
from davo_tpu.models.davo import DavoModel
from davo_tpu.utils.profiling import timed

B = 128

# Per-computation PJRT compiler options, forwarded unvalidated to the
# axon helper's libtpu (XLA_FLAGS cannot carry TPU-only flags: this
# jaxlib's client-side parser FATALS on unknown flags). The scoped-
# vmem raise lets XLA stack-allocate the fused kernels' operands/
# results in VMEM (the 16M-default OOM that killed every fused arm,
# R3_RESULTS). Applied ONLY to arms that need it (fused/pallas):
# baselines stay option-free so promotion compares candidates against
# the true production program (copts2 d/e measured the option tax at
# -9.5 % on the same program). Recorded per arm; promoted with the
# winner. 131072 KiB: the level-2 costvol's promotion footprint is
# 112.68M, which fits v5e's 128M VMEM (copts2 arm f PASSes).
COMPILER_OPTIONS = {"xla_tpu_scoped_vmem_limit_kib": "131072"}


def _needs_opts(over: dict) -> bool:
    return any(
        k.startswith("fuse_") and v is True for k, v in over.items()
    ) or str(over.get("costvol_impl", "")).startswith("pallas")


def bench(tag, cfg, opts=None):
    rng = np.random.default_rng(0)
    H, W = cfg.img_height, cfg.img_width
    t = jnp.asarray(rng.uniform(size=(B, H, W, 3)), jnp.float32)
    s = jnp.asarray(rng.uniform(size=(B, 1, H, W, 3)), jnp.float32)
    seg = jnp.asarray(rng.integers(0, 19, (B, H, W)), jnp.int32)
    model = DavoModel(cfg)
    params = jax.jit(model.init, static_argnames=("train",))(
        jax.random.key(0), t, s, train=False, seg=seg
    )
    low = jax.jit(
        lambda a, b, c: model.apply(params, a, b, seg=c, train=False)[
            "poses"
        ]
    ).lower(t, s, seg)
    f = low.compile() if not opts else low.compile(compiler_options=opts)
    out = jax.block_until_ready(f(t, s, seg))
    r = timed(f, t, s, seg, iters=10, loops=5)
    print(
        f"{tag:<36} {r['ms']:8.2f} ms  {B / r['ms'] * 1000:7.0f} fps",
        flush=True,
    )
    return np.asarray(out), r["ms"]


RESULTS = os.path.join(
    os.path.dirname(__file__), "..", "..", "serving_probe_results.json"
)
MAX_ATTEMPTS = 2  # kills are often transient (tunnel claim hangs);
                  # give every probe a second try before branding it
                  # hung and skipping it for good.

from probe_common import compile_error_summary, fingerprint  # noqa: E402


def _load_results() -> dict:
    fp = fingerprint()
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            res = json.load(f)
        if res.get("_fingerprint") == fp:
            return res
        print(
            "results fingerprint stale (kernels/models changed since "
            "they were measured); starting fresh",
            flush=True,
        )
    return {"_fingerprint": fp}


def _save_results(res: dict) -> None:
    tmp = RESULTS + ".tmp"
    with open(tmp, "w") as f:
        json.dump(res, f, indent=1, sort_keys=True)
        f.write("\n")
    os.replace(tmp, RESULTS)


def main():
    print("devices:", jax.devices(), flush=True)
    fast = presets.get("davo-fast").model
    davo = presets.get("davo").model
    res = _load_results()

    # The baseline's full-model compile is the job's biggest (~145 s
    # cold); give it the same hang protection as the probes. ref_out
    # is needed in-process for equality checks, so it re-RUNS on every
    # attempt (compile-cached after the first success).
    base_tag = "davo-fast (slices baseline)"
    base_prev = res.get(base_tag, {})
    attempts = base_prev.get("attempts", 0)
    if base_prev.get("status") == "started" and attempts >= MAX_ATTEMPTS:
        print(
            f"baseline hung {attempts}x; giving up on this probe job",
            flush=True,
        )
        return
    res[base_tag] = {**base_prev, "status": "started", "attempts": attempts + 1}
    _save_results(res)
    ref_out, ref_ms = bench(base_tag, fast)
    res[base_tag] = {
        "status": "done", "ms": ref_ms, "fps": B / ref_ms * 1000,
        "base": "davo-fast", "overrides": {}, "equality_checked": False,
        "out_absmax": float(np.abs(ref_out).max()),
        "attempts": attempts + 1,
        "compiler_options": {},
    }
    _save_results(res)

    # Every probe is independent: a Mosaic failure in one must not
    # skip the rest (TPU access is scarce and serialized).
    # (tag, base preset, model-field overrides, equality-checked).
    probes = [
        (
            "davo-fast (pallas_rows)", "davo-fast",
            {"costvol_impl": "pallas_rows"}, True,
        ),
        ("davo (slices baseline)", "davo", {}, False),
        ("davo (pallas_rows)", "davo", {"costvol_impl": "pallas_rows"}, False),
        (
            "davo-fast (fuse_estimator)", "davo-fast",
            {"fuse_estimator": True}, True,
        ),
        (
            "davo-fast (fused est + rows cv)", "davo-fast",
            {"fuse_estimator": True, "costvol_impl": "pallas_rows"}, True,
        ),
        (
            "davo-fast (fuse_flow_level)", "davo-fast",
            {"fuse_flow_level": True}, True,
        ),
        ("davo (fuse_flow_level)", "davo", {"fuse_flow_level": True}, False),
        (
            "davo-fast (fuse_pose_encoder)", "davo-fast",
            {"fuse_pose_encoder": True}, True,
        ),
        (
            "davo-fast (fuse_attention)", "davo-fast",
            {"fuse_attention": True}, True,
        ),
        (
            "davo-fast (fuse_pyramid)", "davo-fast",
            {"fuse_pyramid": True}, True,
        ),
        (
            "davo-fast (all fused)", "davo-fast",
            {
                "fuse_flow_level": True,
                "fuse_pyramid": True,
                "fuse_pose_encoder": True,
                "fuse_attention": True,
            },
            True,
        ),
        # f32 twins: the bf16 fused chains die in Mosaic with "Bad lhs
        # type" (r3; suspected bf16 row-slice LHS into the MXU dot).
        # fuse_compute flips only the KERNEL dtype (the XLA path stays
        # bf16), so these isolate the bf16 cause cleanly and are
        # promotable if they win within tolerance.
        (
            "davo-fast (fuse_estimator f32)", "davo-fast",
            {"fuse_estimator": True, "fuse_compute": "float32"}, True,
        ),
        (
            "davo-fast (fuse_flow_level f32)", "davo-fast",
            {"fuse_flow_level": True, "fuse_compute": "float32"}, True,
        ),
        (
            "davo-fast (all fused f32)", "davo-fast",
            {
                "fuse_flow_level": True,
                "fuse_pyramid": True,
                "fuse_pose_encoder": True,
                "fuse_attention": True,
                "fuse_compute": "float32",
            },
            True,
        ),
        # bf16_dot twins: f32 in-kernel scratch, operands cast to bf16
        # only at each MXU dot (kernels/rowconv._DTYPE_MODES) — the
        # "Bad lhs type" rewrite candidate at full bf16 MXU rate.
        (
            "davo-fast (fuse_estimator bf16_dot)", "davo-fast",
            {"fuse_estimator": True, "fuse_compute": "bf16_dot"}, True,
        ),
        (
            "davo-fast (fuse_flow_level bf16_dot)", "davo-fast",
            {"fuse_flow_level": True, "fuse_compute": "bf16_dot"}, True,
        ),
        (
            "davo-fast (all fused bf16_dot)", "davo-fast",
            {
                "fuse_flow_level": True,
                "fuse_pyramid": True,
                "fuse_pose_encoder": True,
                "fuse_attention": True,
                "fuse_compute": "bf16_dot",
            },
            True,
        ),
        # Cheap config probe: 3-level pyramid saved ~10 % on paper-davo
        # (r2c); if it repeats, a quality gate (e2e tier) decides.
        ("davo-fast (flow_levels=3)", "davo-fast", {"flow_levels": 3}, False),
        (
            "davo-fast (rows + levels=3)", "davo-fast",
            {"costvol_impl": "pallas_rows", "flow_levels": 3}, False,
        ),
    ]
    bases = {"davo-fast": fast, "davo": davo}
    for tag, base, over, check_equal in probes:
        prev = res.get(tag, {})
        attempts = prev.get("attempts", 0)
        if prev.get("status") in ("done", "hung"):
            print(
                f"{tag}: {prev['status']} on a previous attempt, skipping",
                flush=True,
            )
            continue
        if prev.get("status") == "started" and attempts >= MAX_ATTEMPTS:
            # Started twice without finishing = reproducibly hangs the
            # remote compiler (not a transient claim hang). Brand it so
            # retries stop re-hanging the job on it.
            print(
                f"{tag}: hung {attempts}x, branding hung and skipping",
                flush=True,
            )
            res[tag] = {**prev, "status": "hung"}
            _save_results(res)
            continue
        opts = COMPILER_OPTIONS if _needs_opts(over) else {}
        res[tag] = {
            "status": "started", "base": base, "overrides": over,
            "equality_checked": check_equal, "attempts": attempts + 1,
            # Provenance: the fused kernels only compile under the
            # scoped-vmem compiler option (R3_RESULTS); a promoted
            # winner must carry the options it was measured under.
            "compiler_options": opts,
        }
        _save_results(res)
        try:
            out, ms = bench(
                tag, dataclasses.replace(bases[base], **over), opts
            )
        except Exception as e:
            err = compile_error_summary(e)
            print(f"{tag} FAILED: {err}", flush=True)
            res[tag].update(status="failed", error=err)
            _save_results(res)
            continue
        res[tag].update(status="done", ms=ms, fps=B / ms * 1000)
        if check_equal:
            maxerr = float(np.abs(ref_out - out).max())
            res[tag]["maxerr"] = maxerr
            print(f"  pose-vs-baseline maxerr={maxerr:.3e}", flush=True)
        _save_results(res)


if __name__ == "__main__":
    main()
