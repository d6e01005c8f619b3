"""BA linear-solve speed-of-light artifact (r5, VERDICT r4 missing #5).

BASELINE's kernel row names two hot kernels: the conv-attention
forward (profiled r4: 16 % MFU, 6.13 ms device) and the BA Schur
solve — which had no on-chip measurement at all. This times the full
reduced-camera pipeline (ba/schur.py: assemble -> Schur reduce ->
gauge-fixed LU -> landmark backsubstitution) at realistic sliding-
window sizes and compares against an analytic v5e roofline
(bench/sol.py constants).

Expectation to verify, not assume: at M~8-16 poses, N~256-4k
landmarks the whole pipeline is a few MFLOP of f32 einsums — far
below the MXU's microsecond floor — so the measured time should be
DISPATCH/LATENCY-bound, and the honest SoL claim is a per-call floor
(the same ~tens-of-us class as the serving profile's per-fusion
cost), not a bandwidth number. The JSON records both.

Usage: tools/dev/tpu_run.sh "tools/dev/exp_ba_sol.py [OUT]" 1800 3
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from davo_tpu.ba.schur import (
    backsubstitute,
    gauss_newton_system,
    schur_reduce,
    solve_window,
)
from davo_tpu.bench.sol import V5E_BF16_TFLOPS, V5E_HBM_GBPS

OUT = (
    sys.argv[1]
    if len(sys.argv) > 1
    else "/root/repo/results_r5_ba_sol.json"
)
F32_TFLOPS = V5E_BF16_TFLOPS / 2.0  # MXU f32 rate (no bf16 packing)


def analytic(M, N):
    """FLOPs + minimum HBM bytes of the schur pipeline at (M, N)."""
    fl = 0.0
    fl += 2.0 * M * N * 2 * 36       # JtJp
    fl += 2.0 * M * N * 2 * 9        # JtJl
    fl += 2.0 * M * N * 2 * 18       # E
    fl += 2.0 * M * N * 6 * 9        # E C^-1
    fl += 2.0 * M * M * N * 108      # S_off (dominant)
    fl += N * 120.0                  # batched 3x3 inverses
    fl += (2.0 / 3.0) * (6 * M) ** 3  # LU
    fl += 2.0 * M * N * 18 + 2.0 * N * 9  # backsubstitution
    by = 4.0 * M * N * (12 + 6 + 2 + 1)   # J_pose, J_point, r, w in
    by += 4.0 * M * N * 18 * 3            # E materialized + read 2x
    by += 4.0 * M * N * 18                # ECi
    by += 4.0 * (M * M * 36 + N * 9 * 2 + M * 6 + N * 3)
    compute_us = fl / (F32_TFLOPS * 1e12) * 1e6
    memory_us = by / (V5E_HBM_GBPS * 1e9) * 1e6
    return {
        "flops": fl,
        "bytes": by,
        "compute_bound_us": compute_us,
        "memory_bound_us": memory_us,
        "roofline_us": max(compute_us, memory_us),
    }


def measure(M, N, loops=5, inner=20):
    rng = np.random.default_rng(0)
    J_pose = jnp.asarray(rng.normal(size=(M, N, 2, 6)), jnp.float32)
    J_point = jnp.asarray(rng.normal(size=(M, N, 2, 3)), jnp.float32)
    resid = jnp.asarray(rng.normal(size=(M, N, 2)), jnp.float32)
    weights = jnp.asarray(rng.uniform(0.1, 1.0, (M, N)), jnp.float32)

    @jax.jit
    def pipeline(Jp, Jl, r, w):
        B, C, E, rp, rl = gauss_newton_system(Jp, Jl, r, w)
        S, rhs, C_inv = schur_reduce(B, C, E, rp, rl, 1e-4)
        dx_pose = solve_window(S, rhs)
        dx_point = backsubstitute(C_inv, E, rl, dx_pose)
        return dx_pose, dx_point

    dxp, dxl = pipeline(J_pose, J_point, resid, weights)
    float(jnp.sum(dxp))  # warm + fence
    times = []
    for _ in range(loops):
        t0 = time.perf_counter()
        for _ in range(inner):
            dxp, dxl = pipeline(J_pose, J_point, resid, weights)
        float(jnp.sum(dxp) + jnp.sum(dxl))  # D2H fence
        times.append((time.perf_counter() - t0) / inner)
    return min(times) * 1e6, [t * 1e6 for t in times]


def measure_batched(K, M, N, loops=5, inner=20):
    """K-window vmap solve: the dispatch-floor amortization lever the
    single-window rows proved necessary (fixed-overhead-bound)."""
    from davo_tpu.ba.schur import solve_windows_batched

    rng = np.random.default_rng(0)
    Jp = jnp.asarray(rng.normal(size=(K, M, N, 2, 6)), jnp.float32)
    Jl = jnp.asarray(rng.normal(size=(K, M, N, 2, 3)), jnp.float32)
    r = jnp.asarray(rng.normal(size=(K, M, N, 2)), jnp.float32)
    w = jnp.asarray(rng.uniform(0.1, 1.0, (K, M, N)), jnp.float32)
    fn = jax.jit(solve_windows_batched)
    dxp, dxl = fn(Jp, Jl, r, w)
    float(jnp.sum(dxp))
    times = []
    for _ in range(loops):
        t0 = time.perf_counter()
        for _ in range(inner):
            dxp, dxl = fn(Jp, Jl, r, w)
        float(jnp.sum(dxp) + jnp.sum(dxl))
        times.append((time.perf_counter() - t0) / inner)
    return min(times) * 1e6, [t * 1e6 for t in times]


def main():
    print("devices:", jax.devices(), flush=True)
    if jax.devices()[0].platform != "tpu":
        print("REFUSING: not on TPU", flush=True)
        sys.exit(2)
    res = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            res = json.load(f)
    for M, N in ((8, 256), (16, 1024), (16, 4096), (32, 4096)):
        tag = f"M{M}_N{N}"
        if tag in res:
            print(f"{tag}: done previously", flush=True)
            continue
        an = analytic(M, N)
        us, all_us = measure(M, N)
        an["measured_us"] = us
        an["all_us"] = all_us
        an["sol_fraction"] = an["roofline_us"] / us
        res[tag] = an
        with open(OUT + ".tmp", "w") as f:
            json.dump(res, f, indent=1)
            f.write("\n")
        os.replace(OUT + ".tmp", OUT)
        print(
            f"{tag}: measured {us:8.1f} us  roofline "
            f"{an['roofline_us']:6.1f} us (compute {an['compute_bound_us']:.1f}"
            f" / memory {an['memory_bound_us']:.1f})  sol "
            f"{an['sol_fraction'] * 100:5.1f} %",
            flush=True,
        )
    for K, M, N in ((8, 8, 256), (8, 16, 1024), (32, 8, 256)):
        tag = f"batchK{K}_M{M}_N{N}"
        if tag in res:
            print(f"{tag}: done previously", flush=True)
            continue
        us, all_us = measure_batched(K, M, N)
        single = res.get(f"M{M}_N{N}", {}).get("measured_us")
        entry = {
            "measured_us": us,
            "us_per_window": us / K,
            "all_us": all_us,
        }
        if single:
            entry["amortization_x"] = single / (us / K)
        res[tag] = entry
        with open(OUT + ".tmp", "w") as f:
            json.dump(res, f, indent=1)
            f.write("\n")
        os.replace(OUT + ".tmp", OUT)
        print(
            f"{tag}: {us:8.1f} us total  {us / K:7.1f} us/window  "
            f"amortization {entry.get('amortization_x', float('nan')):.1f}x",
            flush=True,
        )
    print("->", OUT, flush=True)


if __name__ == "__main__":
    main()
