"""Benchmark harness: flagship VO inference throughput on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: frames/s of streaming pose inference (full DAVO forward —
flow + attention + pose — over consecutive frame pairs), the
reference's `test_kitti_pose.py` hot loop (SURVEY.md §3.2).
`vs_baseline` is measured against BASELINE_FPS below (reference
single-GPU throughput; unverifiable this round — see BASELINE.md — so
a conservative 2020-era single-GPU estimate is used until the real
number is obtainable).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# Persistent compile cache: the full-model XLA compile is ~145 s on the
# tunneled TPU; cache it across bench invocations.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

# Reference DAVO (TF1, single 2020-era GPU) streaming pose inference.
# Placeholder until the reference can be run (BASELINE.md): PWC-flow +
# attention + pose at 128x416 on a GTX-1080-class GPU ~ O(15) fps.
BASELINE_FPS = 15.0

# Batch amortizes the per-call host/dispatch gap (~2.8 ms against a
# 6.1 ms device time at B=128 — results_r4_prof_serving.json trace).
# Measured sweep (exp_serving_bites, one window): B=128 13,469 fps,
# B=192 11,497 (layout anomaly, like r3's B=64), B=256 14,936 (best),
# B=384/512 regress. 256 is the production serving batch.
BATCH = 256
WARMUP = 2
# Chain depth per timed loop. The r5 gap attribution
# (results_r5_serving_gap.json): device busy is 14.11 ms/call at
# B=256 with ~0 device idle between chained programs — the
# wall-vs-device gap is HOST DISPATCH RAMP that amortizes with depth
# (40.2 ms/call at depth 1 -> 17.4 at 8 -> 15.0 at 32). Depth 32
# measures steady-state streaming throughput (~94 % of the 18.1k fps
# device-busy ceiling); the old depth-8 protocol under-reported by
# ~15 %. donate_argnums recovers nothing (17.7 ms) — input copies
# are not the gap.
ITERS = 32
LOOPS = 5  # repo timing protocol: min over >= 5 loops (CLAUDE.md) —
           # single loops are contaminated by secondary compiles and
           # tunnel hiccups (utils/profiling.timed methodology)


def _wait_for_tpu_tunnel() -> None:
    """Refuse to print a CPU number into the round's bench artifact.

    The sandbox's jax_platforms is "axon,cpu": when the TPU tunnel
    relay is down, backend init silently falls back to CPU and the
    headline would record a ~100x regression that is really an infra
    outage. Probe the relay's first TCP port before touching jax; wait
    (bounded) for it to come back, else exit non-zero so the driver
    records a failed run instead of a bogus number.
    """
    import socket
    import sys

    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return  # explicit CPU/dev invocation
    host = os.environ["PALLAS_AXON_POOL_IPS"].split(",")[0]
    deadline = time.time() + float(os.environ.get("BENCH_TPU_WAIT_S", "900"))
    while time.time() < deadline:
        try:
            socket.create_connection((host, 8082), timeout=5).close()
            return
        except OSError:
            print(
                "bench: TPU tunnel unreachable, retrying in 30 s",
                file=sys.stderr,
            )
            time.sleep(30)
    # Measured here: with the relay down, jax backend init HANGS (the
    # plugin retries the claim forever) rather than failing fast — so
    # exiting non-zero is the only way to hand the driver a clean
    # failure instead of a hung process or a CPU-fallback number.
    print(
        "bench: TPU tunnel still unreachable after the wait budget; "
        "exiting rather than hanging on backend init",
        file=sys.stderr,
    )
    sys.exit(1)


def flags_validated(flags: dict) -> bool:
    """The BENCH_FLAGS gate, exposed for tests: a flags file counts
    ONLY when hardware-validated AND the kernel/model fingerprint
    matches the code being benchmarked (update_bench_flags.py is the
    writer). Gates both config overrides and compiler options — a
    validated win carrying compiler_options but empty overrides must
    still apply the options it was measured under (ADVICE r3)."""
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "tools", "dev")
    )
    from probe_common import fingerprint

    return bool(
        flags.get("validated_on") == "tpu"
        and flags.get("fingerprint") == fingerprint()
    )


def flag_overrides(flags: dict) -> dict:
    return dict(flags.get("overrides", {})) if flags_validated(flags) else {}


def main() -> None:
    _wait_for_tpu_tunnel()

    # Hardware-validated serving overrides (fused Pallas paths): written
    # ONLY by tools/dev/update_bench_flags.py after the candidate ran,
    # matched the XLA baseline, and won throughput on the real chip —
    # bench never risks an unvalidated compile at round end. A winner
    # may also carry per-computation PJRT compiler options (e.g. the
    # scoped-vmem limit the fused kernels need, R3_RESULTS.md) applied
    # below via lower().compile(...) under the same gate.
    overrides: dict = {}
    flags: dict = {}
    validated = False
    flags_path = os.path.join(os.path.dirname(__file__), "BENCH_FLAGS.json")
    if os.path.exists(flags_path):
        with open(flags_path) as f:
            flags = json.load(f)
        validated = flags_validated(flags)
        overrides = flag_overrides(flags)

    import jax
    import jax.numpy as jnp

    if os.environ.get("PALLAS_AXON_POOL_IPS") and (
        jax.default_backend() != "tpu"
    ):
        import sys

        print(
            f"bench: backend is {jax.default_backend()!r}, not tpu "
            "(tunnel port answered but the chip claim failed); refusing "
            "to record a CPU number",
            file=sys.stderr,
        )
        sys.exit(1)

    from davo_tpu.models import presets
    from davo_tpu.models.davo import DavoModel

    # The production-serving config: full flow+attention+pose pipeline
    # with the r2e measured-quality-neutral perf knobs (8-ch learned
    # correlation projection, search range 3). The paper-parity `davo`
    # preset (search=4, no projection) measures 14.4 ms vs 10.1 ms at
    # B=128 — both ladders recorded in R2_RESULTS.md.
    full_cfg = presets.get("davo-fast")
    if overrides or (validated and flags.get("compiler_options")):
        import sys

        from davo_tpu.config import apply_overrides

        full_cfg = apply_overrides(full_cfg, overrides)
        # stdout stays the one driver-parsed JSON line; record the
        # config provenance on stderr so round headlines remain
        # attributable (flags change what is being measured).
        print(
            f"bench: applying BENCH_FLAGS overrides "
            f"{flags['overrides']} "
            f"compiler_options={flags.get('compiler_options', {})} "
            f"(probe: {flags.get('probe')})",
            file=sys.stderr,
        )
    cfg = full_cfg.model
    model = DavoModel(cfg)
    rng = np.random.default_rng(0)
    H, W = cfg.img_height, cfg.img_width
    targets = jnp.asarray(rng.uniform(size=(BATCH, H, W, 3)), jnp.float32)
    sources = jnp.asarray(rng.uniform(size=(BATCH, 1, H, W, 3)), jnp.float32)
    seg = jnp.asarray(rng.integers(0, 19, (BATCH, H, W)), jnp.int32)
    # jit(init): on the tunneled TPU backend eager dispatch is a remote
    # round-trip per primitive — init MUST be a single compiled program.
    # train=False: inference bench needs no DispNet params/compile.
    params = jax.jit(model.init, static_argnames=("train",))(
        jax.random.key(0), targets, sources, seg=seg, train=False
    )

    @jax.jit
    def infer(targets, sources, seg):
        out = model.apply(params, targets, sources, seg=seg, train=False)
        return out["poses"]

    copts = flags.get("compiler_options") if validated else None
    if copts:
        infer = infer.lower(targets, sources, seg).compile(
            compiler_options=copts
        )

    # Compile + warmup.
    for _ in range(WARMUP):
        infer(targets, sources, seg).block_until_ready()

    # Variance protocol (VERDICT r3 weak #2): chip-window variance
    # across a day spans ~12.3-15.2k fps — larger than a typical
    # round-over-round gain — so the artifact records the full loop
    # distribution (min + median + spread), not just the min. Any
    # +-10 % claim must be stated against the spread.
    times = []
    for _ in range(LOOPS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            poses = infer(targets, sources, seg)
        poses.block_until_ready()
        times.append(time.perf_counter() - t0)

    best = min(times)
    med = float(np.median(times))
    fps = BATCH * ITERS / best

    out = {
        "metric": "pose_infer_frames_per_s",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
        "median": round(BATCH * ITERS / med, 2),
        "spread_pct": round(100.0 * (max(times) - best) / best, 1),
        "loops": LOOPS,
    }

    # Paper-parity `davo` preset, same window (VERDICT r4 weak #5: its
    # perf was last measured in r2). Shorter protocol (3 loops), extra
    # fields on the same JSON line; failure-tolerant so the headline
    # number never dies to the side measurement.
    try:
        parity_cfg = presets.get("davo").model
        parity_model = DavoModel(parity_cfg)
        pparams = jax.jit(parity_model.init, static_argnames=("train",))(
            jax.random.key(0), targets, sources, seg=seg, train=False
        )

        @jax.jit
        def infer_parity(targets, sources, seg):
            return parity_model.apply(
                pparams, targets, sources, seg=seg, train=False
            )["poses"]

        for _ in range(WARMUP):
            infer_parity(targets, sources, seg).block_until_ready()
        ptimes = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(ITERS):
                poses = infer_parity(targets, sources, seg)
            poses.block_until_ready()
            ptimes.append(time.perf_counter() - t0)
        out["davo_preset_fps"] = round(BATCH * ITERS / min(ptimes), 2)
    except Exception as e:  # noqa: BLE001
        import sys

        print(f"bench: davo-preset side measurement failed: {e!r}",
              file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
