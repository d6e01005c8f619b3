"""The BENCH_FLAGS promotion machinery (bench.py <- update_bench_flags
<- serving_probe_results.json) — VERDICT r2 weak #5: the path had never
fired end to end because every on-chip probe failed. These tests drive
the promotion logic and bench.py's gating against synthetic probe
results so the machinery itself is verified independently of hardware.
"""

import importlib.util
import json
import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_module(tmp_path, monkeypatch):
    """Import update_bench_flags with RESULTS/FLAGS redirected."""
    sys.path.insert(0, os.path.join(ROOT, "tools", "dev"))
    spec = importlib.util.spec_from_file_location(
        "update_bench_flags",
        os.path.join(ROOT, "tools", "dev", "update_bench_flags.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(mod, "RESULTS", str(tmp_path / "probe.json"))
    monkeypatch.setattr(mod, "FLAGS", str(tmp_path / "BENCH_FLAGS.json"))
    return mod


def _write(path, obj):
    with open(path, "w") as f:
        json.dump(obj, f)


def test_compile_error_summary_surfaces_cause():
    """Probe JSONs must record WHY a compile failed: the cause lines
    ride hundreds of chars into the exception, after ANSI-colored
    relay noise (this truncation hid the VMEM OOM for two rounds)."""
    sys.path.insert(0, os.path.join(ROOT, "tools", "dev"))
    from probe_common import compile_error_summary

    exc = (
        "INTERNAL: http://127.0.0.1:8103/remote_compile: HTTP 500: "
        "tpu_compile_helper subprocess exit code 1\n"
        "\x1b[2m2026-08-19T03:56:54Z\x1b[0m \x1b[33m WARN\x1b[0m "
        "axon_terminal::http: compile-helper: landlock not enforced\n"
        + "noise\n" * 40
        + "\x1b[31mERROR\x1b[0m axon_terminal::http: compile: Internal: "
        "AOT PJRT error: Ran out of memory in memory space vmem while "
        "allocating on stack for %conv. Scoped allocation with size "
        "20.98M and limit 16.00M exceeded scoped vmem limit by 4.98M.\n"
    )
    s = compile_error_summary(exc)
    assert "Ran out of memory" in s
    assert "HTTP 500" in s
    assert "\x1b" not in s
    assert len(s) <= 1200


BASE = {
    "status": "done", "ms": 10.0, "fps": 12800.0, "base": "davo-fast",
    "overrides": {}, "equality_checked": False, "out_absmax": 1.0,
}


def test_promotes_fastest_equality_checked_winner(tmp_path, monkeypatch):
    mod = _load_module(tmp_path, monkeypatch)
    fp = mod.fingerprint()
    _write(mod.RESULTS, {
        "_fingerprint": fp,
        "davo-fast (slices baseline)": BASE,
        "davo-fast (a)": {
            "status": "done", "fps": 14000.0, "base": "davo-fast",
            "overrides": {"fuse_estimator": True},
            "equality_checked": True, "maxerr": 1e-4,
        },
        "davo-fast (b)": {
            "status": "done", "fps": 15000.0, "base": "davo-fast",
            "overrides": {"fuse_flow_level": True},
            "equality_checked": True, "maxerr": 1e-4,
        },
        # faster but NOT equality-checked -> never promoted
        "davo-fast (c)": {
            "status": "done", "fps": 20000.0, "base": "davo-fast",
            "overrides": {"flow_levels": 3}, "equality_checked": False,
        },
        # faster but fails tolerance -> never promoted
        "davo-fast (d)": {
            "status": "done", "fps": 19000.0, "base": "davo-fast",
            "overrides": {"costvol_impl": "pallas_rows"},
            "equality_checked": True, "maxerr": 0.5,
        },
    })
    mod.main()
    flags = json.load(open(mod.FLAGS))
    assert flags["overrides"] == {"model.fuse_flow_level": True}
    assert flags["validated_on"] == "tpu"
    assert flags["fingerprint"] == fp
    assert flags["probe_fps"] == 15000.0


def test_no_winner_leaves_flags_untouched(tmp_path, monkeypatch):
    mod = _load_module(tmp_path, monkeypatch)
    _write(mod.RESULTS, {
        "_fingerprint": mod.fingerprint(),
        "davo-fast (slices baseline)": BASE,
        "davo-fast (a)": {
            "status": "done", "fps": 12850.0, "base": "davo-fast",
            "overrides": {"fuse_estimator": True},
            "equality_checked": True, "maxerr": 1e-4,
        },  # < 2 % speedup
    })
    mod.main()
    assert not os.path.exists(mod.FLAGS)


def test_stale_fingerprint_refuses_and_scrubs(tmp_path, monkeypatch):
    mod = _load_module(tmp_path, monkeypatch)
    _write(mod.FLAGS, {"overrides": {"model.fuse_estimator": True}})
    _write(mod.RESULTS, {
        "_fingerprint": "not-the-current-code",
        "davo-fast (slices baseline)": BASE,
    })
    mod.main()
    # Stale results must never leave stale flags behind.
    assert not os.path.exists(mod.FLAGS)


def test_winner_compiler_options_ride_into_flags(tmp_path, monkeypatch):
    """A winner measured under extra PJRT compiler options (the
    scoped-vmem limit that unblocks the fused kernels, R3_RESULTS.md)
    must carry them into BENCH_FLAGS so bench.py reproduces the
    compile via lower().compile(compiler_options=...)."""
    mod = _load_module(tmp_path, monkeypatch)
    opts = {"xla_tpu_scoped_vmem_limit_kib": "65536"}
    _write(mod.RESULTS, {
        "_fingerprint": mod.fingerprint(),
        "davo-fast (slices baseline)": BASE,
        "davo-fast (a)": {
            "status": "done", "fps": 15000.0, "base": "davo-fast",
            "overrides": {"fuse_estimator": True},
            "equality_checked": True, "maxerr": 1e-4,
            "compiler_options": opts,
        },
    })
    mod.main()
    flags = json.load(open(mod.FLAGS))
    assert flags["compiler_options"] == opts
    # A winner measured under default options carries none.
    _write(mod.RESULTS, {
        "_fingerprint": mod.fingerprint(),
        "davo-fast (slices baseline)": BASE,
        "davo-fast (a)": {
            "status": "done", "fps": 15000.0, "base": "davo-fast",
            "overrides": {"fuse_estimator": True},
            "equality_checked": True, "maxerr": 1e-4,
            "compiler_options": {},
        },
    })
    mod.main()
    assert "compiler_options" not in json.load(open(mod.FLAGS))


def test_load_validated_flags_gate(tmp_path):
    """The package-side loader (CLI serving path) applies the same
    validated_on + fingerprint gate as bench.py."""
    from davo_tpu.utils.serving_flags import (
        fingerprint,
        load_validated_flags,
    )

    good = {
        "validated_on": "tpu", "fingerprint": fingerprint(),
        "overrides": {"model.flow_levels": 3},
        "compiler_options": {"xla_tpu_scoped_vmem_limit_kib": "131072"},
    }
    p = tmp_path / "BENCH_FLAGS.json"
    _write(p, good)
    assert load_validated_flags(str(p))["overrides"] == good["overrides"]
    _write(p, dict(good, fingerprint="stale"))
    assert load_validated_flags(str(p)) == {}
    _write(p, dict(good, validated_on="cpu"))
    assert load_validated_flags(str(p)) == {}
    assert load_validated_flags(str(tmp_path / "missing.json")) == {}


def test_make_pose_apply_fn_compiler_options():
    """compiler_options routes through AOT lower().compile() with a
    per-shape cache and returns the same poses as the plain jit."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from davo_tpu.eval.runner import make_pose_apply_fn

    class Stub:
        def apply(self, params, targets, sources, seg=None, train=False):
            return {"poses": jnp.sum(
                targets, axis=(1, 2, 3), keepdims=False
            )[:, None, None] * jnp.ones((1, 1, 6))}

    t = jnp.ones((2, 4, 4, 3))
    s = jnp.ones((2, 4, 4, 3))
    plain = make_pose_apply_fn(Stub(), {}, "none")
    opted = make_pose_apply_fn(
        Stub(), {}, "none",
        compiler_options={"xla_cpu_enable_fast_math": False},
    )
    np.testing.assert_allclose(
        np.asarray(plain(t, s)), np.asarray(opted(t, s))
    )
    # second call hits the shape cache (no recompile crash)
    np.testing.assert_allclose(
        np.asarray(opted(t, s)), np.asarray(opted(t, s))
    )


def test_bench_applies_only_validated_matching_flags(monkeypatch):
    """bench.py's gate: overrides apply ONLY when validated_on=tpu AND
    the fingerprint matches the current kernel/model code."""
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(ROOT, "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    sys.path.insert(0, os.path.join(ROOT, "tools", "dev"))
    from probe_common import fingerprint

    good = {
        "validated_on": "tpu",
        "fingerprint": fingerprint(),
        "overrides": {"model.flow_levels": 3},
    }
    assert bench.flag_overrides(good) == {"model.flow_levels": 3}
    stale = dict(good, fingerprint="stale")
    assert bench.flag_overrides(stale) == {}
    cpu = dict(good, validated_on="cpu")
    assert bench.flag_overrides(cpu) == {}
