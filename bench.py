#!/usr/bin/env python
"""Driver benchmark: steady-state stereo-VO frames/sec/chip at KITTI image size.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Baseline: the reference (famoreno/stereo-vo) publishes no end-to-end numbers
and cannot be compiled here (MRPT absent), so `vs_baseline` divides by a
MEASURED run of native/rso_baseline — the faithful OpenCV port of the
reference pipeline (stages 1-5 semantics) — on this host, on the same scene
(tools/measure_baseline.py writes BASELINE_MEASURED.json; re-run it to
refresh).  If the artifact is missing the round-1 estimate (20 FPS) is used
and flagged via "baseline_kind": "estimate".
"""
import json
import os
import sys

REFERENCE_FPS_ESTIMATE = 20.0  # fallback only; see module docstring


def _same_scene_comparison():
    """Blob-scene mean ATEs from the same-pixels comparison artifact
    (tools/compare_baseline.py -> docs/artifacts/compare_baseline_r4.json):
    both pipelines on IDENTICAL PNGs, identical trajectory integration.
    Returns (rso_ate, baseline_ate) or (None, None)."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "docs", "artifacts", "compare_baseline_r5.json")
    try:
        with open(path) as f:
            m = json.load(f)["mean_ate_by_scene"]["blob"]
        return float(m["rso"]), float(m["baseline"])
    except (OSError, ValueError, KeyError):
        return None, None


def _measured_baseline():
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_MEASURED.json")
    try:
        with open(path) as f:
            doc = json.load(f)
        for r in doc.get("results", []):
            if r.get("scene") == "blob":   # the bench scene
                kind = "measured"
                # the artifact is host-specific: flag it when this host does
                # not match the one that measured it (different CPU/core
                # count => the baseline FPS is not this machine's)
                import platform
                here = (platform.processor() or platform.machine(),
                        os.cpu_count())
                there = (doc.get("host_cpu"), doc.get("nproc"))
                if there != here:
                    kind = "measured-other-host"
                    print(f"[bench] BASELINE_MEASURED.json was measured on "
                          f"{there}, this host is {here}; re-run "
                          f"tools/measure_baseline.py for a local baseline",
                          file=sys.stderr)
                return float(r["fps"]), kind
    except (OSError, ValueError, KeyError):
        pass
    return REFERENCE_FPS_ESTIMATE, "estimate"


def _wait_for_backend(attempts: int = 6, delay_s: int = 60):
    """Retry backend init: the axon relay releases a dead process's TPU claim
    with latency, and a worker restart surfaces as 'Unable to initialize
    backend'.  Guard against the silent-CPU trap: when the TPU plugin init
    fails AFTER the CPU backend was registered, jax caches the CPU backend
    and the next jax.devices() returns {cpu} without raising — which would
    let the bench record ~100x-slower CPU numbers as a TPU result."""
    import time

    import jax

    # empty JAX_PLATFORMS means auto-select (which can still silently fall
    # back to CPU) — treat it like unset, not like an explicit CPU choice
    want_tpu = any(p in (os.environ.get("JAX_PLATFORMS") or "axon")
                   for p in ("axon", "tpu"))
    # A clean cpu-only init (no exception, just no TPU plugin) is usually
    # permanent — the host simply has no TPU — so one retry is enough; only
    # 'Unable to initialize backend' (a transient relay claim release) earns
    # the full retry schedule.
    cpu_only_attempts = min(2, attempts)
    for i in range(attempts):
        err = None
        transient = False
        try:
            jax.devices()
        except RuntimeError as e:
            if "Unable to initialize backend" not in str(e):
                raise
            err = e
            transient = True
        if err is None:
            if not want_tpu or jax.default_backend() != "cpu":
                return
            err = RuntimeError(
                "TPU expected but only the CPU backend initialized "
                "(failed plugin init leaves jax's cached CPU backend). "
                "If a CPU run is intended, set JAX_PLATFORMS=cpu explicitly.")
            try:  # drop the cached cpu-only registry so a retry re-inits
                jax.clear_backends()
            except Exception:
                pass
        budget = attempts if transient else cpu_only_attempts
        if i >= budget - 1:
            raise err
        print(f"[bench] backend not ready ({i + 1}/{budget}): {err}; "
              f"retrying in {delay_s}s", file=sys.stderr)
        time.sleep(delay_s)


def main():
    from rso.cli.bench import run_bench

    _wait_for_backend()

    # 480-frame chunks: the one-dispatch fixed cost (~60 ms through the
    # remote-TPU tunnel) amortizes to ~0.13 ms/frame; per-step device time is
    # unchanged (scan-length slope-validated in tools/bench_slope.py).
    # n_points scales with n_frames: the synthetic blob field anchors points
    # uniformly along the trajectory, so density per metre must stay equal to
    # the original 120-frame scene or the tracker starves.
    out = run_bench(n_frames=480, n_points=8000, width=1241, height=376,
                    repeat_passes=4)
    base_fps, base_kind = _measured_baseline()
    ss_rso, ss_base = _same_scene_comparison()
    line = {
        "metric": "vo_frames_per_sec_per_chip_kitti_size",
        "value": round(out["fps"], 3),
        "unit": "frames/s",
        "vs_baseline": round(out["fps"] / base_fps, 3),
        "baseline_fps": base_fps,
        "baseline_kind": base_kind,
        "ate_rmse_m": round(out["ate_rmse_m"], 4),
        # same-pixels accuracy contract (3-seed means, blob scene, TPU):
        # rso must match-or-beat the reference-port baseline on ATE
        "same_scene_ate_rso_m": ss_rso,
        "same_scene_ate_baseline_m": ss_base,
        "same_scene_ate_ratio": (round(ss_rso / ss_base, 3)
                                 if ss_rso is not None else None),
        "step_ms_device": round(out["step_ms_device"], 4),
        "fps_device_step": round(out["fps_device_step"], 1),
        "ba_iters_per_sec": round(out["ba_iters_per_sec"], 1),
        "detect_ms_per_image": round(out["detect_ms_per_image"], 4),
        "detect_hbm_gbps_model": round(out["detect_hbm_gbps_model"], 1),
        "detect_hbm_util_vs_v5e_peak": (
            round(out["detect_hbm_util_vs_v5e_peak"], 3)
            if out["detect_hbm_util_vs_v5e_peak"] is not None else None),
        "backend": out["backend"],
        "device": out["device"],
    }
    print(json.dumps(line))
    return 0


if __name__ == "__main__":
    sys.exit(main())
