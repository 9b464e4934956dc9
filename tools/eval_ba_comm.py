"""Distributed-BA communication accounting on the virtual CPU mesh.

BASELINE.json's multichip target is >=80% scaling efficiency at >=2 hosts for
window BA.  Real multi-chip hardware is not reachable from this image, so
this tool makes the scaling argument quantitatively from the compiled
program: it extracts every cross-device collective in the sharded LM step's
HLO (the same program the driver's dryrun_multichip compiles), sums the bytes
each moves per LM iteration, and models the resulting efficiency on v5e ICI
and multi-host DCN.

The Schur structure is what makes this work: the psum'd reduced camera
system is [P*6, P*6] + [P*6] — INDEPENDENT of the landmark count — while the
per-shard work scales with L/n. Efficiency(n) = t_comp(L/n) /
(t_comp(L/n) + t_comm(n)).

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
  PALLAS_AXON_POOL_IPS= python tools/eval_ba_comm.py
"""
import json
import re


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from rso.ba import BAProblem
    from rso.ba.ba import _project_grid
    from rso.ba.distributed import distributed_bundle_adjust, make_mesh
    from rso.geometry.stereo_camera import StereoCamera

    n_dev = len(jax.devices())
    cam = StereoCamera.make(fx_l=718.856, fy_l=718.856, cx_l=620.0,
                            cy_l=188.0, baseline=0.5371)
    rng = np.random.default_rng(0)
    P_, L = 8, 1024
    poses0 = jnp.zeros((P_, 6), jnp.float32).at[:, 5].set(
        jnp.arange(P_, dtype=jnp.float32) * -0.4)
    lmks0 = jnp.asarray(np.stack([rng.uniform(-10, 10, L),
                                  rng.uniform(-5, 5, L),
                                  rng.uniform(5, 40, L)], -1), jnp.float32)
    obs, _, _ = _project_grid(cam, poses0, lmks0)
    prob = BAProblem(poses=poses0 + 0.01, lmks=lmks0 + 0.05, obs=obs,
                     mask=jnp.ones((P_, L), bool))

    mesh = make_mesh(n_dev)
    lowered = jax.jit(
        lambda p: distributed_bundle_adjust(cam, p, mesh=mesh, max_iters=1,
                                            tol=0.0)
    ).lower(prob)
    hlo = lowered.compile().as_text()

    # every cross-device collective and the bytes it moves (shape product
    # x dtype size); all-reduce moves ~2x its payload on a ring
    coll = []
    for m in re.finditer(
            r"(all-reduce|all-gather|reduce-scatter|collective-permute)"
            r"[^\n]*?=\s*\(?([a-z0-9]+)\[([\d,]*)\]", hlo):
        op, dt, shape = m.groups()
        n = 1
        for s in shape.split(","):
            if s:
                n *= int(s)
        size = {"f32": 4, "bf16": 2, "f64": 8, "s32": 4, "u32": 4,
                "pred": 1, "s8": 1}.get(dt, 4)
        coll.append((op, dt, shape, n * size))

    per_iter = sum(b for _, _, _, b in coll)
    print(f"devices: {n_dev}  window P={P_} keyframes, L={L} landmarks")
    for op, dt, shape, b in coll:
        print(f"  {op:<20} {dt}[{shape}]  {b/1024:.1f} KiB")
    print(f"collective payload per LM iteration: {per_iter/1024:.1f} KiB")

    # per-iteration compute: dominated by per-landmark J^T J assembly +
    # 3x3 inversions + Schur cross terms, all proportional to L/n.
    # FLOP model per landmark per keyframe: projection+jacobian ~500, block
    # products ~36*6*2 + 36*36*... ~ use measured single-chip iteration
    # time instead: bench.py ba_iters_per_sec ~620/s on v5e at L=1024 ->
    # t_comp(1 chip) ~ 1.6 ms.
    t_comp_1 = 1.6e-3
    # ring all-reduce cost: 2 * payload / ICI_bw (v5e ~ 4.5e10 B/s per link)
    # + per-hop latency ~1us * n
    for kind, bw, lat in (("ICI (v5e intra-slice)", 4.5e10, 1e-6),
                          ("DCN (multi-host)", 6.25e9, 5e-5)):
        rows = []
        for n in (1, 2, 4, 8):
            t_comm = 0.0 if n == 1 else 2 * per_iter / bw + lat * n
            eff = (t_comp_1 / n) / ((t_comp_1 / n) + t_comm) if n > 1 else 1.0
            rows.append((n, eff))
        eff_str = "  ".join(f"n={n}: {eff*100:.1f}%" for n, eff in rows)
        print(f"modeled scaling efficiency over {kind}: {eff_str}")

    # ---- window-sharded multi-host variant (rso.ba.window_sharded) -------
    # Across hosts the WINDOW axis shards (one window problem per host
    # group); landmarks shard only within a host.  Verify from the HLO that
    # no collective's replica group crosses a 'win' row -> steady-state DCN
    # bytes per LM iteration = 0, and the multi-host efficiency model
    # reduces to load balance + the one-time scatter/gather.
    from rso.ba.window_sharded import _sharded_solve, make_win_mesh, \
        stack_problems

    n_win, n_lmk = 4, max(n_dev // 4, 1)
    wmesh = make_win_mesh(n_win, n_lmk)
    probs = [BAProblem(poses=poses0 + 0.01, lmks=lmks0 + 0.05, obs=obs,
                       mask=jnp.ones((P_, L), bool)) for _ in range(n_win)]
    stacked = stack_problems(probs)
    rel = jnp.zeros((n_win, P_ - 1, 6), jnp.float32)
    active = jnp.ones(n_win, bool)
    whlo = jax.jit(lambda *a: _sharded_solve(
        *a, mesh=wmesh, max_iters=1, kernel_param=3.0, use_robust=True,
        fix_first=True, init_lambda=1e-4, tol=0.0, rel_w_rot=0.0,
        rel_w_trans=0.0)).lower(
        cam, stacked.poses, stacked.lmks, stacked.obs, stacked.mask,
        stacked.lmk_weight, rel, active).compile().as_text()

    cross_win = []
    for g in re.findall(r"replica_groups=\{(\{[^}]*\}(?:,\{[^}]*\})*)\}",
                        whlo):
        for grp in re.findall(r"\{([^}]*)\}", g):
            ids = [int(x) for x in grp.split(",") if x.strip()]
            if len({i // n_lmk for i in ids}) > 1:
                cross_win.append(ids)
    print(f"\nwindow-sharded ({n_win} hosts x {n_lmk} chips, one window per "
          f"host group): cross-'win' collectives in the LM loop: "
          f"{len(cross_win)}")
    if cross_win:
        print(f"  UNEXPECTED cross-host groups: {cross_win[:4]}")
    else:
        print("  steady-state DCN bytes per LM iteration: 0 (window solves "
              "are host-local; only the initial scatter / final gather "
              "crosses hosts)")
        print("  modeled multi-host efficiency = load balance: 100.0% at "
              "2/4/8 hosts when windows divide evenly (vs 88.6%@2 / 66%@4 "
              "for cross-host landmark sharding, round-3 accounting)")

    out = {
        "collective_bytes_per_iter": per_iter,
        "n_collectives": len(coll),
        "devices": n_dev,
        "window_sharded_cross_host_collectives": len(cross_win),
        "window_sharded_dcn_bytes_per_iter": 0 if not cross_win else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
