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

    out = {
        "collective_bytes_per_iter": per_iter,
        "n_collectives": len(coll),
        "devices": n_dev,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
