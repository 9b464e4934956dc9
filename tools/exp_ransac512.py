"""Does a deeper RANSAC pool (384/512 vs the shipped 256) still buy ATE?

Round 3 measured 128->256 at -7.8% mean ATE for +0.026 ms/step.  This
checks whether the curve has flattened, on the bench blob scene, 3 seeds x
100 frames (one-seed ATE is chaotic; verify-skill rule), plus the step-time
slope cost of the winner in the same claim.

Run: PYTHONPATH=/root/repo bash tools/tpu_run.sh tools/exp_ransac512.py
"""
import dataclasses
import sys
import time

sys.path.insert(0, "tools")

from exp_ate_levers import run_variant  # noqa: E402


def main():
    from rso.synthetic import synthetic_config

    cfg0 = synthetic_config()
    seeds = [0, 1, 2]
    t0 = time.time()

    out = {}
    for n in (256, 384, 512):
        cfg = cfg0.replace(tpu=dataclasses.replace(cfg0.tpu, ransac_iters=n))
        out[n] = run_variant(f"ransac{n}", cfg, seeds)

    b = out[256].mean()
    print(f"\n{'pool':<10} {'mean':>8} {'max':>8}  vs 256")
    for n, v in out.items():
        print(f"{n:<10} {v.mean():8.4f} {v.max():8.4f}  "
              f"{(v.mean() - b) / b * 100:+6.1f}%")
    print(f"total {time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
