"""Profile refine_positions pieces on TPU: extraction vs iteration loop.

Scan-length slope timing of (a) extract_patches size=16 alone,
(b) full refine_positions, (c) refine with iters=0 (extraction + accept
check only), at the engine's K=512, one octave-0-sized image.

Usage: bash tools/tpu_run.sh tools/exp_refine_prof.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def slope(run, n1=8, n2=40, passes=4):
    import jax
    jax.block_until_ready(run(n1)())
    jax.block_until_ready(run(n2)())
    b1 = b2 = 1e9
    for _ in range(passes):
        t0 = time.perf_counter(); jax.block_until_ready(run(n1)()); b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter(); jax.block_until_ready(run(n2)()); b2 = min(b2, time.perf_counter() - t0)
    return (b2 - b1) / (n2 - n1) * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from rso.frontend.detect import extract_patches
    from rso.frontend.refine import refine_positions

    H, W, K = 376, 1241, 512
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
    xy0 = jnp.asarray(
        rng.uniform([8, 8], [W - 8, H - 8], (K, 2)).astype(np.float32))
    temps = extract_patches(img, xy0, size=8, offset=3)
    valid = jnp.ones(K, bool)

    cache = {}

    def mk(fn):
        def run(n):
            key = (fn.__name__, n)
            if key not in cache:
                def body(xy, _):
                    out = fn(xy)
                    return out, None
                cache[key] = jax.jit(lambda: lax.scan(body, xy0, None,
                                                      length=n)[0])
            return cache[key]
        return run

    def f_extract(xy):
        p = extract_patches(img, xy, size=16, offset=8)
        return xy + 1e-6 * p[:, :2]          # consume

    def f_refine(xy):
        # pin the ORIGINAL 3-iter + SSD-gate schedule: this tool's
        # recorded breakdown (+0.74 ms/step docs) measured that schedule,
        # and the shipped defaults have since moved to iters=2, no gate
        return refine_positions(img, temps, xy, valid, iters=3,
                                ssd_gate=True)

    def f_refine0(xy):
        return refine_positions(img, temps, xy, valid, iters=0,
                                ssd_gate=True)

    for f in (f_extract, f_refine0, f_refine):
        print(f"{f.__name__:10s}: {slope(mk(f)):7.3f} ms/call", flush=True)
    print(f"backend: {jax.default_backend()} {jax.devices()[0]}")


if __name__ == "__main__":
    main()
