"""Device-time micro-benchmark for the detection path (and its pieces).

Times each candidate as N sequential iterations inside ONE jitted lax.scan
(carry-perturbed input to defeat CSE), so the remote-tunnel RTT (~30 ms per
dispatch) amortizes away and the numbers are pure device time.

Usage: tools/tpu_run.sh tools/bench_detect.py  (or CPU with the env vars)
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from rso.config import RSOConfig
    from rso.frontend.detect import (
        detect_features, fast_corner_mask, shi_tomasi_response, nms_grid,
        select_topk, extract_patches,
    )
    from rso.frontend.pyramid import build_pyramid, to_grayscale
    from rso.synthetic import make_sequence

    H, W = 376, 1241
    seq = make_sequence(n_frames=1, n_points=2000, H=H, W=W)
    img = jnp.asarray(seq.frames[0][0], jnp.float32)
    cfg = RSOConfig()
    K = cfg.tpu.max_kps_per_octave
    N_ITER = 30

    def timed(name, fn):
        """fn: img -> scalar-reducible output; report per-iter device ms."""
        def body(carry, _):
            out = fn(img + carry * 1e-9)
            return carry + out, None

        run = jax.jit(lambda: lax.scan(body, jnp.float32(0.0), None,
                                       length=N_ITER)[0])
        run()  # compile
        r = run(); r.block_until_ready()
        t0 = time.perf_counter()
        r = run(); r.block_until_ready()
        dt = (time.perf_counter() - t0) / N_ITER * 1e3
        print(f"{name:<44}{dt:9.3f} ms")
        return dt

    th = jnp.int32(20)

    timed("fast_corner_mask(arc=12)",
          lambda im: fast_corner_mask(im, th).sum().astype(jnp.float32))
    timed("shi_tomasi_response(win=4)",
          lambda im: shi_tomasi_response(im, 4).sum())
    timed("corner+response+nms (dense part)",
          lambda im: (jnp.where(fast_corner_mask(im, th),
                                shi_tomasi_response(im, 4), -jnp.inf)
                      ).max())

    def full(im):
        f = detect_features(im, cfg.detect, K, th, False,
                            arc=cfg.tpu.fast_arc)
        return f.response.sum()

    timed("detect_features FULL (1 img, oct0)", full)

    def sel(im):
        resp = jnp.where(fast_corner_mask(im, th),
                         shi_tomasi_response(im, 4), -jnp.inf)
        keep = nms_grid(resp, cfg.detect.min_distance)
        xy, r, v = select_topk(resp, keep, K, 0.0)
        return r.sum() + xy.sum()

    timed("dense + nms + topk (no patches)", sel)

    def patches_only(im):
        xy = jnp.linspace(10, 300, K)[:, None] * jnp.ones((1, 2))
        return extract_patches(im, xy).sum()

    timed("extract_patches (K=512)", patches_only)

    print(f"\nbackend: {jax.default_backend()} {jax.devices()[0]}")


if __name__ == "__main__":
    main()
