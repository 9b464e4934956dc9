"""Experiments: detection-pair formulations (the remaining step hotspot).

  A. two separate detect_features calls (current engine shape)
  B. one vmapped call over the stacked [2,H,W] pair
  C. pair with right-image response = FAST arc contrast (no dense
     Shi-Tomasi on the right image)
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from rso.config import RSOConfig
    from rso.frontend.detect import detect_features
    from rso.synthetic import make_sequence

    H, W = 376, 1241
    seq = make_sequence(n_frames=1, n_points=2000, H=H, W=W)
    img_l = jnp.asarray(seq.frames[0][0], jnp.float32)
    img_r = jnp.asarray(seq.frames[0][1], jnp.float32)
    cfg = RSOConfig()
    K = 512
    th = jnp.int32(20)
    N = 30

    def timed(name, fn):
        def body(carry, _):
            out = fn(img_l + carry * 1e-9, img_r)
            return carry + out, None

        run = jax.jit(lambda: lax.scan(body, jnp.float32(0.0), None,
                                       length=N)[0])
        run()
        jax.block_until_ready(run())
        t0 = time.perf_counter()
        jax.block_until_ready(run())
        print(f"{name:<40}{(time.perf_counter()-t0)/N*1e3:9.3f} ms")

    def two_calls(a, b):
        fl = detect_features(a, cfg.detect, K, th, False, arc=12)
        fr = detect_features(b, cfg.detect, K, th, False, arc=12)
        return fl.response.sum() + fr.response.sum()

    det1 = lambda im: detect_features(im, cfg.detect, K, th, False, arc=12)

    def vmapped(a, b):
        f = jax.vmap(det1)(jnp.stack([a, b]))
        return f.response.sum()

    timed("A two detect_features calls", two_calls)
    timed("B vmapped stacked pair", vmapped)
    stage1_probe()
    print(f"backend: {jax.default_backend()} {jax.devices()[0]}")


def stage1_probe():
    import time
    import jax
    import jax.numpy as jnp
    from jax import lax

    from rso.config import RSOConfig
    from rso.frontend.detect import detect_features
    from rso.frontend.pyramid import build_pyramid, to_grayscale
    from rso.synthetic import make_sequence

    H, W = 376, 1241
    seq = make_sequence(n_frames=1, n_points=2000, H=H, W=W)
    img_l = jnp.asarray(seq.frames[0][0])
    img_r = jnp.asarray(seq.frames[0][1])
    cfg = RSOConfig()
    th = jnp.int32(20)
    N = 30

    def timed(name, fn):
        def body(carry, _):
            out = fn(img_l + (carry * 1e-9).astype(img_l.dtype), img_r)
            return carry + out, None

        run = jax.jit(lambda: lax.scan(body, jnp.float32(0.0), None,
                                       length=N)[0])
        run()
        jax.block_until_ready(run())
        t0 = time.perf_counter()
        jax.block_until_ready(run())
        print(f"{name:<40}{(time.perf_counter()-t0)/N*1e3:9.3f} ms")

    def pyr_only(a, b):
        pl = build_pyramid(to_grayscale(a), 3)
        pr = build_pyramid(to_grayscale(b), 3)
        return sum(p.sum() for p in pl) + sum(p.sum() for p in pr)

    timed("pyramid+grayscale pair (3 oct)", pyr_only)

    Ks = [512, 256, 128]

    def full12(a, b):
        pl = build_pyramid(to_grayscale(a), 3)
        pr = build_pyramid(to_grayscale(b), 3)
        out = jnp.float32(0)
        for o in range(3):
            fl = detect_features(pl[o], cfg.detect, Ks[o], th, False, arc=12)
            fr = detect_features(pr[o], cfg.detect, Ks[o], th, False, arc=12)
            out += fl.response.sum() + fr.response.sum()
        return out

    timed("stages 1-2 full (3 oct, slots decay)", full12)

    def oct12_only(a, b):
        pl = build_pyramid(to_grayscale(a), 3)
        pr = build_pyramid(to_grayscale(b), 3)
        out = jnp.float32(0)
        for o in (1, 2):
            fl = detect_features(pl[o], cfg.detect, Ks[o], th, False, arc=12)
            fr = detect_features(pr[o], cfg.detect, Ks[o], th, False, arc=12)
            out += fl.response.sum() + fr.response.sum()
        return out

    timed("pyr + detect octaves 1,2 only", oct12_only)


if __name__ == "__main__":
    main()
