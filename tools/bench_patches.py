"""A/B device-time bench: patch-extraction formulations + L/R-batched detect."""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from rso.config import RSOConfig
    from rso.frontend.detect import detect_features, extract_patches
    from rso.synthetic import make_sequence

    H, W = 376, 1241
    seq = make_sequence(n_frames=1, n_points=2000, H=H, W=W)
    img = jnp.asarray(seq.frames[0][0], jnp.float32)
    imgR = jnp.asarray(seq.frames[0][1], jnp.float32)
    cfg = RSOConfig()
    K = cfg.tpu.max_kps_per_octave
    N_ITER = 30
    rng = np.random.default_rng(0)
    xy = jnp.asarray(np.stack([rng.uniform(10, W - 10, K),
                               rng.uniform(10, H - 10, K)], -1), jnp.float32)

    def timed(name, fn):
        def body(carry, _):
            out = fn(img + carry * 1e-9)
            return carry + out, None

        run = jax.jit(lambda: lax.scan(body, jnp.float32(0.0), None,
                                       length=N_ITER)[0])
        run()
        r = run(); r.block_until_ready()
        t0 = time.perf_counter()
        r = run(); r.block_until_ready()
        dt = (time.perf_counter() - t0) / N_ITER * 1e3
        print(f"{name:<46}{dt:9.3f} ms")

    def patches_gather(im):
        return extract_patches(im, xy).sum()

    def patches_dynslice(im):
        x0 = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32) - 3, 0, W - 8)
        y0 = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32) - 3, 0, H - 8)
        p = jax.vmap(lambda y, x: lax.dynamic_slice(im, (y, x), (8, 8)))(y0, x0)
        return p.sum()

    def patches_rowslice(im):
        # gather whole 8-px row segments: slice_sizes=(1,8) over K*8 starts
        x0 = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32) - 3, 0, W - 8)
        y0 = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32) - 3, 0, H - 8)
        ys = (y0[:, None] + jnp.arange(8)[None, :]).reshape(-1)
        xs = jnp.repeat(x0, 8)
        p = jax.vmap(lambda y, x: lax.dynamic_slice(im, (y, x), (1, 8)))(ys, xs)
        return p.sum()

    timed("patches: scalar gather (current)", patches_gather)
    timed("patches: vmap dynamic_slice 8x8", patches_dynslice)
    timed("patches: vmap dynamic_slice 1x8 rows", patches_rowslice)

    th = jnp.int32(20)

    def det_two(im):
        f1 = detect_features(im, cfg.detect, K, th, False, arc=cfg.tpu.fast_arc)
        f2 = detect_features(imgR + im * 0, cfg.detect, K, th, False,
                             arc=cfg.tpu.fast_arc)
        return f1.response.sum() + f2.response.sum()

    def det_batched(im):
        both = jnp.stack([im, imgR + im * 0])
        f = jax.vmap(lambda x: detect_features(
            x, cfg.detect, K, th, False, arc=cfg.tpu.fast_arc))(both)
        return f.response.sum()

    timed("detect L,R separate (current)", det_two)
    timed("detect L,R vmap-batched", det_batched)

    print(f"\nbackend: {jax.default_backend()} {jax.devices()[0]}")


if __name__ == "__main__":
    main()
