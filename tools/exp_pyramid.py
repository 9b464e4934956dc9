"""Experiments: pyramid downsample formulations (stage-1 hotspot)."""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from rso.frontend.pyramid import build_pyramid, to_grayscale, downsample2x
    from rso.synthetic import make_sequence

    H, W = 376, 1241
    seq = make_sequence(n_frames=1, n_points=2000, H=H, W=W)
    img_l = jnp.asarray(seq.frames[0][0])
    img_r = jnp.asarray(seq.frames[0][1])
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
        print(f"{name:<44}{(time.perf_counter()-t0)/N*1e3:9.3f} ms")

    timed("to_grayscale only (pair)",
          lambda a, b: to_grayscale(a).sum() + to_grayscale(b).sum())

    def pyr_cur(a, b):
        pl = build_pyramid(to_grayscale(a), 3)
        pr = build_pyramid(to_grayscale(b), 3)
        return sum(p.sum() for p in pl) + sum(p.sum() for p in pr)

    timed("current (reshape-mean chain)", pyr_cur)

    def ds_rw(img):
        s = lax.reduce_window(img, 0.0, lax.add, (2, 2), (2, 2), "VALID")
        return s * 0.25

    def pyr_rw(a, b):
        out = 0.0
        for im0 in (to_grayscale(a), to_grayscale(b)):
            p = im0
            out += p.sum()
            for _ in range(2):
                p = ds_rw(p)
                out += p.sum()
        return out

    timed("reduce_window 2x2", pyr_rw)

    mats = {}

    def ds_mxu(img):
        Hh, Ww = img.shape
        if (Hh, Ww) not in mats:
            Dh = np.zeros((Hh // 2, Hh), np.float32)
            Dh[np.arange(Hh // 2), 2 * np.arange(Hh // 2)] = 0.5
            Dh[np.arange(Hh // 2), 2 * np.arange(Hh // 2) + 1] = 0.5
            Dw = np.zeros((Ww // 2, Ww), np.float32)
            Dw[np.arange(Ww // 2), 2 * np.arange(Ww // 2)] = 0.5
            Dw[np.arange(Ww // 2), 2 * np.arange(Ww // 2) + 1] = 0.5
            mats[(Hh, Ww)] = (jnp.asarray(Dh), jnp.asarray(Dw))
        Dh, Dw = mats[(Hh, Ww)]
        return (Dh @ img) @ Dw.T

    def pyr_mxu(a, b):
        out = 0.0
        for im0 in (to_grayscale(a), to_grayscale(b)):
            p = im0
            out += p.sum()
            for _ in range(2):
                p = ds_mxu(p)
                out += p.sum()
        return out

    timed("matmul downsample (MXU)", pyr_mxu)

    def ds_strided(img):
        a = img
        return (a[0::2, 0::2] + a[1::2, 0::2] + a[0::2, 1::2]
                + a[1::2, 1::2]) * 0.25

    def pyr_strided(a, b):
        out = 0.0
        for im0 in (to_grayscale(a), to_grayscale(b)):
            p = im0
            out += p.sum()
            for _ in range(2):
                Hh, Ww = p.shape
                p = ds_strided(p[: Hh // 2 * 2, : Ww // 2 * 2])
                out += p.sum()
        return out

    timed("strided add", pyr_strided)

    # correctness
    ref = np.asarray(downsample2x(to_grayscale(img_l)))
    for nm, f in (("rw", ds_rw), ("mxu", ds_mxu), ("strided", ds_strided)):
        got = np.asarray(f(to_grayscale(img_l)[: 376, : 1240]))
        r = ref[: got.shape[0], : got.shape[1]]
        print(f"{nm} max|diff| {float(np.abs(got - r).max()):.2e}")
    print(f"backend: {jax.default_backend()} {jax.devices()[0]}")


if __name__ == "__main__":
    main()
