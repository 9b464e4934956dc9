"""A/B device-time bench for the dense detection responses."""
import time


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from rso.frontend.detect import (fast_corner_mask, shi_tomasi_response,
                                     _shift2d, _box_sum)
    from rso.synthetic import make_sequence

    H, W = 376, 1241
    seq = make_sequence(n_frames=1, n_points=2000, H=H, W=W)
    img = jnp.asarray(seq.frames[0][0], jnp.float32)
    N = 30

    def timed(name, fn):
        def body(carry, _):
            out = fn(img + carry * 1e-9)
            return carry + out, None

        run = jax.jit(lambda: lax.scan(body, jnp.float32(0.0), None,
                                       length=N)[0])
        run()
        r = run(); r.block_until_ready()
        t0 = time.perf_counter()
        r = run(); r.block_until_ready()
        print(f"{name:<48}{(time.perf_counter()-t0)/N*1e3:9.3f} ms")

    def box_rw(x, r):
        s = 2 * r + 1
        y = lax.reduce_window(x, 0.0, lax.add, (s, 1), (1, 1), "SAME")
        return lax.reduce_window(y, 0.0, lax.add, (1, s), (1, 1), "SAME")

    def st_current(im):
        return shi_tomasi_response(im, 4).sum()

    def st_rw(im, dtype=jnp.float32):
        im = im.astype(dtype)
        gx = (_shift2d(im, 1, 0) - _shift2d(im, -1, 0)) * 0.5
        gy = (_shift2d(im, 0, 1) - _shift2d(im, 0, -1)) * 0.5
        n = dtype(81.0)
        gxx = box_rw(gx * gx, 4) / n
        gyy = box_rw(gy * gy, 4) / n
        gxy = box_rw(gx * gy, 4) / n
        tr_half = 0.5 * (gxx + gyy)
        det_term = jnp.sqrt(jnp.maximum(
            0.25 * (gxx - gyy) ** 2 + gxy * gxy, 0.0))
        return (tr_half - det_term).astype(jnp.float32).sum()

    timed("shi_tomasi integral-image (current)", st_current)
    timed("shi_tomasi reduce_window f32", st_rw)
    timed("shi_tomasi reduce_window bf16",
          lambda im: st_rw(im, jnp.bfloat16))

    def fast_f32(im):
        return fast_corner_mask(im, jnp.int32(20)).sum().astype(jnp.float32)

    def fast_bf16(im):
        return fast_corner_mask(im.astype(jnp.bfloat16),
                                jnp.int32(20)).sum().astype(jnp.float32)

    timed("fast_corner_mask f32 (current)", fast_f32)
    timed("fast_corner_mask bf16", fast_bf16)

    print(f"\nbackend: {jax.default_backend()} {jax.devices()[0]}")


if __name__ == "__main__":
    main()
