"""A/B the subpixel-refine neighbor fetch: dense masked map vs masked gathers.

Variant A (old): resp_f = where(isfinite(resp), resp, 0) densely, gather from it.
Variant B (new): gather from resp directly, mask the gathered [K] values.

Both full-step variants are built and timed interleaved in ONE process with
the in-graph scan, so remote-device drift between runs cannot skew the
comparison (intercepts were seen drifting 29-82ms across processes).
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    import rso.frontend.detect as D
    from rso.engine import init_state, make_step
    from rso.geometry.stereo_camera import StereoCamera
    from rso.synthetic import make_sequence, synthetic_config

    H, W = 376, 1241
    cam = StereoCamera.make(fx_l=718.856, fy_l=718.856, cx_l=W / 2.0,
                            cy_l=H / 2.0, baseline=0.5371)
    seq = make_sequence(n_frames=2, n_points=2000, H=H, W=W, cam=cam)
    cfg = synthetic_config()
    il, ir = jnp.asarray(seq.frames[0][0]), jnp.asarray(seq.frames[0][1])
    il2, ir2 = jnp.asarray(seq.frames[1][0]), jnp.asarray(seq.frames[1][1])

    new_select = D.select_topk   # current code = variant B

    def old_select(response, keep_mask, k, min_response=0.0, subpixel=True):
        Hh, Ww = response.shape
        masked = jnp.where(keep_mask, response, -jnp.inf)
        flat = masked.reshape(-1)
        vals, idx = lax.approx_max_k(flat, k, recall_target=0.95)
        yi = (idx // Ww).astype(jnp.int32)
        xi = (idx % Ww).astype(jnp.int32)
        valid = jnp.isfinite(vals) & (vals > min_response)
        xs = xi.astype(jnp.float32)
        ys = yi.astype(jnp.float32)
        if subpixel:
            def parab(vm, v0, vp):
                den = vm - 2.0 * v0 + vp
                off = jnp.where(jnp.abs(den) > 1e-6,
                                0.5 * (vm - vp) / jnp.where(
                                    jnp.abs(den) > 1e-6, den, 1.0), 0.0)
                return jnp.clip(off, -0.5, 0.5)

            resp_f = jnp.where(jnp.isfinite(response), response, 0.0)
            xm = jnp.clip(xi - 1, 0, Ww - 1); xp = jnp.clip(xi + 1, 0, Ww - 1)
            ym = jnp.clip(yi - 1, 0, Hh - 1); yp = jnp.clip(yi + 1, 0, Hh - 1)
            v0 = resp_f[yi, xi]
            dx = parab(resp_f[yi, xm], v0, resp_f[yi, xp])
            dy = parab(resp_f[ym, xi], v0, resp_f[yp, xi])
            xs = xs + jnp.where(valid, dx, 0.0)
            ys = ys + jnp.where(valid, dy, 0.0)
        xy = jnp.stack([xs, ys], axis=-1)
        return xy, jnp.where(valid, vals, 0.0), valid

    def build(variant):
        D.select_topk = variant
        step = make_step(cfg, cam, H, W)
        st0 = init_state(cfg, (H, W))
        st0, _ = jax.jit(step)(st0, il, ir)

        def body(carry, _):
            st, flip = carry
            l = jnp.where(flip, il, il2)
            r = jnp.where(flip, ir, ir2)
            st, _res = step(st, l, r)
            return (st, ~flip), None

        runs = {}
        for N in (20, 120):
            runs[N] = jax.jit(partial_scan(body, st0, N))
            runs[N]()
            jax.block_until_ready(runs[N]())
        return runs

    def partial_scan(body, st0, N):
        return lambda: lax.scan(body, (st0, jnp.bool_(True)), None,
                                length=N)[0]

    def slope(runs):
        ts = {}
        for N in (20, 120):
            best = 1e9
            for _ in range(2):
                t0 = time.perf_counter()
                jax.block_until_ready(runs[N]())
                best = min(best, time.perf_counter() - t0)
            ts[N] = best
        return (ts[120] - ts[20]) / 100

    runs_a = build(old_select)
    runs_b = build(new_select)
    for rnd in range(3):
        sa = slope(runs_a)
        sb = slope(runs_b)
        print(f"round {rnd}: A dense-mask {sa*1e3:7.3f} ms | "
              f"B masked-gather {sb*1e3:7.3f} ms | B-A {(sb-sa)*1e6:+6.1f} us")
    D.select_topk = new_select


if __name__ == "__main__":
    main()
