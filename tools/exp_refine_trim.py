"""Can subpixel refine shed window evals without losing its ATE win?

refine_positions does 5 in-patch window evaluations per call (3 GN
iterations + 2 SSD evals for the acceptance gate) x 2 eyes x 3 octaves;
the whole feature costs ~+0.74 ms/step on v5e.  This A/Bs trimmed
variants on the textured corridor (the scene where the knob earns its
6-15% ATE win) before touching the product code.

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu PYTHONPATH=. \
           python tools/exp_refine_trim.py [n_frames]
"""
import dataclasses
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    import jax.numpy as jnp

    import rso.frontend.refine as refine_mod
    from rso.engine import Engine
    from rso.geometry.se3 import pose_matrix
    from rso.metrics.ate import ate_rmse
    from rso.synthetic import make_textured_sequence, textured_config

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    base = textured_config()
    orig = refine_mod.refine_positions

    def patched(iters, gate):
        if gate:
            return functools.partial(orig, iters=iters)

        # no-gate variant: drop the two SSD evals, accept whenever the
        # gradient system was solvable (same ok=det>1e-6 condition)
        def nogate(img, templates, xy, valid, iters=iters, max_shift=2.0):
            import jax
            from jax import lax
            from rso.frontend.detect import extract_patches
            _PAD, _S = refine_mod._PAD, refine_mod._S
            H, W = img.shape
            img_p = jnp.pad(img, _PAD, mode="edge")
            x = jnp.clip(xy[:, 0], 0.0, W - 1.0)
            y = jnp.clip(xy[:, 1], 0.0, H - 1.0)
            cx = jnp.round(x).astype(jnp.int32)
            cy = jnp.round(y).astype(jnp.int32)
            centers = jnp.stack([(cx + _PAD).astype(jnp.float32),
                                 (cy + _PAD).astype(jnp.float32)], axis=1)
            patches = extract_patches(img_p, centers, size=_S,
                                      offset=_PAD).reshape(-1, _S, _S)
            frac = jnp.stack([x - cx, y - cy], axis=1)

            def one(t, patch, r):
                T = t.reshape(8, 8)
                gx = jnp.zeros((8, 8)).at[:, 1:7].set(
                    (T[:, 2:] - T[:, :-2]) * 0.5)
                gy = jnp.zeros((8, 8)).at[1:7, :].set(
                    (T[2:, :] - T[:-2, :]) * 0.5)
                Gxx = jnp.sum(gx * gx)
                Gxy = jnp.sum(gx * gy)
                Gyy = jnp.sum(gy * gy)
                det = Gxx * Gyy - Gxy * Gxy
                ok = det > 1e-6
                inv = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
                idx = jnp.arange(_S, dtype=jnp.int32)
                nine = jnp.arange(9, dtype=jnp.int32)

                def window(d):
                    q = r + d
                    bx = jnp.clip(jnp.floor(q[0]).astype(jnp.int32), -3, 2)
                    by = jnp.clip(jnp.floor(q[1]).astype(jnp.int32), -3, 2)
                    fx = q[0] - bx
                    fy = q[1] - by
                    rsel = (idx[None, :] == (_PAD + by - 3 + nine)[:, None])
                    csel = (idx[None, :] == (_PAD + bx - 3 + nine)[:, None])
                    cp = (rsel.astype(patch.dtype) @ patch
                          @ csel.astype(patch.dtype).T)
                    return ((1 - fy) * (1 - fx) * cp[:8, :8]
                            + (1 - fy) * fx * cp[:8, 1:9]
                            + fy * (1 - fx) * cp[1:9, :8]
                            + fy * fx * cp[1:9, 1:9])

                def body(_, d):
                    e = window(d) - T
                    bx_ = jnp.sum(gx * e)
                    by_ = jnp.sum(gy * e)
                    ddx = -(Gyy * bx_ - Gxy * by_) * inv
                    ddy = -(-Gxy * bx_ + Gxx * by_) * inv
                    return jnp.clip(d + jnp.stack([ddx, ddy]),
                                    -max_shift, max_shift)

                d = lax.fori_loop(0, iters, body, jnp.zeros(2))
                return jnp.where(ok, d, jnp.zeros(2))

            delta = jax.vmap(one)(templates, patches, frac)
            refined = jnp.stack([cx.astype(xy.dtype), cy.astype(xy.dtype)],
                                axis=1) + frac + delta
            return jnp.where(valid[:, None], refined, xy)

        return nogate

    variants = {
        "off": None,
        "on(i3,gate)": patched(3, True),
        "on(i2,gate)": patched(2, True),
        "on(i3,nogate)": patched(3, False),
        "on(i2,nogate)": patched(2, False),
    }
    results = {k: [] for k in variants}
    for seed in (0, 1, 2):
        seq = make_textured_sequence(n_frames=n, seed=seed, speed=0.5)
        for name, fn in variants.items():
            refine_mod.refine_positions = orig if fn is None else fn
            cfg = base.replace(tpu=dataclasses.replace(
                base.tpu, subpixel_track_refine=(fn is not None)))
            eng = Engine(cfg, seq.cam)
            T = np.eye(4)
            poses = [T.copy()]
            nval = 0
            for l, r in seq.frames:
                res = eng.process_frame(l, r)
                if bool(res.valid):
                    nval += 1
                T = T @ np.asarray(pose_matrix(jnp.asarray(res.pose)))
                poses.append(T.copy())
            a = ate_rmse(np.stack(poses)[1:], seq.poses)
            results[name].append(a)
            print(f"seed {seed} {name:>14}: ATE {a:.4f} m ({nval}/{n})",
                  flush=True)
    refine_mod.refine_positions = orig
    print()
    for name, vals in results.items():
        arr = np.asarray(vals)
        print(f"{name:>14}: mean {arr.mean():.4f}  max {arr.max():.4f}")


if __name__ == "__main__":
    main()
