"""Device-time micro-bench for stage-3/4/5 sub-pieces (scatter suspects)."""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from rso.config import RSOConfig, LeastSquaresParams
    from rso.engine import _stage5_nms
    from rso.frontend.detect import Features
    from rso.frontend.stereo_match import match_left_right, _arbitrate_right
    from rso.solver.ransac import ransac_fundamental
    from rso.solver.robust_gn import solve_pose
    from rso.geometry.stereo_camera import StereoCamera

    cfg = RSOConfig()
    K = cfg.tpu.max_kps_per_octave
    T = cfg.tpu.max_tracks
    W, H = 1241, 376
    rng = np.random.default_rng(0)
    cam = StereoCamera.make(fx_l=718.0, fy_l=718.0, cx_l=W / 2, cy_l=H / 2,
                            baseline=0.54)

    def mk_feats():
        return Features(
            xy=jnp.asarray(np.stack([rng.uniform(8, W - 8, K),
                                     rng.uniform(8, H - 8, K)], -1),
                           jnp.float32),
            response=jnp.asarray(rng.uniform(1, 100, K), jnp.float32),
            valid=jnp.ones((K,), bool),
            desc=jnp.zeros((K, 8), jnp.uint32),
            patch=jnp.asarray(rng.uniform(0, 255, (K, 64)), jnp.float32),
        )

    fl, fr = mk_feats(), mk_feats()
    N = 30

    def timed(name, fn, seed_arr):
        def body(carry, _):
            out = fn(seed_arr + carry * 1e-9)
            return carry + out, None

        run = jax.jit(lambda: lax.scan(body, jnp.float32(0.0), None,
                                       length=N)[0])
        run()
        r = run(); r.block_until_ready()
        t0 = time.perf_counter()
        r = run(); r.block_until_ready()
        print(f"{name:<46}{(time.perf_counter()-t0)/N*1e3:9.3f} ms")

    def full_match(p):
        m = match_left_right(fl._replace(patch=p), fr, cfg.lr_match, W, 0.0,
                             use_mxu=True)
        return m.dist.sum()

    timed("stage3 match_left_right (1 octave, mxu)", full_match, fl.patch)

    def arb_only(p):
        cand_r = jnp.argsort(p[:, 0]).astype(jnp.int32)  # arbitrary perm
        cand_d = p[:, 1]
        ok = p[:, 2] > 60
        s = _arbitrate_right(cand_r, cand_d, ok, K, keep_best=True)
        return s.sum().astype(jnp.float32)

    timed("  _arbitrate_right (segment_min)", arb_only, fl.patch)

    xy_t = jnp.asarray(np.stack([rng.uniform(8, W - 8, T),
                                 rng.uniform(8, H - 8, T)], -1), jnp.float32)
    resp_t = jnp.asarray(rng.uniform(1, 100, T), jnp.float32)
    mask_t = jnp.asarray(rng.random(T) < 0.7)

    def nms_only(x):
        return _stage5_nms(x, resp_t, mask_t, W, H,
                           cfg.detect.min_distance).sum().astype(jnp.float32)

    timed("stage5 NMS (segment_min over cells)", nms_only, xy_t)

    prev = jnp.asarray(rng.uniform(100, 1000, (T, 4)), jnp.float32)
    cur = prev + 2.0

    def ransac_only(x):
        res = ransac_fundamental(x[:, :2], cur[:, :2], mask_t,
                                 jax.random.PRNGKey(0),
                                 n_iters=cfg.tpu.ransac_iters,
                                 threshold=cfg.tpu.ransac_threshold)
        return res.inliers.sum().astype(jnp.float32)

    timed("ransac_fundamental (64 hyp)", ransac_only, prev)

    def solve_only(x):
        sol = solve_pose(cam, x, cur, mask_t, LeastSquaresParams())
        return sol.cost

    timed("solve_pose (two-phase GN)", solve_only, prev)

    print(f"\nbackend: {jax.default_backend()} {jax.devices()[0]}")


if __name__ == "__main__":
    main()
