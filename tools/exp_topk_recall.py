"""Measure exact vs approximate top-K in the detect stage on TPU.

VERDICT round-1 weak #6: select_topk uses approx_max_k(recall_target=0.95),
which can silently drop up to 5% of true detections.  This experiment
quantifies (a) the per-image detect-stage time at recall 0.95 vs 1.0, and
(b) how many of the exact top-K winners the approximate pass drops on real
detection responses.  Decision data for the TPUParams default.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def main():
    from rso.config import DetectParams
    from rso.frontend import detect as D
    from rso.synthetic import make_textured_sequence, make_sequence

    H, W = 376, 1241
    from rso.geometry.stereo_camera import StereoCamera
    cam = StereoCamera.make(fx_l=718.856, fy_l=718.856, cx_l=W / 2.0,
                            cy_l=H / 2.0, baseline=0.5371)
    seqs = {
        "textured": make_textured_sequence(n_frames=2, H=H, W=W, cam=cam,
                                           px_per_m=24.0, corridor=(8.0, 3.0)),
        "blob": make_sequence(n_frames=2, n_points=4000, H=H, W=W, cam=cam),
    }
    params = DetectParams()
    K = 512

    def detect_with(recall, img, th):
        """detect_features with select_topk recall pinned."""
        # reproduce the FASTER branch up to selection
        corner = D.fast_corner_mask(img, th, arc=12)
        resp = jnp.where(corner, D.shi_tomasi_response(img, params.KLT_win),
                         -jnp.inf)
        keep = D.nms_grid(resp, params.min_distance) & (resp > -jnp.inf)
        ys = lax.broadcasted_iota(jnp.int32, (H, W), 0)
        xs = lax.broadcasted_iota(jnp.int32, (H, W), 1)
        inb = (xs >= 5) & (xs < W - 5) & (ys >= 5) & (ys < H - 5)
        keep = keep & inb
        masked = jnp.where(keep, resp, -jnp.inf).reshape(-1)
        vals, idx = lax.approx_max_k(masked, K, recall_target=recall)
        valid = jnp.isfinite(vals) & (vals > 10.0)
        return idx, valid

    f95 = jax.jit(lambda im, th: detect_with(0.95, im, th))
    f100 = jax.jit(lambda im, th: detect_with(1.0, im, th))

    for name, seq in seqs.items():
        drops = []
        for l, _ in seq.frames:
            img = jnp.asarray(l, jnp.float32)
            th = jnp.int32(20)
            i95, v95 = jax.device_get(f95(img, th))
            i100, v100 = jax.device_get(f100(img, th))
            exact = set(np.asarray(i100)[np.asarray(v100)].tolist())
            approx = set(np.asarray(i95)[np.asarray(v95)].tolist())
            n = len(exact)
            dropped = len(exact - approx)
            drops.append((dropped, n))
        print(f"{name}: dropped/total per frame: {drops}", flush=True)

    # timing: 200 iterations each, carry-dependent to defeat hoisting
    img0 = jnp.asarray(seqs["textured"].frames[0][0], jnp.float32)
    for label, fn in (("recall=0.95", f95), ("recall=1.00", f100)):
        def body(c, _):
            idx, valid = fn(img0 + c, jnp.int32(20))
            return c + jnp.float32(1e-6), idx[0]
        scan = jax.jit(lambda: lax.scan(body, jnp.float32(0), None, length=50))
        scan()  # compile
        n_rep = 4
        ts = []
        for _ in range(n_rep):
            t0 = time.perf_counter()
            jax.block_until_ready(scan())
            ts.append(time.perf_counter() - t0)
        print(f"{label}: {min(ts)/50*1e6:.1f} us per detect-select pass", flush=True)


if __name__ == "__main__":
    main()
