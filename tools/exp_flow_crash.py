"""Flow-mode scan crash repro (round-1: N>=45 KITTI-size flow frames in one
scan dispatch reproducibly crashed the TPU worker; sliced to 32 since).
Runs one flow-mode chunk at the requested N without slicing."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses
import numpy as np


def main():
    import jax, jax.numpy as jnp
    from jax import lax
    from rso.config import IFMatchMethod
    from rso.engine import Engine, init_state, make_step
    from rso.geometry.stereo_camera import StereoCamera
    from rso.synthetic import make_sequence, synthetic_config

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 45
    W, H = 1241, 376
    cam = StereoCamera.make(fx_l=718.856, fy_l=718.856, cx_l=W/2.0,
                            cy_l=H/2.0, baseline=0.5371)
    seq = make_sequence(n_frames=N, n_points=N*17, H=H, W=W, cam=cam,
                        speed=0.8)
    cfg = synthetic_config()
    cfg = cfg.replace(if_match=dataclasses.replace(
        cfg.if_match, ifm_method=IFMatchMethod.OPTICAL_FLOW))
    L = jnp.stack([jnp.asarray(l) for l, _ in seq.frames])
    R = jnp.stack([jnp.asarray(r) for _, r in seq.frames])
    step = make_step(cfg, cam, H, W)

    def chunk(st, ls, rs):
        return lax.scan(lambda s, lr: step(s, lr[0], lr[1]), st, (ls, rs))

    st = init_state(cfg, (H, W))
    stf, res = jax.jit(chunk)(st, L, R)
    jax.block_until_ready(res.pose)
    ok = np.asarray(res.valid)
    print(f"N={N}: OK, valid {int(ok.sum())}/{N}", flush=True)


if __name__ == "__main__":
    main()
