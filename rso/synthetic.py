"""Synthetic stereo sequence generator with exact ground truth.

Renders a random 3D blob field from a moving rectified stereo rig (host-side
numpy).  Used by the test suite and the benchmark so the framework is fully
exercisable without KITTI/EuRoC data on disk; the blobs produce FAST corners
and locally-distinctive patches so the real detection/matching/tracking path
runs end-to-end.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np

from rso.geometry.stereo_camera import StereoCamera


def synthetic_config():
    """RSOConfig tuned for the synthetic blob sequences.

    The reference's SAD acceptance thresholds (sad_max_distance=200 for 8x8
    u8 patches) assume real-image textures; the synthetic field has much
    sharper gradients, so subpixel misalignment alone produces SADs in the
    hundreds.  Scaled thresholds + a 1px epipolar tolerance.
    """
    import dataclasses
    from rso.config import RSOConfig

    cfg = RSOConfig()
    return cfg.replace(
        lr_match=dataclasses.replace(
            cfg.lr_match, max_y_diff=1.0, sad_max_distance=4000,
            sad_max_ratio=0.7, enable_robust_1to1_match=True,
            use_z_gate=True, min_z=2.0, max_z=25.0),
        if_match=dataclasses.replace(
            cfg.if_match, sad_max_distance=4000),
    )


class SyntheticSequence(NamedTuple):
    frames: list            # list of (left u8 [H,W], right u8 [H,W])
    rel_poses: np.ndarray   # [N-1, 4, 4] ground-truth T_{prev<-cur}
    poses: np.ndarray       # [N, 4, 4] camera-to-world
    cam: StereoCamera


def _rotmat(w):
    t = np.linalg.norm(w)
    if t < 1e-12:
        return np.eye(3)
    k = w / t
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(t) * K + (1 - np.cos(t)) * K @ K


def render_frame(pts_w, intens, sizes, T_wc, cam: StereoCamera, H, W, rng=None,
                 dist=None, R_lr=None):
    """Render left/right u8 images of the blob field from camera pose T_wc.

    dist: optional plumb-bob coefficients [k1,k2,p1,p2,k3] applied to both
    eyes (an UNrectified rig, for exercising the rectification path).
    R_lr: optional 3x3 rotation of the right camera wrt the left (rig
    misalignment; the rectifier must undo it).
    """
    R = T_wc[:3, :3]
    t = T_wc[:3, 3]
    pts_c = (pts_w - t) @ R  # world -> camera

    fx, fy = float(cam.fx_l), float(cam.fy_l)
    cx, cy = float(cam.cx_l), float(cam.cy_l)
    b = float(cam.baseline)

    imgs = []
    WIN = 4  # blob half-window (pixels)
    # intens doubles as amplitude; sizes carries (a,b,theta) anisotropy params
    for eye in (0, 1):
        img = np.full((H, W), 128.0, dtype=np.float32)
        P = pts_c.copy()
        P[:, 0] -= b if eye == 1 else 0.0
        if eye == 1 and R_lr is not None:
            # right-camera frame rotated wrt left: X_r = R_lr^T X_l'
            P = P @ R_lr  # rows: R_lr^T @ P
        vis = P[:, 2] > 0.5
        xn = P[vis, 0] / P[vis, 2]
        yn = P[vis, 1] / P[vis, 2]
        if dist is not None:
            from rso.io.calib import _distort

            d = _distort(np.stack([xn, yn], -1), dist)
            xn, yn = d[:, 0], d[:, 1]
        u = fx * xn + cx
        v = fy * yn + cy
        Z = P[:, 2]
        Ai = intens[vis]
        Pi = sizes[vis]  # [N,3]: sig_a, sig_b, theta
        inb = (u >= WIN + 1) & (u < W - WIN - 1) & (v >= WIN + 1) & (v < H - WIN - 1)
        u, v, Ai, Pi = u[inb], v[inb], Ai[inb], Pi[inb]
        # anti-aliased anisotropic Gaussian blobs at exact subpixel centers
        ub = np.floor(u).astype(np.int32)
        vb = np.floor(v).astype(np.int32)
        dyy, dxx = np.mgrid[-WIN : WIN + 1, -WIN : WIN + 1]
        gx = ub[:, None, None] + dxx[None]       # [N,9,9]
        gy = vb[:, None, None] + dyy[None]
        rx = gx - u[:, None, None]
        ry = gy - v[:, None, None]
        ct = np.cos(Pi[:, 2])[:, None, None]
        st = np.sin(Pi[:, 2])[:, None, None]
        ra = rx * ct + ry * st
        rb = -rx * st + ry * ct
        # blob size is metric: pixel footprint scales with fx/Z like a real
        # object, so appearance disambiguates depth (far blobs are small/dim
        # and never alias to near ones)
        zf = (fx / Z[vis][inb])[:, None, None]
        sa = np.clip(Pi[:, 0][:, None, None] * zf, 0.55, 3.2)
        sb = np.clip(Pi[:, 1][:, None, None] * zf, 0.55, 3.2)
        fade = np.clip(Pi[:, 0][:, None, None] * zf / 0.55, None, 1.0) ** 2
        e = (ra / sa) ** 2 + (rb / sb) ** 2
        vals = fade * Ai[:, None, None] * np.exp(-0.5 * e)
        np.add.at(img, (gy.ravel(), gx.ravel()), vals.ravel())
        # mild noise so patches are not exactly flat
        if rng is not None:
            img += rng.normal(0, 1.0, img.shape).astype(np.float32)
        imgs.append(np.clip(img, 0, 255).astype(np.uint8))
    return imgs[0], imgs[1]


def make_unrectified_sequence(n_frames=8, n_points=1500, H=240, W=376,
                              seed=0, speed=0.25,
                              dist=(-0.12, 0.04, 0.0005, -0.0005, 0.0),
                              rig_rot=(0.0, 0.006, 0.003)):
    """Synthetic sequence from a DISTORTED, slightly misaligned rig, plus its
    FullCalibration — for end-to-end tests of the rectification path
    (io.calib.compute_rectify_maps + Engine(rectify_maps=...))."""
    from scipy.spatial.transform import Rotation

    from rso.io.calib import FullCalibration

    rng = np.random.default_rng(seed)
    fx = 320.0
    cam = StereoCamera.make(fx_l=fx, fy_l=fx, cx_l=W / 2.0, cy_l=H / 2.0,
                            baseline=0.4)
    R_lr = Rotation.from_rotvec(np.asarray(rig_rot)).as_matrix()
    dist = np.asarray(dist, np.float64)

    pts = np.stack([
        rng.uniform(-18, 18, n_points),
        rng.uniform(-6, 6, n_points),
        rng.uniform(2.0, 45.0, n_points),
    ], axis=-1)
    amp = rng.uniform(60, 127, n_points) * rng.choice([-1.0, 1.0], n_points)
    sizes = np.stack([
        rng.uniform(0.02, 0.12, n_points),
        rng.uniform(0.02, 0.12, n_points),
        rng.uniform(0, np.pi, n_points),
    ], axis=-1).astype(np.float32)

    poses = []
    T = np.eye(4)
    for i in range(n_frames):
        poses.append(T.copy())
        step = np.eye(4)
        step[:3, 3] = np.array([0.0, 0.0, speed])
        T = T @ step
    poses = np.stack(poses)
    frames = [render_frame(pts, amp.astype(np.float32), sizes, poses[i], cam,
                           H, W, rng, dist=dist, R_lr=R_lr)
              for i in range(n_frames)]
    rel = [np.linalg.inv(poses[i - 1]) @ poses[i] for i in range(1, n_frames)]
    rel = np.stack(rel) if rel else np.zeros((0, 4, 4))

    K = np.array([[fx, 0, W / 2.0], [0, fx, H / 2.0], [0, 0, 1.0]])
    calib = FullCalibration(
        K_l=K, K_r=K, dist_l=dist, dist_r=dist,
        R_lr=R_lr, t_lr=np.array([0.4, 0.0, 0.0]), size=(H, W))
    seq = SyntheticSequence(frames=frames, rel_poses=rel, poses=poses,
                            cam=cam)
    return seq, calib


_REFERENCE_TEXTURE = "/root/reference/libstereo-odometry/tests/0L.png"


def default_texture(size: int = 512, seed: int = 0) -> np.ndarray:
    """A texture for the corridor renderer: the reference repo's real test
    image when present (real photographic texture), else procedural
    multi-octave noise (still gradient-rich, unlike Gaussian blobs)."""
    import os

    if os.path.exists(_REFERENCE_TEXTURE):
        try:
            try:
                import cv2

                tex = cv2.imread(_REFERENCE_TEXTURE, cv2.IMREAD_GRAYSCALE)
            except ImportError:
                from PIL import Image

                tex = np.asarray(Image.open(_REFERENCE_TEXTURE).convert("L"))
            if tex is not None:
                # crop the black rectification-fill borders so they don't
                # tile into the corridor as textureless voids
                h, w = tex.shape
                return tex[int(0.12 * h):int(0.88 * h),
                           int(0.08 * w):int(0.92 * w)]
        except OSError:
            pass
    rng = np.random.default_rng(seed)
    tex = np.zeros((size, size), np.float32)
    for octv in (4, 8, 16, 32, 64):
        g = rng.normal(0, 1, (octv, octv)).astype(np.float32)
        # bilinear upsample the octave to full size (tileable via wrap)
        yy = np.linspace(0, octv, size, endpoint=False)
        xx = np.linspace(0, octv, size, endpoint=False)
        y0 = np.floor(yy).astype(int); x0 = np.floor(xx).astype(int)
        fy = (yy - y0)[:, None]; fx = (xx - x0)[None, :]
        y1 = (y0 + 1) % octv; x1 = (x0 + 1) % octv
        up = (g[np.ix_(y0, x0)] * (1 - fy) * (1 - fx)
              + g[np.ix_(y0, x1)] * (1 - fy) * fx
              + g[np.ix_(y1, x0)] * fy * (1 - fx)
              + g[np.ix_(y1, x1)] * fy * fx)
        tex += up * (64.0 / octv ** 0.5)
    tex = 128 + 64 * tex / np.abs(tex).max() * 2
    return np.clip(tex, 0, 255).astype(np.uint8)


def _sample_texture(tex: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Bilinear sample a tiled texture at continuous (u,v) pixel coords."""
    TH, TW = tex.shape
    u = np.mod(u, TW); v = np.mod(v, TH)
    x0 = np.floor(u).astype(np.int64); y0 = np.floor(v).astype(np.int64)
    fx = (u - x0); fy = (v - y0)
    x1 = (x0 + 1) % TW; y1 = (y0 + 1) % TH
    t = tex.astype(np.float32)
    return (t[y0, x0] * (1 - fy) * (1 - fx) + t[y0, x1] * (1 - fy) * fx
            + t[y1, x0] * fy * (1 - fx) + t[y1, x1] * fy * fx)


def render_textured_frame(tex, T_wc, cam: StereoCamera, H, W,
                          corridor=(4.0, 2.0), px_per_m=48.0,
                          z_end=1e9, rng=None, supersample=2):
    """Ray-cast left/right u8 views of a texture-mapped corridor.

    The world is a corridor along +z: walls at x=+-corridor[0], floor and
    ceiling at y=+-corridor[1], an end-cap at z=z_end, every surface textured
    with `tex` at px_per_m texture pixels per meter.  Unlike the blob field,
    this produces dense photographic gradients — real-texture statistics for
    the detector, descriptors, and SAD matching.  Rendered at `supersample`x
    and box-downsampled (anti-aliasing at grazing angles).
    """
    a, b = corridor
    fx, fy = float(cam.fx_l), float(cam.fy_l)
    cx, cy = float(cam.cx_l), float(cam.cy_l)
    bl = float(cam.baseline)
    R = T_wc[:3, :3]
    t = T_wc[:3, 3]

    s = supersample
    Hs, Ws = H * s, W * s
    ys, xs = np.mgrid[0:Hs, 0:Ws].astype(np.float64)
    # supersampled pixel centers map to original pixel coords (x+0.5)/s - 0.5
    xn = ((xs + 0.5) / s - 0.5 - cx) / fx
    yn = ((ys + 0.5) / s - 0.5 - cy) / fy
    d_cam = np.stack([xn, yn, np.ones_like(xn)], axis=-1)   # [Hs,Ws,3]
    d = d_cam @ R.T                                         # world dirs

    out = []
    for eye in (0, 1):
        o = t + R @ np.array([bl * eye, 0.0, 0.0])
        best_t = np.full((Hs, Ws), np.inf)
        img = np.zeros((Hs, Ws), np.float32)
        # (axis, plane value, uv axes, shade): walls use (z,y), floor/ceiling
        # (z,x), end-cap (x,y); per-plane shade adds large-scale contrast
        planes = [(0, +a, (2, 1), 1.00), (0, -a, (2, 1), 0.85),
                  (1, +b, (2, 0), 0.70), (1, -b, (2, 0), 0.55),
                  (2, z_end, (0, 1), 0.80)]
        for axis, val, (ua, va), shade in planes:
            da = d[..., axis]
            with np.errstate(divide="ignore", invalid="ignore"):
                ti = (val - o[axis]) / da
            hit = np.isfinite(ti) & (ti > 0.05) & (ti < best_t)
            if not hit.any():
                continue
            p = o[None, :] + ti[hit][:, None] * d[hit]
            u = p[:, ua] * px_per_m
            v = p[:, va] * px_per_m
            img[hit] = _sample_texture(tex, u, v) * shade
            best_t[hit] = ti[hit]
        # box-downsample the supersampled render
        img = img.reshape(H, s, W, s).mean(axis=(1, 3))
        if rng is not None:
            img += rng.normal(0, 1.0, img.shape).astype(np.float32)
        out.append(np.clip(img, 0, 255).astype(np.uint8))
    return out[0], out[1]


def make_textured_sequence(
    texture: np.ndarray | None = None,
    n_frames: int = 10,
    H: int = 240,
    W: int = 376,
    seed: int = 0,
    speed: float = 0.25,
    yaw_rate: float = 0.004,
    cam: StereoCamera | None = None,
    corridor=(4.0, 2.0),
    px_per_m: float = 48.0,
) -> SyntheticSequence:
    """Forward motion with gentle yaw through a texture-mapped corridor.

    Same trajectory model as make_sequence but with photographic surface
    texture instead of Gaussian blobs — the real-imagery regression scene
    (detector/descriptor/SAD statistics match real images much more closely).
    """
    rng = np.random.default_rng(seed)
    if texture is None:
        texture = default_texture(seed=seed)
    if cam is None:
        cam = StereoCamera.make(fx_l=320.0, fy_l=320.0, cx_l=W / 2.0,
                                cy_l=H / 2.0, baseline=0.4)
    poses = []
    T = np.eye(4)
    for _ in range(n_frames):
        poses.append(T.copy())
        step = np.eye(4)
        step[:3, :3] = _rotmat(np.array([0.0, yaw_rate, 0.0]))
        step[:3, 3] = np.array([0.0, 0.0, speed])
        T = T @ step
    poses = np.stack(poses)
    z_end = n_frames * speed + 25.0
    frames = [render_textured_frame(texture, poses[i], cam, H, W,
                                    corridor=corridor, px_per_m=px_per_m,
                                    z_end=z_end, rng=rng)
              for i in range(n_frames)]
    rel = [np.linalg.inv(poses[i - 1]) @ poses[i] for i in range(1, n_frames)]
    rel = np.stack(rel) if rel else np.zeros((0, 4, 4))
    return SyntheticSequence(frames=frames, rel_poses=rel, poses=poses,
                             cam=cam)


def textured_config():
    """RSOConfig tuned for the textured corridor scenes: real-texture SAD
    levels (a good 8x8 match sits ~300-500, computeSAD8_unittest.cpp:28)
    with an epipolar row tolerance for subpixel detections."""
    import dataclasses
    from rso.config import RSOConfig

    cfg = RSOConfig()
    return cfg.replace(
        lr_match=dataclasses.replace(
            cfg.lr_match, max_y_diff=1.0, sad_max_distance=1500,
            sad_max_ratio=0.7, enable_robust_1to1_match=True),
        if_match=dataclasses.replace(cfg.if_match, sad_max_distance=1500),
    )


def make_sequence(
    n_frames: int = 10,
    n_points: int = 900,
    H: int = 240,
    W: int = 376,
    seed: int = 0,
    speed: float = 0.25,
    yaw_rate: float = 0.004,
    cam: StereoCamera | None = None,
) -> SyntheticSequence:
    """Forward motion with gentle yaw through a deep random blob field."""
    rng = np.random.default_rng(seed)
    if cam is None:
        cam = StereoCamera.make(fx_l=320.0, fy_l=320.0, cx_l=W / 2.0,
                                cy_l=H / 2.0, baseline=0.4)

    # points populate a corridor along the (yet-to-be-integrated) trajectory
    # so arbitrarily long sequences never run out of scene: each point
    # anchors to a random pose along the path plus a local offset
    poses_tmp = []
    T = np.eye(4)
    for i in range(n_frames):
        poses_tmp.append(T.copy())
        dR = _rotmat(np.array([0.0, yaw_rate, 0.0]))
        step = np.eye(4)
        step[:3, :3] = dR
        step[:3, 3] = np.array([0.0, 0.0, speed])
        T = T @ step
    anchors = np.stack(poses_tmp)[rng.integers(0, n_frames, n_points)]
    local = np.stack([
        rng.uniform(-18, 18, n_points),
        rng.uniform(-6, 6, n_points),
        rng.uniform(2.0, 45.0, n_points),
    ], axis=-1)
    pts = np.einsum("nij,nj->ni", anchors[:, :3, :3], local) + anchors[:, :3, 3]
    # signed amplitudes (bright & dark blobs on mid-gray) and random
    # anisotropy make each blob's 8x8 patch distinctive enough for SAD
    amp = rng.uniform(60, 127, n_points) * rng.choice([-1.0, 1.0], n_points)
    intens = amp.astype(np.float32)
    # metric blob radii (meters); pixel footprint = sigma_w * fx / Z
    sizes = np.stack([
        rng.uniform(0.02, 0.12, n_points),
        rng.uniform(0.02, 0.12, n_points),
        rng.uniform(0, np.pi, n_points),
    ], axis=-1).astype(np.float32)

    poses = []
    T = np.eye(4)
    for i in range(n_frames):
        poses.append(T.copy())
        dR = _rotmat(np.array([0.0, yaw_rate, 0.0]))
        step = np.eye(4)
        step[:3, :3] = dR
        step[:3, 3] = np.array([0.0, 0.0, speed])
        T = T @ step
    poses = np.stack(poses)

    frames = [render_frame(pts, intens, sizes, poses[i], cam, H, W, rng)
              for i in range(n_frames)]

    rel = []
    for i in range(1, n_frames):
        rel.append(np.linalg.inv(poses[i - 1]) @ poses[i])
    rel = np.stack(rel) if rel else np.zeros((0, 4, 4))
    return SyntheticSequence(frames=frames, rel_poses=rel,
                             poses=poses, cam=cam)
