"""VO + sliding-window BA pipeline: the configs[3] capability in BASELINE.json
("Malaga Urban long sequences with sliding-window BA on one host").

Host-side orchestration around the jitted engine step and the jitted BA
solve: per-frame VO -> keyframe policy (driven by the reference's
tracked-since-KF counters) -> window update -> BA refinement of keyframe
poses -> trajectory correction propagated to the running pose.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from rso.ba.ba import bundle_adjust
from rso.ba.window import KeyframeObs, SlidingWindow, should_make_keyframe
from rso.config import RSOConfig
from rso.engine import Engine, EngineState
from rso.geometry import pose_matrix
from rso.geometry.stereo_camera import StereoCamera


def keyframe_obs_from_state(state: EngineState, cfg: RSOConfig,
                            pose_wc: np.ndarray) -> KeyframeObs:
    """Extract the current frame's stereo observations + match IDs from the
    engine state (state.prev holds the just-processed frame)."""
    ids_all, obs_all = [], []
    for o, oct_data in enumerate(state.prev.octaves):
        scale = float(2 ** o)
        shift = (scale - 1.0) / 2.0
        valid = np.asarray(oct_data.matches.valid)
        ids = np.asarray(oct_data.match_ids)[valid]
        lxy = np.asarray(oct_data.left.xy)[valid] * scale + shift
        ridx = np.asarray(oct_data.matches.ridx)[valid]
        rxy = np.asarray(oct_data.right.xy)[ridx] * scale + shift
        obs = np.concatenate([lxy, rxy[:, :1], rxy[:, 1:2]], axis=1)
        keep = ids >= 0
        ids_all.append(ids[keep])
        obs_all.append(obs[keep])
    return KeyframeObs(
        pose_wc=np.asarray(pose_wc),
        ids=np.concatenate(ids_all).astype(np.int64),
        obs=np.concatenate(obs_all).astype(np.float32),
    )


class BAFrameResult(NamedTuple):
    pose_wc: np.ndarray      # current camera-to-world (BA-refined lineage)
    vo_valid: bool
    is_keyframe: bool
    ba_cost: float | None


class VOWithBA:
    """Per-frame VO with keyframe-rate sliding-window BA refinement."""

    def __init__(self, cfg: RSOConfig, cam: StereoCamera,
                 max_keyframes: int = 8, max_landmarks: int = 1024,
                 ba_iters: int = 15, mesh=None,
                 min_tracked_ratio: float = 0.25, min_tracked_abs: int = 25):
        self.engine = Engine(cfg, cam)
        self.cfg = cfg
        self.cam = cam
        self.window = SlidingWindow(max_keyframes, max_landmarks)
        self.ba_iters = ba_iters
        self.mesh = mesh
        self.min_tracked_ratio = min_tracked_ratio
        self.min_tracked_abs = min_tracked_abs
        self.T = np.eye(4)
        self._last_kf_T = np.eye(4)

    def process_frame(self, left, right) -> BAFrameResult:
        res = self.engine.process_frame(left, right)
        valid = bool(res.valid)
        if valid:
            self.T = self.T @ np.asarray(pose_matrix(res.pose))

        total_matches = int(np.asarray(res.stereo_matches).sum())
        first = len(self.window) == 0 and total_matches > 0
        make_kf = first or (valid and should_make_keyframe(
            int(res.tracked_feats_from_last_KF), total_matches,
            self.min_tracked_ratio, self.min_tracked_abs))

        ba_cost = None
        if make_kf and self.engine.state is not None:
            kf = keyframe_obs_from_state(self.engine.state, self.cfg, self.T)
            self.window.add_keyframe(kf)
            self.engine.set_this_frame_as_kf()

            if len(self.window) >= 3:
                prob, _ids = self.window.build_problem(self.cam)
                n_shared = int(np.asarray(prob.mask).any(0).sum())
                if n_shared < 24:
                    # too few shared landmarks: a window solve would be
                    # noise-driven and can degrade the trajectory
                    return BAFrameResult(pose_wc=self.T.copy(),
                                         vo_valid=valid, is_keyframe=True,
                                         ba_cost=None)
                if self.mesh is not None:
                    from rso.ba.distributed import distributed_bundle_adjust

                    out = distributed_bundle_adjust(
                        self.cam, prob, self.mesh, max_iters=self.ba_iters)
                else:
                    out = bundle_adjust(self.cam, prob,
                                        max_iters=self.ba_iters)
                ba_cost = float(out.cost)
                refined = self.window.apply_result(np.asarray(out.poses))
                # propagate the refinement of the newest keyframe to the
                # running pose (the tail of the trajectory rides on it)
                self.T = refined[-1]
        return BAFrameResult(pose_wc=self.T.copy(), vo_valid=valid,
                             is_keyframe=bool(make_kf), ba_cost=ba_cost)
