from rso.ba.ba import BAProblem, BAResult, ba_normal_equations, bundle_adjust
from rso.ba.distributed import (
    distributed_bundle_adjust,
    make_mesh,
    pad_problem,
)
from rso.ba.offline import KeyframeCollector, refine_trajectory
from rso.ba.window import KeyframeObs, SlidingWindow, should_make_keyframe
from rso.ba.window_sharded import (
    make_win_mesh,
    split_into_windows,
    stitch_window_poses,
    window_sharded_bundle_adjust,
)

__all__ = [
    "KeyframeCollector",
    "refine_trajectory",
    "make_win_mesh",
    "split_into_windows",
    "stitch_window_poses",
    "window_sharded_bundle_adjust",
    "BAProblem",
    "BAResult",
    "ba_normal_equations",
    "bundle_adjust",
    "distributed_bundle_adjust",
    "make_mesh",
    "pad_problem",
    "KeyframeObs",
    "SlidingWindow",
    "should_make_keyframe",
]
