from rso.ba.ba import BAProblem, BAResult, ba_normal_equations, bundle_adjust
from rso.ba.distributed import (
    distributed_bundle_adjust,
    make_mesh,
    pad_problem,
)
from rso.ba.window import KeyframeObs, SlidingWindow, should_make_keyframe

__all__ = [
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
