from rso.frontend.detect import Features, detect_features, octave_budget
from rso.frontend.pyramid import (
    bilinear_remap,
    build_pyramid,
    downsample2x,
    to_grayscale,
)
from rso.frontend.stereo_match import (
    StereoMatches,
    hamming_matrix,
    match_left_right,
    sad_matrix,
)
from rso.frontend.track import TrackResult, track_interframe

__all__ = [
    "Features",
    "detect_features",
    "octave_budget",
    "bilinear_remap",
    "build_pyramid",
    "downsample2x",
    "to_grayscale",
    "StereoMatches",
    "hamming_matrix",
    "match_left_right",
    "sad_matrix",
    "TrackResult",
    "track_interframe",
]
