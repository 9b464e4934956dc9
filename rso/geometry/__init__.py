from rso.geometry.rotations import (
    rodrigues,
    rodrigues_with_grad,
    rotvec_from_matrix,
)
from rso.geometry.se3 import (
    pose_compose,
    pose_inverse,
    pose_matrix,
    pose_from_matrix,
    pose_apply,
)
from rso.geometry.stereo_camera import (
    StereoCamera,
    triangulate,
    project_stereo,
    project_stereo_with_jacobian,
    project_landmarks,
)

__all__ = [
    "rodrigues",
    "rodrigues_with_grad",
    "rotvec_from_matrix",
    "pose_compose",
    "pose_inverse",
    "pose_matrix",
    "pose_from_matrix",
    "pose_apply",
    "StereoCamera",
    "triangulate",
    "project_stereo",
    "project_stereo_with_jacobian",
    "project_landmarks",
]
