"""rso — TPU-native robust stereo visual odometry framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
famoreno/stereo-vo ("Robust Stereo Odometry"): rectify -> detect ->
stereo-match -> track -> robust Gauss-Newton pose, as one compiled XLA
program per frame, plus sliding-window / distributed bundle adjustment
the reference never had.
"""

__version__ = "0.1.0"

import jax as _jax

# On TPU, f32 matmuls/einsums default to bf16 MXU passes (~3 decimal digits).
# That is the right trade for neural nets but wrong for this library's
# geometry: an 8-bit mantissa on ~1000-px coordinates is a multi-pixel error,
# which visibly degrades RANSAC gating and the GN normal equations (bench ATE
# 0.22 -> 0.14 m on the same scene after this switch).  Paths that *want*
# reduced precision (the MXU patch-distance shortlist) cast to bf16
# explicitly and are unaffected.
_jax.config.update("jax_default_matmul_precision", "highest")

from rso.config import RSOConfig, load_config

__all__ = ["RSOConfig", "load_config", "__version__"]
