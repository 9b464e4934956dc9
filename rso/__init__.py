"""rso — TPU-native robust stereo visual odometry framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
famoreno/stereo-vo ("Robust Stereo Odometry"): rectify -> detect ->
stereo-match -> track -> robust Gauss-Newton pose, as one compiled XLA
program per frame, plus sliding-window / distributed bundle adjustment
the reference never had.
"""

__version__ = "0.1.0"

from rso.config import RSOConfig, load_config

__all__ = ["RSOConfig", "load_config", "__version__"]
