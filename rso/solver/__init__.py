from rso.solver.robust_gn import (
    PoseSolveResult,
    solve_pose,
    VOEC_NONE,
    VOEC_BAD_TRACKING,
    VOEC_BAD_COND_NUMBER,
    VOEC_INCR_FUNC_COST_STG1,
    VOEC_INCR_FUNC_COST_STG2,
    VOEC_FIRST_ITERATION,
)
from rso.solver.ransac import RansacResult, ransac_fundamental

__all__ = [
    "PoseSolveResult",
    "solve_pose",
    "RansacResult",
    "ransac_fundamental",
    "VOEC_NONE",
    "VOEC_BAD_TRACKING",
    "VOEC_BAD_COND_NUMBER",
    "VOEC_INCR_FUNC_COST_STG1",
    "VOEC_INCR_FUNC_COST_STG2",
    "VOEC_FIRST_ITERATION",
]
