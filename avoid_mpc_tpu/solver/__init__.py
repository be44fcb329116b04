from avoid_mpc_tpu.solver.boxqp import boxqp  # noqa: F401
from avoid_mpc_tpu.solver.ilqr import (  # noqa: F401
    MPCProblem,
    SolverHyper,
    SolverParams,
    SolveResult,
    solve,
    solve_batched,
)
