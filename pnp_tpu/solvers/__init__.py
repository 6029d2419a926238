from .krylov import cg, bicgstab, KrylovResult
from .precond import identity_precond, jacobi_precond, chebyshev_jacobi_precond
from .newton import newton_solve, NewtonParams, NewtonResult
from .linear_problem import stationary_linear_solve, make_krylov_solver

__all__ = [
    "cg", "bicgstab", "KrylovResult",
    "identity_precond", "jacobi_precond", "chebyshev_jacobi_precond",
    "newton_solve", "NewtonParams", "NewtonResult",
    "stationary_linear_solve", "make_krylov_solver",
]
