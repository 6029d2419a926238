from .tableaux import (
    Tableau, implicit_euler, explicit_euler, one_step_theta, alexander2,
    fractional_step_theta)
from .onestep import LinearOneStepMethod, cfl_timestep

__all__ = [
    "Tableau", "implicit_euler", "explicit_euler", "one_step_theta",
    "alexander2", "fractional_step_theta", "LinearOneStepMethod", "cfl_timestep",
]
