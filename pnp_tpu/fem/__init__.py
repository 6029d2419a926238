from .quadrature import triangle_rule, interval_rule
from .reference import ReferenceTriangle
from .space import FunctionSpace
from .geometry import VolumeTables, BoundaryTables, build_volume_tables, build_boundary_tables

__all__ = [
    "triangle_rule", "interval_rule", "ReferenceTriangle", "FunctionSpace",
    "VolumeTables", "BoundaryTables", "build_volume_tables", "build_boundary_tables",
]
