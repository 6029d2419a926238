from . import volume, boundary, pnp, common

__all__ = ["volume", "boundary", "pnp", "common"]
