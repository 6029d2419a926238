from .writers import write_dat, write_vtu, CurrentWriter
from .checkpoint import save_checkpoint, load_checkpoint

__all__ = ["write_dat", "write_vtu", "CurrentWriter",
           "save_checkpoint", "load_checkpoint"]
