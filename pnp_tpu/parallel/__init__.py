from .sharding import (
    make_device_mesh, pad_elements, shard_volume_tables, replicate)

__all__ = ["make_device_mesh", "pad_elements", "shard_volume_tables", "replicate"]
