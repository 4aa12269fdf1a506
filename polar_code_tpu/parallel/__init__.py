from .mesh import (
    frames_mesh,
    shard_frames,
    local_mesh_devices,
    maybe_distributed_init,
)

__all__ = [
    "frames_mesh",
    "shard_frames",
    "local_mesh_devices",
    "maybe_distributed_init",
]
