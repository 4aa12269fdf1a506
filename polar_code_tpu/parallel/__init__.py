from .mesh import (
    frames_mesh,
    shard_frames,
    local_mesh_devices,
    maybe_distributed_init,
    is_coordinator,
    sync_processes,
)

__all__ = [
    "frames_mesh",
    "shard_frames",
    "local_mesh_devices",
    "maybe_distributed_init",
    "is_coordinator",
    "sync_processes",
]
