"""Device-mesh scale-out for Monte-Carlo sweeps.

The reference is strictly single-threaded (`dl_scl_polar/utils/seeding.py:8,18`);
this tier is new.  The workload is embarrassingly parallel over frames, so the
design is simple and rides entirely on XLA's SPMD partitioner:

* a 1-D `Mesh` over all devices with a ``frames`` axis (optionally a 2-D
  ``(snr, frames)`` mesh when sweeping several Eb/N0 points concurrently);
* batched pipelines annotate their frame-major arrays with
  `with_sharding_constraint(P("frames", ...))` — every decode op partitions
  cleanly because all state tensors carry the batch in the trailing/leading
  axis and never mix frames;
* the only cross-device communication is the final counter reduction
  (`jnp.sum` over the sharded batch axis → an XLA `all-reduce` over ICI),
  a few scalars per chunk;
* multi-host runs call `jax.distributed.initialize` (`maybe_distributed_init`)
  and use the same code path over the global device set, with counters
  reduced across DCN at chunk boundaries.

Determinism: random draws derive from `fold_key(root, snr_tag, chunk_idx)`
and JAX's partitionable threefry, so results are independent of the mesh
shape for a fixed chunk size.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def local_mesh_devices(max_devices: Optional[int] = None) -> Sequence[jax.Device]:
    devices = jax.devices()
    if max_devices is not None:
        devices = devices[:max_devices]
    return devices


def frames_mesh(num_devices: Optional[int] = None) -> Mesh:
    """1-D mesh with a `frames` data-parallel axis over the device set."""

    devices = local_mesh_devices(num_devices)
    return Mesh(devices, axis_names=("frames",))


def local_frames_mesh() -> Optional[Mesh]:
    """`frames` mesh over THIS process's local devices only (or None for 1).

    Used by the Eb/N0-point-split sweep mode: each process simulates whole
    sweep points independently on its local chips, so no per-chunk DCN
    collectives are needed — only the final row merge."""

    devices = jax.local_devices()
    return Mesh(devices, axis_names=("frames",)) if len(devices) > 1 else None


def split_points(n_points: int) -> list:
    """Round-robin assignment of sweep-point indices to this process.

    Deterministic in (process_index, process_count); with the per-point
    key-folding discipline the owning process does not affect the result,
    so a split run merges to the byte-identical table of an unsplit run."""

    return list(range(jax.process_index(), n_points, jax.process_count()))


def allgather_table_exact(table) -> "np.ndarray":
    """Merge a per-process [rows, fields] float64 table across processes.

    Each row is owned by exactly one process (zeros elsewhere).  The f64
    payload is transported bit-exactly by viewing it as int32 pairs —
    portable to TPU backends (no f64/x64 on device) and immune to float
    rounding, so merged sweep CSVs are byte-identical to unsplit runs.
    Single-process: returns the table unchanged."""

    import numpy as np

    table = np.ascontiguousarray(table, dtype=np.float64)
    if jax.process_count() <= 1:
        return table
    from jax.experimental import multihost_utils

    bits = table.view(np.int32)  # [rows, 2*fields] exact bit pattern
    gathered = np.asarray(multihost_utils.process_allgather(bits))
    # exactly one process contributes a nonzero row; the rest are 0.0
    # (all-zero bit patterns), so an integer sum reconstructs each row
    merged = gathered.sum(axis=0, dtype=np.int64).astype(np.int32)
    return merged.view(np.float64).reshape(table.shape)


def shard_frames(x, mesh: Optional[Mesh], axis: int = 0):
    """Constrain `x` to be sharded along its frame axis on `mesh`."""

    if mesh is None or len(mesh.devices.flat) <= 1:
        return x
    spec = [None] * x.ndim
    spec[axis] = "frames"
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))


def _cluster_markers_present() -> bool:
    """True only when the environment indicates an actual MULTI-process
    managed-cluster launch that JAX's auto-detection (jax._src.clusters:
    SLURM, OpenMPI, k8s jobset, GCE/GKE TPU pods) can bootstrap.

    Deliberately stricter than the detectors themselves: e.g. a plain
    single-process pod sets ``KUBERNETES_SERVICE_HOST`` (which is enough to
    trip jax's k8s detector, which then fails without a jobset index) —
    requiring the multi-process evidence here keeps `maybe_distributed_init`
    silent in ordinary single-process environments.
    """

    env = os.environ

    def _int(name: str) -> int:
        try:
            return int(env.get(name, "0"))
        except ValueError:
            return 0

    if "SLURM_JOB_ID" in env and _int("SLURM_NTASKS") > 1:
        return True
    if _int("OMPI_COMM_WORLD_SIZE") > 1:
        return True
    # k8s: jax's detector additionally needs an indexed-job completion index
    if "KUBERNETES_SERVICE_HOST" in env and "JOB_COMPLETION_INDEX" in env:
        return True
    # TPU pod: multiple worker hostnames (comma-separated list)
    if "," in env.get("TPU_WORKER_HOSTNAMES", ""):
        return True
    if env.get("MEGASCALE_COORDINATOR_ADDRESS"):
        return True
    return False


def maybe_distributed_init() -> bool:
    """Initialize multi-host JAX when launched under a pod/cluster runtime.

    No-op in single-process runs.  Two activation paths, checked in order:

    1. ``JAX_COORDINATOR_ADDRESS`` set (with ``JAX_NUM_PROCESSES`` /
       ``JAX_PROCESS_ID``, required outside managed clusters) — explicit;
    2. a managed-cluster env marker present (SLURM, OpenMPI, k8s, TPU pod)
       — defer to ``jax.distributed.initialize()`` auto-detection; failure
       to detect falls back to single-process with a warning.

    Idempotent: a second call is a no-op.  Returns True when multi-process.
    """

    global _DIST_INITIALIZED
    if _DIST_INITIALIZED:
        return jax.process_count() > 1
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr:
        nproc = os.environ.get("JAX_NUM_PROCESSES")
        pid = os.environ.get("JAX_PROCESS_ID")
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(nproc) if nproc else None,
            process_id=int(pid) if pid else None,
        )
        _DIST_INITIALIZED = True
    elif _cluster_markers_present():
        try:
            jax.distributed.initialize()
            _DIST_INITIALIZED = True
        except Exception as exc:
            import warnings

            warnings.warn(
                f"cluster markers present but jax.distributed auto-detection "
                f"failed ({exc}); continuing single-process"
            )
    if _DIST_INITIALIZED and jax.process_count() > 1:
        # Establish the cross-process collective context (Gloo/ICI clique)
        # now, while all processes are within milliseconds of each other.
        # The first collective otherwise runs only after each process has
        # compiled its (large) step graph, and the transport's context
        # handshake has a ~30 s internal deadline — under CPU contention the
        # compile-time skew between processes can exceed it and abort the
        # job with "Gloo context initialization failed: DEADLINE_EXCEEDED".
        # The same deadline also bites at STARTUP when process launch skew
        # exceeds 30 s (seen under xdist-parallel test runs), so first
        # align everyone with a coordination-service barrier — plain gRPC
        # with a generous explicit timeout — and only then form the
        # collective context.
        sync_processes("pre_warmup_align")
        sync_processes("collective_init_warmup", collective=True)
    return jax.process_count() > 1


_DIST_INITIALIZED = False


def is_coordinator() -> bool:
    """True on the process that should own stdout/CSV/plot/state artifacts.

    Multi-host sweeps run the same SPMD program everywhere (including the
    host-side stopping-rule loops, which consume identical replicated
    counters on every process), but only process 0 writes artifacts.
    """

    return jax.process_index() == 0


_BARRIER_SEQ: dict = {}


def sync_processes(
    tag: str = "barrier", *, timeout_s: float = 300.0, collective: bool = False
) -> None:
    """Barrier across all processes (no-op single-process).

    Used at sweep exit so the coordinator does not tear down the
    distributed service while other hosts still have chunks in flight.

    The default path is the coordination-service barrier (plain gRPC with
    an explicit, generous timeout): a device collective here rides the
    transport's ~30 s internal deadline, which one process stalled on
    artifact writes under heavy CPU contention (e.g. xdist-parallel test
    runs) can exceed.  ``collective=True`` instead runs a real device
    collective (`sync_global_devices`) — what the post-init warm-up needs,
    since its whole point is forming the Gloo context.

    The barrier choice must be all-or-none across processes: if some
    processes waited at the coordination-service barrier while others ran
    the device collective, the mismatched rendezvous would hang until the
    timeout.  The coordination client is process-global state created by
    `jax.distributed.initialize`, so in multi-process mode its absence on
    THIS process means it is (or will be) absent everywhere it matters —
    we fail fast with a RuntimeError rather than fall back per-process.
    """

    if jax.process_count() <= 1:
        return
    if not collective:
        try:
            from jax._src.distributed import global_state

            client = global_state.client
        except Exception as exc:
            raise RuntimeError(
                "sync_processes: multi-process run but the distributed "
                "coordination client is unavailable (jax internals moved?) "
                "— call sync_processes(collective=True) everywhere instead"
            ) from exc
        if client is None:
            raise RuntimeError(
                "sync_processes: process_count > 1 but no coordination "
                "client — was jax.distributed.initialize skipped?"
            )
        # coordination-service barrier ids are single-use: suffix a
        # per-tag sequence number so repeated sweeps in one process
        # (e.g. resume tests) get fresh barriers
        seq = _BARRIER_SEQ.get(tag, 0)
        _BARRIER_SEQ[tag] = seq + 1
        client.wait_at_barrier(f"{tag}_{seq}", int(timeout_s * 1000))
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(tag)


__all__ = [
    "allgather_table_exact",
    "frames_mesh",
    "local_frames_mesh",
    "split_points",
    "shard_frames",
    "local_mesh_devices",
    "maybe_distributed_init",
    "is_coordinator",
    "sync_processes",
]
