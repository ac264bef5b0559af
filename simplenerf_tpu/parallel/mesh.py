"""Device-mesh data parallelism for ray batches.

The SPMD story replacing the reference's single-process 2-GPU
torch.nn.DataParallel (src/Trainer01.py:514, SURVEY.md §2.10): a 1-D
`jax.sharding.Mesh` over all chips with the ray batch sharded on axis
'rays' and every other operand (MLP params, optimizer state, the scene ray
cache and common data) replicated. The train step stays a single `jax.jit`
program — XLA partitions the per-ray compute and inserts psum collectives
over ICI for the loss reductions and parameter gradients, overlapping them
with the backward pass. The same code path runs on 1 chip (trivial mesh),
one host's chips, or a multi-host slice (each process feeds its local
shard of the index vector).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

RAY_AXIS = "rays"


def make_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over the given (default: all) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (RAY_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (ray) dimension across the mesh."""
    return NamedSharding(mesh, P(RAY_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_ray_batch(mesh: Mesh, tree):
    """Place every array in the pytree with its leading axis sharded."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh: Mesh, tree):
    """Fully replicate every array over the mesh.

    Multi-process: every process holds the same host value (same seeds /
    same checkpoint), so the full local array IS the per-process shard of a
    replicated global array — assembled via
    `jax.make_array_from_process_local_data`, the documented multi-host
    feed path (device_put cannot target non-addressable devices)."""
    sharding = replicated_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)), tree
        )
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


# ---------------------------------------------------------------------------
# Multi-host (multi-process) support
# ---------------------------------------------------------------------------


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join a multi-host JAX job (no-op on a single process).

    On TPU pods launched through the usual orchestrators every argument is
    discovered from the environment, so call this with no arguments before
    any other JAX API; pass explicit values only for manual multi-process
    CPU/GPU launches. Safe to call twice.
    """
    explicit = coordinator_address is not None
    env = any(
        k in __import__("os").environ
        for k in ("COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES")
    )
    if not (explicit or env):
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError:
        pass  # already initialized


def process_local_rows(n_global: int) -> slice:
    """The slice of a globally-sized, globally-seeded ray draw this process
    must materialize. Every process draws the SAME global index vector from
    the same host RNG seed and keeps only its contiguous block, so the
    global batch is identical to the single-process run."""
    per = n_global // jax.process_count()
    start = per * jax.process_index()
    return slice(start, start + per)


def shard_ray_batch_local(mesh: Mesh, tree):
    """Multi-host ray-batch feed: each process provides its LOCAL rows
    (see `process_local_rows`) and the arrays are assembled into global
    jax.Arrays sharded on the ray axis. Single-process: equivalent to
    `shard_ray_batch`."""
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)), tree
    )
