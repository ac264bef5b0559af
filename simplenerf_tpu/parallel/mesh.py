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
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
