"""Device-mesh data parallelism.

The reference is strictly single-GPU (SURVEY.md section 2.3: no distributed
backend of any kind); the TPU-native scaling axis is SPMD data parallelism
over the image batch via jax.sharding: batch-dim arrays are sharded over a
1-D 'data' mesh axis, parameters are replicated, and XLA inserts the
gradient all-reduces (including the scatter-add adjoints of the light-probe
texel fetches and hash-grid lookups) over ICI automatically.
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = 'data'):
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis_name,))


def shard_batch(mesh: Mesh, tree, axis_name: str = 'data'):
    """Place every array in `tree` with its leading (batch) dim sharded."""
    def put(x):
        spec = P(axis_name, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, tree)


def replicate(mesh: Mesh, tree):
    def put(x):
        return jax.device_put(x, NamedSharding(mesh, P()))
    return jax.tree.map(put, tree)
