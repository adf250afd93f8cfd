"""Device mesh + sharding helpers — the framework's parallelism layer.

The reference's only parallelism is single-process DataParallel replication
over GPUs (reference: scripts/train.py:45-47 and the same wrap in every test
script). The TPU-native equivalent is SPMD over a `jax.sharding.Mesh`:
annotate the batch axis with a NamedSharding and let XLA insert the ICI
collectives (gradient psum, etc.) — no explicit communication backend.

One 1-D "data" axis covers the reference's capability surface (models are
~1-11M params, fully replicated). The helpers are written to extend to more
axes later (propagation batches shard over the same axis).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices=None, axis_name: str = DATA_AXIS) -> Mesh:
    """A 1-D mesh over all (or the given) local devices."""
    devices = jax.devices() if devices is None else list(devices)
    return Mesh(np.asarray(devices), (axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard axis 0 (batch) over the mesh, replicate the rest."""
    return NamedSharding(mesh, P(axis_name))


def shard_batch(batch, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Place a host batch onto the mesh, sharded along axis 0.

    The batch's leading dim must divide evenly by the mesh size; callers pad
    or trim first (static shapes — no dynamic padding inside jit).
    """
    n = mesh.devices.size
    if batch.shape[0] % n:
        raise ValueError(
            f"batch dim {batch.shape[0]} not divisible by mesh size {n}"
        )
    return jax.device_put(batch, batch_sharding(mesh, axis_name))


def pad_to_multiple(batch, multiple: int):
    """Pad the batch's leading axis to a multiple by repeating the last item.

    Returns (padded batch, number of real items). Loss/metric reductions use
    the real count to stay exact. Works on host (numpy) and device (jax)
    arrays alike — device inputs are padded on device, never copied to host.
    """
    b = batch.shape[0]
    rem = (-b) % multiple
    if rem == 0:
        return batch, b
    xp = jnp if isinstance(batch, jax.Array) else np
    pad = xp.repeat(batch[-1:], rem, axis=0)
    return xp.concatenate([batch, pad], axis=0), b
