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
``jax.distributed.initialize`` (see ``get_mesh(allow_multihost=True)`` /
:func:`init_multihost`).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Join a multi-host (DCN-spanning) run via ``jax.distributed.initialize``.

    Multi-host JAX is SPMD over processes: every host runs this same program,
    ``jax.devices()`` becomes the GLOBAL device list after initialization, and
    the same ``Mesh``/``NamedSharding`` code then spans hosts — collectives
    ride ICI within a slice and DCN across slices, with no code change
    (SURVEY.md §5).

    The coordinator is resolved from the arguments or, when omitted, from the
    standard env vars (``JAX_COORDINATOR_ADDRESS``/``COORDINATOR_ADDRESS``,
    ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``) — the same names
    ``jax.distributed.initialize`` auto-detects; on Cloud TPU pods initialize
    needs no arguments at all, so any coordinator env triggers the call and
    the TPU runtime fills in the rest.

    Returns True when the distributed client is (now) initialized, False for
    a plain single-host run (no coordinator configured — a safe no-op, so
    drivers can call this unconditionally).  Idempotent: a second call after
    successful initialization returns True without re-initializing.
    """
    if jax.distributed.is_initialized():
        return True
    coordinator_address = (
        coordinator_address
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("COORDINATOR_ADDRESS")
    )
    if coordinator_address is None:
        return False
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def get_mesh(
    n_devices: Optional[int] = None,
    axis_name: str = "data",
    devices: Optional[Sequence[jax.Device]] = None,
    allow_multihost: bool = False,
) -> Mesh:
    """1-D data mesh over the fastest interconnect (ICI within a slice).

    ``allow_multihost=True`` first joins the distributed runtime when a
    coordinator is configured (:func:`init_multihost`); the mesh is then
    built over the GLOBAL device list, so the same jitted code spans hosts
    over DCN.  Without a coordinator this is identical to the default
    single-host mesh.
    """
    if allow_multihost:
        init_multihost()
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
