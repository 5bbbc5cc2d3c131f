"""Device mesh + sharding helpers.

Replaces the reference's process-group machinery
(/root/reference/flow2gan/dist.py, torch DDP + NCCL) with the JAX-native
model: a `jax.sharding.Mesh` with a `data` axis; the train step is jitted
over the mesh with batch inputs sharded on `data` and params replicated —
XLA inserts the gradient all-reduce over ICI (GSPMD), no explicit
collectives or process groups in user code.

Multi-host: call `init_distributed()` once per process (coordinator env vars
as in jax.distributed), then the same code runs unchanged — `make_mesh` uses
all global devices.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(**kwargs) -> None:
    """Multi-host init (reference setup_dist, dist.py:25-43).

    MUST run before any other jax call initializes the backends (so no
    jax.process_count() probing here). Single-process launches (no
    coordinator configured) are a silent no-op; a genuine multi-host init
    failure propagates."""
    import os

    configured = kwargs.get("coordinator_address") or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    ) or os.environ.get("COORDINATOR_ADDRESS")
    if not configured:
        return  # single-process
    jax.distributed.initialize(**kwargs)


def make_mesh(
    axis_names: Sequence[str] = ("data",),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """1-D data mesh over all devices by default."""
    if devices is None:
        devices = jax.devices()
    arr = np.asarray(devices)
    if len(axis_names) > 1:
        raise NotImplementedError(
            "flow2gan models are data-parallel (the reference's only strategy); "
            "pass a prebuilt Mesh for experimental layouts"
        )
    return Mesh(arr, axis_names=tuple(axis_names))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) dim on 'data', replicate the rest."""
    spec = P("data", *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def _put_global(x, sharding: NamedSharding):
    """device_put that also works when the mesh spans multiple processes.

    Multi-host, jax.device_put cannot target non-addressable devices; the
    host-local array (this process's share of the data) is assembled into a
    global jax.Array instead. For batch shardings the local array IS this
    process's shard (the DataLoader yields per-process shards, so the global
    batch is process_count x local); for replicated shardings every process
    passes the same full array."""
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))
    return jax.device_put(x, sharding)


def shard_batch(batch, mesh: Mesh):
    """Device-put a pytree of host arrays with batch-dim sharding."""
    return jax.tree.map(
        lambda x: _put_global(x, data_sharding(mesh, np.ndim(x))), batch
    )


def replicate(tree, mesh: Mesh):
    """Device-put a pytree fully replicated over the mesh."""
    sh = replicated(mesh)
    return jax.tree.map(lambda x: _put_global(x, sh), tree)


def host_local(tree):
    """Host-addressable copy of a (replicated) global pytree.

    Multi-host, params live as global jax.Arrays spanning non-addressable
    devices; running a process-local computation on them (e.g. the rank-0
    TB sample dump) would either fail ("not fully addressable") or compile a
    multi-host program only one process executes, deadlocking the others.
    Params on the data mesh are fully replicated, so every process's first
    addressable shard holds the complete value — extract it. Single-process
    arrays pass through unchanged."""

    def get(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return np.asarray(x.addressable_data(0))
        return x

    return jax.tree.map(get, tree)


# NOTE: multi-host data feeding convention — the DataLoader yields this
# process's shard (1/process_count of the global batch; trainers divide
# --batch-size by process_count) and _put_global assembles the global
# jax.Array from those host-local shards. There is deliberately no
# batch-slicing helper here: slicing an already-process-sharded loader
# batch again would double-shard.
