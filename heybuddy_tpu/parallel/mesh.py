"""
Device-mesh configuration — the framework's first-class "communication" module.

The reference has no distributed layer at all (SURVEY.md §2.3): one CUDA device,
thread queues, a subprocess. The TPU-native equivalent is JAX's SPMD stack:
a :class:`jax.sharding.Mesh` over all chips, ``NamedSharding`` annotations on
batches and replicated parameters, and XLA-inserted collectives over ICI.

The wake-word classifier is ~100k parameters, so the right parallelism is pure
data parallelism: parameters replicated, batch sharded over the ``data`` axis,
gradients combined by XLA's reduce (a ``psum`` over ICI). The featurization
pipeline shards the clip batch the same way. A ``model`` axis is provisioned
for larger embedding/TTS models (mesh shape (data, model)); with model=1 it is
inert and costs nothing.

For multi-host pods call :func:`distributed_init` once per process before
creating the mesh.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from heybuddy_tpu.utils.log import logger

__all__ = [
    "distributed_init",
    "get_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "pad_batch_to_multiple",
]


def distributed_init(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX (no-op for single-process runs).

    On the CPU backend this selects the gloo collectives implementation so
    cross-process collectives actually execute — which is also how the
    multi-process path is exercised without a pod
    (``parallel/distributed_smoke.py``, spawned by tests/test_distributed.py).
    """
    if num_processes is None or num_processes <= 1:
        return
    try:
        # Read without initializing a backend: jax_platforms reflects any
        # jax.config pin (the sitecustomize plugin or our own cpu forcing).
        if "cpu" in str(jax.config.jax_platforms or ""):
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:  # pragma: no cover - older jaxlib without the option
        pass
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    logger.info(
        f"jax.distributed initialized: process {jax.process_index()}/{jax.process_count()}, "
        f"{jax.device_count()} global devices"
    )


@functools.lru_cache(maxsize=None)
def get_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices_key: Optional[Tuple[int, ...]] = None,
) -> Mesh:
    """
    Build the global device mesh with axes ``(data, model)``.

    ``data`` defaults to ``device_count() // model``. ``devices_key`` exists
    only to make the cache explicit when the device set changes (tests).
    """
    devices = np.asarray(jax.devices())
    if data is None:
        data = len(devices) // model
    if data * model > len(devices):
        raise ValueError(f"Mesh {data}x{model} needs {data * model} devices, have {len(devices)}")
    if data * model < len(devices):
        from heybuddy_tpu.utils.log import logger

        logger.warning(
            f"Mesh {data}x{model} uses {data * model} of {len(devices)} devices; "
            f"{len(devices) - data * model} devices will sit idle"
        )
    grid = devices[: data * model].reshape(data, model)
    return Mesh(grid, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (parameters, optimizer state, scalars)."""
    return NamedSharding(mesh, P())


def pad_batch_to_multiple(batch: np.ndarray, multiple: int) -> Tuple[np.ndarray, int]:
    """
    Pad axis 0 so it divides evenly across the data axis. Returns (padded, n_real).
    Padding rows are zeros; callers mask them out of losses/metrics.
    """
    n = batch.shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return batch, n
    padded = np.concatenate([batch, np.zeros((pad,) + batch.shape[1:], dtype=batch.dtype)], axis=0)
    return padded, n


def shard_batch(batch: np.ndarray, mesh: Mesh) -> jax.Array:
    """Place a host batch onto the mesh, sharded over the data axis.

    Single-process: a plain sharded ``device_put``. Multi-process (after
    :func:`distributed_init`): ``batch`` is this process's LOCAL shard of the
    global batch — every process contributes its rows and the returned global
    array has ``batch.shape[0] * process_count`` rows. ``device_put`` cannot
    address other processes' devices, so the multihost path goes through
    ``make_array_from_process_local_data``.
    """
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(batch_sharding(mesh), batch)
    return jax.device_put(batch, batch_sharding(mesh))
