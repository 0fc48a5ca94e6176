"""Mesh construction and sharding helpers.

The reference's distributed layer is env-var rank discovery + HCCL init +
DistributedGradReducer all-reduce (reference utils/parallel_info.py:6-18,
utils/train_one_step.py:38, examples/*/train.py init() call sites). The
TPU-native equivalent is declarative: build a ``Mesh`` over ``jax.devices()``
with named axes (``data`` for DP, optional ``model`` for TP and ``seq`` for
sequence parallelism), annotate shardings, and let GSPMD insert ``psum`` /
``all_gather`` over ICI.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "initialize_distributed",
    "make_mesh",
    "shard_batch",
    "batch_sharding",
    "replicated",
    "barrier",
    "get_rank_id",
    "get_device_id",
    "get_device_num",
]

_distributed_initialized = False


def initialize_distributed():
    """Multi-host bootstrap (no-op on single host).

    Replaces ``mindspore.communication.init()``: coordinator discovery comes
    from the standard JAX env vars or, on Cloud TPU pod slices, from the TPU
    runtime's own metadata (``jax.distributed.initialize()`` with no args
    auto-detects coordinator/process_id/num_processes there — pods set none
    of the generic env vars, so they must not gate the call).
    """
    global _distributed_initialized
    if _distributed_initialized:
        return
    explicit = int(os.environ.get("JAX_NUM_PROCESSES", os.environ.get("NPROC", "1")))
    pod_env = any(os.environ.get(v) for v in (
        "TPU_WORKER_HOSTNAMES", "TPU_WORKER_ID", "MEGASCALE_COORDINATOR_ADDRESS",
        "COORDINATOR_ADDRESS",
    ))
    if explicit > 1 or pod_env:
        try:
            jax.distributed.initialize()
        except Exception:
            if explicit > 1:
                raise  # explicitly-requested multi-process must not degrade
            # pod-env heuristic misfired (e.g. single-host TPU VM exporting
            # TPU_WORKER_ID=0, or metadata queries disabled): single-process
            import warnings

            warnings.warn("jax.distributed.initialize() failed; continuing "
                          "single-process", stacklevel=2)
    _distributed_initialized = True


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    seq: int = 1,
    devices: Optional[Sequence] = None,
):
    """Build a ``Mesh`` with axes ``(data, model, seq)``.

    ``data`` defaults to all remaining devices. Axis sizes must multiply to the
    device count; ICI-friendly orderings are delegated to
    ``jax.experimental.mesh_utils`` when available.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // (model * seq)
    assert data * model * seq == n, f"mesh {data}x{model}x{seq} != {n} devices"
    try:
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_device_mesh((data, model, seq), devices=devices)
    except Exception:
        dev_array = np.array(devices).reshape(data, model, seq)
    return Mesh(dev_array, axis_names=("data", "model", "seq"))


def batch_sharding(mesh, spec=("data",)):
    """NamedSharding that splits axis 0 of arrays over the data axis."""
    return NamedSharding(mesh, P(*spec))


def replicated(mesh):
    """Fully-replicated sharding (for params in pure-DP training)."""
    return NamedSharding(mesh, P())


def shard_batch(mesh, batch):
    """Device-put a host batch pytree with leading-axis data sharding."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def barrier(name: str = "sync"):
    """Cross-process barrier (replaces the reference's /tmp lock-file
    spin-waits for rank-0 coordination, reference callback.py:122-156)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


# env-compatible rank helpers (reference utils/parallel_info.py:6-18)
def get_rank_id():
    return jax.process_index()


def get_device_id():
    return jax.devices()[0].id if jax.process_count() == 1 else jax.process_index()


def get_device_num():
    return jax.device_count()
