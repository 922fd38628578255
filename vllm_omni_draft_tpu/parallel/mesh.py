"""Device-mesh construction and multi-host initialization.

The TPU-native replacement for the reference's NCCL/Ray/collective_rpc
plane (SURVEY.md §2.3): a `jax.sharding.Mesh` with ("dp", "tp") axes —
DP replicates the engine across hosts/chips, TP shards target weights and
KV over ICI. XLA inserts all collectives; there is no hand-written
communication code on the data plane.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import AxisType, Mesh

from vllm_omni_draft_tpu.config import ParallelConfig

DP_AXIS = "dp"
TP_AXIS = "tp"


def init_distributed(cfg: ParallelConfig) -> None:
    """Multi-host bring-up: one process per host, rendezvous at the
    coordinator (the analog of the reference's DP stateless process group,
    `src/doc/VLLM_V1_Interface.md:90`)."""
    if cfg.distributed_init and cfg.num_hosts > 1:
        jax.distributed.initialize(
            coordinator_address=cfg.coordinator_address,
            num_processes=cfg.num_hosts,
            process_id=cfg.host_id,
        )


def make_mesh(cfg: ParallelConfig, devices=None) -> Mesh:
    """(dp, tp) mesh over the available devices. TP is the fast (minor)
    axis so its collectives ride contiguous ICI neighbors."""
    devices = devices if devices is not None else jax.devices()
    dp, tp = cfg.data_parallel_size, cfg.tensor_parallel_size
    if dp * tp > len(devices):
        raise ValueError(
            f"mesh ({dp}x{tp}) needs {dp*tp} devices, have {len(devices)}"
        )
    devs = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(devs, (DP_AXIS, TP_AXIS), axis_types=(AxisType.Auto, AxisType.Auto))


def single_device_mesh() -> Mesh:
    return Mesh(
        np.asarray(jax.devices()[:1]).reshape(1, 1),
        (DP_AXIS, TP_AXIS),
        axis_types=(AxisType.Auto, AxisType.Auto),
    )


def host_np(x) -> np.ndarray:
    """Device array -> host numpy, multi-process-safe.

    Single-process (the common case): plain np.asarray. Under
    `jax.distributed` a global array's shards live on other hosts and
    np.asarray raises; replicated arrays read their local copy, sharded
    ones allgather (driver-on-every-host engine replication, SURVEY §7
    step 7: each host computes the same schedule, so every host needs
    the same readback values)."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        if x.is_fully_replicated:
            return np.asarray(x.addressable_data(0))
        from jax.experimental import multihost_utils

        return np.asarray(
            multihost_utils.process_allgather(x, tiled=True)
        )
    return np.asarray(x)
