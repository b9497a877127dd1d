"""Device-mesh helpers (SURVEY.md §2.2: the communication backend is jax
collectives over ICI — psum/all_gather/ppermute inside shard_map — replacing
the reference's host-staged dual-GPU copies and CUDA<->DX11 interop)."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "seq") -> Mesh:
    """1-D mesh over the first n devices (sequences or keyframe rows).

    If the default platform has fewer than n devices, fall back to the CPU
    platform (which can expose virtual devices via
    --xla_force_host_platform_device_count, the rebuild's fake backend).
    """
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        try:
            cpu = jax.devices("cpu")
        except RuntimeError:
            cpu = []
        if len(cpu) >= n:
            devs = cpu
        else:
            raise ValueError(
                f"requested {n} devices, have {len(devs)} "
                f"(+{len(cpu)} cpu)"
            )
    return Mesh(np.array(devs[:n]), (axis,))


def seq_sharding(mesh: Mesh, axis: str = "seq") -> NamedSharding:
    """Shard the leading (sequence/row) axis, replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
