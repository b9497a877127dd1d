"""Multi-sequence data parallelism (BASELINE config 5: batched 8-sequence
fusion across chips).

The reference is strictly single-sequence; its only multi-GPU axis is the
bundling/reconstruction pipeline split. The TPU-native scale-out axis is
*sequences*: shard_map over a `seq` mesh axis runs the whole chunk pipeline —
preprocess, SIFT, matching, filtering, local BA, TSDF integration — once per
device on that device's sequence, with zero cross-chip traffic until the
(optional) sharded global solve (``sharded_ba.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..config import BundlingConfig, AppConfig
from ..fusion import tsdf
from ..fusion.blocks import BlockTable
from ..geometry.camera import CameraModel
from ..bundle import chunk as chunk_mod


def make_multiseq_chunk_fn(
    mesh: Mesh,
    cam: CameraModel,
    cache_cam: CameraModel,
    cfg: BundlingConfig,
    axis: str = "seq",
):
    """Returns a jitted fn(depth [D, S+1, H, W], color [D, S+1, H, W, 3]) ->
    (local_trajs [D, S+1, 4, 4], chunk_valid [D]) running one chunk of D
    independent sequences, one per device."""

    def per_device(depth, color):
        res = chunk_mod.process_chunk(depth[0], color[0], cam, cache_cam, cfg)
        return res.local_traj[None], res.chunk_valid[None]

    # check_vma=False: the chunk program's internal scans mix invarying
    # constants with per-device data, which the vma type system rejects even
    # though each device's program is self-contained
    fn = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )
    return jax.jit(fn)


def make_multiseq_fusion_fn(
    mesh: Mesh,
    cam: CameraModel,
    app_cfg: AppConfig,
    axis: str = "seq",
):
    """Returns a jitted fn(tables [D-sharded BlockTable], depth [D, H, W],
    color [D, H, W, 3], poses [D, 4, 4]) -> tables: every device integrates
    its sequence's frame into its own shard of the block-table stack."""

    def per_device(table, depth, color, pose):
        t = jax.tree.map(lambda x: x[0], table)
        t2, _ = tsdf.integrate(t, depth[0], color[0], pose[0], cam, app_cfg)
        return jax.tree.map(lambda x: x[None], t2)

    fn = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    return jax.jit(fn)


def stack_tables(tables: list[BlockTable]) -> BlockTable:
    return jax.tree.map(lambda *xs: jnp.stack(xs), *tables)
