"""Sequence(time)-parallel chunk processing with ring halo exchange.

SURVEY.md §2.2 "SP/CP": the honest analog of sequence parallelism for this
workload — shard *chunks along time* across devices. Each chunk's local BA is
anchored at its own first frame, so chunks are data-independent given their
frames; the only cross-device dependency is the 1-frame overlap between
neighboring chunks, exchanged with a `ppermute` ring over ICI (the
ring-attention-shaped communication the survey calls out).

Given D devices and frames [D*S + 1] (S = submap size), device d processes
chunk d = frames [d*S, (d+1)*S]. The input is sharded so device d holds its S
non-overlap frames; the overlap frame (the first frame of chunk d+1) arrives
from the right neighbor via ppermute. Offline replay gets a ~Dx speedup on the
local-bundling stage; the (cheap, serial) keyframe chaining and global solve
run after the fan-out.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..bundle import chunk as chunk_mod
from ..config import BundlingConfig
from ..geometry.camera import CameraModel


def make_timeshard_chunk_fn(
    mesh: Mesh,
    cam: CameraModel,
    cache_cam: CameraModel,
    cfg: BundlingConfig,
    axis: str = "seq",
):
    """Returns a jitted fn(depth [D*S, H, W], color [D*S, H, W, 3], tail_depth
    [H, W], tail_color [H, W, 3]) -> (local_trajs [D, S+1, 4, 4],
    chunk_valid [D], keyframe keys/caches batched [D]).

    `tail_*` is frame D*S (the final overlap frame, completing the last chunk).
    Inside shard_map, each device ppermutes its FIRST frame to the left
    neighbor, which appends it as its chunk's overlap frame; the last device
    uses the replicated tail frame.
    """
    s = cfg.submap_size

    def per_device(depth, color, tail_depth, tail_color):
        # depth: [S, H, W] local shard (device d holds frames d*S .. d*S+S-1)
        d_axis_idx = jax.lax.axis_index(axis)
        n_dev = jax.lax.axis_size(axis)
        # halo: receive the right neighbor's FIRST frame (their frame 0 is our
        # overlap frame d*S + S); ring shifted left by one
        perm = [(i, (i - 1) % n_dev) for i in range(n_dev)]
        halo_d = jax.lax.ppermute(depth[0], axis, perm)
        halo_c = jax.lax.ppermute(color[0], axis, perm)
        # the last device's "right neighbor" wrapped around — use the tail
        is_last = d_axis_idx == n_dev - 1
        halo_d = jnp.where(is_last, tail_depth[0], halo_d)
        halo_c = jnp.where(is_last, tail_color[0], halo_c)
        chunk_depth = jnp.concatenate([depth, halo_d[None]], axis=0)  # [S+1, H, W]
        chunk_color = jnp.concatenate([color, halo_c[None]], axis=0)
        res = chunk_mod.process_chunk(chunk_depth, chunk_color, cam, cache_cam, cfg)
        out_keys = jax.tree.map(lambda x: x[None], res.keyframe_keys)
        out_cache = jax.tree.map(lambda x: x[None], res.keyframe_cache)
        return (
            res.local_traj[None],
            res.chunk_valid[None],
            out_keys,
            out_cache,
        )

    fn = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P()),
        out_specs=(P(axis), P(axis), P(axis), P(axis)),
        check_vma=False,
    )

    def wrapper(depth, color, tail_depth, tail_color):
        # keep a leading length-1 axis on the replicated tail so in_specs align
        return fn(depth, color, tail_depth[None], tail_color[None])

    return jax.jit(wrapper)


def chain_keyframe_poses(
    local_trajs: np.ndarray,  # [D, S+1, 4, 4]
    anchor: np.ndarray,  # [4, 4] world pose of frame 0
) -> np.ndarray:
    """Serial composition of the chunk-parallel results: keyframe d's world
    pose = anchor ∘ prod_{c<d} local_traj_c[-1] (the cheap O(D) tail the
    fan-out leaves behind)."""
    d = local_trajs.shape[0]
    poses = np.zeros((d, 4, 4), np.float32)
    cur = anchor.astype(np.float32)
    for c in range(d):
        poses[c] = cur
        cur = cur @ local_trajs[c, -1]
    return poses
