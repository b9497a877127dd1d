"""Out-of-core block streaming: device <-> host.

Rebuild of ``DepthSensing/CUDASceneRepChunkGrid`` (SURVEY.md §2.1 "Out-of-core
streaming"): the world is partitioned into coarse chunks; blocks outside an
active radius around the camera are streamed off the GPU (here: to host
memory) and streamed back when the camera returns. The reference interleaves
pass0-collect / pass1-copy with integration; here each stream step is one
device compaction + one host-side dict update between jitted pipeline steps.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AppConfig
from .blocks import BLOCK, INVALID_KEY, BlockTable, allocate, block_origin, free_slots_by_mask, lookup, unpack_key


class HostBlockStore:
    """Host-side cold storage keyed by packed block coordinate."""

    def __init__(self) -> None:
        self._store: dict[int, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}

    def __len__(self) -> int:
        return len(self._store)

    def put(self, keys: np.ndarray, sdf: np.ndarray, weight: np.ndarray, color: np.ndarray) -> None:
        for i, k in enumerate(keys):
            self._store[int(k)] = (sdf[i], weight[i], color[i])

    def take_near(self, keys_near: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Pop all stored blocks whose key is in keys_near."""
        hit = [int(k) for k in keys_near if int(k) in self._store]
        if not hit:
            z = np.zeros((0,), np.int32)
            return z, np.zeros((0, BLOCK, BLOCK, BLOCK), np.float32), np.zeros(
                (0, BLOCK, BLOCK, BLOCK), np.float32
            ), np.zeros((0, BLOCK, BLOCK, BLOCK, 3), np.float32)
        sdf = np.stack([self._store[k][0] for k in hit])
        wgt = np.stack([self._store[k][1] for k in hit])
        col = np.stack([self._store[k][2] for k in hit])
        for k in hit:
            del self._store[k]
        return np.asarray(hit, np.int32), sdf, wgt, col


def _block_distance_to(key_of_slot: jax.Array, center: jax.Array, voxel_size: float) -> jax.Array:
    coords = unpack_key(key_of_slot)
    ctr = block_origin(coords, voxel_size) + 0.5 * BLOCK * voxel_size
    d = jnp.linalg.norm(ctr - center, axis=-1)
    return jnp.where(key_of_slot != INVALID_KEY, d, 0.0)


def stream_out(
    table: BlockTable,
    store: HostBlockStore,
    camera_pos: np.ndarray,  # [3] world position
    cfg: AppConfig,
    max_out: int = 1024,
) -> tuple[BlockTable, int]:
    """Move up to `max_out` blocks outside the streaming radius to the host.

    Returns (table with those slots freed+compacted, number streamed out).
    """
    d = _block_distance_to(table.key_of_slot, jnp.asarray(camera_pos, jnp.float32), cfg.voxel_size)
    occupied = jnp.any(table.weight[: table.capacity] > 0, axis=(1, 2, 3))
    far = (d > cfg.streaming_radius) & occupied & (table.key_of_slot != INVALID_KEY)
    score = jnp.where(far, d, -jnp.inf)
    top, idx = jax.lax.top_k(score, max_out)
    mask = np.asarray(jnp.isfinite(top))
    if not mask.any():
        return table, 0
    idx_np = np.asarray(idx)[mask]  # data slots to evict
    store.put(
        np.asarray(table.key_of_slot)[idx_np],
        np.asarray(table.sdf)[idx_np],
        np.asarray(table.weight)[idx_np],
        np.asarray(table.color)[idx_np],
    )
    dead = jnp.zeros(table.capacity, bool).at[jnp.asarray(idx_np)].set(True)
    table = free_slots_by_mask(table, dead)
    return table, int(mask.sum())


def stream_in(
    table: BlockTable,
    store: HostBlockStore,
    camera_pos: np.ndarray,
    cfg: AppConfig,
) -> tuple[BlockTable, int]:
    """Bring stored blocks within the streaming radius back onto the device."""
    if len(store) == 0:
        return table, 0
    all_keys = np.fromiter(store._store.keys(), dtype=np.int32)
    coords = np.asarray(unpack_key(jnp.asarray(all_keys)))
    ctr = coords.astype(np.float32) * (BLOCK * cfg.voxel_size) + 0.5 * BLOCK * cfg.voxel_size
    near = np.linalg.norm(ctr - camera_pos[None], axis=-1) <= cfg.streaming_radius
    keys_near = all_keys[near]
    keys, sdf, wgt, col = store.take_near(keys_near)
    if len(keys) == 0:
        return table, 0
    table, overflow = allocate(table, jnp.asarray(keys))
    slots, found = lookup(table, jnp.asarray(keys))
    ok = np.asarray(found)
    s = jnp.asarray(slots)[jnp.asarray(ok)]
    table = table._replace(
        sdf=table.sdf.at[s].set(jnp.asarray(sdf[ok])),
        weight=table.weight.at[s].set(jnp.asarray(wgt[ok])),
        color=table.color.at[s].set(jnp.asarray(col[ok])),
    )
    return table, int(ok.sum())
