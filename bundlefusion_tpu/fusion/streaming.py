"""Out-of-core block streaming: device <-> host.

Rebuild of ``DepthSensing/CUDASceneRepChunkGrid`` (SURVEY.md §2.1 "Out-of-core
streaming"): the world is partitioned into coarse chunks; blocks outside an
active radius around the camera are streamed off the GPU (here: to host
memory) and streamed back when the camera returns. The reference interleaves
pass0-collect / pass1-copy with integration; here each stream step is one
device compaction + one vectorized host-array update between jitted pipeline
steps.

Host storage is array-batched (single contiguous numpy arrays + a free-row
list), with a coarse **chunk grid** index over the rows so stream-in only
inspects the chunks that intersect the camera's radius — O(changed), not
O(host blocks). No per-block Python loops anywhere on the hot path.

Data-safety invariants:
  * stream-in never discards: the batch is sized by the device pool's free
    capacity, and any row the allocator still rejects is re-inserted.
  * a streamed-in block whose key meanwhile re-appeared on the device (the
    camera returned and integration re-allocated it) is **merged** — the
    weighted-mean TSDF makes the union of two disjoint accumulations exact:
    sdf = (w_d*s_d + w_h*s_h)/(w_d+w_h), weights and color accumulators add.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AppConfig
from .blocks import (
    BLOCK,
    INVALID_KEY,
    NVOX,
    BlockTable,
    allocate,
    block_origin,
    free_slots_by_mask,
    lookup,
    unpack_key,
)

_GROW = 4096  # host array growth quantum (rows)


def _unpack_np(key: np.ndarray) -> np.ndarray:
    x = (key & 1023) - 512
    y = ((key >> 10) & 1023) - 512
    z = ((key >> 20) & 1023) - 512
    return np.stack([x, y, z], axis=-1)


class HostBlockStore:
    """Cold block storage: contiguous arrays + chunk-grid index.

    ``chunk_blocks`` is the coarse chunk edge in blocks (the reference's
    ChunkGrid cell); all index structures are per-chunk, so membership and
    radius queries never scan individual blocks.
    """

    def __init__(self, chunk_blocks: int = 16) -> None:
        self.chunk_blocks = chunk_blocks
        self._cap = 0
        self._n_live = 0
        self._keys = np.zeros((0,), np.int32)
        self._sdf = np.zeros((0, NVOX), np.float32)
        self._wgt = np.zeros((0, NVOX), np.float32)
        self._col = np.zeros((0, 3 * NVOX), np.float32)
        self._free: list[int] = []
        self._chunks: dict[int, list[int]] = {}  # chunk key -> live row list

    def __len__(self) -> int:
        return self._n_live

    # ------------------------------------------------------------------

    def _chunk_keys_of(self, block_keys: np.ndarray) -> np.ndarray:
        c = np.floor_divide(_unpack_np(block_keys), self.chunk_blocks) + 512
        return c[..., 0] | (c[..., 1] << 10) | (c[..., 2] << 20)

    def _grow_to(self, need: int) -> None:
        if need <= self._cap:
            return
        new_cap = max(need, self._cap + _GROW)
        add = new_cap - self._cap

        def ext(a, shape):
            return np.concatenate([a, np.zeros((add,) + shape, a.dtype)])

        self._keys = ext(self._keys, ())
        self._sdf = ext(self._sdf, (NVOX,))
        self._wgt = ext(self._wgt, (NVOX,))
        self._col = ext(self._col, (3 * NVOX,))
        self._free.extend(range(self._cap, new_cap))
        self._cap = new_cap

    def put(
        self,
        keys: np.ndarray,
        sdf: np.ndarray,
        weight: np.ndarray,
        color: np.ndarray,
    ) -> None:
        """Insert a batch of blocks. O(batch) host work, no per-block loops
        over the store."""
        n = len(keys)
        if n == 0:
            return
        self._grow_to(self._n_live + n)
        rows = np.asarray(self._free[-n:], np.int64)
        del self._free[-n:]
        self._keys[rows] = keys
        self._sdf[rows] = sdf
        self._wgt[rows] = weight
        self._col[rows] = color
        self._n_live += n
        ck = self._chunk_keys_of(np.asarray(keys))
        order = np.argsort(ck, kind="stable")
        uniq, starts = np.unique(ck[order], return_index=True)
        bounds = np.append(starts, n)
        for i, c in enumerate(uniq):
            self._chunks.setdefault(int(c), []).extend(
                rows[order[bounds[i] : bounds[i + 1]]].tolist()
            )

    def chunks_near(self, center: np.ndarray, radius: float, voxel_size: float) -> list[int]:
        """Chunk keys whose center lies within `radius` of `center`.
        O(#chunks) — the coarse-grid query the reference's ChunkGrid does."""
        if not self._chunks:
            return []
        ck = np.fromiter(self._chunks.keys(), np.int64, len(self._chunks))
        cc = _unpack_np(ck)
        edge = self.chunk_blocks * BLOCK * voxel_size
        ctr = cc.astype(np.float32) * edge + 0.5 * edge
        near = np.linalg.norm(ctr - center[None], axis=-1) <= radius
        return [int(k) for k in ck[near]]

    def take_chunks(
        self, chunk_keys: list[int], limit: int
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Pop up to `limit` blocks from the given chunks (whole chunks first,
        then a partial chunk if the limit cuts one). Returns copies."""
        rows: list[int] = []
        for c in chunk_keys:
            lst = self._chunks.get(c)
            if lst is None:
                continue
            room = limit - len(rows)
            if room <= 0:
                break
            if len(lst) <= room:
                rows.extend(lst)
                del self._chunks[c]
            else:
                rows.extend(lst[-room:])
                del lst[-room:]
        if not rows:
            z = np.zeros((0,), np.int32)
            return (
                z,
                np.zeros((0, NVOX), np.float32),
                np.zeros((0, NVOX), np.float32),
                np.zeros((0, 3 * NVOX), np.float32),
            )
        r = np.asarray(rows, np.int64)
        out = (
            self._keys[r].copy(),
            self._sdf[r].copy(),
            self._wgt[r].copy(),
            self._col[r].copy(),
        )
        self._free.extend(rows)
        self._n_live -= len(rows)
        return out

    def snapshot_batches(self, batch_rows: int):
        """Yield (keys, sdf, weight, color) over ALL stored blocks without
        removing them — used by streaming-aware mesh extraction (the
        reference's MC variant that loops CPU-resident chunks)."""
        rows: list[int] = []
        for lst in self._chunks.values():
            rows.extend(lst)
        for i in range(0, len(rows), batch_rows):
            r = np.asarray(rows[i : i + batch_rows], np.int64)
            yield self._keys[r], self._sdf[r], self._wgt[r], self._col[r]


# ----------------------------------------------------------------------
# device-side stream passes
# ----------------------------------------------------------------------


def _far_mask(table: BlockTable, center: jax.Array, radius: float, voxel_size: float):
    coords = unpack_key(table.key_of_slot)
    ctr = block_origin(coords, voxel_size) + 0.5 * BLOCK * voxel_size
    d = jnp.linalg.norm(ctr - center, axis=-1)
    occupied = jnp.any(table.weight[: table.capacity] > 0, axis=1)
    live = table.key_of_slot != INVALID_KEY
    return (d > radius) & occupied & live, jnp.where(live, d, 0.0)


import functools


@functools.partial(jax.jit, static_argnames=("max_out",))
def _collect_far(table: BlockTable, center: jax.Array, radius: jax.Array, voxel_size: jax.Array, max_out: int = 1024):
    far, d = _far_mask(table, center, radius, voxel_size)
    score = jnp.where(far, d, -jnp.inf)
    top, idx = jax.lax.top_k(score, max_out)
    return idx, jnp.isfinite(top)


def stream_out(
    table: BlockTable,
    store: HostBlockStore,
    camera_pos: np.ndarray,  # [3] world position
    cfg: AppConfig,
    max_out: int = 1024,
) -> tuple[BlockTable, int]:
    """Move up to `max_out` farthest blocks outside the streaming radius to
    the host (pass0 collect on device, pass1 one batched copy)."""
    idx, ok = _collect_far(
        table,
        jnp.asarray(camera_pos, jnp.float32),
        jnp.float32(cfg.streaming_radius),
        jnp.float32(cfg.voxel_size),
        max_out=max_out,
    )
    mask = np.asarray(ok)
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
    max_in: int = 1024,
    free_capacity: int | None = None,
) -> tuple[BlockTable, int]:
    """Bring stored blocks within the streaming radius back onto the device.

    The batch is capped by the device pool's free capacity *before* rows are
    popped; rows the allocator still rejects (shouldn't happen, but pool
    fragmentation is cheap to guard) are re-inserted — stream-in never loses
    scene data. Blocks that re-appeared on the device while cold are merged
    exactly (weighted-mean TSDF is associative over disjoint accumulations).
    """
    if len(store) == 0:
        return table, 0
    chunks = store.chunks_near(
        np.asarray(camera_pos, np.float32), cfg.streaming_radius, cfg.voxel_size
    )
    if not chunks:
        return table, 0
    if free_capacity is None:
        free_capacity = int(table.capacity - table.num_active())
    take = min(max_in, free_capacity)
    if take <= 0:
        return table, 0
    keys, sdf, wgt, col = store.take_chunks(chunks, take)
    if len(keys) == 0:
        return table, 0
    table, _ = allocate(table, jnp.asarray(keys))
    slots, found = lookup(table, jnp.asarray(keys))
    ok = np.asarray(found)
    if not ok.all():
        bad = ~ok
        store.put(keys[bad], sdf[bad], wgt[bad], col[bad])
        keys, sdf, wgt, col = keys[ok], sdf[ok], wgt[ok], col[ok]
        slots = jnp.asarray(np.asarray(slots)[ok])
    if len(keys) == 0:
        return table, 0
    # merge host contribution into whatever the device row holds (zero for
    # fresh allocations, live data if integration re-created the block)
    s = slots
    w_d = table.weight[s]
    s_d = table.sdf[s]
    w_h = jnp.asarray(wgt)
    s_h = jnp.asarray(sdf)
    w_sum = w_d + w_h
    sdf_m = jnp.where(w_sum > 0, (w_d * s_d + w_h * s_h) / jnp.maximum(w_sum, 1e-9), 0.0)
    table = table._replace(
        sdf=table.sdf.at[s].set(sdf_m),
        weight=table.weight.at[s].set(w_sum),
        color=table.color.at[s].add(jnp.asarray(col)),
    )
    return table, int(len(keys))
