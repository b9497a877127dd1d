"""Dense-block TSDF volume: the TPU replacement for voxel hashing.

Rebuild of the reference's GPU hash table of 8^3 SDF blocks
(``DepthSensing/CUDASceneRepHashSDF.h/.cu``, ``VoxelUtilHashSDF.h`` — SURVEY.md
§2.1 "TSDF voxel-hash scene rep"). Voxel hashing exists to make sparse volumes
GPU-friendly via pointer chasing; the TPU-idiomatic equivalent (north star) is
a fixed-capacity block pool with a *sorted key index* indirected from the data:

  * ``keys``  [C] int32 — packed block coordinates, ascending; empty entries
    hold INVALID_KEY and sort to the end. Lookup = vectorized binary search
    (`searchsorted` + gather), O(log C) with static shapes.
  * ``slot_of`` [C] int32 — the data slot behind each sorted index entry (a
    permutation of [0, C)); ``key_of_slot`` [C] is the reverse map.
  * ``sdf/weight`` [C, 512] and ``color`` [C, 1536] — plain dense arrays
    addressed by data slot, stored in the Pallas kernels' PLANAR layout
    (flat voxel index v = z*64 + y*8 + x; color channel-major, element
    ch*512 + v). Keeping the canonical layout planar makes the kernel views
    pure bitcast reshapes — the earlier [C,8,8,8,3] canonical form forced a
    whole-pool transpose per fuse call whose XLA copy materialized with a
    16x-padded tiled layout (25.8 GB at 512^3-equivalent capacity: an OOM,
    not just waste). Color is FLAT [C, 3*512], not [C, 3, 512]: a size-3
    sublane dim tiles to 8 on TPU (2.67x padded HBM + bandwidth on every
    color gather/scatter); the flat minor dim tiles without padding.
    **Block data never moves**: allocation/GC re-sort only the tiny
    [C] index pair, assigning data slots from the free tail — the voxel pool
    (hundreds of MB) is untouched, unlike a sort-the-pool design that would
    shuffle it every frame.
  * Allocation = dedup'd key merge — a deterministic sorted-set union instead
    of atomic hash insertion.

Block coords span +-512 blocks per axis (3x10-bit packing) — +-16.4 m at the
default 4 mm voxels / 3.2 cm blocks; larger scenes go through the streaming
layer (``fusion/streaming.py``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

BLOCK = 8  # voxels per block axis (kernels are specialized to 8^3)
NVOX = BLOCK**3  # voxels per block, flat order v = z*64 + y*8 + x
_OFF = 512  # coordinate offset for packing
# NOT a jnp scalar: a device-resident constant here means any host use —
# int(INVALID_KEY) in the pipeline constructor, np comparisons in tests —
# performs a device->host READBACK, and the FIRST readback of a process
# permanently drops this machine's TPU tunnel out of its fast upload mode
# (measured: 1.4 GB/s -> 46 MB/s, ~300 ms of the ~370 ms bench chunk step).
INVALID_KEY = np.int32(1 << 30)  # sorts after every valid key


class BlockTable(NamedTuple):
    """Fixed-capacity block pool with a sorted key index.

    The voxel data arrays carry **one extra scratch row** at index
    ``capacity``: kernels route masked/not-found update rows there instead of
    aliasing data slot 0, so a masked row can never collide with a real update
    in the same (unordered/pipelined) scatter. The scratch row's content is
    garbage by design and is never read by lookup-driven consumers (``lookup``
    only returns slots < capacity).
    """

    keys: jax.Array  # [C] int32 sorted packed coords; INVALID_KEY = empty entry
    slot_of: jax.Array  # [C] int32 data slot per sorted index entry (permutation)
    key_of_slot: jax.Array  # [C] int32 packed coord per data slot (INVALID = free)
    sdf: jax.Array  # [C+1, 512] float32 truncated signed distance (meters)
    weight: jax.Array  # [C+1, 512] float32 integration weight (0 = unobserved)
    color: jax.Array  # [C+1, 3*512] float32 weight-scaled color accumulator
    # (channel-major: element ch*512 + v; flat to avoid sublane tile padding)

    @property
    def capacity(self) -> int:
        return self.keys.shape[0]

    def num_active(self) -> jax.Array:
        return jnp.sum(self.keys != INVALID_KEY)


def make_table(capacity: int) -> BlockTable:
    return BlockTable(
        keys=jnp.full((capacity,), INVALID_KEY, dtype=jnp.int32),
        slot_of=jnp.arange(capacity, dtype=jnp.int32),
        key_of_slot=jnp.full((capacity,), INVALID_KEY, dtype=jnp.int32),
        sdf=jnp.zeros((capacity + 1, NVOX), jnp.float32),
        weight=jnp.zeros((capacity + 1, NVOX), jnp.float32),
        color=jnp.zeros((capacity + 1, 3 * NVOX), jnp.float32),
    )


def pack_key(block_coord: jax.Array) -> jax.Array:
    """[..., 3] int32 block coords -> packed int32 key; out-of-range -> INVALID."""
    c = block_coord + _OFF
    in_range = jnp.all((c >= 0) & (c < 1024), axis=-1)
    key = c[..., 0] | (c[..., 1] << 10) | (c[..., 2] << 20)
    return jnp.where(in_range, key, INVALID_KEY)


def unpack_key(key: jax.Array) -> jax.Array:
    """packed int32 -> [..., 3] int32 block coords (INVALID gives garbage)."""
    x = (key & 1023) - _OFF
    y = ((key >> 10) & 1023) - _OFF
    z = ((key >> 20) & 1023) - _OFF
    return jnp.stack([x, y, z], axis=-1)


def lower_bound(sorted_keys: jax.Array, query: jax.Array) -> jax.Array:
    """#(sorted_keys < q) per query — ``jnp.searchsorted(..., side='left')``
    rebuilt for TPU.

    XLA lowers searchsorted to ~log2(N) SEQUENTIAL dependent-gather rounds
    (measured 25-33 ms for the block-table sizes — the dominant cost of both
    lookup and allocation). This two-level form is branchless VPU work: a
    dense compare against a [NB] coarse row (first key of every bucket)
    finds each query's boundary bucket, ONE contiguous-row gather pulls that
    bucket's keys, and a dense compare counts within it. ~20-50x faster at
    equal results (exact lower bound, duplicates and INVALID padding
    included).
    """
    n = sorted_keys.shape[0]
    q_shape = query.shape
    q = query.reshape(-1)
    # bucket ~ sqrt(n), 128-lane aligned
    b = 128
    while b * b < n:
        b *= 2
    nb = -(-n // b)
    pad_val = jnp.iinfo(sorted_keys.dtype).max
    padded = jnp.concatenate(
        [sorted_keys, jnp.full((nb * b - n,), pad_val, sorted_keys.dtype)]
    )
    coarse = padded[:: b]  # [nb] first key of each bucket
    # last bucket whose first key < q holds the lower-bound boundary: every
    # earlier bucket's keys are <= that bucket's first key, hence < q
    jstar = jnp.clip(
        jnp.sum(coarse[None, :] < q[:, None], axis=1) - 1, 0, nb - 1
    ).astype(jnp.int32)
    seg = padded.reshape(nb, b)[jstar]  # [Q, b] contiguous-row gather
    within = jnp.sum(seg < q[:, None], axis=1).astype(jnp.int32)
    pos = jstar * b + within
    # queries beyond the last real key: count only real entries
    return jnp.minimum(pos, n).reshape(q_shape)


def lookup(table: BlockTable, query: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Find DATA slots of packed keys. Returns (slot [...], found [...]).

    Not-found queries return slot 0 with found=False — callers mask.
    """
    idx = lower_bound(table.keys, query)
    idx = jnp.clip(idx, 0, table.capacity - 1)
    found = (table.keys[idx] == query) & (query != INVALID_KEY)
    slot = table.slot_of[idx]
    return jnp.where(found, slot, 0).astype(jnp.int32), found


def world_to_block(p: jax.Array, voxel_size: float) -> jax.Array:
    """World points [..., 3] -> integer block coords [..., 3]."""
    return jnp.floor(p / (BLOCK * voxel_size)).astype(jnp.int32)


def block_origin(block_coord: jax.Array, voxel_size: float) -> jax.Array:
    """Block coord [..., 3] -> world position of its (0,0,0) voxel corner."""
    return block_coord.astype(jnp.float32) * (BLOCK * voxel_size)


def voxel_centers(block_coord: jax.Array, voxel_size: float) -> jax.Array:
    """[3] block coord -> [8, 8, 8, 3] world centers of its voxels."""
    g = jnp.arange(BLOCK, dtype=jnp.float32) + 0.5
    zz, yy, xx = jnp.meshgrid(g, g, g, indexing="ij")
    local = jnp.stack([xx, yy, zz], axis=-1) * voxel_size  # [8,8,8,3] (x fastest)
    return block_origin(block_coord, voxel_size)[None, None, None, :] + local


def dedup_keys(keys: jax.Array, out_capacity: int) -> jax.Array:
    """Sort + mask-duplicates + compact to fixed capacity.

    The deterministic replacement for the reference's atomic hash-insert
    dedup: [A] possibly-duplicated packed keys -> [out_capacity] unique sorted
    keys (padded with INVALID_KEY).
    """
    return dedup_keys_counted(keys, out_capacity)[0]


def compact_sorted(
    vals: jax.Array, keep: jax.Array, out_capacity: int
) -> jax.Array:
    """Stable-compact `vals[keep]` (already in final order) to
    [out_capacity], INVALID_KEY-padded — a cumsum+scatter instead of a second
    full sort (the old compaction re-sorted the whole array just to push
    INVALIDs to the tail)."""
    pos = jnp.cumsum(keep) - 1  # destination of each kept element
    pos = jnp.where(keep & (pos < out_capacity), pos, out_capacity)
    out = jnp.full((out_capacity + 1,), INVALID_KEY, vals.dtype)
    return out.at[pos].set(vals, mode="drop")[:out_capacity]


def dedup_keys_counted(
    keys: jax.Array, out_capacity: int
) -> tuple[jax.Array, jax.Array]:
    """`dedup_keys` that also reports how many unique keys were DROPPED by the
    capacity cut (int32) — silent truncation of a frame's update set would
    otherwise read as a clean integrate (SURVEY.md §7 hard part 1 asks for
    overflow counters on every capacity edge)."""
    s = jnp.sort(keys)
    first = jnp.concatenate([jnp.array([True]), s[1:] != s[:-1]])
    valid_first = first & (s != INVALID_KEY)
    n_uniq = jnp.sum(valid_first).astype(jnp.int32)
    truncated = jnp.maximum(n_uniq - out_capacity, 0)
    return compact_sorted(s, valid_first, out_capacity), truncated


def allocate(
    table: BlockTable, new_keys: jax.Array, assume_unique_sorted: bool = False
) -> tuple[BlockTable, jax.Array]:
    """Insert blocks for `new_keys` (packed, possibly duplicated/INVALID).

    Returns (table, overflow count). Existing blocks keep their data slots;
    brand-new blocks take slots from the free tail and have their voxel data
    zeroed. Only the [C]-sized index pair is re-sorted — the voxel pool never
    moves.

    ``assume_unique_sorted=True`` skips the internal dedup sort — for callers
    whose key list already IS a sorted unique set with an INVALID tail (the
    per-chunk fuse path feeds ``_union_counted`` output straight in here;
    re-sorting it cost ~9 ms/chunk at flagship capacity).
    """
    cap = table.capacity
    if assume_unique_sorted:
        cand = new_keys
    else:
        cand = dedup_keys(new_keys, new_keys.shape[0])  # [A] unique sorted
    _, found = lookup(table, cand)
    cand = jnp.where(found, INVALID_KEY, cand)  # only truly-new keys

    num_active = table.num_active()
    num_free = cap - num_active
    is_new = cand != INVALID_KEY
    rank = jnp.cumsum(is_new) - 1  # [A] rank among new keys
    can_host = is_new & (rank < num_free)
    overflow = jnp.sum(is_new & ~can_host).astype(jnp.int32)
    cand = jnp.where(can_host, cand, INVALID_KEY)

    # take free data slots from the END of the free tail of the sorted index
    # (the kept INVALID entries come from its head — invariant preserved)
    free_idx = jnp.clip(cap - 1 - rank, 0, cap - 1)
    assigned = jnp.where(can_host, table.slot_of[free_idx], 0).astype(jnp.int32)

    # zero the newly assigned blocks (slots may hold stale GC'd data);
    # masked rows use an out-of-range sentinel (scatter drops them)
    sentinel = cap
    zslots = jnp.where(can_host, assigned, sentinel)
    sdf = table.sdf.at[zslots].set(0.0)
    weight = table.weight.at[zslots].set(0.0)
    color = table.color.at[zslots].set(0.0)
    key_of_slot = table.key_of_slot.at[zslots].set(cand)

    # merge the sorted index WITHOUT a full argsort (which cost ~30 ms at
    # 262k capacity): both lists are sorted, so each element's output
    # position is its own rank plus the count of smaller elements in the
    # other list (one searchsorted each), then two scatters. Entries pushed
    # past `cap` (the free-tail slots consumed by new keys, and INVALID
    # padding) drop out of the scatter.
    nb = jnp.sum(can_host).astype(jnp.int32)
    pos_c = jnp.where(can_host, rank, cand.shape[0])
    cand_c = (
        jnp.full((cand.shape[0] + 1,), INVALID_KEY, jnp.int32)
        .at[pos_c].set(cand, mode="drop")[:-1]
    )  # compacted sorted new keys (INVALID tail)
    slot_c = (
        jnp.zeros((cand.shape[0] + 1,), jnp.int32)
        .at[pos_c].set(assigned, mode="drop")[:-1]
    )
    pos_a = jnp.arange(cap, dtype=jnp.int32) + lower_bound(cand_c, table.keys)
    pos_b = jnp.arange(cand_c.shape[0], dtype=jnp.int32) + lower_bound(
        table.keys, cand_c
    )
    pos_b = jnp.where(cand_c != INVALID_KEY, pos_b, cap)  # INVALIDs: na+j < cap
    del nb
    new_keys_sorted = (
        jnp.full((cap,), INVALID_KEY, jnp.int32)
        .at[pos_a].set(table.keys, mode="drop")
        .at[pos_b].set(cand_c, mode="drop")
    )
    new_slot_of = (
        jnp.zeros((cap,), jnp.int32)
        .at[pos_a].set(table.slot_of, mode="drop")
        .at[pos_b].set(slot_c, mode="drop")
    )

    return (
        BlockTable(
            keys=new_keys_sorted,
            slot_of=new_slot_of,
            key_of_slot=key_of_slot,
            sdf=sdf,
            weight=weight,
            color=color,
        ),
        overflow,
    )


def garbage_collect(table: BlockTable) -> tuple[BlockTable, jax.Array]:
    """Drop blocks whose every voxel weight is zero (reference GC pass).

    After de-integration, blocks can return to the unobserved state; freeing
    them keeps capacity for new geometry. Only the index re-sorts; freed
    slots' data is zeroed lazily on reuse. Returns (table, num_freed).
    """
    occupied_slot = jnp.any(
        table.weight[: table.capacity] > 0.0, axis=1
    )  # per data slot (exclude the scratch row)
    live_slot = occupied_slot & (table.key_of_slot != INVALID_KEY)
    freed = jnp.sum((table.key_of_slot != INVALID_KEY) & ~occupied_slot)
    key_of_slot = jnp.where(live_slot, table.key_of_slot, INVALID_KEY)
    # rewrite the sorted index from the reverse map (cheap [C] sort)
    order = jnp.argsort(key_of_slot, stable=True)
    return (
        table._replace(
            keys=key_of_slot[order],
            slot_of=order.astype(jnp.int32),
            key_of_slot=key_of_slot,
        ),
        freed.astype(jnp.int32),
    )


def free_slots_by_mask(table: BlockTable, dead_slot_mask: jax.Array) -> BlockTable:
    """Free an explicit set of data slots (used by the streaming layer)."""
    key_of_slot = jnp.where(dead_slot_mask, INVALID_KEY, table.key_of_slot)
    order = jnp.argsort(key_of_slot, stable=True)
    # zero weights so occupancy scans can't see stale data (scratch row spared)
    dead_p = jnp.concatenate([dead_slot_mask, jnp.zeros((1,), bool)])
    weight = jnp.where(dead_p[:, None], 0.0, table.weight)
    return table._replace(
        keys=key_of_slot[order],
        slot_of=order.astype(jnp.int32),
        key_of_slot=key_of_slot,
        weight=weight,
    )


def sample_trilinear(
    table: BlockTable, p: jax.Array, voxel_size: float
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Trilinear TSDF/color sample at world points [..., 3].

    Returns (sdf [...], color [..., 3], valid [...]). Handles block-boundary
    corners with 8 independent key lookups (the sorted-index analog of the
    reference's per-corner hash reads in ``RayCastSDFUtil.h``).
    """
    q = p / voxel_size - 0.5  # voxel-center grid coords
    q0 = jnp.floor(q)
    f = q - q0
    q0i = q0.astype(jnp.int32)

    sdf_acc = jnp.zeros(p.shape[:-1], p.dtype)
    col_acc = jnp.zeros(p.shape[:-1] + (3,), p.dtype)
    wsum = jnp.zeros(p.shape[:-1], p.dtype)
    all_ok = jnp.ones(p.shape[:-1], bool)
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                vox = q0i + jnp.array([dx, dy, dz], jnp.int32)
                bc = jnp.floor_divide(vox, BLOCK)
                local = vox - bc * BLOCK
                key = pack_key(bc)
                slot, found = lookup(table, key)
                v = local[..., 2] * 64 + local[..., 1] * 8 + local[..., 0]
                s = table.sdf[slot, v]
                w = table.weight[slot, v]
                c = jnp.stack(
                    [table.color[slot, ch * NVOX + v] for ch in range(3)], axis=-1
                )
                ok = found & (w > 0.0)
                tw = (
                    jnp.where(dx == 1, f[..., 0], 1 - f[..., 0])
                    * jnp.where(dy == 1, f[..., 1], 1 - f[..., 1])
                    * jnp.where(dz == 1, f[..., 2], 1 - f[..., 2])
                )
                sdf_acc = sdf_acc + jnp.where(ok, tw * s, 0.0)
                col_acc = col_acc + jnp.where(ok[..., None], tw[..., None] * c / jnp.maximum(w, 1e-9)[..., None], 0.0)
                wsum = wsum + jnp.where(ok, tw, 0.0)
                all_ok = all_ok & ok
    valid = all_ok & (wsum > 1e-6)
    sdf = jnp.where(valid, sdf_acc / jnp.maximum(wsum, 1e-9), jnp.inf)
    return sdf, col_acc / jnp.maximum(wsum, 1e-9)[..., None], valid
