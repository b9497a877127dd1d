"""TSDF integration / de-integration over the dense-block pool.

Rebuild of ``CUDASceneRepHashSDF.cu`` (SURVEY.md §2.1, §3.2 hot loop 1):
per-frame block allocation along the depth frustum, visible-set compaction,
weighted TSDF+color integration with depth-scaled truncation — and the
paper's key trick, exact **de-integration** (the weighted running mean is
reversible, so de-integrate == integrate with negated weight; SURVEY.md §3.4).

TPU structure: allocation = packed-key dedup + sorted merge (blocks.py);
integration gathers the visible block set (fixed cap, mask-and-compact), runs
one vmapped [B, 8, 8, 8] projective update, and scatters the results back —
no atomics anywhere, so integrate∘deintegrate is bit-exact.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import AppConfig
from ..geometry import se3
from ..geometry.camera import CameraModel, project, unproject
from .blocks import (
    BLOCK,
    INVALID_KEY,
    BlockTable,
    block_origin,
    lookup,
    pack_key,
    voxel_centers,
    world_to_block,
)


def truncation_at(depth: jax.Array, cfg: AppConfig) -> jax.Array:
    """Depth-scaled truncation (``VoxelUtilHashSDF getTruncation``)."""
    return cfg.truncation + cfg.truncation_scale * depth


class FuseDiag(NamedTuple):
    """Integration diagnostics (SURVEY.md §7 hard part 1: overflow counters
    surfaced in metrics — nothing saturates silently).

    ``upd_mask`` records which rows of the frame's deterministic update-key
    list actually updated the table; a later de-integration must AND it in so
    it subtracts exactly what was added even if the table has since grown
    (allocation overflow at integrate time would otherwise break exactness).
    """

    overflow: jax.Array  # int32 — block allocations dropped (pool full / union cap)
    upd_truncated: jax.Array  # int32 — unique update blocks dropped by the
    # per-frame blocks_per_frame_cap cut (those voxels never integrate; the
    # recorded upd_mask keeps de-integration exact regardless)
    patch_overflow: jax.Array  # int32 — update blocks whose projected extent
    # exceeded the sampling patch window (their out-of-window voxels were
    # skipped; happens for blocks very close to the camera)
    upd_mask: jax.Array  # [cap] (or [B, cap]) bool — rows actually updated


def frame_alloc_keys(
    depth: jax.Array,  # [H, W]
    pose_c2w: jax.Array,  # [4, 4]
    cam: CameraModel,
    cfg: AppConfig,
    samples_per_ray: int = 3,
) -> jax.Array:
    """Packed block keys needing allocation for this frame (duplicated, fixed
    size); feed to :func:`blocks.allocate` (after dedup).

    The reference allocates every block intersecting the truncation band along
    each depth ray; we sample the band at `samples_per_ray` points per pixel.
    Pixels are subsampled by ``cfg.alloc_stride`` — a block's ~3 cm footprint
    spans many pixels at sensor resolutions, so a stride loses nothing while
    cutting the dedup-sort cost quadratically.
    """
    stride = max(int(cfg.alloc_stride), 1)
    d = depth[::stride, ::stride]
    pts_cam = unproject(cam, depth)[::stride, ::stride]  # [h, w, 3]
    valid = (d > 0) & (d < cfg.max_integration_distance)
    trunc = truncation_at(d, cfg)
    # unit ray direction in camera space
    ray = pts_cam / jnp.maximum(d[..., None], 1e-6)
    offs = jnp.linspace(-1.0, 1.0, samples_per_ray, dtype=jnp.float32)
    keys = []
    for o in offs:
        p = pts_cam + ray * (trunc * o)[..., None]
        pw = se3.transform_points(pose_c2w, p.reshape(-1, 3))
        bc = world_to_block(pw, cfg.voxel_size)
        k = pack_key(bc)
        keys.append(jnp.where(valid.reshape(-1), k, INVALID_KEY))
    return jnp.concatenate(keys)


def visible_blocks(
    table: BlockTable,
    pose_c2w: jax.Array,
    cam: CameraModel,
    cfg: AppConfig,
) -> tuple[jax.Array, jax.Array]:
    """Compact the visible-block set (``compactifyVisibleBlocks`` analog).

    Returns (slots [cap], mask [cap]) where cap = cfg.blocks_per_frame_cap;
    selection = block center inside the (slightly inflated) frustum.
    """
    from .blocks import unpack_key

    coords = unpack_key(table.key_of_slot)
    ctr = (coords.astype(jnp.float32) + 0.5) * (BLOCK * cfg.voxel_size)
    w2c = se3.mat_inverse(pose_c2w)
    p_cam = se3.transform_points(w2c, ctr)
    uv, ok = project(cam, p_cam)
    # inflate: accept blocks whose center projects within a margin outside too
    margin = BLOCK * cfg.voxel_size * cam.fx / jnp.maximum(p_cam[..., 2], 1e-3)
    u, v = uv[..., 0], uv[..., 1]
    near = (
        (p_cam[..., 2] > 0.05)
        & (p_cam[..., 2] < cfg.max_integration_distance + 1.0)
        & (u > -margin)
        & (u < cam.width + margin)
        & (v > -margin)
        & (v < cam.height + margin)
        & (table.key_of_slot != INVALID_KEY)
    )
    score = jnp.where(near, -p_cam[..., 2], -jnp.inf)  # prefer near blocks
    top, slots = jax.lax.top_k(score, cfg.blocks_per_frame_cap)
    return slots.astype(jnp.int32), jnp.isfinite(top)


def _integrate_blocks(
    slots: jax.Array,  # [B] table slots to update
    mask: jax.Array,  # [B] active
    table: BlockTable,
    depth: jax.Array,  # [H, W]
    color: jax.Array,  # [H, W, 3]
    pose_c2w: jax.Array,
    cam: CameraModel,
    cfg: AppConfig,
    weight_sign: float,
) -> BlockTable:
    """Shared integrate/de-integrate body; weight_sign = +1 integrates,
    -1 exactly reverses a prior integration with the same pose/frame."""
    from .blocks import unpack_key

    w2c = se3.mat_inverse(pose_c2w)
    coords = unpack_key(table.key_of_slot[slots])

    # depth+color packed as one [H, W, 4] stack; each block reads a PxP patch
    # (slice-gather) and samples its 512 voxels with one-hot matmuls inside
    # the patch — MXU work instead of millions of random image gathers.
    P = 128
    img = jnp.concatenate([depth[..., None], color], axis=-1)  # [H, W, 4]
    img = jnp.pad(img, ((0, P), (0, P), (0, 0)))  # slices never clamp

    def per_block(block_coord, active):
        ctrs = voxel_centers(block_coord, cfg.voxel_size)  # [8,8,8,3]
        p_cam = se3.transform_points(w2c, ctrs.reshape(-1, 3))  # [512, 3]
        uv, ok = project(cam, p_cam)
        ui = jnp.clip(jnp.round(uv[..., 0]).astype(jnp.int32), 0, cam.width - 1)
        vi = jnp.clip(jnp.round(uv[..., 1]).astype(jnp.int32), 0, cam.height - 1)
        u0 = jnp.clip(jnp.min(ui), 0, cam.width - 1)
        v0 = jnp.clip(jnp.min(vi), 0, cam.height - 1)
        patch = jax.lax.dynamic_slice(img, (v0, u0, 0), (P, P, 4))  # [P, P, 4]
        lu = ui - u0
        lv = vi - v0
        in_win = (lu >= 0) & (lu < P) & (lv >= 0) & (lv < P)
        luc = jnp.clip(lu, 0, P - 1)
        lvc = jnp.clip(lv, 0, P - 1)
        grid = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
        oh_v = (lvc[:, None] == grid).astype(jnp.float32)  # [512, P]
        oh_u = (luc[:, None] == grid).astype(jnp.float32)
        tmp = jnp.einsum("kp,pqc->kqc", oh_v, patch)  # [512, P, 4]
        samp = jnp.einsum("kqc,kq->kc", tmp, oh_u)  # [512, 4]
        d = samp[:, 0]
        c = samp[:, 1:4]
        z = p_cam[..., 2]
        trunc = truncation_at(d, cfg)
        sdf_val = d - z  # positive in front of surface
        upd_ok = (
            active
            & ok
            & in_win
            & (d > 0)
            & (d < cfg.max_integration_distance)
            & (sdf_val > -trunc)
        )
        sdf_clamped = jnp.clip(sdf_val, -trunc, trunc)
        dw = jnp.where(upd_ok, cfg.integration_weight_sample * weight_sign, 0.0)
        shape3 = (BLOCK, BLOCK, BLOCK)
        return (
            sdf_clamped.reshape(shape3),
            dw.reshape(shape3),
            c.reshape(shape3 + (3,)),
        )

    sdf_new, dw, c_new = jax.vmap(per_block)(coords, mask)

    # weighted running mean, written in the reversible accumulate form:
    #   S = sum w_i * sdf_i ; W = sum w_i ; value = S / W
    old_w = table.weight[slots]
    old_sdf = table.sdf[slots]
    old_col = table.color[slots]
    new_w = old_w + dw
    # color is stored as the weighted *accumulator* so de-integration is exact
    num = old_sdf * old_w + sdf_new * dw
    upd_sdf = jnp.where(new_w > 1e-6, num / jnp.maximum(new_w, 1e-6), 0.0)
    upd_col = old_col + c_new * dw[..., None]
    new_w = jnp.clip(new_w, 0.0, cfg.max_integration_weight)
    upd_w = jnp.where(new_w > 1e-6, new_w, 0.0)
    upd_sdf = jnp.where(upd_w > 0, upd_sdf, 0.0)
    upd_col = jnp.where(upd_w[..., None] > 0, upd_col, 0.0)

    return table._replace(
        sdf=table.sdf.at[slots].set(jnp.where(mask[:, None, None, None], upd_sdf, table.sdf[slots])),
        weight=table.weight.at[slots].set(jnp.where(mask[:, None, None, None], upd_w, table.weight[slots])),
        color=table.color.at[slots].set(jnp.where(mask[:, None, None, None, None], upd_col, table.color[slots])),
    )


def _use_pallas(cfg: AppConfig) -> bool:
    return cfg.use_pallas_tsdf and jax.default_backend() == "tpu"


def _patch_window(cfg: AppConfig) -> tuple[int, int]:
    """Guaranteed (u, v) sampling-window extent of the active kernel: a block
    whose projection spans more than this loses its out-of-window voxels."""
    if _use_pallas(cfg):
        from .pallas_tsdf import _PATCH_U, _PATCH_V

        # origin alignment (x128 cols / x8 rows) can waste up to 127/7 px,
        # plus the 2 px origin margin
        return _PATCH_U - 127 - 2, _PATCH_V - 7 - 2
    return 128, 128  # XLA path: origin at the min projected pixel


def patch_overflow_count(
    slots: jax.Array,  # [B]
    mask: jax.Array,  # [B]
    table: BlockTable,
    pose_c2w: jax.Array,
    cam: CameraModel,
    cfg: AppConfig,
) -> jax.Array:
    """Count update blocks whose projected corner AABB exceeds the kernel's
    sampling window (VERDICT: the silent near-camera drop, now counted)."""
    from .blocks import unpack_key

    pu, pv = _patch_window(cfg)
    w2c = se3.mat_inverse(pose_c2w)
    coords = unpack_key(table.key_of_slot[jnp.clip(slots, 0, table.capacity - 1)])
    ctr = (coords.astype(jnp.float32) + 0.5) * (BLOCK * cfg.voxel_size)
    offs = jnp.asarray(
        [[dx, dy, dz] for dx in (-0.5, 0.5) for dy in (-0.5, 0.5) for dz in (-0.5, 0.5)],
        jnp.float32,
    ) * (BLOCK * cfg.voxel_size)
    corners = ctr[:, None, :] + offs[None]
    pc = se3.transform_points(w2c, corners.reshape(-1, 3)).reshape(-1, 8, 3)
    z = jnp.maximum(pc[..., 2], 1e-3)
    u = jnp.clip(pc[..., 0] / z * cam.fx + cam.cx, 0, cam.width - 1)
    v = jnp.clip(pc[..., 1] / z * cam.fy + cam.cy, 0, cam.height - 1)
    span_u = jnp.max(u, axis=1) - jnp.min(u, axis=1)
    span_v = jnp.max(v, axis=1) - jnp.min(v, axis=1)
    return jnp.sum(mask & ((span_u >= pu) | (span_v >= pv))).astype(jnp.int32)


def _integrate_blocks_dispatch(
    slots, mask, table, depth, color, pose_c2w, cam, cfg, weight_sign
):
    """Choose the TPU Pallas kernel or the XLA fallback. The choice is static
    per trace (backend + config flag), so integrate and de-integrate always
    run the SAME kernel within a run — exact reversibility depends on it.

    Masked rows route to the pool's scratch row (slot == capacity) so their
    writes can never collide with a real update of data slot 0."""
    slots = jnp.where(mask, slots, table.capacity).astype(jnp.int32)
    if _use_pallas(cfg):
        from .pallas_tsdf import integrate_blocks_pallas

        return integrate_blocks_pallas(
            table, slots, mask, depth, color, pose_c2w, cam, cfg, weight_sign
        )
    return _integrate_blocks(
        slots, mask, table, depth, color, pose_c2w, cam, cfg, weight_sign
    )


def _frame_update_set(
    table: BlockTable,
    depth: jax.Array,
    pose_c2w: jax.Array,
    cam: CameraModel,
    cfg: AppConfig,
    upd_keys: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """The block set a frame updates: its own truncation-band blocks.

    Crucially this is a *pure function of (depth, pose)* — independent of the
    global table state — so integrate and a later deintegrate of the same
    frame touch exactly the same blocks even after the table has grown,
    keeping de-integration an exact inverse. (A frustum-visibility set, like
    the reference's compactified visible list, breaks that exactness once a
    per-frame cap truncates it.) Returns (slots [cap], mask [cap]).
    """
    if upd_keys is None:
        from .blocks import dedup_keys

        keys = frame_alloc_keys(depth, pose_c2w, cam, cfg)
        upd_keys = dedup_keys(keys, cfg.blocks_per_frame_cap)
    slots, found = lookup(table, upd_keys)
    return slots, found


@functools.partial(jax.jit, static_argnames=("cam", "cfg"))
def integrate(
    table: BlockTable,
    depth: jax.Array,
    color: jax.Array,
    pose_c2w: jax.Array,
    cam: CameraModel,
    cfg: AppConfig,
) -> tuple[BlockTable, FuseDiag]:
    """Allocate + integrate one frame. Returns (table, FuseDiag)."""
    from .blocks import allocate, dedup_keys_counted

    keys = frame_alloc_keys(depth, pose_c2w, cam, cfg)
    # dedup to the per-frame cap BEFORE the table merge: the merge argsort then
    # runs on [C + cap] instead of [C + H*W*samples]
    upd_keys, f_trunc = dedup_keys_counted(keys, cfg.blocks_per_frame_cap)
    table, overflow = allocate(table, upd_keys)
    slots, mask = _frame_update_set(table, depth, pose_c2w, cam, cfg, upd_keys)
    p_ovf = patch_overflow_count(slots, mask, table, pose_c2w, cam, cfg)
    table = _integrate_blocks_dispatch(slots, mask, table, depth, color, pose_c2w, cam, cfg, +1.0)
    return table, FuseDiag(
        overflow=overflow, upd_truncated=f_trunc, patch_overflow=p_ovf, upd_mask=mask
    )


@functools.partial(jax.jit, static_argnames=("cam", "cfg"))
def integrate_batch(
    table: BlockTable,
    depths: jax.Array,  # [B, H, W]
    colors: jax.Array,  # [B, H, W, 3]
    poses: jax.Array,  # [B, 4, 4]
    valid: jax.Array,  # [B] bool — skip invalid frames
    cam: CameraModel,
    cfg: AppConfig,
) -> tuple[BlockTable, FuseDiag]:
    """Integrate a whole frame batch in ONE device program (lax.scan over
    frames) — one dispatch per chunk instead of one per frame, which matters
    when host<->device latency is nontrivial. Returns (table, FuseDiag) with
    per-frame [B, cap] update masks.

    Allocation is amortized: the union of every frame's truncation-band keys
    is sorted/merged into the pool ONCE, then the per-frame scan only computes
    update sets and runs the integrate kernel. (Per-frame update sets remain
    pure functions of (depth, pose) — de-integration exactness is untouched.)
    Keys dropped by the union cap are counted in ``overflow`` (they would
    otherwise vanish silently and the affected frames would under-integrate).
    """
    from .blocks import allocate, dedup_keys, dedup_keys_counted

    b = depths.shape[0]
    union_cap = cfg.blocks_per_frame_cap * 4
    all_keys = jax.vmap(
        lambda d, p, ok: jnp.where(
            ok, frame_alloc_keys(d, p, cam, cfg), INVALID_KEY
        )
    )(depths, poses, valid).reshape(-1)
    s = jnp.sort(all_keys)
    uniq_n = jnp.sum(
        jnp.concatenate([jnp.array([True]), s[1:] != s[:-1]]) & (s != INVALID_KEY)
    )
    union_overflow = jnp.maximum(0, uniq_n - union_cap).astype(jnp.int32)
    union = dedup_keys(all_keys, union_cap)
    table, overflow = allocate(table, union)

    if _use_pallas(cfg):
        # planar-pool scan: the whole-pool color transpose is paid ONCE per
        # batch instead of once per frame (the table's index arrays don't
        # change inside the scan — allocation already happened above)
        from .pallas_tsdf import (
            integrate_blocks_pallas_planar,
            pool_from_planar,
            pool_to_planar,
        )

        def step_p(pools, inp):
            depth, color, pose, ok = inp

            def do(pools):
                upd_keys, f_trunc = dedup_keys_counted(
                    frame_alloc_keys(depth, pose, cam, cfg), cfg.blocks_per_frame_cap
                )
                slots, mask = _frame_update_set(table, depth, pose, cam, cfg, upd_keys)
                mask = mask & ok
                slots = jnp.where(mask, slots, table.capacity).astype(jnp.int32)
                p_ovf = patch_overflow_count(slots, mask, table, pose, cam, cfg)
                new_pools = integrate_blocks_pallas_planar(
                    pools, table.key_of_slot, slots, mask, depth, color, pose,
                    cam, cfg, +1.0,
                )
                return new_pools, (mask, p_ovf, f_trunc)

            def skip(pools):
                return pools, (
                    jnp.zeros(cfg.blocks_per_frame_cap, bool),
                    jnp.int32(0),
                    jnp.int32(0),
                )

            return jax.lax.cond(ok, do, skip, pools)

        pools, (upd_masks, p_ovfs, f_truncs) = jax.lax.scan(
            step_p, pool_to_planar(table), (depths, colors, poses, valid)
        )
        table = pool_from_planar(table, *pools)
        return table, FuseDiag(
            overflow=overflow + union_overflow,
            upd_truncated=jnp.sum(f_truncs).astype(jnp.int32),
            patch_overflow=jnp.sum(p_ovfs).astype(jnp.int32),
            upd_mask=upd_masks,
        )

    def step(table, inp):
        depth, color, pose, ok = inp

        def do(table):
            upd_keys, f_trunc = dedup_keys_counted(
                frame_alloc_keys(depth, pose, cam, cfg), cfg.blocks_per_frame_cap
            )
            slots, mask = _frame_update_set(table, depth, pose, cam, cfg, upd_keys)
            p_ovf = patch_overflow_count(slots, mask, table, pose, cam, cfg)
            return (
                _integrate_blocks_dispatch(
                    slots, mask, table, depth, color, pose, cam, cfg, +1.0
                ),
                (mask, p_ovf, f_trunc),
            )

        def skip(table):
            return table, (
                jnp.zeros(cfg.blocks_per_frame_cap, bool),
                jnp.int32(0),
                jnp.int32(0),
            )

        return jax.lax.cond(ok, do, skip, table)

    table, (upd_masks, p_ovfs, f_truncs) = jax.lax.scan(
        step, table, (depths, colors, poses, valid)
    )
    return table, FuseDiag(
        overflow=overflow + union_overflow,
        upd_truncated=jnp.sum(f_truncs).astype(jnp.int32),
        patch_overflow=jnp.sum(p_ovfs).astype(jnp.int32),
        upd_mask=upd_masks,
    )


@functools.partial(jax.jit, static_argnames=("cam", "cfg"))
def deintegrate(
    table: BlockTable,
    depth: jax.Array,
    color: jax.Array,
    pose_c2w: jax.Array,
    cam: CameraModel,
    cfg: AppConfig,
    upd_mask: jax.Array | None = None,
) -> BlockTable:
    """Exactly remove a frame's contribution (must use the same pose/depth it
    was integrated with). No allocation: blocks must already exist.

    Pass the ``FuseDiag.upd_mask`` recorded at integrate time: a block the
    frame FAILED to update then (allocation overflow) may exist NOW — without
    the recorded mask we would subtract a contribution that was never added.
    """
    slots, mask = _frame_update_set(table, depth, pose_c2w, cam, cfg)
    if upd_mask is not None:
        mask = mask & upd_mask
    return _integrate_blocks_dispatch(slots, mask, table, depth, color, pose_c2w, cam, cfg, -1.0)


@functools.partial(jax.jit, static_argnames=("cam", "cfg"))
def deintegrate_batch(
    table: BlockTable,
    depths: jax.Array,  # [B, H, W]
    colors: jax.Array,  # [B, H, W, 3]
    poses: jax.Array,  # [B, 4, 4] — the poses the frames were integrated with
    valid: jax.Array,  # [B] bool
    cam: CameraModel,
    cfg: AppConfig,
    upd_masks: jax.Array | None = None,  # [B, cap] recorded at integrate time
) -> BlockTable:
    """Batched exact removal (scan over frames; one dispatch per batch)."""
    if upd_masks is None:
        upd_masks = jnp.ones((depths.shape[0], cfg.blocks_per_frame_cap), bool)

    if _use_pallas(cfg):
        from .pallas_tsdf import (
            integrate_blocks_pallas_planar,
            pool_from_planar,
            pool_to_planar,
        )

        def step_p(pools, inp):
            depth, color, pose, ok, rec = inp

            def do(pools):
                slots, mask = _frame_update_set(table, depth, pose, cam, cfg)
                mask = mask & rec & ok
                slots = jnp.where(mask, slots, table.capacity).astype(jnp.int32)
                return integrate_blocks_pallas_planar(
                    pools, table.key_of_slot, slots, mask, depth, color, pose,
                    cam, cfg, -1.0,
                )

            return jax.lax.cond(ok, do, lambda p: p, pools), None

        pools, _ = jax.lax.scan(
            step_p, pool_to_planar(table), (depths, colors, poses, valid, upd_masks)
        )
        return pool_from_planar(table, *pools)

    def step(table, inp):
        depth, color, pose, ok, rec = inp

        def do(t):
            slots, mask = _frame_update_set(t, depth, pose, cam, cfg)
            mask = mask & rec
            return _integrate_blocks_dispatch(slots, mask, t, depth, color, pose, cam, cfg, -1.0)

        return jax.lax.cond(ok, do, lambda t: t, table), None

    table, _ = jax.lax.scan(
        step, table, (depths, colors, poses, valid, upd_masks)
    )
    return table
