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
    allocate,
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
    upd_keys: jax.Array | None = None  # [B, cap] int32 — the update-key lists
    # the integration used; recording them lets the NEXT de-integration of
    # these frames skip recomputing (and re-sorting) the lists


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
    if getattr(cfg, "alloc_stride_auto", False):
        # one ray per ~half block footprint at the farthest integration
        # distance (closer blocks project larger, i.e. denser-than-needed):
        # the stride is physics-scaled instead of resolution-fixed
        fp_px = BLOCK * cfg.voxel_size * cam.fx / cfg.max_integration_distance
        stride = max(stride, min(int(fp_px / 2), 8))
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
        # nearest pixel as floor(x + 0.5) — bit-identical to the Pallas
        # kernel's expression. jnp.round's half-to-even disagreed with the
        # kernel on exact-half projections (~8 voxels per megavoxel on real
        # frames), which showed up as cross-path diffs in hardware A/Bs.
        ui = jnp.clip(uv[..., 0] + 0.5, 0, cam.width - 1).astype(jnp.int32)
        vi = jnp.clip(uv[..., 1] + 0.5, 0, cam.height - 1).astype(jnp.int32)
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
        # pools store flat voxels (v = z*64+y*8+x — voxel_centers' flatten
        # order) with channel-major color: return kernel-native layouts
        return sdf_clamped, dw, c.T

    sdf_new, dw, c_new = jax.vmap(per_block)(coords, mask)

    # weighted running mean, written in the reversible accumulate form:
    #   S = sum w_i * sdf_i ; W = sum w_i ; value = S / W
    old_w = table.weight[slots]  # [B, 512]
    old_sdf = table.sdf[slots]
    # flat channel-major pool row -> [B, 3, 512] view for the update math
    old_col = table.color[slots].reshape(-1, 3, sdf_new.shape[-1])
    new_w = old_w + dw
    # color is stored as the weighted *accumulator* so de-integration is exact
    num = old_sdf * old_w + sdf_new * dw
    upd_sdf = jnp.where(new_w > 1e-6, num / jnp.maximum(new_w, 1e-6), 0.0)
    upd_col = old_col + c_new * dw[:, None, :]
    new_w = jnp.clip(new_w, 0.0, cfg.max_integration_weight)
    upd_w = jnp.where(new_w > 1e-6, new_w, 0.0)
    upd_sdf = jnp.where(upd_w > 0, upd_sdf, 0.0)
    upd_col = jnp.where(upd_w[:, None, :] > 0, upd_col, 0.0)

    return table._replace(
        sdf=table.sdf.at[slots].set(jnp.where(mask[:, None], upd_sdf, table.sdf[slots])),
        weight=table.weight.at[slots].set(jnp.where(mask[:, None], upd_w, table.weight[slots])),
        color=table.color.at[slots].set(
            jnp.where(mask[:, None, None], upd_col, old_col).reshape(
                old_col.shape[0], -1
            )
        ),
    )


def _use_pallas(cfg: AppConfig) -> bool:
    return cfg.use_pallas_tsdf and jax.default_backend() == "tpu"


def match_color_res(depth: jax.Array, color: jax.Array) -> jax.Array:
    """Nearest-upsample a reduced-resolution color image to the depth
    resolution (the v2 wire ships color at half res — TSDF coloring only).
    Full-resolution color passes through untouched, so every existing caller
    and the de-integration exactness story are unchanged (the upsample is a
    pure function of the stored wire bytes)."""
    fy = depth.shape[-2] // color.shape[-3]
    fx = depth.shape[-1] // color.shape[-2]
    if (fy, fx) == (1, 1):
        return color
    return jnp.repeat(jnp.repeat(color, fy, axis=-3), fx, axis=-2)


def _patch_window(cfg: AppConfig) -> tuple[int, int]:
    """Guaranteed (u, v) sampling-window extent of the active kernel: a block
    whose projection spans more than this loses its out-of-window voxels."""
    if _use_pallas(cfg):
        from .pallas_tsdf import _PATCH_U, _PATCH_V

        # origin alignment (x128 cols / x16 rows, bf16 tile) can waste up to
        # 127/15 px, plus the 2 px origin margin
        return _PATCH_U - 127 - 2, _PATCH_V - 15 - 2
    return 128, 128  # XLA path: origin at the min projected pixel


def patch_overflow_count(
    upd_keys: jax.Array,  # [B] packed block keys of the frame's update set
    mask: jax.Array,  # [B]
    pose_c2w: jax.Array,
    cam: CameraModel,
    cfg: AppConfig,
) -> jax.Array:
    """Count update blocks whose projected corner AABB exceeds the kernel's
    sampling window (VERDICT: the silent near-camera drop, now counted).
    Works on packed keys directly — no table needed (masked rows may hold
    INVALID_KEY; their garbage coords are excluded by ``mask``)."""
    from .blocks import unpack_key

    pu, pv = _patch_window(cfg)
    w2c = se3.mat_inverse(pose_c2w)
    coords = unpack_key(upd_keys)
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
    color = match_color_res(depth, color)
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
    table, overflow = allocate(table, upd_keys, assume_unique_sorted=True)
    slots, mask = _frame_update_set(table, depth, pose_c2w, cam, cfg, upd_keys)
    p_ovf = patch_overflow_count(upd_keys, mask, pose_c2w, cam, cfg)
    table = _integrate_blocks_dispatch(slots, mask, table, depth, color, pose_c2w, cam, cfg, +1.0)
    return table, FuseDiag(
        overflow=overflow, upd_truncated=f_trunc, patch_overflow=p_ovf, upd_mask=mask
    )


def _upd_keys_batch(
    depths: jax.Array,  # [N, H, W]
    poses: jax.Array,  # [N, 4, 4]
    active: jax.Array,  # [N] bool — inactive rows yield all-INVALID key lists
    cam: CameraModel,
    cfg: AppConfig,
) -> tuple[jax.Array, jax.Array]:
    """Per-row deduped update-key lists ([N, cap]) + per-row dropped-unique
    counts ([N]), computed ONCE outside the fuse scan. Each row stays a pure
    function of (depth, pose) — de-integration exactness unchanged. Hoisting
    this out of the per-frame scan removes the old design's dominant cost: a
    full [H*W*samples] key sort per scan step, computed TWICE per frame (once
    for the allocation union, once again in _frame_update_set)."""
    from .blocks import dedup_keys_counted

    def one(d, p, ok):
        keys = frame_alloc_keys(d, p, cam, cfg)
        return dedup_keys_counted(
            jnp.where(ok, keys, INVALID_KEY), cfg.blocks_per_frame_cap
        )

    return jax.vmap(one)(depths, poses, active)


def _union_counted(upd_keys: jax.Array, union_cap: int) -> tuple[jax.Array, jax.Array]:
    """Compact the union of per-row key lists to [union_cap]; also count the
    unique keys DROPPED by the cap (silent under-allocation otherwise)."""
    from .blocks import compact_sorted

    flat = upd_keys.reshape(-1)
    s = jnp.sort(flat)
    first = jnp.concatenate([jnp.array([True]), s[1:] != s[:-1]])
    valid_first = first & (s != INVALID_KEY)
    n_uniq = jnp.sum(valid_first).astype(jnp.int32)
    overflow = jnp.maximum(0, n_uniq - union_cap)
    return compact_sorted(s, valid_first, union_cap), overflow


def _fuse_rows_scan(
    table: BlockTable,
    depths: jax.Array,  # [B, H, W] frame storage (rows index into it)
    colors: jax.Array,  # [B, H, W, 3]
    fidx: jax.Array,  # [N] int32 — frame-storage index per row
    poses: jax.Array,  # [N, 4, 4]
    active: jax.Array,  # [N] bool — inactive rows skip ALL compute
    keys_rows: jax.Array,  # [N, cap] per-row update-key lists
    rec_rows: jax.Array,  # [N, cap] recorded update masks (all-True to disable)
    signs: jax.Array,  # [N] float32 — +1 integrate / -1 de-integrate per row
    cam: CameraModel,
    cfg: AppConfig,
) -> tuple[BlockTable, jax.Array, jax.Array]:
    """Shared fuse executor: scan the projective TSDF kernel over rows.
    Allocation must already have happened — the table's index arrays are
    loop-invariant; only the voxel pools are carried (on the Pallas path the
    planar conversion is paid ONCE per call, not once per row). Returns
    (table, applied masks [N, cap], patch-overflow counts [N])."""
    cap_slot = table.capacity

    if _use_pallas(cfg):
        from .pallas_tsdf import (
            integrate_blocks_pallas_planar,
            pool_from_planar,
            pool_to_planar,
        )

        # No lax.cond around the carry: a conditional's branches cannot alias
        # the carried buffers through the scan, so XLA materializes a copy of
        # the multi-GB planar pools per row (measured ~190 ms/chunk at the
        # flagship capacity). Instead fold `ok` into the slot mask — the
        # kernel's masked-row skip (pl.when) makes a fully-masked row ~1 ms.
        cap = keys_rows.shape[1]

        def step_p(pools, inp):
            fi, pose, ok, keys_row, rec_row, sign = inp

            # inactive rows skip lookup + the overflow projection entirely
            # (lax.cond is safe here: these outputs are small and do NOT
            # alias the carried pools — the pools themselves must stay
            # outside any cond, see the note below)
            def live(_):
                slots, found = lookup(table, keys_row)
                mask = found & rec_row & ok
                slots = jnp.where(mask, slots, cap_slot).astype(jnp.int32)
                p_ovf = patch_overflow_count(keys_row, mask, pose, cam, cfg)
                return slots, mask, p_ovf

            def dead(_):
                return (
                    jnp.full((cap,), cap_slot, jnp.int32),
                    jnp.zeros((cap,), bool),
                    jnp.int32(0),
                )

            slots, mask, p_ovf = jax.lax.cond(ok, live, dead, None)
            pools = integrate_blocks_pallas_planar(
                pools, table.key_of_slot, slots, mask,
                depths[fi], match_color_res(depths[fi], colors[fi]),
                pose, cam, cfg, sign,
            )
            return pools, (mask, p_ovf)

        pools, (masks, p_ovfs) = jax.lax.scan(
            step_p,
            pool_to_planar(table),
            (fidx, poses, active, keys_rows, rec_rows, signs),
        )
        return pool_from_planar(table, *pools), masks, p_ovfs

    def step(tbl, inp):
        fi, pose, ok, keys_row, rec_row, sign = inp
        slots, found = lookup(tbl, keys_row)
        mask = found & rec_row & ok
        p_ovf = patch_overflow_count(keys_row, mask, pose, cam, cfg)
        tbl = _integrate_blocks_dispatch(
            slots, mask, tbl, depths[fi], colors[fi], pose, cam, cfg, sign
        )
        return tbl, (mask, p_ovf)

    table, (masks, p_ovfs) = jax.lax.scan(
        step, table, (fidx, poses, active, keys_rows, rec_rows, signs)
    )
    return table, masks, p_ovfs


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
    """Integrate a whole frame batch in ONE device program — one dispatch per
    chunk instead of one per frame. Returns (table, FuseDiag) with per-frame
    [B, cap] update masks.

    Allocation is amortized: per-frame key lists are computed once (vmapped,
    outside the scan), their union is sorted/merged into the pool ONCE, and
    the per-frame scan only does lookup + the integrate kernel. Keys dropped
    by the union cap are counted in ``overflow``."""
    b = depths.shape[0]
    cap = cfg.blocks_per_frame_cap
    upd_keys_all, f_truncs = _upd_keys_batch(depths, poses, valid, cam, cfg)
    union, union_overflow = _union_counted(upd_keys_all, cap * 4)
    table, overflow = allocate(table, union, assume_unique_sorted=True)
    table, upd_masks, p_ovfs = _fuse_rows_scan(
        table, depths, colors,
        jnp.arange(b, dtype=jnp.int32), poses, valid, upd_keys_all,
        jnp.ones((b, cap), bool), jnp.ones(b, jnp.float32), cam, cfg,
    )
    return table, FuseDiag(
        overflow=overflow + union_overflow,
        upd_truncated=jnp.sum(f_truncs).astype(jnp.int32),
        patch_overflow=jnp.sum(p_ovfs).astype(jnp.int32),
        upd_mask=upd_masks,
        upd_keys=upd_keys_all,
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
    b = depths.shape[0]
    if upd_masks is None:
        upd_masks = jnp.ones((b, cfg.blocks_per_frame_cap), bool)
    upd_keys_all, _ = _upd_keys_batch(depths, poses, valid, cam, cfg)
    table, _, _ = _fuse_rows_scan(
        table, depths, colors,
        jnp.arange(b, dtype=jnp.int32), poses, valid, upd_keys_all,
        upd_masks, -jnp.ones(b, jnp.float32), cam, cfg,
    )
    return table


@functools.partial(jax.jit, static_argnames=("cam", "cfg", "deint_rows"))
def fuse_batch(
    table: BlockTable,
    depths: jax.Array,  # [B, H, W]
    colors: jax.Array,  # [B, H, W, 3]
    old_poses: jax.Array,  # [B, 4, 4] — poses the frames were integrated with
    new_poses: jax.Array,  # [B, 4, 4] — current optimized poses
    deint_mask: jax.Array,  # [B] de-integrate at old_poses
    reint_mask: jax.Array,  # [B] (re-)integrate at new_poses
    upd_masks_rec: jax.Array,  # [B, cap] recorded update masks for the deints
    cam: CameraModel,
    cfg: AppConfig,
    upd_keys_rec: jax.Array | None = None,  # [B, cap] recorded update-key
    # lists for the deints (FuseDiag.upd_keys from integrate time). The list
    # is a pure function of (depth, pose), so the record is bit-identical to
    # recomputation — passing it halves the dominant per-row key-sort work.
    deint_rows: int | None = None,  # only the LAST deint_rows rows of the
    # batch may de-integrate (the pipeline's new-frame rows never do); the
    # scan then runs B + deint_rows rows instead of 2B. None = all B rows.
) -> tuple[BlockTable, FuseDiag]:
    """De-integrate + (re-)integrate a frame batch in ONE device program: one
    allocation merge, one kernel scan over B + deint_rows rows (all
    de-integrations first, preserving the deintegrate_batch->integrate_batch
    order), and — on the Pallas path — ONE planar pool round trip instead of
    two. This is the pipeline's per-chunk fuse step (SURVEY.md §3.4
    on-the-fly re-integration).

    Returns (table, FuseDiag); ``upd_mask`` is the [B, cap] re-integration
    record (all-False rows for frames not re-integrated)."""
    b = depths.shape[0]
    dr = b if deint_rows is None else deint_rows
    lo = b - dr  # first row eligible for de-integration
    cap = cfg.blocks_per_frame_cap
    deint_mask = deint_mask & (jnp.arange(b) >= lo)
    reint_keys, trunc_r = _upd_keys_batch(depths, new_poses, reint_mask, cam, cfg)
    if upd_keys_rec is None:
        deint_keys, _ = _upd_keys_batch(
            depths[lo:], old_poses[lo:], deint_mask[lo:], cam, cfg
        )
    else:
        deint_keys = jnp.where(
            deint_mask[lo:, None], upd_keys_rec[lo:], INVALID_KEY
        )
    keys2 = jnp.concatenate([deint_keys, reint_keys])
    union, union_overflow = _union_counted(reint_keys, cap * 4)
    table, overflow = allocate(table, union, assume_unique_sorted=True)
    act2 = jnp.concatenate([deint_mask[lo:], reint_mask])
    fidx2 = jnp.concatenate([jnp.arange(lo, b), jnp.arange(b)]).astype(jnp.int32)
    poses2 = jnp.concatenate([old_poses[lo:], new_poses])
    rec2 = jnp.concatenate([upd_masks_rec[lo:], jnp.ones((b, cap), bool)])
    sign2 = jnp.concatenate(
        [-jnp.ones(dr, jnp.float32), jnp.ones(b, jnp.float32)]
    )
    table, masks2, povf2 = _fuse_rows_scan(
        table, depths, colors, fidx2, poses2, act2, keys2, rec2, sign2, cam, cfg
    )
    return table, FuseDiag(
        overflow=overflow + union_overflow,
        upd_truncated=jnp.sum(trunc_r).astype(jnp.int32),
        patch_overflow=jnp.sum(povf2[dr:]).astype(jnp.int32),
        upd_mask=masks2[dr:],
        upd_keys=reint_keys,
    )
