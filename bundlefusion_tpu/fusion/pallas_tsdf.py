"""Pallas TPU kernel for TSDF integration / de-integration.

The XLA path (``tsdf._integrate_blocks``) gathers every update block's voxel
data out of the pool, computes the projective update, and scatters it back —
three HBM round trips plus gather/scatter indexing overhead. This kernel
streams each block through VMEM exactly once using
``PrefetchScalarGridSpec``: the update slots are scalar-prefetched and drive
the BlockSpec index_map, so the pipeline DMA-gathers block (slot[i]) while
block (slot[i-1]) computes; outputs alias the inputs (in-place pool update).

Depth/color sampling inside the kernel uses the same one-hot-matmul-in-a-patch
trick as the XLA path: a dynamic VMEM slice of the (padded) image and one MXU
contraction per plane replace per-voxel random gathers, which Mosaic does not
vectorize. Layout notes: Mosaic wants plain 2D vectors — all per-voxel
quantities live as [512, 1] columns, block data is pre-reshaped to
[C, 512, 1] outside the kernel, and image channels arrive as separate 2D
planes (3D->2D slicing is an unsupported shape cast).

Sampling runs on NATIVE bf16 MXU passes and stays BIT-EXACT: a one-hot
contraction only ever adds zeros to the selected element, so exactness needs
only exactly-representable operands. The f32 depth image is split into three
bf16 planes (Dekker splitting — f32's 24 mantissa bits = 3 x bf16's 8, so
hi+mid+lo reconstructs the f32 depth exactly) and color arrives as three
uint8-valued planes (integers <= 255 are exact in bf16). Six 1-pass bf16
matmuls replace the two 6-pass f32 emulations the default matmul precision
would lower to — half the MXU work, identical results (equivalence-tested
against the XLA path, `tests/test_pallas.py`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import AppConfig
from ..geometry import se3
from ..geometry.camera import CameraModel
from .blocks import BLOCK, BlockTable

# patch rows (sublane-aligned origin, x16 — bf16 tile) and cols (lane-aligned
# origin, x128). the wider column extent guarantees any <=~104 px projected
# window still fits after its origin is quantized down.
_PATCH_V = 128
_PATCH_U = 256
_NVOX = BLOCK**3


def _kernel(
    # scalar prefetch (1-D each: 2-D SMEM rows pad to 128 lanes and blow the
    # 1 MB SMEM budget)
    slots_ref,  # [B] int32 (drives index maps)
    bx_ref,  # [B] block coord x
    by_ref,
    bz_ref,
    msk_ref,
    u0_ref,
    v0_ref,
    # inputs
    pose_ref,  # [1, 128] f32: w2c row-major (12) + intrinsics + sign
    dhi_ref,  # [Hp, Wp] bf16 depth split hi (hi+mid+lo == f32 depth, exact)
    dmid_ref,  # [Hp, Wp] bf16 depth split mid
    dlo_ref,  # [Hp, Wp] bf16 depth split lo
    cr_ref,  # [Hp, Wp] bf16 color r in 0..255 (exact bf16 integers)
    cg_ref,  # [Hp, Wp] bf16 color g
    cb_ref,  # [Hp, Wp] bf16 color b
    sdf_ref,  # [1, 4, 128]
    w_ref,  # [1, 4, 128]
    col_ref,  # [1, 12, 128] planar r|g|b (4 rows each)
    # outputs (aliased)
    sdf_out,
    w_out,
    col_out,
    *,
    voxel_size: float,
    trunc_base: float,
    trunc_scale: float,
    max_dist: float,
    max_weight: float,
    w_sample: float,
    width: int,
    height: int,
):
    i = pl.program_id(0)
    bx = bx_ref[i].astype(jnp.float32)
    by = by_ref[i].astype(jnp.float32)
    bz = bz_ref[i].astype(jnp.float32)
    active = msk_ref[i] > 0
    u0 = u0_ref[i]
    v0 = v0_ref[i]

    # masked grid rows (padding / overflow-dropped blocks) skip ALL compute —
    # at small frame resolutions the live update set is well under the static
    # blocks_per_frame_cap grid, and unmasked rows were paying full one-hot +
    # sampling + update cost for nothing. The masked write-through keeps the
    # sentinel scratch row's output defined.
    @pl.when(jnp.logical_not(active))
    def _passthrough():
        sdf_out[0] = sdf_ref[0]
        w_out[0] = w_ref[0]
        col_out[0] = col_ref[0]

    @pl.when(active)
    def _body():
        p = pose_ref  # [1, 128]
        fx, fy, pcx, pcy = p[0, 12], p[0, 13], p[0, 14], p[0, 15]
        sign = p[0, 16]

        # voxel centers in world space; per-voxel columns [512, 1]
        lin = jax.lax.broadcasted_iota(jnp.int32, (_NVOX, 1), 0)
        lx = (lin % BLOCK).astype(jnp.float32)
        ly = ((lin // BLOCK) % BLOCK).astype(jnp.float32)
        lz = (lin // (BLOCK * BLOCK)).astype(jnp.float32)
        wx = (bx * BLOCK + lx + 0.5) * voxel_size
        wy = (by * BLOCK + ly + 0.5) * voxel_size
        wz = (bz * BLOCK + lz + 0.5) * voxel_size

        # camera coords: w2c rows in p[0, 0..11] (row-major 3x4)
        px = p[0, 0] * wx + p[0, 1] * wy + p[0, 2] * wz + p[0, 3]
        py = p[0, 4] * wx + p[0, 5] * wy + p[0, 6] * wz + p[0, 7]
        pz = p[0, 8] * wx + p[0, 9] * wy + p[0, 10] * wz + p[0, 11]
        zsafe = jnp.maximum(pz, 1e-6)
        u = px / zsafe * fx + pcx
        v = py / zsafe * fy + pcy
        in_img = (pz > 1e-6) & (u >= 0) & (u <= width - 1) & (v >= 0) & (v <= height - 1)

        ui = jnp.clip(u + 0.5, 0, width - 1).astype(jnp.int32)
        vi = jnp.clip(v + 0.5, 0, height - 1).astype(jnp.int32)
        lu = ui - u0
        lv = vi - v0
        in_win = (lu >= 0) & (lu < _PATCH_U) & (lv >= 0) & (lv < _PATCH_V)
        luc = jnp.clip(lu, 0, _PATCH_U - 1)
        lvc = jnp.clip(lv, 0, _PATCH_V - 1)

        grid_v = jax.lax.broadcasted_iota(jnp.int32, (_NVOX, _PATCH_V), 1)
        grid_u = jax.lax.broadcasted_iota(jnp.int32, (_NVOX, _PATCH_U), 1)
        # one-hot selectors are exact in bf16 (0/1) -> every sample below is a
        # single NATIVE bf16 MXU pass, and the selected value is exact (the
        # contraction adds only zeros)
        oh_v = (lvc == grid_v).astype(jnp.bfloat16)  # [512, Pv]
        oh_u = (luc == grid_u).astype(jnp.float32)  # [512, Pu]
        v0a = pl.multiple_of(v0, 16)
        u0a = pl.multiple_of(u0, 128)

        def sample(img_ref):
            patch = img_ref[pl.ds(v0a, _PATCH_V), pl.ds(u0a, _PATCH_U)]  # [Pv, Pu] bf16
            # precision must be DEFAULT explicitly: the package-wide
            # jax_default_matmul_precision=float32 would request
            # contract_precision<fp32> on bf16 operands, which real Mosaic
            # rejects ("Bad lhs type"); DEFAULT = one native bf16 MXU pass,
            # still exact because the one-hot contraction only adds zeros.
            tmp = jnp.dot(
                oh_v,
                patch,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )  # [512, Pu]
            return jnp.sum(tmp * oh_u, axis=1, keepdims=True)  # [512, 1]

        # exact f32 depth from the 3-way bf16 split: hi+mid fits 17 mantissa
        # bits (representable), +lo restores the full 24 — bit-equal to the
        # f32 image the XLA path samples
        d = (sample(dhi_ref) + sample(dmid_ref)) + sample(dlo_ref)
        cr = sample(cr_ref) * (1.0 / 255.0)
        cg = sample(cg_ref) * (1.0 / 255.0)
        cb = sample(cb_ref) * (1.0 / 255.0)

        trunc = trunc_base + trunc_scale * d
        sdf_val = d - pz
        upd_ok = (
            active
            & in_img
            & in_win
            & (d > 0)
            & (d < max_dist)
            & (sdf_val > -trunc)
        )
        sdf_new = jnp.clip(sdf_val, -trunc, trunc)
        dw = jnp.where(upd_ok, w_sample * sign, 0.0)  # [512, 1]

        # move per-voxel columns into the block's native [4, 128] layout
        # ([512, 1] -> [4, 128] is a supported relayout; the reverse is not, so
        # the read-modify-write runs natively in [4, 128])
        to_blk = lambda a: a.reshape(4, 128)
        dw_b = to_blk(dw)
        sdf_new_b = to_blk(sdf_new)
        cr_b, cg_b, cb_b = to_blk(cr), to_blk(cg), to_blk(cb)

        old_sdf = sdf_ref[0]  # [4, 128]
        old_w = w_ref[0]
        ocr = col_ref[0, 0:4, :]
        ocg = col_ref[0, 4:8, :]
        ocb = col_ref[0, 8:12, :]
        new_w = old_w + dw_b
        num = old_sdf * old_w + sdf_new_b * dw_b
        upd_sdf = jnp.where(new_w > 1e-6, num / jnp.maximum(new_w, 1e-6), 0.0)
        new_w = jnp.clip(new_w, 0.0, max_weight)
        keep_w = jnp.where(new_w > 1e-6, new_w, 0.0)
        upd_sdf = jnp.where(keep_w > 0, upd_sdf, 0.0)
        live = keep_w > 0
        ucr = jnp.where(live, ocr + cr_b * dw_b, 0.0)
        ucg = jnp.where(live, ocg + cg_b * dw_b, 0.0)
        ucb = jnp.where(live, ocb + cb_b * dw_b, 0.0)

        sdf_out[0] = upd_sdf
        w_out[0] = keep_w
        col_out[0, 0:4, :] = ucr
        col_out[0, 4:8, :] = ucg
        col_out[0, 8:12, :] = ucb


def pool_to_planar(table: BlockTable):
    """(sdf, weight, color) pools -> the kernel's tiled views. The canonical
    pool layout IS the kernel's planar layout (blocks.py), so these are pure
    bitcast reshapes — free. (The old [C,8,8,8,3] canonical color forced a
    whole-pool transpose here whose XLA copy materialized 16x tile-padded:
    an OOM at 512^3-equivalent capacity.)"""
    rows = table.sdf.shape[0]
    sdf_r = table.sdf.reshape(rows, 4, 128)
    w_r = table.weight.reshape(rows, 4, 128)
    col_r = table.color.reshape(rows, 12, 128)
    return sdf_r, w_r, col_r


def pool_from_planar(table: BlockTable, sdf_r, w_r, col_r) -> BlockTable:
    return table._replace(
        sdf=sdf_r.reshape(table.sdf.shape),
        weight=w_r.reshape(table.weight.shape),
        color=col_r.reshape(table.color.shape),
    )


def split_depth_planes(depth: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """f32 depth -> three bf16 planes with hi+mid+lo == depth EXACTLY
    (Dekker splitting: f32's 24 mantissa bits = 3 x bf16's 8; each residual
    is exactly representable in f32, and the final residual fits bf16)."""
    hi = depth.astype(jnp.bfloat16)
    r1 = depth - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def color_planes(color: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """[H, W, 3] float color in [0,1] -> three bf16 planes of exact 0..255
    integers (sensor color is uint8 wire data, so the 1/255 quantization is
    lossless; de-integration re-quantizes identically, keeping the
    exact-inverse property)."""
    c8 = jnp.clip(jnp.round(color * 255.0), 0.0, 255.0).astype(jnp.bfloat16)
    return c8[..., 0], c8[..., 1], c8[..., 2]


def integrate_blocks_pallas_planar(
    pools,  # (sdf_r [rows,4,128], w_r [rows,4,128], col_r [rows,12,128])
    key_of_slot: jax.Array,
    slots: jax.Array,  # [B] data slots to update
    mask: jax.Array,  # [B]
    depth: jax.Array,  # [H, W]
    color: jax.Array,  # [H, W, 3]
    pose_c2w: jax.Array,  # [4, 4]
    cam: CameraModel,
    cfg: AppConfig,
    weight_sign: float,
    interpret: bool = False,
):
    """Core Pallas integrate on planar pools; returns updated pools."""
    from .blocks import unpack_key

    sdf_r, w_r, col_r = pools
    b = slots.shape[0]
    w2c = se3.mat_inverse(pose_c2w)
    coords = unpack_key(key_of_slot[slots])  # [B, 3] (masked rows: garbage)

    # per-block patch origin: min projected pixel of the block's corner AABB
    ctr = (coords.astype(jnp.float32) + 0.5) * (BLOCK * cfg.voxel_size)
    corner_offs = jnp.asarray(
        [[dx, dy, dz] for dx in (-0.5, 0.5) for dy in (-0.5, 0.5) for dz in (-0.5, 0.5)],
        jnp.float32,
    ) * (BLOCK * cfg.voxel_size)
    corners = ctr[:, None, :] + corner_offs[None]
    pc = se3.transform_points(w2c, corners.reshape(-1, 3)).reshape(b, 8, 3)
    z = jnp.maximum(pc[..., 2], 1e-3)
    uc = pc[..., 0] / z * cam.fx + cam.cx
    vc = pc[..., 1] / z * cam.fy + cam.cy
    u0 = jnp.clip(jnp.min(uc, axis=1).astype(jnp.int32) - 2, 0, cam.width - 1)
    v0 = jnp.clip(jnp.min(vc, axis=1).astype(jnp.int32) - 2, 0, cam.height - 1)
    # align origins for Mosaic's sliced-load constraints (coverage preserved
    # by the patch extents; see _PATCH_V/_PATCH_U note) — x16 rows: bf16 tile
    u0 = (u0 // 128) * 128
    v0 = (v0 // 16) * 16

    mask_i = mask.astype(jnp.int32)

    params = jnp.zeros((1, 128), jnp.float32)
    params = params.at[0, :12].set(w2c[:3, :4].reshape(-1))
    params = params.at[0, 12:17].set(
        jnp.asarray([cam.fx, cam.fy, cam.cx, cam.cy, weight_sign])
    )
    pad = ((0, _PATCH_V), (0, _PATCH_U))
    dhi, dmid, dlo = split_depth_planes(depth)
    pr, pg, pb = color_planes(color)
    planes = [jnp.pad(x, pad) for x in (dhi, dmid, dlo, pr, pg, pb)]

    kernel = functools.partial(
        _kernel,
        voxel_size=cfg.voxel_size,
        trunc_base=cfg.truncation,
        trunc_scale=cfg.truncation_scale,
        max_dist=cfg.max_integration_distance,
        max_weight=cfg.max_integration_weight,
        w_sample=cfg.integration_weight_sample,
        width=cam.width,
        height=cam.height,
    )
    bmap = lambda i, slots_ref, *_: (slots_ref[i], 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # params
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(6)],  # planes
            pl.BlockSpec((1, 4, 128), bmap),
            pl.BlockSpec((1, 4, 128), bmap),
            pl.BlockSpec((1, 12, 128), bmap),
        ],
        out_specs=[
            pl.BlockSpec((1, 4, 128), bmap),
            pl.BlockSpec((1, 4, 128), bmap),
            pl.BlockSpec((1, 12, 128), bmap),
        ],
    )
    sdf, wgt, col = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(sdf_r.shape, jnp.float32),
            jax.ShapeDtypeStruct(w_r.shape, jnp.float32),
            jax.ShapeDtypeStruct(col_r.shape, jnp.float32),
        ],
        input_output_aliases={14: 0, 15: 1, 16: 2},
        interpret=interpret,
    )(
        slots, coords[:, 0], coords[:, 1], coords[:, 2], mask_i, u0, v0,
        params, *planes, sdf_r, w_r, col_r,
    )
    return sdf, wgt, col


@functools.partial(jax.jit, static_argnames=("cam", "cfg", "interpret"))
def integrate_blocks_pallas(
    table: BlockTable,
    slots: jax.Array,  # [B] data slots to update
    mask: jax.Array,  # [B]
    depth: jax.Array,  # [H, W]
    color: jax.Array,  # [H, W, 3]
    pose_c2w: jax.Array,  # [4, 4]
    cam: CameraModel,
    cfg: AppConfig,
    weight_sign: float,
    interpret: bool = False,
) -> BlockTable:
    """Drop-in Pallas replacement for ``tsdf._integrate_blocks`` (single
    frame: converts the pool layout around one kernel call; batch callers use
    the planar API directly and convert once per batch)."""
    pools = pool_to_planar(table)
    pools = integrate_blocks_pallas_planar(
        pools, table.key_of_slot, slots, mask, depth, color, pose_c2w,
        cam, cfg, weight_sign, interpret=interpret,
    )
    return pool_from_planar(table, *pools)
