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
vectorize.

Layout notes (the lane-major rewrite, round 4): all per-voxel quantities live
as [1, 512] lane vectors — full-lane VPU ops (the original [512, 1] column
layout used 1/128 of each vector register). The one-hot contraction is
oriented so the MXU consumes voxels along lanes: ``patch[Pv,Pu] @
oh_u[Pu,512] -> [Pv,512]``, then an ``oh_v``-masked sublane reduction picks
the row — one matmul + one VPU reduce per plane. The pool read-modify-write
runs on 128-lane slices of the [1, 512] vectors against the block's native
[4, 128] tile rows.

Two-way sampling window: most blocks project to a small footprint (<= ~45 px
span at 640x480 / 1 cm voxels), so the kernel carries a small 64x128 window
variant (1/8 the MXU work of the 128x256 window) selected per block by the
same corner-AABB test the wrapper uses for patch-overflow counting. The
selection is exact: the small window is only taken when EVERY voxel's
nearest-pixel index provably lands inside it, so results are bit-identical
to the single-window kernel (A/B checked on hardware; BF_TSDF_FORCE_BIG=1
disables the small window for re-checking).

Cross-path (Pallas vs XLA) equality note: both paths compute nearest-pixel
as floor(u + 0.5) on identically-ordered f32 projection math, and sampling
is exact on both, so they agree bit-for-bit in practice (interpret-mode
equivalence is asserted in tests). On hardware, Mosaic and XLA:TPU may still
schedule the f32 projection arithmetic with different fusion/rounding, so a
voxel whose projection sits within 1 ulp of a pixel-index or truncation
boundary can flip between the paths (measured: ~8 voxels per million before
the rounding alignment, 0 after). The product never mixes paths within a
run — integrate and de-integrate dispatch the SAME kernel (tsdf
_integrate_blocks_dispatch), so exact de-integration is unaffected.

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
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import AppConfig
from ..geometry import se3
from ..geometry.camera import CameraModel
from .blocks import BLOCK, BlockTable

# big patch rows (sublane-aligned origin, x16 — bf16 tile) and cols
# (lane-aligned origin, x128). the wider column extent guarantees any
# <=~104 px projected window still fits after its origin is quantized down.
_PATCH_V = 128
_PATCH_U = 256
# small window (the common case: distant / small-footprint blocks). Chosen so
# a block fits whenever its aligned-origin span is < (112, 48) px — ~85% of
# blocks in the flagship scene — at 1/8 the big window's MXU sampling work.
_SMALL_V = 64
_SMALL_U = 128
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
    sml_ref,  # [B] 1 -> the small sampling window provably covers the block
    # inputs
    pose_ref,  # [1, 128] f32: w2c row-major (12) + intrinsics + sign
    planes_ref,  # [6*Hp, Wp] bf16 — the six sampling planes stacked tall:
    # depth split hi/mid/lo (hi+mid+lo == f32 depth, exact) then color
    # r/g/b in 0..255 (exact bf16 integers). One tall array so the kernel
    # samples ALL planes with a single M-stacked MXU contraction (below).
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
    hp: int,  # padded per-plane row count (16-aligned) inside planes_ref
):
    i = pl.program_id(0)
    active = msk_ref[i] > 0
    small = sml_ref[i] > 0

    # masked grid rows (padding / overflow-dropped blocks) skip ALL compute —
    # at small frame resolutions the live update set is well under the static
    # blocks_per_frame_cap grid, and unmasked rows were paying full one-hot +
    # sampling + update cost for nothing. The masked write-through keeps the
    # sentinel scratch row's output defined — but only on the FIRST step of a
    # masked run: every masked step routes to the same scratch slot, so
    # Mosaic's revisiting keeps the same VMEM buffer across consecutive
    # equal-index steps and one copy makes it valid for the whole run.
    # (A fully-masked row is thousands of scratch steps; copying 20 KB per
    # step was most of its ~1.7 ms cost.)
    prev = slots_ref[jnp.maximum(i - 1, 0)]
    fresh = (i == 0) | (slots_ref[i] != prev)

    @pl.when(jnp.logical_not(active) & fresh)
    def _passthrough():
        sdf_out[0] = sdf_ref[0]
        w_out[0] = w_ref[0]
        col_out[0] = col_ref[0]

    @pl.when(active)
    def _body():
        p = pose_ref  # [1, 128]
        fx, fy, pcx, pcy = p[0, 12], p[0, 13], p[0, 14], p[0, 15]
        sign = p[0, 16]
        bx = bx_ref[i].astype(jnp.float32)
        by = by_ref[i].astype(jnp.float32)
        bz = bz_ref[i].astype(jnp.float32)
        u0 = u0_ref[i]
        v0 = v0_ref[i]

        # voxel centers in world space; per-voxel quantities live lane-major
        # [1, 512] — every VPU op below runs at full lane occupancy
        lin = jax.lax.broadcasted_iota(jnp.int32, (1, _NVOX), 1)
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
        v0a = pl.multiple_of(v0, 16)
        u0a = pl.multiple_of(u0, 128)

        def variant(pv_ext, pu_ext):
            in_win = (lu >= 0) & (lu < pu_ext) & (lv >= 0) & (lv < pv_ext)
            luc = jnp.clip(lu, 0, pu_ext - 1)
            lvc = jnp.clip(lv, 0, pv_ext - 1)
            # one-hot selectors are exact in bf16 (0/1) -> the sample below
            # is a NATIVE bf16 MXU pass, and the selected value is exact
            # (the contraction adds only zeros)
            oh_u = (
                jax.lax.broadcasted_iota(jnp.int32, (pu_ext, _NVOX), 0) == luc
            ).astype(jnp.bfloat16)  # [Pu, 512]
            oh_v = (
                jax.lax.broadcasted_iota(jnp.int32, (pv_ext, _NVOX), 0) == lvc
            ).astype(jnp.float32)  # [Pv, 512]

            # ALL SIX planes sampled by ONE M-stacked contraction: each
            # plane's patch is a [Pv, Pu] slice of the tall stack; stacking
            # them along M gives [6*Pv, Pu] @ [Pu, 512] — at the small
            # window that is M=384 (3 full MXU M-tiles) where six separate
            # dots ran M=64 each (6 half-idle tiles): HALF the MXU passes
            # for identical results (each plane's rows are independent).
            # precision must be DEFAULT explicitly: the package-wide
            # jax_default_matmul_precision=float32 would request
            # contract_precision<fp32> on bf16 operands, which real
            # Mosaic rejects ("Bad lhs type"); DEFAULT = one native bf16
            # MXU pass, still exact (one-hot adds only zeros).
            patch6 = jnp.concatenate(
                [
                    planes_ref[
                        pl.ds(pl.multiple_of(p * hp + v0a, 16), pv_ext),
                        pl.ds(u0a, pu_ext),
                    ]
                    for p in range(6)
                ],
                axis=0,
            )  # [6*Pv, Pu]
            tmp6 = jnp.dot(
                patch6,
                oh_u,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )  # [6*Pv, 512]

            def pick(p):  # [1, 512] sample of plane p (oh_v-masked reduce)
                return jnp.sum(
                    oh_v * tmp6[p * pv_ext : (p + 1) * pv_ext], axis=0, keepdims=True
                )

            # exact f32 depth from the 3-way bf16 split: hi+mid fits 17
            # mantissa bits (representable), +lo restores the full 24 —
            # bit-equal to the f32 image the XLA path samples
            d = (pick(0) + pick(1)) + pick(2)
            cr = pick(3) * (1.0 / 255.0)
            cg = pick(4) * (1.0 / 255.0)
            cb = pick(5) * (1.0 / 255.0)

            trunc = trunc_base + trunc_scale * d
            sdf_val = d - pz
            upd_ok = (
                in_img & in_win & (d > 0) & (d < max_dist) & (sdf_val > -trunc)
            )
            sdf_new = jnp.clip(sdf_val, -trunc, trunc)
            dw = jnp.where(upd_ok, w_sample * sign, 0.0)  # [1, 512]

            # read-modify-write the pool row group by group: 128-lane slices
            # of the [1, 512] vectors against the native [4, 128] tile rows
            for g in range(4):
                sl = slice(128 * g, 128 * (g + 1))
                dw_g = dw[:, sl]
                sn_g = sdf_new[:, sl]
                old_sdf = sdf_ref[0, g : g + 1, :]
                old_w = w_ref[0, g : g + 1, :]
                ocr = col_ref[0, g : g + 1, :]
                ocg = col_ref[0, 4 + g : 5 + g, :]
                ocb = col_ref[0, 8 + g : 9 + g, :]
                new_w = old_w + dw_g
                num = old_sdf * old_w + sn_g * dw_g
                upd_sdf = jnp.where(new_w > 1e-6, num / jnp.maximum(new_w, 1e-6), 0.0)
                new_w = jnp.clip(new_w, 0.0, max_weight)
                keep_w = jnp.where(new_w > 1e-6, new_w, 0.0)
                upd_sdf = jnp.where(keep_w > 0, upd_sdf, 0.0)
                live = keep_w > 0
                sdf_out[0, g : g + 1, :] = upd_sdf
                w_out[0, g : g + 1, :] = keep_w
                col_out[0, g : g + 1, :] = jnp.where(live, ocr + cr[:, sl] * dw_g, 0.0)
                col_out[0, 4 + g : 5 + g, :] = jnp.where(live, ocg + cg[:, sl] * dw_g, 0.0)
                col_out[0, 8 + g : 9 + g, :] = jnp.where(live, ocb + cb[:, sl] * dw_g, 0.0)

        @pl.when(small)
        def _small():
            variant(_SMALL_V, _SMALL_U)

        @pl.when(jnp.logical_not(small))
        def _big():
            variant(_PATCH_V, _PATCH_U)


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

    # small-window fit: every voxel's nearest-pixel index ui <= umax + 0.5
    # (ui rounds the clipped projection), so the small patch covers the block
    # iff the clipped corner AABB's max stays 1.5 px inside the window end.
    umax = jnp.max(jnp.clip(uc, 0, cam.width - 1), axis=1)
    vmax = jnp.max(jnp.clip(vc, 0, cam.height - 1), axis=1)
    fits = (umax <= u0.astype(jnp.float32) + (_SMALL_U - 1.5)) & (
        vmax <= v0.astype(jnp.float32) + (_SMALL_V - 1.5)
    )
    sml = (fits & mask).astype(jnp.int32)
    if os.environ.get("BF_TSDF_FORCE_BIG"):  # debug: disable the small window
        sml = sml * 0
    mask_i = mask.astype(jnp.int32)

    params = jnp.zeros((1, 128), jnp.float32)
    params = params.at[0, :12].set(w2c[:3, :4].reshape(-1))
    params = params.at[0, 12:17].set(
        jnp.asarray([cam.fx, cam.fy, cam.cx, cam.cy, weight_sign])
    )
    # six sampling planes stacked into ONE tall [6*Hp, Wp] array (the kernel
    # samples all of them with a single M-stacked MXU contraction). Hp is
    # 16-row aligned so every plane's patch slice keeps Mosaic's sublane
    # alignment; coverage needs Hp >= (H-1 aligned down) + _PATCH_V and
    # Wp >= (max aligned u0) + _PATCH_U, which H+_PATCH_V / W+_PATCH_U
    # rounded up to the tile grid guarantee.
    h_img, w_img = depth.shape
    hp = -(-(h_img + _PATCH_V) // 16) * 16
    wp = -(-(w_img + _PATCH_U) // 128) * 128
    dhi, dmid, dlo = split_depth_planes(depth)
    pr, pg, pb = color_planes(color)
    planes_tall = jnp.concatenate(
        [
            jnp.pad(x, ((0, hp - h_img), (0, wp - w_img)))
            for x in (dhi, dmid, dlo, pr, pg, pb)
        ],
        axis=0,
    )  # [6*Hp, Wp] bf16

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
        hp=hp,
    )
    bmap = lambda i, slots_ref, *_: (slots_ref[i], 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # params
            pl.BlockSpec(memory_space=pltpu.VMEM),  # planes (tall stack)
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
        input_output_aliases={10: 0, 11: 1, 12: 2},
        interpret=interpret,
    )(
        slots, coords[:, 0], coords[:, 1], coords[:, 2], mask_i, u0, v0, sml,
        params, planes_tall, sdf_r, w_r, col_r,
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
