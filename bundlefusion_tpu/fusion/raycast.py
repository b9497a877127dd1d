"""TSDF raycasting for live preview / model views.

Rebuild of ``CUDARayCastSDF.cu`` + ``RayCastSDFUtil.h`` (SURVEY.md §2.1
"Raycaster", §3.2 hot loop 2). The reference bounds each ray with a DX11
rasterization of block AABBs ("ray interval splatting"); a graphics API has no
TPU analog, so rays here march with a two-phase scheme instead:

  phase 1 (coarse): step at ~block granularity testing only block *existence*
    (one sorted-key lookup per step) to find the entry into allocated space;
  phase 2 (fine): step at a fraction of the truncation with trilinear TSDF
    sampling, detect the +/- zero crossing, and refine by linear interpolation.

Everything is a fixed-iteration `fori_loop` over masked lanes — divergence
becomes predication, which is what the VPU wants.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import AppConfig
from ..geometry import se3
from ..geometry.camera import CameraModel
from .blocks import BLOCK, BlockTable, lookup, pack_key, sample_trilinear, world_to_block


class RaycastResult(NamedTuple):
    depth: jax.Array  # [H, W] float32 (0 = miss)
    normal: jax.Array  # [H, W, 3]
    color: jax.Array  # [H, W, 3]
    hit: jax.Array  # [H, W] bool


@functools.partial(jax.jit, static_argnames=("cam", "cfg"))
def raycast(
    table: BlockTable,
    pose_c2w: jax.Array,  # [4, 4] camera-to-world of the view
    cam: CameraModel,
    cfg: AppConfig,
) -> RaycastResult:
    h, w = cam.height, cam.width
    v = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    u = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    dirs_cam = jnp.stack([(u - cam.cx) / cam.fx, (v - cam.cy) / cam.fy, jnp.ones_like(u)], axis=-1)
    R = pose_c2w[:3, :3]
    origin = pose_c2w[:3, 3]
    dirs = jnp.einsum("ij,hwj->hwi", R, dirs_cam)
    inv_norm = 1.0 / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs_n = dirs * inv_norm

    t_min = cfg.depth_min
    t_max = cfg.max_integration_distance * 1.2
    block_step = BLOCK * cfg.voxel_size * 0.8

    # --- phase 1: coarse march to allocated space ---
    def coarse(_, carry):
        t, entered = carry
        p = origin + dirs_n * t[..., None]
        key = pack_key(world_to_block(p.reshape(-1, 3), cfg.voxel_size))
        _, found = lookup(table, key)
        found = found.reshape(h, w)
        entered = entered | found
        t = jnp.where(entered, t, jnp.minimum(t + block_step, t_max))
        return t, entered

    n_coarse = int((t_max - t_min) / block_step) + 2
    t0 = jnp.full((h, w), t_min, jnp.float32)
    t, entered = jax.lax.fori_loop(0, n_coarse, coarse, (t0, jnp.zeros((h, w), bool)))
    # back off one block so the fine phase straddles the boundary
    t = jnp.where(entered, jnp.maximum(t - block_step, t_min), t)

    # --- phase 2: fine march with trilinear TSDF, find zero crossing ---
    fine_step = cfg.truncation * cfg.raycast_step_scale

    def fine(_, carry):
        t, prev_sdf, prev_t, hit_t, hit = carry
        p = (origin + dirs_n * t[..., None]).reshape(-1, 3)
        sdf, _, valid = sample_trilinear(table, p, cfg.voxel_size)
        sdf = sdf.reshape(h, w)
        valid = valid.reshape(h, w)
        crossing = valid & jnp.isfinite(prev_sdf) & (prev_sdf > 0) & (sdf <= 0) & ~hit
        # linear interpolation of the crossing point
        denom = prev_sdf - sdf
        alpha = jnp.where(jnp.abs(denom) > 1e-9, prev_sdf / jnp.maximum(denom, 1e-9), 0.0)
        t_cross = prev_t + alpha * (t - prev_t)
        hit_t = jnp.where(crossing, t_cross, hit_t)
        hit = hit | crossing
        # adaptive stepping: far from surface move by |sdf| (sphere-trace-like),
        # but at least a fraction of a voxel, at most a block
        step = jnp.clip(jnp.abs(sdf), cfg.voxel_size, block_step)
        step = jnp.where(valid, jnp.minimum(step, fine_step), fine_step)
        prev_sdf = jnp.where(valid, sdf, prev_sdf)
        prev_t = jnp.where(valid, t, prev_t)
        t = jnp.where(hit, t, t + step)
        return t, prev_sdf, prev_t, hit_t, hit

    init = (
        t,
        jnp.full((h, w), jnp.inf, jnp.float32),  # prev sdf
        t,
        jnp.zeros((h, w), jnp.float32),
        jnp.zeros((h, w), bool),
    )
    _, _, _, hit_t, hit = jax.lax.fori_loop(0, cfg.raycast_max_steps, fine, init)

    # --- shade: normals from SDF central differences, color trilinear ---
    p_hit = origin + dirs_n * hit_t[..., None]
    eps = cfg.voxel_size
    grads = []
    for axis in range(3):
        off = jnp.zeros(3, jnp.float32).at[axis].set(eps)
        s_p, _, _ = sample_trilinear(table, (p_hit + off).reshape(-1, 3), cfg.voxel_size)
        s_m, _, _ = sample_trilinear(table, (p_hit - off).reshape(-1, 3), cfg.voxel_size)
        grads.append((s_p - s_m).reshape(h, w))
    nrm = jnp.stack(grads, axis=-1)
    nn = jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    normal = jnp.where((nn > 1e-9) & jnp.isfinite(nn), nrm / jnp.maximum(nn, 1e-9), 0.0)
    _, color, cvalid = sample_trilinear(table, p_hit.reshape(-1, 3), cfg.voxel_size)
    color = jnp.where(hit[..., None], color.reshape(h, w, 3), 0.0)

    # hit_t is distance along the unit ray; camera-z depth = t / |dirs_cam|
    depth_out = jnp.where(hit, hit_t * inv_norm[..., 0], 0.0)
    return RaycastResult(depth=depth_out, normal=normal, color=color, hit=hit)


def shade_preview(result: RaycastResult, light_dir=(0.3, -0.5, 0.8)) -> jax.Array:
    """Simple lambertian shading of a raycast for PNG preview dumps — the
    headless stand-in for the reference's DX11PhongLighting view."""
    l = jnp.asarray(light_dir, jnp.float32)
    l = l / jnp.linalg.norm(l)
    lam = jnp.clip(jnp.abs(jnp.einsum("hwc,c->hw", result.normal, l)), 0.15, 1.0)
    img = result.color * lam[..., None]
    return jnp.where(result.hit[..., None], img, 0.1)
