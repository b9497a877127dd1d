"""Iso-surface extraction from the dense-block TSDF.

Rebuild of ``CUDAMarchingCubesHashSDF.cu`` + ``MarchingCubesSDFUtil.h``
(SURVEY.md §2.1 "Marching cubes", §3.5): mesh the zero level set of the TSDF,
chunked over blocks to bound memory, producing a colored triangle soup saved
as ``.ply``.

Implementation note: cells are polygonized by *marching tetrahedra* (each cube
split into 6 tetrahedra sharing the main diagonal) rather than the classic
256-case marching-cubes tables — the 16-case tet table is derived in-code
(no opaque constant blobs), the mesh is crack-free across cells, and the
per-cell work is branch-free masked arithmetic, which vectorizes cleanly over
the block axis on the VPU. Triangle orientation is fixed a posteriori by
aligning each face normal with the interpolated SDF gradient.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AppConfig
from .blocks import BLOCK, INVALID_KEY, NVOX, BlockTable, lookup, pack_key, unpack_key

# --- the 6-tetrahedron decomposition of a cube (vertex indices 0..7, where
# vertex v has offsets ((v>>0)&1, (v>>1)&1, (v>>2)&1) in (x, y, z)) ---
_TETS = np.array(
    [
        [0, 5, 1, 7],
        [0, 1, 3, 7],
        [0, 3, 2, 7],
        [0, 2, 6, 7],
        [0, 6, 4, 7],
        [0, 4, 5, 7],
    ],
    dtype=np.int32,
)

# tet edges as pairs of local tet-vertex indices (a=0, b=1, c=2, d=3)
_TET_EDGES = np.array(
    [[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]], dtype=np.int32
)  # ab ac ad bc bd cd


def _build_tet_table() -> np.ndarray:
    """[16, 2, 3] triangle table: per inside-mask case, up to 2 triangles of
    tet-edge indices (-1 padded). Derived from the symmetry of the 4-bit case
    lattice; orientation handled later via SDF gradient."""
    ab, ac, ad, bc, bd, cd = range(6)
    t = -np.ones((16, 2, 3), dtype=np.int32)
    # single vertex inside
    t[0b0001, 0] = (ab, ac, ad)  # a
    t[0b0010, 0] = (ab, bd, bc)  # b
    t[0b0100, 0] = (ac, bc, cd)  # c
    t[0b1000, 0] = (ad, cd, bd)  # d
    # two vertices inside (quad -> 2 tris)
    t[0b0011] = [(ac, ad, bd), (ac, bd, bc)]  # a, b
    t[0b0101] = [(ab, ad, cd), (ab, cd, bc)]  # a, c
    t[0b1001] = [(ab, ac, cd), (ab, cd, bd)]  # a, d
    t[0b0110] = [(ab, bd, cd), (ab, cd, ac)]  # b, c
    t[0b1010] = [(ab, bc, cd), (ab, cd, ad)]  # b, d
    t[0b1100] = [(ac, ad, bd), (ac, bd, bc)]  # c, d
    # complements cross the same edges; mirror every unfilled case
    for case in range(1, 15):
        if t[case, 0, 0] == -1:
            t[case] = t[15 ^ case]
    return t


_TET_TABLE = _build_tet_table()


def _corner_sdf_for_blocks(table: BlockTable, slots: jax.Array, voxel_size: float):
    """For blocks at `slots` [B]: gather the 9x9x9 voxel-center SDF/weight/color
    corner grids (one extra layer from +1 neighbors via global lookups)."""
    bc = unpack_key(table.key_of_slot[slots])  # [B, 3]
    g = jnp.arange(BLOCK + 1, dtype=jnp.int32)
    zz, yy, xx = jnp.meshgrid(g, g, g, indexing="ij")
    local = jnp.stack([xx, yy, zz], axis=-1)  # [9,9,9,3] (x,y,z channels)
    # global voxel index = block_coord * 8 + local
    vox = bc[:, None, None, None, :] * BLOCK + local[None]
    nb_bc = jnp.floor_divide(vox, BLOCK)
    nb_local = vox - nb_bc * BLOCK
    key = pack_key(nb_bc)
    slot, found = lookup(table, key)
    lz, ly, lx = nb_local[..., 2], nb_local[..., 1], nb_local[..., 0]
    v = lz * 64 + ly * 8 + lx
    sdf = table.sdf[slot, v]
    wgt = table.weight[slot, v]
    col = jnp.stack([table.color[slot, ch * NVOX + v] for ch in range(3)], axis=-1)
    ok = found & (wgt > 0)
    sdf = jnp.where(ok, sdf, jnp.inf)
    col = jnp.where(ok[..., None], col / jnp.maximum(wgt, 1e-9)[..., None], 0.0)
    # world positions of the corners (voxel centers)
    pos = (vox.astype(jnp.float32) + 0.5) * voxel_size
    return sdf, col, ok, pos


@functools.partial(jax.jit, static_argnames=("voxel_size",))
def _mesh_blocks(table: BlockTable, slots: jax.Array, voxel_size: float):
    """Polygonize a batch of blocks. Returns fixed-capacity triangle soup:
    (verts [B, 8^3*6*2, 3, 3], cols [same], valid [B, 8^3*6*2])."""
    sdf, col, ok, pos = _corner_sdf_for_blocks(table, slots, voxel_size)  # [B,9,9,9,...]

    # cell corners: [B, 8,8,8, 8(corner), ...]
    def corners(arr):
        parts = []
        for v in range(8):
            dx, dy, dz = (v >> 0) & 1, (v >> 1) & 1, (v >> 2) & 1
            parts.append(arr[:, dz : dz + BLOCK, dy : dy + BLOCK, dx : dx + BLOCK])
        return jnp.stack(parts, axis=4)

    c_sdf = corners(sdf)  # [B,8,8,8,8]
    c_ok = corners(ok)
    c_col = corners(col)  # [B,8,8,8,8,3]
    c_pos = corners(pos)

    B = c_sdf.shape[0]
    flat = lambda x: x.reshape((B, BLOCK**3) + x.shape[4:])
    c_sdf, c_ok, c_col, c_pos = flat(c_sdf), flat(c_ok), flat(c_col), flat(c_pos)
    cell_ok = jnp.all(c_ok, axis=-1)  # [B, 512]

    tets = jnp.asarray(_TETS)  # [6, 4]
    tet_edges = jnp.asarray(_TET_EDGES)  # [6, 2]
    table_t = jnp.asarray(_TET_TABLE)  # [16, 2, 3]

    s_t = c_sdf[:, :, tets]  # [B, 512, 6, 4]
    p_t = c_pos[:, :, tets]  # [B, 512, 6, 4, 3]
    col_t = c_col[:, :, tets]

    inside = (s_t < 0).astype(jnp.int32)
    case = (
        inside[..., 0]
        | (inside[..., 1] << 1)
        | (inside[..., 2] << 2)
        | (inside[..., 3] << 3)
    )  # [B, 512, 6]

    # edge zero-crossing points for all 6 tet edges: [B,512,6,6edges,3]
    sa = s_t[..., tet_edges[:, 0]]
    sb = s_t[..., tet_edges[:, 1]]
    pa = p_t[:, :, :, tet_edges[:, 0]]
    pb = p_t[:, :, :, tet_edges[:, 1]]
    ca = col_t[:, :, :, tet_edges[:, 0]]
    cb = col_t[:, :, :, tet_edges[:, 1]]
    denom = sa - sb
    alpha = jnp.where(jnp.abs(denom) > 1e-12, sa / jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0), 0.5)
    alpha = jnp.clip(alpha, 0.0, 1.0)[..., None]
    e_pos = pa + alpha * (pb - pa)  # [B,512,6,6,3]
    e_col = ca + alpha * (cb - ca)

    tri_edges = table_t[case]  # [B,512,6,2,3] edge ids or -1
    tri_valid = (tri_edges[..., 0] >= 0) & cell_ok[:, :, None, None]  # [B,512,6,2]
    te = jnp.clip(tri_edges, 0, 5)
    # gather triangle vertices via advanced indexing: [B,512,6,2,3(vert),3(xyz)]
    b_i = jnp.arange(B)[:, None, None, None, None]
    c_i = jnp.arange(BLOCK**3)[None, :, None, None, None]
    t_i = jnp.arange(6)[None, None, :, None, None]
    tv = e_pos[b_i, c_i, t_i, te]
    tc = e_col[b_i, c_i, t_i, te]

    # orient: flip triangles whose geometric normal opposes the tet's linear
    # SDF gradient direction g ~ sum_e s_e (p_e - p_mean)
    n_geom = jnp.cross(tv[..., 1, :] - tv[..., 0, :], tv[..., 2, :] - tv[..., 0, :])
    g_dir = jnp.einsum("bcte,bctev->bctv", s_t, p_t) - jnp.mean(
        p_t, axis=-2
    ) * jnp.sum(s_t, axis=-1)[..., None]
    flip = jnp.einsum("bctv,bctrv->bctr", g_dir, n_geom) < 0  # [B,512,6,2]
    tv = jnp.where(flip[..., None, None], tv[..., ::-1, :], tv)
    tc = jnp.where(flip[..., None, None], tc[..., ::-1, :], tc)

    verts = tv.reshape(B, -1, 3, 3)
    cols = jnp.clip(tc.reshape(B, -1, 3, 3), 0.0, 1.0)
    valid = tri_valid.reshape(B, -1)
    return verts, cols, valid


def extract_mesh(
    table: BlockTable, cfg: AppConfig, block_batch: int = 64
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Mesh all occupied blocks, chunked (host loop) like the reference's
    chunked MC. Returns (vertices [V, 3], colors [V, 3], faces [F, 3])."""
    keys = np.asarray(table.key_of_slot)
    occupied = np.asarray(
        jnp.any(table.weight[: table.capacity] > 0, axis=1)
    ) & (keys != int(INVALID_KEY))
    slots_all = np.nonzero(occupied)[0].astype(np.int32)
    v_out, c_out = [], []
    for start in range(0, len(slots_all), block_batch):
        chunk = slots_all[start : start + block_batch]
        pad = block_batch - len(chunk)
        chunk_p = np.concatenate([chunk, np.zeros(pad, np.int32)])
        verts, cols, valid = _mesh_blocks(table, jnp.asarray(chunk_p), cfg.voxel_size)
        valid = np.array(valid)
        if pad:
            valid[block_batch - pad :] = False
        m = valid.reshape(-1)
        v_out.append(np.asarray(verts).reshape(-1, 3, 3)[m])
        c_out.append(np.asarray(cols).reshape(-1, 3, 3)[m])
    if not v_out or sum(len(v) for v in v_out) == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    tris = np.concatenate(v_out)  # [F, 3, 3]
    cols = np.concatenate(c_out)
    if len(tris) > cfg.mc_max_triangles:
        # triangle-soup capacity (s_marchingCubesMaxNumTriangles analog)
        import warnings

        warnings.warn(
            f"marching cubes: {len(tris)} triangles exceed mc_max_triangles="
            f"{cfg.mc_max_triangles}; truncating", stacklevel=2
        )
        tris = tris[: cfg.mc_max_triangles]
        cols = cols[: cfg.mc_max_triangles]
    nf = len(tris)
    verts = tris.reshape(-1, 3)
    colors = cols.reshape(-1, 3)
    faces = np.arange(nf * 3, dtype=np.int32).reshape(-1, 3)
    return verts, colors, faces
