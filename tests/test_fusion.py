"""Fusion-layer tests: block table algebra, TSDF integrate/de-integrate
reversibility, raycast consistency, marching-tetrahedra meshing (SURVEY.md §4
oracles)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bundlefusion_tpu.config import tiny_test_config
from bundlefusion_tpu.fusion import blocks, marching_cubes, raycast, tsdf
from util import cached_sequence

APP = tiny_test_config().app


# ---------------------------------------------------------------------------
# block table
# ---------------------------------------------------------------------------


def test_pack_unpack_roundtrip(rng):
    c = rng.integers(-500, 500, size=(256, 3)).astype(np.int32)
    k = blocks.pack_key(jnp.asarray(c))
    c2 = blocks.unpack_key(k)
    np.testing.assert_array_equal(np.asarray(c2), c)
    # out of range -> INVALID
    bad = jnp.asarray([[600, 0, 0]], jnp.int32)
    assert int(blocks.pack_key(bad)[0]) == int(blocks.INVALID_KEY)


def test_allocate_and_lookup(rng):
    table = blocks.make_table(512)
    coords = rng.integers(-10, 10, size=(64, 3)).astype(np.int32)
    keys = blocks.pack_key(jnp.asarray(coords))
    table, overflow = blocks.allocate(table, keys)
    assert int(overflow) == 0
    uniq = np.unique(np.asarray(keys))
    assert int(table.num_active()) == len(uniq)
    slot, found = blocks.lookup(table, keys)
    assert np.asarray(found).all()
    # unknown key not found
    _, f2 = blocks.lookup(table, blocks.pack_key(jnp.asarray([[400, 400, 400]], jnp.int32)))
    assert not bool(f2[0])


def test_allocate_preserves_data(rng):
    table = blocks.make_table(256)
    k1 = blocks.pack_key(jnp.asarray([[1, 2, 3]], jnp.int32))
    table, _ = blocks.allocate(table, k1)
    slot, _ = blocks.lookup(table, k1)
    table = table._replace(sdf=table.sdf.at[slot[0]].set(0.5), weight=table.weight.at[slot[0]].set(2.0))
    # allocate more blocks; original data must survive the permutation
    k2 = blocks.pack_key(jnp.asarray(rng.integers(-5, 0, size=(32, 3)), jnp.int32))
    table, _ = blocks.allocate(table, k2)
    slot2, found = blocks.lookup(table, k1)
    assert bool(found[0])
    assert float(table.sdf[slot2[0], 0]) == 0.5
    assert float(table.weight[slot2[0], 0]) == 2.0


def test_allocate_overflow_counted():
    table = blocks.make_table(128)
    coords = np.stack(np.meshgrid(np.arange(6), np.arange(6), np.arange(6), indexing="ij"), -1).reshape(-1, 3)
    keys = blocks.pack_key(jnp.asarray(coords.astype(np.int32)))
    table, overflow = blocks.allocate(table, keys)
    assert int(overflow) == 216 - 128
    assert int(table.num_active()) == 128


def test_garbage_collect():
    table = blocks.make_table(64)
    keys = blocks.pack_key(jnp.asarray(np.arange(30)[:, None].repeat(3, 1).astype(np.int32)))
    table, _ = blocks.allocate(table, keys)
    # give weight to half of them (address by DATA slot via lookup)
    slots, found = blocks.lookup(table, keys)
    w = np.array(table.weight)
    for i in range(0, 30, 2):
        w[int(slots[i]), 0] = 1.0
    table = table._replace(weight=jnp.asarray(w))
    table, freed = blocks.garbage_collect(table)
    assert int(freed) == 15
    assert int(table.num_active()) == 15


# ---------------------------------------------------------------------------
# TSDF integrate / deintegrate
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def fused_scene():
    seq = cached_sequence(8, width=64, height=48)
    table = blocks.make_table(APP.block_capacity)
    for i in range(8):
        table, diag = tsdf.integrate(
            table,
            jnp.asarray(seq.depth[i]),
            jnp.asarray(seq.color[i]),
            jnp.asarray(seq.poses[i]),
            seq.camera,
            APP,
        )
        assert int(diag.overflow) == 0
    return seq, table


def test_integrate_allocates_and_updates(fused_scene):
    seq, table = fused_scene
    assert int(table.num_active()) > 100
    assert float(jnp.sum(table.weight)) > 0


def test_tsdf_zero_near_surface(fused_scene):
    """TSDF sampled exactly on the observed surface must be ~0."""
    seq, table = fused_scene
    from bundlefusion_tpu.geometry import se3
    from bundlefusion_tpu.geometry.camera import unproject

    pts_cam = unproject(seq.camera, jnp.asarray(seq.depth[0]))
    valid = seq.depth[0] > 0
    pts_w = se3.transform_points(jnp.asarray(seq.poses[0]), pts_cam.reshape(-1, 3))
    sdf, _, ok = blocks.sample_trilinear(table, pts_w, APP.voxel_size)
    sdf = np.asarray(sdf).reshape(48, 64)
    ok = np.asarray(ok).reshape(48, 64)
    m = valid & ok
    assert m.mean() > 0.5
    assert np.abs(sdf[m]).mean() < APP.voxel_size * 1.5


def test_deintegrate_exactly_reverses(fused_scene):
    seq, table = fused_scene
    d = jnp.asarray(seq.depth[3])
    c = jnp.asarray(seq.color[3])
    T = jnp.asarray(seq.poses[3])
    t2, _ = tsdf.integrate(table, d, c, T, seq.camera, APP)
    t3 = tsdf.deintegrate(t2, d, c, T, seq.camera, APP)
    # weights restored exactly; sdf within float tolerance where observed
    np.testing.assert_allclose(np.asarray(t3.weight), np.asarray(table.weight), atol=1e-5)
    w = np.asarray(table.weight) > 0
    np.testing.assert_allclose(
        np.asarray(t3.sdf)[w], np.asarray(table.sdf)[w], atol=5e-3
    )
    np.testing.assert_allclose(np.asarray(t3.color), np.asarray(table.color), atol=1e-2)


def test_deintegrate_reintegrate_identity(fused_scene):
    """deintegrate(f) then integrate(f) at the same pose is an exact no-op,
    even though the table grew after f was first integrated (the update set is
    derived from the frame, not from a capped frustum visibility list)."""
    seq, table = fused_scene
    d, c, T = jnp.asarray(seq.depth[4]), jnp.asarray(seq.color[4]), jnp.asarray(seq.poses[4])
    t2 = tsdf.deintegrate(table, d, c, T, seq.camera, APP)
    t3, _ = tsdf.integrate(t2, d, c, T, seq.camera, APP)
    np.testing.assert_array_equal(np.asarray(t3.weight), np.asarray(table.weight))
    np.testing.assert_allclose(np.asarray(t3.sdf), np.asarray(table.sdf), atol=1e-6)


def test_deintegrate_exact_under_alloc_overflow():
    """A frame that failed to allocate some of its blocks (pool full) must NOT
    subtract from those blocks when de-integrated later, even though they
    exist by then (another frame allocated them). FuseDiag.upd_mask records
    what was actually added; deintegrate ANDs it in."""
    seq = cached_sequence(8, width=64, height=48)
    d, c, T = jnp.asarray(seq.depth[0]), jnp.asarray(seq.color[0]), jnp.asarray(seq.poses[0])

    # how many blocks does this frame want?
    free_table, _ = tsdf.integrate(blocks.make_table(2048), d, c, T, seq.camera, APP)
    n_want = int(free_table.num_active())
    assert n_want > 8

    # leave only half the needed capacity free (pad with far-away dummies)
    cap = n_want + n_want // 2
    n_dummy = cap - n_want // 2
    g = np.arange(n_dummy)
    dummy = np.stack([g % 16 + 300, g // 16 + 300, np.zeros_like(g)], -1).astype(np.int32)
    table = blocks.make_table(cap)
    table, ovf = blocks.allocate(table, blocks.pack_key(jnp.asarray(dummy)))
    assert int(ovf) == 0

    table1, diag1 = tsdf.integrate(table, d, c, T, seq.camera, APP)
    assert int(diag1.overflow) > 0  # some of the frame's blocks were dropped
    n_upd1 = int(jnp.sum(diag1.upd_mask))

    # dummies are weight-0 -> GC frees them; now the frame's missing blocks fit
    table2, freed = blocks.garbage_collect(table1)
    # >= : blocks allocated by the frame whose voxels all missed the update
    # window end weight-0 and are legitimately freed too
    assert int(freed) >= n_dummy
    table3, diag2 = tsdf.integrate(table2, d, c, T, seq.camera, APP)
    assert int(diag2.overflow) == 0

    # de-integrate the FIRST pass with its recorded mask: every surviving
    # block must hold exactly one frame's contribution (= fresh single pass)
    table4 = tsdf.deintegrate(
        table3, d, c, T, seq.camera, APP, upd_mask=diag1.upd_mask
    )
    ref, _ = tsdf.integrate(blocks.make_table(cap), d, c, T, seq.camera, APP)
    keys = np.asarray(ref.keys)
    keys = keys[keys != int(blocks.INVALID_KEY)]
    s_ref, f_ref = blocks.lookup(ref, jnp.asarray(keys))
    s_got, f_got = blocks.lookup(table4, jnp.asarray(keys))
    assert bool(jnp.all(f_ref)) and bool(jnp.all(f_got))
    np.testing.assert_array_equal(
        np.asarray(table4.weight[s_got]), np.asarray(ref.weight[s_ref])
    )
    np.testing.assert_allclose(
        np.asarray(table4.sdf[s_got]), np.asarray(ref.sdf[s_ref]), atol=1e-6
    )

    # sanity: WITHOUT the recorded mask the subtraction corrupts the blocks
    bad = tsdf.deintegrate(table3, d, c, T, seq.camera, APP)
    s_bad, _ = blocks.lookup(bad, jnp.asarray(keys))
    assert not np.array_equal(
        np.asarray(bad.weight[s_bad]), np.asarray(ref.weight[s_ref])
    )
    assert n_upd1 < n_want  # the mask really was partial


def test_integrate_deintegrate_to_empty():
    seq = cached_sequence(8, width=64, height=48)
    table = blocks.make_table(2048)
    d, c, T = jnp.asarray(seq.depth[0]), jnp.asarray(seq.color[0]), jnp.asarray(seq.poses[0])
    t1, _ = tsdf.integrate(table, d, c, T, seq.camera, APP)
    t2 = tsdf.deintegrate(t1, d, c, T, seq.camera, APP)
    assert float(jnp.sum(t2.weight)) == 0.0
    t3, freed = blocks.garbage_collect(t2)
    assert int(t3.num_active()) == 0


# ---------------------------------------------------------------------------
# raycast
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_raycast_matches_rendered_depth(fused_scene):
    seq, table = fused_scene
    cfg = dataclasses.replace(APP, raycast_width=64, raycast_height=48)
    rc_cam = seq.camera
    res = raycast.raycast(table, jnp.asarray(seq.poses[0]), rc_cam, cfg)
    hit = np.asarray(res.hit)
    gt = seq.depth[0]
    valid = (gt > 0) & hit
    assert hit.mean() > 0.5, f"hit rate {hit.mean()}"
    err = np.abs(np.asarray(res.depth)[valid] - gt[valid])
    assert np.median(err) < cfg.voxel_size * 2, f"median depth err {np.median(err)}"


def test_splat_truncation_counted():
    """VERDICT r2 weak #7: a near-camera block whose projected footprint
    exceeds the bounded scatter window must be COUNTED as truncated coverage,
    not silently dropped (the capacity-edge counter discipline)."""
    from bundlefusion_tpu.geometry.camera import CameraModel

    voxel = 0.02  # block extent 0.16 m, bounding radius ~0.139 m
    cfg = dataclasses.replace(APP, voxel_size=voxel, depth_min=0.1)
    cam = CameraModel.create(230.4, 230.4, 127.5, 95.5, 256, 192)  # 16x12 tiles
    table = blocks.make_table(64)
    table, _ = blocks.allocate(
        table, blocks.pack_key(jnp.asarray([[1, 1, 1]], jnp.int32))
    )
    ctr = (np.array([1, 1, 1]) + 0.5) * 8 * voxel
    pose = np.eye(4, dtype=np.float32)

    # far away: footprint fits the window, nothing truncated
    pose[:3, 3] = ctr - np.array([0, 0, 2.0])
    _, far_far, trunc_far = raycast.splat_intervals(table, jnp.asarray(pose), cam, cfg)
    assert int(trunc_far) == 0
    assert float(jnp.max(far_far)) > 0.0

    # just past the bounding sphere: footprint covers ~the whole tile grid,
    # wider than the (depth_min-derived, capped) scatter window
    pose[:3, 3] = ctr - np.array([0, 0, 0.18])
    _, _, trunc_near = raycast.splat_intervals(table, jnp.asarray(pose), cam, cfg)
    assert int(trunc_near) > 0


# ---------------------------------------------------------------------------
# marching cubes (tetrahedra)
# ---------------------------------------------------------------------------


def _make_sphere_table(radius=0.3, center=(0.0, 0.0, 0.0), voxel=0.02):
    """Analytically fill a table with a sphere SDF (no camera involved)."""
    cfg = dataclasses.replace(APP, voxel_size=voxel)
    r_blocks = int(np.ceil((radius + 3 * voxel) / (8 * voxel))) + 1
    g = np.arange(-r_blocks, r_blocks + 1)
    coords = np.stack(np.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3).astype(np.int32)
    table = blocks.make_table(4096)
    table, overflow = blocks.allocate(table, blocks.pack_key(jnp.asarray(coords)))
    assert int(overflow) == 0
    ctr = jnp.asarray(center, jnp.float32)
    # fill voxels (data arrays are indexed by DATA slot -> use key_of_slot)
    # data arrays carry a scratch row at index capacity; pad the slot keys
    kos = jnp.concatenate([table.key_of_slot, jnp.asarray([blocks.INVALID_KEY])])
    bc = blocks.unpack_key(kos)
    centers = jax.vmap(lambda b: blocks.voxel_centers(b, voxel))(bc)  # [C+1,8,8,8,3]
    sdf = jnp.linalg.norm(centers - ctr, axis=-1).reshape(-1, 512) - radius  # flat v
    active = (kos != blocks.INVALID_KEY)[:, None]
    near = jnp.abs(sdf) < 0.08
    w = jnp.where(active & near, 1.0, 0.0)
    table = table._replace(
        sdf=jnp.where(w > 0, jnp.clip(sdf, -0.06, 0.06), 0.0),
        weight=w,
        # pool color is flat channel-major [C+1, 3*512]
        color=(jnp.asarray([1.0, 0.5, 0.2])[None, :, None] * w[:, None, :]).reshape(
            w.shape[0], -1
        ),
    )
    return table, cfg


def test_marching_tets_sphere():
    table, cfg = _make_sphere_table()
    verts, colors, faces = marching_cubes.extract_mesh(table, cfg)
    assert len(verts) > 500
    r = np.linalg.norm(verts, axis=-1)
    np.testing.assert_allclose(r.mean(), 0.3, atol=0.01)
    assert np.abs(r - 0.3).max() < 0.03
    np.testing.assert_allclose(colors.mean(0), [1.0, 0.5, 0.2], atol=0.02)
    # triangle areas sum to roughly the sphere area
    tris = verts.reshape(-1, 3, 3)
    area = 0.5 * np.linalg.norm(
        np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0]), axis=-1
    ).sum()
    np.testing.assert_allclose(area, 4 * np.pi * 0.3**2, rtol=0.15)


def test_mesh_from_fused_scene(fused_scene, tmp_path):
    seq, table = fused_scene
    from bundlefusion_tpu.io.ply import write_ply
    from bundlefusion_tpu.io.synthetic import scene_sdf

    verts, colors, faces = marching_cubes.extract_mesh(table, APP)
    assert len(verts) > 1000
    d = np.abs(np.asarray(scene_sdf(jnp.asarray(verts))))
    assert np.median(d) < APP.voxel_size, f"median |sdf| at mesh = {np.median(d)}"
    write_ply(str(tmp_path / "scene.ply"), verts, colors, faces)
    assert (tmp_path / "scene.ply").stat().st_size > 1000


def test_visible_blocks_frustum(fused_scene):
    """compactifyVisibleBlocks analog: the visible set covers the blocks the
    frame's own allocation would touch, and excludes behind-camera blocks."""
    seq, table = fused_scene
    slots, mask = tsdf.visible_blocks(table, jnp.asarray(seq.poses[0]), seq.camera, APP)
    n_vis = int(mask.sum())
    assert n_vis > 50
    # every visible block is in front of the camera
    import numpy as _np

    coords = _np.asarray(blocks.unpack_key(table.key_of_slot[slots]))[_np.asarray(mask)]
    ctr = (coords + 0.5) * (8 * APP.voxel_size)
    w2c = _np.linalg.inv(seq.poses[0])
    z = (ctr @ w2c[:3, :3].T + w2c[:3, 3])[:, 2]
    assert (z > 0).all()
