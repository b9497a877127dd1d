"""Tests for SIFT detection, matching, and the 3-stage correspondence filter.

The core oracle is the synthetic sequence's exact ground truth: matched and
filtered correspondences must reproduce the true relative camera transform
(BASELINE config 1's accuracy path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bundlefusion_tpu.config import tiny_test_config
from bundlefusion_tpu.features import filters, matcher, sift
from bundlefusion_tpu.geometry import se3
from bundlefusion_tpu.ops.preprocess import preprocess_frames
from util import cached_sequence

CFG = tiny_test_config().bundling
W, H = 128, 96


@pytest.fixture(scope="module")
def seq():
    return cached_sequence(4, width=W, height=H)


@pytest.fixture(scope="module")
def frames_and_keys(seq):
    cache_cam = seq.camera.scaled(32, 24)
    frames, cache = preprocess_frames(
        jnp.asarray(seq.depth), jnp.asarray(seq.color), seq.camera, cache_cam
    )
    keys = sift.detect_batch(frames.intensity, frames.depth, seq.camera, CFG)
    return frames, cache, cache_cam, keys


def test_sift_finds_keys(frames_and_keys):
    _, _, _, keys = frames_and_keys
    counts = np.asarray(jnp.sum(keys.valid, axis=-1))
    assert (counts >= 40).all(), counts
    v = np.asarray(keys.valid[0])
    xy = np.asarray(keys.xy[0])[v]
    assert (xy[:, 0] >= 0).all() and (xy[:, 0] < W).all()
    assert (xy[:, 1] >= 0).all() and (xy[:, 1] < H).all()
    norms = np.linalg.norm(np.asarray(keys.desc[0])[v], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)
    # 3D lifting consistent with depth
    d = np.asarray(keys.depth[0])[v]
    p3 = np.asarray(keys.p3d[0])[v]
    np.testing.assert_allclose(p3[:, 2], d, atol=1e-6)


def test_sift_deterministic(seq, frames_and_keys):
    frames, _, _, keys = frames_and_keys
    keys2 = sift.detect_batch(frames.intensity, frames.depth, seq.camera, CFG)
    np.testing.assert_array_equal(np.asarray(keys.xy), np.asarray(keys2.xy))
    np.testing.assert_array_equal(np.asarray(keys.desc), np.asarray(keys2.desc))


def test_match_self_is_identity(frames_and_keys):
    _, _, _, keys = frames_and_keys
    k0 = jax.tree.map(lambda x: x[0], keys)
    m = matcher.match_pair(k0, k0, CFG)
    v = np.asarray(m.valid)
    assert v.sum() > 30
    np.testing.assert_array_equal(np.asarray(m.idx_i)[v], np.asarray(m.idx_j)[v])
    # bf16 similarity quantization inflates near-zero distances to ~sqrt(2*eps_bf16);
    # irrelevant at the 0.7/0.8 decision thresholds
    assert np.asarray(m.dist)[v].max() < 0.12


def test_match_adjacent_frames(frames_and_keys):
    _, _, _, keys = frames_and_keys
    pa, pb = jnp.array([0]), jnp.array([1])
    m = matcher.match_all_pairs(keys, pa, pb, CFG)
    assert int(m.count()[0]) > 15


def test_kabsch_filter_recovers_gt_pose(seq, frames_and_keys):
    _, _, _, keys = frames_and_keys
    pa_idx, pb_idx = jnp.array([0]), jnp.array([1])
    m = matcher.match_all_pairs(keys, pa_idx, pb_idx, CFG)
    pa, pb = matcher.gather_match_points(keys, pa_idx, pb_idx, m)
    T, inl, ok = filters.kabsch_filter(pa[0], pb[0], m.valid[0], CFG)
    assert bool(ok)
    # ground truth: p_b = inv(pose_b) @ pose_a @ p_a
    T_gt = np.linalg.inv(seq.poses[1]) @ seq.poses[0]
    ang, dist = se3.pose_distance(jnp.asarray(T_gt), T)
    assert float(ang) < np.deg2rad(2.0), f"rotation error {np.rad2deg(float(ang))} deg"
    # sparse-only accuracy at 96x64 (1 px ~ 3 cm at 2.5 m); dense GN refines later
    assert float(dist) < 0.05, f"translation error {float(dist)} m"


def test_surface_area_filter_rejects_degenerate():
    # colinear points: no surface spread
    t = np.linspace(0, 1, 32, dtype=np.float32)
    line = np.stack([t, t * 0.5, np.ones_like(t)], axis=-1)
    ok = filters.surface_area_filter(
        jnp.asarray(line), jnp.asarray(line), jnp.ones(32, bool), CFG
    )
    assert not bool(ok)
    # well-spread points pass
    rng = np.random.default_rng(0)
    cloud = rng.uniform(-0.5, 0.5, size=(32, 3)).astype(np.float32)
    ok2 = filters.surface_area_filter(
        jnp.asarray(cloud), jnp.asarray(cloud), jnp.ones(32, bool), CFG
    )
    assert bool(ok2)


def test_dense_verify_accepts_gt_rejects_wrong(seq, frames_and_keys):
    _, cache, cache_cam, _ = frames_and_keys
    c0 = jax.tree.map(lambda x: x[0], cache)
    c1 = jax.tree.map(lambda x: x[1], cache)
    T_gt = jnp.asarray(np.linalg.inv(seq.poses[1]) @ seq.poses[0])
    ok = filters.dense_verify_filter(c0, c1, T_gt, cache_cam, CFG)
    assert bool(ok)
    T_bad = T_gt.at[0, 3].add(0.5)  # half-meter lateral error
    ok_bad = filters.dense_verify_filter(c0, c1, T_bad, cache_cam, CFG)
    assert not bool(ok_bad)


def test_full_filter_pipeline(seq, frames_and_keys):
    _, cache, cache_cam, keys = frames_and_keys
    pa_idx = jnp.array([0, 0, 1])
    pb_idx = jnp.array([1, 2, 3])
    m = matcher.match_all_pairs(keys, pa_idx, pb_idx, CFG)
    pa, pb = matcher.gather_match_points(keys, pa_idx, pb_idx, m)
    ca = jax.tree.map(lambda x: x[pa_idx], cache)
    cb = jax.tree.map(lambda x: x[pb_idx], cache)
    res = filters.filter_pairs_batch(
        pa, pb, m, ca, cb, cache_cam, CFG, CFG.min_matches_local
    )
    assert np.asarray(res.pair_valid).all(), np.asarray(res.inlier_count)
    # every filtered transform should be near its GT
    for k, (a, b) in enumerate([(0, 1), (0, 2), (1, 3)]):
        T_gt = np.linalg.inv(seq.poses[b]) @ seq.poses[a]
        ang, dist = se3.pose_distance(jnp.asarray(T_gt), res.transform[k])
        assert float(ang) < np.deg2rad(3.0)
        assert float(dist) < 0.05


def test_sift_fidelity_vs_independent_oracle(frames_and_keys):
    """SURVEY.md §7 hard part 4 / VERDICT r2 item 7: keys, orientations and
    descriptors must agree with an INDEPENDENT reference SIFT (tests/ref_sift
    .py — a slow numpy transcription of Lowe 2004 sharing no code with the
    production implementation), so the reference's matching thresholds
    transfer. Thresholds set ~25% below first measurement (repeatability
    0.81 / precision 0.84, desc cosine median 0.96, orientation 7 deg)."""
    from ref_sift import detect_and_describe_ref

    frames, _, _, keys = frames_and_keys
    img = np.asarray(frames.intensity[0], np.float64)
    ref = detect_and_describe_ref(
        img,
        sigma0=CFG.sift_sigma,
        num_scales=CFG.sift_scales_per_octave,
        num_octaves=CFG.sift_octaves,
        contrast_thresh=CFG.sift_contrast_thresh,
        edge_thresh=CFG.sift_edge_thresh,
        max_keys=CFG.max_keys_per_image,
    )
    v = np.asarray(keys.valid[0])
    xy = np.asarray(keys.xy[0])[v]
    sg = np.asarray(keys.sigma[0])[v]
    th = np.asarray(keys.orientation[0])[v]
    dsc = np.asarray(keys.desc[0])[v]
    assert len(ref["sigma"]) >= 20 and v.sum() >= 20

    def corresp(a_xy, a_sg, b_xy, b_sg):
        d2 = np.linalg.norm(a_xy[:, None] - b_xy[None, :], axis=-1)
        near = np.argmin(d2, axis=1)
        dist = d2[np.arange(len(near)), near]
        sr = a_sg / np.maximum(b_sg[near], 1e-9)
        return near, (dist < 2.0) & (sr > 1 / 1.6) & (sr < 1.6)

    near, ok = corresp(ref["xy"], ref["sigma"], xy, sg)
    recall = ok.mean()  # oracle keys recovered by the production detector
    _, ok_p = corresp(xy, sg, ref["xy"], ref["sigma"])
    precision = ok_p.mean()  # production keys confirmed by the oracle
    assert recall > 0.6, f"key recall vs oracle: {recall:.3f}"
    assert precision > 0.6, f"key precision vs oracle: {precision:.3f}"

    cos = np.sum(ref["desc"][ok] * dsc[near[ok]], axis=-1)
    assert np.median(cos) > 0.8, f"descriptor cosine median {np.median(cos):.3f}"
    assert (cos > 0.7).mean() > 0.8, f"descriptor cosine>0.7 frac {(cos > 0.7).mean():.3f}"

    dth = np.abs(((ref["orientation"][ok] - th[near[ok]]) + np.pi) % (2 * np.pi) - np.pi)
    assert np.degrees(np.median(dth)) < 15.0, f"orientation err {np.degrees(np.median(dth)):.1f} deg"
