"""Loop closure / relocalization behavior (SURVEY.md §0.1: every new keyframe
is matched against ALL previous keyframes — that one mechanism is both loop
closure and relocalization)."""

import numpy as np
import pytest

from bundlefusion_tpu.bundle.pipeline import run_sequence
from bundlefusion_tpu.config import tiny_test_config
from bundlefusion_tpu.eval.ate import ate_rmse
from bundlefusion_tpu.io.replayer import Replayer, SyntheticSource
from bundlefusion_tpu.io.synthetic import SyntheticSequence, generate_sequence, orbit_poses


def _out_and_back_sequence(num_frames=41, width=128, height=96):
    """Camera sweeps away and returns to (almost) the start pose — the final
    chunk should close the loop against the earliest keyframes."""
    import functools

    import jax
    import jax.numpy as jnp

    from bundlefusion_tpu.geometry.camera import CameraModel
    from bundlefusion_tpu.io.synthetic import render_frame

    fx = 0.9 * width
    cam = CameraModel.create(fx, fx, (width - 1) / 2, (height - 1) / 2, width, height)
    base = orbit_poses(num_frames, radius=0.45, seed=3)
    # out-and-back: mirror the second half back over the first half's poses
    half = num_frames // 2
    poses = np.concatenate([base[: half + 1], base[half - 1 :: -1]])[:num_frames]
    intr = jnp.array([cam.fx, cam.fy, cam.cx, cam.cy], jnp.float32)
    render = jax.jit(jax.vmap(lambda T: render_frame(T, width, height, intr)))
    depth, color = render(jnp.asarray(poses))
    return SyntheticSequence(
        depth=np.asarray(depth),
        color=np.asarray(color),
        poses=poses.astype(np.float32),
        camera=cam,
        timestamps=np.arange(num_frames) / 30.0,
    )


@pytest.mark.slow
def test_loop_closure_creates_nonadjacent_correspondences():
    seq = _out_and_back_sequence()
    cfg = tiny_test_config()
    rep = Replayer(SyntheticSource(seq), batch_size=8)
    bf, out = run_sequence(rep, cfg, anchor_pose=seq.poses[0])

    corrs = bf.graph.corrs
    w = np.asarray(corrs.weight) > 0
    gap = np.abs(np.asarray(corrs.img_a) - np.asarray(corrs.img_b))
    loop_corrs = int((w & (gap >= 3)).sum())
    assert loop_corrs > 0, "returning camera should match early keyframes"

    n = min(len(out.poses), len(seq.poses))
    ate = ate_rmse(out.poses[:n], seq.poses[:n], valid=out.valid[:n])
    assert ate < 0.03, f"out-and-back ATE {ate*100:.2f} cm"


@pytest.mark.slow
def test_relocalization_after_teleport():
    """Hard cut: the camera teleports into previously-mapped territory after a
    blackout chunk. The pipeline must (a) invalidate the blackout, (b) place
    the post-cut keyframe via global matching (relocalization), (c) keep the
    post-cut trajectory consistent with GT."""
    seq = _out_and_back_sequence(num_frames=41)
    cfg = tiny_test_config()
    depth = seq.depth.copy()
    depth[20:24] = 0.0  # blackout breaks the odometry chain mid-sequence
    rep = Replayer(SyntheticSource(seq._replace(depth=depth)), batch_size=8)
    bf, out = run_sequence(rep, cfg, anchor_pose=seq.poses[0])
    valid = np.asarray(out.valid)
    assert not valid[20:24].all()
    assert valid[28:40].any(), "should relocalize after the blackout"
    # relocalized segment must be metrically consistent with GT
    n = min(len(out.poses), len(seq.poses))
    sel = valid[:n].copy()
    sel[:28] = False
    if sel.sum() >= 3:
        ate_tail = ate_rmse(out.poses[:n], seq.poses[:n], valid=sel)
        assert ate_tail < 0.04, f"post-relocalization ATE {ate_tail*100:.2f} cm"


@pytest.mark.slow
def test_dense_global_ba_tightens_loop():
    """s_useGlobalDenseOpt analog: enabling dense terms in the global solve
    must append dense keyframe pairs and not degrade (typically tighten) the
    out-and-back loop-closure ATE vs sparse-only."""
    import dataclasses

    from bundlefusion_tpu.config import Config

    seq = _out_and_back_sequence()
    ates = {}
    for dg in (False, True):
        base = tiny_test_config()
        cfg = Config(
            app=base.app,
            bundling=dataclasses.replace(base.bundling, use_dense_global=dg),
        )
        rep = Replayer(SyntheticSource(seq), batch_size=8)
        bf, out = run_sequence(rep, cfg, anchor_pose=seq.poses[0])
        n = min(len(out.poses), len(seq.poses))
        ates[dg] = ate_rmse(out.poses[:n], seq.poses[:n], valid=out.valid[:n])
        assert out.tracking_lost_chunks == 0
        if dg:
            assert int(bf.graph.dense_cursor) > 0, "dense pairs should accumulate"
    assert ates[True] < 0.02
    # dense refinement must not blow up the sparse solution
    assert ates[True] <= ates[False] * 1.10 + 1e-4, ates


@pytest.mark.slow
def test_revalidation_recovers_invalidated_chunk():
    """SURVEY.md §0 item 4: frames invalidated after the fact are
    de-integrated; once the keyframe re-links (relocalization/revalidation),
    the trajectory manager's integrate-only class restores their geometry."""
    import jax.numpy as jnp

    from bundlefusion_tpu.bundle.pipeline import BundleFusion

    seq = generate_sequence(21, width=128, height=96, radius=0.35)
    cfg = tiny_test_config()
    bf = BundleFusion(seq.camera, cfg, anchor_pose=seq.poses[0])
    for i in range(21):
        bf.push_frame(seq.depth[i], seq.color[i])
    bf.flush()
    S = bf.S
    k = 2  # victim keyframe; its chunk spans frames [2S, 3S]; the overlap
    # frames 2S and 3S are shared with the (still-valid) neighbor chunks and
    # legitimately stay integrated — only the exclusive interior de-integrates
    frames = np.arange(2 * S + 1, 3 * S)
    assert bool(np.asarray(bf.traj.integrated)[frames].all())

    # post-opt invalidation (as max-residual pruning does): keyframe drops out
    bf.graph = bf.graph._replace(valid=bf.graph.valid.at[k].set(False))
    bf._publish_trajectory()
    bf._service_reintegration()
    integ = np.asarray(bf.traj.integrated)[frames]
    assert not integ.any(), f"invalidated frames must be de-integrated: {integ}"

    # relocalization aftermath: revalidate stale keyframes, re-publish, drain
    n_re = bf._revalidate_stale()
    assert n_re >= 1, "stale keyframe should re-link against the graph"
    assert bool(bf.graph.valid[k])
    bf._publish_trajectory()
    bf._service_reintegration()
    integ = np.asarray(bf.traj.integrated)[frames]
    assert integ.all(), f"revalidated frames must be re-integrated: {integ}"
