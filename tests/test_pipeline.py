"""End-to-end pipeline tests (BASELINE configs 3/4 at test scale): full
hierarchical tracking + fusion on a synthetic sequence with GT oracles."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bundlefusion_tpu.bundle import trajectory
from bundlefusion_tpu.bundle.pipeline import BundleFusion, run_sequence
from bundlefusion_tpu.config import tiny_test_config
from bundlefusion_tpu.eval.ate import ate_rmse
from bundlefusion_tpu.io.replayer import Replayer, SyntheticSource
from util import cached_sequence


def test_trajectory_manager_plan():
    ts = trajectory.make_trajectory(16)
    eye = jnp.eye(4)
    moved = eye.at[0, 3].set(0.5)
    # frame 0: integrated at eye, optimized moved -> reintegrate
    ts = trajectory.mark_integrated(ts, jnp.int32(0), eye)
    ts = trajectory.update_optimized(ts, jnp.asarray([0]), moved[None], jnp.asarray([True]))
    # frame 1: integrated, now invalid -> deintegrate only
    ts = trajectory.mark_integrated(ts, jnp.int32(1), eye)
    ts = trajectory.update_optimized(ts, jnp.asarray([1]), eye[None], jnp.asarray([False]))
    # frame 2: integrated, unchanged -> nothing
    ts = trajectory.mark_integrated(ts, jnp.int32(2), eye)
    ts = trajectory.update_optimized(ts, jnp.asarray([2]), eye[None], jnp.asarray([True]))
    plan = trajectory.plan_reintegration(ts, budget=4)
    d = np.asarray(plan.frames)[np.asarray(plan.deint_mask)]
    r = np.asarray(plan.frames)[np.asarray(plan.reint_mask)]
    assert set(d.tolist()) == {0, 1}
    assert set(r.tolist()) == {0}


def test_reintegration_unbounded_history():
    """Frames evicted from the device ring must still be re-integrable: the
    host FrameStore re-uploads them on demand (reference: TrajectoryManager
    corrects ANY past frame over multi-thousand-frame sequences)."""
    seq = cached_sequence(21, width=128, height=96)
    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg, app=dataclasses.replace(cfg.app, history_ring_frames=6)
    )
    rep = Replayer(SyntheticSource(seq), batch_size=4)
    bf, out = run_sequence(rep, cfg, anchor_pose=seq.poses[0])
    # frame 0 left the 6-slot ring long ago (its slot holds a newer frame)
    assert int(bf._ring_frame[0 % bf.history_cap]) != 0
    assert bool(bf.traj.integrated[0])
    old_pose = np.asarray(bf.traj.integrated_pose[0])
    # simulate a late loop-closure correction of frame 0's optimized pose
    shifted = jnp.asarray(old_pose).at[0, 3].add(0.05)
    bf.traj = trajectory.update_optimized(
        bf.traj, jnp.asarray([0]), shifted[None], jnp.asarray([True])
    )
    uploads_before = bf._ring_uploads
    n = bf._service_reintegration(max_rounds=1)
    assert n >= 1
    # frame 0 came back from the host FrameStore
    assert bf._ring_uploads > uploads_before
    new_pose = np.asarray(bf.traj.integrated_pose[0])
    assert np.allclose(new_pose, np.asarray(shifted), atol=1e-6)
    assert bool(bf.traj.integrated[0])


def test_reintegration_restores_invalidated_then_revalidated():
    """De-integration of invalidated frames and integrate-only catch-up when
    they become valid again (the geometry half of revalidation)."""
    seq = cached_sequence(11, width=128, height=96)
    cfg = tiny_test_config()
    rep = Replayer(SyntheticSource(seq), batch_size=3)
    bf, out = run_sequence(rep, cfg, anchor_pose=seq.poses[0])
    assert bool(bf.traj.integrated[2])
    # invalidate frame 2 -> planner should de-integrate it
    bf.traj = bf.traj._replace(opt_valid=bf.traj.opt_valid.at[2].set(False))
    bf._service_reintegration(max_rounds=1)
    assert not bool(bf.traj.integrated[2])
    # revalidate -> planner should integrate it back (integrate-only row)
    bf.traj = bf.traj._replace(opt_valid=bf.traj.opt_valid.at[2].set(True))
    bf._service_reintegration(max_rounds=1)
    assert bool(bf.traj.integrated[2])


def test_steady_state_is_readback_free(monkeypatch):
    """The pipeline's per-chunk loop must never read device data back to the
    host (bundle/pipeline.py's design rule: async dispatch stays saturated,
    and on tunneled TPUs the first readback permanently degrades uploads).
    Canary: count every host materialization of a device array while frames
    stream; finalize()/outputs() may read freely afterwards."""
    import jax._src.array as _ja

    seq = cached_sequence(21, width=128, height=96)
    cfg = tiny_test_config()
    bf = BundleFusion(seq.camera, cfg, anchor_pose=seq.poses[0])

    readbacks: list[str] = []
    orig_array = _ja.ArrayImpl.__array__
    orig_item = _ja.ArrayImpl.item
    orig_get = jax.device_get

    def counted_array(self, *a, **k):
        readbacks.append("__array__")
        return orig_array(self, *a, **k)

    def counted_item(self, *a, **k):
        readbacks.append("item")
        return orig_item(self, *a, **k)

    def counted_get(x):
        readbacks.append("device_get")
        return orig_get(x)

    monkeypatch.setattr(_ja.ArrayImpl, "__array__", counted_array)
    monkeypatch.setattr(_ja.ArrayImpl, "item", counted_item)
    monkeypatch.setattr(jax, "device_get", counted_get)
    for i in range(21):
        bf.push_frame(seq.depth[i], seq.color[i])
    bf.flush()
    assert not readbacks, f"steady state performed host readbacks: {readbacks[:5]}"
    monkeypatch.undo()
    out = bf.outputs()  # finalize: readbacks now expected and fine
    assert out.num_keyframes == 5


@pytest.fixture(scope="module")
def pipeline_run():
    seq = cached_sequence(21, width=128, height=96)
    cfg = tiny_test_config()
    rep = Replayer(SyntheticSource(seq), batch_size=4)
    bf, out = run_sequence(rep, cfg, anchor_pose=seq.poses[0])
    return seq, bf, out


@pytest.mark.slow
def test_pipeline_tracks_sequence(pipeline_run):
    seq, bf, out = pipeline_run
    assert out.num_keyframes == 5
    assert np.asarray(out.valid)[: out.poses.shape[0]].mean() > 0.9
    ate = ate_rmse(out.poses, seq.poses[: len(out.poses)], valid=out.valid)
    assert ate < 0.02, f"ATE {ate*100:.2f} cm"


@pytest.mark.slow
def test_pipeline_builds_volume(pipeline_run):
    seq, bf, out = pipeline_run
    assert int(bf.table.num_active()) > 200
    verts, colors, faces = bf.extract_mesh()
    assert len(verts) > 1000
    from bundlefusion_tpu.io.synthetic import scene_sdf

    d = np.abs(np.asarray(scene_sdf(jnp.asarray(verts))))
    assert np.median(d) < bf.config.app.voxel_size * 1.5


@pytest.mark.slow
def test_pipeline_preview(pipeline_run):
    seq, bf, out = pipeline_run
    img = bf.render_preview(seq.poses[10])
    assert img.shape == (96, 128, 3)
    assert img.std() > 0.02  # non-degenerate image


@pytest.mark.slow
def test_pipeline_handles_corrupt_chunk():
    """Frames with destroyed depth must invalidate their chunk, not crash the
    pipeline, and tracking must recover afterwards (relocalization path)."""
    seq = cached_sequence(21, width=128, height=96)
    cfg = tiny_test_config()
    depth = seq.depth.copy()
    # destroy chunk 2's new frames (9..12): no depth -> no keys -> invalid
    depth[9:13] = 0.0
    src = SyntheticSource(seq._replace(depth=depth))
    rep = Replayer(src, batch_size=4)
    bf, out = run_sequence(rep, cfg, anchor_pose=seq.poses[0])
    valid = np.asarray(out.valid)
    assert not valid[9:13].all(), "corrupt frames should not all be valid"
    # frames before the corruption must still be tracked well
    ate_head = ate_rmse(out.poses[:9], seq.poses[:9], valid=valid[:9])
    assert ate_head < 0.02
    # some later chunk should relocalize against the early keyframes
    assert valid[13:].any(), "pipeline should recover after corrupt chunk"
