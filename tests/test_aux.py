"""Tests for auxiliary subsystems: streaming, checkpoint/resume,
visualization, CLI app, timing/logging (SURVEY.md §5)."""

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bundlefusion_tpu.config import tiny_test_config
from bundlefusion_tpu.fusion import blocks, streaming, tsdf
from util import cached_sequence

APP = tiny_test_config().app


def _fused_table(n_frames=6):
    seq = cached_sequence(8, width=64, height=48)
    table = blocks.make_table(APP.block_capacity)
    for i in range(n_frames):
        table, _ = tsdf.integrate(
            table,
            jnp.asarray(seq.depth[i]),
            jnp.asarray(seq.color[i]),
            jnp.asarray(seq.poses[i]),
            seq.camera,
            APP,
        )
    return seq, table


def test_stream_out_in_roundtrip():
    seq, table = _fused_table()
    cfg = dataclasses.replace(APP, streaming_radius=1.0)
    cam_pos = seq.poses[0][:3, 3]
    n0 = int(table.num_active())
    sdf_sum0 = float(jnp.sum(jnp.abs(table.sdf)))
    store = streaming.HostBlockStore()
    t1, n_out = streaming.stream_out(table, store, cam_pos, cfg)
    assert n_out > 0 and len(store) == n_out
    assert int(t1.num_active()) == n0 - n_out
    # camera "returns": everything within a huge radius comes back
    cfg2 = dataclasses.replace(APP, streaming_radius=100.0)
    t2, n_in = streaming.stream_in(t1, store, cam_pos, cfg2)
    assert n_in == n_out and len(store) == 0
    assert int(t2.num_active()) == n0
    np.testing.assert_allclose(float(jnp.sum(jnp.abs(t2.sdf))), sdf_sum0, rtol=1e-6)


def test_checkpoint_resume(tmp_path):
    from bundlefusion_tpu.bundle.checkpoint import load_checkpoint, save_checkpoint
    from bundlefusion_tpu.bundle.pipeline import BundleFusion

    seq = cached_sequence(21, width=128, height=96)
    cfg = tiny_test_config()
    bf = BundleFusion(seq.camera, cfg, anchor_pose=seq.poses[0])
    for i in range(11):
        bf.push_frame(seq.depth[i], seq.color[i])
    path = str(tmp_path / "ckpt.pkl")
    save_checkpoint(bf, path)
    bf2 = load_checkpoint(path)
    assert bf2.chunk_count == bf.chunk_count
    np.testing.assert_array_equal(np.asarray(bf2.graph.poses), np.asarray(bf.graph.poses))
    np.testing.assert_array_equal(np.asarray(bf2.table.keys), np.asarray(bf.table.keys))
    # resumed pipeline keeps processing (sync drains the async ingest stage
    # so chunk_count is coherent on this thread)
    for i in range(11, 21):
        bf2.push_frame(seq.depth[i], seq.color[i])
    bf2.sync()
    assert bf2.chunk_count > bf.chunk_count


def test_visualization_dumpers(tmp_path):
    from bundlefusion_tpu import visualization as viz
    from bundlefusion_tpu.config import tiny_test_config
    from bundlefusion_tpu.features import matcher, sift
    from bundlefusion_tpu.ops.preprocess import preprocess_frames

    seq = cached_sequence(4, width=128, height=96)
    cfg = tiny_test_config().bundling
    frames, _ = preprocess_frames(
        jnp.asarray(seq.depth[:2]), jnp.asarray(seq.color[:2]), seq.camera,
        seq.camera.scaled(32, 24),
    )
    keys = sift.detect_batch(frames.intensity, frames.depth, seq.camera, cfg)
    k0 = jax.tree.map(lambda x: x[0], keys)
    k1 = jax.tree.map(lambda x: x[1], keys)
    m = matcher.match_pair(k0, k1, cfg)
    p1 = viz.save_keypoint_image(str(tmp_path / "keys.png"), seq.color[0], k0)
    p2 = viz.save_match_image(str(tmp_path / "matches.png"), seq.color[0], seq.color[1], k0, k1, m)
    assert os.path.getsize(p1) > 0 and os.path.getsize(p2) > 0


@pytest.mark.slow
def test_app_cli_synthetic(tmp_path):
    from bundlefusion_tpu.app import main
    from bundlefusion_tpu.config import tiny_test_config

    cfgdir = tmp_path / "cfg"
    cfgdir.mkdir()
    cfg = tiny_test_config()
    (cfgdir / "app.json").write_text(json.dumps(dataclasses.asdict(cfg.app)))
    (cfgdir / "bundling.json").write_text(json.dumps(dataclasses.asdict(cfg.bundling)))
    out = tmp_path / "out"
    rc = main(
        [
            "--synthetic", "11",
            "--width", "128", "--height", "96",
            "--app-config", str(cfgdir / "app.json"),
            "--bundling-config", str(cfgdir / "bundling.json"),
            "--out", str(out),
            "--checkpoint-every", "1",
        ]
    )
    assert rc == 0
    summary = json.loads((out / "summary.json").read_text())
    assert summary["frames"] >= 11
    assert summary["ate_rmse_m"] < 0.05
    assert (out / "mesh.ply").stat().st_size > 1000
    assert (out / "trajectory.txt").read_text().count("\n") >= 10
    assert (out / "checkpoint.pkl").exists()
    assert (out / "run.jsonl").read_text().count("\n") >= 2


def test_timing_and_runlog(tmp_path):
    from bundlefusion_tpu.utils.logging import RunLog
    from bundlefusion_tpu.utils.timing import TimingLog

    t = TimingLog()
    with t.stage("x"):
        pass
    with t.stage("x"):
        pass
    assert t.summary()["x"]["count"] == 2
    assert "x" in t.report()
    log = RunLog(str(tmp_path / "log.jsonl"))
    log.log(a=1, b=np.float32(2.5))
    log.close()
    rec = json.loads((tmp_path / "log.jsonl").read_text())
    assert rec == {"a": 1, "b": 2.5}


@pytest.mark.slow
def test_pipeline_with_streaming(tmp_path):
    """Config-5 path: streaming enabled with a tight radius evicts far blocks
    to the host store while tracking and meshing keep working."""
    from bundlefusion_tpu.bundle.pipeline import run_sequence
    from bundlefusion_tpu.config import Config, tiny_test_config
    from bundlefusion_tpu.eval.ate import ate_rmse
    from bundlefusion_tpu.io.replayer import Replayer, SyntheticSource

    base = tiny_test_config()
    cfg = Config(
        app=dataclasses.replace(
            base.app,
            streaming_enabled=True,
            streaming_radius=2.2,
            streaming_watermark=0.0,  # stream by radius regardless of occupancy
            streaming_check_every=1,
        ),
        bundling=base.bundling,
    )
    seq = cached_sequence(21, width=128, height=96)
    rep = Replayer(SyntheticSource(seq), batch_size=8)
    bf, out = run_sequence(rep, cfg, anchor_pose=seq.poses[0])
    n = min(len(out.poses), len(seq.poses))
    assert ate_rmse(out.poses[:n], seq.poses[:n], valid=out.valid[:n]) < 0.02
    # far scene parts (back wall ~3.5 m away) must have been streamed out
    assert len(bf.block_store) > 0, "tight radius should evict far blocks"
    verts, _, _ = bf.extract_mesh()
    assert len(verts) > 500


@pytest.mark.slow
def test_app_cli_sens_input(tmp_path):
    """The --sens CLI route end to end on a recorded synthetic sequence."""
    from bundlefusion_tpu.app import main
    from bundlefusion_tpu.config import tiny_test_config
    from bundlefusion_tpu.io import sens

    seq = cached_sequence(11, width=128, height=96)
    path = str(tmp_path / "synth.sens")
    sens.write_sens(path, seq.depth, seq.color, seq.poses, seq.camera)
    cfg = tiny_test_config()
    cfgdir = tmp_path / "cfg"
    cfgdir.mkdir()
    (cfgdir / "app.json").write_text(json.dumps(dataclasses.asdict(cfg.app)))
    (cfgdir / "bundling.json").write_text(json.dumps(dataclasses.asdict(cfg.bundling)))
    out = tmp_path / "out"
    rc = main([
        "--sens", path,
        "--app-config", str(cfgdir / "app.json"),
        "--bundling-config", str(cfgdir / "bundling.json"),
        "--out", str(out), "--no-mesh",
    ])
    assert rc == 0
    summary = json.loads((out / "summary.json").read_text())
    assert summary["frames"] >= 11
    assert summary["ate_rmse_m"] < 0.05  # GT poses came from the .sens header


@pytest.mark.slow
def test_streaming_multiroom_out_of_core():
    """BASELINE config-5 scale: the camera walks a multi-room corridor whose
    total block count exceeds the device pool; streaming pages cold rooms to
    the host, tracking survives, and the final mesh covers every room."""
    from bundlefusion_tpu.bundle.pipeline import run_sequence
    from bundlefusion_tpu.config import Config, tiny_test_config
    from bundlefusion_tpu.io.replayer import Replayer, SyntheticSource
    from bundlefusion_tpu.io.synthetic import generate_corridor_sequence

    base = tiny_test_config()
    cfg = Config(
        app=dataclasses.replace(
            base.app,
            streaming_enabled=True,
            streaming_radius=1.8,
            streaming_watermark=0.3,
            streaming_check_every=1,
            block_capacity=2048,
        ),
        bundling=base.bundling,
    )
    seq = generate_corridor_sequence(81, width=128, height=96, x_span=2.5)
    rep = Replayer(SyntheticSource(seq), batch_size=8)
    bf, out = run_sequence(rep, cfg, anchor_pose=seq.poses[0])
    assert out.tracking_lost_chunks == 0
    device_blocks = int(bf.table.num_active())
    host_blocks = len(bf.block_store)
    assert host_blocks > 0, "cold rooms must be streamed to the host"
    assert device_blocks + host_blocks > cfg.app.block_capacity, (
        "scene must exceed the device pool for this test to mean anything"
    )
    verts, _, _ = bf.extract_mesh()
    # mesh must span the whole walked corridor (start room through end room)
    assert verts[:, 0].min() < 0.3 and verts[:, 0].max() > 2.5 + 1.0


@pytest.mark.slow
def test_pipeline_on_kinect_noise():
    """SURVEY.md §7 hard part 4: thresholds must survive Kinect-style sensor
    statistics (axial/lateral noise, disparity quantization, edge dropout,
    exposure drift), not just exact renders."""
    from bundlefusion_tpu.bundle.pipeline import run_sequence
    from bundlefusion_tpu.config import tiny_test_config
    from bundlefusion_tpu.eval.ate import ate_rmse
    from bundlefusion_tpu.io.replayer import Replayer, SyntheticSource
    from bundlefusion_tpu.io.synthetic import apply_sensor_noise, generate_sequence

    seq = apply_sensor_noise(generate_sequence(21, width=128, height=96, radius=0.35))
    rep = Replayer(SyntheticSource(seq), batch_size=8)
    bf, out = run_sequence(rep, tiny_test_config(), anchor_pose=seq.poses[0])
    assert out.tracking_lost_chunks == 0
    n = min(len(out.poses), len(seq.poses))
    ate = ate_rmse(out.poses[:n], seq.poses[:n], valid=out.valid[:n])
    assert ate < 0.02, f"noisy-sensor ATE {ate*100:.2f} cm"


@pytest.mark.slow
@pytest.mark.skipif(
    not os.environ.get("BF_SOAK"), reason="2k-frame soak: set BF_SOAK=1 (VERDICT r2 item 8)"
)
def test_soak_2k_frames_bounded_memory():
    """Long-sequence soak (SURVEY §6 demo scale is 3.5k-8.6k frames): 2,048
    frames down a multi-room corridor with streaming on and a ring much
    smaller than the sequence. Asserts the capacity invariants that only
    sustained growth exercises: bounded device blocks, ring-spill service at
    finalize, stable ATE, and a live (non-collapsed) correspondence buffer."""
    from bundlefusion_tpu.bundle.pipeline import run_sequence
    from bundlefusion_tpu.config import Config, tiny_test_config
    from bundlefusion_tpu.eval.ate import ate_rmse
    from bundlefusion_tpu.io.replayer import Replayer, SyntheticSource
    from bundlefusion_tpu.io.synthetic import generate_corridor_sequence

    n = 2048
    base = tiny_test_config()
    cfg = Config(
        app=dataclasses.replace(
            base.app,
            streaming_enabled=True,
            streaming_radius=1.8,
            streaming_watermark=0.5,
            streaming_check_every=4,
            block_capacity=4096,
            history_ring_frames=256,  # << n: forces ring spill + deferral
            gc_every_chunks=8,
            # a 9 m corridor needs a long-range sensor: the default 4.0 m
            # Kinect ceiling (now enforced at ingest, reference semantics)
            # would invalidate most of each forward-looking frame. >4.095 m
            # also disables the 12-bit depth pack, so this soak covers the
            # uint16 wire path.
            depth_max=10.0,
        ),
        bundling=dataclasses.replace(
            base.bundling,
            max_frames=4096,
            max_num_images=512,
        ),
    )
    seq = generate_corridor_sequence(
        n, width=128, height=96, x_span=9.0, out_and_back=True
    )
    rep = Replayer(SyntheticSource(seq), batch_size=32)
    bf, out = run_sequence(rep, cfg, anchor_pose=seq.poses[0])

    from bundlefusion_tpu.bundle.pipeline import RUNREC_FIELDS

    rows = np.asarray(bf._runlog_dev[: bf.chunk_count])
    cols = {k: i for i, k in enumerate(RUNREC_FIELDS)}
    # bounded device residency: the pool never exceeds capacity and streaming
    # actually paged blocks out
    assert int(bf.table.num_active()) <= cfg.app.block_capacity
    assert len(bf.block_store) > 0, "sustained growth must engage streaming"
    # ring spill happened (2,048 frames through a 256-slot ring) and was
    # SERVICED by finalize, not lost. Residency-aware planning (VERDICT r2
    # weak #4) deliberately keeps spilled frames OUT of the mid-run budget
    # (ring_miss counts only budget-unfilled spill picks, normally 0), so the
    # spill observable is finalize's re-upload count — those frames were not
    # ring-resident when serviced — plus a drained backlog afterwards.
    assert bf._ring_uploads > 0, "finalize must re-upload spilled frames"
    from bundlefusion_tpu.bundle import trajectory

    plan = trajectory.plan_reintegration(
        bf.traj, 64,
        rot_thresh=cfg.app.reint_rot_thresh,
        trans_thresh=cfg.app.reint_trans_thresh,
        exclude_from=jnp.int32(bf.num_frames),
    )
    assert not bool(np.asarray(plan.deint_mask | plan.reint_mask).any()), (
        "finalize service must drain the re-integration backlog"
    )
    # correspondence buffer survived hundreds of keyframes (fair eviction, no
    # collapse): the cursor keeps moving in the final quarter of the run
    tail = rows[-len(rows) // 4 :, cols["corr_cursor"]]
    assert tail.max() > 0 and len(np.unique(tail)) > 1
    # tracking quality: most frames valid, ATE bounded on the walked path
    nn = min(len(out.poses), len(seq.poses))
    valid_frac = out.valid[:nn].mean()
    ate = ate_rmse(out.poses[:nn], seq.poses[:nn], valid=out.valid[:nn])
    assert valid_frac > 0.85, f"valid fraction {valid_frac:.3f}"
    assert ate < 0.06, f"soak ATE {ate*100:.2f} cm"
