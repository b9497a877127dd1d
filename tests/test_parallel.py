"""Multi-chip tests on the 8-device simulated CPU mesh (SURVEY.md §4
"distributed without a cluster"): sharded programs must equal their
single-device counterparts bit-for-tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bundlefusion_tpu.config import tiny_test_config
from bundlefusion_tpu.geometry import se3
from bundlefusion_tpu.parallel import mesh as mesh_mod
from bundlefusion_tpu.parallel import multiseq, sharded_ba
from bundlefusion_tpu.solver import gn, residuals, system
from test_solver import make_sparse_problem
from util import cached_sequence

CFG = tiny_test_config().bundling

pytestmark = pytest.mark.multichip


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8
    m = mesh_mod.make_mesh(8)
    assert m.devices.shape == (8,)


def test_pcg_rowsharded_matches_dense(rng):
    n = 96  # 6N divisible by 8
    A = rng.standard_normal((n, n)).astype(np.float32)
    H = A @ A.T + 0.5 * np.eye(n, dtype=np.float32)
    b = rng.standard_normal(n).astype(np.float32)
    m = mesh_mod.make_mesh(8)
    x_sharded = sharded_ba.pcg_solve_rowsharded(m, jnp.asarray(H), jnp.asarray(b), 200)
    x_ref = system.pcg_solve(jnp.asarray(H), jnp.asarray(b), 200).x
    np.testing.assert_allclose(np.asarray(x_sharded), np.asarray(x_ref), atol=5e-3, rtol=5e-3)


def test_sharded_assembly_matches_dense(rng):
    poses_gt, problem = make_sparse_problem(rng, n_images=4, n_corr=96)
    poses = jnp.asarray(poses_gt)
    m = mesh_mod.make_mesh(8)
    H_s, b_s = sharded_ba.assemble_system_sharded(
        m, 4, problem.corrs, poses, problem.free_mask, 1.0
    )
    JtJ, Jtr, _ = residuals.sparse_corr_blocks(poses, problem.corrs, 1.0)
    H_r, b_r = system.assemble_system(
        4, problem.corrs.img_a, problem.corrs.img_b, JtJ, Jtr, problem.free_mask, damping=0.0
    )
    # reference adds 1e-8 diag once; shards add it 8x — compare loosely
    np.testing.assert_allclose(np.asarray(H_s), np.asarray(H_r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(b_s), np.asarray(b_r), atol=1e-5)


def test_global_solve_sharded_recovers_poses(rng):
    poses_gt, problem = make_sparse_problem(rng, n_images=4, n_corr=96)
    xi_noise = (rng.standard_normal((4, 6)) * 0.05).astype(np.float32)
    xi_noise[0] = 0
    init = np.einsum(
        "nij,njk->nik", np.asarray(se3.se3_exp(jnp.asarray(xi_noise))), poses_gt
    )
    m = mesh_mod.make_mesh(8)
    solved = sharded_ba.global_solve_sharded(
        m, jnp.asarray(init), problem.corrs, problem.free_mask, CFG,
        gn_iters=4, pcg_iters=48,
    )
    for i in range(4):
        ang, dist = se3.pose_distance(jnp.asarray(poses_gt[i]), solved[i])
        assert float(dist) < 2e-3, f"pose {i}: {float(dist)}"


@pytest.mark.slow
def test_multiseq_chunk_matches_serial():
    """8 sequences through the sharded chunk step == serial per-sequence runs."""
    from bundlefusion_tpu.bundle.chunk import process_chunk

    n_seq, s1 = 8, 5
    seqs = [cached_sequence(s1, width=64, height=48, seed=i, radius=0.3) for i in range(n_seq)]
    depth = jnp.asarray(np.stack([s.depth for s in seqs]))  # [8, 5, H, W]
    color = jnp.asarray(np.stack([s.color for s in seqs]))
    cam = seqs[0].camera
    cache_cam = cam.scaled(16, 12)
    m = mesh_mod.make_mesh(8)
    fn = multiseq.make_multiseq_chunk_fn(m, cam, cache_cam, CFG)
    trajs, valid = fn(depth, color)
    assert trajs.shape == (8, 5, 4, 4)
    for d in range(0, 8, 3):  # spot-check against the serial program
        res = process_chunk(depth[d], color[d], cam, cache_cam, CFG)
        np.testing.assert_allclose(
            np.asarray(trajs[d]), np.asarray(res.local_traj), atol=1e-4
        )
        assert bool(valid[d]) == bool(res.chunk_valid)


@pytest.mark.slow
def test_timeshard_chunks_match_serial():
    """8 chunks of one sequence processed in parallel (ppermute halo for the
    overlap frame) == the serial chunk-by-chunk results; chained keyframe
    poses track ground truth."""
    from bundlefusion_tpu.bundle.chunk import process_chunk
    from bundlefusion_tpu.eval.ate import ate_rmse
    from bundlefusion_tpu.parallel import timeshard

    S, D = 4, 8
    seq = cached_sequence(D * S + 1, width=64, height=48, radius=0.3)
    cam = seq.camera
    cache_cam = cam.scaled(16, 12)
    m = mesh_mod.make_mesh(D)
    fn = timeshard.make_timeshard_chunk_fn(m, cam, cache_cam, CFG)
    depth = jnp.asarray(seq.depth[: D * S])
    color = jnp.asarray(seq.color[: D * S])
    trajs, valid, kkeys, kcaches = fn(
        depth, color, jnp.asarray(seq.depth[D * S]), jnp.asarray(seq.color[D * S])
    )
    assert trajs.shape == (D, S + 1, 4, 4)
    assert kkeys.valid.shape[0] == D
    # spot-check equivalence with the serial program
    for d in (0, 3, 7):
        ref = process_chunk(
            jnp.asarray(seq.depth[d * S : d * S + S + 1]),
            jnp.asarray(seq.color[d * S : d * S + S + 1]),
            cam, cache_cam, CFG,
        )
        np.testing.assert_allclose(
            np.asarray(trajs[d]), np.asarray(ref.local_traj), atol=1e-4
        )
    # chained keyframe poses vs ground truth
    kf_poses = timeshard.chain_keyframe_poses(np.asarray(trajs), seq.poses[0])
    gt_kf = seq.poses[::S][:D]
    ate = ate_rmse(kf_poses, gt_kf)
    # raw chained odometry at 64x48 drifts (no global BA in this test); the
    # equivalence spot-checks above are the real gate
    assert ate < 0.2, f"time-sharded keyframe ATE {ate*100:.1f} cm"


def test_multiseq_fusion_integrates_per_device():
    """Sharded TSDF: each device fuses its own sequence's frame into its own
    block-table shard."""
    from bundlefusion_tpu.config import tiny_test_config
    from bundlefusion_tpu.fusion import blocks

    APP = tiny_test_config().app
    n = 8
    seqs = [cached_sequence(2, width=64, height=48, seed=i) for i in range(n)]
    cam = seqs[0].camera
    m = mesh_mod.make_mesh(n)
    tables = multiseq.stack_tables([blocks.make_table(2048) for _ in range(n)])
    fn = multiseq.make_multiseq_fusion_fn(m, cam, APP)
    depth = jnp.asarray(np.stack([s.depth[0] for s in seqs]))
    color = jnp.asarray(np.stack([s.color[0] for s in seqs]))
    poses = jnp.asarray(np.stack([s.poses[0] for s in seqs]))
    tables = fn(tables, depth, color, poses)
    active = np.asarray(jax.vmap(lambda t: t.num_active())(tables))
    assert (active > 50).all(), active


def test_run_sequences_sharded_matches_serial():
    """The end-to-end multi-sequence SPMD driver (BASELINE config 5): 8
    sequences on the 8-device mesh must reproduce the serial pipeline's
    trajectories per sequence."""
    from bundlefusion_tpu.bundle.pipeline import run_sequence
    from bundlefusion_tpu.config import tiny_test_config
    from bundlefusion_tpu.eval.ate import ate_rmse
    from bundlefusion_tpu.io.replayer import Replayer, SyntheticSource
    from bundlefusion_tpu.parallel.spmd_pipeline import (
        extract_mesh_for,
        run_sequences_sharded,
    )

    cfg = tiny_test_config()
    seqs = [cached_sequence(21, width=128, height=96, seed=s % 2) for s in range(8)]
    m = mesh_mod.make_mesh(8)
    out = run_sequences_sharded(
        seqs, m, cfg, anchor_poses=np.stack([s.poses[0] for s in seqs])
    )
    assert out.poses.shape[0] == 8
    # serial references for the two distinct scenes
    for i in (0, 1):
        rep = Replayer(SyntheticSource(seqs[i]), batch_size=8)
        bf, ser = run_sequence(rep, cfg, anchor_pose=seqs[i].poses[0])
        n = min(out.poses.shape[1], len(ser.poses))
        sharded_ate = ate_rmse(out.poses[i, :n], seqs[i].poses[:n], valid=out.valid[i, :n])
        serial_ate = ate_rmse(ser.poses[:n], seqs[i].poses[:n], valid=ser.valid[:n])
        assert abs(sharded_ate - serial_ate) < 2e-3, (i, sharded_ate, serial_ate)
        # trajectories agree pose-by-pose where both are valid
        both = out.valid[i, :n] & ser.valid[:n]
        np.testing.assert_allclose(
            out.poses[i, :n][both], ser.poses[:n][both], atol=5e-3
        )
    verts, _, _ = extract_mesh_for(out, 0, cfg)
    assert len(verts) > 500


def test_global_solve_sharded_matches_serial():
    """The product multi-chip global BA (pruning + dense hooks) must agree
    with the single-device global_solve on the same keyframe graph."""
    import dataclasses

    from bundlefusion_tpu.bundle import global_graph
    from bundlefusion_tpu.bundle.pipeline import run_sequence
    from bundlefusion_tpu.config import Config
    from bundlefusion_tpu.io.replayer import Replayer, SyntheticSource

    base = tiny_test_config()
    # keyframe capacity must make 6N divisible by 8 for the row-sharded PCG
    cfg = Config(
        app=base.app,
        bundling=dataclasses.replace(base.bundling, max_num_images=32),
    )
    seq = cached_sequence(21, width=128, height=96)
    rep = Replayer(SyntheticSource(seq), batch_size=8)
    bf, _ = run_sequence(rep, cfg, anchor_pose=seq.poses[0])
    graph = bf.graph
    cam = bf.cache_cam
    m = mesh_mod.make_mesh(8)
    g_serial, _, _ = global_graph.global_solve(graph, cam, cfg.bundling)
    g_sharded, _ = global_graph.global_solve_sharded(graph, m, cam, cfg.bundling)
    np.testing.assert_allclose(
        np.asarray(g_sharded.poses), np.asarray(g_serial.poses), atol=1e-3
    )
    np.testing.assert_array_equal(
        np.asarray(g_sharded.valid), np.asarray(g_serial.valid)
    )


def test_run_sequences_sharded_is_readback_free(monkeypatch):
    """VERDICT r2 weak #6: the config-5 SPMD driver must match the serial
    pipeline's zero-readback steady state — per-chunk control flow lives on
    device; the only host materializations are the final output fetch."""
    import jax._src.array as _ja

    from bundlefusion_tpu.parallel.spmd_pipeline import run_sequences_sharded

    cfg = tiny_test_config()
    seqs = [cached_sequence(13, width=128, height=96, seed=s % 2) for s in range(8)]
    m = mesh_mod.make_mesh(8)

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
    out = run_sequences_sharded(
        seqs, m, cfg, anchor_poses=np.stack([s.poses[0] for s in seqs])
    )
    monkeypatch.undo()
    # exactly the 3 documented end-of-run fetches (poses, valid, runlogs)
    assert readbacks == ["__array__"] * 3, f"per-chunk readbacks: {readbacks}"
    assert out.poses.shape[0] == 8
    assert out.valid[:, :9].mean() > 0.8
