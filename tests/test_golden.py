"""Golden per-stage regression tests (SURVEY.md §4 golden row; VERDICT r2
item 10). Determinism tests prove run-to-run stability; these pin results
ACROSS CODE CHANGES: per-stage outputs of the tiny config recorded once to
``tests/goldens/tiny.npz`` and asserted against on every run.

Regenerate deliberately after an intentional algorithm change:

    BF_REGEN_GOLDENS=1 python -m pytest tests/test_golden.py -q

Counts and masks are exact; float arrays use tight tolerances (1e-5) so a
same-math refactor passes but a numerics change trips.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from bundlefusion_tpu.config import tiny_test_config
from bundlefusion_tpu.io.replayer import Replayer, SyntheticSource
from util import cached_sequence

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens", "tiny.npz")


def _compute_stage_outputs():
    from bundlefusion_tpu.bundle.pipeline import run_sequence
    from bundlefusion_tpu.features import sift
    from bundlefusion_tpu.ops.preprocess import preprocess_frames

    seq = cached_sequence(21, width=128, height=96)
    cfg = tiny_test_config()

    # stage: preprocessing + SIFT on the first chunk
    cache_cam = seq.camera.scaled(cfg.bundling.cache_width, cfg.bundling.cache_height)
    frames, cache = preprocess_frames(
        jnp.asarray(seq.depth[:5]), jnp.asarray(seq.color[:5]), seq.camera, cache_cam
    )
    keys = sift.detect_batch(frames.intensity, frames.depth, seq.camera, cfg.bundling)

    # stage: full pipeline
    rep = Replayer(SyntheticSource(seq), batch_size=8)
    bf, out = run_sequence(rep, cfg, anchor_pose=seq.poses[0])

    return {
        "num_keys": np.asarray(keys.valid).sum(axis=1).astype(np.int64),
        "key_xy_f0": np.asarray(keys.xy[0])[np.asarray(keys.valid[0])],
        "desc_f0_sum": np.asarray(keys.desc[0]).sum(axis=1),
        "poses": np.asarray(out.poses, np.float32),
        "valid": np.asarray(out.valid),
        "runlog": np.asarray(bf._runlog_dev[: bf.chunk_count], np.float32),
        "tsdf_weight_sum": np.asarray(jnp.sum(bf.table.weight), np.float32).reshape(1),
        "tsdf_active": np.asarray(bf.table.num_active(), np.int64).reshape(1),
        "block_keys_hash": np.asarray(
            np.uint64(
                np.bitwise_xor.reduce(
                    np.sort(np.asarray(bf.table.keys, np.int64))
                    * np.arange(1, bf.table.capacity + 1, dtype=np.int64)
                )
                & np.int64(0x7FFFFFFFFFFFFFFF)
            )
        ).reshape(1),
    }


def test_golden_stages():
    got = _compute_stage_outputs()
    if os.environ.get("BF_REGEN_GOLDENS") or not os.path.exists(GOLDEN_PATH):
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        np.savez_compressed(GOLDEN_PATH, **got)
        if not os.environ.get("BF_REGEN_GOLDENS"):
            pytest.skip("golden recorded (first run); commit tests/goldens/tiny.npz")
        return
    want = np.load(GOLDEN_PATH)
    assert set(want.files) == set(got.keys())
    # exact: integers, masks, diagnostics counters, block-set hash
    for k in ("num_keys", "valid", "tsdf_active", "block_keys_hash"):
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)
    np.testing.assert_array_equal(got["runlog"], want["runlog"], err_msg="runlog")
    # float stages: tight tolerance (same-math refactors pass)
    np.testing.assert_allclose(got["key_xy_f0"], want["key_xy_f0"], atol=1e-4, err_msg="key_xy")
    np.testing.assert_allclose(got["desc_f0_sum"], want["desc_f0_sum"], atol=1e-4, err_msg="desc")
    np.testing.assert_allclose(got["poses"], want["poses"], atol=1e-5, err_msg="poses")
    np.testing.assert_allclose(
        got["tsdf_weight_sum"], want["tsdf_weight_sum"], rtol=1e-6, err_msg="weight_sum"
    )
