"""Determinism tests (SURVEY.md §5 "Race detection"): the reference's float
atomics made runs non-reproducible; this rebuild is bit-deterministic by
construction (segment_sum / sorted merges / fixed-order scatters), which is
what makes golden-testing possible at all."""

import jax
import jax.numpy as jnp
import numpy as np

from bundlefusion_tpu.bundle.chunk import process_chunk
from bundlefusion_tpu.config import tiny_test_config
from bundlefusion_tpu.fusion import blocks, tsdf
from bundlefusion_tpu.io.sensor import ReplaySensor
from bundlefusion_tpu.io.replayer import SyntheticSource
from util import cached_sequence

CFG = tiny_test_config()


def test_chunk_program_bit_deterministic():
    seq = cached_sequence(5, width=64, height=48)
    cam = seq.camera
    cc = cam.scaled(16, 12)
    d = jnp.asarray(seq.depth)
    c = jnp.asarray(seq.color)
    r1 = process_chunk(d, c, cam, cc, CFG.bundling)
    r2 = process_chunk(d, c, cam, cc, CFG.bundling)
    np.testing.assert_array_equal(np.asarray(r1.local_traj), np.asarray(r2.local_traj))
    np.testing.assert_array_equal(
        np.asarray(r1.keyframe_keys.desc), np.asarray(r2.keyframe_keys.desc)
    )


def test_tsdf_integration_bit_deterministic():
    seq = cached_sequence(5, width=64, height=48)
    out = []
    for _ in range(2):
        table = blocks.make_table(2048)
        for i in range(3):
            table, _ = tsdf.integrate(
                table,
                jnp.asarray(seq.depth[i]),
                jnp.asarray(seq.color[i]),
                jnp.asarray(seq.poses[i]),
                seq.camera,
                CFG.app,
            )
        out.append(table)
    np.testing.assert_array_equal(np.asarray(out[0].sdf), np.asarray(out[1].sdf))
    np.testing.assert_array_equal(np.asarray(out[0].keys), np.asarray(out[1].keys))


def test_sensor_protocol_and_recording(tmp_path):
    """RGBDSensor interface: replay adapter + record-to-.sens round trip."""
    from bundlefusion_tpu.io.replayer import SensSource

    seq = cached_sequence(3, width=32, height=24)
    sensor = ReplaySensor(SyntheticSource(seq))
    assert sensor.camera.width == 32
    frames = list(sensor.frames())
    assert len(frames) == 3
    path = str(tmp_path / "rec.sens")
    sensor.record_to(path, poses=seq.poses)
    src = SensSource(path)
    assert len(src) == 3
    d, _ = src.get(2)
    np.testing.assert_allclose(d, seq.depth[2], atol=1e-3)


def test_offline_matching_tool(tmp_path):
    import sys

    sys.path.insert(0, "tools")
    from offline_matching import main

    rc = main(
        ["--synthetic", "4", "--width", "128", "--height", "96",
         "--frames", "0", "1", "--out", str(tmp_path)]
    )
    assert rc == 0
    assert (tmp_path / "matches_filtered.png").exists()
