"""Shared test helpers: cached synthetic sequences (rendering is the slow part)."""

import functools

from bundlefusion_tpu.io.synthetic import SyntheticSequence, generate_sequence


@functools.lru_cache(maxsize=8)
def cached_sequence(num_frames: int, width: int = 48, height: int = 32, seed: int = 0,
                    radius: float = 0.35) -> SyntheticSequence:
    return generate_sequence(num_frames, width=width, height=height, seed=seed, radius=radius)
