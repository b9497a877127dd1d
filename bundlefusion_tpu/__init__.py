"""bundlefusion_tpu — TPU-native, globally consistent RGB-D reconstruction.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
niessner/BundleFusion (see SURVEY.md for the blueprint):

  * ``geometry`` — SE(3)/SO(3), camera model, Kabsch/Umeyama.
  * ``io``       — .sens/TUM/synthetic replayers, PLY out.
  * ``ops``      — frame preprocessing (bilateral filter, normals, caches).
  * ``features`` — batched SIFT, descriptor matching, correspondence filters.
  * ``solver``   — sparse+dense Gauss-Newton bundle adjustment with PCG.
  * ``bundle``   — chunk/keyframe hierarchy, trajectories, relocalization.
  * ``fusion``   — dense-block TSDF integrate/de-integrate, raycast, meshing.
  * ``parallel`` — mesh/shard_map multi-chip execution.
  * ``eval``     — ATE/RPE trajectory metrics.
"""

__version__ = "0.1.0"

import jax as _jax

# TPU matmuls default to bf16 inputs; geometry/solver math (3x3 covariances,
# JtJ blocks, PCG) needs true f32. Make f32 the floor and let throughput-bound
# kernels (descriptor matching, dense-system matmuls) opt into bf16 explicitly
# via precision/preferred_element_type arguments.
_jax.config.update("jax_default_matmul_precision", "float32")

# Persistent compilation cache: the pipeline's fused chunk/global programs are
# large; caching their XLA binaries makes warm starts (tests, repeated bench
# runs, restarted sessions) orders of magnitude cheaper.
import os as _os


def _cpu_platform_forced() -> bool:
    """True when this process runs JAX on the host CPU platform (tests'
    conftest and the multi-chip dryrun force it before importing us). The
    persistent cache must stay OFF there: XLA:CPU AOT entries are pinned with
    compile-machine pseudo-features (+prefer-no-scatter/+prefer-no-gather)
    that never appear in any host's feature list, so every load fails with
    cpu_aot_loader 'machine feature mismatch' spam and a full recompile —
    the cache is pure overhead on CPU, including on the machine that wrote it."""
    if _os.environ.get("JAX_PLATFORMS", "").split(",")[0].strip() == "cpu":
        return True
    try:
        return (_jax.config.jax_platforms or "").split(",")[0].strip() == "cpu"
    except Exception:
        return False


_cache_dir = _os.environ.get("BF_TPU_COMPILE_CACHE", _os.path.join(_os.path.dirname(__file__), "..", ".jax_cache"))
if _cache_dir and _cache_dir != "0" and not _cpu_platform_forced():
    _jax.config.update("jax_compilation_cache_dir", _os.path.abspath(_cache_dir))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from .config import AppConfig, BundlingConfig, Config, tiny_test_config  # noqa: F401
