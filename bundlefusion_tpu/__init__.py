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

from .config import AppConfig, BundlingConfig, Config, tiny_test_config  # noqa: F401
