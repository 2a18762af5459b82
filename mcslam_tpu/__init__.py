"""mcslam_tpu — TPU-native multi-camera visual-inertial-GPS SLAM framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the C++ MC-SLAM
reference system (multi-camera ORB front end, cross-camera intra-matching,
multi-view triangulation, robust pose estimation, sliding-window bundle
adjustment, IMU preintegration, GPS fusion, loop closure, relocalization).

Design principles (TPU-first, not a port):
  * the camera rig axis is a batch dimension, not a thread pool;
  * descriptor matching is popcount matmul on the MXU, not BoW bucket walks;
  * RANSAC is a fixed batch of vectorized hypotheses, not a data-dependent loop;
  * bundle adjustment is batched Levenberg-Marquardt with dense Schur
    complement in XLA, not ISAM2;
  * all shapes are static; variable-size sets are padded SoA pools with masks.
"""

import os as _os

import jax as _jax

# Geometry (poses, triangulation, bundle adjustment) cannot tolerate the TPU
# default bf16 matmul precision; default the whole library to float32 matmuls.
# Throughput-critical kernels (descriptor popcount matmuls, image ops) request
# lower precision explicitly where it is safe.
_jax.config.update("jax_default_matmul_precision", "float32")

# TPU compiles for this pipeline are expensive (remote-compile setups pay
# minutes per program); persist compiled executables across processes.
if not _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    _cache = _os.path.join(
        _os.path.expanduser("~"), ".cache", "mcslam_tpu_jax_cache"
    )
    _os.makedirs(_cache, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

__version__ = "0.1.0"

# Lazy top-level re-exports of the main user entry points (PEP 562): kept
# lazy so `import mcslam_tpu` stays cheap for tools that only need config
# parsing or IO, while `from mcslam_tpu import MultiCameraSLAM` works as
# the README shows.
_EXPORTS = {
    "MultiCameraSLAM": "mcslam_tpu.slam",
    "SlamConfig": "mcslam_tpu.slam",
    "build_frame": "mcslam_tpu.frontend.frame",
    "CameraRig": "mcslam_tpu.geometry.camera",
    "load_kalibr": "mcslam_tpu.data.calib",
    "load_euroc_rig": "mcslam_tpu.data.euroc",
    "ate_rmse": "mcslam_tpu.utils.metrics",
}


def __getattr__(name):
    target = _EXPORTS.get(name)
    if target is None:
        raise AttributeError(f"module 'mcslam_tpu' has no attribute {name!r}")
    import importlib

    return getattr(importlib.import_module(target), name)


def __dir__():
    return sorted(list(globals()) + list(_EXPORTS))
