"""specenh — TPU-native plasma spectrogram-enhancement framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
PlasmaControl/spectrogram-enhancement: STFT spectrograms, the classical
denoising pipeline, SVD low-rank denoising, convolutional denoising
autoencoders with training/sweeps, dataset storage, benchmarking, and
visualisation — designed for TPU (MXU matmuls, static shapes, sharding over
device meshes) rather than translated from the reference's SciPy/OpenCV/Keras
CPU code.
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: CLI commands are separate processes and
# the service/campaign programs take 10s-minutes to compile cold; caching
# them on disk makes every process after the first start fast.  Opt out
# with SPECENH_NO_COMPILE_CACHE=1.
import os as _os

if _os.environ.get("SPECENH_NO_COMPILE_CACHE") != "1":
    try:
        import jax as _jax

        _cache = _os.environ.get(
            "SPECENH_COMPILE_CACHE", _os.path.expanduser("~/.cache/specenh-jax")
        )
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

from specenh.config import (  # noqa: F401
    Config,
    ModelConfig,
    PatchSpec,
    PathConfig,
    PipelineConfig,
    SpecParams,
    SweepConfig,
    TrainConfig,
)
