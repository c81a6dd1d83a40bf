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
