"""Compute ops: STFT, classical enhancement, SVD denoising, cross-power."""

from specenh.ops.crosspower import ae_co2, cross_power  # noqa: F401
from specenh.ops.enhance import (  # noqa: F401
    bilateral,
    classical_pipeline,
    gaussian_blur,
    mean_subtract,
    morph,
    normalize,
    pipeline_stages,
    quantile_filter,
    rescale,
)
from specenh.ops.stft import (  # noqa: F401
    spectrogram,
    spectrogram_freqs,
    spectrogram_times,
    stft_psd,
)
from specenh.ops.svd import (  # noqa: F401
    compute_signal,
    deflate_top1,
    denoise_signal,
    omega,
)
