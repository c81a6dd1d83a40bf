"""Configuration tree for the TPU-native spectrogram-enhancement framework.

The reference repository (PlasmaControl/spectrogram-enhancement) has no formal
config system: `argparse` is imported in six files but never used, and the
actual configuration is a ``spec_params`` dict literal re-declared in every
script (reference: spec_denoising/pipeline_data.py:77-84), plus sweep-value
list literals (VAE/manual_scan.py:120-124) and hard-coded GPFS paths.

This module replaces all of that with one dataclass tree whose defaults are
the reference's exact values.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple


@dataclasses.dataclass(frozen=True)
class SpecParams:
    """STFT parameters.

    Defaults mirror the ``spec_params`` dict at
    spec_denoising/pipeline_data.py:77-84: nperseg=512, noverlap=256,
    fs=500 kHz, periodic Hamming window, density scaling, per-segment linear
    detrend, eps=1e-11 added before the log.
    """

    nperseg: int = 512
    noverlap: int = 256
    fs: float = 500_000.0
    window: str = "hamm"  # periodic Hamming (scipy get_window default fftbins=True)
    scaling: str = "density"  # {'density', 'spectrum'}
    detrend: str = "linear"  # {'linear', 'constant', 'none'}
    eps: float = 1e-11
    # Seconds of signal kept from the head of the shot
    # (``cut_shot`` argument of ``specgr``, pipeline_data.py:28,31).
    cut_shot: float = 2.0

    @property
    def hop(self) -> int:
        return self.nperseg - self.noverlap

    @property
    def n_samples(self) -> int:
        """Samples retained from the raw trace (pipeline_data.py:31)."""
        return int(self.cut_shot * self.fs)

    @property
    def n_frames(self) -> int:
        """Number of STFT frames for an ``n_samples``-long trace."""
        return (self.n_samples - self.nperseg) // self.hop + 1

    @property
    def n_freqs_onesided(self) -> int:
        return self.nperseg // 2 + 1

    @property
    def n_freqs_kept(self) -> int:
        """The reference drops the last (Nyquist) row (pipeline_data.py:35)."""
        return self.n_freqs_onesided - 1


@dataclasses.dataclass(frozen=True)
class PatchSpec:
    """Tiling of a spectrogram into model-sized tiles.

    The reference hard-codes: each 256x3905 spectrogram becomes exactly 30
    tiles of 256x128 (time step 128); trailing columns 3840..3904 are
    silently dropped (VAE/hyperparam_scan.py:30-38).
    """

    tile_freq: int = 256
    tile_time: int = 128
    step: int = 128
    tiles_per_spec: int = 30

    @property
    def time_cols_used(self) -> int:
        return self.tiles_per_spec * self.step  # 3840


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Classical denoising pipeline (pipeline_data.py:100-110).

    Fixed stage order: quantfilt -> gaussblr(31,3) -> meansub -> morph ->
    meansub.
    """

    quant_threshold: float = 0.9  # thr, pipeline_data.py:88
    gauss_ksize: Tuple[int, int] = (31, 3)  # (time-axis taps, freq-axis taps)
    # morph: CLOSE with 4x4 rect SE then OPEN with 3(w)x1(h) rect SE
    # (pipeline_data.py:67-70).
    close_se: Tuple[int, int] = (4, 4)  # (width=time, height=freq)
    open_se: Tuple[int, int] = (3, 1)  # (width=time, height=freq)
    # When True, every uint8 quantisation point of the OpenCV path is
    # replicated (bit-faithful); False keeps everything in float (smoother,
    # faster, not reference-exact).
    emulate_uint8: bool = True


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Convolutional denoising autoencoder.

    Depth-2 variant: VAE/hyperparam_scan.py:152-165 (filters (32, 32)) and
    VAE/manual_scan.py:189-202 (parameterised).  Depth-3 variant:
    VAE/manual_scan_3layers.py:185-201.
    All Keras models use optimizer='adam' and loss='binary_crossentropy'.
    """

    filters: Tuple[int, ...] = (32, 32)  # encoder conv widths, outermost first
    kernels: Tuple[Tuple[int, int], ...] = ((3, 3), (3, 3))
    # kernel of the final 1-channel sigmoid conv (ker3 in manual_scan.py:199)
    out_kernel: Tuple[int, int] = (3, 3)
    input_shape: Tuple[int, int, int] = (256, 128, 1)

    @property
    def depth(self) -> int:
        return len(self.filters)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training recipe (VAE/hyperparam_scan.py:176-184)."""

    epochs: int = 15  # 15 in the array sweep; 100 in manual/graphs runs
    batch_size: int = 128
    learning_rate: float = 1e-3  # Keras Adam defaults
    beta1: float = 0.9
    beta2: float = 0.999
    adam_eps: float = 1e-7  # Keras epsilon (optax default is 1e-8)
    shuffle: bool = True
    seed: int = 0
    # 60% train / 25% tune / 15% test split *by tile* — the reference splits
    # after patching, which leaks tiles of one shot across splits
    # (hyperparam_scan.py:148-149).  split_by='tile' is reference-exact;
    # 'shot' is the fixed alternative.
    split_fracs: Tuple[float, float] = (0.6, 0.85)
    split_by: str = "tile"
    # Opt-in early stopping on val_loss (epochs without improvement before
    # stopping).  The reference ships this knob commented out —
    # ``EarlyStopping(monitor='val_loss', patience=15)``, manual_scan.py:175
    # — so the default (None = off) matches its shipped behaviour; setting
    # it mirrors Keras's semantics (stop after ``patience`` stale epochs,
    # keep the final weights).
    patience: int | None = None


@dataclasses.dataclass(frozen=True)
class SweepConfig:
    """Hyperparameter sweep grids.

    kernel_vals mirrors VAE/hyperparam_scan.py:123; the 5-axis grid mirrors
    VAE/manual_scan.py:120-124; the 4-axis (3-layer) grid has its OWN axes
    mirroring manual_scan_3layers.py:119-123 — the shipped 3-layer scan is
    the single deep3 config (k5, convs 16/32/64), NOT the 2-layer manual
    scan's 64/32 filters.
    """

    kernel_vals: Sequence[Tuple[int, int]] = ((3, 3), (5, 5), (7, 7))
    ker1_vals: Sequence[Tuple[int, int]] = ((5, 5),)
    ker2_vals: Sequence[Tuple[int, int]] = ((5, 5),)
    ker3_vals: Sequence[Tuple[int, int]] = ((5, 5),)
    conv1_vals: Sequence[int] = (64,)
    conv2_vals: Sequence[int] = (32,)
    conv3_vals: Sequence[int] = (64,)
    # manual_scan_3layers.py:119-123 axes (expand_grid_3layer)
    ker_vals_3layer: Sequence[Tuple[int, int]] = ((5, 5),)
    conv1_vals_3layer: Sequence[int] = (16,)
    conv2_vals_3layer: Sequence[int] = (32,)
    conv3_vals_3layer: Sequence[int] = (64,)
    epochs: int = 100


@dataclasses.dataclass(frozen=True)
class PathConfig:
    """Filesystem layout.  The reference hard-codes GPFS paths
    (pipeline_data.py:86,90); here everything is injectable."""

    data_dir: str = "data/raw"
    dataset_file: str = "data/spectrogram_data.hdf5"
    out_dir: str = "out"
    frames_dir: str = "out/frames"


@dataclasses.dataclass(frozen=True)
class Config:
    spec: SpecParams = dataclasses.field(default_factory=SpecParams)
    patch: PatchSpec = dataclasses.field(default_factory=PatchSpec)
    pipeline: PipelineConfig = dataclasses.field(default_factory=PipelineConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    sweep: SweepConfig = dataclasses.field(default_factory=SweepConfig)
    paths: PathConfig = dataclasses.field(default_factory=PathConfig)


# Reference model families, by name, for CLI/sweep convenience.
MODEL_PRESETS = {
    # hyperparam_scan.py:152-165 with kernel_vals[idx]
    "scan_k3": ModelConfig(filters=(32, 32), kernels=((3, 3), (3, 3)), out_kernel=(3, 3)),
    "scan_k5": ModelConfig(filters=(32, 32), kernels=((5, 5), (5, 5)), out_kernel=(5, 5)),
    "scan_k7": ModelConfig(filters=(32, 32), kernels=((7, 7), (7, 7)), out_kernel=(7, 7)),
    # manual_scan.py shipped config (ker=(5,5), conv1=64, conv2=32)
    "manual": ModelConfig(filters=(64, 32), kernels=((5, 5), (5, 5)), out_kernel=(5, 5)),
    # manual_scan_3layers.py shipped config (16, 32, 64, all kernels (5,5))
    "deep3": ModelConfig(
        filters=(16, 32, 64), kernels=((5, 5), (5, 5), (5, 5)), out_kernel=(5, 5)
    ),
    # graphs.ipynb cell 5
    "graphs": ModelConfig(filters=(32, 32), kernels=((3, 3), (3, 3)), out_kernel=(3, 3)),
}
