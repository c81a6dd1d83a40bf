"""TPU-native STFT spectrogram.

Reference behaviour being reproduced (spec_denoising/pipeline_data.py:28-36):

    f, t, Sxx = scipy.signal.spectrogram(
        sig, nperseg=512, noverlap=256, fs=5e5, window='hamm',
        scaling='density', detrend='linear')
    Sxx = np.log(Sxx + 1e-11)
    Sxx = (Sxx - Sxx.min()) / (Sxx.max() - Sxx.min())
    Sxx = Sxx[:-1, :]; f = f[:-1]          # drop the Nyquist row

TPU-first design
----------------
Instead of translating SciPy's FFT path, the whole transform is expressed as
ONE dense matmul that maps straight onto the MXU:

* per-segment *linear detrend* is a fixed orthogonal projection
  ``P = I - A (A^T A)^-1 A^T`` with ``A = [t, 1]`` (a 512x512 matrix),
* *windowing* is ``diag(w)`` for the periodic Hamming window,
* the *rFFT* is the DFT matrix ``F`` (257x512, complex).

So for the framed signal ``Y`` (n_frames x nperseg):

    Z = Y @ B,   B = P @ diag(w) @ F^T   (nperseg x n_freqs, complex)

``B`` is precomputed once in float64 on the host, split into its real and
imaginary parts, and the PSD is ``(Y@Br)^2 + (Y@Bi)^2`` with SciPy's
density scaling ``1/(fs * sum(w^2))`` and the one-sided doubling of interior
bins.  For the reference shape this is a (3905, 512) @ (512, 514) fp32 matmul
per channel — exactly the kind of large static-shape contraction the MXU is
built for — and XLA fuses the square/scale/log epilogue into it.

Framing never materialises a gather: for the reference's 50% overlap
(hop == nperseg/2) the frames are two shifted reshapes of the raw trace.

Everything is batched: ``x`` may have arbitrary leading axes (channels,
shots); the transform vmaps trivially because it is a single einsum.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from specenh.config import SpecParams

__all__ = [
    "hamming_periodic",
    "detrend_projection",
    "stft_basis",
    "frame_signal",
    "stft_psd",
    "spectrogram",
    "spectrogram_freqs",
    "spectrogram_times",
]


def hamming_periodic(n: int) -> np.ndarray:
    """Periodic Hamming window, matching scipy.signal.get_window('hamm', n)
    (fftbins=True => periodic: denominator n, not n-1)."""
    k = np.arange(n)
    return 0.54 - 0.46 * np.cos(2.0 * np.pi * k / n)


def detrend_projection(n: int, kind: str = "linear") -> np.ndarray:
    """Projection matrix removing the per-segment trend.

    ``linear`` reproduces scipy.signal.detrend(type='linear'): least-squares
    removal of an affine fit; as a linear map this is the orthogonal projection
    onto the complement of span{1, t} and is basis-independent.
    ``constant`` removes the mean; ``none`` is the identity.
    """
    eye = np.eye(n, dtype=np.float64)
    if kind in ("none", "false", ""):
        return eye
    if kind == "constant":
        return eye - np.full((n, n), 1.0 / n)
    if kind == "linear":
        t = np.arange(n, dtype=np.float64)
        a = np.stack([t, np.ones(n)], axis=1)  # (n, 2)
        proj = a @ np.linalg.solve(a.T @ a, a.T)
        return eye - proj
    raise ValueError(f"unknown detrend kind: {kind!r}")


def _window_np(name: str, n: int) -> np.ndarray:
    """Periodic (fftbins) window by name; matches scipy.signal.get_window."""
    if name in ("hamm", "hamming"):
        return hamming_periodic(n)
    if name in ("hann", "hanning"):
        return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)
    if name in ("boxcar", "rect", "rectangular"):
        return np.ones(n)
    try:
        import scipy.signal

        return np.asarray(scipy.signal.get_window(name, n))
    except Exception as e:  # pragma: no cover
        raise ValueError(f"unsupported window {name!r}") from e


@functools.lru_cache(maxsize=8)
def _basis_np(
    nperseg: int, detrend: str, fs: float, scaling: str, window: str = "hamm",
    onesided: bool = True,
) -> Tuple[np.ndarray, np.ndarray, float]:
    """Host-side (float64) computation of the combined STFT basis.

    Returns (B_real, B_imag) of shape (nperseg, n_freqs) and the PSD scale.
    """
    w = _window_np(window, nperseg)
    p = detrend_projection(nperseg, detrend)
    n_freqs = nperseg // 2 + 1 if onesided else nperseg
    k = np.arange(n_freqs)[None, :]  # (1, n_freqs)
    n = np.arange(nperseg)[:, None]  # (nperseg, 1)
    angle = -2.0 * np.pi * k * n / nperseg
    # F^T has entry [n, k] = exp(-2i pi k n / nperseg)
    ft_real = np.cos(angle)
    ft_imag = np.sin(angle)
    pw = p @ np.diag(w)  # (nperseg, nperseg)
    b_real = pw @ ft_real
    b_imag = pw @ ft_imag
    if scaling == "density":
        scale = 1.0 / (fs * float(np.sum(w * w)))
    elif scaling == "spectrum":
        scale = 1.0 / float(np.sum(w)) ** 2
    else:
        raise ValueError(f"unknown scaling: {scaling!r}")
    return b_real, b_imag, scale


def stft_basis(sp: SpecParams, dtype=jnp.float32):
    """Device-ready (B_real, B_imag, one-sided weights) for ``sp``.

    The one-sided weights fold the PSD scale and the x2 doubling of interior
    bins (SciPy doubles everything except DC and, for even nperseg, Nyquist)
    into a single per-frequency multiplier.
    """
    b_real, b_imag, scale = _basis_np(
        sp.nperseg, sp.detrend, sp.fs, sp.scaling, sp.window
    )
    n_freqs = b_real.shape[1]
    weights = np.full(n_freqs, 2.0 * scale)
    weights[0] = scale
    if sp.nperseg % 2 == 0:
        weights[-1] = scale
    return (
        jnp.asarray(b_real, dtype),
        jnp.asarray(b_imag, dtype),
        jnp.asarray(weights, dtype),
    )


def frame_signal(x: jax.Array, nperseg: int, hop: int) -> jax.Array:
    """Slice ``x[..., :n_samples]`` into overlapping frames.

    Returns shape (..., n_frames, nperseg).  When ``nperseg % hop == 0`` the
    frames are assembled from ``nperseg // hop`` shifted reshapes — no gather,
    so XLA keeps the access pattern fully vectorised.
    """
    n = x.shape[-1]
    n_frames = (n - nperseg) // hop + 1
    if nperseg % hop == 0:
        r = nperseg // hop
        n_half = n_frames - 1 + r  # hop-sized blocks needed
        blocks = x[..., : n_half * hop].reshape(*x.shape[:-1], n_half, hop)
        parts = [blocks[..., i : i + n_frames, :] for i in range(r)]
        return jnp.concatenate(parts, axis=-1)
    idx = np.arange(n_frames)[:, None] * hop + np.arange(nperseg)[None, :]
    return x[..., idx]


def stft_psd(
    x: jax.Array, sp: SpecParams, dtype=jnp.float32, precision=None
) -> jax.Array:
    """One-sided PSD spectrogram, shape (..., n_freqs_onesided, n_frames).

    Numerically equivalent to scipy.signal.spectrogram(mode='psd') with
    ``sp``'s parameters (boundary=None, padded=False — SciPy's spectrogram
    defaults), including per-segment detrend, density scaling and one-sided
    doubling.  Output axis order matches SciPy: (freq, time).

    ``precision`` defaults to HIGHEST (= BF16_BF16_F32_X6, the golden
    path); serving paths may pass DotAlgorithmPreset.BF16_BF16_F32_X3 —
    measured SSIM 1.000000 / max |err| 8e-4 vs HIGHEST at ~0.67x the time.
    """
    if precision is None:
        precision = jax.lax.Precision.HIGHEST
    x = x.astype(dtype)
    frames = frame_signal(x, sp.nperseg, sp.hop)  # (..., T, nperseg)
    b_real, b_imag, weights = stft_basis(sp, dtype)
    zr = jnp.matmul(frames, b_real, precision=precision,
                    preferred_element_type=jnp.float32)
    zi = jnp.matmul(frames, b_imag, precision=precision,
                    preferred_element_type=jnp.float32)
    psd = (zr * zr + zi * zi) * weights  # (..., T, F)
    return jnp.swapaxes(psd, -1, -2)


def spectrogram(
    x: jax.Array, sp: SpecParams, dtype=jnp.float32, precision=None
) -> jax.Array:
    """Reference-exact log spectrogram in [0, 1].

    Equivalent to the body of ``specgr`` (pipeline_data.py:32-35) minus data
    loading: truncate to ``sp.n_samples``, PSD spectrogram, ``log(Sxx+eps)``,
    global per-spectrogram min-max to [0,1], drop the Nyquist row.

    ``x``: (..., >=n_samples) raw trace(s).  Returns (..., 256, 3905) for the
    reference config.  The min/max is computed per leading index (i.e. per
    channel), matching the reference's per-channel normalisation.
    """
    x = x[..., : sp.n_samples]
    psd = stft_psd(x, sp, dtype, precision)
    sxx = jnp.log(psd + jnp.asarray(sp.eps, psd.dtype))
    mn = jnp.min(sxx, axis=(-2, -1), keepdims=True)
    mx = jnp.max(sxx, axis=(-2, -1), keepdims=True)
    sxx = (sxx - mn) / (mx - mn)
    return sxx[..., : sp.n_freqs_kept, :]


def spectrogram_freqs(sp: SpecParams, drop_nyquist: bool = True) -> np.ndarray:
    """Frequency axis in Hz (pipeline_data.py:32,35)."""
    n = sp.n_freqs_kept if drop_nyquist else sp.n_freqs_onesided
    return np.arange(n) * sp.fs / sp.nperseg


def spectrogram_times(sp: SpecParams, n_samples: int | None = None) -> np.ndarray:
    """Segment-centre time axis in seconds, matching SciPy."""
    n = sp.n_samples if n_samples is None else n_samples
    return np.arange(sp.nperseg / 2, n - sp.nperseg / 2 + 1, sp.hop) / sp.fs
