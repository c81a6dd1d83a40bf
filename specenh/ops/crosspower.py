"""Cross-power spectrogram of two interferometer chords.

The reference calls ``ampsp, freq, time = ae_co2(sig1, sig2, t)``
(interferometer/crosspowerspec.py:39) from the site-local ``co2_deps`` module,
which is NOT in the repository.  The behaviour is reconstructed here from the
call contract and plot usage (crosspowerspec.py:42-50):

* ``ampsp`` is plotted as ``log(ampsp).T`` with time on x and frequency on y
  => shape (time, freq), strictly positive.
* axes are labelled Frequency [kHz] and Time [ms]; ``t`` is the raw time base
  (tsignal.h5) in seconds.

Implementation: windowed rFFT of both chords (same framed-matmul engine as
specenh.ops.stft), cross power ``X1 * conj(X2)`` and its magnitude.  The
cross-power retains only coherent structure between the chords — the standard
two-chord Alfven-eigenmode detection recipe the plot implies.  Validated on
synthetic coherent+incoherent signal pairs (tests/test_crosspower.py).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from specenh.config import SpecParams
from specenh.ops.stft import frame_signal, stft_basis

__all__ = ["cross_power", "ae_co2"]


def cross_power(
    sig1: jax.Array, sig2: jax.Array, sp: SpecParams, dtype=jnp.float32
) -> jax.Array:
    """|X1 * conj(X2)| cross-power spectrogram.

    Returns shape (..., n_frames, n_freqs_onesided) — (time, freq) order to
    match the ``ampsp`` contract.  Uses sp's window/detrend/density scaling,
    so ``cross_power(x, x, sp)`` equals the PSD spectrogram transposed.
    """
    b_real, b_imag, weights = stft_basis(sp, dtype)
    f1 = frame_signal(sig1.astype(dtype), sp.nperseg, sp.hop)
    f2 = frame_signal(sig2.astype(dtype), sp.nperseg, sp.hop)
    r1 = jnp.matmul(f1, b_real, precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32)
    i1 = jnp.matmul(f1, b_imag, precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32)
    r2 = jnp.matmul(f2, b_real, precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32)
    i2 = jnp.matmul(f2, b_imag, precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32)
    # X1 * conj(X2) = (r1 r2 + i1 i2) + i (i1 r2 - r1 i2)
    re = r1 * r2 + i1 * i2
    im = i1 * r2 - r1 * i2
    return jnp.sqrt(re * re + im * im) * weights


def ae_co2(
    sig1: jax.Array,
    sig2: jax.Array,
    t: np.ndarray,
    nperseg: int = 1024,
    noverlap: int | None = None,
) -> Tuple[jax.Array, np.ndarray, np.ndarray]:
    """Drop-in reconstruction of the missing ``co2_deps.ae_co2``.

    Returns ``(ampsp, freq, time)`` with ampsp (n_frames, n_freqs), freq in
    kHz and time in ms — the units crosspowerspec.py:42-50 plots.  A small
    floor keeps ``log(ampsp)`` finite, since the reference immediately logs.
    """
    t = np.asarray(t)
    dt = float(np.median(np.diff(t)))
    fs = 1.0 / dt
    if noverlap is None:
        noverlap = nperseg // 2
    sp = SpecParams(
        nperseg=nperseg,
        noverlap=noverlap,
        fs=fs,
        detrend="linear",
        scaling="density",
        cut_shot=len(t) * dt,
    )
    n = min(np.shape(sig1)[-1], np.shape(sig2)[-1], len(t))
    n_frames = (n - nperseg) // sp.hop + 1
    ampsp = cross_power(sig1[..., :n], sig2[..., :n], sp)
    ampsp = jnp.maximum(ampsp, jnp.finfo(jnp.float32).tiny)
    freq = np.arange(sp.n_freqs_onesided) * fs / nperseg / 1e3  # kHz
    centers = (np.arange(n_frames) * sp.hop + nperseg / 2) * dt
    time = (t[0] + centers) * 1e3  # ms
    return ampsp, freq, time
