"""Golden-parity tests: specenh.ops.stft vs scipy.signal.spectrogram.

SciPy is the executable spec here (SURVEY.md section 4): the reference's
``specgr`` is a thin wrapper around scipy.signal.spectrogram
(spec_denoising/pipeline_data.py:32-36).
"""

import numpy as np
import pytest
import scipy.signal

import jax.numpy as jnp

from specenh.config import SpecParams
from specenh.ops.stft import (
    detrend_projection,
    frame_signal,
    hamming_periodic,
    spectrogram,
    spectrogram_freqs,
    spectrogram_times,
    stft_psd,
)
from tests.conftest import synth_trace


def _scipy_spec(x, sp: SpecParams):
    return scipy.signal.spectrogram(
        np.asarray(x, np.float64)[: sp.n_samples],
        nperseg=sp.nperseg,
        noverlap=sp.noverlap,
        fs=sp.fs,
        window=sp.window,
        scaling=sp.scaling,
        detrend=sp.detrend if sp.detrend != "none" else False,
    )


def test_window_matches_scipy():
    w = hamming_periodic(512)
    ref = scipy.signal.get_window("hamm", 512)
    np.testing.assert_allclose(w, ref, rtol=1e-12)


def test_detrend_projection_matches_scipy():
    rng = np.random.default_rng(0)
    seg = rng.standard_normal(512)
    p = detrend_projection(512, "linear")
    np.testing.assert_allclose(p @ seg, scipy.signal.detrend(seg), atol=1e-10)
    p2 = detrend_projection(512, "constant")
    np.testing.assert_allclose(
        p2 @ seg, scipy.signal.detrend(seg, type="constant"), atol=1e-10
    )


def test_frame_signal_values():
    sp = SpecParams(cut_shot=0.01)
    x = np.arange(sp.n_samples, dtype=np.float32)
    frames = np.asarray(frame_signal(jnp.asarray(x), sp.nperseg, sp.hop))
    n_frames = sp.n_frames
    assert frames.shape == (n_frames, sp.nperseg)
    for i in [0, 1, n_frames - 1]:
        np.testing.assert_array_equal(
            frames[i], x[i * sp.hop : i * sp.hop + sp.nperseg]
        )


def test_frame_signal_general_hop():
    x = np.arange(1000, dtype=np.float32)
    frames = np.asarray(frame_signal(jnp.asarray(x), 128, 48))  # 128 % 48 != 0
    n_frames = (1000 - 128) // 48 + 1
    assert frames.shape == (n_frames, 128)
    np.testing.assert_array_equal(frames[3], x[3 * 48 : 3 * 48 + 128])


@pytest.mark.parametrize("detrend", ["linear", "constant", "none"])
def test_psd_matches_scipy(detrend):
    sp = SpecParams(cut_shot=0.1, detrend=detrend)
    x = synth_trace(sp, seed=1)
    f_ref, t_ref, sxx_ref = _scipy_spec(x, sp)
    psd = np.asarray(stft_psd(jnp.asarray(x), sp))
    assert psd.shape == sxx_ref.shape
    scale = np.abs(sxx_ref).max()
    np.testing.assert_allclose(psd / scale, sxx_ref / scale, atol=2e-6)


def test_spectrum_scaling_matches_scipy():
    sp = SpecParams(cut_shot=0.05, scaling="spectrum")
    x = synth_trace(sp, seed=2)
    _, _, sxx_ref = _scipy_spec(x, sp)
    psd = np.asarray(stft_psd(jnp.asarray(x), sp))
    scale = np.abs(sxx_ref).max()
    np.testing.assert_allclose(psd / scale, sxx_ref / scale, atol=2e-6)


def test_full_reference_spectrogram_parity():
    """End-to-end ``specgr`` parity on the full 2-second reference workload:
    log + eps, min-max normalise, Nyquist row dropped (pipeline_data.py:33-35)."""
    sp = SpecParams()
    x = synth_trace(sp, seed=0)
    f_ref, t_ref, sxx_ref = _scipy_spec(x, sp)
    sxx_ref = np.log(sxx_ref + sp.eps)
    sxx_ref = (sxx_ref - sxx_ref.min()) / (sxx_ref.max() - sxx_ref.min())
    sxx_ref = sxx_ref[:-1, :]
    ours = np.asarray(spectrogram(jnp.asarray(x), sp))
    assert ours.shape == (256, 3905)
    np.testing.assert_allclose(ours, sxx_ref, atol=1e-4)
    assert np.abs(ours - sxx_ref).max() < 5e-5  # ~7e-6 TPU, ~2.4e-5 CPU

    np.testing.assert_allclose(spectrogram_freqs(sp), f_ref[:-1])
    np.testing.assert_allclose(spectrogram_times(sp), t_ref)


def test_spectrogram_batched_channels():
    sp = SpecParams(cut_shot=0.05)
    xs = synth_trace(sp, seed=3, n_channels=4)
    batched = np.asarray(spectrogram(jnp.asarray(xs), sp))
    for c in range(4):
        single = np.asarray(spectrogram(jnp.asarray(xs[c]), sp))
        np.testing.assert_allclose(batched[c], single, atol=1e-6)


def test_known_line_lands_in_right_bin():
    """A pure 120 kHz tone must peak at bin round(120e3 / (fs/nperseg))."""
    sp = SpecParams(cut_shot=0.05)
    t = np.arange(sp.n_samples) / sp.fs
    x = np.sin(2 * np.pi * 1.2e5 * t).astype(np.float32)
    s = np.asarray(spectrogram(jnp.asarray(x), sp))
    peak_bin = int(np.argmax(s.mean(axis=1)))
    expect = int(round(1.2e5 / (sp.fs / sp.nperseg)))
    assert abs(peak_bin - expect) <= 1


@pytest.mark.parametrize("window", ["hann", "boxcar", "blackman"])
def test_alternate_windows_match_scipy(window):
    """sp.window must be honoured (regression: it was silently ignored)."""
    sp = SpecParams(cut_shot=0.05, window=window)
    x = synth_trace(sp, seed=9)
    _, _, sxx_ref = _scipy_spec(x, sp)
    psd = np.asarray(stft_psd(jnp.asarray(x), sp))
    scale = np.abs(sxx_ref).max()
    np.testing.assert_allclose(psd / scale, sxx_ref / scale, atol=3e-6)
