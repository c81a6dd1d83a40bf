"""Tests for the cross-power spectrogram (specenh.ops.crosspower).

``ae_co2`` is a reconstruction of a missing site-local dependency
(interferometer/crosspowerspec.py:5,39) — validated here on synthetic
coherent/incoherent chord pairs against first principles and against
scipy.signal.csd-style identities.
"""

import numpy as np

import jax.numpy as jnp

from specenh.config import SpecParams
from specenh.ops.crosspower import ae_co2, cross_power
from specenh.ops.stft import stft_psd


def test_selfcross_equals_psd():
    sp = SpecParams(cut_shot=0.05)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(sp.n_samples).astype(np.float32)
    cp = np.asarray(cross_power(jnp.asarray(x), jnp.asarray(x), sp))
    psd = np.asarray(stft_psd(jnp.asarray(x), sp))
    np.testing.assert_allclose(cp.T, psd, rtol=1e-4, atol=1e-12)


def test_coherent_line_survives_incoherent_noise():
    """Two chords share a 80 kHz mode but have independent noise: the
    cross-power must concentrate at the shared line."""
    sp = SpecParams(cut_shot=0.1)
    rng = np.random.default_rng(1)
    t = np.arange(sp.n_samples) / sp.fs
    mode = np.sin(2 * np.pi * 8e4 * t)
    s1 = mode + 1.0 * rng.standard_normal(t.size)
    s2 = 0.7 * mode + 1.0 * rng.standard_normal(t.size)
    cp = np.asarray(
        cross_power(jnp.asarray(s1, jnp.float32), jnp.asarray(s2, jnp.float32), sp)
    )
    mean_by_freq = cp.mean(axis=0)
    peak = int(np.argmax(mean_by_freq))
    expect = int(round(8e4 / (sp.fs / sp.nperseg)))
    assert abs(peak - expect) <= 1
    # the peak must dominate the noise floor by a wide margin
    floor = np.median(mean_by_freq)
    assert mean_by_freq[peak] > 20 * floor


def test_ae_co2_contract():
    """Shape/unit contract implied by crosspowerspec.py:39-50: ampsp is
    (time, freq) and strictly positive (it is logged immediately); freq in
    kHz; time in ms spanning the input time base."""
    fs = 1.0e6
    n = 1 << 16
    t0 = 0.1
    t = t0 + np.arange(n) / fs
    rng = np.random.default_rng(2)
    s1 = np.sin(2 * np.pi * 2.5e5 * t) + 0.1 * rng.standard_normal(n)
    s2 = np.sin(2 * np.pi * 2.5e5 * t + 0.3) + 0.1 * rng.standard_normal(n)
    ampsp, freq, time = ae_co2(
        jnp.asarray(s1, jnp.float32), jnp.asarray(s2, jnp.float32), t
    )
    ampsp = np.asarray(ampsp)
    assert ampsp.shape == (len(time), len(freq))
    assert (ampsp > 0).all()
    assert np.isfinite(np.log(ampsp)).all()
    # freq axis in kHz up to Nyquist
    assert abs(freq[-1] - fs / 2 / 1e3) < 1e-6
    # time axis in ms, inside the input window
    assert time.min() >= t0 * 1e3 and time.max() <= (t[-1]) * 1e3
    # the coherent 250 kHz line peaks at the right kHz bin
    peak = freq[int(np.argmax(ampsp.mean(axis=0)))]
    assert abs(peak - 250.0) < 2.0
