"""Parity tests: the fused Pallas STFT kernel vs the XLA matmul path.

Runs in interpreter mode on CPU (the test harness platform); the compiled
kernel is exercised on real TPU by the verify drive and bench.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from specenh.config import SpecParams
from specenh.ops.stft import spectrogram
from tests.conftest import synth_trace


@pytest.fixture(scope="module", autouse=True)
def _interpret_mode():
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


def test_pallas_matches_xla_path():
    sp = SpecParams(cut_shot=0.1)
    from specenh.ops.stft_pallas import spectrogram_pallas

    x = jnp.asarray(synth_trace(sp, seed=0))
    want = np.asarray(spectrogram(x, sp))
    got = np.asarray(spectrogram_pallas(x, sp))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_pallas_batched_channels():
    sp = SpecParams(cut_shot=0.05)
    from specenh.ops.stft_pallas import spectrogram_pallas

    xs = jnp.asarray(synth_trace(sp, seed=1, n_channels=3))
    got = np.asarray(spectrogram_pallas(xs, sp))
    want = np.asarray(spectrogram(xs, sp))
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_pallas_rejects_non_half_overlap():
    from specenh.ops.stft_pallas import stft_log_psd_pallas

    sp = SpecParams(cut_shot=0.05, noverlap=128)
    with pytest.raises(ValueError, match="50%"):
        stft_log_psd_pallas(jnp.zeros(sp.n_samples), sp)
