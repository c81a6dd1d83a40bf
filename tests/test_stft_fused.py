"""Fused (T,F)-layout STFT kernel + mirrored corner-turn (ops.stft_fused)
vs the golden XLA spectrogram path — interpret mode on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from specenh.config import ModelConfig, SpecParams
from specenh.ops.parity_turn import pick_interleave, specs_to_x16_2d
from specenh.ops.stft import spectrogram, stft_psd
from specenh.ops.stft_fused import (
    normalized_specs,
    specs_tf_to_x16_2d,
    stft_tf_log,
    supported,
)

SP = SpecParams(cut_shot=0.2)  # 100k samples -> 389 frames, 2 grid blocks


def test_supported():
    assert supported(SP)
    assert not supported(SpecParams(nperseg=256, noverlap=128))
    assert not supported(SpecParams(noverlap=384))  # hop != nperseg/2


@pytest.fixture(scope="module")
def traces():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.standard_normal((2, SP.n_samples)), jnp.float32)


@pytest.fixture(scope="module")
def fused(traces):
    # f32 kernel path: comparable to the golden HIGHEST XLA PSD
    return stft_tf_log(traces, SP, bf16=False, interpret=True)


def test_log_psd_matches_golden(traces, fused):
    a, _, _, nf = fused
    assert int(nf) == SP.n_frames
    psd = stft_psd(traces, SP)  # (C, F, T) golden
    gold = jnp.log(psd + SP.eps).swapaxes(-1, -2)  # (C, T, F)
    err = float(jnp.max(jnp.abs(a[:, : SP.n_frames, :257] - gold)))
    # split-K (2 x 256) f32 summation order vs the single K=512 dot
    assert err < 1e-3, err


def test_inkernel_minmax_exact(fused):
    a, mn, mx, _ = fused
    valid = a[:, : SP.n_frames, :257]  # pre-drop domain incl. Nyquist
    np.testing.assert_array_equal(
        np.asarray(mn), np.asarray(jnp.min(valid, axis=(1, 2)))[:, None]
    )
    np.testing.assert_array_equal(
        np.asarray(mx), np.asarray(jnp.max(valid, axis=(1, 2)))[:, None]
    )


def test_mirrored_turn_matches_parity_turn(traces, fused):
    a, mn, mx, _ = fused
    specs = spectrogram(traces, SP)  # golden normalized (C, 256, T)
    k = SP.n_frames // 128  # 3; pick_interleave(3) == 3
    assert k % pick_interleave(k) == 0
    gold = specs_to_x16_2d(specs, k, interpret=True)
    got = specs_tf_to_x16_2d(a, mn, mx, k, interpret=True)
    diff = jnp.max(
        jnp.abs(gold.astype(jnp.float32) - got.astype(jnp.float32))
    )
    assert float(diff) <= 2**-7, float(diff)  # bf16-ulp at |x| <= 1


def test_normalized_specs_matches(traces, fused):
    a, mn, mx, _ = fused
    specs = spectrogram(traces, SP)
    got = normalized_specs(a, mn, mx, SP.n_frames)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(specs), atol=2e-4
    )


def test_harness_fused_front_matches_xla():
    """The full service with stft_mode='fused' must agree with the XLA
    front-end (both on the fused AE kernel, interpret mode): same shapes,
    specs/enhanced within bf16 front-end noise."""
    from specenh.bench.harness import make_enhance_shot_fn
    from specenh.models.autoencoder import make_model

    cfg = ModelConfig()
    params = make_model(cfg).init(
        jax.random.PRNGKey(0), np.zeros((1, *cfg.input_shape), np.float32)
    )
    rng = np.random.default_rng(3)
    tr = jnp.asarray(rng.standard_normal((1, SP.n_samples)), jnp.float32)
    ff = make_enhance_shot_fn(
        cfg, SP, use_kernel=True, interpret=True, stft_mode="fused"
    )
    fx = make_enhance_shot_fn(
        cfg, SP, use_kernel=True, interpret=True, stft_mode="xla"
    )
    s1, e1 = ff(params, tr)
    s2, e2 = fx(params, tr)
    assert s1.shape == s2.shape and e1.shape == e2.shape
    # both front-ends run bf16 STFTs; in deep spectral valleys the log
    # amplifies bf16 PSD rounding, so a handful of near-null pixels can
    # differ visibly (0.3% observed on CPU; on the TPU the two paths
    # quantize identically to ~1e-5).  Bound the bulk and the tail.
    ds = np.abs(np.asarray(s1) - np.asarray(s2))
    de = np.abs(np.asarray(e1) - np.asarray(e2))
    assert ds.mean() < 1e-3 and ds.max() < 0.15, (ds.mean(), ds.max())
    assert (ds > 5e-3).mean() < 0.01
    assert de.mean() < 1e-3 and de.max() < 0.05, (de.mean(), de.max())


def test_harness_fused_mode_guard():
    """stft_mode='fused' raises on ineligible geometry (deep3 / f32)."""
    from specenh.bench.harness import make_enhance_shot_fn

    deep3 = ModelConfig(filters=(16, 32, 64), kernels=((3, 3),) * 3)
    with pytest.raises(NotImplementedError):
        make_enhance_shot_fn(
            deep3, SP, use_kernel=True, interpret=True, stft_mode="fused"
        )
    with pytest.raises(NotImplementedError):
        make_enhance_shot_fn(
            ModelConfig(), SP, dtype=None, stft_mode="fused"
        )
    with pytest.raises(ValueError):
        make_enhance_shot_fn(ModelConfig(), SP, stft_mode="bogus")


def test_ft_kernel_matches_tf(traces, fused):
    """stft_ft_log (in-kernel transpose, round-5 reopening of the Mosaic
    wall) is exactly the transposed stft_tf_log output, same min/max."""
    from specenh.ops.stft_fused import stft_ft_log

    a_tf, mn_tf, mx_tf, nf = fused
    a_ft, mn, mx, nf2 = stft_ft_log(traces, SP, bf16=False, interpret=True)
    assert int(nf2) == int(nf)
    np.testing.assert_array_equal(
        np.asarray(a_ft), np.asarray(a_tf).swapaxes(-1, -2)
    )
    np.testing.assert_array_equal(np.asarray(mn), np.asarray(mn_tf))
    np.testing.assert_array_equal(np.asarray(mx), np.asarray(mx_tf))


def test_spectrogram_fused_drop_in(traces):
    """spectrogram_fused == ops.stft.spectrogram (f32 kernel vs golden
    HIGHEST path; the split-K summation order is the only difference)."""
    from specenh.ops.stft_fused import spectrogram_fused

    gold = np.asarray(spectrogram(traces, SP))
    got = np.asarray(spectrogram_fused(traces, SP, bf16=False, interpret=True))
    assert got.shape == gold.shape
    np.testing.assert_allclose(got, gold, atol=2e-4)


def test_service_fused_ft_matches_xla_front(traces):
    """make_enhance_shot_fn(stft_mode='fused_ft'): the full kernel service
    with the (F,T) split-basis STFT front matches the XLA-front service
    (bf16-class tolerance; same corner-turn + AE kernel downstream)."""
    from specenh.bench.harness import make_enhance_shot_fn
    from specenh.models.autoencoder import make_model

    cfg = ModelConfig()
    params = make_model(cfg).init(
        jax.random.PRNGKey(0), np.zeros((1, *cfg.input_shape), np.float32)
    )
    f_xla = make_enhance_shot_fn(cfg, SP, use_kernel=True, interpret=True,
                                 stft_mode="xla")
    f_ft = make_enhance_shot_fn(cfg, SP, use_kernel=True, interpret=True,
                                stft_mode="fused_ft")
    s1, e1 = f_xla(params, traces)
    s2, e2 = f_ft(params, traces)
    # specs: the bf16 kernel front vs the (on CPU effectively f32) XLA
    # front — bf16 input rounding puts worst-case pixels at ~0.1 in
    # log-minmax space but SSIM stays ~0.99997 (same class as the
    # round-3 fused front; bench.py gates >= 0.99 on chip)
    from specenh.utils.metrics import ssim

    for c in range(s1.shape[0]):
        # measured per-channel band 0.998-0.9999 at this short shot;
        # bench.py gates the full-shot spec SSIM >= 0.99 on chip
        assert ssim(np.asarray(s2[c]), np.asarray(s1[c])) > 0.995
    d = np.abs(np.asarray(e2) - np.asarray(e1))
    assert d.max() < 0.1 and d.mean() < 5e-3, (d.max(), d.mean())


def test_norm_fused_ft_turn_exact(traces, fused):
    """specs_ft_to_x16_2d (normalize fused into the (F,T) turn) is
    BIT-exact vs parity_turn.specs_to_x16_2d of the normalized specs.
    Measured dead even with the epilogue+turn form in the full service
    (PERF_NOTES round 5) — kept as the exact building block for
    x16-only consumers of stft_ft_log."""
    from specenh.ops.stft_fused import (
        spectrogram_fused,
        specs_ft_to_x16_2d,
        stft_ft_log,
    )

    out, mn, mx, _ = stft_ft_log(traces, SP, bf16=False, interpret=True)
    k = SP.n_frames // 128
    got = specs_ft_to_x16_2d(out, mn, mx, k, interpret=True)
    specs = spectrogram_fused(traces, SP, bf16=False, interpret=True)
    want = specs_to_x16_2d(specs, k, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_ft_kernel_edge_shapes():
    """Single channel + single grid block (n_frames < FB): the padded
    rows/lanes never leak into the output slice or the min/max."""
    from specenh.ops.stft_fused import spectrogram_fused

    sp = SpecParams(cut_shot=0.1)  # 194 frames -> one partial block
    rng = np.random.default_rng(5)
    tr = jnp.asarray(rng.standard_normal((1, sp.n_samples)), jnp.float32)
    gold = np.asarray(spectrogram(tr, sp))
    got = np.asarray(spectrogram_fused(tr, sp, bf16=False, interpret=True))
    assert got.shape == gold.shape == (1, 256, sp.n_frames)
    np.testing.assert_allclose(got, gold, atol=2e-4)
    assert got.min() >= 0.0 and got.max() <= 1.0
