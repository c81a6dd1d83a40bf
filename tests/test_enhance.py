"""Golden-parity tests: specenh.ops.enhance vs the NumPy/OpenCV recipes.

Each op is tested against the exact reference formulation
(spec_denoising/pipeline_data.py:38-72); the uint8 stages are additionally
tested bit-exactly against OpenCV itself when cv2 is importable.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from specenh.config import PipelineConfig
from specenh.bench import reference_cpu as ref
from specenh.ops import enhance
from specenh.utils.metrics import ssim

cv2 = pytest.importorskip("cv2") if False else None
try:
    import cv2  # noqa: F811

    HAS_CV2 = True
except Exception:
    HAS_CV2 = False


@pytest.fixture(scope="module")
def img(small_spec):
    return np.asarray(small_spec, np.float64)


def test_rescale(img):
    got = np.asarray(enhance.rescale(jnp.asarray(img, jnp.float32)))
    np.testing.assert_allclose(got, ref.rescale_ref(img), atol=1e-6)


def test_normalize(img):
    got = np.asarray(enhance.normalize(jnp.asarray(img, jnp.float32)))
    want = (img - img.mean()) / img.std()
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_quantile_filter(img):
    """Array-exact vs the NumPy-f64 reference: the double-float quantile
    reproduces np.quantile's _lerp bit-for-bit at the < comparison."""
    x32 = img.astype(np.float32)
    got = np.asarray(enhance.quantile_filter(jnp.asarray(x32), 0.9))
    want = ref.quantfilt_ref(x32.astype(np.float64), 0.9).astype(np.float32)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("thr", [0.25, 0.5, 0.9])
def test_quantile_filter_exact_at_ties(thr):
    """Tie-heavy quantised data — where a plain fp32 quantile misclassifies
    pixels — must match NumPy-f64 exactly (pipeline_data.py:46-49)."""
    rng = np.random.default_rng(3)
    x = (np.round(rng.random((129, 200)) * 7) / 7).astype(np.float32)
    q = np.quantile(x.astype(np.float64), thr, axis=0, keepdims=True)
    want = np.where(x.astype(np.float64) < q, 0, x).astype(np.float32)
    got = np.asarray(enhance.quantile_filter(jnp.asarray(x), thr))
    np.testing.assert_array_equal(got, want)


def test_to_uint8_truncation():
    x = np.array([[0.0, 0.299999, 0.3], [0.9999, 0.5, 1.0]])
    got = np.asarray(enhance.to_uint8(jnp.asarray(x, jnp.float32)))
    want = (ref.rescale_ref(x) * 255).astype("uint8")
    np.testing.assert_array_equal(got.astype(np.uint8), want)


@pytest.mark.skipif(not HAS_CV2, reason="cv2 not available")
def test_gaussian_blur_bitexact_vs_cv2():
    rng = np.random.default_rng(0)
    for shape in [(256, 390), (256, 3905)]:
        u8 = rng.integers(0, 256, shape, dtype=np.uint8)
        want = cv2.GaussianBlur(u8, (31, 3), 0)
        got = np.asarray(enhance.gaussian_blur_u8(jnp.asarray(u8, jnp.float32), (31, 3)))
        np.testing.assert_array_equal(got.astype(np.uint8), want)


@pytest.mark.skipif(not HAS_CV2, reason="cv2 not available")
@pytest.mark.parametrize("se", [(4, 4), (3, 1), (3, 3), (5, 2)])
def test_morphology_bitexact_vs_cv2(se):
    rng = np.random.default_rng(1)
    u8 = rng.integers(0, 256, (64, 97), dtype=np.uint8)
    kernel = cv2.getStructuringElement(cv2.MORPH_RECT, se)
    x = jnp.asarray(u8, jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(enhance.dilate(x, se)).astype(np.uint8), cv2.dilate(u8, kernel)
    )
    np.testing.assert_array_equal(
        np.asarray(enhance.erode(x, se)).astype(np.uint8), cv2.erode(u8, kernel)
    )
    np.testing.assert_array_equal(
        np.asarray(enhance.morph_close(x, se)).astype(np.uint8),
        cv2.morphologyEx(u8, cv2.MORPH_CLOSE, kernel),
    )
    np.testing.assert_array_equal(
        np.asarray(enhance.morph_open(x, se)).astype(np.uint8),
        cv2.morphologyEx(u8, cv2.MORPH_OPEN, kernel),
    )


def test_gaussblr_stage(img):
    got = np.asarray(enhance.gaussian_blur(jnp.asarray(img, jnp.float32)))
    want = ref.gaussblr_ref(img)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_meansub_stage(img):
    got = np.asarray(enhance.mean_subtract(jnp.asarray(img, jnp.float32)))
    want = ref.meansub_ref(img)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_morph_stage(img):
    got = np.asarray(enhance.morph(jnp.asarray(img, jnp.float32)))
    want = ref.morph_ref(img)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_full_pipeline_parity(img):
    """The composed 5-stage pipeline must hit >=0.99 SSIM (BASELINE.md);
    in practice it is float-rounding-exact."""
    got = np.asarray(enhance.classical_pipeline(jnp.asarray(img, jnp.float32)))
    want = ref.pipeline_ref(img)
    assert ssim(got, want) > 0.999
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_pipeline_batched(img):
    stack = np.stack([img, img[::-1]])
    got = np.asarray(enhance.classical_pipeline(jnp.asarray(stack, jnp.float32)))
    for c in range(2):
        want = ref.pipeline_ref(stack[c])
        np.testing.assert_allclose(got[c], want, atol=1e-4)


def test_pipeline_stages_match_composition(img):
    stages = enhance.pipeline_stages(jnp.asarray(img, jnp.float32))
    final = np.asarray(enhance.classical_pipeline(jnp.asarray(img, jnp.float32)))
    np.testing.assert_allclose(np.asarray(stages["final"]), final, atol=1e-6)


@pytest.mark.skipif(not HAS_CV2, reason="cv2 not available")
def test_bilateral_u8_bitexact_vs_cv2():
    """bilateral_u8 reproduces cv2's CV_8UC1 bilateralFilter arithmetic
    bit-for-bit (LUT range weights, f32 accumulation, round-half-even)."""
    rng = np.random.default_rng(5)
    for shape, args in [((64, 97), (15, 75, 75)), ((80, 120), (9, 40, 30))]:
        u8 = rng.integers(0, 256, shape, dtype=np.uint8)
        want = cv2.bilateralFilter(u8, *args)
        got = np.asarray(enhance.bilateral_u8(jnp.asarray(u8, jnp.float32), *args))
        np.testing.assert_array_equal(got.astype(np.uint8), want)


@pytest.mark.skipif(not HAS_CV2, reason="cv2 not available")
def test_bilateral_stage_exact(img):
    """The full stage (uint8-quantise -> cv2 bilateral -> rescale) matches
    the reference recipe to float rounding (dataset.ipynb cell 1)."""
    u8 = (ref.rescale_ref(img) * 255).astype("uint8")
    want = ref.rescale_ref(cv2.bilateralFilter(u8, 15, 75, 75))
    got = np.asarray(enhance.bilateral(jnp.asarray(img, jnp.float32)))
    assert ssim(got, want) > 0.999
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_known_transient_mode_survives_enhancement():
    """SURVEY.md section 4's end-to-end anchor: a known TRANSIENT mode in a
    noisy synthetic shot must survive the full classical pipeline with
    contrast over the background.  (A constant tone would be *removed* —
    the pipeline's mean-subtract stages suppress steady structure by
    design; the physics targets are transient Alfven eigenmodes.)"""
    import jax.numpy as jnp

    from specenh.config import SpecParams
    from specenh.ops.stft import spectrogram

    sp = SpecParams(cut_shot=0.2)
    rng = np.random.default_rng(42)
    n = sp.n_samples
    t = np.arange(n) / sp.fs
    gate = (t > 0.08) & (t < 0.12)  # mode burst in the middle of the shot
    x = np.sin(2 * np.pi * 1.2e5 * t) * gate + 1.0 * rng.standard_normal(n)
    spec = spectrogram(jnp.asarray(x, jnp.float32), sp)
    out = np.asarray(enhance.classical_pipeline(spec))
    line_bin = int(round(1.2e5 / (sp.fs / sp.nperseg)))
    times = np.arange(out.shape[1]) * sp.hop / sp.fs
    on = (times > 0.085) & (times < 0.115)
    burst = out[line_bin - 1 : line_bin + 2][:, on].mean()
    background = np.delete(out, range(line_bin - 5, line_bin + 6), axis=0).mean()
    assert burst > 3 * background, (burst, background)
