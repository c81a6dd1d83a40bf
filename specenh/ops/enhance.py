"""Classical spectrogram-enhancement ops, TPU-native.

Re-implements the reference's image-processing pipeline
(spec_denoising/pipeline_data.py:38-72, composition :100-110):

    quantfilt -> gaussblr(31,3) -> meansub -> morph -> meansub

as pure jax.numpy functions over the trailing (freq, time) axes, batched over
arbitrary leading axes (channels / shots) — one jitted ``classical_pipeline``
replaces the per-channel Python loops of the reference notebooks.

Bit-faithfulness
----------------
The reference routes two stages through OpenCV on uint8 images.  OpenCV >=3.4
uses a *bit-exact fixed-point* path for CV_8U Gaussian blur: kernels are
quantised to Q8.8 integers (with error diffusion, which is why the 31-tap
kernel below is non-monotonic at taps +-13/14), accumulation is Q16.16 and the
final store rounds half-up.  We reproduce that arithmetic exactly — in
float32, which represents every intermediate integer exactly (max value
255*256*256 = 16,711,680 < 2^24) — so ``gaussian_blur_u8`` is bit-identical
to ``cv2.GaussianBlur(src, (31,3), 0)``.  The Q8.8 kernels for the reference
ksize are baked in; ``specenh.utils.cv_probe`` can re-derive them from any
OpenCV build.

Morphology semantics (empirically pinned against OpenCV): for a WxH rect SE
with default anchor (W//2, H//2), both erode and dilate reduce over source
offsets ``[-W//2, W - 1 - W//2]`` (same window, no mirroring), with the
border ignored (pad -inf for dilate / +inf for erode).

uint8 conversion ``(rescale(x)*255).astype(uint8)`` truncates toward zero,
which is what ``jnp.astype`` does for non-negative floats.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from specenh.config import PipelineConfig

__all__ = [
    "rescale",
    "normalize",
    "quantile_filter",
    "to_uint8",
    "gaussian_blur_u8",
    "gaussian_blur",
    "mean_subtract",
    "dilate",
    "erode",
    "morph_close",
    "morph_open",
    "morph",
    "bilateral",
    "bilateral_u8",
    "classical_pipeline",
    "opencv_gauss_kernel_q88",
]

# ---------------------------------------------------------------------------
# elementwise / reduction ops
# ---------------------------------------------------------------------------


def rescale(x: jax.Array, axes: Tuple[int, ...] = (-2, -1)) -> jax.Array:
    """Global min-max to [0, 1] over ``axes`` (pipeline_data.py:43-44)."""
    mn = jnp.min(x, axis=axes, keepdims=True)
    mx = jnp.max(x, axis=axes, keepdims=True)
    return (x - mn) / (mx - mn)


def normalize(x: jax.Array, axes: Tuple[int, ...] = (-2, -1)) -> jax.Array:
    """Zero-mean / unit-std (``norm``, pipeline_data.py:38-41)."""
    mn = jnp.mean(x, axis=axes, keepdims=True)
    sd = jnp.std(x, axis=axes, keepdims=True)
    return (x - mn) / sd


# --- double-float (two-float32) helpers for the NumPy-f64-exact quantile ---
#
# TPU has no float64; the comparison ``x < quantile(x)`` at exact ties is
# decided by the last bits of the interpolated quantile, so a plain fp32
# interpolation flips a small fraction of pixels vs the reference
# (np.quantile in float64).  Each helper is the classic error-free transform
# (two_sum / Dekker two_prod): the pair (hi, lo) represents hi+lo exactly,
# giving ~2^-48 relative accuracy — indistinguishable from float64 for a
# comparison against float32 data, and EXACT in every representable-tie case.


def _two_sum(a, b):
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def _quick_two_sum(a, b):  # requires |a| >= |b| (or a == 0)
    s = a + b
    return s, b - (s - a)


def _split_f32(a):
    c = jnp.float32(4097.0) * a  # Veltkamp split, 2^12 + 1 for binary32
    hi = c - (c - a)
    return hi, a - hi


def _two_prod(a, b):
    p = a * b
    ah, al = _split_f32(a)
    bh, bl = _split_f32(b)
    return p, ((ah * bh - p) + ah * bl + al * bh) + al * bl


def _dd_scale(hi, lo, t: float):
    """(hi+lo) * t with t a host float64, to double-float accuracy."""
    t_hi = np.float32(t)
    t_lo = np.float32(t - float(t_hi))
    p, e = _two_prod(hi, jnp.float32(t_hi))
    e = e + (hi * jnp.float32(t_lo) + lo * jnp.float32(t_hi))
    return _quick_two_sum(p, e)


def quantile_filter(x: jax.Array, thr: float = 0.9) -> jax.Array:
    """Zero out values below the per-time-column ``thr``-quantile taken over
    the frequency axis (``quantfilt``, pipeline_data.py:46-49; quantile along
    axis 0 == our axis -2, with NumPy's linear interpolation).

    The quantile interpolation and the ``<`` comparison follow NumPy's
    float64 ``_lerp`` exactly (including its ``t >= 0.5`` rewrite
    ``b - diff*(1-t)``), emulated in double-float32 — bit-faithful at
    quantile ties, where a single-float32 quantile misclassifies pixels.
    """
    f = x.shape[-2]
    virtual = (f - 1) * float(thr)
    k = min(int(np.floor(virtual)), f - 1)
    gamma = virtual - k  # host-side float64, exact NumPy semantics
    v = jnp.sort(x, axis=-2)
    a = jax.lax.slice_in_dim(v, k, k + 1, axis=-2)
    b = jax.lax.slice_in_dim(v, min(k + 1, f - 1), min(k + 1, f - 1) + 1, axis=-2)
    d_hi, d_lo = _two_sum(b, -a)  # diff_b_a, exact
    if gamma >= 0.5:  # NumPy: q = b - diff * (1 - t)
        p_hi, p_lo = _dd_scale(d_hi, d_lo, 1.0 - gamma)
        s, e = _two_sum(b, -p_hi)
        q_hi, q_lo = _two_sum(s, e - p_lo)
    else:  # NumPy: q = a + diff * t
        p_hi, p_lo = _dd_scale(d_hi, d_lo, gamma)
        s, e = _two_sum(a, p_hi)
        q_hi, q_lo = _two_sum(s, e + p_lo)
    below = (x < q_hi) | ((x == q_hi) & (q_lo > 0))
    return jnp.where(below, jnp.zeros((), x.dtype), x)


def to_uint8(x: jax.Array) -> jax.Array:
    """``(rescale(x) * 255).astype(uint8)`` with NumPy truncation semantics
    (pipeline_data.py:53,65).  Returned as float32 holding exact integers in
    [0, 255] so downstream integer arithmetic stays on the VPU fast path."""
    v = rescale(x) * jnp.float32(255.0)
    return jnp.floor(v)


def mean_subtract(x: jax.Array) -> jax.Array:
    """|x - per-freq-row time-mean|, then min-max rescale
    (``meansub``, pipeline_data.py:58-61; mean over axis 1 == our axis -1)."""
    mn = jnp.mean(x, axis=-1, keepdims=True)
    return rescale(jnp.abs(x - mn))


# ---------------------------------------------------------------------------
# OpenCV-exact Gaussian blur
# ---------------------------------------------------------------------------

# Q8.8 fixed-point taps of OpenCV's bit-exact CV_8U Gaussian for ksize=31,
# sigma=0 (auto sigma = 5.0).  Extracted by impulse-probing cv2 5.0 (see
# specenh/utils/cv_probe.py); verified bit-identical on random images.
_CV_KX31_Q88 = (
    0, 1, 0, 1, 2, 3, 4, 6, 7, 10, 13, 15, 17, 19, 20,
    20,
    20, 19, 17, 15, 13, 10, 7, 6, 4, 3, 2, 1, 0, 1, 0,
)
# ksize=3, sigma=0 -> OpenCV's fixed small kernel [0.25, 0.5, 0.25].
_CV_K3_Q88 = (64, 128, 64)

_Q88_TABLE = {31: _CV_KX31_Q88, 3: _CV_K3_Q88}


def opencv_auto_sigma(ksize: int) -> float:
    """OpenCV's sigma-from-ksize formula: 0.3*((k-1)/2 - 1) + 0.8."""
    return 0.3 * ((ksize - 1) * 0.5 - 1.0) + 0.8


def opencv_gauss_kernel_q88(ksize: int) -> np.ndarray:
    """Q8.8 integer Gaussian taps matching OpenCV's CV_8U bit-exact path.

    Baked tables for the reference's sizes; for other sizes, falls back to
    rounding the float kernel to Q8.8 (close to, but not guaranteed
    bit-identical with, OpenCV's error-diffusion quantiser).
    """
    if ksize in _Q88_TABLE:
        return np.asarray(_Q88_TABLE[ksize], dtype=np.float32)
    k = _gauss_kernel_f64(ksize)
    q = np.round(k * 256.0)
    # push any rounding deficit onto the centre tap so the sum is exactly 256
    q[ksize // 2] += 256.0 - q.sum()
    return q.astype(np.float32)


def _gauss_kernel_f64(ksize: int, sigma: float = 0.0) -> np.ndarray:
    small = {
        1: [1.0],
        3: [0.25, 0.5, 0.25],
        5: [0.0625, 0.25, 0.375, 0.25, 0.0625],
        7: [0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375, 0.03125],
    }
    if sigma <= 0 and ksize in small:
        return np.asarray(small[ksize])
    if sigma <= 0:
        sigma = opencv_auto_sigma(ksize)
    c = (ksize - 1) * 0.5
    k = np.exp(-(((np.arange(ksize) - c) / sigma) ** 2) / 2.0)
    return k / k.sum()


def _reflect101_pad(x: jax.Array, pad_f: int, pad_t: int) -> jax.Array:
    """BORDER_REFLECT_101 (edge pixel not repeated) on the last two axes."""
    pads = [(0, 0)] * (x.ndim - 2) + [(pad_f, pad_f), (pad_t, pad_t)]
    return jnp.pad(x, pads, mode="reflect")


def _sep_filter(x: jax.Array, kt: Sequence[float], kf: Sequence[float]) -> jax.Array:
    """Separable correlation over the last two axes (freq taps ``kf``,
    time taps ``kt``), reflect-101 border, via shifted-slice accumulation
    (static unroll; XLA fuses this into a handful of VPU passes)."""
    rt, rf = len(kt) // 2, len(kf) // 2
    p = _reflect101_pad(x, rf, rt)
    t_len = x.shape[-1]
    f_len = x.shape[-2]
    acc = None
    for i, c in enumerate(kt):
        s = p[..., :, i : i + t_len] * jnp.asarray(c, x.dtype)
        acc = s if acc is None else acc + s
    out = None
    for j, c in enumerate(kf):
        s = acc[..., j : j + f_len, :] * jnp.asarray(c, x.dtype)
        out = s if out is None else out + s
    return out


def gaussian_blur_u8(xu8: jax.Array, ksize: Tuple[int, int] = (31, 3)) -> jax.Array:
    """Bit-exact ``cv2.GaussianBlur(src, ksize, 0)`` on a uint8-valued image.

    ``xu8`` holds exact integers 0..255 (float32); ``ksize`` is OpenCV order
    (width=time taps, height=freq taps).  All intermediates are exact in
    float32 (max 255*256*256 < 2^24).  Rounds half-up and returns exact
    integers 0..255 as float32.
    """
    kw, kh = ksize
    kt = opencv_gauss_kernel_q88(kw)
    kf = opencv_gauss_kernel_q88(kh)
    acc = _sep_filter(xu8, list(kt), list(kf))  # Q16.16
    res = jnp.floor((acc + jnp.float32(32768.0)) * jnp.float32(1.0 / 65536.0))
    return jnp.clip(res, 0.0, 255.0)


def gaussian_blur(
    x: jax.Array,
    ksize: Tuple[int, int] = (31, 3),
    emulate_uint8: bool = True,
) -> jax.Array:
    """``gaussblr`` (pipeline_data.py:52-55): uint8-quantised blur then
    min-max rescale.  ``emulate_uint8=False`` skips quantisation (pure float
    separable Gaussian — smoother and cheaper, not reference-exact)."""
    if emulate_uint8:
        out = gaussian_blur_u8(to_uint8(x), ksize)
        return rescale(out)
    kt = _gauss_kernel_f64(ksize[0])
    kf = _gauss_kernel_f64(ksize[1])
    return rescale(_sep_filter(x, list(kt), list(kf)))


# ---------------------------------------------------------------------------
# grayscale morphology
# ---------------------------------------------------------------------------


def _morph_window(x: jax.Array, se: Tuple[int, int], is_max: bool) -> jax.Array:
    """Running max/min over an OpenCV WxH rect SE with default anchor.

    ``se`` is OpenCV order (width=time, height=freq).  Window source offsets
    are [-d//2, d-1-d//2] per axis; out-of-bounds ignored via +-inf padding.
    Implemented with lax.reduce_window (maps to the VPU's windowed reduce).
    """
    w, h = se
    lo_t, hi_t = w // 2, w - 1 - w // 2
    lo_f, hi_f = h // 2, h - 1 - h // 2
    nbatch = x.ndim - 2
    window = (1,) * nbatch + (h, w)
    strides = (1,) * x.ndim
    padding = [(0, 0)] * nbatch + [(lo_f, hi_f), (lo_t, hi_t)]
    if is_max:
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, window, strides, padding
        )
    return jax.lax.reduce_window(x, jnp.inf, jax.lax.min, window, strides, padding)


def dilate(x: jax.Array, se: Tuple[int, int]) -> jax.Array:
    return _morph_window(x, se, is_max=True)


def erode(x: jax.Array, se: Tuple[int, int]) -> jax.Array:
    return _morph_window(x, se, is_max=False)


def morph_close(x: jax.Array, se: Tuple[int, int]) -> jax.Array:
    return erode(dilate(x, se), se)


def morph_open(x: jax.Array, se: Tuple[int, int]) -> jax.Array:
    return dilate(erode(x, se), se)


def morph(
    x: jax.Array,
    close_se: Tuple[int, int] = (4, 4),
    open_se: Tuple[int, int] = (3, 1),
) -> jax.Array:
    """``morph`` (pipeline_data.py:64-72): uint8-quantise, CLOSE with a 4x4
    rect SE, OPEN with a 3x1 rect SE, then min-max rescale."""
    u8 = to_uint8(x)
    mask = morph_open(morph_close(u8, close_se), open_se)
    return rescale(mask)


# ---------------------------------------------------------------------------
# bilateral (dataset.ipynb cell 1; unused in the label pipeline)
# ---------------------------------------------------------------------------


def _bilateral_taps(d: int, sigma_space: float):
    """cv2's (offset, space-weight) tap list: circular neighbourhood of
    radius d//2, weights exp(r^2 * -0.5/ss^2) computed in float64 *via the
    same sqrt-then-square round trip* cv2 performs, then cast to float32."""
    radius = d // 2
    gsc = -0.5 / (sigma_space * sigma_space)
    taps = []
    for i in range(-radius, radius + 1):
        for j in range(-radius, radius + 1):
            r = np.sqrt(float(i * i + j * j))
            if r > radius:
                continue
            taps.append((i, j, np.float32(np.exp(r * r * gsc))))
    return radius, taps


def bilateral_u8(
    xu8: jax.Array, d: int = 15, sigma_color: float = 75.0, sigma_space: float = 75.0
) -> jax.Array:
    """Bit-exact ``cv2.bilateralFilter(src, d, sigma_color, sigma_space)`` on
    a uint8-valued image held as float32.

    Reproduces OpenCV's CV_8UC1 path arithmetic exactly (verified against
    cv2 5.0 on random images): 256-entry float32 range-weight LUT
    ``exp(i^2 * -0.5/sc^2)`` built in float64 then cast, circular d//2
    neighbourhood with float32 space weights, BORDER_REFLECT_101, and
    round-half-to-even of sum/wsum.  cv2's SIMD loop accumulates
    ``sum += val*w`` with a fused multiply-add (single rounding); TPU/XLA has
    no f32 FMA primitive, so it is emulated exactly: the product val*w needs
    only 8+24 = 32 significand bits, so splitting w (Veltkamp) makes the
    product error term exact, and a two_sum recovers the single-rounded
    result.  ``wsum += w`` is a plain f32 add, as in cv2.
    """
    radius, taps = _bilateral_taps(d, sigma_space)
    gcc = -0.5 / (sigma_color * sigma_color)
    color_lut = jnp.asarray(
        np.exp((np.arange(256, dtype=np.float64) ** 2) * gcc).astype(np.float32)
    )
    p = _reflect101_pad(xu8, radius, radius)
    f_len, t_len = xu8.shape[-2], xu8.shape[-1]
    idx0 = xu8.astype(jnp.int32)
    ssum = jnp.zeros_like(xu8)
    wsum = jnp.zeros_like(xu8)
    for (i, j, sw) in taps:
        val = p[..., radius + i : radius + i + f_len, radius + j : radius + j + t_len]
        w = sw * jnp.take(color_lut, jnp.abs(val.astype(jnp.int32) - idx0))
        # ssum = fma(val, w, ssum): exact product split + single rounding
        w_hi, w_lo = _split_f32(w)
        prod = val * w
        err = (val * w_hi - prod) + val * w_lo
        s, t = _two_sum(ssum, prod)
        ssum = s + (t + err)
        wsum = wsum + w
    return jnp.rint(ssum / wsum)


def bilateral(
    x: jax.Array, d: int = 15, sigma_color: float = 75.0, sigma_space: float = 75.0
) -> jax.Array:
    """``bilateral`` (dataset.ipynb cell 1): uint8-quantise, bit-exact
    cv2.bilateralFilter(d=15, 75, 75), then min-max rescale."""
    return rescale(bilateral_u8(to_uint8(x), d, sigma_color, sigma_space))


# ---------------------------------------------------------------------------
# the composed pipeline
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("cfg",))
def classical_pipeline(
    spec: jax.Array, cfg: PipelineConfig = PipelineConfig()
) -> jax.Array:
    """The reference's fixed 5-stage label pipeline (pipeline_data.py:100-110):

        quantfilt -> gaussblr(31,3) -> meansub -> morph -> meansub

    ``spec``: (..., freq, time) normalised log spectrogram(s) in [0, 1].
    Batched over leading axes; jitted once for all channels/shots.
    """
    x = quantile_filter(spec, cfg.quant_threshold)
    x = gaussian_blur(x, cfg.gauss_ksize, cfg.emulate_uint8)
    x = mean_subtract(x)
    x = morph(x, cfg.close_se, cfg.open_se)
    return mean_subtract(x)


def pipeline_stages(
    spec: jax.Array, cfg: PipelineConfig = PipelineConfig()
) -> dict:
    """All intermediate stages, for the stage-by-stage diagnostic plots
    (denoising_spectrogram.ipynb cells 4-5)."""
    out_quant = quantile_filter(spec, cfg.quant_threshold)
    out_gauss = gaussian_blur(out_quant, cfg.gauss_ksize, cfg.emulate_uint8)
    out_mean = mean_subtract(out_gauss)
    out_morph = morph(out_mean, cfg.close_se, cfg.open_se)
    out_final = mean_subtract(out_morph)
    return {
        "quant": out_quant,
        "gauss": out_gauss,
        "mean": out_mean,
        "morph": out_morph,
        "final": out_final,
    }
