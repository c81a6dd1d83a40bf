"""Sequence (time-axis) parallelism with halo exchange — the long-shot
mechanism.

The reference's "long sequence" story is truncate-to-2-seconds
(``cut_shot``, spec_denoising/pipeline_data.py:31) and local 128-column
tiles; nothing in the STFT, classical pipeline or conv-AE carries long-range
time state (SURVEY.md section 5).  So the TPU-native way to scale shot
length is to shard the TIME axis across devices and exchange only the small
halos each op needs:

* STFT: ``nperseg - hop`` raw samples from the right neighbour;
* 31-tap Gaussian blur: 15 spectrogram columns per side;
* 4x4 / 3x1 morphology: <=2 columns per side;
* global reductions (min/max rescale, per-row time means, quantiles over the
  unsharded freq axis) become ``pmin``/``pmax``/``psum`` over the mesh axis.

Everything lives in ONE ``shard_map`` so XLA overlaps the ``ppermute``
halo traffic (ICI neighbours) with local compute.

Frame bookkeeping: with T_local = k * hop samples per device and
r = nperseg/hop, each device owns k frames; the global frame count is
(T - nperseg)/hop + 1 = n*k - (r-1), so the LAST device's final r-1 frames
have no data.  Rather than masking them through every downstream global
reduction, they are replaced by copies of the last valid frame — harmless
to min/max (duplicate values), and they live in the trailing columns the
reference's ``patch`` drops anyway (SURVEY.md #17).  Callers wanting the
exact frame set slice ``[..., :-(r-1)]``.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from specenh.config import PipelineConfig, SpecParams
from specenh.ops.enhance import opencv_gauss_kernel_q88
from specenh.ops.stft import stft_basis

__all__ = [
    "sharded_spectrogram",
    "sharded_enhance",
    "usable_samples",
    "usable_samples_tiled",
    "make_sharded_enhance_shot",
]

_HI = jax.lax.Precision.HIGHEST


def usable_samples(n_samples: int, n_dev: int, sp: SpecParams) -> int:
    """Largest T <= n_samples with T divisible by n_dev * hop (equal shards,
    each a whole number of frames)."""
    q = n_dev * sp.hop
    return (n_samples // q) * q


# ---------------------------------------------------------------------------
# halo exchange helpers (inside shard_map)
# ---------------------------------------------------------------------------


def _recv_right(x, cols, axis_name):
    """Each device receives the FIRST ``cols`` columns (last axis) of its
    right neighbour; the last device receives zeros."""
    n = lax.psum(1, axis_name)
    perm = [(d + 1, d) for d in range(n - 1)]
    return lax.ppermute(x[..., :cols], axis_name, perm)


def _recv_left(x, cols, axis_name):
    """Each device receives the LAST ``cols`` columns of its left neighbour;
    device 0 receives zeros."""
    n = lax.psum(1, axis_name)
    perm = [(d, d + 1) for d in range(n - 1)]
    return lax.ppermute(x[..., -cols:], axis_name, perm)


def _extend_time(x, left, right, axis_name, edge: str):
    """Extend the local time axis with neighbour halos; at the GLOBAL edges
    use ``edge``: 'reflect101' (blur) or a constant value string ('0'/'255',
    morphology's ignore-border padding)."""
    n = lax.psum(1, axis_name)
    i = lax.axis_index(axis_name)
    parts = []
    if left > 0:
        halo_l = _recv_left(x, left, axis_name)
        if edge == "reflect101":
            edge_l = jnp.flip(x[..., 1 : left + 1], -1)
        else:
            edge_l = jnp.full_like(halo_l, float(edge))
        parts.append(jnp.where(i == 0, edge_l, halo_l))
    parts.append(x)
    if right > 0:
        halo_r = _recv_right(x, right, axis_name)
        if edge == "reflect101":
            edge_r = jnp.flip(x[..., -right - 1 : -1], -1)
        else:
            edge_r = jnp.full_like(halo_r, float(edge))
        parts.append(jnp.where(i == n - 1, edge_r, halo_r))
    return jnp.concatenate(parts, axis=-1)


def _gmin(x, axis_name):
    return lax.pmin(jnp.min(x, axis=(-2, -1), keepdims=True), axis_name)


def _gmax(x, axis_name):
    return lax.pmax(jnp.max(x, axis=(-2, -1), keepdims=True), axis_name)


def _grescale(x, axis_name):
    mn, mx = _gmin(x, axis_name), _gmax(x, axis_name)
    return (x - mn) / (mx - mn)


def _gto_u8(x, axis_name):
    return jnp.floor(_grescale(x, axis_name) * jnp.float32(255.0))


# ---------------------------------------------------------------------------
# sharded STFT
# ---------------------------------------------------------------------------


def _spectrogram_local(xl, sp: SpecParams, k: int, axis_name: str):
    """Per-shard body of the time-sharded STFT (inside shard_map): halo
    exchange + matmul STFT + global rescale.  ``xl``: (..., k*hop) local raw
    samples; returns (..., n_freqs_kept, k) local spectrogram columns."""
    r = sp.nperseg // sp.hop
    b_real, b_imag, weights = stft_basis(sp)
    halo = sp.nperseg - sp.hop
    n = lax.psum(1, axis_name)
    i = lax.axis_index(axis_name)
    x_ext = jnp.concatenate([xl, _recv_right(xl, halo, axis_name)], axis=-1)
    frames = _local_frames(x_ext, k, sp.nperseg, sp.hop)
    zr = jnp.matmul(frames, b_real, precision=_HI)
    zi = jnp.matmul(frames, b_imag, precision=_HI)
    psd = (zr * zr + zi * zi) * weights  # (..., k, F)
    # last device's final r-1 frames have no data: copy the last valid
    is_last = i == n - 1
    if r > 1:
        src = psd[..., k - r : k - r + 1, :]
        tail = jnp.broadcast_to(src, (*psd.shape[:-2], r - 1, psd.shape[-1]))
        fixed = jnp.where(is_last, tail, psd[..., k - r + 1 :, :])
        psd = jnp.concatenate([psd[..., : k - r + 1, :], fixed], axis=-2)
    sxx = jnp.log(psd + jnp.asarray(sp.eps, psd.dtype))
    sxx = jnp.swapaxes(sxx, -1, -2)  # (..., F, k)
    sxx = _grescale(sxx, axis_name)
    return sxx[..., : sp.n_freqs_kept, :]


def _local_frames(x_ext, k, nperseg, hop):
    """k frames from a local chunk extended with (nperseg - hop) right-halo
    samples, via shifted reshapes (same trick as ops.stft.frame_signal)."""
    r = nperseg // hop
    n_half = k - 1 + r
    blocks = x_ext[..., : n_half * hop].reshape(*x_ext.shape[:-1], n_half, hop)
    parts = [blocks[..., i : i + k, :] for i in range(r)]
    return jnp.concatenate(parts, axis=-1)


def sharded_spectrogram(
    x: jax.Array, sp: SpecParams, mesh: Mesh, axis: str = "time"
) -> jax.Array:
    """Reference-style normalised log spectrogram with the raw-trace time
    axis sharded over ``mesh``'s ``axis``.

    ``x``: (..., T) with T divisible by mesh_size * hop (see
    ``usable_samples``; callers trim).  Returns (..., n_freqs_kept, T/hop),
    sharded over the time axis, with the final (dataless) frame duplicated
    from its neighbour (see module docstring).

    Requires nperseg % hop == 0 (true for the reference's 50% overlap).
    """
    if sp.nperseg % sp.hop != 0:
        raise ValueError("sharded STFT requires nperseg % hop == 0")
    n_dev = mesh.shape[axis]
    t_total = x.shape[-1]
    if t_total % (n_dev * sp.hop) != 0:
        raise ValueError(
            f"T={t_total} not divisible by n_dev*hop={n_dev * sp.hop}; "
            "trim with usable_samples()"
        )
    k = t_total // (n_dev * sp.hop)
    r = sp.nperseg // sp.hop  # the last device's final r-1 frames lack data
    if k < r:
        raise ValueError(
            f"each shard must hold at least nperseg/hop={r} frames; got {k}"
        )
    def fn(xl):
        return _spectrogram_local(xl, sp, k, axis)

    spec_in = P(*([None] * (x.ndim - 1) + [axis]))
    spec_out = P(*([None] * (x.ndim - 1) + [None, axis]))
    return jax.jit(
        shard_map(fn, mesh=mesh, in_specs=(spec_in,), out_specs=spec_out)
    )(x)


# ---------------------------------------------------------------------------
# sharded classical pipeline
# ---------------------------------------------------------------------------


def _sharded_gauss_u8(u8, kt, kf, axis_name):
    """Bit-exact OpenCV Q8.8 Gaussian on a time-sharded uint8-valued image."""
    rt, rf = len(kt) // 2, len(kf) // 2
    t_len = u8.shape[-1]
    ext = _extend_time(u8, rt, rt, axis_name, "reflect101")
    acc = None
    for idx, c in enumerate(kt):
        s = ext[..., idx : idx + t_len] * jnp.float32(c)
        acc = s if acc is None else acc + s
    # freq axis is unsharded: reflect-101 pad locally
    pads = [(0, 0)] * (acc.ndim - 2) + [(rf, rf), (0, 0)]
    accp = jnp.pad(acc, pads, mode="reflect")
    f_len = u8.shape[-2]
    out = None
    for j, c in enumerate(kf):
        s = accp[..., j : j + f_len, :] * jnp.float32(c)
        out = s if out is None else out + s
    res = jnp.floor((out + jnp.float32(32768.0)) * jnp.float32(1.0 / 65536.0))
    return jnp.clip(res, 0.0, 255.0)


def _sharded_gauss_float(x, kt, kf, axis_name):
    """Pure-float separable Gaussian on a time-sharded image (the
    emulate_uint8=False branch of ops.enhance.gaussian_blur)."""
    rt, rf = len(kt) // 2, len(kf) // 2
    t_len = x.shape[-1]
    ext = _extend_time(x, rt, rt, axis_name, "reflect101")
    acc = None
    for idx, c in enumerate(kt):
        s_ = ext[..., idx : idx + t_len] * jnp.asarray(c, x.dtype)
        acc = s_ if acc is None else acc + s_
    pads = [(0, 0)] * (acc.ndim - 2) + [(rf, rf), (0, 0)]
    accp = jnp.pad(acc, pads, mode="reflect")
    f_len = x.shape[-2]
    out = None
    for j, c in enumerate(kf):
        s_ = accp[..., j : j + f_len, :] * jnp.asarray(c, x.dtype)
        out = s_ if out is None else out + s_
    return out


def _sharded_minmax_window(x, se, is_max, axis_name):
    """OpenCV rect-SE dilate/erode on a time-sharded image (same offsets as
    ops.enhance._morph_window: [-d//2, d-1-d//2] per axis)."""
    w, h = se
    lo_t, hi_t = w // 2, w - 1 - w // 2
    lo_f, hi_f = h // 2, h - 1 - h // 2
    pad_val = "0" if is_max else "255"
    ext = _extend_time(x, lo_t, hi_t, axis_name, pad_val)
    nb = x.ndim - 2
    window = (1,) * nb + (h, w)
    strides = (1,) * x.ndim
    padding = [(0, 0)] * nb + [(lo_f, hi_f), (0, 0)]
    if is_max:
        return lax.reduce_window(ext, -jnp.inf, lax.max, window, strides, padding)
    return lax.reduce_window(ext, jnp.inf, lax.min, window, strides, padding)


def _sharded_meansub(x, axis_name):
    """|x - global per-freq-row time mean|, globally rescaled."""
    local_sum = jnp.sum(x, axis=-1, keepdims=True)
    local_cnt = jnp.full_like(local_sum, x.shape[-1])
    mean = lax.psum(local_sum, axis_name) / lax.psum(local_cnt, axis_name)
    return _grescale(jnp.abs(x - mean), axis_name)


def _enhance_local(s, cfg: PipelineConfig, axis_name: str):
    """Per-shard body of the time-sharded 5-stage pipeline (inside
    shard_map).  Semantics match ops.enhance.classical_pipeline to ~1 ulp:
    the mean/min/max reductions are psums of per-shard partials, a
    different fp32 summation order than the unsharded jnp reductions, so
    a pixel sitting exactly on a uint8 quantisation threshold can flip by
    one level as the device count changes (test_sharded_enhance_bitexact
    uses atol=1e-5 for this reason)."""
    # quantfilt: freq axis unsharded -> purely local (same double-float
    # NumPy-exact quantile as the unsharded pipeline)
    from specenh.ops.enhance import quantile_filter

    x = quantile_filter(s, cfg.quant_threshold)
    # gaussblr
    if cfg.emulate_uint8:
        kt = list(opencv_gauss_kernel_q88(cfg.gauss_ksize[0]))
        kf = list(opencv_gauss_kernel_q88(cfg.gauss_ksize[1]))
        x = _gto_u8(x, axis_name)
        x = _sharded_gauss_u8(x, kt, kf, axis_name)
    else:
        from specenh.ops.enhance import _gauss_kernel_f64

        kt = list(_gauss_kernel_f64(cfg.gauss_ksize[0]))
        kf = list(_gauss_kernel_f64(cfg.gauss_ksize[1]))
        x = _sharded_gauss_float(x, kt, kf, axis_name)
    x = _grescale(x, axis_name)
    # meansub
    x = _sharded_meansub(x, axis_name)
    # morph: CLOSE(close_se) then OPEN(open_se) on uint8
    x = _gto_u8(x, axis_name)
    x = _sharded_minmax_window(x, cfg.close_se, True, axis_name)
    x = _sharded_minmax_window(x, cfg.close_se, False, axis_name)
    x = _sharded_minmax_window(x, cfg.open_se, False, axis_name)
    x = _sharded_minmax_window(x, cfg.open_se, True, axis_name)
    x = _grescale(x, axis_name)
    # final meansub
    return _sharded_meansub(x, axis_name)


def sharded_enhance(
    spec: jax.Array,
    mesh: Mesh,
    cfg: PipelineConfig = PipelineConfig(),
    axis: str = "time",
) -> jax.Array:
    """The 5-stage classical pipeline on a time-sharded spectrogram.

    Semantics match ops.enhance.classical_pipeline exactly (same fixed-point
    blur, same morphology offsets, same global normalisations — now computed
    with pmin/pmax/psum collectives).  ``spec``: (..., F, T_shard * n)."""
    n_dev = mesh.shape[axis]
    local_w = spec.shape[-1] // n_dev
    min_w = max(cfg.gauss_ksize[0] // 2, cfg.close_se[0], cfg.open_se[0]) + 1
    if local_w < min_w:
        raise ValueError(
            f"time shard width {local_w} < max halo {min_w}; use fewer "
            "devices or a longer shot"
        )

    def fn(s):
        return _enhance_local(s, cfg, axis)

    spec_last = P(*([None] * (spec.ndim - 1) + [axis]))
    return jax.jit(
        shard_map(fn, mesh=mesh, in_specs=(spec_last,), out_specs=spec_last)
    )(spec)


# ---------------------------------------------------------------------------
# the composed long-shot program: STFT -> pipeline -> conv-AE, one shard_map
# ---------------------------------------------------------------------------


def usable_samples_tiled(
    n_samples: int, n_dev: int, sp: SpecParams, tile_time: int = 128
) -> int:
    """Largest T <= n_samples such that every device's shard is a whole
    number of AE tiles: T divisible by n_dev * hop * tile_time."""
    q = n_dev * sp.hop * tile_time
    return (n_samples // q) * q


def make_sharded_enhance_shot(
    model_cfg=None,
    sp: SpecParams = SpecParams(),
    mesh: Mesh = None,
    ps=None,
    pipe_cfg: PipelineConfig = PipelineConfig(),
    axis: str = "time",
    dtype=None,
    n_samples: int = None,
    use_kernel: object = "auto",
    interpret: bool = False,
):
    """ONE device program taking a single long shot end-to-end across the
    mesh — the composed long-context path:

        raw trace (time-sharded)
          -> halo-exchange STFT                (_spectrogram_local)
          -> sharded 5-stage classical pipeline (_enhance_local)
          -> conv-AE on the shard's tiles       (tiles are SAME-padded and
             independent, SURVEY.md section 5 — the tile axis IS the time
             axis, so no halo is needed)
          -> restitch (local unpatch)

    Returns jitted ``fn(params, trace) -> (spec, labels, enhanced)``, each
    (..., F, T/hop) sharded over ``axis``.  ``trace``: (T,) or (C, T) —
    at most ONE leading channel axis — with T divisible by
    mesh_size * hop * tile_time (``usable_samples_tiled``).  ``mesh`` is
    required.
    This is the multi-device composition of the reference workload
    (spec_denoising/pipeline_data.py:31 truncate-and-tile +
    VAE/hyperparam_scan.py:30-38 tiling + VAE/graphs.ipynb cells 2-9
    predict-and-restitch) for shots longer than one device's HBM/compute.

    ``n_samples``: the trace length (defaults to ``sp.n_samples``), used to
    validate the geometry eagerly.

    ``use_kernel``: the conv-AE stage runs as the fused Pallas serving
    kernel (ops.ae_kernel / ops.ae3_kernel — 2-3x the XLA conv path,
    measured) on each time-shard's local tiles — the kernel is per-tile
    and the tile axis IS the time axis, so it composes with the halo
    machinery unchanged.  "auto" enables it off-CPU on covered
    geometries, True forces (raises if uncovered), False keeps the Flax
    model.  Pass the pre-scattered handle (``fn.prepare(params)``) to
    skip the per-params scatter, exactly like bench.harness serving.
    """
    from specenh.config import ModelConfig, PatchSpec
    from specenh.data.tiles import patch, unpatch
    from specenh.models.autoencoder import make_model

    model_cfg = model_cfg or ModelConfig()
    ps = ps or PatchSpec()
    model = make_model(model_cfg, dtype=dtype)
    if mesh is None:
        raise ValueError("make_sharded_enhance_shot requires a mesh")
    n_dev = mesh.shape[axis]
    t_total = sp.n_samples if n_samples is None else n_samples
    if t_total % (n_dev * sp.hop) != 0:
        raise ValueError(
            f"T={t_total} not divisible by n_dev*hop={n_dev * sp.hop}; trim "
            "with usable_samples_tiled()"
        )
    k = t_total // (n_dev * sp.hop)  # frames per shard
    if k % ps.tile_time != 0:
        raise ValueError(
            f"frames/shard {k} not a whole number of {ps.tile_time}-frame "
            "tiles; trim with usable_samples_tiled()"
        )
    if sp.nperseg % sp.hop != 0:
        raise ValueError("sharded STFT requires nperseg % hop == 0")
    if k < sp.nperseg // sp.hop:
        raise ValueError("each shard must hold at least nperseg/hop frames")
    if model_cfg.input_shape[:2] != (sp.n_freqs_kept, ps.tile_time):
        raise ValueError(
            f"model input {model_cfg.input_shape[:2]} != tile geometry "
            f"({sp.n_freqs_kept}, {ps.tile_time})"
        )
    k_tiles = k // ps.tile_time

    from specenh.bench.harness import _kernel_family, _with_prepared_weights

    build_wts, _, kernel_enhance_specs = _kernel_family(model_cfg)
    if use_kernel is True and build_wts is None:
        raise NotImplementedError(
            f"no fused kernel covers this geometry: {model_cfg}"
        )
    kernel_on = build_wts is not None and (
        use_kernel is True
        or (use_kernel == "auto" and jax.default_backend() not in ("cpu",))
    )

    if kernel_on:

        def fn(wts, xl):
            s = _spectrogram_local(xl, sp, k, axis)  # (..., F, k)
            labels = _enhance_local(s, pipe_cfg, axis)
            was2d = s.ndim == 2
            s3 = s[None] if was2d else s
            # the fused serving fast path on the shard's local tiles
            # (Pallas corner-turn in, kernel, corner-turn out == the
            # patch -> apply -> unpatch below)
            enh = kernel_enhance_specs(wts, s3, k_tiles, interpret=interpret)
            if was2d:
                enh = enh[0]
            return s, labels, enh

    else:

        def fn(params, xl):
            s = _spectrogram_local(xl, sp, k, axis)  # (..., F, k)
            labels = _enhance_local(s, pipe_cfg, axis)
            was2d = s.ndim == 2
            tiles = patch(s, ps)[..., None]  # (n_batch*k_tiles, F, w, 1)
            pred = model.apply(params, tiles)
            enh = unpatch(jnp.squeeze(pred, -1), ps, tiles_per_spec=k_tiles)
            if was2d:
                enh = enh[0]
            return s, labels, enh

    def wrapped(params, trace):
        nb = trace.ndim - 1  # leading channel axis replicated
        if nb > 1:
            raise ValueError(
                f"trace must be (T,) or (C, T), got {trace.shape} — "
                "data.tiles.patch takes one leading axis"
            )
        tr_spec = P(*([None] * nb + [axis]))
        o_spec = P(*([None] * nb + [None, axis]))
        f = shard_map(
            fn, mesh=mesh, in_specs=(P(), tr_spec),
            out_specs=(o_spec, o_spec, o_spec),
            # kernel path: pallas_call outputs carry no varying-mesh-axes
            # info, so the vma checker can't track them (same caveat as
            # the channel-sharded kernel serving in bench.harness)
            check_vma=not kernel_on,
        )
        return f(params, trace)

    jf = jax.jit(wrapped)

    if not kernel_on:

        def fn_out(params, trace):
            return jf(params, trace)

        fn_out.prepare = lambda params: params
        return fn_out

    return _with_prepared_weights(jf, build_wts, model_cfg)
