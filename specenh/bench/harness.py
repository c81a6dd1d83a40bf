"""Benchmark harness: the fused raw-shot -> enhanced-spectrograms service.

This is the production inference path (BASELINE.json headline config): a
multi-channel raw digitizer shot goes through STFT -> tiling -> conv-AE
denoise -> restitch, all inside ONE jit so XLA fuses the epilogues and keeps
everything resident in HBM.  The CPU reference for the same work is SciPy's
spectrogram + Keras predict (VAE/hyperparam_scan.py:214-244 recipe).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from specenh.config import ModelConfig, PatchSpec, SpecParams
from specenh.data.tiles import n_tiles_for, patch, unpatch
from specenh.models.autoencoder import make_model
from specenh.ops.stft import spectrogram

__all__ = ["make_enhance_shot_fn", "make_production_predict_fn", "time_fn",
           "example_shot"]


def _prepared_types():
    """The device-ready scattered-weight handle types the serving fns
    accept in place of Flax params (see ``fn.prepare``)."""
    from specenh.ops.ae3_kernel import AE3KernelWeights
    from specenh.ops.ae_kernel import AEKernelWeights

    return (AEKernelWeights, AE3KernelWeights)


def _with_prepared_weights(inner, build_wts, model_cfg, validate=None):
    """Wrap ``inner(wts, *args)`` as ``fn(params_or_handle, *args)`` with
    the pre-scattered-weight protocol shared by every kernel serving
    factory (round-4 verdict #5):

    * ``fn.prepare(params)`` -> device weight handle (idempotent);
      resident services build it once and pass it in place of Flax
      params — the hot path then skips the scatter and the cache.
    * raw Flax params still work: a one-entry id-keyed cache scatters on
      first use (the strong reference to params prevents id() reuse
      after GC).

    ``validate`` (optional) runs on the call args before dispatch."""
    prepared = _prepared_types()
    wts_cache = {}

    def fn(params, *args):
        if validate is not None:
            validate(*args)
        if isinstance(params, prepared):
            return inner(params, *args)
        hit = wts_cache.get(id(params))
        if hit is None or hit[0] is not params:
            wts_cache.clear()
            wts_cache[id(params)] = (params, build_wts(params, model_cfg))
        return inner(wts_cache[id(params)][1], *args)

    def prepare(params):
        if isinstance(params, prepared):
            return params
        return build_wts(params, model_cfg)

    fn.prepare = prepare
    return fn


def make_production_predict_fn(
    model_cfg: ModelConfig,
    dtype=jnp.bfloat16,
    use_kernel: object = "auto",
    interpret: bool = False,
) -> Callable:
    """Tile-batch predictor on the PRODUCTION inference path: the fused
    Pallas kernel when the geometry supports it (TPU, bf16), else the
    jitted Flax model.  fn(params, tiles(B,256,128,1)) -> probabilities.

    This is what ``specenh sweep``'s per-config ``pred_times`` artifact
    times (manual_scan.py:226-248 parity) — the reference times its own
    serving path, so ours must time the kernel where the kernel serves."""
    build_wts, kernel_apply, _ = _kernel_family(model_cfg)

    if use_kernel is True and build_wts is None:
        # same contract as make_enhance_shot_fn: forcing the kernel on an
        # uncovered geometry is an error, not a silent Flax fallback (a
        # benchmark labelled 'kernel' must measure the kernel)
        raise NotImplementedError(
            f"no fused kernel covers this geometry: filters="
            f"{model_cfg.filters} kernels={model_cfg.kernels}"
        )
    kernel_on = use_kernel is True or (
        use_kernel == "auto"
        and dtype == jnp.bfloat16
        and build_wts is not None
        and jax.default_backend() not in ("cpu",)
    )
    if not kernel_on or build_wts is None:
        model = make_model(model_cfg, dtype=dtype)
        jf = jax.jit(lambda params, tiles: model.apply(params, tiles))

        def fn(params, tiles):
            return jf(params, tiles)

        fn.prepare = lambda params: params  # Flax path: nothing to scatter
        return fn

    return _with_prepared_weights(
        lambda wts, tiles: kernel_apply(wts, tiles, interpret=interpret),
        build_wts, model_cfg,
    )


def _kernel_family(model_cfg: ModelConfig):
    """(build_weights, apply, enhance_specs) for the fused-kernel family
    covering ``model_cfg`` — depth-2 (ops.ae_kernel) or depth-3
    (ops.ae3_kernel) — or (None, None, None) when no kernel covers it."""
    from specenh.ops import ae3_kernel, ae_kernel

    if ae_kernel.supports(model_cfg):
        return (ae_kernel.build_kernel_weights, ae_kernel.ae_kernel_apply,
                ae_kernel.ae_kernel_enhance_specs)
    if ae3_kernel.supports3(model_cfg):
        return (ae3_kernel.build_kernel3_weights, ae3_kernel.ae3_kernel_apply,
                ae3_kernel.ae3_kernel_enhance_specs)
    return None, None, None


def make_enhance_shot_fn(
    model_cfg: ModelConfig = ModelConfig(),
    sp: SpecParams = SpecParams(),
    ps: PatchSpec = PatchSpec(),
    dtype=jnp.bfloat16,
    mesh=None,
    axis: str = "data",
    use_kernel: object = "auto",
    stft_mode: str = "auto",
    interpret: bool = False,
    n_channels: Optional[int] = None,
) -> Callable:
    """Returns jitted fn(params, traces) -> (specs, enhanced):
    traces (C, n_samples) -> specs (C, 256, 3905), enhanced (C, 256, 3840).

    The conv-AE runs in ``dtype`` (bfloat16 by default — ~2x MXU throughput,
    float32 params; output SSIM vs the fp32 path is >0.999).  With the
    default bfloat16 the STFT uses the BF16_BF16_F32_X3 dot algorithm
    (SSIM 1.000000 / max |err| 8e-4 vs the golden HIGHEST path); pass
    dtype=None for full float32-HIGHEST everywhere.

    ``use_kernel``: on TPU with a covered geometry and bf16, the conv-AE
    runs as a single fused Pallas kernel — specenh.ops.ae_kernel for the
    depth-2 family (2.1-3.1x the XLA conv pipeline, measured), or
    specenh.ops.ae3_kernel for depth-3 (the deep3 preset).  "auto" enables
    it exactly in that case; True forces, False disables (the Flax path).

    With ``mesh`` given, the service scales out: channels are sharded over
    ``axis`` (params replicated) and each chip enhances its slice — the
    multi-chip serving configuration (the axis size must divide the
    channel count).
    The fused kernel rides ``shard_map`` there: every device runs the same
    single-chip Pallas program on its channel block (the service has no
    cross-channel coupling — STFT min-max is per-channel — so no
    collectives are needed).

    ``stft_mode``: "auto" runs the split-basis Pallas STFT with the
    (F,T) output produced by an IN-KERNEL transpose (``ops.stft_fused.
    spectrogram_fused``) where eligible — measured 4-6% faster than the
    XLA front in paired A/B (5.63 vs 5.90 ms/shot, SSIM-identical;
    round 5 — the Mosaic wall that retired this kernel is gone).  "xla"
    opts back to the XLA matmul front.  "fused" is the (T,F)-layout
    variant whose corner-turn absorbs the transpose: it wins for
    x16-only consumers (1.188 vs 1.450 ms traces->x16) but its specs
    output costs a re-read, so it lost as the service default
    (round-3 measurement) and stays opt-in.

    ``interpret`` runs the Pallas kernels in interpreter mode (CPU tests).
    """
    model = make_model(model_cfg, dtype=dtype)
    # bf16 single-pass STFT: SSIM 0.99993 vs the golden HIGHEST path (gate
    # is 0.99) and ~0.7 ms faster than the x3 algorithm; the enhanced-output
    # gate (>= 0.999 vs the fp32 service) is enforced in bench.py.
    stft_prec = (
        jax.lax.DotAlgorithmPreset.BF16_BF16_F32
        if dtype == jnp.bfloat16
        else None
    )

    k_tiles = n_tiles_for(sp.n_frames, ps)
    if k_tiles < 1:
        raise ValueError(
            f"shot too short to tile: {sp.n_frames} frames < tile width {ps.tile_time}"
        )

    build_wts, _, kernel_enhance_specs = _kernel_family(model_cfg)

    # the kernel's shard_map serving form requires the channel count to
    # divide the mesh axis (every device runs the same per-block Pallas
    # program); the Flax jit/in_shardings path tolerates uneven sharding —
    # in auto mode with a mesh, route non-divisible channel counts there
    mesh_even = mesh is None or (
        n_channels is not None and n_channels % mesh.shape[axis] == 0
    )
    if use_kernel is True and build_wts is None:
        raise NotImplementedError(
            f"no fused kernel covers this geometry: {model_cfg}"
        )
    kernel_on = build_wts is not None and (
        use_kernel is True
        or (
            use_kernel == "auto"
            and dtype == jnp.bfloat16
            and mesh_even
            and jax.default_backend() not in ("cpu",)
        )
    )

    from specenh.ops import ae_kernel as _aek
    from specenh.ops import stft_fused as _sf

    fused_eligible = (
        kernel_on
        and dtype == jnp.bfloat16
        and _sf.supported(sp)
        and _aek.supports(model_cfg)
    )
    if stft_mode not in ("auto", "fused", "fused_ft", "xla"):
        raise ValueError(
            f"stft_mode must be auto/fused/fused_ft/xla: {stft_mode}"
        )
    if stft_mode == "fused" and not fused_eligible:
        raise NotImplementedError(
            "stft_mode='fused' needs the depth-2 fused kernel serving in "
            f"bf16 with the reference STFT geometry: {model_cfg}, {sp}"
        )
    # 'fused_ft': the split-basis STFT kernel with the (F, T) output
    # produced by an IN-KERNEL transpose (round-5 — the Mosaic wall that
    # retired it is gone, scripts/probe_mosaic_walls.py) feeding the
    # standard corner-turn; only needs the kernel serving path + geometry
    ft_eligible = (
        kernel_on and dtype == jnp.bfloat16 and _sf.supported(sp)
    )
    if stft_mode == "fused_ft" and not ft_eligible:
        raise NotImplementedError(
            "stft_mode='fused_ft' needs kernel serving in bf16 with the "
            f"reference STFT geometry: {model_cfg}, {sp}"
        )
    # auto: the (F,T) split-basis kernel front where eligible — measured
    # 4-6% faster than the XLA front in paired A/B on the v5e (5.63 vs
    # 5.90 ms/shot, SSIM-identical; PERF_NOTES round 5), the round-3
    # serialization penalty gone with the in-kernel transpose.  'xla'
    # opts back out; 'fused' stays the x16-only (T,F) variant.
    fused_front = stft_mode == "fused"
    # (auto adopts it off-CPU only: CPU harnesses that FORCE the AE
    # kernel with interpret=True keep the XLA front and its tolerances)
    ft_front = stft_mode == "fused_ft" or (
        stft_mode == "auto" and ft_eligible
        and jax.default_backend() not in ("cpu",)
    )

    if kernel_on:

        if fused_front:

            nf = sp.n_frames  # static: the jit-returned count is traced

            def kernel_body(wts, traces):
                a, mn, mx, _ = _sf.stft_tf_log(traces, sp,
                                               interpret=interpret)
                i_ = _aek.enhance_interleave(wts, k_tiles)
                x16 = _sf.specs_tf_to_x16_2d(a, mn, mx, k_tiles, i_,
                                             interpret)
                enhanced = _aek.ae_kernel_enhance_x16(
                    wts, x16, k_tiles, i_, interpret=interpret
                )
                return _sf.normalized_specs(a, mn, mx, nf), enhanced

        elif ft_front:

            # (a norm-fused variant that feeds the x16 turn from the RAW
            # (F,T) log-PSD — specs_ft_to_x16_2d — measured DEAD EVEN
            # with this simple form: XLA already overlaps the epilogue
            # and the turn; see PERF_NOTES round 5)
            def kernel_body(wts, traces):
                specs = _sf.spectrogram_fused(traces, sp, interpret=interpret)
                return specs, kernel_enhance_specs(
                    wts, specs, k_tiles, interpret=interpret
                )

        else:

            def kernel_body(wts, traces):
                specs = spectrogram(traces, sp, precision=stft_prec)
                return specs, kernel_enhance_specs(
                    wts, specs, k_tiles, interpret=interpret
                )

        if mesh is None:
            enhance_shot_kernel = jax.jit(kernel_body)
        else:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            enhance_shot_kernel = jax.jit(
                shard_map(
                    kernel_body,
                    mesh=mesh,
                    in_specs=(P(), P(axis)),
                    out_specs=(P(axis), P(axis)),
                    # pallas_call outputs carry no varying-mesh-axes info,
                    # so the vma checker can't see them; the body is
                    # per-channel (no collectives), replication is trivial
                    check_vma=False,
                )
            )

        def check_channels(traces):
            if mesh is not None and traces.shape[0] % mesh.shape[axis]:
                raise ValueError(
                    f"fused-kernel serving over a mesh needs the channel "
                    f"count ({traces.shape[0]}) divisible by the "
                    f"'{axis}' axis size ({mesh.shape[axis]}); use the "
                    "Flax path (use_kernel=False) for uneven counts"
                )

        return _with_prepared_weights(
            enhance_shot_kernel, build_wts, model_cfg,
            validate=check_channels,
        )

    def enhance_shot(params, traces):
        specs = spectrogram(traces, sp, precision=stft_prec)  # (C, F, T)
        tiles = patch(specs, ps)[..., None]  # (C*k, F, w, 1)
        pred = model.apply(params, tiles)  # sigmoid probabilities
        return specs, unpatch(jnp.squeeze(pred, -1), ps, tiles_per_spec=k_tiles)

    if mesh is None:
        jf = jax.jit(enhance_shot)
    else:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        chan = NamedSharding(mesh, P(axis))
        jf = jax.jit(
            enhance_shot,
            in_shardings=(repl, chan),
            out_shardings=(chan, chan),
        )

    def fn(params, traces):
        return jf(params, traces)

    fn.prepare = lambda params: params  # Flax path: nothing to scatter
    return fn


def example_shot(
    sp: SpecParams = SpecParams(), n_channels: int = 20, seed: int = 0
) -> np.ndarray:
    """Synthetic 20-channel ECE-like shot (chirp + tone + noise)."""
    rng = np.random.default_rng(seed)
    t = np.arange(sp.n_samples) / sp.fs
    out = np.stack(
        [
            np.sin(2 * np.pi * (5e4 + 2e4 * t) * t + k)
            + 0.3 * np.sin(2 * np.pi * 1.2e5 * t)
            + 0.5 * rng.standard_normal(t.size)
            for k in range(n_channels)
        ]
    )
    return out.astype(np.float32)


def _sync(out):
    """Force execution to finish.  NOTE: under the tunnelled 'axon' platform
    ``jax.block_until_ready`` returns before the device is done; pulling a
    tiny slice to host is the reliable sync."""
    leaf = jax.tree_util.tree_leaves(out)[-1]
    np.asarray(leaf.ravel()[:1])


def time_fn(fn, *args, iters: int = 32, warmup: int = 2) -> float:
    """Per-call wall-clock seconds, measured by the SLOPE between 1 and
    ``iters`` chained dispatches (single sync each) — this cancels the
    host<->device round-trip latency, which on a tunnelled TPU (~50 ms RTT)
    would otherwise dominate millisecond-scale kernels."""
    for _ in range(warmup):
        _sync(fn(*args))

    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        _sync(out)
        return time.perf_counter() - t0

    best = []
    for _ in range(3):
        t1 = run(1)
        tk = run(iters + 1)
        best.append((tk - t1) / iters)
    return float(np.median(best))
