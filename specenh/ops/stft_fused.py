"""Fused (T,F)-layout STFT Pallas kernel + mirrored corner-turn.

The production front-end (``ops.stft.spectrogram`` + ``parity_turn.
specs_to_x16_2d``) materializes the spectrogram in (F, T) layout, which
costs a hardware transpose somewhere: either XLA's transpose engine
(~150 GB/s) or the corner-turn's one-hot gather.  This module flips the
dataflow: the STFT kernel writes log-PSD blocks in their NATURAL (T, F)
layout (frames are the matmul M dim), and the corner-turn absorbs the
(T,F)->(F,T) transpose into its one-hot gather for free — ``sel =
dot_general(natT, colsel, contract dim0.dim0)`` is the MXU's native
lhsT dataflow, so no transpose op ever exists.

Measured on the v5e (20-channel reference shot, slope-timed):

* STFT kernel (log-PSD + in-kernel min/max partials): 0.789 ms vs
  1.358 ms for the XLA bf16 single-pass spectrogram.
* mirrored corner-turn (normalize + transpose + gather): 0.253 ms vs
  0.740 ms for XLA normalize+transpose + ``specs_to_x16_2d``.
* composed traces -> x16 (the AE kernel's operand): 1.188 ms vs
  1.450 ms (-18%); with the (F, T) specs output also materialized
  (the serving contract persists specs, serve.py writer): 1.395 ms
  (-4%) — the specs output forces one full re-read + transposed write,
  which is the bandwidth floor of that contract.
* BUT the FULL service measured SLOWER with the (T,F) variant:
  6.1-7.7 ms/shot vs 5.7-5.9 for the XLA front-end — the specs output
  re-read plus a fourth serialized Pallas call lost the overlap XLA
  gives the spectrogram stage.  "fused" therefore stays an opt-in for
  x16-only consumers that skip the specs output (measured -18% there).

ROUND 5: the Mosaic wall that forced the (T,F) layout is GONE — the
current toolchain compiles in-kernel transposes and offset-1 sublane
slices (scripts/probe_mosaic_walls.py).  ``stft_ft_log`` writes each
block in the NATURAL (F,T) contract via an in-kernel ``out.T``, and
``spectrogram_fused`` is a drop-in for ``ops.stft.spectrogram`` whose
normalize+slice is a cheap fused XLA epilogue.  The specs re-read no
longer exists, and the full service measures FASTER: paired A/B on the
v5e, 5.63 vs 5.90 ms/shot (4-6%, SSIM-identical).  The harness's
stft_mode="auto" now uses it off-CPU (PERF_NOTES "Round 5").

Kernel facts the design leans on (see PERF_NOTES.md):

* The merged detrend ⊙ window ⊙ DFT basis is split at the hop boundary
  into two (hop, 768) halves — frame t is ``hb[t] @ b0 + hb[t+1] @ b1``
  over hop-aligned trace blocks, so the kernel DMAs each (FB+8, hop)
  trace window ONCE and gets the overlapped frame via a sublane roll.
* Real/imag parts ride one matmul as lane-packed halves (lanes 0..256
  and 384..640 of the 768-lane basis); the PSD epilogue squares and
  folds them in-register.
* Per-block min/max partials come out as a second tiny output, so the
  reference's pre-drop min-max normalization domain (ALL one-sided
  freqs incl. Nyquist, quirk — see ops/stft.py) needs no second pass
  over the 80 MB log-PSD array.

Reference parity: the spectrogram semantics match scipy.signal.
spectrogram as pinned by ops/stft.py (pipeline_data.py:21-27); this
module only changes the layout the bits are produced in.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from specenh.config import SpecParams
from specenh.ops.ae_kernel import CS, CT, LANES, _mm
from specenh.ops.parity_turn import _colsel, pick_interleave

__all__ = ["supported", "stft_tf_log", "stft_ft_log", "spectrogram_fused",
           "specs_tf_to_x16_2d", "normalized_specs"]

FB = 256  # frames per STFT grid block (f32 sublane multiple)


def supported(sp: SpecParams) -> bool:
    """The kernel's packing is built for the reference STFT geometry:
    256 spectrogram rows (nperseg 512 -> 257 one-sided freqs <= the
    384-lane pack) and half-overlap (hop == nperseg/2, so each frame
    spans exactly two hop-aligned blocks)."""
    return sp.nperseg == 512 and sp.hop == 256


# ---------------------------------------------------------------------------
# (T,F) STFT kernel: hop-block DMA + roll, merged padded basis, log-PSD out
# ---------------------------------------------------------------------------


def _basis_padded(sp: SpecParams, dtype):
    """[Br | Bi] each padded to 384 lanes, split into the two hop halves.
    Returns (b0, b1, wpad): b0/b1 (hop, 768), wpad (768,) carrying the
    one-sided PSD weights in lanes 0..256 and 384..640 (zeros elsewhere)."""
    from specenh.ops.stft import _basis_np

    br, bi, scale = _basis_np(sp.nperseg, sp.detrend, sp.fs, sp.scaling,
                              sp.window)
    nf = br.shape[1]  # 257
    assert nf <= 384
    w = np.full(nf, 2.0 * scale)
    w[0] = scale
    if sp.nperseg % 2 == 0:
        w[-1] = scale
    pack = np.zeros((sp.nperseg, 768), np.float64)
    pack[:, :nf] = br
    pack[:, 384:384 + nf] = bi
    wpad = np.zeros((768,), np.float64)
    wpad[:nf] = w
    wpad[384:384 + nf] = w
    hop = sp.hop
    return (jnp.asarray(pack[:hop], dtype), jnp.asarray(pack[hop:], dtype),
            jnp.asarray(wpad, jnp.float32))


def _stft_tf_kernel(hb_ref, b0_ref, b1_ref, w_ref, out_ref, mm_ref,
                    scratch, sem, *, eps, nblk, rows_pc, bf16, n_frames,
                    ft_out=False):
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    c = i // nblk
    b = i % nblk
    base = c * rows_pc + b * FB
    cp = pltpu.make_async_copy(hb_ref.at[pl.ds(base, FB + 8)], scratch, sem)
    cp.start()
    cp.wait()
    blk = scratch[...]
    p0 = blk[:FB]                                  # hop block t
    p1 = pltpu.roll(blk, FB + 7, axis=0)[:FB]      # hop block t+1
    if bf16:
        p0 = p0.astype(jnp.bfloat16)
        p1 = p1.astype(jnp.bfloat16)
        b0 = b0_ref[...].astype(jnp.bfloat16)
        b1 = b1_ref[...].astype(jnp.bfloat16)
        prec = None
    else:
        b0 = b0_ref[...]
        b1 = b1_ref[...]
        prec = jax.lax.Precision.HIGHEST
    dn = (((1,), (0,)), ((), ()))
    z = jax.lax.dot_general(p0, b0, dn, precision=prec,
                            preferred_element_type=jnp.float32)
    z = z + jax.lax.dot_general(p1, b1, dn, precision=prec,
                                preferred_element_type=jnp.float32)
    psd = z[:, :384] * z[:, :384] + z[:, 384:] * z[:, 384:]
    out = jnp.log(psd * w_ref[...][:384] + eps)
    if ft_out:
        # in-kernel transpose: write the block in the NATURAL (F, T)
        # contract directly.  This was the Mosaic wall that retired the
        # round-3 kernel ("in-kernel z.T hangs the compiler",
        # PERF_NOTES "Pallas split-basis STFT kernel") — the current
        # toolchain compiles it (scripts/probe_mosaic_walls.py).
        out_ref[0] = out.T
    else:
        out_ref[0] = out
    # min/max partials over the valid (row < n_frames - b*FB, lane <= 256)
    # region — the reference normalizes over the FULL one-sided spectrum
    # incl. Nyquist (the pre-drop quirk, ops/stft.py / pipeline_data.py:27)
    rows = jax.lax.broadcasted_iota(jnp.int32, out.shape, 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, out.shape, 1)
    valid = (rows < (n_frames - b * FB)) & (lanes <= 256)
    big = jnp.float32(np.inf)
    mn = jnp.min(jnp.where(valid, out, big))
    mx = jnp.max(jnp.where(valid, out, -big))
    mm_ref[0] = jnp.stack([
        jnp.full((128,), mn, jnp.float32),
        jnp.full((128,), mx, jnp.float32),
    ])


def _stft_log(traces, sp: SpecParams, bf16: bool, interpret: bool,
              ft_out: bool):
    """Shared wrapper for both output layouts — only the first output's
    BlockSpec/shape differ (in-kernel ``out.T`` when ``ft_out``)."""
    from jax.experimental.pallas import tpu as pltpu

    if not supported(sp):
        raise NotImplementedError(f"fused STFT needs nperseg=512/hop=256: {sp}")
    hop = sp.hop
    n_frames = (sp.n_samples - sp.nperseg) // hop + 1
    n_half = n_frames + 1
    nblk = -(-n_frames // FB)
    rows_pc = nblk * FB + 8
    c = traces.shape[0]
    hb = traces[:, :n_half * hop].reshape(c, n_half, hop)
    hb = jnp.pad(hb, ((0, 0), (0, rows_pc - n_half), (0, 0)))
    hb = hb.reshape(c * rows_pc, hop)
    b0, b1, wpad = _basis_padded(sp, jnp.float32)
    if ft_out:
        out_spec = pl.BlockSpec((1, 384, FB),
                                lambda i: (i // nblk, 0, i % nblk))
        out_shape = jax.ShapeDtypeStruct((c, 384, nblk * FB), jnp.float32)
    else:
        out_spec = pl.BlockSpec((1, FB, 384),
                                lambda i: (i // nblk, i % nblk, 0))
        out_shape = jax.ShapeDtypeStruct((c, nblk * FB, 384), jnp.float32)
    out, mm = pl.pallas_call(
        functools.partial(_stft_tf_kernel, eps=float(sp.eps), nblk=nblk,
                          rows_pc=rows_pc, bf16=bf16, n_frames=n_frames,
                          ft_out=ft_out),
        grid=(c * nblk,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((hop, 768), lambda i: (0, 0)),
            pl.BlockSpec((hop, 768), lambda i: (0, 0)),
            pl.BlockSpec((768,), lambda i: (0,)),
        ],
        out_specs=[
            out_spec,
            pl.BlockSpec((1, 2, 128), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            out_shape,
            jax.ShapeDtypeStruct((c * nblk, 2, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((FB + 8, hop), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(hb, b0, b1, wpad)
    mm = mm.reshape(c, nblk, 2, 128)
    mn = jnp.min(mm[:, :, 0, :], axis=(1, 2)).reshape(c, 1)
    mx = jnp.max(mm[:, :, 1, :], axis=(1, 2)).reshape(c, 1)
    return out, mn, mx, n_frames


@functools.partial(jax.jit, static_argnames=("sp", "bf16", "interpret"))
def stft_tf_log(traces, sp: SpecParams, bf16: bool = True,
                interpret: bool = False):
    """(C, >=n_samples) traces -> ((C, Tpad, 384) f32 log-PSD in (T, F)
    layout, (C, 1) min, (C, 1) max, n_frames).  Lanes 0..256 are the
    one-sided freqs (incl. Nyquist); 257..383 hold log(eps) (weight 0).
    min/max are over the valid (frame, freq <= Nyquist) region — the
    reference's pre-drop normalization domain.  Tpad = ceil(nf/FB)*FB;
    rows >= n_frames are padding."""
    return _stft_log(traces, sp, bf16, interpret, ft_out=False)


@functools.partial(jax.jit, static_argnames=("sp", "bf16", "interpret"))
def stft_ft_log(traces, sp: SpecParams, bf16: bool = True,
                interpret: bool = False):
    """(C, >=n_samples) traces -> ((C, 384, Tpad) f32 log-PSD in the
    NATURAL (F, T) layout, (C, 1) min, (C, 1) max, n_frames).

    Same math as ``stft_tf_log`` with the (T,F)->(F,T) transpose done
    IN-KERNEL per block (the transpose unit, overlapping the next
    block's DMA+matmul) — no XLA transpose pass and no re-read.  Rows
    0..256 are the one-sided freqs (incl. Nyquist); 257..383 are
    padding; columns >= n_frames are padding."""
    return _stft_log(traces, sp, bf16, interpret, ft_out=True)


@functools.partial(jax.jit, static_argnames=("sp", "bf16", "interpret"))
def spectrogram_fused(traces, sp: SpecParams, bf16: bool = True,
                      interpret: bool = False):
    """Drop-in for ``ops.stft.spectrogram`` on (C, n) traces at the
    reference geometry, on the split-basis Pallas kernel with the (F, T)
    output produced in-kernel: truncate, log-PSD, per-channel min-max
    over the full one-sided spectrum (pre-drop quirk), drop the Nyquist
    row.  The trailing normalize+slice is a cheap fused XLA epilogue on
    the already-(F,T) array — the re-read/transpose pass that retired
    the round-3 integration no longer exists."""
    out, mn, mx, _ = stft_ft_log(traces, sp, bf16, interpret)
    # static frame count (the jitted inner call's return is traced)
    n_frames = (sp.n_samples - sp.nperseg) // sp.hop + 1
    v = out[:, : sp.n_freqs_kept, :n_frames]
    mn = mn[:, :, None]
    mx = mx[:, :, None]
    return (v - mn) / (mx - mn)


# ---------------------------------------------------------------------------
# mirrored corner-turn: (T,F) log-PSD + per-channel min/max -> normalized x16
# ---------------------------------------------------------------------------


def _make_turn_tf_kernel(i_: int, gpc: int):
    def kernel(mn_ref, mx_ref, s_ref, o_ref):
        natT = s_ref[0]  # (I*128, 256) f32: T rows, F lanes
        ci = pl.program_id(0) // gpc
        mn = mn_ref[ci, 0]
        z = (natT - mn) / (mx_ref[ci, 0] - mn)
        zb = z.astype(jnp.bfloat16)
        dn = (((0,), (0,)), ((), ()))  # contract dim0.dim0: natT absorbed
        sel = [
            jax.lax.dot_general(zb, _colsel(xi, i_), dn,
                                preferred_element_type=jnp.float32)
            .astype(jnp.bfloat16)
            for xi in range(4)
        ]  # (256, I*32) each; rows stay natural 4s+phi (s-major)
        pieces = [
            jnp.concatenate(
                [sel[xi][4 * s:4 * (s + 1), :] for xi in range(4)], axis=0
            )  # (16, I*32), rows xi*4 + phi
            for s in range(CS)
        ]
        o_ref[...] = jnp.concatenate(pieces, axis=1)  # (16, I*2048)

    return kernel


@functools.partial(jax.jit, static_argnames=("k_tiles", "interleave",
                                             "interpret"))
def specs_tf_to_x16_2d(sxx_tf, mn, mx, k_tiles: int, interleave: int = 0,
                       interpret: bool = False):
    """(C, Tpad >= k*128, >=256) (T,F) log-PSD + per-channel (C,1) min/max
    -> (16, C*k*2048) normalized bf16 parity rows — bf16-ulp identical to
    ``parity_turn.specs_to_x16_2d`` of the normalized (F,T) spectrogram,
    with the transpose absorbed into the gather's lhsT contraction."""
    from jax.experimental.pallas import tpu as pltpu

    c = sxx_tf.shape[0]
    i_ = interleave or pick_interleave(k_tiles)
    if k_tiles % i_:
        raise ValueError(f"interleave {i_} must divide k_tiles {k_tiles}")
    gpc = k_tiles // i_
    return pl.pallas_call(
        _make_turn_tf_kernel(i_, gpc),
        grid=(c * gpc,),
        in_specs=[
            pl.BlockSpec((c, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((c, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, i_ * 4 * CT, 256),
                         lambda i, gpc=gpc: (i // gpc, i % gpc, 0)),
        ],
        out_specs=pl.BlockSpec((16, i_ * LANES), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((16, c * k_tiles * LANES),
                                       jnp.bfloat16),
        interpret=interpret,
    )(mn, mx, sxx_tf)


def _make_turn_ft_norm_kernel(i_: int, gpc: int):
    def kernel(mn_ref, mx_ref, s_ref, o_ref):
        ci = pl.program_id(0) // gpc
        mn = mn_ref[ci, 0]
        nat = ((s_ref[0] - mn) / (mx_ref[ci, 0] - mn)).astype(jnp.bfloat16)
        sel = [
            _mm(nat, _colsel(xi, i_)).astype(jnp.bfloat16) for xi in range(4)
        ]  # (256, I*32) each; rows stay natural 4s+phi (s-major)
        pieces = [
            jnp.concatenate(
                [sel[xi][4 * s:4 * (s + 1), :] for xi in range(4)], axis=0
            )  # (16, I*32), rows xi*4 + phi
            for s in range(CS)
        ]
        o_ref[...] = jnp.concatenate(pieces, axis=1)  # (16, I*2048)

    return kernel


@functools.partial(jax.jit, static_argnames=("k_tiles", "interleave",
                                             "interpret"))
def specs_ft_to_x16_2d(sxx_ft, mn, mx, k_tiles: int, interleave: int = 0,
                       interpret: bool = False):
    """(C, >=256, Tpad >= k*128) RAW (F,T) log-PSD (``stft_ft_log``'s
    first output) + per-channel (C,1) min/max -> (16, C*k*2048)
    normalized bf16 parity rows — ``parity_turn.specs_to_x16_2d`` of the
    normalized spectrogram, with the min-max normalization fused into
    the turn.  The x16 path then never reads the materialized
    normalized specs, so the specs epilogue and the turn sit on
    INDEPENDENT dependency chains (round-5; the turn reads 256 of the
    384 padded freq rows directly)."""
    from jax.experimental.pallas import tpu as pltpu

    c = sxx_ft.shape[0]
    i_ = interleave or pick_interleave(k_tiles)
    if k_tiles % i_:
        raise ValueError(f"interleave {i_} must divide k_tiles {k_tiles}")
    gpc = k_tiles // i_
    return pl.pallas_call(
        _make_turn_ft_norm_kernel(i_, gpc),
        grid=(c * gpc,),
        in_specs=[
            pl.BlockSpec((c, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((c, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4 * CS, i_ * 4 * CT),
                         lambda i, gpc=gpc: (i // gpc, 0, i % gpc)),
        ],
        out_specs=pl.BlockSpec((16, i_ * LANES), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((16, c * k_tiles * LANES),
                                       jnp.bfloat16),
        interpret=interpret,
    )(mn, mx, sxx_ft)


def normalized_specs(sxx_tf, mn, mx, n_frames: int):
    """(C, Tpad, 384) (T,F) log-PSD + (C,1) min/max -> the service's
    (C, 256, n_frames) normalized float32 spectrogram (Nyquist row
    dropped after min-max, ops/stft.py semantics).  One full re-read +
    transposed write — the bandwidth floor of the specs output contract."""
    v = sxx_tf[:, :n_frames, :256]
    z = (v - mn[:, :, None]) / (mx[:, :, None] - mn[:, :, None])
    return jnp.swapaxes(z, -1, -2)
